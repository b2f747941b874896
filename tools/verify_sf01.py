"""Standing round-close artifact (r13, verdict #5): the informational
full-registry verify at sf0.1.

Given an engine dump produced by `graft.Verify /root/testdata/sf0.1 <outdir>`,
this records per query:
  - rows + a stable content hash of the ENGINE output (columns sorted by
    name, values stringified — the oracle_check convention), and
  - where the DuckDB oracle is tractable inside --timeout seconds, the
    oracle comparison verdict (match / MISMATCH).
Oracles that exceed the budget (the quadratic all-pairs re-derivations
that sf0.1 makes intractable) are recorded as `oracle_timeout` with the
engine output still hashed — future rounds diff those hashes for the
"outputs-unchanged" leg instead.

Usage:
  python3 tools/verify_sf01.py <sfdir> <outdir> <artifact.json> \
      [--timeout 120] [--prev VERIFY_SF01_rN.json]

With --prev, engine hashes are ALSO diffed against the prior round's
artifact and changes reported (informational: a legitimate operator
change moves its hash; the point is that unexplained moves get seen).
Exit code is nonzero only on oracle MISMATCH or a missing/crashed dump.
"""
import duckdb, json, glob, os, sys, hashlib, multiprocessing as mp


def engine_rows(outdir, name):
    sdf = duckdb.sql(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    sdf = sdf[sorted(sdf.columns)]
    rows = sdf.astype(str).values.tolist()
    h = hashlib.md5(
        ("|".join(sorted(sdf.columns)) + "\n" +
         "\n".join(",".join(r) for r in rows)).encode()).hexdigest()
    return rows, h, list(sdf.columns)


def run_oracle(sfdir, sql, q):
    """Subprocess target: run one oracle SQL, ship rows back."""
    try:
        con = duckdb.connect()
        for f in glob.glob(f"{sfdir}/*.parquet"):
            name = os.path.basename(f).replace(".parquet", "")
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
        odf = con.execute(sql).fetchdf()
        odf = odf[sorted(odf.columns)]
        q.put(("ok", list(odf.columns), odf.astype(str).values.tolist()))
    except Exception as e:  # pragma: no cover - surfaced in artifact
        q.put(("err", str(e)[:500], None))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir, outdir, artifact = args[0], args[1], args[2]
    timeout = 120
    prev = None
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--timeout":
            timeout = int(next(it))
        elif a == "--prev":
            prev = json.load(open(next(it))).get("queries", {})
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    result, fails = {}, []
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{outdir}/{name}"):
            result[name] = {"status": "engine_missing"}
            fails.append((name, "engine never dumped this query"))
            continue
        rows, h, cols = engine_rows(outdir, name)
        entry = {"rows": len(rows), "hash": h}
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sfdir, sql, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            entry["status"] = "oracle_timeout"
        else:
            kind, a, b = q.get() if not q.empty() else ("err", "no result", None)
            if kind == "err":
                entry["status"] = "oracle_error"
                entry["error"] = a
                fails.append((name, f"oracle error: {a[:160]}"))
            elif sorted(a) != cols:
                entry["status"] = "MISMATCH"
                entry["detail"] = f"cols {sorted(a)} vs {cols}"
                fails.append((name, entry["detail"]))
            elif len(b) != len(rows):
                entry["status"] = "MISMATCH"
                entry["detail"] = f"rows {len(b)} vs {len(rows)}"
                fails.append((name, entry["detail"]))
            elif [",".join(r) for r in b] != [",".join(r) for r in rows]:
                entry["status"] = "MISMATCH"
                diff = [(i, x, y) for i, (x, y) in enumerate(zip(b, rows))
                        if x != y][:2]
                entry["detail"] = f"values differ e.g. {diff}"[:500]
                fails.append((name, entry["detail"]))
            else:
                entry["status"] = "oracle_match"
        if prev is not None and name in prev and "hash" in prev[name]:
            entry["changed_vs_prev"] = prev[name]["hash"] != h
        result[name] = entry
        print(f"{entry.get('status'):<16} {name} ({entry.get('rows', '-')} rows)",
              flush=True)
    counts = {}
    for e in result.values():
        counts[e["status"]] = counts.get(e["status"], 0) + 1
    changed = [n for n, e in result.items() if e.get("changed_vs_prev")]
    summary = {"sf": sfdir, "timeout_s": timeout, "counts": counts,
               "n_queries": len(oracle),
               "changed_vs_prev": changed if prev is not None else None}
    json.dump({"summary": summary, "queries": result},
              open(artifact, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary))
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
