"""Standing round-close artifact (r13, verdict #5): the informational
full-registry verify at sf0.1.

Given an engine dump produced by `graft.Verify /root/testdata/sf0.1 <outdir>`,
this records per query:
  - rows + a stable content hash of the ENGINE output (columns sorted by
    name, values stringified — the oracle_check convention), and
  - where the DuckDB oracle is tractable inside --timeout seconds, the
    oracle comparison verdict (oracle_match / MISMATCH).
Oracles that exceed the budget or error DuckDB-side are recorded as
`oracle_timeout` / `oracle_error` with the engine output still hashed —
future rounds diff those hashes for the "outputs-unchanged" leg instead.
(r14: the timeout class should be EMPTY — the 8 quadratic all-pairs
Jaccard re-derivations were rewritten around an inverted shingle index,
value-identical and seconds at sf0.1; a reappearing timeout is a
regression worth investigating, not an expected class.)

Usage:
  python3 tools/verify_sf01.py <sfdir> <outdir> <artifact.json>
      [--timeout 120] [--prev VERIFY_SF01_rN.json]

With --prev, engine hashes are ALSO diffed against the prior round's
artifact and changes reported (informational: a legitimate operator
change moves its hash; the point is that unexplained moves get seen).
The artifact is written even when queries fail. Exit code is nonzero on
oracle MISMATCH, a missing/unreadable engine dump, or an oracle
subprocess DEATH (oracle_crashed — exited without writing a result);
oracle_timeout and oracle_error (a DuckDB-side exception, recorded with
its message) are informational — the engine hash is the artifact there.
A payload fully written before a teardown-slow timeout kill is still
compared.
"""
import argparse, duckdb, json, glob, os, sys, hashlib, tempfile
import multiprocessing as mp

# Oracles whose engine behavior at sf0.1 intentionally diverges from the
# SQL re-derivation. r14 closed the 20 golden-pin entries that used to
# live here (PinGen third branches); r15 closed the final entry —
# hyp_custom_grouped's oracle now carries the same >100k-per-group cap
# branch the engine's bounded collect enforces, so the documented loud
# refusal is an oracle_match at sf0.1 too. This class is EMPTY by
# design: a new entry needs the same written justification the old ones
# carried, and closing it (a conditional oracle branch modeling the
# contract) is always preferred.
OFFGATE = {}


def engine_rows(outdir, name):
    sdf = duckdb.sql(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    sdf = sdf[sorted(sdf.columns)]
    rows = sdf.astype(str).values.tolist()
    h = hashlib.md5(
        ("|".join(sorted(sdf.columns)) + "\n" +
         "\n".join("\x1f".join(r) for r in rows)).encode()).hexdigest()
    return rows, h, list(sdf.columns)


def run_oracle(sfdir, sql, out_path):
    """Subprocess target: run one oracle SQL, ship rows via a temp FILE —
    an mp.Queue would deadlock join() for results past the pipe buffer."""
    try:
        con = duckdb.connect()
        for f in glob.glob(f"{sfdir}/*.parquet"):
            name = os.path.basename(f).replace(".parquet", "")
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
        odf = con.execute(sql).fetchdf()
        odf = odf[sorted(odf.columns)]
        payload = {"kind": "ok", "cols": list(odf.columns),
                   "rows": odf.astype(str).values.tolist()}
    except Exception as e:  # pragma: no cover - surfaced in artifact
        payload = {"kind": "err", "error": str(e)[:500]}
    with open(out_path, "w") as fh:
        json.dump(payload, fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sfdir")
    ap.add_argument("outdir")
    ap.add_argument("artifact")
    ap.add_argument("--timeout", type=int, default=120)
    ap.add_argument("--prev", default=None)
    a = ap.parse_args()
    prev = (json.load(open(a.prev)).get("queries", {})
            if a.prev else None)
    oracle = json.load(open(f"{a.outdir}/oracle_sql.json"))
    result, fails = {}, []
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{a.outdir}/{name}"):
            result[name] = {"status": "engine_missing"}
            fails.append((name, "engine never dumped this query"))
            continue
        try:
            rows, h, cols = engine_rows(a.outdir, name)
        except Exception as e:
            result[name] = {"status": "engine_unreadable",
                            "error": str(e)[:300]}
            fails.append((name, f"engine dump unreadable: {str(e)[:160]}"))
            continue
        entry = {"rows": len(rows), "hash": h}
        if name in OFFGATE:
            entry["status"] = "oracle_offgate"
            entry["reason"] = OFFGATE[name]
            if prev is not None and name in prev and "hash" in prev[name]:
                entry["changed_vs_prev"] = prev[name]["hash"] != h
            result[name] = entry
            print(f"{entry['status']:<16} {name} ({entry['rows']} rows)",
                  flush=True)
            continue
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp = tf.name
        try:
            p = mp.Process(target=run_oracle, args=(a.sfdir, sql, tmp))
            p.start()
            p.join(a.timeout)
            timed_out = p.is_alive()
            if timed_out:
                p.terminate()
                p.join()
            # read whatever the child managed to write: a COMPLETE payload
            # written just before a teardown-slow timeout kill is still a
            # valid comparison (a truncated one fails json.load and falls
            # through to the timeout/crash classification)
            try:
                payload = json.load(open(tmp))
            except Exception:
                payload = None
            if payload is None:
                if timed_out:
                    entry["status"] = "oracle_timeout"
                else:
                    # the child exited without a result: a DuckDB-side
                    # error would have written kind=err — this is a
                    # process DEATH (segfault/OOM-kill) and must be loud
                    entry["status"] = "oracle_crashed"
                    entry["error"] = (
                        f"oracle subprocess died (exitcode {p.exitcode}) "
                        "without writing a result")
                    fails.append((name, entry["error"]))
            else:
                if payload["kind"] == "err":
                    entry["status"] = "oracle_error"
                    entry["error"] = payload["error"]
                elif sorted(payload["cols"]) != cols:
                    entry["status"] = "MISMATCH"
                    entry["detail"] = (
                        f"cols {sorted(payload['cols'])} vs {cols}")
                    fails.append((name, entry["detail"]))
                elif len(payload["rows"]) != len(rows):
                    entry["status"] = "MISMATCH"
                    entry["detail"] = f"rows {len(payload['rows'])} vs {len(rows)}"
                    fails.append((name, entry["detail"]))
                elif payload["rows"] != rows:
                    entry["status"] = "MISMATCH"
                    diff = [(i, x, y) for i, (x, y)
                            in enumerate(zip(payload["rows"], rows))
                            if x != y][:2]
                    entry["detail"] = f"values differ e.g. {diff}"[:500]
                    fails.append((name, entry["detail"]))
                else:
                    entry["status"] = "oracle_match"
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        if prev is not None and name in prev and "hash" in prev[name]:
            entry["changed_vs_prev"] = prev[name]["hash"] != h
        result[name] = entry
        print(f"{entry.get('status'):<16} {name} ({entry.get('rows', '-')} rows)",
              flush=True)
    counts = {}
    for e in result.values():
        counts[e["status"]] = counts.get(e["status"], 0) + 1
    changed = [n for n, e in result.items() if e.get("changed_vs_prev")]
    summary = {"sf": a.sfdir, "timeout_s": a.timeout, "counts": counts,
               "n_queries": len(oracle),
               "changed_vs_prev": changed if prev is not None else None}
    json.dump({"summary": summary, "queries": result},
              open(a.artifact, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary))
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
