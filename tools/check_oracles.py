#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: for each SparkEntry
query, run its DuckDB oracle SQL over the same parquet tables and compare
with the Verify parquet dump.

Deliberately WEAKER than the driver gate in two ways (r7 ADVICE, documented):
columns are sorted by name and rows are compared as sorted multisets, so an
ORDER BY regression passes here but can fail the real gate; and floats are
normalized to 9 significant digits ('%.9g', a relative tolerance), not an
absolute 1e-9."""
import json, sys, glob, math
import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    fails = []
    names = sorted(oracle) if only is None else [q for q in sorted(oracle) if q in only]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no verify output)")
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ERR      {name}: {e}")
            fails.append(name)
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: got {list(got.columns)} want {list(exp.columns)}")
            fails.append(name)
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: got {len(got)} want {len(exp)}")
            fails.append(name)
            n_fail += 1
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False))
        if g != e:
            bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"VALUES   {name}: first diff at sorted row {bad}:")
            print(f"  got  {g[bad]}")
            print(f"  want {e[bad]}")
            fails.append(name)
            n_fail += 1
            continue
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} missing of {len(names)}")
    if fails:
        print("failing:", " ".join(fails))
    return 1 if fails or n_skip else 0

if __name__ == "__main__":
    only = set(sys.argv[3:]) or None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
