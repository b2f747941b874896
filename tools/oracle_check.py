import duckdb, json, glob, os, sys
sfdir = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_r1'
con = duckdb.connect()
for f in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet','')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
# --skip-missing: for SUBSET runs only - don't execute the (possibly
# expensive) oracle SQL for outputs the subset never dumped. Without the
# flag a missing dir is a loud FAIL, because in a FULL run it means the
# engine crashed on or silently skipped that query.
skip_missing = '--skip-missing' in sys.argv[3:]
fails = []
skipped = 0
for name, sql in sorted(oracle.items()):
    if not os.path.isdir(f'{outdir}/{name}'):
        if skip_missing:
            skipped += 1
            continue
        fails.append((name, 'output dir missing - engine never dumped this query'))
        continue
    try:
        odf = con.execute(sql).fetchdf()
        sdf = duckdb.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        odf = odf[sorted(odf.columns)]; sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            fails.append((name, f"cols {list(odf.columns)} vs {list(sdf.columns)}")); continue
        if len(odf) != len(sdf):
            fails.append((name, f"rows {len(odf)} vs {len(sdf)}")); continue
        o = odf.astype(str).values.tolist(); s = sdf.astype(str).values.tolist()
        if o != s:
            diff = [(i,a,b) for i,(a,b) in enumerate(zip(o,s)) if a!=b][:3]
            fails.append((name, f"values differ e.g. {diff}")); continue
        print(f"OK    {name} ({len(odf)} rows)")
    except Exception as e:
        fails.append((name, f"EXC {e}"))
for n, m in fails: print(f"FAIL  {n}: {m}")
checked = len(oracle) - skipped
note = f" ({skipped} not dumped, skipped)" if skipped else ""
print(f"\n{checked-len(fails)}/{checked} match{note}")
