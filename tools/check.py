#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs Verify's parquet dumps against DuckDB executions of oracle_sql.json
over the same testdata tables; compares schema (sorted column names),
row count, and values. Values are compared through pandas conversion
(mimicking a driver that hashes DataFrame string renderings) and IN ROW
ORDER — so every query needs a total ORDER BY, and any DuckDB HUGEINT
column (which pandas coerces to float64, diverging from Spark's int64
rendering) is flagged as a hard failure. r1 lesson: 7 queries
hash-mismatched in the driver purely because SUM(int) is HUGEINT in
DuckDB; oracle SQL must CAST integer sums to BIGINT.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); bad += 1; continue
    try:
        srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        sdf = srel.df()
        drel = con.sql(sql)
        dtypes = dict(zip(drel.columns, [str(t) for t in drel.types]))
        ddf = drel.df()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}"); bad += 1; continue
    huge = [c for c, t in list(stypes.items()) + list(dtypes.items()) if t == "HUGEINT"]
    if huge:
        print(f"FAIL {name}: HUGEINT column(s) {sorted(set(huge))} — pandas coerces to float64; CAST to BIGINT in the SQL")
        bad += 1; continue
    if sorted(sdf.columns) != sorted(ddf.columns):
        print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"); bad += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); bad += 1; continue
    cols = sorted(sdf.columns)
    sn = [tuple(str(v) for v in row) for row in sdf[cols].itertuples(index=False)]
    dn = [tuple(str(v) for v in row) for row in ddf[cols].itertuples(index=False)]
    if sn != dn:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:3]
        order_only = sorted(sn) == sorted(dn)
        print(f"FAIL {name}: value mismatch{' (ROW ORDER ONLY — ORDER BY not total)' if order_only else ''}, first diffs: {diffs}")
        bad += 1; continue
    print(f"OK   {name} ({len(sdf)} rows)"); ok += 1
print(f"== {ok} ok, {bad} fail ==")
sys.exit(1 if bad else 0)
