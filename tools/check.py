#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs Verify's parquet dumps against DuckDB executions of oracle_sql.json
over the same testdata tables; compares schema (sorted column names),
row count, and values (columns sorted by name, rows sorted).
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import duckdb, json, math, sys, glob, os

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
        s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        d = con.execute(sql).fetchall()
        dcols = [d_[0] for d_ in con.description]
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}"); bad += 1; continue
    if sorted(scols) != sorted(dcols):
        print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}"); bad += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); bad += 1; continue
    sperm = [scols.index(c) for c in sorted(scols)]
    dperm = [dcols.index(c) for c in sorted(dcols)]
    def norm(rows, perm):
        out = []
        for r in rows:
            out.append(tuple(str(r[i]) for i in perm))
        return sorted(out)
    sn, dn = norm(s, sperm), norm(d, dperm)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); bad += 1; continue
    print(f"OK   {name} ({len(s)} rows)"); ok += 1
print(f"== {ok} ok, {bad} fail ==")
sys.exit(1 if bad else 0)
