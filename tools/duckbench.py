#!/usr/bin/env python3
"""Time every oracle query in DuckDB (32 threads) at a given SF —
the single-node throughput bar the Spark bench is compared against.
Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import duckdb, json, sys, glob, os, time

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 32")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
out = {}
for name, sql in sorted(oracle.items()):
    ts = []
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        ts.append(time.time() - t0)
    out[name] = min(ts)
print(json.dumps({"total": sum(out.values()), "queries": out}))
