#!/usr/bin/env python3
"""DuckDB timing of the oracle SQL suite over a testdata dir (the
comparative baseline for BENCH ratio-vs-SF evidence)."""
import duckdb, json, sys, time, glob

sfdir = sys.argv[1]
sqls = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
con = duckdb.connect()
con.execute(f"SET threads TO 32")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
times = {}
for name, sql in sorted(sqls.items()):
    runs = []
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        runs.append(time.time() - t0)
    times[name] = min(runs)
total = sum(times.values())
print(json.dumps({"sf": sfdir, "total": round(total, 2),
                  "queries": {k: round(v, 3) for k, v in times.items()}}))
