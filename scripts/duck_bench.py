#!/usr/bin/env python3
"""DuckDB timing of the oracle SQL suite over a testdata dir (the
comparative baseline for BENCH ratio-vs-SF evidence)."""
import duckdb, json, os, sys, time, glob, threading

sfdir = sys.argv[1]
sqls = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
# per-query wall budget in seconds (0 = unlimited, the default). A
# scale probe needs this: a superlinear oracle (e.g. the recursive-CTE
# CC dedup) would otherwise hold the whole sweep hostage; interrupted
# queries report their censored time and are flagged.
budget = float(os.environ.get("DUCK_BUDGET", "0"))
con = duckdb.connect()
con.execute(f"SET threads TO 32")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
times = {}
timeouts = []
ooms = []
for name, sql in sorted(sqls.items()):
    runs = []
    hit_budget = False
    for _ in range(2):
        timer = threading.Timer(budget, con.interrupt) if budget > 0 else None
        if timer: timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except duckdb.InterruptException:
            hit_budget = True
        except duckdb.OutOfMemoryException:
            # a query that exhausts memory at this SF is itself a scale
            # finding — record the censored time, flag it, keep going
            hit_budget = True
            ooms.append(name)
        finally:
            if timer: timer.cancel()
        runs.append(time.time() - t0)
        if hit_budget:
            break  # no second run for a censored query
    times[name] = min(runs)
    if hit_budget:
        timeouts.append(name)
total = sum(times.values())
out = {"sf": sfdir, "total": round(total, 2),
       "queries": {k: round(v, 3) for k, v in times.items()}}
if timeouts:
    out["timeouts"] = sorted(timeouts)
if ooms:
    out["oom"] = sorted(ooms)
print(json.dumps(out))
