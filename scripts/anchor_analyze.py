#!/usr/bin/env python3
"""Summarize an anchor sweep dir: per-query min Spark vs min DuckDB."""
import json, sys, glob

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/anchor_r12"
sq, dq = {}, {}
for f in sorted(glob.glob(f"{d}/spark_run*.json")):
    j = json.load(open(f))
    for k, v in j["queries"].items():
        sq.setdefault(k, []).append(v)
for f in sorted(glob.glob(f"{d}/duck_run*.json")):
    j = json.load(open(f))
    qs = j.get("queries", j)
    for k, v in qs.items():
        dq.setdefault(k, []).append(v)

smin = {k: min(v) for k, v in sq.items()}
dmin = {k: min(v) for k, v in dq.items()}
common = sorted(set(smin) & set(dmin))
st = sum(smin[k] for k in common)
dt = sum(dmin[k] for k in common)
print(f"spark entries: {len(smin)}  duck entries: {len(dmin)}  common: {len(common)}")
print(f"common-query totals: spark(min) {st:.2f}s  duck(min) {dt:.2f}s  ratio {st/dt:.3f}x")
print(f"all-spark-entries min total: {sum(smin.values()):.2f}s")
print(f"all-duck-entries  min total: {sum(dmin.values()):.2f}s")
worst = sorted(common, key=lambda k: -(smin[k] / max(dmin[k], 1e-9)))[:12]
print("\nworst per-query ratios (spark_min vs duck_min):")
for k in worst:
    print(f"  {k:34s} {smin[k]:8.3f}s vs {dmin[k]:8.3f}s = {smin[k]/max(dmin[k],1e-9):7.2f}x")
big = sorted(common, key=lambda k: -smin[k])[:12]
print("\nbiggest spark absolute:")
for k in big:
    print(f"  {k:34s} {smin[k]:8.3f}s vs {dmin[k]:8.3f}s")
only = sorted(set(smin) - set(dmin), key=lambda k: -smin[k])[:8]
print("\nspark-only (no oracle timing), biggest:")
for k in only:
    print(f"  {k:34s} {smin[k]:8.3f}s")
