#!/usr/bin/env python3
"""Fold BENCH_SF1.json + BENCH_SF10.json into the r14 exponent table.

Per-query exponent for the 10x step = log10(t_sf10 / t_sf1), both
times the per-query minima their artifacts carry (sf1: min over its
in-process rounds; sf10: the single full-suite fresh JVM's per-round
minima — the r14 campaign writes BENCH_SF10.json from one JVM; the
cross-JVM BenchMergeJvms merge applies only to the separate heavy-3
bracket artifact, BENCH_SF10_HEAVY3_*.json).  Prints
a markdown table sorted by sf10 cost plus the aggregate line, and
flags exponent >= 0.9 with sf10 time >= 1 s (the scale-killer
screen ARCHITECTURE.md applies every campaign).
"""
import json
import math
import sys

sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.json"
sf10_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF10.json"
sf1 = json.load(open(sf1_path))
sf10 = json.load(open(sf10_path))
q1, q10 = sf1["queries"], sf10["queries"]

shared = sorted(set(q1) & set(q10), key=lambda k: -q10[k])
only1 = sorted(set(q1) - set(q10))
only10 = sorted(set(q10) - set(q1))

print("| query | sf1 s | sf10 s | exponent (10x step) |")
print("|---|---|---|---|")
agg1 = agg10 = 0.0
flagged = []
for k in shared:
    t1, t10 = q1[k], q10[k]
    agg1 += t1
    agg10 += t10
    e = math.log10(t10 / t1) if t1 > 0 else float("nan")
    print(f"| {k} | {t1:.2f} | {t10:.2f} | {e:.2f} |")
    if e >= 0.9 and t10 >= 1.0:
        flagged.append((k, t1, t10, e))
print(f"| **aggregate ({len(shared)} shared queries)** | **{agg1:.1f}** "
      f"| **{agg10:.1f}** | **{math.log10(agg10/agg1):.2f}** |")
print()
print(f"sf1-only (skipped at sf10): {only1}")
print(f"sf10-only: {only10}")
print()
if flagged:
    print("exponent >= 0.9 with sf10 >= 1 s:")
    for k, t1, t10, e in flagged:
        print(f"  {k}: {t1:.2f} -> {t10:.2f}  (exp {e:.2f})")
else:
    print("exponent >= 0.9 with sf10 >= 1 s: none")
