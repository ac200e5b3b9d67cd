#!/usr/bin/env python3
"""Per-query scaling exponents between ANY two decade-step Bench
artifacts (generalizes exponents_r14.py, whose labels hardcoded the
sf1->sf10 step).

Usage: exponents_r15.py <lo.json> <hi.json> [step=10]

exponent = log_step(t_hi / t_lo), both per-query minima as the
artifacts carry them (each artifact states its own rounds/JVM
provenance).  Prints a markdown table sorted by hi-scale cost plus the
aggregate line, and flags exponent >= 0.9 with hi-scale time >= 1 s
(the scale-killer screen ARCHITECTURE.md applies every campaign).
"""
import json
import math
import sys

lo_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF10.json"
hi_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF100.json"
step = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
lo = json.load(open(lo_path))
hi = json.load(open(hi_path))
qlo, qhi = lo["queries"], hi["queries"]
lo_sf, hi_sf = lo.get("sf", lo_path), hi.get("sf", hi_path)

shared = sorted(set(qlo) & set(qhi), key=lambda k: -qhi[k])
only_lo = sorted(set(qlo) - set(qhi))
only_hi = sorted(set(qhi) - set(qlo))

print(f"| query | {lo_sf} s | {hi_sf} s | exponent ({step:g}x step) |")
print("|---|---|---|---|")
agg_lo = agg_hi = 0.0
flagged = []
for k in shared:
    t_lo, t_hi = qlo[k], qhi[k]
    agg_lo += t_lo
    agg_hi += t_hi
    # degrade, don't crash: a zero/negative time on EITHER side (a
    # failed or clock-skewed sample) gets 'n/a', not a ValueError
    if t_lo > 0 and t_hi > 0:
        e = math.log(t_hi / t_lo, step)
        print(f"| {k} | {t_lo:.2f} | {t_hi:.2f} | {e:.2f} |")
        if e >= 0.9 and t_hi >= 1.0:
            flagged.append((k, t_lo, t_hi, e))
    else:
        print(f"| {k} | {t_lo:.2f} | {t_hi:.2f} | n/a |")
if shared and agg_lo > 0 and agg_hi > 0:
    print(f"| **aggregate ({len(shared)} shared queries)** | **{agg_lo:.1f}** "
          f"| **{agg_hi:.1f}** | **{math.log(agg_hi/agg_lo, step):.2f}** |")
else:
    print(f"| **aggregate** | — | — | n/a (no shared positive-time queries) |")
print()
print(f"lo-only (skipped at the higher scale): {only_lo}")
print(f"hi-only: {only_hi}")
print()
if flagged:
    print("superlinear screen (exp >= 0.9, hi-scale >= 1 s):")
    for k, t_lo, t_hi, e in flagged:
        print(f"  {k}: {t_lo:.2f} -> {t_hi:.2f} s (exp {e:.2f})")
else:
    print("superlinear screen: no flags")
