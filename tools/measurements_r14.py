#!/usr/bin/env python3
"""Assemble MEASUREMENTS_R14.json from the round's campaign artifacts.

Inputs (all produced this round, same host session, r14 head):
  BENCH_SF1.json              full suite at sf1 (exponent denominators)
  BENCH_SF10.json             full suite at sf10, fresh JVM A (2 rounds)
  /tmp/bench_sf10_jvmB.json   heavy-3 bracket, fresh JVM B
  /tmp/bench_sf10_jvmC.json   heavy-3 bracket, fresh JVM C (optional)

The warm-up economics constants are log-timestamped facts from JVM A
(untimed pass 09:22-10:27 UTC; the per-round totals are re-derived
from rounds_detail at run time), not
estimates.
"""
import json
import math
import os

sf1 = json.load(open("BENCH_SF1.json"))
sf10 = json.load(open("BENCH_SF10.json"))

shared = sorted(set(sf1["queries"]) & set(sf10["queries"]))
agg1 = sum(sf1["queries"][k] for k in shared)
agg10 = sum(sf10["queries"][k] for k in shared)

# Superlinear screen: the SAME rule exponents_r14.py applies (exponent
# >= 0.9 with sf10 cost >= 1 s), derived from the input artifacts —
# never a hardcoded list, so regenerating BENCH_SF1/SF10 regenerates
# the flags. The >= 0.9 linear-scan entries (t1/mm7/s2-class) are
# included: a linear exponent on a scan-bound query is expected, but
# the screen reports it and the verdict adjudicates it.
flagged = {
    k: round(math.log10(sf10["queries"][k] / sf1["queries"][k]), 2)
    for k in shared
    if sf1["queries"][k] > 0 and sf10["queries"][k] >= 1.0
    and math.log10(sf10["queries"][k] / sf1["queries"][k]) >= 0.9
}

# Warm-up economics: the per-round totals are derivable from the
# artifact itself (rounds_detail); only the untimed-pass wall (65 min,
# a log-timestamped fact outside the JSON) stays a constant — guarded:
# if the artifact's round structure no longer matches the session the
# constant came from, fail loudly instead of emitting stale numbers.
# only COMPLETE rounds: Bench omits failed queries from a round's map,
# so a partial round understates its total and the derived pair-spread
# narrative — mirror Bench.medianRoundTotal's maximal-size filter
_details = sf10.get("rounds_detail", [])
_full = max((len(r) for r in _details), default=0)
_round_totals = [sum(r.values()) for r in _details if len(r) == _full]
if len(_round_totals) < 2:
    raise SystemExit(
        "BENCH_SF10.json no longer carries the 2-round fresh-JVM-A "
        "provenance this script's warm-up constants describe; "
        "re-measure the untimed-pass wall before regenerating.")
_r1_s, _r2_s = _round_totals[0], _round_totals[1]

brackets = {}
for j in ("B", "C"):
    p = f"/tmp/bench_sf10_jvm{j}.json"
    if os.path.exists(p):
        brackets[j] = json.load(open(p))

heavy = sorted(next(iter(brackets.values()))["queries"]) if brackets else []
tri = {}
for k in heavy:
    a = sf10["queries"].get(k)
    row = {"jvm_a_s": a}
    for j, b in brackets.items():
        v = b["queries"].get(k)
        row[f"jvm_{j.lower()}_s"] = v
        if a and v:
            row[f"a_over_{j.lower()}"] = round(a / v, 3)
    vals = [x for x in [a] + [b["queries"].get(k) for b in brackets.values()]
            if x is not None]
    row["cross_jvm_min_s"] = min(vals)
    row["cross_jvm_spread_pct"] = round((max(vals) - min(vals)) / min(vals) * 100, 2)
    tri[k] = row

warmup = {
    "jvm_a_untimed_pass_min": 65.0,
    "jvm_a_round1_s": round(_r1_s, 3),
    "jvm_a_round2_s": round(_r2_s, 3),
    "cold_pass_over_warm_round": round(65.0 * 60 / _r2_s, 2),
    "sf1_cold_over_warm": 1.25,
    "note": (
        "A fresh JVM's first full-suite pass at sf10 costs ~65 min against a "
        "~26 min warm round, and the FIRST timed round is still JIT-settling "
        f"({_r1_s:.0f} vs {_r2_s:.0f} s, {(_r1_s/_r2_s-1)*100:.0f}% pair spread): whole-stage-codegen class "
        "compilation across 147 queries dominates the fresh-JVM tax (sf1 "
        "ratio ~1.25x, hidden under 7 s rounds). Protocol consequence: the "
        "r13 >=3-fresh-JVM rule amortizes on subsets, not the full surface - "
        "three full-suite fresh JVMs cost ~6 h, two-thirds warm-up. The "
        "campaign therefore runs the full suite on ONE fresh JVM (per-query "
        "min over 2 timed rounds) and brackets the heaviest queries across "
        "additional fresh JVMs (this file's heavy3_jvm_bracket), the tail "
        "being seconds-scale where fresh-JVM amplitude is milliseconds."
    ),
}

out = {
    "full_suite_sf10": {
        "queries_timed": len(sf10["queries"]),
        "skipped_baseline": sf10.get("skipped_baseline", []),
        "rounds": sf10["rounds"],
        "failed": sf10.get("failed", []),
        "min_composite_s": sf10["min_value"],
        "aggregate_exponent_10x": round(math.log10(agg10 / agg1), 3),
        "sf1_shared_min_s": round(agg1, 3),
        "sf10_shared_min_s": round(agg10, 3),
        "superlinear_flagged": flagged,
        "superlinear_verdict": (
            "the >1.1 tail is exactly the quadratic-by-construction family: "
            "compressed-scan exact baselines (v8/v9/v12 score every code for "
            "every query; pruned counterparts v3/v4/v15 measure 0.53-0.66) "
            "and train-inside-the-call v7 (serve-only v4 is 0.53) - all four "
            "joined Bench.baselineOnly at the sf100 threshold. The ~0.9-1.1 "
            "band (t1/s2/mm2/mm7/td3/tp10/v14) is the designed linear "
            "asymptote: scan- or payload-bound work whose cost is the data "
            "itself (decode, tokenize, ingest), plus samplers whose plain "
            "form is linear by contract (tp10 1.01 vs its bucketed remedy "
            "tp20 at 0.51)."
        ),
    },
    "heavy3_jvm_bracket": {
        "fresh_jvms": 1 + len(brackets),
        "per_query": tri,
    },
    "fresh_jvm_warmup_economics": warmup,
}
json.dump(out, open("MEASUREMENTS_R14.json", "w"), indent=1)
print("written MEASUREMENTS_R14.json;",
      f"bracket JVMs present: {sorted(brackets)}")
