#!/bin/bash
# Round-13 measurement campaign — the commands behind
# MEASUREMENTS_R13.json and the BENCH_SF1/BENCH_SF10 regeneration at
# the r13 head. Serialized on purpose: every step owns the host.
# Prereqs: /tmp/sf1 and /tmp/sf10 synthesized (graft.SynthScale, see
# .claude/skills/verify/SKILL.md 3b), sbt compile green.
set -euo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

step "1/5 stratum-window skew (plain vs two-pass bucketed, hot stratum = 30%)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_STRATUMSKEW_OUT=/tmp/stratumskew.json \
  tools/runmain.sh graft.StratumSkewBench

step "2/5 i8 action-level decomposition (the small-load floor)"
SPARK_GRAFT_APPENDPATH_OUT=/tmp/appendpath.json \
  tools/runmain.sh graft.AppendPathProbe 5

step "3/5 td10 sf10 bimodality probe (6 fresh JVMs, GC logs)"
tools/td10_bimodal_r13.sh 6 /tmp/td10_bimodal

# The committed flagship subset of BENCH_SF1/BENCH_SF10 (23 queries).
SF_QUERIES="t11_bm25_topk,td10_dup_clusters,td11_minhash_vs_base,td15_substring_dedup_packed,td14_exact_substring_dedup,v10_semdedup,v15_ivfpq_topk,td3_minhash_pairs,td4_minhash_dedup,tp17_dsir_weights,td6_minhash_dedup_linear,v3_lsh_topk,td8_line_dedup,v6_lsh_embed_dedup,tp19_dsir_admission,t18_cms_merge,tp16_bloom_suspicion,t21_hll_merge,td1_exact_dedup,t19_kmv_merge,t20_hll_distinct,t16_cms_topk_counts,t17_kmv_distinct"

step "4/5 sf1 flagship bench (exponent denominators)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_BENCH_QUERIES="$SF_QUERIES" \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1_FLAGSHIP.json \
  tools/runmain.sh graft.Bench

step "5/5 sf10 flagship bench (the 100x point, r13 head)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_QUERIES="$SF_QUERIES" \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF10.json \
  SPARK_GRAFT_BENCH_BUDGET_SEC=2400 \
  tools/runmain.sh graft.Bench

step "campaign done"
