#!/bin/bash
# Round-11 measurement campaign — strictly SERIALIZED (concurrent
# benches contaminate each other's dispersion). Runs every evidence
# item from VERDICT r10's ask list against a snapshot of the compiled
# classes:
#   1. sf1 flagship bench (exponent-table left column, current HEAD)
#   2. sf10 flagship bench (ask #1: v3 multi-probe, td14+td15, sketches)
#   3. STREAM sf10 verifyJaccard sweep (ask #4)
#   4. td14-vs-td15 shuffle bytes at sf1 and sf10 (ask #3)
#   5. sketch-accumulator on/off throughput at sf1 (ask #6)
#   6. sessionize hot-key skew, plain vs bucketed, sf1 (ask #5)
#   7. large-batch upsert skew point, default AQE bars (ask #7)
# Usage: nohup tools/campaign_r11.sh > /tmp/campaign_r11.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=/tmp/graft-classes-r11
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
export GRAFT_CLASSES="$SNAP"

FLAGSHIP="t11_bm25_topk,td10_dup_clusters,td11_minhash_vs_base,v10_semdedup,v15_ivfpq_topk,td3_minhash_pairs,td4_minhash_dedup,v3_lsh_topk,td6_minhash_dedup_linear,td8_line_dedup,td1_exact_dedup,v6_lsh_embed_dedup,td14_exact_substring_dedup,td15_substring_dedup_packed,t16_cms_topk_counts,t17_kmv_distinct,t18_cms_merge,t19_kmv_merge,t20_hll_distinct,t21_hll_merge"

step() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

step "1/7 sf1 flagship bench"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_BENCH_QUERIES="$FLAGSHIP" \
  SPARK_GRAFT_BENCH_BUDGET_SEC=700 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1_FLAGSHIP.json \
  tools/runmain.sh graft.Bench

step "2/7 sf10 flagship bench"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_QUERIES="$FLAGSHIP" \
  SPARK_GRAFT_BENCH_BUDGET_SEC="${SF10_BUDGET:-2400}" \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF10.json \
  tools/runmain.sh graft.Bench

step "3/7 STREAM sf10 verifyJaccard"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_STREAM_FPT=4,32 SPARK_GRAFT_STREAM_VERIFY=true \
  SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf10_verify.json \
  tools/runmain.sh graft.StreamBench

step "4a/7 shuffle bytes sf1"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE_OUT=/tmp/shuffle_td14_sf1.json \
  tools/runmain.sh graft.ShuffleProbe /tmp/sf1 3

step "4b/7 shuffle bytes sf10"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_OUT=/tmp/shuffle_td14_sf10.json \
  tools/runmain.sh graft.ShuffleProbe /tmp/sf10 2

step "5/7 sketch accumulator on/off sf1"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_SKETCH_OUT=/tmp/sketch_accum_sf1.json \
  tools/runmain.sh graft.SketchStreamBench

step "6/7 sessionize skew sf1"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SKEW_OUT=/tmp/sessionize_skew.json \
  tools/runmain.sh graft.SkewBench /tmp/sf1 3

step "7/7 upsert skew"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_UPSERT_OUT=/tmp/upsert_skew.json \
  tools/runmain.sh graft.UpsertSkewBench

step "campaign done"
