#!/bin/bash
# Round-16 decade campaign — re-baseline the decade artifacts on the
# REGENERATED corpora (the r15 scaler fix: pre-r15 sf10 carried
# bit-identical cross-replica embeddings at deltas >= 64, so sf10 and
# the sf100 chained from it were rebuilt with the sign-flip scaler
# this round; sf1-class chains are byte-identical and carry over), and
# measure the round's three structural fixes at the third decade:
#
#   1/4 sf10 ANN/sampler subset (fresh JVM) — the exponent
#       denominators on the rebuilt corpus.
#   2/4 sf100 ANN/sampler subset (fresh JVM, 96g) — decade-3
#       exponents for the persisted-IVF serve paths (v4/v10/v15), the
#       adaptive tp20 grid, and the held family (v6/tp21/tp22).
#   3/4 v3 cap bracket at sf100 — the multi-JVM pre/post adjudication
#       the r15 verdict demands for the 16->24 bit-cap fix:
#       interleaved fresh JVMs A(head),B(pre-fix),A,B where the
#       pre-fix side is the TRUE pre-cap commit (3e81270, cap 16)
#       compiled from a clean clone — per-head min settles the
#       single-sample 609-vs-338 scare under the same host session.
#   4/4 merge + exponent tables (tools/exponents_r15.py) into
#       MEASUREMENTS_R16 inputs.
#
# Serialized on purpose: every step owns the host.
# Prereqs: /tmp/sf1 /tmp/sf10 /tmp/sf100 regenerated THIS round
# (graft.SynthScale chain), sbt compile green, /tmp/v3pre/graft-v3pre.jar
# built from commit 3e81270 (see step 3 notes).
set -euo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

ANNSET="v3_lsh_topk,v4_ivf_topk,v10_semdedup,v15_ivfpq_topk,tp20_top_fraction_bucketed,v6_lsh_embed_dedup,tp21_budget_mix_bucketed,tp22_temperature_budget_mix"

# stable classpath while sbt keeps working: snapshot the classes
SNAP=/tmp/r16_classes
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"

step "1/4 sf10 ANN/sampler subset (regenerated corpus denominators)"
GRAFT_CLASSES="$SNAP" SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_QUERIES="$ANNSET" \
  SPARK_GRAFT_BENCH_MIN_ROUNDS=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_sf10_ann.json \
  SPARK_GRAFT_NO_ADJUDICATE=1 \
  tools/runmain.sh graft.Bench

step "2/4 sf100 ANN/sampler subset (decade-3, persisted-index serve paths)"
GRAFT_CLASSES="$SNAP" SPARK_DRIVER_MEM=96g SPARK_GRAFT_SF_DIR=/tmp/sf100 \
  SPARK_GRAFT_BENCH_QUERIES="$ANNSET" \
  SPARK_GRAFT_BENCH_MIN_ROUNDS=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_sf100_ann.json \
  SPARK_GRAFT_NO_ADJUDICATE=1 \
  tools/runmain.sh graft.Bench

step "3/4 v3 cap bracket at sf100: A(head cap24) B(3e81270 cap16) A B"
for pair in A1:"$SNAP" B1:/tmp/v3pre/graft-v3pre.jar A2:"$SNAP" B2:/tmp/v3pre/graft-v3pre.jar; do
  label="${pair%%:*}"; cp="${pair#*:}"
  step "  v3 bracket child $label"
  GRAFT_CLASSES="$cp" SPARK_DRIVER_MEM=96g SPARK_GRAFT_SF_DIR=/tmp/sf100 \
    SPARK_GRAFT_BENCH_QUERIES="v3_lsh_topk" \
    SPARK_GRAFT_BENCH_MIN_ROUNDS=1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_v3_${label}.json \
    SPARK_GRAFT_NO_ADJUDICATE=1 \
    tools/runmain.sh graft.Bench
done

step "4/4 exponent tables (paste into MEASUREMENTS_R16 / ARCHITECTURE)"
python3 tools/exponents_r15.py /tmp/bench_r16_sf10_ann.json /tmp/bench_r16_sf100_ann.json 10 || true
step "campaign done"
