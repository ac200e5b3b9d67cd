#!/bin/bash
# Round-12 measurement campaign — the commands behind
# MEASUREMENTS_R12.json, ADJUDICATION_SF10_R12.json and the round's
# STREAM re-measures. Serialized on purpose: every step owns the host.
# Prereqs: /tmp/sf1 and /tmp/sf10 synthesized (graft.SynthScale, see
# .claude/skills/verify/SKILL.md 3b), sbt compile green.
set -euo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

step "1/5 sketch accumulator on/off sf1 (wide one-pass form)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_SKETCH_OUT=/tmp/sketch_accum_sf1_wide.json \
  tools/runmain.sh graft.SketchStreamBench

step "2/5 domain-cap skew (plain vs bucketed, hot domain = 30%)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CAPSKEW_OUT=/tmp/capskew.json \
  tools/runmain.sh graft.CapSkewBench

step "3/5 STREAM sf10 verifyJaccard (packed shingle store)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_STREAM_FPT=4,32 SPARK_GRAFT_STREAM_VERIFY=true \
  SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf10_verify.json \
  tools/runmain.sh graft.StreamBench

step "4/5 STREAM sf1 verifyJaccard sweep"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_STREAM_FPT=4,8,16,32 SPARK_GRAFT_STREAM_VERIFY=true \
  SPARK_GRAFT_STREAM_OUT=/tmp/stream_sf1_verify.json \
  tools/runmain.sh graft.StreamBench

step "5/5 sf10 code-vs-host re-pair (td10 + t11, A,B,A,B)"
# A = current classes, B = a prev head compiled in a worktree; assemble
# per-head mins into ADJUDICATION_SF10_R12.json (see that file's
# protocol field). Each child: graft.Bench with
#   SPARK_GRAFT_BENCH_QUERIES=td10_dup_clusters,t11_bm25_topk
#   SPARK_GRAFT_BENCH_BUDGET_SEC=1 SPARK_GRAFT_NO_WARMUP=1
#   SPARK_GRAFT_NO_ADJUDICATE=1 GRAFT_CLASSES=<head classes>
echo "step 5 is interactive (two compiled heads needed) - see ADJUDICATION_SF10_R12.json protocol" >&2

step "campaign done"
