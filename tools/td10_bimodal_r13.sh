#!/bin/bash
# Round-13 ask #3: root-cause td10's sf10 JVM bimodality (~38s vs ~51s
# per-JVM modes in BOTH heads, ADJUDICATION_SF10_R12). Runs N fresh
# JVMs, each benching td10_dup_clusters alone at /tmp/sf10 (the
# ADJUDICATION_SF10 child protocol: budget 1 -> exactly minRounds=3
# timed rounds after one untimed pass), with full GC logging and the
# CC escalation lines preserved — so each JVM yields (per-round times,
# GC profile, star-contraction round count) for the mode comparison.
# Usage: tools/td10_bimodal_r13.sh [n_jvms] [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-6}"
OUT="${2:-/tmp/td10_bimodal}"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== $(date -u +%H:%M:%S) JVM $i/$N" >&2
  SPARK_DRIVER_MEM=48g \
    GRAFT_JAVA_OPTS="-Xlog:gc*:file=$OUT/gc_$i.log:time,uptime" \
    SPARK_GRAFT_SF_DIR=/tmp/sf10 \
    SPARK_GRAFT_BENCH_QUERIES=td10_dup_clusters \
    SPARK_GRAFT_BENCH_BUDGET_SEC=1 \
    SPARK_GRAFT_NO_WARMUP=1 \
    SPARK_GRAFT_NO_ADJUDICATE=1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/bench_$i.json" \
    tools/runmain.sh graft.Bench > "$OUT/run_$i.log" 2>&1 || echo "JVM $i FAILED" >&2
  # '|| true': a crashed JVM leaves no matching lines, and under
  # set -e/pipefail a no-match grep would abort the remaining JVMs —
  # the exact failure the per-JVM '|| echo FAILED' exists to survive.
  { grep -E "\[bench\] round|\[graft.cc\]" "$OUT/run_$i.log" | tail -20 >&2; } || true
done
echo "done: $OUT" >&2
