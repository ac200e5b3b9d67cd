#!/bin/bash
# Prove the degraded-host adjudication path end-to-end (VERDICT r15
# ask 5): the committed ADJUDICATION_R15.json was incomplete — its
# fixed child-JVM cap starved both prev-head children on a degraded
# host, and the adaptive cap that replaced it (grow to 1.5x the
# longest completed child, e81e895) had never completed a
# gate-TRIGGERED run. This script forces exactly that condition on
# purpose:
#
#   - a full-suite driver-shape bench at sf0.1 (subset empty, budget
#     >= reserve, prev-head jar present — all three adjudication
#     enable conditions), while
#   - a load injector cycles CPU-burner bursts (24 spinners, 45 s on /
#     45 s off) for the WHOLE wall — bursty degradation breaks the
#     best-3 round spread past the 10% gate during the timed rounds,
#     and keeps degrading the interleaved A/B children during the
#     overtime, which is precisely the regime that starved r15's
#     children.
#
# Success = ADJUDICATION_R16.json with non-null children on BOTH
# heads and a verdict that is not "incomplete" — copied to
# ADJUDICATION_R16_FORCED.json so the driver's own end-of-round
# adjudication (if its gate fails) cannot clobber the evidence.
# The prev jar is the r14-era snapshot (tools/prevhead, commit
# 5c07ff0) — a REAL pair; the expected per-query ratios on the
# unchanged td10/t12/t11 families are ~1.
set -uo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

SNAP=/tmp/r16_adj_classes
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"

burn() {  # $1 = seconds, 24 spinners
  for i in $(seq 1 24); do
    (end=$((SECONDS + $1)); while [ $SECONDS -lt $end ]; do :; done) &
  done
  wait
}

step "launching full-suite bench at sf0.1 (gate 10%, reserve 600s)"
GRAFT_CLASSES="$SNAP" SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_BUDGET_SEC=700 \
  SPARK_GRAFT_ADJ_RESERVE_SEC=600 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_forcedadj.json \
  tools/runmain.sh graft.Bench > /tmp/bench_r16_forcedadj.out 2> /tmp/bench_r16_forcedadj.err &
BENCH_PID=$!

step "load injector: 24-spinner bursts, 45s on / 45s off, until bench exits"
while kill -0 "$BENCH_PID" 2>/dev/null; do
  burn 45
  kill -0 "$BENCH_PID" 2>/dev/null || break
  sleep 45
done
wait "$BENCH_PID"; rc=$?
step "bench+overtime done rc=$rc"
if [ -f ADJUDICATION_R16.json ]; then
  cp ADJUDICATION_R16.json ADJUDICATION_R16_FORCED.json
  step "artifact:"; cat ADJUDICATION_R16.json >&2
else
  step "NO ADJUDICATION ARTIFACT — gate likely passed; inspect /tmp/bench_r16_forcedadj.err"
  tail -5 /tmp/bench_r16_forcedadj.err >&2
  exit 2
fi
