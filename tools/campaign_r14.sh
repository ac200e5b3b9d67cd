#!/bin/bash
# Round-14 scale campaign — the FULL suite at sf10 (VERDICT r13 ask 4).
# BENCH_SF10.json so far covered the 23 flagship dedup/ANN queries; this
# measures every benchable query (147 of 152 at sf10; the five
# documented brute-force baselines are factor-gated by Bench itself —
# td2/v2/v5 from sf1, v1/v11 from sf10 where their all-pairs dense
# arms hit 400M pairs) at the 100× point, under the protocol the r13
# td10 probe wrote into
# MEASUREMENTS_R13.json: ≥3 fresh JVMs per sf10 measurement, because
# fresh-JVM minima of a single query spread ±4.8% on identical code.
# Each JVM runs the complete graft.Bench machinery (sf0.001 JIT warm-up,
# untimed scale passes, ≥3 interleaved timed rounds, per-query min);
# graft.BenchMergeJvms folds the three artifacts into BENCH_SF10.json
# with per-JVM provenance and the cross-JVM bracket.
# Serialized on purpose: every step owns the host.
# Prereqs: /tmp/sf1 and /tmp/sf10 synthesized (graft.SynthScale, see
# .claude/skills/verify/SKILL.md 3b), sbt compile green.
set -euo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

step "1/5 sf1 full suite (exponent denominators, r14 head)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json \
  SPARK_GRAFT_NO_ADJUDICATE=1 \
  tools/runmain.sh graft.Bench

# Budget 299, sized from the measured sf1 full-suite round (~422 s ×
# the 0.3-0.6 family exponents ⇒ an sf10 round costs ~750-1150 s):
# a >=720 s budget raises minRounds to 6, which can NEVER fit at that
# round cost — the per-JVM gate would fail by construction — and
# >=300 adds a second untimed full-suite pass (~15 min/JVM) that a
# 900-s first pass already covers for C2 (the "rounds still declining
# after one pass" finding was measured on ~100-s sf0.1 passes).
# 299 ⇒ one untimed pass + exactly the 3-round floor, gate
# satisfiable, ~65 min/JVM; the merged artifact still carries
# 3 JVMs × 3 rounds = 9 round samples per query.
for i in 1 2 3; do
  step "$((i+1))/5 sf10 full suite, fresh JVM $i/3"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_jvm$i.json \
    SPARK_GRAFT_BENCH_BUDGET_SEC=299 \
    SPARK_GRAFT_NO_ADJUDICATE=1 \
    tools/runmain.sh graft.Bench
done

step "5/5 merge the three JVMs -> BENCH_SF10.json"
tools/runmain.sh graft.BenchMergeJvms BENCH_SF10.json \
  /tmp/bench_sf10_jvm1.json /tmp/bench_sf10_jvm2.json /tmp/bench_sf10_jvm3.json

step "campaign done"
