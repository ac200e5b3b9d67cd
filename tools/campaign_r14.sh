#!/bin/bash
# Round-14 scale campaign — the FULL suite at sf10 (VERDICT r13 ask 4).
# BENCH_SF10.json so far covered the 23 flagship dedup/ANN queries; this
# measures every benchable query (147 of 152 at sf10; the gated exact
# baselines are factor-gated by Bench itself — td2/v2/v5 from sf1,
# v1/v11 from sf10 where their all-pairs dense arms hit 400M pairs)
# at the 100× point.
#
# PROTOCOL, priced by this round's own measurements. The r13 td10
# probe demanded ≥3 fresh JVMs per sf10 measurement (fresh-JVM minima
# spread ±4.8% on identical code). The full suite priced that rule: a
# fresh JVM's first full-suite pass costs ~65 min against 26–37 min
# timed rounds (whole-stage-codegen compilation across 147 queries —
# the sf1 cold/warm ratio is only ~1.25×), so three full-suite fresh
# JVMs cost ~6 h, two-thirds of it warm-up. The rule amortizes on
# subsets, not the full surface:
#   - JVM A: the FULL suite, one untimed pass + 2 timed rounds
#     (SPARK_GRAFT_BENCH_MIN_ROUNDS=2) → BENCH_SF10.json — the
#     authoritative per-query decade table (single-JVM; each tail
#     query is seconds-scale where fresh-JVM amplitude is ms).
#   - JVM B (and C when the wall allows): the three heaviest queries
#     (t11, td11, td10 — the cross-JVM-amplitude-prone paths) →
#     BENCH_SF10_JVMBRACKET.json via graft.BenchMergeJvms when ≥2
#     bracket JVMs exist; with JVM A's same three entries that is
#     2–3 fresh JVMs on every query whose amplitude has ever
#     mattered (MEASUREMENTS_R14.json carries the per-query ratios).
# Serialized on purpose: every step owns the host.
# Prereqs: /tmp/sf1 and /tmp/sf10 synthesized (graft.SynthScale, see
# .claude/skills/verify/SKILL.md 3b), sbt compile green.
set -euo pipefail
cd "$(dirname "$0")/.."
step() { echo "=== $(date -u +%H:%M:%S) $*" >&2; }

HEAVY3="t11_bm25_topk,td11_minhash_vs_base,td10_dup_clusters"

step "1/4 sf1 full suite (exponent denominators, r14 head)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json \
  SPARK_GRAFT_NO_ADJUDICATE=1 \
  tools/runmain.sh graft.Bench

step "2/4 sf10 full suite, fresh JVM A (2 timed rounds)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_jvmA.json \
  SPARK_GRAFT_BENCH_BUDGET_SEC=299 \
  SPARK_GRAFT_BENCH_MIN_ROUNDS=2 \
  SPARK_GRAFT_NO_ADJUDICATE=1 \
  tools/runmain.sh graft.Bench
cp /tmp/bench_sf10_jvmA.json BENCH_SF10.json

# JVM C is OPTIONAL: it runs only when the remaining wall allows
# (CAMPAIGN_DEADLINE_EPOCH unset = always run it; set it to a `date +%s`
# deadline to let a tight window ship a 2-JVM bracket instead of dying
# under set -e with nothing). The r14 session in fact cut C by hand and
# the committed artifact (BENCH_SF10_HEAVY3_JVMB.json, fresh_jvms:2)
# reflects that path; this guard makes the script match what a bounded
# wall actually permits.
BRACKET_FILES=""
for j in B C; do
  if [ "$j" = C ] && [ -n "${CAMPAIGN_DEADLINE_EPOCH:-}" ] \
     && [ "$(date +%s)" -ge "$CAMPAIGN_DEADLINE_EPOCH" ]; then
    step "3/4 skipping optional JVM C: past CAMPAIGN_DEADLINE_EPOCH"
    continue
  fi
  step "3/4 sf10 heavy-3 bracket, fresh JVM $j"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf10 \
    SPARK_GRAFT_BENCH_QUERIES="$HEAVY3" \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_jvm$j.json \
    SPARK_GRAFT_BENCH_BUDGET_SEC=299 \
    SPARK_GRAFT_BENCH_MIN_ROUNDS=2 \
    SPARK_GRAFT_NO_ADJUDICATE=1 \
    tools/runmain.sh graft.Bench
  BRACKET_FILES="$BRACKET_FILES /tmp/bench_sf10_jvm$j.json"
done

# output name matches the committed artifact family (BENCH_SF10_HEAVY3_*)
step "4/4 merge the bracket JVMs -> BENCH_SF10_HEAVY3_BRACKET.json"
# shellcheck disable=SC2086  # word-splitting the file list is intended
tools/runmain.sh graft.BenchMergeJvms BENCH_SF10_HEAVY3_BRACKET.json \
  $BRACKET_FILES

step "campaign done"
