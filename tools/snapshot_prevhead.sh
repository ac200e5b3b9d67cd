#!/bin/bash
# Snapshot the CURRENT compiled classes as the "previous HEAD" artifact
# the bench self-adjudication protocol re-pairs against
# (graft.Adjudicate, the automated form of the 4cb35fa interleaved
# re-pair). Run at the END of a round, on the round's final commit, so
# the next round's driver bench can bracket any code-vs-host delta by
# alternating current-HEAD / prev-HEAD JVMs on one host session.
#
# Usage: tools/snapshot_prevhead.sh   (from anywhere)
set -euo pipefail
cd "$(dirname "$0")/.."
if ! git diff --quiet || ! git diff --cached --quiet; then
  echo "warning: working tree dirty - the jar will not match HEAD exactly" >&2
fi
sbt -batch compile >/dev/null
commit=$(git rev-parse HEAD)
mkdir -p tools/prevhead
jar cf tools/prevhead/graft-prev.jar -C target/scala-2.13/classes .
printf '{"commit":"%s","built_utc":"%s"}\n' "$commit" "$(date -u +%FT%TZ)" \
  > tools/prevhead/meta.json
echo "snapshot: tools/prevhead/graft-prev.jar @ $commit"
