#!/usr/bin/env bash
# End-of-round bench regression gate — makes the calibrated rule in
# tools/bench_compare.py self-executing instead of invoked-by-hand.
#
#   tools/round_gate.sh [SF_DIR]         run the bench fresh, then gate
#   tools/round_gate.sh --compare-only   gate an already-fresh bench.json
#
# Flow: snapshot the last COMMITTED bench.json (git show HEAD), run
# graft.Bench (which writes the tracked bench.json with all three timed
# passes per key), then apply bench_compare.py old->new. Exit 1 on any
# regression candidate, so the end-of-round sequence
#   tools/round_gate.sh && git commit ...
# refuses to ship a regressed bench artifact without a triage note.
# The gate's stdout is the round's bench record — commit it (PERF.md
# bench notes) alongside bench.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="/root/testdata/sf0.1"
COMPARE_ONLY=0
for a in "$@"; do
  case "$a" in
    --compare-only) COMPARE_ONLY=1 ;;
    *) SF_DIR="$a" ;;
  esac
done

OLD=$(mktemp /tmp/bench_prev.XXXXXX.json)
trap 'rm -f "$OLD"' EXIT
if ! git show HEAD:bench.json > "$OLD" 2>/dev/null; then
  echo "round_gate: no committed bench.json at HEAD — nothing to gate" >&2
  exit 2
fi

if [ "$COMPARE_ONLY" -eq 0 ]; then
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench"
fi

echo "== round_gate: HEAD bench.json -> working-tree bench.json =="
python3 tools/bench_compare.py "$OLD" bench.json
