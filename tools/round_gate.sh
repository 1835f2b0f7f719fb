#!/usr/bin/env bash
# End-of-round bench regression gate — makes the calibrated rule in
# tools/bench_compare.py self-executing instead of invoked-by-hand.
#
#   tools/round_gate.sh [SF_DIR]         run the bench fresh, then gate
#   tools/round_gate.sh --compare-only   gate an already-fresh bench.json
#   tools/round_gate.sh --allow-dropped KEY[,KEY]   deliberate retirement
#
# Baseline: bench.json AT THE LAST ROUND-BOUNDARY COMMIT (the driver's
# "round N: ..." commit), not bare HEAD — a mid-round bench.json commit
# must not silently rebase the bar for the rest of the round (the
# ratchet leak flagged in the r10 verdict). HEAD is the fallback when
# no boundary commit carries a bench.json yet. Flow: resolve baseline,
# run graft.Bench (which writes the tracked bench.json with all three
# timed passes per key), then apply bench_compare.py old->new. Exit 1
# on any regression candidate or non-allowlisted vanished key, so the
# end-of-round sequence
#   tools/round_gate.sh && git commit ...
# refuses to ship a regressed bench artifact without a triage note.
# The gate's stdout is the round's bench record — commit it (PERF.md
# bench notes) alongside bench.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="/root/testdata/sf0.1"
COMPARE_ONLY=0
COMPARE_ARGS=()
while [ $# -gt 0 ]; do
  case "$1" in
    --compare-only) COMPARE_ONLY=1 ;;
    --allow-dropped)
      # an empty/missing value would silently no-op the retirement
      # allowlist and mis-shift the remaining args (r11 advice)
      if [ $# -lt 2 ] || [ -z "$2" ] || [ "${2#--}" != "$2" ]; then
        echo "round_gate: --allow-dropped needs KEY[,KEY], got '${2:-}'" >&2
        exit 2
      fi
      COMPARE_ARGS+=("--allow-dropped" "$2"); shift ;;
    *) SF_DIR="$1" ;;
  esac
  shift
done

OLD=$(mktemp /tmp/bench_prev.XXXXXX.json)
trap 'rm -f "$OLD"' EXIT
BASE_COMMIT=$(git log -n1 --format=%H -E --grep='^round [0-9]+:' || true)
if [ -z "$BASE_COMMIT" ] ||
   ! git show "$BASE_COMMIT:bench.json" > "$OLD" 2>/dev/null; then
  BASE_COMMIT=HEAD
  if ! git show HEAD:bench.json > "$OLD" 2>/dev/null; then
    echo "round_gate: no committed bench.json reachable — nothing to gate" >&2
    exit 2
  fi
fi
echo "round_gate: baseline = bench.json at $(git log -n1 --format='%h (%s)' "$BASE_COMMIT")"

if [ "$COMPARE_ONLY" -eq 0 ]; then
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench"
fi

echo "== round_gate: baseline bench.json -> working-tree bench.json =="
python3 tools/bench_compare.py "${COMPARE_ARGS[@]+"${COMPARE_ARGS[@]}"}" "$OLD" bench.json
