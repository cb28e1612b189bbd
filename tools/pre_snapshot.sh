#!/usr/bin/env bash
# Pre-snapshot gate (round-11 verdict item 2): refuse a round-end
# commit unless BOTH verification surfaces are green —
#   1. the full ScalaTest suite (`sbt test`, exit 0), and
#   2. the driver-contract oracle gate (graft.Verify at sf0.01 +
#      tools/check_oracle.py over DuckDB).
# Rationale: q210 landed with its own OpsSpec green while a
# cross-cutting plan-guard spec silently reddened — the full suite
# must run before ANY end-of-round snapshot.
#
# Usage:  tools/pre_snapshot.sh            # gate only (exit 0 = safe)
#         tools/pre_snapshot.sh "message"  # gate, then commit -am
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/pre_snapshot.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

echo "[pre-snapshot] 1/2 full test suite..."
sbt -batch test

echo "[pre-snapshot] 2/2 oracle gate at $SF_DIR..."
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR/verify"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR/verify"

echo "[pre-snapshot] 3/3 cross-round bench median diff (informational)..."
# round-13 verdict item 3: the in-run spread gates cannot see a clean
# cross-round regression (q93 slipped both); diff the new bench record
# against the last committed one and PRINT any query >1.5x its prior
# median with low spread. Informational — weather still needs a human
# read — but the table must be in every pre-snapshot log.
python3 tools/bench_diff.py bench_history/detail_sf0.1.json || true
# round-15 verdict item 6: the sf1 suite record catches scale-sensitive
# regressions the 0.1 suite cannot (q251's 60-bit-key win was found at
# the next decade); diff it too whenever a committed record exists.
if [[ -f bench_history/detail_sf1-bench.json ]]; then
  python3 tools/bench_diff.py bench_history/detail_sf1-bench.json || true
fi

echo "[pre-snapshot] green: suite + oracle both pass."
if [[ $# -ge 1 ]]; then
  git add -u
  git commit -m "$1"
fi
