#!/bin/bash
# A/B settled bench protocol — the repo's perf law (PERF.md header).
#
# Cross-round wall-clock drift on this box is dominated by MACHINE
# variance (~±20%): round 8 proved the r5→r7 "1.33× regression" was
# entirely environmental by re-measuring the identical r7-close commit
# at the r5 number.  Therefore NO cross-state perf claim is valid
# unless both states are measured interleaved on the same machine in
# the same sitting, 3 settled full-bench runs per state, medians
# compared.  This script runs that protocol.
#
# Usage:
#   scripts/bench_protocol.sh <baseline-commit> [runs] [out-prefix]
#
#   baseline-commit  git rev to compare HEAD against (state B)
#   runs             alternating run pairs per state (default 3)
#   out-prefix       where per-run PERF json lands (default /tmp/perf)
#
# Output: /tmp/perf_A{i}.json (HEAD) and /tmp/perf_B{i}.json
# (baseline) — feed the per-state medians into PERF_r{N}.json and
# compare with scripts/perf_diff.py.  Single-query follow-ups use
# scripts/standalone_measure.py (the arbiter for per-query numbers).
set -euo pipefail

BASE="${1:?usage: bench_protocol.sh <baseline-commit> [runs] [out-prefix]}"
RUNS="${2:-3}"
PREFIX="${3:-/tmp/perf}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="$REPO/.bench_baseline"

if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$BASE"
else
  git -C "$WT" checkout --detach "$BASE"
fi
trap 'git -C "$REPO" worktree remove --force "$WT" 2>/dev/null || true' EXIT

for i in $(seq 1 "$RUNS"); do
  echo "=== run A$i (HEAD) ==="
  (cd "$REPO" && SPARK_GRAFT_PERF_OUT="${PREFIX}_A$i.json" \
    python3 bench.py 2>/dev/null | tail -1)
  sleep 5
  echo "=== run B$i ($BASE) ==="
  (cd "$WT" && SPARK_GRAFT_PERF_OUT="${PREFIX}_B$i.json" \
    python3 bench.py 2>/dev/null | tail -1)
  sleep 5
done
echo "PROTOCOL DONE — medians of ${PREFIX}_A*.json vs ${PREFIX}_B*.json"
