#!/usr/bin/env bash
# Spill-pressure oracle sweep (round-11 verdict item 2): at 100 TB,
# external sort / hash-aggregate fallback / join-buffer spills are the
# COMMON case, but the default local sweep never triggers them — the
# whole catalog fits in the 24g heap's execution pool. This sweep re-runs
# the FULL catalog with the execution-memory pool squeezed and the
# element-count force-spill thresholds lowered, so every
# UnsafeExternalSorter-backed operator (sort, window buffer, sort-merge
# join buffer, cartesian buffer, hash-agg sort fallback) takes its spill
# path, then oracle-checks the dump against DuckDB exactly like the
# driver's gate.
#
# The knobs (all public Spark confs, applied to the HARNESS session via
# SPARK_GRAFT_EXTRA_CONF — engine code is untouched):
#   spark.memory.fraction=0.05            execution+storage pool ~5% of heap
#   spark.shuffle.spill.numElementsForceSpillThreshold=5000
#     default threshold every SQL spill-capable buffer inherits
#     (windowExec / sortMergeJoinExec / cartesianProductExec buffer
#     spill thresholds all default to it) — deterministic spills even
#     where the squeezed pool would still fit
#   spark.sql.objectHashAggregate.sortBased.fallbackThreshold=16
#     object hash aggregates (collect_list/collect_set paths) fall back
#     to sort-based after 16 in-memory groups → external sort → spill
#
# Verify prints `[verify] spilled_bytes_memory=... spilled_bytes_disk=...`
# (task-metrics sums); this script FAILS if that evidence line reports
# zero spill — a green sweep that never spilled proves nothing.
#
# Usage: scripts/spill_sweep.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/spill_verify}"
cd "$(dirname "$0")/.."

export SPARK_GRAFT_EXTRA_CONF="spark.memory.fraction=0.05;spark.shuffle.spill.numElementsForceSpillThreshold=5000;spark.sql.objectHashAggregate.sortBased.fallbackThreshold=16"

LOG="$(mktemp /tmp/spill_sweep.XXXX.log)"
scripts/run_main.sh graft.Verify "$SF_DIR" "$OUT_DIR" 2>&1 | tee "$LOG" | grep -E '^\[verify\]' || true

# `|| true`: a missing evidence line (Verify crashed before printing it)
# must reach the explicit FAIL branch below, not die silently here via
# set -e + pipefail on grep's exit 1
EVIDENCE=$(grep -o 'spilled_bytes_memory=[0-9]* spilled_bytes_disk=[0-9]*' "$LOG" | tail -1 || true)
echo "spill evidence: ${EVIDENCE:-NONE}"
# `|| true` again: with EVIDENCE empty this grep exits 1, and set -e would
# kill the script before the explicit FAIL diagnostic below (ADVICE r12)
MEM=$(echo "$EVIDENCE" | grep -o 'memory=[0-9]*' | cut -d= -f2 || true)
if [ -z "${MEM:-}" ] || [ "$MEM" -eq 0 ]; then
  echo "FAIL: sweep ran without spilling — evidence line zero/missing" >&2
  exit 2
fi

python3 scripts/check_oracle.py "$SF_DIR" "$OUT_DIR"
