#!/usr/bin/env bash
# Forced-fallback oracle sweep (round-11 verdict item 1): run the FULL
# query catalog with every driver-side size gate forced to its distributed
# branch (graft.ScaleGates — pageRank vector path, connectedComponents
# union-find, groupedMedianMad collect, and the kCore / triangleStats /
# Distribution broadcast gates all take the 100 TB code path), then
# oracle-check the dump against DuckDB exactly like the driver's gate.
#
# Usage: scripts/forced_fallback_sweep.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/forced_verify}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_FORCE_DISTRIBUTED=1 sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 scripts/check_oracle.py "$SF_DIR" "$OUT_DIR"
