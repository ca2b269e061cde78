#!/usr/bin/env python3
"""Pseudo-scale smoke comparison (round-11 verdict item 4): given a bench
JSON from the replicated dir (scripts/scale_smoke.py) and a baseline bench
JSON at 1x, print per-query scaling factors and flag superlinear outliers.

A factor of ~REP means linear in data volume; << REP means fixed-cost
dominated (fine); >> REP suggests superlinear work — diagnose the plan.
Fixed per-query overhead (codegen, planning, AQE) is ~0.1-0.3 s here, so
factors are only meaningful for queries above `--floor` seconds at 1x.

Usage: scripts/scale_compare.py BASE.json SCALED.json [REP] [floor_sec]
"""
import json
import sys

base_f, scaled_f = sys.argv[1], sys.argv[2]
rep = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

base = json.load(open(base_f))["queries"]
scaled = json.load(open(scaled_f))["queries"]

rows = []
missing = []
for name, t1 in sorted(base.items()):
    if name not in scaled:
        # a query with no scaled timing is the MOST interesting row (it
        # crashed or was dropped at scale) — never skip it silently
        missing.append(name)
        continue
    t8 = scaled[name]
    factor = t8 / t1 if t1 > 0 else float("inf")
    rows.append((factor, name, t1, t8))

rows.sort(reverse=True)
print(f"{'query':34s} {'1x':>7s} {'scaled':>8s} {'factor':>7s}")
outliers = 0
for factor, name, t1, t8 in rows:
    flag = ""
    if t1 >= floor and factor > rep * 1.5:
        flag = "  << SUPERLINEAR?"
        outliers += 1
    print(f"{name:34s} {t1:7.2f} {t8:8.2f} {factor:6.1f}x{flag}")
if missing:
    # deliberate exclusions (e.g. the O(n^2) ground-truth twin) show up
    # here too — the point is visibility, so exit stays keyed to outliers
    print(f"\nMISSING from scaled run ({len(missing)}): {', '.join(missing)}")
print(f"\n{outliers} outlier(s) above {rep * 1.5:.0f}x with 1x-time >= {floor}s "
      f"(rep={rep:.0f})")
sys.exit(1 if outliers else 0)
