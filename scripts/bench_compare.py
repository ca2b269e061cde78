#!/usr/bin/env python3
"""Drift-normalized bench comparison (round-11 verdict item 6): compare two
bench_out.json artifacts per-query, dividing the new run's times by the
host-drift ratio (new calib / ref calib) first, so a flagged ratio is a
code regression, not a slower host-day. Bench totals on this box drift
~10% between days while same-day runs agree within 1% (ROUNDLOG lesson
15) — raw cross-day ratios are noise below ~1.15x.

Queries sitting at a declared structural floor (the artifact's "floors"
map) are exempt below floor * slack: their cost is machinery semantics
(e.g. the left-outer stream-stream join's two mandatory trigger
executions), not a tunable.

Usage: scripts/bench_compare.py REF.json NEW.json [flag_ratio]
Exit 1 iff any non-floor query regresses above flag_ratio (default 1.5)
after normalization AND by more than an absolute 0.3 s (sub-floor
absolute deltas are planning/codegen jitter).
"""
import json
import statistics
import sys

ref_f, new_f = sys.argv[1], sys.argv[2]
flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

ref = json.load(open(ref_f))
new = json.load(open(new_f))


def calib_of(run):
    # MEDIAN of the per-chunk anchor samples when available (r14 finding):
    # "calib" is a min over ~25 chunks while each query is a min over 6
    # samples — the asymmetric min-statistic lets one lucky chunk understate
    # a slow host-day and overstate every normalized ratio uniformly.
    cs = run.get("calib_samples")
    if cs and len(cs) >= 5:
        return statistics.median(cs)
    return run.get("calib")


calib_ref = calib_of(ref)
calib_new = calib_of(new)
drift = (calib_new / calib_ref) if calib_ref and calib_new else 1.0
floors = new.get("floors", {}) or {}

print(f"calib(median) ref={calib_ref:.3f} new={calib_new:.3f} host_drift={drift:.3f}")
print(f"total ref={ref['value']:.1f}s new={new['value']:.1f}s "
      f"raw={new['value']/ref['value']:.3f}x "
      f"normalized={new['value']/drift/ref['value']:.3f}x")

rows = []
for name, t_ref in sorted(ref["queries"].items()):
    if name not in new["queries"]:
        rows.append((float("inf"), name, t_ref, None))
        continue
    t_new_norm = new["queries"][name] / drift
    rows.append((t_new_norm / t_ref if t_ref > 0 else float("inf"),
                 name, t_ref, t_new_norm))

rows.sort(reverse=True)
# Flag over ALL rows; the 25-row cap limits only the PRINTOUT (plus any
# flagged row beyond it). Capping the flag loop itself would let a real
# regression hide behind 25 high-ratio/low-delta fast queries and exit 0.
regressions = 0
lines = []
for ratio, name, t_ref, t_new in rows:
    if t_new is None:
        lines.append((True, f"{name:34s} {t_ref:7.2f}  MISSING"))
        regressions += 1
        continue
    at_floor = name in floors and t_new <= floors[name] * 1.3
    flag = ""
    flagged = False
    if ratio > flag_ratio and (t_new - t_ref) > 0.3 and not at_floor:
        flag = "  << REGRESSION?"
        flagged = True
        regressions += 1
    elif at_floor:
        flag = "  (structural floor)"
    lines.append((flagged,
                  f"{name:34s} {t_ref:7.2f} {t_new:9.2f} {ratio:6.2f}x{flag}"))
print(f"\n{'query':34s} {'ref':>7s} {'new/drift':>9s} {'ratio':>7s}")
for i, (flagged, line) in enumerate(lines):
    if i < 25 or flagged:
        print(line)
print(f"\n{regressions} normalized regression(s) above {flag_ratio}x")
sys.exit(1 if regressions else 0)
