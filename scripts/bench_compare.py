#!/usr/bin/env python3
"""Drift-normalized bench comparison (round-11 verdict item 6): compare two
bench_out.json artifacts per-query, dividing the new run's times by the
host-drift ratio (new calib / ref calib) first, so a flagged ratio is a
code regression, not a slower host-day. Bench totals on this box drift
~10% between days while same-day runs agree within 1% (ROUNDLOG lesson
15) — raw cross-day ratios are noise below ~1.15x.

Round-15 methodology lock-in (r14 verdict item 5):
- BOTH the min- and median-normalized total ratios are printed, and the
  run FAILS LOUDLY when their verdicts diverge by >10% — the r14 lesson
  was that the two estimators disagreeing IS the signal that the host
  day is skewed, and the choice between them must never again be made
  silently in the same round it flatters.
- A designated sibling-ratio pair (fingerprint_overlap / dedup_minhash —
  two queries dominated by the same sketch kernels) is printed for both
  runs as the normalization-FREE drift sentinel: a code regression moves
  the pair's ratio, a host-day shift does not.
- Per-query normalization uses the median when BOTH runs carry >=5 calib
  samples, else falls back to min-based calib for BOTH (ADVICE r14:
  mixing median(new)/min(ref) inflates drift and can mask a regression).

Queries sitting at a declared structural floor are exempt below
floor * slack: their cost is machinery semantics (e.g. the left-outer
stream-stream join's two mandatory trigger executions), not a tunable.
Floors are calib-anchored since r15 ("floors_calib", in units of the
run's calib_median; slack 1.1); legacy absolute floors keep the old 1.3.

Usage: scripts/bench_compare.py REF.json NEW.json [flag_ratio]
Exit 1 iff any non-floor query regresses above flag_ratio (default 1.5)
after normalization AND by more than an absolute 0.3 s, or the two
normalizers' total verdicts diverge by >10%.
"""
import json
import statistics
import sys

ref_f, new_f = sys.argv[1], sys.argv[2]
flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

ref = json.load(open(ref_f))
new = json.load(open(new_f))


def calibs_of(run):
    """(min_calib, median_calib_or_None) for one artifact."""
    cs = run.get("calib_samples")
    med = statistics.median(cs) if cs and len(cs) >= 5 else None
    return run.get("calib"), med


min_ref, med_ref = calibs_of(ref)
min_new, med_new = calibs_of(new)

drift_min = (min_new / min_ref) if min_ref and min_new else 1.0
# the median normalizer only exists when BOTH sides have real sample sets
# (ADVICE r14: median/min cross-format mixing inflates drift)
drift_med = (med_new / med_ref) if med_ref and med_new else None
# per-query normalization: median when available on both, else min
drift = drift_med if drift_med is not None else drift_min
floors = new.get("floors", {}) or {}
floor_slack = 1.1 if new.get("floors_calib") else 1.3

raw = new["value"] / ref["value"]
print(f"calib(min)    ref={min_ref:.3f} new={min_new:.3f} drift={drift_min:.3f} "
      f"-> total {raw / drift_min:.3f}x")
if drift_med is not None:
    print(f"calib(median) ref={med_ref:.3f} new={med_new:.3f} drift={drift_med:.3f} "
          f"-> total {raw / drift_med:.3f}x")
print(f"total ref={ref['value']:.1f}s new={new['value']:.1f}s raw={raw:.3f}x "
      f"(normalizing per-query by {'median' if drift_med is not None else 'min'})")

# normalization-free drift sentinel: the ratio of two same-kernel queries
# is invariant under uniform host drift, so a moved sibling ratio is code
SIBLINGS = ("fingerprint_overlap", "dedup_minhash")
diverged = False
a, b = SIBLINGS
if all(q in r.get("queries", {}) for r in (ref, new) for q in SIBLINGS):
    sib_ref = ref["queries"][a] / ref["queries"][b]
    sib_new = new["queries"][a] / new["queries"][b]
    print(f"sibling {a}/{b}: ref={sib_ref:.3f} new={sib_new:.3f} "
          f"({sib_new / sib_ref:.3f}x — normalization-free)")

if drift_med is not None:
    vmin, vmed = raw / drift_min, raw / drift_med
    if abs(vmin - vmed) / min(vmin, vmed) > 0.10:
        diverged = True
        print(f"!! NORMALIZER DIVERGENCE: min says {vmin:.3f}x, median says "
              f"{vmed:.3f}x (>10% apart) — the host day is skewed; adjudicate "
              f"with the sibling ratio and solo re-runs before trusting either")

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
    # floors are resolved for the NEW run's host-day (calib-anchored since
    # r15), so the floor test uses the RAW new time, not the normalized one
    t_new_raw = new["queries"][name]
    at_floor = name in floors and t_new_raw <= floors[name] * floor_slack
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
print(f"\n{regressions} normalized regression(s) above {flag_ratio}x"
      + ("; NORMALIZER DIVERGENCE" if diverged else ""))
sys.exit(1 if (regressions or diverged) else 0)
