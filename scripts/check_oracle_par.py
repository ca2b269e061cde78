#!/usr/bin/env python3
"""Parallel per-query oracle check (round-12): same gate as
check_oracle.py, but each query runs in its own subprocess with a wall
timeout, N at a time. Exists for the pseudo-scale sweeps, where a handful
of text-sketch oracle replays (gram x minhash materialization, quadratic
pair lists) cost minutes-to-hours of DuckDB CPU and would serialize the
other ~190 fast checks behind them. A timed-out query reports TIMEOUT —
it is NOT green; either re-run it alone with a bigger budget or record
why the oracle (not the engine) is the bottleneck.

Usage: check_oracle_par.py SF_DIR OUT_DIR [--jobs N] [--timeout SECS]
                           [--only a,b,c] [--skip a,b,c]
--skip exists for oracle BUDGETS, not for hiding failures: a skipped
query is printed loudly as SKIP with the count in the summary line, and
the caller must record why the oracle (not the engine) is the cost (see
verify_matrix.sh scale8_fd — the recursive-CTE corpus replays cost ~80
DuckDB-minutes at 8x while the same machinery is already verified by the
cheaper entries' oracles at 8x and by the corpus entries at 2x).
Dev harness only — the engine never reads this code.
"""
import argparse
import json
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ap = argparse.ArgumentParser()
ap.add_argument("sf_dir")
ap.add_argument("out_dir")
ap.add_argument("--jobs", type=int, default=8)
ap.add_argument("--timeout", type=float, default=1800)
ap.add_argument("--only", default=None)
ap.add_argument("--skip", default=None)
args = ap.parse_args()

oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
names = sorted(oracle)
if args.only:
    only = set(args.only.split(","))
    unknown = only - set(names)
    if unknown:
        print(f"FAIL: unknown query name(s) in filter: {sorted(unknown)}")
        sys.exit(2)
    names = sorted(only)
skipped = []
if args.skip:
    skip = set(args.skip.split(","))
    unknown = skip - set(names)
    if unknown:
        print(f"FAIL: unknown query name(s) in --skip: {sorted(unknown)}")
        sys.exit(2)
    skipped = sorted(skip)
    for n in skipped:
        print(f"SKIP {n} (oracle budget — see --skip caller for rationale)")
    names = sorted(set(names) - skip)

script = str(Path(__file__).with_name("check_oracle.py"))

def run(name):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, script, args.sf_dir, args.out_dir, name],
            capture_output=True, text=True, timeout=args.timeout)
        out = (p.stdout + p.stderr).strip().splitlines()
        # check_oracle prints per-query OK/FAIL lines then a summary line
        line = next((l for l in out if l.startswith(("OK", "FAIL"))),
                    f"FAIL {name}: no output (rc={p.returncode})")
        return name, line, time.time() - t0
    except subprocess.TimeoutExpired:
        return name, f"TIMEOUT {name}: oracle exceeded {args.timeout:.0f}s", \
            time.time() - t0

ok = fails = timeouts = 0
with ThreadPoolExecutor(max_workers=args.jobs) as ex:
    for name, line, secs in ex.map(run, names):
        print(f"{line}  [{secs:.1f}s]", flush=True)
        if line.startswith("OK"):
            ok += 1
        elif line.startswith("TIMEOUT"):
            timeouts += 1
        else:
            fails += 1
skip_note = f", {len(skipped)} SKIPPED({','.join(skipped)})" if skipped else ""
print(f"{ok}/{len(names)} OK, {fails} FAIL, {timeouts} TIMEOUT{skip_note}")
# ok > 0 mirrors the serial gate: an empty/truncated oracle_sql.json must
# not report green on zero checks (ADVICE r12)
sys.exit(0 if fails == 0 and timeouts == 0 and ok > 0 else 1)
