#!/usr/bin/env python3
"""Meta-test of the oracle checkers (r12 verdict item 4): the sweep's
credibility rests on check_oracle.py / check_oracle_par.py actually CATCHING
wrongness, so seed known defects into a copy of a real Verify dump and
assert FAIL is reported for exactly the seeded queries — plus exercise the
TIMEOUT path and the zero-checks guard. Dev/CI harness — not engine code.

Usage: python3 scripts/check_oracle_meta.py [SF_DIR] [OUT_DIR]
  SF_DIR  testdata dir the dump was made from (default /root/testdata/sf0.01)
  OUT_DIR an existing Verify dump (default /tmp/verify_out)

Exit 0 iff every meta-assertion holds.
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SCRIPTS = Path(__file__).parent

# victims: small, fast-oracle queries so the meta-test itself is quick.
# CONTROL stays untouched — the checker must still pass it (a checker that
# fails everything would also "catch" the seeds).
DROP_ROW = "dedup_exact"            # remove one row → rowcount mismatch
PERTURB = "agg_suite"               # nudge one numeric cell → hash mismatch
TIE_FLIP = "arg_max"                # swap the tie-broken key col → value mismatch
CONTROL = "distinct_flags"
VICTIMS = [DROP_ROW, PERTURB, TIE_FLIP, CONTROL]
# heavy oracle for the TIMEOUT leg (its recursive closure takes minutes in
# DuckDB at sf0.01 — a 1 s cap must report TIMEOUT, not hang or pass)
HEAVY = "dedup_corpus"

failures = []


def check(cond, msg):
    print(("ok   " if cond else "FAIL ") + msg)
    if not cond:
        failures.append(msg)


def read_one(name, root):
    files = glob.glob(f"{root}/{name}/*.parquet")
    assert files, f"no parquet under {root}/{name}"
    return files, pd.read_parquet(files[0])


def run_checker(script, out_dir, only=None, extra=None):
    cmd = [sys.executable, str(SCRIPTS / script), SF_DIR, out_dir]
    if script == "check_oracle.py":
        if only:
            cmd.append(",".join(only))
    else:
        if only:
            cmd += ["--only", ",".join(only)]
    cmd += extra or []
    p = subprocess.run(cmd, capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
for v in VICTIMS + [HEAVY]:
    assert v in oracle, f"victim {v} missing from oracle_sql.json"

with tempfile.TemporaryDirectory(prefix="oracle-meta-") as tmp:
    # copy the victims' outputs + a victims-only oracle map
    for v in VICTIMS + [HEAVY]:
        shutil.copytree(f"{OUT_DIR}/{v}", f"{tmp}/{v}")
    json.dump({v: oracle[v] for v in VICTIMS + [HEAVY]},
              open(f"{tmp}/oracle_sql.json", "w"))

    # sanity: the pristine copy passes (otherwise the seeds prove nothing)
    rc, out = run_checker("check_oracle.py", tmp, only=VICTIMS)
    check(rc == 0 and out.count("OK ") >= 4, "pristine copy passes the serial gate")

    # seed 1: drop one row
    files, df = read_one(DROP_ROW, tmp)
    df.iloc[1:].to_parquet(files[0], index=False)
    # seed 2: perturb one numeric cell in the first float/int column
    files, df = read_one(PERTURB, tmp)
    num = [c for c in df.columns if df[c].dtype.kind in "if"][0]
    df.loc[df.index[0], num] = df.loc[df.index[0], num] + 1
    df.to_parquet(files[0], index=False)
    # seed 3: flip the tie-break — swap the key column's first two values,
    # simulating an arg_max that picked a different row under a tied measure
    files, df = read_one(TIE_FLIP, tmp)
    keycol = df.columns[0]
    if len(df) >= 2:
        a, b = df.loc[df.index[0], keycol], df.loc[df.index[1], keycol]
        df.loc[df.index[0], keycol], df.loc[df.index[1], keycol] = b, a
    df.to_parquet(files[0], index=False)

    for script in ("check_oracle.py", "check_oracle_par.py"):
        rc, out = run_checker(script, tmp, only=VICTIMS)
        check(rc != 0, f"{script}: perturbed dump exits non-zero")
        for v in (DROP_ROW, PERTURB, TIE_FLIP):
            check(any(l.startswith("FAIL") and v in l for l in out.splitlines()),
                  f"{script}: seeded defect in {v} reported FAIL")
        check(any(l.startswith("OK") and CONTROL in l for l in out.splitlines()),
              f"{script}: untouched control {CONTROL} still OK")

    # TIMEOUT leg: 1 s cap on the heavy recursive-closure oracle
    rc, out = run_checker("check_oracle_par.py", tmp, only=[HEAVY],
                          extra=["--timeout", "1"])
    check(rc != 0 and "TIMEOUT" in out,
          "check_oracle_par.py: 1 s cap on heavy oracle reports TIMEOUT, non-zero")

    # zero-checks guard: an empty oracle map must NOT report green
    with tempfile.TemporaryDirectory(prefix="oracle-meta-empty-") as empty:
        json.dump({}, open(f"{empty}/oracle_sql.json", "w"))
        rc, out = run_checker("check_oracle_par.py", empty)
        check(rc != 0, "check_oracle_par.py: empty oracle map exits non-zero")

print(f"\n{'META PASS' if not failures else 'META FAIL'}: "
      f"{len(failures)} assertion(s) failed")
sys.exit(1 if failures else 0)
