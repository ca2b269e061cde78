#!/usr/bin/env python3
"""Local dev harness mimicking the driver's t2 gate: run each oracle SQL in
DuckDB over the testdata parquet, load the Verify.scala parquet output, and
compare (schema, rowcount, sorted-values hash). Dev-only — not part of the
Scala engine."""
import glob
import json
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional comma-separated query names (argv[3]): check only those — pairs
# with SPARK_GRAFT_VERIFY_FILTER for fast targeted loops
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
if ONLY is not None:
    unknown = ONLY - set(oracle)
    if unknown:  # a typo'd filter must not report green on zero checks
        print(f"FAIL: unknown query name(s) in filter: {sorted(unknown)}")
        sys.exit(2)
fails = 0
for name, sql in sorted(oracle.items()):
    if ONLY is not None and name not in ONLY:
        continue
    try:
        want = con.execute(sql).df()
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
        continue
    # driver sorts columns by name before hashing values
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fails += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(ws, gs, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(got)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: values differ: {str(e)[:500]}")
        fails += 1
checked = len(oracle) if ONLY is None else len(ONLY & set(oracle))
print(f"\n{checked - fails}/{checked} oracle-checked queries pass")
sys.exit(1 if fails or checked == 0 else 0)
