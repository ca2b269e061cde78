#!/usr/bin/env python3
"""Pseudo-scale smoke fixture (round-11 verdict item 4): replicate an SF dir
REP times into OUT with per-replica KEY SHIFTS, so fact-fact joins stay
linear (duplicating keys verbatim would square the join fanout and fake a
superlinear plan). Dev harness only — the engine never reads this code.

Key model per replica r:
  - every PK and the FKs that reference it shift by r * span(table)
  - nation/region (bounded dims) keep their keys: replicas share them,
    like a real corpus growing under fixed reference data
  - events shift event_id and user_id (more users, same time range —
    window/session group counts scale linearly)
  - documents/embeddings shift ids only; text/vectors repeat verbatim
    (8x duplicate groups stress the dedup/ANN bucket caps honestly)

Usage: scripts/scale_smoke.py [SRC] [OUT] [REP]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale8"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 8

con = duckdb.connect()

def span(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

S = {t: span(t, k) for t, k in [
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("events", "event_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id")]}
US = span("events", "user_id")

# per-table select with shifted key expressions ({r} substituted per replica)
SHIFT = {
    "region": None,   # copied verbatim (shared dims)
    "nation": None,
    "customer": f"c_custkey + {{r}} * {S['customer']} AS c_custkey, "
                "c_name, c_nationkey, c_acctbal, c_mktsegment",
    "supplier": f"s_suppkey + {{r}} * {S['supplier']} AS s_suppkey, "
                "s_name, s_nationkey, s_acctbal",
    "part": f"p_partkey + {{r}} * {S['part']} AS p_partkey, "
            "p_name, p_brand, p_type, p_size, p_retailprice",
    "orders": f"o_orderkey + {{r}} * {S['orders']} AS o_orderkey, "
              f"o_custkey + {{r}} * {S['customer']} AS o_custkey, "
              "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    "lineitem": f"l_orderkey + {{r}} * {S['orders']} AS l_orderkey, "
                f"l_partkey + {{r}} * {S['part']} AS l_partkey, "
                f"l_suppkey + {{r}} * {S['supplier']} AS l_suppkey, "
                "l_linenumber, l_quantity, l_extendedprice, l_discount, "
                "l_tax, l_returnflag, l_linestatus, l_shipdate",
    "events": f"event_id + {{r}} * {S['events']} AS event_id, ts, "
              f"user_id + {{r}} * {US} AS user_id, event_type, value, props",
    "documents": f"doc_id + {{r}} * {S['documents']} AS doc_id, "
                 "text, lang, source, n_chars",
    "embeddings": f"vec_id + {{r}} * {S['embeddings']} AS vec_id, "
                  "embedding, label",
}

import os
os.makedirs(OUT, exist_ok=True)
for table, sel in SHIFT.items():
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if sel is None:
        q = f"SELECT * FROM {src}"
    else:
        q = " UNION ALL ".join(
            f"SELECT {sel.format(r=r)} FROM {src}" for r in range(REP))
    con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")
print(f"done: {OUT} at {REP}x {SRC}")
