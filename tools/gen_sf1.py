#!/usr/bin/env python
"""Synthesize an sf1-scale fixture for the SCALING stress run (VERDICT r6 #4).

The driver ships sf{0.001,0.01,0.1} only; its generator (seed=42) is not in
the repo, so exact-distribution sf1 cannot be reproduced.  For a SCALING
measurement that is not needed: this script key-shift-replicates sf0.1
10x — every fact/dim row appears once per copy k with every key (and every
foreign key) offset by k * (max_key + 1) of its table, so per-key fanout,
join selectivity, group cardinality ratios, and value distributions are
EXACTLY those of sf0.1 while total volume is 10x.  Document text gets a
copy marker so near-dup cluster sizes stay constant (a verbatim 10x copy
would grow every dup cluster 10x and turn linear dedup work quadratic for
data reasons, not engine reasons).

Output is /tmp/sf1 (scratch — NOT a correctness fixture; oracles never run
against it).  Usage: python tools/gen_sf1.py [outdir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(t: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    # strides: max key + 1 per table, so shifted ranges never collide
    stride = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("events_user", "user_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        table = "events" if t == "events_user" else t
        stride[t] = (
            con.execute(f"SELECT max({k}) + 1 FROM {src(table)}").fetchone()[0]
        )

    rep = f"cross join range({COPIES}) r(k)"

    # dims with global key spaces stay as-is (every copy reuses them)
    emit("region", f"SELECT * FROM {src('region')}")
    emit("nation", f"SELECT * FROM {src('nation')}")

    emit(
        "customer",
        f"""SELECT c_custkey + k * {stride['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')} {rep}""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + k * {stride['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src('supplier')} {rep}""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + k * {stride['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')} {rep}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + k * {stride['orders']} AS o_orderkey,
                   o_custkey + k * {stride['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} {rep}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + k * {stride['orders']} AS l_orderkey,
                   l_partkey + k * {stride['part']} AS l_partkey,
                   l_suppkey + k * {stride['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} {rep}""",
    )
    emit(
        "events",
        f"""SELECT event_id + k * {stride['events']} AS event_id,
                   ts,
                   user_id + k * {stride['events_user']} AS user_id,
                   event_type, value, props
            FROM {src('events')} {rep}""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + k * {stride['documents']} AS doc_id,
                   text || ' zqcopy' || CAST(k AS VARCHAR) AS text,
                   lang, source,
                   length(text || ' zqcopy' || CAST(k AS VARCHAR))::BIGINT
                       AS n_chars
            FROM {src('documents')} {rep}""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + k * {stride['embeddings']} AS vec_id,
                   embedding, label
            FROM {src('embeddings')} {rep}""",
    )


if __name__ == "__main__":
    main()
