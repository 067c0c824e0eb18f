"""Gated dual-chain oracle for dedup_jaccard_prefix (r12, retiring the
sf1 exclusion): the at-scale prefix-replay chain must produce EXACTLY the
brute-force chain's rows — flip the gate on the sf0.01 corpus and compare.
Same proof shape as tests/test_geo.py::test_salted_oracle_dual_chains_agree."""

from __future__ import annotations

import os

import pytest


def test_jaccard_dual_chains_agree() -> None:
    import duckdb

    from flinkexp_spark.registry import REGISTRY, queries

    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        pytest.skip("sf0.01 documents fixture not present on this machine")
    queries()
    sql = REGISTRY["dedup_jaccard_prefix"].oracle
    assert "JACCARD_BRUTE_MAX" not in sql  # constant baked in
    assert "COUNT(*) <= 20000" in sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    brute = con.execute(sql).fetchdf()
    replay = con.execute(
        sql.replace("COUNT(*) <= 20000", "COUNT(*) < 0")
    ).fetchdf()
    assert len(brute) > 0  # non-vacuous: the fixture carries dup pairs
    key = ["id_a", "id_b"]
    b = brute.sort_values(key).reset_index(drop=True)
    r = replay.sort_values(key).reset_index(drop=True)
    assert b.equals(r)
