"""Engine facade (api.py) and iterative-operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkexp_spark.api import FlinkexpEngine
from flinkexp_spark.operators.components import connected_components


def test_engine_sql_entry_point(spark, sf_dir):
    eng = FlinkexpEngine(spark, data_dir=sf_dir)
    out = eng.sql(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"
    ).collect()
    assert len(out) >= 1 and all(r.n > 0 for r in out)


def test_engine_table_entry_point(spark, sf_dir):
    eng = FlinkexpEngine(spark, data_dir=sf_dir)
    n = eng.table("nation").count()
    assert n == 25


def test_connected_components_two_clusters(spark):
    # {1,2,3} via chain, {10,11} — and min-label must cross the chain
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    comp = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 12-node path: worst case for propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    comp = connected_components(edges)
    assert comp.select(F.count_distinct("component")).first()[0] == 1
    assert comp.agg(F.min("component")).first()[0] == 0
