"""P1-P4: projection / filter / rename / distinct (SURVEY §2.2).

Reference: declared by the Table API envelope (study/pom.xml:149-165); the
exercised analog is the ``map`` projection in StreamSocket.scala:15.

Scale notes: all four are narrow or map-side ops.  Projection and filter are
expressed declaratively so Catalyst pushes them INTO the parquet scan
(``PushedFilters`` / ``ReadSchema`` — verified in tests/test_plans.py): at
100 TB the scan reads only the referenced columns and skips row groups via
min/max stats.  ``distinct`` is the only shuffle (hash on the projected
key set), with map-side partial dedup first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import dec
from flinkexp_spark.registry import register


@register(
    "project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price,
               year(l_shipdate) AS ship_year
        FROM lineitem
        WHERE l_orderkey < 1000
    """,
    tags=("P1",),
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: select with computed columns (decimal-exact money arithmetic)."""
    li = datasets.load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
        F.year("l_shipdate").alias("ship_year"),
    )


@register(
    "filter_predicates",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderstatus = 'O' OR o_totalprice > 200000.0)
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_custkey % 10 <> 3
          AND o_orderpriority IS NOT NULL
    """,
    tags=("P2",),
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: compound boolean predicate, null-safe, pushed to the parquet scan."""
    o = datasets.load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") | (F.col("o_totalprice") > 200000.0))
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_custkey") % 10 != 3)
        & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "rename_drop",
    oracle="""
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               c_mktsegment AS segment
        FROM customer
        WHERE c_acctbal >= 0
    """,
    tags=("P3",),
)
def q_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: withColumnRenamed + drop (Table API ``as`` projection)."""
    c = datasets.load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") >= 0)
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_mktsegment", "segment")
        .drop("c_nationkey", "c_acctbal")
    )


@register(
    "distinct_rows",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem WHERE l_quantity <= 10
    """,
    tags=("P4",),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: distinct — hash shuffle with map-side partial dedup."""
    li = datasets.load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") <= 10)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .distinct()
    )
