"""O1-O5: sort / limit / set operations (SURVEY §2.2).

Reference: declared by the Table/SQL envelope (study/pom.xml:149-165).

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries), not a single-task sort.  ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject — each partition keeps k rows, the driver merges —
O(k) driver memory at any input scale.  The driver's value-hash is
order-insensitive, so ordered results are made checkable by materializing
the rank as a column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register


@register(
    "order_by_ranked",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal,
               ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_nationkey ASC,
                                  s_suppkey) AS pos
        FROM supplier
    """,
    tags=("O1",),
)
def q_order_by_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key global ordering, encoded as a rank column for the hash.

    The global window runs on ONE task — acceptable only because the input
    is a 100-row dim table; large ordered outputs use orderBy (range sort)
    and keep order implicit.
    """
    s = datasets.load(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_nationkey").asc(), "s_suppkey")
    return s.select(
        "s_suppkey", "s_name", "s_acctbal", F.row_number().over(w).alias("pos")
    )


@register(
    "limit_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    tags=("O2",),
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k (TakeOrderedAndProject; deterministic tiebreak)."""
    o = datasets.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "union_all",
    oracle="""
        SELECT party, COUNT(*) AS n FROM (
            SELECT 'customer:' || c_mktsegment AS party FROM customer
            UNION ALL
            SELECT 'supplier:' || CAST(s_nationkey AS VARCHAR) AS party FROM supplier
        ) GROUP BY party
    """,
    tags=("O3",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: union all (bag semantics) — no shuffle, partitions concatenate."""
    c = datasets.load(spark, sf_dir, "customer").select(
        F.concat(F.lit("customer:"), F.col("c_mktsegment")).alias("party")
    )
    s = datasets.load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("supplier:"), F.col("s_nationkey").cast("string")).alias("party")
    )
    return c.unionByName(s).groupBy("party").agg(F.count("*").alias("n"))


@register(
    "union_distinct",
    oracle="""
        SELECT nk FROM (
            SELECT c_nationkey AS nk FROM customer
            UNION
            SELECT s_nationkey AS nk FROM supplier
        )
    """,
    tags=("O4",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: union distinct = unionByName + distinct (one dedup shuffle)."""
    c = datasets.load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = datasets.load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct()


@register(
    "intersect_except",
    oracle="""
        SELECT 'both' AS bucket, COUNT(*) AS n FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        )
        UNION ALL
        SELECT 'only_1997' AS bucket, COUNT(*) AS n FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        )
    """,
    tags=("O5",),
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: intersect / except (distinct set semantics) on yearly buyer sets."""
    o = datasets.load(spark, sf_dir, "orders")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    both = (
        y97.intersect(y98)
        .agg(F.count("*").alias("n"))
        .select(F.lit("both").alias("bucket"), "n")
    )
    only97 = (
        y97.subtract(y98)  # EXCEPT DISTINCT; exceptAll covers the bag variant
        .agg(F.count("*").alias("n"))
        .select(F.lit("only_1997").alias("bucket"), "n")
    )
    return both.unionByName(only97)
