"""Subquery surface: correlated scalar subqueries, EXISTS/NOT EXISTS, IN
(SURVEY §2.2 joins J3/J4 in SQL form; §4.2 subquery decorrelation).

Flink 1.11 SQL supports these via the planner the reference imports
(study/pom.xml:149-165).  In Spark they exercise Catalyst's decorrelation
rules (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) — the
optimizer turns each correlated subquery into a join, which is the only
formulation that scales (a per-row subquery re-execution is O(n²)).

Like catalog/sql_queries.py, each query is ONE ANSI string run verbatim by
both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

SCALAR_CORRELATED = """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""

EXISTS_ANTI = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
"""

IN_AGG = """
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) >= 40)
"""


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from flinkexp_spark.catalog.sql_queries import _sql_query

    return _sql_query(spark, sf_dir, text)


@register("subquery_scalar_correlated", oracle=SCALAR_CORRELATED, tags=("J1", "A2"))
def q_subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders > 2x their customer's average) —
    decorrelated by Catalyst into an aggregate + join, never per-row."""
    return _sql(spark, sf_dir, SCALAR_CORRELATED)


@register("subquery_exists", oracle=EXISTS_ANTI, tags=("J3", "J4"))
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS — planned as left-semi and left-anti joins."""
    return _sql(spark, sf_dir, EXISTS_ANTI)


@register("subquery_in_agg", oracle=IN_AGG, tags=("J3", "A9"))
def q_subquery_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over an aggregated subquery (hot parts) — semi join against the
    pre-aggregated build side."""
    return _sql(spark, sf_dir, IN_AGG)
