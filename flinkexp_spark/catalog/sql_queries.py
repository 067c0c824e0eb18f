"""SQL entry point (SURVEY §3.1 entry point 1): TPC-H-style analytical
queries submitted as SQL TEXT through ``FlinkexpEngine.sql`` and planned by
Catalyst end-to-end (parser -> analyzer -> optimizer -> codegen).

Each query here is ONE ANSI-SQL string executed verbatim by BOTH engines —
Spark runs it via ``spark.sql``, DuckDB runs it as the oracle — so the
correctness check also pins SQL-dialect compatibility of the surface we
expose.  (Money aggregates use the exact-decimal contract of
catalog/_util.py.)

Scale notes: these are the canonical star-schema shapes — selective dims
broadcast, the lineitem fact streams through partial aggregation, and the
final TopK runs as TakeOrderedAndProject (no global sort of the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

# One string, two engines (Spark executes, DuckDB checks).
Q3_SHIPPING_PRIORITY = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

Q5_LOCAL_SUPPLIER_VOLUME = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
"""

Q10_RETURNED_ITEMS = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql_text: str) -> DataFrame:
    datasets.register_views(spark, sf_dir)
    return spark.sql(sql_text)


@register("sql_tpch_q3", oracle=Q3_SHIPPING_PRIORITY, tags=("J1", "A1", "O1", "O2"))
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via the SQL entry point: 3-way star join + grouped
    revenue + global top-10 (planned as TakeOrderedAndProject)."""
    return _sql_query(spark, sf_dir, Q3_SHIPPING_PRIORITY)


@register("sql_tpch_q5", oracle=Q5_LOCAL_SUPPLIER_VOLUME, tags=("J1", "J6", "A1"))
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the full star; region/nation
    broadcast, fact-side partial aggregation."""
    return _sql_query(spark, sf_dir, Q5_LOCAL_SUPPLIER_VOLUME)


@register("sql_tpch_q10", oracle=Q10_RETURNED_ITEMS, tags=("J1", "A1", "O2"))
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter + 4-way join + top-20."""
    return _sql_query(spark, sf_dir, Q10_RETURNED_ITEMS)
