"""Modern SQL dialect surface: recursive CTEs, mergeable sketches, VARIANT
JSON, LISTAGG, and pipe syntax (SURVEY §3.1 entry point 1 extensions).

These are the newer declared-SQL capabilities a reference user would expect
from an analytics engine in 2026, each planned by Catalyst end-to-end:

* ``WITH RECURSIVE`` (SPARK-24497, Spark 4.0+) — iterative hierarchies and
  date spines WITHOUT driver-side loops; the recursion runs as a plan-level
  loop with each step a distributed job, so a 100 TB hierarchy walk is just
  N bounded shuffle rounds.
* Apache DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg``,
  Spark 3.5+) — the 100 TB distinct-count shape: sketch per shard/partition
  (map-side, mergeable, ~KB each), union at query time.  Re-aggregation
  without re-scanning raw data is exactly what a hypertable rollup needs.
* ``approx_top_k`` (Spark 4.0+) — space-saving heavy hitters; exact while
  the tracked-item capacity exceeds the distinct count, so its results are
  oracle-checkable in that regime.
* ``VARIANT`` (Spark 4.0+) — binary semi-structured JSON with shredded
  access paths; a full scan of string JSON parses once into variant and
  every field access after that is cheap.
* ``LISTAGG ... WITHIN GROUP`` (ISO SQL:2016, Spark 4.0+).
* SQL pipe syntax (``|>``, Spark 4.0+).

Oracle notes: DuckDB lacks variant/HLL/approx_top_k, so those oracles use
DuckDB-native equivalents (json_extract, exact distinct + tolerance
property, exact group counts); the recursive CTEs run the IDENTICAL SQL
text on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

# --------------------------------------------------------------------------
# WITH RECURSIVE — identical SQL text on both engines.

RECURSIVE_HIERARCHY = """
    WITH RECURSIVE up(custkey, anc, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer
        UNION ALL
        SELECT custkey, CAST(FLOOR(anc / 10.0) AS BIGINT), depth + 1
        FROM up WHERE anc > 0
    )
    SELECT depth AS depth_to_root, COUNT(*) AS n_customers
    FROM up WHERE anc = 0
    GROUP BY depth
    ORDER BY depth
"""


@register("sql_recursive_cte", oracle=RECURSIVE_HIERARCHY, tags=("A1", "O3"))
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy climb (decimal-digit parent chain over
    c_custkey), aggregated by depth-to-root.  The recursion is a plan-level
    UnionLoop: each step is one distributed job over the frontier only, so
    depth bounds wall-clock, not data size."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(RECURSIVE_HIERARCHY)


DATE_SPINE = """
    WITH RECURSIVE days(d) AS (
        SELECT DATE '1997-01-01'
        UNION ALL
        SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
        WHERE d < DATE '1997-01-31'
    )
    SELECT CAST(d AS STRING) AS day,
           CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders
    FROM days
    LEFT JOIN (
        SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
        GROUP BY CAST(o_orderdate AS DATE)
    ) ON od = d
    ORDER BY day
"""
# DuckDB spells string casts VARCHAR and needs no CAST after date+interval;
# otherwise the same query.
DATE_SPINE_DUCK = DATE_SPINE.replace("AS STRING", "AS VARCHAR")


@register("sql_date_spine", oracle=DATE_SPINE_DUCK, tags=("J2", "A1", "O1"))
def q_sql_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive date spine + zero-filled daily order counts — the gaps-free
    calendar join every reporting pipeline needs.  The spine is tiny (one
    row per day) and broadcast; the fact side aggregates BEFORE the join so
    the outer join sees one row per day, not one per order."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(DATE_SPINE)


# --------------------------------------------------------------------------
# Mergeable HLL sketches (Apache DataSketches).

HLL_ORACLE = """
    SELECT event_type, TRUE AS within_3pct
    FROM events GROUP BY event_type ORDER BY event_type
"""


@register("sketch_hll_mergeable", oracle=HLL_ORACLE, tags=("A4",))
def q_sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct count: HLL sketch per (event_type, day)
    shard, then ``hll_union_agg`` rolls shards up to event_type — the exact
    dataflow of a 100 TB hypertable rollup, where per-partition sketches are
    precomputed once and every query merges KB-sized sketches instead of
    rescanning raw data.  Oracle-checked as a tolerance property
    (|est - exact| / exact <= 3% at lgConfigK=14; sketches are not
    bit-reproducible across engines, the bound is)."""
    datasets.register_views(spark, sf_dir)
    shard = spark.sql(
        """
        SELECT event_type, CAST(ts AS DATE) AS day,
               hll_sketch_agg(user_id, 14) AS sk
        FROM events GROUP BY event_type, CAST(ts AS DATE)
        """
    )
    shard.createOrReplaceTempView("hll_shards")
    return spark.sql(
        """
        SELECT s.event_type,
               ABS(hll_sketch_estimate(hll_union_agg(s.sk, FALSE)) - e.exact)
                   / e.exact <= 0.03 AS within_3pct
        FROM hll_shards s
        JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact
              FROM events GROUP BY event_type) e
          ON s.event_type = e.event_type
        GROUP BY s.event_type, e.exact
        ORDER BY s.event_type
        """
    )


APPROX_TOP_K_ORACLE = """
    SELECT event_type AS item, COUNT(*) AS est_count
    FROM events GROUP BY event_type ORDER BY item
"""


@register("agg_approx_top_k", oracle=APPROX_TOP_K_ORACLE, tags=("A4", "O2"))
def q_agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` heavy hitters over the event stream.  The
    space-saving sketch is EXACT while its tracked capacity (10000) exceeds
    the distinct count, so at fixture cardinality the k=10 result equals the
    exact group-by — which is precisely what the oracle checks.  At 100 TB
    the same query keeps a fixed 10000-counter state per partition and one
    merge, versus a full shuffle for the exact variant."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.item, t.count AS est_count
        FROM (SELECT explode(approx_top_k(event_type, 10, 10000)) AS t
              FROM events)
        ORDER BY item
        """
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured access.

VARIANT_ORACLE = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type ORDER BY event_type
"""


@register("sql_variant_json", oracle=VARIANT_ORACLE, tags=("F8",))
def q_sql_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion of the raw JSON ``props`` column: parse once into
    Spark's binary semi-structured type, then typed ``variant_get`` path
    access feeds a plain aggregate.  At scale the parse happens on ingest
    (variant column in parquet) and every downstream query reads shredded
    binary instead of re-parsing strings."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
               COUNT(variant_get(parse_json(props), '$.k', 'bigint'))
                   AS n_with_k
        FROM events GROUP BY event_type ORDER BY event_type
        """
    )


# --------------------------------------------------------------------------
# LISTAGG (ISO SQL:2016) and pipe syntax.

LISTAGG_ORACLE = """
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey <= 60
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register("sql_listagg", oracle=LISTAGG_ORACLE, tags=("A7", "F1"))
def q_sql_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO ``LISTAGG ... WITHIN GROUP`` ordered string aggregation.
    Deterministic because the WITHIN GROUP order is total (names unique).
    DuckDB oracle spells it ``string_agg(... ORDER BY ...)``."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer WHERE c_custkey <= 60
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


PIPE_ORACLE = """
    SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register("sql_pipe_syntax", oracle=PIPE_ORACLE, tags=("J1", "A1"))
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same star join expressed in SQL pipe syntax (``|>``) — each
    stage pipes into the next, mirroring the DataFrame API's reading order
    while staying 100% declarative SQL for Catalyst."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> JOIN customer ON o_custkey = c_custkey
        |> AGGREGATE CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS revenue,
                     COUNT(*) AS n_orders
           GROUP BY c_mktsegment
        |> ORDER BY c_mktsegment
        |> SELECT c_mktsegment, revenue, n_orders
        """
    )


GROUP_BY_ALL = """
    SELECT c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS n
    FROM customer
    GROUP BY ALL
    ORDER BY c_mktsegment, bal_bucket
"""


@register("sql_group_by_all", oracle=GROUP_BY_ALL, tags=("A1",))
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (infer grouping keys = every non-aggregate select
    item) — identical SQL text on both engines; the analyzer expands it to
    the explicit key list, so the plan is exactly the plain grouped agg."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(GROUP_BY_ALL)


PARAM_ORACLE = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("sql_parameterized", oracle=PARAM_ORACLE, tags=("A1", "P2"))
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``:threshold`` markers bound via
    ``spark.sql(text, args=...)``): the injection-safe templating path for
    programmatic query services — parameters are bound as typed literals
    by the parser, never string-spliced, and constant-fold like any
    literal.  The oracle is the same query with the values inlined."""
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :threshold AND o_orderstatus = :status
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"threshold": 150000.0, "status": "F"},
    )
