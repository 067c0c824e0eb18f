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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import dec
from flinkexp_spark.functions import text as T
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


@register(
    "sql_lateral_explode",
    # Spark side runs LATERAL VIEW (HiveQL-lineage syntax DuckDB lacks);
    # the oracle is the equivalent unnest.
    oracle="""
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(MIN(length(tok)) AS BIGINT) AS min_len
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 100)
        WHERE tok <> ''
        GROUP BY doc_id
    """,
    tags=("P1", "E2", "F1"),
)
def q_sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function via the SQL surface: LATERAL VIEW explode —
    Flink SQL's UNNEST/cross join lateral counterpart, planned as the same
    Generate node the DataFrame explode produces (codegen'd 1->N, no
    Python, no shuffle until the aggregate).
    """
    datasets.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(MIN(length(tok)) AS BIGINT) AS min_len
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS tok
        WHERE tok <> '' AND doc_id < 100
        GROUP BY doc_id
        """
    )


@register(
    "project_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, val
        FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                   l_quantity AS val
            FROM lineitem WHERE l_orderkey < 100
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_orderkey < 100
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax', l_tax
            FROM lineitem WHERE l_orderkey < 100)
    """,
    tags=("P1", "P3"),
)
def q_project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt): three measure columns become
    (measure, val) rows via the native `unpivot` operator — the inverse of
    agg_pivot and the standard reshape before a generic per-measure
    aggregation.  Planned as an Expand node (rows scanned once, 3x output),
    not a self-union (3 scans) like the SQL expansion the oracle uses.
    """
    li = datasets.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )


@register(
    "quality_constraints_audit",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_custkey,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS dup_orderkey,
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nonpositive_price,
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
               (COUNT(*) = COUNT(o_custkey)) AND
               (COUNT(*) = COUNT(DISTINCT o_orderkey)) AND
               (SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0) AND
               (SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) = 0) AS all_pass
        FROM orders
    """,
    tags=("P2", "A2", "A3"),
)
def q_quality_constraints_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint audit in ONE scan.

    Completeness (no null FK), uniqueness (PK), range (price > 0), and
    domain (status enum) checks all fold into a single global aggregate —
    the audit of a 100 TB table costs one pass and shuffles one row.
    (Uniqueness is the exception to 'one row': count distinct expands to
    the two-phase Expand plan, still O(distinct keys) shuffle, not rows.)
    """
    o = datasets.load(spark, sf_dir, "orders")
    null_ck = (F.count("*") - F.count("o_custkey")).cast("long")
    dup_ok = (F.count("*") - F.countDistinct("o_orderkey")).cast("long")
    nonpos = F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("long")
    bad_st = F.sum(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    ).cast("long")
    return o.agg(
        F.count("*").alias("n_rows"),
        null_ck.alias("null_custkey"),
        dup_ok.alias("dup_orderkey"),
        nonpos.alias("nonpositive_price"),
        bad_st.alias("bad_status"),
        (
            (null_ck == 0) & (dup_ok == 0) & (nonpos == 0) & (bad_st == 0)
        ).alias("all_pass"),
    )


@register(
    "table_fingerprint",
    oracle=f"""
        WITH rows_h AS (
            SELECT o_orderstatus,
                   {T.h64_sql("concat(CAST(o_orderkey AS VARCHAR), '|', "
                              "CAST(o_custkey AS VARCHAR), '|', o_orderstatus, "
                              "'|', CAST(CAST(floor(o_totalprice * 100 + 0.5) "
                              "AS BIGINT) AS VARCHAR))")} AS h
            FROM orders)
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(bit_xor(h) AS BIGINT) AS fingerprint
        FROM rows_h GROUP BY o_orderstatus
    """,
    tags=("F9", "A2"),
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent dataset checksum: XOR of canonical row hashes.

    The integrity primitive for 100 TB replication/migration: XOR is
    commutative, associative and overflow-free, so per-partition
    fingerprints combine map-side in any order and two copies of a table
    compare with one tiny exchange — no sort, no row shipping.  Floats
    enter the canonical row string as exact cents so the fingerprint is
    byte-identical across engines and file layouts.
    """
    o = datasets.load(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
    )
    return (
        o.select("o_orderstatus", T.h64(row_str).alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor("h").cast("long").alias("fingerprint"),
        )
    )


@register(
    "quality_fk_orphans",
    oracle="""
        SELECT
            CAST((SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey))
                 AS BIGINT) AS orphan_lineitems,
            CAST((SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                    WHERE l.l_orderkey = o.o_orderkey))
                 AS BIGINT) AS childless_orders,
            CAST((SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey))
                 AS BIGINT) AS orphan_orders
    """,
    tags=("J4", "A2"),
)
def q_quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphans on both sides of the FK edges.

    Each check is one ANTI join — at 100 TB the dim side broadcasts (or a
    runtime bloom filter prunes the fact scan), so auditing every FK edge
    of a star schema costs one pass per edge, not a join materialization.
    """
    li = datasets.load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = datasets.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = datasets.load(spark, sf_dir, "customer").select("c_custkey")
    orphan_li = li.join(
        o, li.l_orderkey == o.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("orphan_lineitems"))
    childless = o.join(
        li, o.o_orderkey == li.l_orderkey, "left_anti"
    ).agg(F.count("*").alias("childless_orders"))
    orphan_o = o.join(
        c, o.o_custkey == c.c_custkey, "left_anti"
    ).agg(F.count("*").alias("orphan_orders"))
    return orphan_li.crossJoin(childless).crossJoin(orphan_o)


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_partkey")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_v,
           CAST(MAX({c}) AS DOUBLE) AS max_v
    FROM lineitem
    """
    for c in _PROFILE_COLS
) + " ORDER BY col_name"


@register("profile_table", oracle=_PROFILE_ORACLE, tags=("A2", "A3", "P1"))
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary: per-column count/nulls/distinct/min/max over
    the fact table in ONE aggregate (the oracle spells it as N scans; the
    engine runs one).

    The single wide agg computes every measure for every column together —
    one pass over the fact, one Expand for the multi-distinct — then a
    ``stack`` unpivot reshapes the 1-row result into a row per column.
    This is the landing-zone audit every ingest pipeline runs; at 100 TB
    one pass vs N-columns passes is the difference between minutes and
    hours.  (Exact distincts here; the mergeable-sketch variant for
    continuous profiling is ``sketch_hll_mergeable``.)
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    measures = []
    for c in _PROFILE_COLS:
        measures += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*measures)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__nd, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_v, max_v)"
    ).orderBy("col_name")


@register(
    "quality_sequence_gaps",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN n_lines <> max_ln THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gapped,
               CAST(SUM(CASE WHEN n_lines <> n_distinct THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_duplicated,
               CAST(SUM(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bad_start
        FROM (
            SELECT l_orderkey,
                   COUNT(*) AS n_lines,
                   COUNT(DISTINCT l_linenumber) AS n_distinct,
                   MIN(l_linenumber) AS min_ln,
                   MAX(l_linenumber) AS max_ln
            FROM lineitem GROUP BY l_orderkey
        )
    """,
    tags=("A2", "A3", "A9"),
)
def q_quality_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-integrity audit: per order, l_linenumber must be exactly
    1..n (no gaps, no duplicates, correct start) — the CDC-feed sanity
    check that catches dropped or re-delivered change records.

    count/distinct/min/max per key decide all three violations WITHOUT
    materializing expected sequences or joining a generator: n_lines ==
    max implies gap-free given distinctness, so the whole audit is one
    grouped aggregate + a global rollup.  Map-side combinable everywhere;
    at 100 TB this is a single shuffle on the key.
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
    )
    return per_order.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("n_lines") != F.col("max_ln"), 1).otherwise(0))
        .cast("long")
        .alias("n_gapped"),
        F.sum(F.when(F.col("n_lines") != F.col("n_distinct"), 1).otherwise(0))
        .cast("long")
        .alias("n_duplicated"),
        F.sum(F.when(F.col("min_ln") != 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bad_start"),
    )


@register(
    "diagnose_skew",
    oracle="""
        WITH per_key AS (
            SELECT o_custkey, COUNT(*) AS n
            FROM orders GROUP BY o_custkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(n) AS BIGINT) AS max_rows,
               ROUND(quantile_cont(n, 0.5), 4) AS p50_rows,
               ROUND(quantile_cont(n, 0.99), 4) AS p99_rows,
               ROUND(MAX(n) * COUNT(*) / CAST(SUM(n) AS DOUBLE), 4)
                   AS skew_factor
        FROM per_key
    """,
    tags=("A2", "A6"),
)
def q_diagnose_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: per-key row-count distribution (p50/p99/max)
    and the skew factor (max/mean) for a prospective join/agg key — the
    measurement you run BEFORE choosing salting (join_salted_skew) or
    trusting AQE's skew split.  skew_factor ~1 = uniform; >> 1 = one
    reducer owns the job's tail latency.

    Two cheap aggregations (per-key counts, then stats over the counts);
    the second input is one row per key, so the whole diagnostic costs
    one shuffle of (key, count) pairs regardless of fact size.
    """
    orders = datasets.load(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_rows"),
        F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50_rows"),
        F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99_rows"),
        F.round(
            F.max("n") * F.count("*") / F.sum("n").cast("double"), 4
        ).alias("skew_factor"),
    )


PROFILE_ENTROPY_COLS = ("event_type", "user_id")


@register(
    "profile_entropy",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               ROUND(-SUM(p * ln(p)), 6) AS entropy_nats,
               ROUND(SUM(p * p), 6) AS gini_impurity_inv
        FROM (
            SELECT {c}, COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS p
            FROM events WHERE {c} IS NOT NULL GROUP BY {c})
        """
        for c in PROFILE_ENTROPY_COLS
    )
    + " ORDER BY col_name",
    tags=("A2", "A3", "F2"),
)
def q_profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-distribution profiling: Shannon entropy (nats) and the
    Simpson index (sum p² — inverse gini diversity) per column — the
    signals that decide dictionary encoding, partition keys, and whether
    a column is worth bucketing (high entropy) or broadcasting as a dim
    (low).

    Per column: one grouped count + a windowed total (single shuffle of
    the distinct values), then a scalar aggregation of p-terms.  Entropy
    sums are rounded on both engines (float summation order differs).
    """
    events = datasets.load(spark, sf_dir, "events")
    outs = []
    for c in PROFILE_ENTROPY_COLS:
        # profile NON-NULL values only (both engines): a NULL group would
        # count toward Spark's distinct-group tally but not the oracle's
        # COUNT(DISTINCT), silently breaking parity on a nullable fixture
        counts = (
            events.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count("*").alias("cnt"))
        )
        with_p = counts.select(
            (F.col("cnt") / F.sum("cnt").over(Window.partitionBy())).alias("p")
        )
        outs.append(
            with_p.agg(
                F.lit(c).alias("col_name"),
                F.count("*").cast("long").alias("n_distinct"),
                F.round(-F.sum(F.col("p") * F.log("p")), 6).alias(
                    "entropy_nats"
                ),
                F.round(F.sum(F.col("p") * F.col("p")), 6).alias(
                    "gini_impurity_inv"
                ),
            ).select("col_name", "n_distinct", "entropy_nats", "gini_impurity_inv")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col_name")


K_ANON_THRESHOLD = 5


@register(
    "quality_k_anonymity",
    oracle=f"""
        WITH eq AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
            FROM customer GROUP BY c_nationkey, c_mktsegment)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
               CAST(SUM(CASE WHEN class_size < {K_ANON_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_risky_classes,
               CAST(SUM(CASE WHEN class_size < {K_ANON_THRESHOLD}
                             THEN class_size ELSE 0 END) AS BIGINT)
                   AS n_risky_rows
        FROM eq
    """,
    tags=("A2", "A9"),
)
def q_quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation x market segment):
    the dataset's k = the smallest equivalence class, plus how many
    classes/rows fall under the release threshold — the privacy gate a
    training-data pipeline runs before shipping user-derived records
    (small classes re-identify; they get suppressed or generalized).

    One grouped count + one scalar rollup over the class sizes; the second
    pass is one row per class, so the audit costs a single shuffle on the
    quasi-identifier regardless of table size.
    """
    cust = datasets.load(spark, sf_dir, "customer")
    eq = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size")
    )
    risky = F.col("class_size") < K_ANON_THRESHOLD
    return eq.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias(
            "n_risky_classes"
        ),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
    )


L_DIVERSITY_THRESHOLD = 3


@register(
    "quality_l_diversity",
    oracle=f"""
        WITH eq AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS class_size,
                   CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0)
                                            AS BIGINT)) AS BIGINT)
                       AS sensitive_distinct
            FROM customer GROUP BY c_nationkey, c_mktsegment)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(sensitive_distinct) AS BIGINT) AS l_diversity,
               CAST(SUM(CASE WHEN sensitive_distinct < {L_DIVERSITY_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_risky_classes,
               CAST(SUM(CASE WHEN sensitive_distinct < {L_DIVERSITY_THRESHOLD}
                             THEN class_size ELSE 0 END) AS BIGINT)
                   AS n_risky_rows
        FROM eq
    """,
    tags=("A2", "A3", "A9"),
)
def q_quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the k-anonymity companion: a class can be
    large (k-safe) yet leak if every member shares the same SENSITIVE
    value (here the account-balance band).  Reports the dataset's l
    (min distinct sensitive values per quasi-identifier class) and the
    classes/rows under the release threshold.

    Same single-shuffle shape as the k audit, with a count-distinct
    inside each class — Spark runs it as the standard two-phase
    partial-distinct aggregate, so the sensitive-value expansion
    combines map-side; swap in approx_count_distinct at extreme
    class-count scale (the threshold test tolerates sketch error only
    if l is far from the threshold — keep exact while classes fit).
    """
    cust = datasets.load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    eq = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size"),
        F.countDistinct(band).alias("sensitive_distinct"),
    )
    risky = F.col("sensitive_distinct") < L_DIVERSITY_THRESHOLD
    return eq.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("sensitive_distinct").cast("long").alias("l_diversity"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias(
            "n_risky_classes"
        ),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
    )


@register(
    "quality_t_closeness",
    oracle="""
        WITH b AS (SELECT c_nationkey, c_mktsegment,
                          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bucket
                   FROM customer),
        g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS gcnt
              FROM b GROUP BY bucket),
        t AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS n_total FROM g),
        cb AS (SELECT c_nationkey, c_mktsegment, bucket,
                      CAST(COUNT(*) AS BIGINT) AS ccnt
               FROM b GROUP BY 1, 2, 3),
        cls AS (SELECT c_nationkey, c_mktsegment,
                       CAST(SUM(ccnt) AS BIGINT) AS class_size
                FROM cb GROUP BY 1, 2),
        j AS (SELECT cb.c_nationkey, cb.c_mktsegment, cb.ccnt,
                     cls.class_size, g.gcnt, t.n_total
              FROM cb
              JOIN cls USING (c_nationkey, c_mktsegment)
              JOIN g USING (bucket) CROSS JOIN t)
        SELECT c_nationkey, c_mktsegment,
               MAX(class_size) AS class_size,
               round((CAST(SUM(abs(ccnt * n_total - gcnt * class_size))
                           AS BIGINT)
                      + MAX(class_size) * (MAX(n_total) - CAST(SUM(gcnt)
                                                               AS BIGINT)))
                     / (2.0 * MAX(class_size) * MAX(n_total)), 6) AS tvd
        FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("A1", "A2", "A9"),
)
def q_quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the privacy-release ladder next to `quality_k_anonymity`
    and `quality_l_diversity`: per quasi-identifier class, the TOTAL
    VARIATION DISTANCE between the class's sensitive-attribute
    distribution (acctbal k$-buckets) and the global one.  l-diversity
    counts distinct sensitive values; t-closeness catches classes whose
    values are distinct yet SKEWED toward a revealing range.

    Cross-engine float contract: TVD is computed as
    (sum_b |ccnt*N - gcnt*class| + class*(N - sum_present gcnt))
    / (2*class*N) — the numerator is EXACT BIGINT algebra (missing buckets
    fold into the complement term, so no class x bucket cross join), and
    the single final division of identical integers is one
    correctly-rounded IEEE op on both engines.  Never a float sum.

    Scale: two map-side-combinable aggregations on (class, bucket) and
    (class), a broadcast of the bucket-global histogram (|buckets| rows)
    and one 1-row total — the audit costs one shuffle on the
    quasi-identifier at any table size.
    """
    cust = datasets.load(spark, sf_dir, "customer")
    b = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bucket"),
    )
    g = b.groupBy("bucket").agg(F.count("*").cast("long").alias("gcnt"))
    tot = g.agg(F.sum("gcnt").cast("long").alias("n_total"))
    cb = b.groupBy("c_nationkey", "c_mktsegment", "bucket").agg(
        F.count("*").cast("long").alias("ccnt")
    )
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("ccnt").cast("long").alias("class_size")
    )
    j = (
        cb.join(cls, ["c_nationkey", "c_mktsegment"])
        .join(F.broadcast(g), "bucket")
        .crossJoin(F.broadcast(tot))
    )
    present = F.sum(
        F.abs(
            F.col("ccnt") * F.col("n_total")
            - F.col("gcnt") * F.col("class_size")
        )
    ).cast("long")
    return (
        j.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("class_size").alias("class_size"),
            F.round(
                (
                    present
                    + F.max("class_size")
                    * (F.max("n_total") - F.sum("gcnt").cast("long"))
                )
                / (2.0 * F.max("class_size") * F.max("n_total")),
                6,
            ).alias("tvd"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_oracle() -> str:
    parts = [
        f"""SELECT '{t}.{c}' AS key_col,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(cnt) AS BIGINT) AS max_cnt,
                   round(MAX(cnt) * COUNT(*) / (1.0 * SUM(cnt)), 6)
                       AS skew_ratio,
                   round(MAX(cnt) / (1.0 * SUM(cnt)), 6) AS top1_share
            FROM (SELECT {c}, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM {t} GROUP BY {c})"""
        for t, c in _SKEW_KEYS
    ]
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY key_col"
    )


@register("profile_join_skew", oracle=_skew_oracle(), tags=("A1", "A2", "P1"))
def q_profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW diagnostics — the operational pre-check behind every
    salting decision in this engine (join_salted_skew, agg_salted_skew,
    geo_neighbor_pairs_salted): for each canonical join key, the key-space
    size, the hottest key's row count, its ratio to the mean key
    (``skew_ratio`` = max/mean — >~8 is where hot_key_salted_join's
    default threshold starts splitting), and the hottest key's share of
    all rows.  Ratios divide exact BIGINTs once and round(6), so both
    engines hash identically.

    Scale: one map-side-combinable count per key column and a 1-row
    rollup each — the diagnosis costs a scan + tiny shuffle per key, and
    at 100 TB you run it on a sample partition first anyway.
    """
    outs = []
    for t, c in _SKEW_KEYS:
        counts = (
            datasets.load(spark, sf_dir, t)
            .groupBy(c)
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        outs.append(
            counts.agg(
                F.lit(f"{t}.{c}").alias("key_col"),
                F.count("*").cast("long").alias("n_keys"),
                F.max("cnt").cast("long").alias("max_cnt"),
                F.round(
                    F.max("cnt") * F.count("*") / (1.0 * F.sum("cnt")), 6
                ).alias("skew_ratio"),
                F.round(F.max("cnt") / (1.0 * F.sum("cnt")), 6).alias(
                    "top1_share"
                ),
            ).select("key_col", "n_keys", "max_cnt", "skew_ratio", "top1_share")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_col")
