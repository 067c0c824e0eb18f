"""A1-A9: the aggregation surface (SURVEY §2.2).

Reference: the exercised op is the rolling keyed ``sum`` (StreamSocket.scala:15);
everything else is declared by the Table/SQL envelope (study/pom.xml:149-165).

Scale notes: every grouped agg here compiles to HashAggregateExec
partial→final — map-side combine before the shuffle, so shuffle volume is
O(groups per partition), not O(rows).  ``count distinct`` expands to a
two-phase plan (Expand + two shuffles); where an approximate answer is
acceptable at 100 TB, ``approx_count_distinct`` (HLL++, constant memory) is
the scale path and is covered with a tolerance-style oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import davg, dsum, o_davg, o_dsum
from flinkexp_spark.registry import register


@register(
    "agg_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {o_dsum('l_quantity', 'sum_qty')},
               {o_dsum('l_extendedprice', 'sum_base_price')},
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS sum_disc_price,
               {o_davg('l_quantity', 'avg_qty')},
               {o_davg('l_extendedprice', 'avg_price')},
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A2"),
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: TPC-H Q1-style pricing summary — count/sum/min/max/avg in one pass."""
    from flinkexp_spark.catalog._util import dec

    li = datasets.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_global",
    oracle=f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT o_custkey) AS n_customers,
               {o_dsum('o_totalprice', 'total')},
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
    """,
    tags=("A2", "A3"),
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: global (no-key) aggregation incl. count distinct."""
    o = datasets.load(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice", "total"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_distinct_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("A3",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: multi count-distinct + sum-distinct per group (Expand-based plan)."""
    li = datasets.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast("bigint")).alias("sum_distinct_qty"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
        SELECT l_returnflag, TRUE AS within_5pct
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A4",),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: approx_count_distinct (HLL++), oracle-checked as a tolerance property.

    HLL sketches aren't reproducible across engines, so the checkable claim
    is |approx - exact| / exact <= 5% (HLL++ rsd default 0.05); the oracle
    asserts the property holds for every group.
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .select(
            "l_returnflag",
            (
                (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")) <= 0.05
            ).alias("within_5pct"),
        )
    )


@register(
    "agg_stats",
    oracle="""
        SELECT event_type,
               ROUND(stddev_samp(value), 4) AS sd_samp,
               ROUND(stddev_pop(value), 4) AS sd_pop,
               ROUND(var_samp(value), 4) AS v_samp,
               ROUND(var_pop(value), 4) AS v_pop
        FROM events GROUP BY event_type
    """,
    tags=("A5",),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: stddev/variance (sample + population), rounded for cross-engine float stability."""
    e = datasets.load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
        F.round(F.var_samp("value"), 4).alias("v_samp"),
        F.round(F.var_pop("value"), 4).alias("v_pop"),
    )


@register(
    "agg_percentiles",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.9), 4) AS p90,
               ROUND(median(value), 4) AS med
        FROM events GROUP BY event_type
    """,
    tags=("A6",),
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact interpolated percentiles + median.

    ``percentile`` (exact) rather than ``percentile_approx`` for the oracle
    check; the approximate variant is the 100 TB scale path and is exercised
    in bench.py.
    """
    e = datasets.load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.median("value"), 4).alias("med"),
    )


@register(
    "agg_collect",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(event_type)), ',') AS all_types,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS type_set,
               min_by(event_id, ts) AS first_event,
               max_by(event_id, ts) AS last_event
        FROM events
        WHERE user_id < 20
        GROUP BY user_id
    """,
    tags=("A7",),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: collect_list/collect_set + deterministic first/last via min_by/max_by.

    Spark's ``first``/``last`` aggregates are order-dependent; the engine's
    deterministic contract is min_by/max_by on the event-time column.
    Collections are sorted and joined so the hash is order-insensitive.
    """
    e = datasets.load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("all_types"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("type_set"),
        F.min_by("event_id", "ts").alias("first_event"),
        F.max_by("event_id", "ts").alias("last_event"),
    )


@register(
    "agg_rollup",
    oracle=f"""
        SELECT COALESCE(l_returnflag, '<all>') AS rflag,
               COALESCE(l_linestatus, '<all>') AS lstatus,
               GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
               COUNT(*) AS n, {o_dsum('l_extendedprice', 'revenue')}
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A8",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: rollup with grouping_id — subtotal + grand-total rows."""
    li = datasets.load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            dsum("l_extendedprice", "revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "gid",
            "n",
            "revenue",
        )
    )


@register(
    "agg_cube",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("A8",),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: cube — all grouping-set combinations."""
    o = datasets.load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
        )
    )


@register(
    "agg_having",
    oracle=f"""
        SELECT o_custkey, COUNT(*) AS n_orders, {o_dsum('o_totalprice', 'spend')}
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15
    """,
    tags=("A9",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: HAVING — post-aggregation filter."""
    o = datasets.load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_salted_skew",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events
        GROUP BY event_type
    """,
    tags=("A1",),
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (skew path): salted two-phase aggregation on a pathologically
    low-cardinality key (~5 event types over the whole stream).

    At 100 TB a plain groupBy("event_type") funnels ~20% of ALL rows through
    one reducer; the salted rewrite (operators/salting.py) fans each hot key
    across 16 sub-keys, combines, then merges 16 tiny partials per key.
    Integer-cents sums keep both phases exact and order-independent.
    """
    from flinkexp_spark.operators.salting import salted_agg

    events = datasets.load(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    return salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n": (F.count("*"), F.sum("n").cast("long")),
            "value_cents": (F.sum("cents"), F.sum("value_cents").cast("long")),
        },
        salt_col="event_id",
    )


_GROUPING_SETS_SQL = """
    SELECT lang, source,
           CAST(GROUPING(lang) AS BIGINT) AS g_lang,
           CAST(GROUPING(source) AS BIGINT) AS g_source,
           COUNT(*) AS n
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2')
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("A8", "A1"))
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (explicit form): GROUPING SETS with GROUPING() markers — the
    user-chosen aggregation lattice that rollup/cube special-case, via the
    one-string SQL contract (same text runs on both engines).

    Plan shape: Spark expands the sets with a single Expand node feeding one
    partial+final aggregate — rows are scanned once regardless of how many
    sets the lattice has.
    """
    datasets.register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


@register(
    "agg_pivot",
    oracle=f"""
        SELECT source,
               {", ".join(
                   f"CAST(SUM(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT)"
                   f" AS {lg}" for lg in PIVOT_LANGS)}
        FROM documents
        GROUP BY source
    """,
    tags=("A1", "P1"),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: languages to columns per source (`df.groupBy.pivot(values)`).

    The VALUES ARE DECLARED, which is the scale-relevant part: undeclared
    pivot first runs a distinct scan to discover columns (an extra job over
    100 TB) and can explode the schema; declared values pivot in the same
    single partial+final aggregate as any groupBy (conditional counts, one
    pass).  The oracle is the canonical CASE-sum expansion.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .pivot("lang", PIVOT_LANGS)
        .count()
        .select(
            "source",
            *[F.coalesce(F.col(lg), F.lit(0)).cast("long").alias(lg) for lg in PIVOT_LANGS],
        )
    )


HIST_WIDTH = 1000  # fixed-width bins over l_extendedprice (domain ~[900, 105k])
HIST_QS = (0.5, 0.9, 0.99)


@register(
    "agg_histogram_quantile",
    oracle=f"""
        WITH h AS (
            SELECT CAST(floor(l_extendedprice / {HIST_WIDTH}) AS BIGINT) AS bin,
                   COUNT(*) AS c
            FROM lineitem GROUP BY 1),
        cum AS (
            SELECT bin, c,
                   SUM(c) OVER (ORDER BY bin) AS cum,
                   SUM(c) OVER () AS total
            FROM h)
        SELECT q,
               CAST(MIN(bin) * {HIST_WIDTH} AS DOUBLE) AS edge,
               CAST(MIN(total) AS BIGINT) AS n
        FROM cum
        CROSS JOIN (SELECT CAST(unnest({list(HIST_QS)}) AS DOUBLE) AS q)
        WHERE cum >= q * total
        GROUP BY q
    """,
    tags=("A6", "A1"),
)
def q_agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (scale path): quantiles from a MERGEABLE fixed-width histogram.

    `percentile_approx` holds a per-group GK sketch; at 100 TB the simplest
    fully-mergeable alternative is a fixed-bin histogram: per-partition bin
    counts combine map-side (one tiny shuffle of <=~110 bins), and any
    quantile is read off the cumulative counts.  Every step is integer
    arithmetic, so unlike sketch estimates the result is bit-deterministic
    and oracle-checkable; precision is the bin width, a declared contract.
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    h = (
        li.select(
            F.floor(F.col("l_extendedprice") / HIST_WIDTH)
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    return (
        cum.crossJoin(spark.range(1).select(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy("q")
        .agg(
            (F.min("bin") * HIST_WIDTH).cast("double").alias("edge"),
            F.min("total").cast("long").alias("n"),
        )
    )


# Hour index of 2024-01-01T00:00Z (fixture epoch start): floor(epoch/3600)
OLS_T0_HOURS = 473352


@register(
    "agg_regression_ols",
    oracle=f"""
        WITH t AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT)
                       - {OLS_T0_HOURS} AS x,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
            FROM events),
        s AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM t GROUP BY event_type)
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                     6) AS slope_cph,
               round((CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * CAST(sx AS DOUBLE)) / n, 6) AS intercept_cents
        FROM s
    """,
    tags=("A5", "A1"),
)
def q_agg_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+: closed-form per-group OLS (value-cents ~ event hour), EXACT moments.

    Spark's built-in regr_slope accumulates double running sums, whose
    partial-aggregation order varies run to run — not bit-reproducible.
    Here x (hours since fixture epoch) and y (cents) are INTEGERS, so every
    moment (Σx, Σy, Σxy, Σx²) is an exact BIGINT — map-side combinable AND
    order-independent — and all moments stay below 2^53, so the final
    double arithmetic is the same IEEE expression on both engines.  Same
    one-shuffle partial+final plan as any groupBy; determinism is free.
    """
    ev = datasets.load(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 3600).cast("long") - OLS_T0_HOURS).alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
    )
    s = t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    intercept = (syd - slope * sxd) / F.col("n")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope_cph"),
        F.round(intercept, 6).alias("intercept_cents"),
    )


@register(
    "stat_chi_square",
    oracle="""
        WITH obs AS (
            SELECT event_type, user_id % 3 AS cohort, COUNT(*) AS o
            FROM events GROUP BY 1, 2),
        tot AS (
            SELECT event_type, cohort, o,
                   SUM(o) OVER (PARTITION BY event_type) AS row_t,
                   SUM(o) OVER (PARTITION BY cohort) AS col_t,
                   SUM(o) OVER () AS n
            FROM obs)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               round(SUM(
                   (o - CAST(row_t AS DOUBLE) * col_t / n)
                   * (o - CAST(row_t AS DOUBLE) * col_t / n)
                   / (CAST(row_t AS DOUBLE) * col_t / n)), 6) AS chi2
        FROM tot
    """,
    tags=("A5", "A8"),
)
def q_stat_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+: chi-square independence statistic (event_type x cohort).

    All observed/marginal counts are EXACT integers from one grouped
    aggregate; the statistic is computed over the O(types x cohorts)
    contingency table, not the events — a million-fold reduction before
    any float touches the data.  The final double sum runs over <=15
    cells, whose addition order Spark fixes by summing in a single
    partition (the table is tiny), matching the oracle.
    """
    ev = datasets.load(spark, sf_dir, "events")
    obs = (
        ev.groupBy("event_type", (F.col("user_id") % 3).alias("cohort"))
        .agg(F.count("*").alias("o"))
    )
    tot = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_t"),
        F.sum("o").over(Window.partitionBy("cohort")).alias("col_t"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_t").cast("double") * F.col("col_t") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    return tot.coalesce(1).agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum(term), 6).alias("chi2"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.05), 4) AS lo,
                   round(quantile_cont(value, 0.95), 4) AS hi
            FROM events GROUP BY event_type),
        c AS (
            SELECT e.event_type,
                   CAST(CASE WHEN value < lo THEN lo
                             WHEN value > hi THEN hi
                             ELSE value END AS DECIMAL(18,4)) AS wv
            FROM events e JOIN b ON e.event_type = b.event_type)
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(wv) AS DOUBLE) / COUNT(*) AS wmean
        FROM c GROUP BY event_type
    """,
    tags=("A6", "A5"),
)
def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+: winsorized (outlier-clamped) mean — the robust-statistics pass.

    Two-phase: exact p05/p95 bounds per group (rounded so both engines
    clamp at identical doubles), broadcast back, then clamp and take an
    exact-decimal mean.  At 100 TB the bounds table is O(groups) and the
    clamp pass is the same single scan as any aggregate; swap the exact
    percentile for the mergeable histogram sketch when groups are huge.
    """
    ev = datasets.load(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.05), 4).alias("lo"),
        F.round(F.percentile("value", 0.95), 4).alias("hi"),
    )
    wv = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        ev.join(F.broadcast(b), "event_type")
        .select("event_type", wv.cast("decimal(18,4)").alias("wv"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum("wv").cast("double") / F.count("*")).alias("wmean"),
        )
    )


PSI_WIDTH = 25  # value histogram bins for the drift statistic
PSI_SPLIT = "2024-01-16"  # first half vs second half of the event month


@register(
    "stat_psi_drift",
    oracle=f"""
        WITH h AS (
            SELECT CAST(floor(value / {PSI_WIDTH}) AS BIGINT) AS bin,
                   SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}'
                            THEN 1 ELSE 0 END) AS a,
                   SUM(CASE WHEN ts >= TIMESTAMP '{PSI_SPLIT}'
                            THEN 1 ELSE 0 END) AS b
            FROM events GROUP BY 1),
        t AS (SELECT bin, a, b,
                     SUM(a) OVER () AS ta, SUM(b) OVER () AS tb
              FROM h)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
               round(SUM(
                   (CAST(a AS DOUBLE) / ta - CAST(b AS DOUBLE) / tb)
                   * ln((CAST(a AS DOUBLE) / ta) / (CAST(b AS DOUBLE) / tb))
               ), 6) AS psi
        FROM t WHERE a > 0 AND b > 0
    """,
    tags=("A5", "A1"),
)
def q_stat_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index between two time slices — drift
    monitoring for a continuously-refreshed training corpus.

    Both distributions come from ONE scan (conditional counts per bin),
    so drift checking a 100 TB day-over-day feed costs a single pass and
    a ~20-bin exchange; the float PSI sum runs over the tiny bin table.
    Bins empty on either side are excluded (standard PSI practice — and
    the ln() guard).
    """
    ev = datasets.load(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    h = (
        ev.select(
            F.floor(F.col("value") / PSI_WIDTH).cast("long").alias("bin"),
            F.when(F.col("ts") < split, 1).otherwise(0).alias("ia"),
            F.when(F.col("ts") >= split, 1).otherwise(0).alias("ib"),
        )
        .groupBy("bin")
        .agg(F.sum("ia").alias("a"), F.sum("ib").alias("b"))
    )
    t = h.select(
        "bin",
        "a",
        "b",
        F.sum("a").over(Window.partitionBy()).alias("ta"),
        F.sum("b").over(Window.partitionBy()).alias("tb"),
    ).filter((F.col("a") > 0) & (F.col("b") > 0))
    pa = F.col("a").cast("double") / F.col("ta")
    pb = F.col("b").cast("double") / F.col("tb")
    term = (pa - pb) * F.log(pa / pb)
    return t.coalesce(1).agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum(term), 6).alias("psi"),
    )


@register(
    "agg_share_of_parent",
    oracle=f"""
        WITH rev AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2)
        SELECT region, nation,
               CAST(rev AS DOUBLE) AS revenue,
               round(CAST(rev AS DOUBLE)
                     / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE),
                     6) AS share_of_region
        FROM rev
    """,
    tags=("A1", "W3", "J6"),
)
def q_agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: nation revenue as a fraction of its
    region — the BI ratio-to-report pattern.

    The star join broadcasts every dim; revenue aggregates exactly in
    decimal (order-independent), and the parent-normalizing window runs
    over the O(nations) result — never over the fact.
    """
    from flinkexp_spark.catalog._util import dec

    o = datasets.load(spark, sf_dir, "orders")
    c = datasets.load(spark, sf_dir, "customer")
    n = datasets.load(spark, sf_dir, "nation")
    r = datasets.load(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("region")
    ).cast("double")
    return rev.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(share, 6).alias("share_of_region"),
    )


@register(
    "rollup_continuous_aggregate",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) AS avg_cents,
               CAST(MIN(value) AS DOUBLE) AS min_v,
               CAST(MAX(value) AS DOUBLE) AS max_v,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("A1", "A2", "A7"),
)
def q_rollup_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous aggregate: a per-(event_type, day) PARTIAL
    table is materialized once (count / cents-sum / min / max — every
    measure mergeable), and query time only MERGES partials: sums of sums,
    min of mins, count of partial rows for active-days, and the average
    reconstructed as merged-sum / merged-count (never an average of
    averages).

    The oracle computes the same result directly from raw events — the
    parity check IS the rollup contract.  At 100 TB the partial table is
    ~5 orders of magnitude smaller than raw, refreshed incrementally per
    day-partition; every dashboard query reads partials only.  Non-mergeable
    measures ride along as sketches (sketch_hll_mergeable,
    agg_histogram_quantile).
    """
    events = datasets.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    partials = (
        events.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("p_n"),
            F.sum(cents).alias("p_cents"),
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
        )
        .localCheckpoint()  # the materialized rollup table (session-scoped)
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("p_n").cast("long").alias("n"),
            F.sum("p_cents").cast("long").alias("cents"),
            (F.sum("p_cents").cast("double") / F.sum("p_n")).alias("avg_cents"),
            F.min("p_min").cast("double").alias("min_v"),
            F.max("p_max").cast("double").alias("max_v"),
            F.count("*").cast("long").alias("active_days"),
        )
        .orderBy("event_type")
    )


@register(
    "quality_anomaly_mad",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS med
            FROM events GROUP BY event_type),
        mad AS (
            SELECT e.event_type,
                   round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
            FROM events e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type)
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN abs(e.value - m.med)
                                  > 3 * 1.4826 * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e
        JOIN med m ON e.event_type = m.event_type
        JOIN mad d ON e.event_type = d.event_type
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=("A6", "A5", "J6"),
)
def q_quality_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: modified z-score via median absolute
    deviation (|x - med| > 3 * 1.4826 * MAD) per group — the outlier gate
    that, unlike mean/stddev, a few extreme points cannot drag.

    Two grouped percentile passes with the tiny per-group stats BROADCAST
    back between them (med table, then mad table — K rows each), so the
    fact is scanned three times but never shuffled on value.  Both engines
    round med/MAD to 6 digits BEFORE thresholding so interpolation noise
    can't flip a boundary point.  At scale swap exact percentile for
    approx_percentile and the pass count drops to two.
    """
    events = datasets.load(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    med = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )
