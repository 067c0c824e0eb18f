"""W1-W5: OVER-clause window functions (SURVEY §2.2).

Reference: declared by the Table/SQL planner envelope (study/pom.xml:149-165).

Scale notes: a window spec compiles to one shuffle on partitionBy + a sort
within partitions (WindowExec).  Partition keys here (mktsegment, user_id)
have bounded per-key cardinality, so no single task sees unbounded state.
Global (un-partitioned) windows — which would serialize on one task at
100 TB — are deliberately avoided except where semantically required, and
then only after an aggressive reduction (see setops.order_by_ranked).
Every orderBy includes a unique tiebreaker column so results are
deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import dec
from flinkexp_spark.registry import register


@register(
    "window_ranking",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM customer
        WHERE c_custkey < 300
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("W1",),
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank / ntile / percent_rank."""
    c = datasets.load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "window_analytic",
    oracle="""
        SELECT event_id, user_id,
               COALESCE(LAG(event_id) OVER w, -1) AS prev_event,
               COALESCE(LEAD(event_id) OVER w, -1) AS next_event,
               LAG(event_id, 2, -1) OVER w AS prev2_event,
               FIRST_VALUE(event_id) OVER w AS first_event,
               LAST_VALUE(event_id) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_event
        FROM events
        WHERE user_id < 10
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W2",),
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead (with default), first_value/last_value over explicit frames."""
    e = datasets.load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_event"),
        F.coalesce(F.lead("event_id").over(w), F.lit(-1)).alias("next_event"),
        F.lag("event_id", 2, -1).over(w).alias("prev2_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@register(
    "window_running_agg",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS running_spend,
               COUNT(*) OVER w AS running_orders
        FROM orders
        WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W3",),
)
def q_window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running sum/count over a rows frame (decimal-exact money)."""
    o = datasets.load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("running_orders"),
    )


@register(
    "window_range_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, order_day,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY order_day
                              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                   AS orders_last_30d
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS order_day
              FROM orders WHERE o_custkey < 50) t
    """,
    tags=("W4",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: range frame — trailing 30-day order count per customer.

    The order key is a day number (epoch//86400) so RANGE semantics are
    identical across engines regardless of timestamp representation.
    """
    o = datasets.load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    o = o.select(
        "o_orderkey",
        "o_custkey",
        (F.unix_timestamp("o_orderdate") / F.lit(86400))
        .cast("bigint")
        .alias("order_day"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        F.count("*").over(w).alias("orders_last_30d"),
    )


@register(
    "window_topk_per_group",
    oracle="""
        SELECT segment, c_custkey, c_acctbal, rn FROM (
            SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) t WHERE rn <= 3
    """,
    tags=("W5",),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: top-3 customers by balance per segment (rank-filter pattern).

    Catalyst rewrites the rn<=k filter into a per-partition top-k
    (WindowGroupLimit) — no full sort of each partition at scale.
    """
    c = datasets.load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


SESSION_GAP_MIN = 30


@register(
    "sessionize_batch",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                             > INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered)
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
               CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
                   AS duration_s
        FROM sessions
        GROUP BY user_id, sid
    """,
    tags=("T4", "W3"),
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min-gap sessions via gaps-and-islands
    (lag -> boundary flag -> running sum), the batch dual of the streaming
    session window (T4) with per-session stats the streaming mode can't
    retrofit (duration, value sum).

    Plan shape: ONE shuffle on user_id serves both window passes and the
    final per-session aggregate — Catalyst reuses the partitioning, so at
    100 TB this is a single hash-partition of the events table regardless
    of session count.
    """
    events = datasets.load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w_ord)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1
    ).otherwise(0)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            "user_id", "event_id", "ts", "value", new_session.alias("new_session")
        )
        .withColumn("sid", F.sum("new_session").over(w_run))
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
            (
                F.floor(F.max(F.col("ts").cast("double")))
                - F.floor(F.min(F.col("ts").cast("double")))
            )
            .cast("long")
            .alias("duration_s"),
        )
        .drop("sid")
    )


@register(
    "window_cumulate",
    oracle="""
        WITH steps AS (SELECT unnest(range(1, 5)) AS s),
        hits AS (
            SELECT floor(epoch(ts) / 86400) * 86400 AS day_start,
                   day_start + 21600 * s.s AS win_end,
                   value
            FROM events, steps s
            WHERE epoch(ts) < day_start + 21600 * s.s
        )
        SELECT strftime(make_timestamp(CAST((day_start) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               strftime(make_timestamp(CAST((win_end) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S')
                   AS window_end,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM hits
        GROUP BY 1, 2
    """,
    tags=("T2", "T3"),
)
def q_window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CUMULATE window TVF analog (FLIP-145): expanding windows from
    each day start in 6 h steps — [00:00,06:00), [00:00,12:00), ...,
    [00:00,24:00).  An event lands in every step window whose end is after
    its timestamp (early partial results that converge to the day total —
    the dashboard-refresh window Flink added because sliding windows
    over-count and tumbling windows arrive late).

    Spark has no native CUMULATE; the expansion is an explode over the
    step multiples that cover the event — at most 4 rows per event
    (bounded, like a hop window's overlap factor), then one shuffle on the
    (day, step) key.  State at scale = O(open windows), identical to hop.
    """
    events = datasets.load(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("long") * 86400
    # keep only step windows that cover the event
    hits = (
        events.select("ts", "value", day.alias("day_start"))
        .select(
            "ts",
            "value",
            "day_start",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("s"),
        )
        .filter(
            F.unix_timestamp("ts")
            < F.col("day_start") + 21600 * F.col("s")
        )
        .select(
            "day_start",
            (F.col("day_start") + 21600 * F.col("s")).alias("win_end"),
            "value",
        )
    )
    return hits.groupBy("day_start", "win_end").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("total"),
    ).select(
        F.date_format(F.timestamp_seconds("day_start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.date_format(F.timestamp_seconds("win_end"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_end"
        ),
        "n",
        "total",
    )


EWMA_ALPHA = 0.2  # decay factor; state-free oracle-checkable fold


@register(
    "window_ewma_per_user",
    oracle=f"""
        WITH o AS (
            SELECT user_id,
                   list_transform(
                       list_sort(list({{'ts': ts, 'eid': event_id,
                                        'v': value}})),
                       s -> s.v) AS vals
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id)
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                     (acc, v) -> acc * {1 - EWMA_ALPHA} + v * {EWMA_ALPHA}),
                     6) AS ewma
        FROM o
    """,
    tags=("W3", "F2"),
)
def q_window_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (order-sensitive running aggregate): per-user EWMA of purchase
    values — acc = acc*(1-a) + v*a folded in (ts, event_id) order, zero
    init.  The time-decayed per-key statistic monitoring pipelines keep.

    Determinism: both engines sort the SAME struct lexicographically and
    fold the SAME IEEE-double sequence, so results match bit-for-bit (6-dp
    round as belt-and-braces).  Scale note: this batch form collects one
    ordered array per key (bounded here by purchases/user); the unbounded
    streaming form carries O(1) state per key instead — one (last_ts,
    ewma) pair updated per event via applyInPandasWithState, the
    streaming/stateful.py T7 shape.
    """
    events = datasets.load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", F.col("event_id").alias("eid"), F.col("value").alias("v")))
    )
    fold = F.aggregate(
        F.transform(ordered, lambda s: s["v"]),
        F.lit(0.0),
        lambda acc, v: acc * (1 - EWMA_ALPHA) + v * EWMA_ALPHA,
    )
    return events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.round(fold, 6).alias("ewma"),
    )


@register(
    "agg_ohlc_bars",
    oracle="""
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               min_by(value, ts) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               max_by(value, ts) AS close,
               COUNT(*) AS n_events
        FROM events
        WHERE user_id < 25
        GROUP BY 1, 2
    """,
    tags=("A1", "A7", "T2"),
)
def q_agg_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to OHLC bars — one partial+final aggregate.

    open/close via ``min_by``/``max_by`` on the event time: unlike
    ``first``/``last`` (partition-order-dependent) these are deterministic
    AND map-side combinable, so resampling a 100 TB tick stream is a single
    shuffle of one small struct per (key, bar).  (ts, value) is unique per
    user in the fixture, making the min_by/max_by tie-free.
    """
    ev = datasets.load(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    return (
        ev.groupBy(
            "user_id",
            F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day_idx"),
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "window_period_over_period",
    oracle="""
        WITH daily AS (
            SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
                   event_type,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2),
        w AS (
            SELECT day_idx, event_type, cents,
                   lag(cents) OVER (PARTITION BY event_type
                                    ORDER BY day_idx) AS prev
            FROM daily)
        SELECT day_idx, event_type,
               CAST(cents AS BIGINT) AS cents,
               round((CAST(cents AS DOUBLE) - prev) / prev, 6) AS dod_change
        FROM w WHERE prev IS NOT NULL AND day_idx < 19740
    """,
    tags=("W2", "A1"),
)
def q_window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day percentage change per series — the period-over-period
    window every metrics dashboard runs.

    The daily rollup is the only fact-sized stage (map-side-combined
    integer cents, order-independent); lag() runs over the O(days x types)
    series table.  Day 19740+ is excluded so sf-dir fixtures with partial
    final days stay deterministic.
    """
    ev = datasets.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day_idx"),
            "event_type",
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day_idx")
    prev = F.lag("cents").over(w)
    return (
        daily.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull() & (F.col("day_idx") < 19740))
        .select(
            "day_idx",
            "event_type",
            F.col("cents").cast("long").alias("cents"),
            F.round(
                (F.col("cents").cast("double") - F.col("prev")) / F.col("prev"), 6
            ).alias("dod_change"),
        )
    )


@register(
    "window_distribution",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume,
               NTILE(10) OVER w AS decile
        FROM customer
        WHERE c_custkey < 400
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
    """,
    tags=("W1",),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 distribution ranks: percent_rank + cume_dist + decile ntile per
    segment — the percentile-position trio behind score normalization and
    tiering.  One sort per partition serves all three functions (same
    window spec); rounded so rank fractions hash identically."""
    c = datasets.load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 400
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    ).orderBy("c_custkey")


@register(
    "window_gaps_islands",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events WHERE user_id IS NOT NULL),
        r AS (
            SELECT user_id, day,
                   row_number() OVER (PARTITION BY user_id ORDER BY day)
                       AS rn
            FROM act),
        isl AS (
            SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(day) AS start_day
            FROM r GROUP BY user_id, grp),
        pick AS (
            SELECT user_id,
                   CAST(SUM(len) AS BIGINT) AS n_active_days,
                   CAST(COUNT(*) AS BIGINT) AS n_streaks,
                   CAST(MAX(len) AS BIGINT) AS longest_streak
            FROM isl GROUP BY user_id)
        SELECT p.user_id, n_active_days, n_streaks, longest_streak,
               CAST(MIN(i.start_day) AS STRING) AS longest_start
        FROM pick p JOIN isl i
          ON i.user_id = p.user_id AND i.len = p.longest_streak
        GROUP BY p.user_id, n_active_days, n_streaks, longest_streak
        ORDER BY p.user_id
    """,
    tags=("W1", "A1", "F3"),
)
def q_window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks (the
    canonical row_number difference trick — day minus dense rank is
    constant within an unbroken run).  Reports streak count, total active
    days, the longest streak, and its earliest start date per user —
    the "N-day streak" retention metric.

    Everything shuffles once on user_id: the distinct, the rank window,
    and the island aggregation share the partition key, and the
    longest-streak pick joins islands back to per-user maxima on the same
    key (co-partitioned).  Island state is |distinct active days|, never
    raw events.
    """
    act = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    isl = (
        act.withColumn("grp", F.date_sub(F.col("day"), rn))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"), F.min("day").alias("start_day"))
        .localCheckpoint()  # feeds the per-user rollup AND the pick join
    )
    pick = isl.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )
    return (
        pick.join(isl, "user_id")
        .filter(F.col("len") == F.col("longest_streak"))
        .groupBy("user_id", "n_active_days", "n_streaks", "longest_streak")
        .agg(F.min("start_day").cast("string").alias("longest_start"))
        .orderBy("user_id")
    )
