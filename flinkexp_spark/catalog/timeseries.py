"""Timeseries / hypertable operators: gap-fill and duration-weighted
aggregation (round 4).

The hypertable surface a TimescaleDB/InfluxDB user expects from an
analytics engine, expressed as plain window plans: LOCF (last observation
carried forward) for irregular sensor feeds with dropouts, and the
time-weighted average that is the CORRECT mean for irregularly-sampled
values (an arithmetic mean over-weights bursts of fast samples).  The
continuous-aggregate rollup twin lives in
catalog/aggregates.py::rollup_continuous_aggregate.

Scale notes: both are single-shuffle plans — partition by the series key,
order by time, one pass.  No joins, no explode; state per row is one
carried value / one lead lookahead, so a 100 TB feed runs at scan speed
after its one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

# Deterministic dropout model: 'error' readings are sensor gaps.
_GAP = "CASE WHEN event_type = 'error' THEN NULL ELSE value END"
LOCF_USERS = 40


@register(
    "timeseries_locf",
    oracle=f"""
        SELECT user_id, event_id,
               round(COALESCE(
                   last_value({_GAP} IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   -1.0), 6) AS filled
        FROM events
        WHERE user_id < {LOCF_USERS}
        ORDER BY user_id, event_id
    """,
    tags=("W2", "F4"),
)
def q_timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill: carry the last non-null reading forward per series
    (sensor dropouts modeled as NULLed 'error' readings; leading gaps fill
    with the -1.0 sentinel).

    ``last_value(..., ignoreNulls)`` over an unbounded-preceding row frame —
    one shuffle on the series key, one ordered pass, no self-join.  The
    running frame means Spark keeps O(1) state per row (the last non-null),
    not the whole partition.
    """
    events = datasets.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.when(F.col("event_type") == "error", None).otherwise(
        F.col("value")
    )
    return (
        events.filter(F.col("user_id") < LOCF_USERS)
        .select(
            "user_id",
            "event_id",
            F.round(
                F.coalesce(
                    F.last(gap, ignorenulls=True).over(w), F.lit(-1.0)
                ),
                6,
            ).alias("filled"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "timeseries_time_weighted_avg",
    oracle="""
        WITH spans AS (
            SELECT user_id, value,
                   -- floor(epoch()) mirrors Spark's unix_timestamp()
                   -- second-truncation (fixture ts carries sub-seconds)
                   CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)))
                        - floor(epoch(ts)) AS BIGINT) AS dur_s
            FROM events)
        SELECT user_id,
               round(SUM(CAST(round(value * 100, 0) AS BIGINT) * dur_s)
                     / (100.0 * SUM(dur_s)), 6) AS twa,
               CAST(SUM(dur_s) AS BIGINT) AS span_s
        FROM spans WHERE dur_s IS NOT NULL AND dur_s > 0
        GROUP BY user_id ORDER BY user_id
    """,
    tags=("W2", "A1"),
)
def q_timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series: each reading holds until the next
    one, so its weight is that duration (left-continuous step
    interpolation — the TimescaleDB ``time_weight('locf', ...)`` contract).
    An arithmetic mean would over-weight bursts of rapid samples.

    lead() gives the hold duration in the same single ordered pass; the
    weighted sum runs in integer cents x whole seconds, so the aggregation
    is EXACT and engine-order-independent (the one division happens once
    per group at the end).  Zero-duration repeats and each series' last
    open-ended reading carry no weight.
    """
    events = datasets.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (
        F.unix_timestamp(F.lead("ts").over(w))
        - F.unix_timestamp(F.col("ts"))
    ).alias("dur_s")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    spans = events.select(
        "user_id", cents.alias("cents"), dur
    ).filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return (
        spans.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("cents") * F.col("dur_s"))
                / (100.0 * F.sum("dur_s")),
                6,
            ).alias("twa"),
            F.sum("dur_s").cast("long").alias("span_s"),
        )
        .orderBy("user_id")
    )


_XC_A, _XC_B = "click", "purchase"  # does click activity lead purchases?
_XC_MAX_LAG = 3  # hours


@register(
    "timeseries_cross_correlation",
    oracle=f"""
        WITH h AS (
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                   CAST(SUM(CASE WHEN event_type = '{_XC_A}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN event_type = '{_XC_B}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS nb
            FROM events WHERE event_type IN ('{_XC_A}', '{_XC_B}')
            GROUP BY 1),
        span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM h),
        spine AS (
            SELECT UNNEST(range(h0, h1 + 1)) AS hour FROM span),
        f AS (
            SELECT s.hour, COALESCE(h.na, 0) AS na, COALESCE(h.nb, 0) AS nb
            FROM spine s LEFT JOIN h ON h.hour = s.hour),
        lags AS (SELECT UNNEST(range(0, {_XC_MAX_LAG} + 1)) AS lag),
        p AS (
            SELECT l.lag, x.na AS a, y.nb AS b
            FROM lags l
            JOIN f x ON TRUE
            JOIN f y ON y.hour = x.hour + l.lag),
        m AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
                   CAST(SUM(a * a) AS BIGINT) AS saa,
                   CAST(SUM(b * b) AS BIGINT) AS sbb,
                   CAST(SUM(a * b) AS BIGINT) AS sab
            FROM p GROUP BY lag)
        SELECT lag, n,
               round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
                   AS xcorr
        FROM m ORDER BY lag
    """,
    tags=("A5", "J7", "F3"),
)
def q_timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation of two event series: does click volume at
    hour t predict purchase volume at t+lag?  One row per lag 0..3 —
    the lead/lag screen run before fitting any forecasting model.

    The series align on a DENSE hour spine (sequence + explode), so
    silent gaps count as zero instead of being dropped; moments are exact
    BIGINTs per the house A5 convention and only the final Pearson
    expression is floating point (identical tree both engines, round 6).
    The spine join is a broadcast (the spine is |hours| rows); the lag
    fan-out is a 4-row literal cross join, so the whole plan is one
    aggregate over |hours| * |lags| rows regardless of event volume.
    """
    ev = datasets.load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_XC_A, _XC_B)
    )
    h = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    ).agg(
        F.sum((F.col("event_type") == _XC_A).cast("long")).alias("na"),
        F.sum((F.col("event_type") == _XC_B).cast("long")).alias("nb"),
    )
    spine = (
        h.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(F.explode(F.sequence("h0", "h1")).alias("hour"))
    )
    f = (
        spine.join(h, "hour", "left")
        .select(
            "hour",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
        .localCheckpoint()  # both sides of the lag join reuse the spine
    )
    lags = spark.range(0, _XC_MAX_LAG + 1).select(F.col("id").alias("lag"))
    x = f.select(F.col("hour"), F.col("na").alias("a"))
    y = f.select(F.col("hour").alias("yhour"), F.col("nb").alias("b"))
    p = (
        F.broadcast(lags)
        .crossJoin(x)
        .join(y, F.col("yhour") == F.col("hour") + F.col("lag"))
    )
    m = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
    )
    xcorr = F.round(
        (
            F.col("n").cast("double") * F.col("sab").cast("double")
            - F.col("sa").cast("double") * F.col("sb").cast("double")
        )
        / (
            F.sqrt(
                F.col("n").cast("double") * F.col("saa").cast("double")
                - F.col("sa").cast("double") * F.col("sa").cast("double")
            )
            * F.sqrt(
                F.col("n").cast("double") * F.col("sbb").cast("double")
                - F.col("sb").cast("double") * F.col("sb").cast("double")
            )
        ),
        6,
    )
    return m.select("lag", "n", xcorr.alias("xcorr")).orderBy("lag")


RESAMPLE_USERS = 40  # series included in the resample fixture window


@register(
    "timeseries_resample_linear",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
            FROM events WHERE user_id < {RESAMPLE_USERS}),
        obs AS (
            SELECT user_id, t,
                   CAST(MIN(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS v
            FROM ev GROUP BY user_id, t),
        rng AS (
            SELECT user_id,
                   CAST(FLOOR((MIN(t) + 3599) / 3600.0) AS BIGINT) AS h0,
                   CAST(FLOOR(MAX(t) / 3600.0) AS BIGINT) AS h1
            FROM obs GROUP BY user_id),
        grid AS (
            SELECT user_id, 3600 * unnest(range(h0, h1 + 1)) AS t
            FROM rng WHERE h0 <= h1),
        u AS (
            SELECT user_id, t, v, 1 AS is_obs FROM obs
            UNION ALL
            SELECT user_id, t, NULL, 0 FROM grid),
        w AS (
            SELECT user_id, t, is_obs,
                   last_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY t, is_obs DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS pt,
                   last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY t, is_obs DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS pv,
                   first_value(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY t, is_obs
                             ROWS BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS nt,
                   first_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY t, is_obs
                             ROWS BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS nv
            FROM u)
        SELECT user_id, t AS g,
               CAST(CASE WHEN nt = pt THEN pv * 10000
                    ELSE FLOOR((pv * (nt - t) + nv * (t - pt)) * 10000.0
                               / (nt - pt)) END AS BIGINT) AS val_x1e6
        FROM w
        WHERE is_obs = 0 AND pt IS NOT NULL AND nt IS NOT NULL
        ORDER BY user_id, g
    """,
    tags=("W2", "F3", "J7"),
)
def q_timeseries_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each irregular series onto a fixed hourly grid with LINEAR
    interpolation between the surrounding readings — the hypertable
    ``time_bucket_gapfill(..., interpolate(...))`` contract
    (TimescaleDB), completing the fill family: LOCF carries a step
    function; this draws the secant.

    Integer-exact: readings collapse to per-second cents (ties -> MIN,
    deterministic), grid points are epoch-second hour multiples, and the
    interpolated value floor((pv*(nt-g) + nv*(g-pt)) * 1e4 / (nt-pt)) is
    computed over exact integers whose products stay far below 2^53, so
    the one float division is bit-identical on both engines.  A reading
    exactly ON a grid point short-circuits to its own value (nt = pt
    guard — the divisor would be zero).

    Plan shape: the sort-merge trick for interpolation WITHOUT a range
    join — union the grid rows into the observation stream, then ONE
    partition-by-series ordered pass computes prev/next via
    running-frame last/first(ignorenulls) in both directions.  Two
    window sorts over the same hash partitioning (Catalyst reuses the
    exchange), no self-join, no explode-per-gap.  At 100 TB: state per
    row is one carried (t, v) pair each direction; grid density is
    bounded by the bucket width, so output stays O(series x hours)
    regardless of reading rate.
    """
    ev = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id") < RESAMPLE_USERS)
        .select(
            "user_id",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
            "value",
        )
    )
    obs = ev.groupBy("user_id", "t").agg(
        F.min(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    rng = obs.groupBy("user_id").agg(
        F.floor((F.min("t") + 3599) / 3600.0).cast("long").alias("h0"),
        F.floor(F.max("t") / 3600.0).cast("long").alias("h1"),
    )
    grid = (
        rng.filter(F.col("h0") <= F.col("h1"))
        .select(
            "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
        )
        .select(
            "user_id",
            (F.col("h") * 3600).cast("long").alias("t"),
            F.lit(None).cast("long").alias("v"),
            F.lit(0).alias("is_obs"),
        )
    )
    u = obs.select(
        "user_id", "t", "v", F.lit(1).alias("is_obs")
    ).unionByName(grid)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t"), F.desc("is_obs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t"), F.asc("is_obs"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("is_obs") == 1, F.col("t"))
    obs_v = F.when(F.col("is_obs") == 1, F.col("v"))
    w = u.select(
        "user_id",
        "t",
        "is_obs",
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("pt"),
        F.last(obs_v, ignorenulls=True).over(w_prev).alias("pv"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("nt"),
        F.first(obs_v, ignorenulls=True).over(w_next).alias("nv"),
    )
    val = F.when(
        F.col("nt") == F.col("pt"), F.col("pv") * 10000
    ).otherwise(
        F.floor(
            (
                F.col("pv") * (F.col("nt") - F.col("t"))
                + F.col("nv") * (F.col("t") - F.col("pt"))
            )
            * 10000.0
            / (F.col("nt") - F.col("pt"))
        )
    )
    return (
        w.filter(
            (F.col("is_obs") == 0)
            & F.col("pt").isNotNull()
            & F.col("nt").isNotNull()
        )
        .select(
            "user_id",
            F.col("t").alias("g"),
            val.cast("long").alias("val_x1e6"),
        )
        .orderBy("user_id", "g")
    )
