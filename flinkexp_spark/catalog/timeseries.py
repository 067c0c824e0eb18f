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
