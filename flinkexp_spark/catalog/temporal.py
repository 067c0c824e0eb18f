"""Temporal-table operators over ``events``: SCD Type-2 dimension build and
the point-in-time (PIT) join against it.

Reference context: the POM's Flink Table envelope includes temporal tables
(the versioned-table side of `flink-table-planner`, study/pom.xml:149-165)
— the declared surface behind Flink's ``FOR SYSTEM_TIME AS OF``.  The
as-of helper (J9, operators/asof.py) covers the ordered-merge form; these
two queries cover the WAREHOUSE form: materialize validity intervals once
(SCD2), then join facts by key + interval containment.

Scale design:

* ``scd2_build`` is one shuffle on the dimension key plus a per-key sorted
  window (lead) — the canonical distributed SCD2 shape; at 100 TB the
  dimension is orders of magnitude smaller than facts, so this stage is
  cheap and its output is the broadcast/bucket side of every later join.
* ``join_scd2_pit`` is an EQUI-join on the key with the interval predicate
  as a post-join filter — Catalyst plans key-hash join (broadcast here:
  the dim version table is small by construction), never a cartesian;
  per key the versions are disjoint so each fact matches <= 1 version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import TS_FMT, TS_FMT_DUCK
from flinkexp_spark.registry import register

DIM_EVENT = "signup"  # events of this type are dimension-attribute changes
FACT_EVENT = "purchase"  # facts joined point-in-time against the dimension
OPEN_END = "9999-12-31 00:00:00"

# Validity intervals per user from signup events: each signup (re)sets the
# user's tier score; a version is valid from its ts until the next signup.
_O_DIM = f"""
    dim AS (
        SELECT user_id,
               value AS tier_score,
               ts AS valid_from,
               COALESCE(
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
                   TIMESTAMP '{OPEN_END}') AS valid_to
        FROM events WHERE event_type = '{DIM_EVENT}')
"""


def _dim_versions(ev: DataFrame) -> DataFrame:
    """SCD2 version intervals from the change stream: one keyed lead().

    The SINGLE definition of the versioning rule — both registered queries
    (and the shared _O_DIM oracle CTE) derive from this: each DIM_EVENT
    (re)sets the attribute, valid until the next change by (ts, event_id)
    order; the open version ends at OPEN_END.  Columns:
    (user_id, tier_score, valid_from, valid_to).
    """
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return (
        ev.filter(F.col("event_type") == DIM_EVENT)
        .select(
            "user_id",
            "event_id",
            F.col("value").alias("tier_score"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(w),
                F.lit(OPEN_END).cast("timestamp"),
            ),
        )
        .drop("event_id")
    )


@register(
    "scd2_build",
    oracle=f"""
        WITH {_O_DIM}
        SELECT user_id, tier_score,
               strftime(valid_from, '{TS_FMT_DUCK}') AS valid_from,
               strftime(valid_to, '{TS_FMT_DUCK}') AS valid_to,
               CAST(valid_to = TIMESTAMP '{OPEN_END}' AS BOOLEAN) AS is_current
        FROM dim WHERE user_id < 50
    """,
    tags=("W2", "J9"),
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from a change stream: lead() closes each version.

    One shuffle on user_id; (ts, event_id) ordering makes the version chain
    deterministic even under same-timestamp changes.
    """
    ev = datasets.load(spark, sf_dir, "events")
    dim = _dim_versions(ev)
    return dim.filter(F.col("user_id") < 50).select(
        "user_id",
        "tier_score",
        F.date_format("valid_from", TS_FMT).alias("valid_from"),
        F.date_format("valid_to", TS_FMT).alias("valid_to"),
        (F.col("valid_to") == F.lit(OPEN_END).cast("timestamp")).alias(
            "is_current"
        ),
    )


@register(
    "join_scd2_pit",
    oracle=f"""
        WITH {_O_DIM}
        SELECT f.user_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
               CAST(SUM(CAST(d.tier_score AS DECIMAL(18,2))) AS DOUBLE)
                   AS tier_sum
        FROM events f
        JOIN dim d ON f.user_id = d.user_id
                  AND f.ts >= d.valid_from AND f.ts < d.valid_to
        WHERE f.event_type = '{FACT_EVENT}'
        GROUP BY f.user_id
    """,
    tags=("J9", "J7"),
)
def q_join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase sees the dim version active at its ts.

    Equi-join on user_id with the interval containment as a join filter —
    the dim side is broadcast (small by construction), so facts never
    shuffle; per key versions are disjoint, so the join is 1:<=1.
    """
    ev = datasets.load(spark, sf_dir, "events")
    dim = _dim_versions(ev).withColumnRenamed("user_id", "d_user")
    facts = ev.filter(F.col("event_type") == FACT_EVENT)
    joined = facts.join(
        F.broadcast(dim),
        (facts.user_id == dim.d_user)
        & (facts.ts >= dim.valid_from)
        & (facts.ts < dim.valid_to),
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend"),
        F.sum(F.col("tier_score").cast("decimal(18,2)"))
        .cast("double")
        .alias("tier_sum"),
    )


_SESSION_LEN_S = 1800  # each event opens a 30-minute presence interval


@register(
    "interval_concurrency_peak",
    oracle=f"""
        WITH iv AS (
            SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
                   CAST(floor(epoch(ts)) + {_SESSION_LEN_S} AS BIGINT) AS e
            FROM events WHERE user_id IS NOT NULL),
        pts AS (
            SELECT s AS t, 1 AS d FROM iv
            UNION ALL
            SELECT e AS t, -1 AS d FROM iv),
        net AS (SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM pts GROUP BY t),
        run AS (SELECT t, CAST(SUM(net) OVER (ORDER BY t) AS BIGINT) AS conc
                FROM net),
        m AS (SELECT MAX(conc) AS peak FROM run)
        SELECT CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals,
               CAST(peak AS BIGINT) AS peak_concurrency,
               CAST((SELECT MIN(t) FROM run WHERE conc = m.peak) AS BIGINT)
                   AS first_peak_sec
        FROM m
    """,
    tags=("W3", "A2", "O3"),
)
def q_interval_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: every event opens a half-open
    [t, t+30min) presence interval; the answer is the maximum number of
    simultaneously open intervals and the first second it is reached —
    the "peak concurrent sessions" ops metric, and the batch form of what
    a streaming session-window + count would track live.

    The classic +1/-1 sweep, shuffle-bounded by DISTINCT BOUNDARY
    TIMESTAMPS, not intervals: deltas are pre-aggregated per instant
    (map-side combinable groupBy), then the global running sum comes from
    the engine's DISTRIBUTED prefix sum (operators/prefix_sum.py: range
    partition on the timeline -> parallel within-chunk scan -> broadcast
    chunk offsets) — the two-pass formulation that keeps the sweep
    parallel at any timeline length; no single-partition window in the
    plan.  End-exclusive semantics fall out of aggregating the net delta
    per instant (an interval ending at t never overlaps one starting at
    t).  (The oracle keeps the plain windowed scan — same numbers.)
    """
    from flinkexp_spark.operators.prefix_sum import running_sums

    iv = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.unix_timestamp("ts").alias("s"),
            (F.unix_timestamp("ts") + _SESSION_LEN_S).alias("e"),
        )
    )
    pts = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    net = pts.groupBy("t").agg(F.sum("d").cast("long").alias("net"))
    run = (
        running_sums(net, "t", ["net"], prefix="cum_")
        .select("t", F.col("cum_net").alias("conc"))
        .localCheckpoint()  # feeds the peak scalar AND the argmin probe
    )
    peak = run.agg(F.max("conc").alias("peak_concurrency"))
    n_iv = iv.agg(F.count("*").cast("long").alias("n_intervals"))
    return (
        n_iv.crossJoin(F.broadcast(peak))
        .crossJoin(
            F.broadcast(
                run.alias("r")
                .join(
                    F.broadcast(peak).alias("p"),
                    F.col("r.conc") == F.col("p.peak_concurrency"),
                )
                .agg(F.min("t").cast("long").alias("first_peak_sec"))
            )
        )
        .select(
            "n_intervals",
            F.col("peak_concurrency").cast("long"),
            "first_peak_sec",
        )
    )
