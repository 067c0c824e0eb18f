"""Round-4 streaming additions: watermark-scoped dedup state.

``dropDuplicatesWithinWatermark`` (Spark 3.5+) is the production answer to
T6's unbounded-state problem: plain ``dropDuplicates`` on a stream keeps
every key forever, while the within-watermark variant expires each key's
dedup state once the watermark passes its event time + delay — state is
bounded by (arrival rate x delay), not stream length.  At 100 TB/day of
clickstream this is the only dedup that survives; the exact-dedup batch
variants live in catalog/llm_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register
from flinkexp_spark.streaming.replay import replay


@register(
    "stream_dedup_within_watermark",
    oracle="""
        SELECT event_id, user_id, event_type FROM events
    """,
    tags=("T6", "T1"),
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 at production scale: ``dropDuplicatesWithinWatermark`` over an
    at-least-once feed.

    The replay runs TWO micro-batches: the full feed, then a re-delivery of
    the last 30 minutes (the at-least-once tail a crashed producer resends).
    With a 2-hour delay the resent rows are NOT late (watermark = max_ts -
    2h < their event times), so they reach the dedup operator and are
    dropped by its state — exercising the state path, not the late-row
    filter.  Every event_id survives exactly once, which is what the oracle
    checks.  State for a key expires once the watermark passes its event
    time + 2h; plain dropDuplicates would keep it forever.
    """
    events = datasets.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # at-least-once tail: rows within 30 min of the stream's end, resent in
    # a second delivery (1-row max aggregate broadcast, no driver collect)
    cutoff = events.agg(
        (F.max("ts") - F.expr("INTERVAL 30 MINUTES")).alias("cut")
    )
    resent = events.crossJoin(F.broadcast(cutoff)).filter(
        F.col("ts") >= F.col("cut")
    ).drop("cut")

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "user_id", "event_type")
        )

    return replay(
        spark,
        events,
        transform,
        output_mode="append",
        extra_files=[resent],
    )
