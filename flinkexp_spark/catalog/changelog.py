"""Changelog -> snapshot compaction: Flink's upsert/dynamic-table view.

Reference parity: Flink materializes a keyed changelog stream into a table
whose value per key is the latest row (upsert-kafka source,
ChangelogNormalize operator; the planner envelope at study/pom.xml:149-165
declares the Table API where every keyed stream IS such a dynamic table).
Spark has no changelog table type, so the engine expresses the same
semantics two ways:

* batch: one window pass — row_number() per key by (ts, event_id) DESC,
  keep rn=1.  One shuffle on the key; at 100 TB this is the standard
  compaction job shape (and is how a lakehouse MERGE materializes a CDC
  feed).
* streaming: a replayed aggregation ``max_by(payload, (ts, event_id))`` per
  key — per-key state is ONE struct (the current winner), exactly
  ChangelogNormalize's state, bounded by key cardinality not stream length.

The `events` fixture acts as the changelog: key = user_id, version order =
(ts, event_id), payload = (event_type, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register
from flinkexp_spark.streaming.replay import replay

_SNAPSHOT_ORACLE = """
    SELECT user_id,
           CAST(ts AS STRING) AS ts_s,
           event_type AS last_type,
           value AS last_value
    FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) v
    WHERE rn = 1
"""


@register("changelog_compact", oracle=_SNAPSHOT_ORACLE, tags=("W1", "J8"))
def q_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch changelog compaction: latest row per key, (ts, event_id) as the
    version vector.  Single shuffle on user_id; no join, no explode."""
    events = datasets.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").cast("string").alias("ts_s"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


@register("stream_changelog_upsert", oracle=_SNAPSHOT_ORACLE, tags=("T7", "T9"))
def q_stream_changelog_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert materialization: the same snapshot produced by the
    REAL streaming path — groupBy(key).max_by(payload, version) in complete
    mode over a two-batch replay, so the second batch's rows overwrite the
    first's per key exactly like Flink's upsert view.

    max_by keeps one struct per key (current winner) — state is O(keys),
    and the version tiebreak (ts, event_id) makes the winner deterministic
    under any batch interleaving.
    """
    events = datasets.load(spark, sf_dir, "events")

    def transform(stream: DataFrame) -> DataFrame:
        return stream.groupBy("user_id").agg(
            F.max_by(
                F.struct("ts", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("last")
        )

    out = replay(
        spark,
        events,
        transform,
        output_mode="complete",
        n_files=2,
        order_col="ts",
    )
    return out.select(
        "user_id",
        F.col("last.ts").cast("string").alias("ts_s"),
        F.col("last.event_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
    )


_CDC_ORACLE = """
    SELECT user_id,
           CAST(n_ops AS BIGINT) AS n_ops,
           last_value
    FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op,
               value AS last_value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_ops
        FROM events
    ) v
    WHERE rn = 1 AND op <> 'D'
"""


@register("cdc_apply_ops", oracle=_CDC_ORACLE, tags=("W1", "P2"))
def q_cdc_apply_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC op-log application: I/U/D change feed -> live-row snapshot.

    The third changelog shape (after compaction and upsert replay): the feed
    carries an operation column, and a key whose LAST op is a delete must be
    absent from the snapshot.  One window pass — row_number for the winner
    and a windowed count for audit, same single shuffle on the key; deletes
    are a post-window filter, never a join.  This is how a Debezium/binlog
    feed lands in a lakehouse table at any scale.
    """
    events = datasets.load(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        events.select(
            "user_id", "ts", "event_id", op.alias("op"),
            F.col("value").alias("last_value"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count("*").over(wc))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "n_ops", "last_value")
    )


_IVM_ORACLE = """
    WITH last AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id IS NOT NULL)
    SELECT CAST(user_id % 10 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM last WHERE rn = 1 AND op <> 'D'
    GROUP BY 1 ORDER BY 1
"""


@register("changelog_incremental_agg", oracle=_IVM_ORACLE, tags=("W2", "A1", "T7"))
def q_changelog_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by RETRACTION: maintain per-segment
    SUM/COUNT from the keyed changelog without ever materializing the
    snapshot.  Each op emits a delta pair — retract the key's previous
    live contribution (lag over version order), add its own unless it is
    a delete — and the per-key deltas TELESCOPE, so summing them per
    segment is algebraically the aggregate of the final live rows.  This
    is exactly Flink's upsert-aggregate / retraction-stream operator (the
    dynamic-table aggregate the Table API envelope declares); the oracle
    instead RECOMPUTES the snapshot directly, so the hash check proves
    the retraction algebra equals recompute.

    Cost: one shuffle on the key for the lag window, then a map-side
    combinable segment aggregate over the delta stream — no snapshot
    join, no second pass; at 100 TB the deltas fold into partial sums
    exactly like any additive aggregate.
    """
    ev = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "error", "D")
            .when(F.col("event_type") == "signup", "I")
            .otherwise("U")
            .alias("op"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    wk = Window.partitionBy("user_id").orderBy("ts", "event_id")
    live = F.col("op") != "D"
    prev_live = F.col("prev_op").isNotNull() & (F.col("prev_op") != "D")
    deltas = (
        ev.withColumn("prev_op", F.lag("op").over(wk))
        .withColumn("prev_cents", F.lag("cents").over(wk))
        .select(
            (F.col("user_id") % 10).cast("long").alias("segment"),
            (
                F.when(live, 1).otherwise(0)
                - F.when(prev_live, 1).otherwise(0)
            ).alias("d_n"),
            (
                F.when(live, F.col("cents")).otherwise(0)
                - F.when(prev_live, F.col("prev_cents")).otherwise(0)
            ).alias("d_cents"),
        )
    )
    return (
        deltas.groupBy("segment")
        .agg(
            F.sum("d_n").cast("long").alias("n_live"),
            F.sum("d_cents").cast("long").alias("cents_sum"),
        )
        .orderBy("segment")
    )


@register(
    "changelog_incremental_join",
    oracle="""
        WITH a AS (
            SELECT user_id, event_id, event_id % 3 AS ta
            FROM events WHERE user_id % 5 = 0
        ),
        b AS (
            SELECT o_custkey, o_orderkey, o_orderkey % 3 AS tb
            FROM orders
        )
        SELECT a.user_id, a.event_id, b.o_orderkey,
               greatest(a.ta, b.tb) AS epoch
        FROM a JOIN b ON a.user_id = b.o_custkey
    """,
    tags=("J1", "T8", "T9"),
)
def q_changelog_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance (delta-join IVM) — the join-view
    sibling of `changelog_incremental_agg`'s retraction aggregate: two
    insert-only changelogs A (events, epoch = event_id % 3) and B (orders,
    epoch = o_orderkey % 3) maintain the view V = A JOIN B by computing,
    per epoch t, only the DELTA

        dV_t  =  dA_t JOIN B_{<=t}   UNION ALL   A_{<t} JOIN dB_t

    (the classic decomposition; the dA JOIN dB corner lives in the first
    term because B_{<=t} includes dB_t).  Each joined pair (a, b) appears
    in exactly one delta — the epoch both sides exist, max(ta, tb) — so
    the UNION of the three deltas equals the full join: the oracle
    RECOMPUTES A JOIN B with greatest-epoch attribution, and the hash
    check proves the incremental plan neither drops nor duplicates a
    pair.  This is Flink's two-sided streaming-join state update
    expressed as bounded epochs.

    Scale: per epoch the join keys shuffle only the DELTA plus the probe
    side — at 100 TB the deltas are micro-batch-sized while B_{<=t} is
    served by the (bucketed) accumulated table, which is exactly how a
    streaming warehouse maintains join views without recomputing them.
    """
    a = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select(
            "user_id", "event_id", (F.col("event_id") % 3).alias("ta")
        )
    )
    b = datasets.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", (F.col("o_orderkey") % 3).alias("tb")
    )
    deltas = []
    for t in range(3):
        da = a.filter(F.col("ta") == t)
        db = b.filter(F.col("tb") == t)
        b_upto = b.filter(F.col("tb") <= t)
        a_before = a.filter(F.col("ta") < t)
        deltas.append(
            da.join(b_upto, F.col("user_id") == F.col("o_custkey")).select(
                "user_id", "event_id", "o_orderkey",
                F.lit(t).cast("long").alias("epoch"),
            )
        )
        deltas.append(
            a_before.join(db, F.col("user_id") == F.col("o_custkey")).select(
                "user_id", "event_id", "o_orderkey",
                F.lit(t).cast("long").alias("epoch"),
            )
        )
    out = deltas[0]
    for d in deltas[1:]:
        out = out.unionAll(d)
    return out
