"""Bounded-replay rig for streaming operators (SURVEY §5.2).

The reference's program is an unbounded streaming job (StreamSocket.scala:13-16).
Its operators are made *testable* by replaying a bounded fixture through the
real Structured Streaming path: fixture rows -> parquet files on disk ->
``spark.readStream`` -> transform -> sink, driven to completion with the
``availableNow`` trigger.  Final state is then comparable against batch SQL
(the DuckDB oracle) — same contract SURVEY §2.1 declares for the rolling
aggregate: *final* totals match; per-record emission cadence is micro-batch.

Key mechanics:

* ``n_files`` > 1 splits the input into time-ordered files and sets
  ``maxFilesPerTrigger=1`` so the replay runs as MULTIPLE micro-batches —
  this is what makes watermark advancement observable (the watermark is
  recomputed between batches, never within one).  File order is pinned via
  mtimes (the file source processes oldest-first).
* ``sentinel`` appends a far-future row as the LAST file so the final
  watermark passes every real window's end — append-mode windowed aggs then
  emit all real windows.  Callers filter the sentinel's own window out.
* Everything (input files, checkpoints, sink) lives under ``.tmp/`` in the
  repo and is cleaned per run.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

def _scratch_root() -> str:
    """Scratch filesystem for replay inputs/checkpoints/sinks.

    Everything written here is throwaway (created and deleted within one
    query call), but the streaming checkpoint's offset/commit logs are
    fsync'd once per micro-batch and the input files are written + read
    back per replay — on a spinning/virtual disk that I/O is a fixed tax
    on every bounded replay (guide §6).  Prefer a tmpfs when the host has
    one; `SPARK_GRAFT_SCRATCH` overrides (point it at a real disk if the
    fixtures outgrow RAM — replay scratch is fixture-sized, MBs).
    """
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return os.path.join(shm, "flinkexp_scratch")
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
    )


SCRATCH_ROOT = _scratch_root()

# Stateful-operator parallelism for bounded replays.  The shuffle-partition
# count is baked into a streaming checkpoint at first start and fixes the
# number of state-store (RocksDB) instances per operator — it should track
# STATE SIZE, not the session's batch shuffle width.  Fixture replays carry
# tiny state, and per-instance open/commit overhead dominates: measured at
# sf0.1, 8 partitions run the windowed replays ~2x faster than 32.  On a
# real cluster, size this to keep per-instance state in memory
# (state_bytes / ~1 GB), NOT to the batch width.
STREAM_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))

# Separate knob for the transformWithStateInPandas / applyInPandasWithState
# replays, whose cost profile differs from the windowed replays (per-key
# Python + protobuf state-server IPC vs per-instance open/commit).  The r14
# VERDICT asked for FEWER partitions here (state ~1.5k keys); the measured
# partition scan at sf0.1 / 32 cores (stream_stateful_totals_tws) says 8 is
# already the optimum: fresh-session medians 2 parts 6.64s / 4 parts 5.20s /
# 8 parts 4.59s (startup cost does NOT dominate — fewer instances serialize
# the per-key Python work), and the interleaved SAME-SESSION A/B of 8 vs 16
# gives 4.91s vs 5.72s median (a fresh-session scan that favored 16 did not
# reproduce — host drift).  Default stays the windowed value; the env knob
# remains for real clusters, where this should track total executor cores.
TWS_SHUFFLE_PARTITIONS = int(
    os.environ.get(
        "SPARK_GRAFT_TWS_PARTITIONS", str(STREAM_SHUFFLE_PARTITIONS)
    )
)

# State-store provider for BOUNDED REPLAYS only.  A replay's state is tiny
# (fixture-sized) and its checkpoint is fresh + throwaway, so the in-memory
# HDFSBackedStateStoreProvider is the right choice: measured ~35% faster
# end-to-end than RocksDB at sf0.01 (RocksDB pays native-instance open +
# changelog commit per partition per batch).  PRODUCTION streaming jobs —
# anything long-running with real state — keep the session default
# (RocksDBStateStoreProvider, session.py:66) which spills keyed state to
# disk instead of OOMing.  Override with SPARK_GRAFT_STREAM_STATE=rocksdb to
# run replays against the production provider (tests/test_streaming.py does
# this for the checkpoint-restart test).
_PROVIDERS = {
    "memory": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}
REPLAY_STATE_PROVIDER = _PROVIDERS[
    os.environ.get("SPARK_GRAFT_STREAM_STATE", "memory")
]


class _stream_partitions:
    """Replay-scoped session conf: shuffle partitions sized to fixture state
    (STREAM_SHUFFLE_PARTITIONS instances per stateful op, not the batch
    width) + the throwaway-checkpoint state provider.  Restores on exit."""

    _KEYS = {
        "spark.sql.shuffle.partitions": str(STREAM_SHUFFLE_PARTITIONS),
        "spark.sql.streaming.stateStore.providerClass": REPLAY_STATE_PROVIDER,
    }

    def __init__(
        self,
        spark: SparkSession,
        state_provider: str | None = None,
        no_data_batches: bool = True,
        partitions: int | None = None,
    ):
        self.spark = spark
        self.keys = dict(self._KEYS)
        if partitions is not None:
            # Per-replay override: the per-key-Python stateful operators
            # (TWS / applyInPandasWithState) want MORE instances than the
            # windowed default — see TWS_SHUFFLE_PARTITIONS above.
            self.keys["spark.sql.shuffle.partitions"] = str(partitions)
        if state_provider is not None:
            # Per-replay override: transformWithStateInPandas needs multiple
            # state column families, which only RocksDB supports.
            self.keys["spark.sql.streaming.stateStore.providerClass"] = (
                _PROVIDERS[state_provider]
            )
        if not no_data_batches:
            # Skip the trailing zero-row micro-batch.  Only set by replays
            # whose OUTPUT cannot depend on it: complete mode (last data
            # batch already re-emitted the whole table), update mode (a
            # no-data batch has no changed keys to emit), and eager
            # append operators (inner stream-stream joins, dropDuplicates)
            # that emit on arrival.  Append windowed aggregates, outer
            # joins, and timer-based emission NEED the no-data batch — the
            # watermark from the last data file only takes effect after
            # that batch — and must keep the default.  The batch is pure
            # overhead for the safe classes: its state-eviction commit
            # rewrites every buffered row into a state-store delta
            # (measured 2.4 s of the 3.5 s stream_window_join replay).
            self.keys["spark.sql.streaming.noDataMicroBatches.enabled"] = (
                "false"
            )

    def __enter__(self):
        self.saved = {k: self.spark.conf.get(k) for k in self.keys}
        for k, v in self.keys.items():
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            self.spark.conf.set(k, v)


def _scratch(tag: str) -> str:
    path = os.path.join(SCRATCH_ROOT, f"{tag}_{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    return path


@contextlib.contextmanager
def scratch_dir(tag: str):
    """Self-cleaning scratch directory under SCRATCH_ROOT — THE shared
    write-then-read-back workspace for source/sink queries (one place for
    naming, creation, and cleanup policy)."""
    path = _scratch(tag)
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


def replay(
    spark: SparkSession,
    source_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "append",
    n_files: int = 1,
    order_col: str | None = None,
    sentinel_df: DataFrame | None = None,
    use_checkpoint: bool = False,
    extra_files: list[DataFrame] | None = None,
    state_provider: str | None = None,
    sink: str = "memory",
    no_data_batches: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Replay ``source_df`` through Structured Streaming; return the sink table.

    The result is materialized to a batch DataFrame (the streaming query has
    terminated by the time this returns).  ``sink="files"`` drains through
    a foreachBatch parquet append instead of the memory sink — pick it for
    INPUT-SIZED outputs (see drain_file_sink); per-batch aggregate outputs
    stay on the memory sink.
    """
    work = _scratch("replay")
    input_dir = os.path.join(work, "input")
    os.makedirs(input_dir)
    try:
        schema = source_df.schema

        parts = _time_split(source_df, n_files, order_col)

        if extra_files:
            parts.extend(extra_files)
        if sentinel_df is not None:
            parts.append(sentinel_df)

        # The per-part writes are independent single-task jobs; submit them
        # concurrently so the next part's write back-fills the scheduler
        # while the previous one commits (guide §2.6 — overlap independent
        # jobs).  Contents and per-file row order are untouched: each part
        # still runs its own coalesce(1) plan exactly as before.
        def _write_part(i: int, p: DataFrame) -> None:
            fdir = os.path.join(input_dir, f"f{i:04d}")
            p.coalesce(1).write.mode("overwrite").parquet(fdir)

        if len(parts) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(parts))) as pool:
                list(pool.map(lambda ip: _write_part(*ip), enumerate(parts)))
        else:
            _write_part(0, parts[0])
        for i in range(len(parts)):
            # one data file per dir; pin mtimes so the file source replays
            # oldest-first in our intended order
            fdir = os.path.join(input_dir, f"f{i:04d}")
            ts = time.time() - (len(parts) - i) * 10
            for root, _, files in os.walk(fdir):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))

        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(input_dir, "f*"))
        )
        out = transform(reader)
        with _stream_partitions(
            spark,
            state_provider=state_provider,
            no_data_batches=no_data_batches,
            partitions=partitions,
        ):
            drain = drain_file_sink if sink == "files" else drain_memory_sink
            return drain(
                spark,
                out,
                output_mode=output_mode,
                checkpoint=os.path.join(work, "checkpoint")
                if use_checkpoint
                else None,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def drain_memory_sink(
    spark: SparkSession,
    out: DataFrame,
    output_mode: str = "append",
    checkpoint: str | None = None,
    available_now: bool = True,
) -> DataFrame:
    """Run a streaming frame to completion through a uuid-named memory
    sink and return the materialized result (THE shared drain: one place
    for sink naming, trigger choice, and guaranteed temp-view cleanup).

    ``available_now=True`` is right for file-backed replays (the trigger
    drains everything then stops).  Custom Python stream sources need
    ``available_now=False``: availableNow snapshots one offset step of a
    SimpleDataSourceStreamReader, so the drain instead runs a continuous
    trigger and blocks on ``processAllAvailable``.
    """
    name = f"sink_{uuid.uuid4().hex[:12]}"
    writer = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="0 seconds")
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    try:
        q = writer.start()
        try:
            if available_now:
                q.awaitTermination()
            else:
                q.processAllAvailable()
        finally:
            if not available_now:
                q.stop()
        # Materialize before dropping the sink table.
        rows = spark.table(name).collect()
    finally:
        # drop even when the stream fails: the session is long-lived and
        # every leaked sink_* view stays registered until it dies
        spark.catalog.dropTempView(name)
    from flinkexp_spark.datasets import local_df

    return local_df(spark, rows, out.schema)


def drain_file_sink(
    spark: SparkSession,
    out: DataFrame,
    output_mode: str = "append",
    checkpoint: str | None = None,
) -> DataFrame:
    """Drain a streaming frame through a foreachBatch parquet APPEND and
    return the read-back result, materialized executor-side.

    The memory sink ships every output row through the driver twice
    (streaming ingest + local_df rebuild) — fine for per-batch aggregate
    rows, quadratic pain for INPUT-SIZED emission contracts
    (stream_wordcount_per_record: 2.76 M rows at sf1, ~9 s of pure driver
    ingest).  Here each micro-batch writes its rows in parallel on the
    executors; in update mode the parquet append IS the memory sink's
    semantics (the memory sink also appends each batch's update rows).
    The result is localCheckpoint-ed (executor block storage) so the
    scratch files can be deleted before returning."""
    with scratch_dir("filesink") as work:
        outdir = os.path.join(work, "out")
        os.makedirs(outdir)

        # Complete mode re-emits the WHOLE result table every batch, so the
        # parquet write must REPLACE, not append — overwrite-per-batch is
        # exactly the memory sink's complete semantics (last table wins).
        write_mode = "overwrite" if output_mode == "complete" else "append"

        def append_batch(df: DataFrame, epoch_id: int) -> None:
            df.write.mode(write_mode).parquet(outdir)

        q = (
            out.writeStream.foreachBatch(append_batch)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(work, "checkpoint"),
            )
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.schema(out.schema)
            .parquet(outdir)
            .localCheckpoint(eager=True)
        )


def _time_split(
    source_df: DataFrame, n_files: int, order_col: str | None
) -> list[DataFrame]:
    """ntile-style split by order_col quantiles (cast to double so
    timestamps work), computed driver-side on the bounds only (fixture
    scale); keeps files time-ordered."""
    if n_files <= 1:
        return [source_df]
    if order_col is None:
        raise ValueError("n_files > 1 requires order_col for the time split")
    fracs = ",".join(str((i + 1) / n_files) for i in range(n_files - 1))
    bounds = source_df.selectExpr(
        f"percentile(cast({order_col} as double), array({fracs})) as b"
    ).collect()[0]["b"]
    prev = None
    from pyspark.sql import functions as F

    ocol = F.col(order_col).cast("double")
    parts = []
    for i in range(n_files):
        cond = None
        if prev is not None:
            cond = ocol > F.lit(prev)
        if i < n_files - 1:
            upper = ocol <= F.lit(bounds[i])
            cond = upper if cond is None else (cond & upper)
            prev = bounds[i]
        parts.append(source_df if cond is None else source_df.filter(cond))
    return parts


def replay_foreach_batch(
    spark: SparkSession,
    source_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    writer: Callable[[DataFrame, int], None],
    output_mode: str = "update",
    n_files: int = 1,
    order_col: str | None = None,
) -> None:
    """Replay through a custom ``foreachBatch`` writer (S7 kv-sink shape and
    any external store: the writer receives each micro-batch DataFrame plus
    the epoch id and performs its own idempotent upserts).  ``n_files`` > 1
    splits the input by ``order_col`` quantiles and runs one micro-batch per
    file, so the writer sees a real incremental sequence."""
    work = _scratch("feb")
    input_dir = os.path.join(work, "input")
    os.makedirs(input_dir)
    try:
        parts = _time_split(source_df, n_files, order_col)
        for i, p in enumerate(parts):
            fdir = os.path.join(input_dir, f"f{i:04d}")
            p.coalesce(1).write.mode("overwrite").parquet(fdir)
            ts = time.time() - (len(parts) - i) * 10
            for root, _, files in os.walk(fdir):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))
        reader = spark.readStream.schema(source_df.schema)
        if len(parts) > 1:
            reader = reader.option("maxFilesPerTrigger", "1")
        reader = reader.parquet(os.path.join(input_dir, "f*"))
        with _stream_partitions(spark):
            q = (
                transform(reader)
                .writeStream.foreachBatch(writer)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .option("checkpointLocation", os.path.join(work, "checkpoint"))
                .start()
            )
            q.awaitTermination()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def replay_update_mode(
    spark: SparkSession,
    source_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    n_files: int = 1,
    order_col: str | None = None,
) -> list:
    """Replay in UPDATE output mode via foreachBatch (the memory sink doesn't
    support update).  Returns the list of per-batch updated-row batches —
    the reference's per-record emission stream at micro-batch granularity
    (SURVEY §2.1 semantic note).  ``n_files`` > 1 splits the input by
    ``order_col`` quantiles into one micro-batch per file (the same
    incremental sequence as :func:`replay_foreach_batch`, which this
    delegates to with a capturing writer)."""
    batches: list = []

    def capture(df: DataFrame, epoch: int) -> None:
        batches.append(df.toPandas())

    replay_foreach_batch(
        spark,
        source_df,
        transform,
        capture,
        output_mode="update",
        n_files=n_files,
        order_col=order_col,
    )
    return batches


class ReplayMetricsListener:
    """StreamingQueryListener that accumulates per-micro-batch progress —
    the observability rig the r09 verdict asks for (#5): rows per batch,
    state-store size, watermark progression, processing rate.

    Listener events arrive ASYNCHRONOUSLY after each batch commits, so
    consumers must call :meth:`await_batch` with the query's final
    ``lastProgress['batchId']`` before reading — otherwise the tail of the
    replay races the listener bus.  The deterministic aggregates exposed
    here (input-row total, non-empty batch count, final state rows, final
    watermark, emitted-row total) are exactly the ones a SQL oracle can
    re-derive from the fixture; wall-clock-dependent rates
    (processedRowsPerSecond, durationMs) are collected too but asserted
    only for presence/positivity in tests — hashing them would pin noise.
    """

    def __init__(self) -> None:
        self.progresses: list[dict] = []
        # Listener callbacks fire for EVERY streaming query on the session;
        # without scoping, a concurrent stream would pollute the hashed
        # deterministic accumulators (round-11 ADVICE).  The collector binds
        # to ONE query id: explicitly via bind(q), else the first query that
        # starts after attach.  Progress from any other id is dropped.
        self._target_id: str | None = None

    def bind(self, query) -> None:
        """Scope the collector to ``query`` (a started StreamingQuery)."""
        self._target_id = str(query.id)

    # StreamingQueryListener interface (duck-typed: PySpark only requires
    # the four callbacks; subclassing pulls heavy JVM wiring we don't need
    # at construction time, so this registers via spark.streams.addListener
    # which accepts any object with these methods wrapped by the base
    # class — see capture_stream_metrics below).
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        if self._target_id is None:
            self._target_id = str(event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        import json as _json

        p = _json.loads(event.progress.json)
        if self._target_id is not None and str(p.get("id")) != self._target_id:
            return
        self.progresses.append(p)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- consumption helpers -------------------------------------------------
    def await_batch(self, batch_id: int, timeout_s: float = 30.0) -> None:
        """Block until the progress for ``batch_id`` has been delivered."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        while _time.monotonic() < deadline:
            if any(p["batchId"] >= batch_id for p in self.progresses):
                return
            _time.sleep(0.05)
        raise TimeoutError(
            f"listener never saw batch {batch_id}; got "
            f"{sorted(p['batchId'] for p in self.progresses)}"
        )

    @property
    def input_rows_total(self) -> int:
        return sum(int(p.get("numInputRows") or 0) for p in self.progresses)

    @property
    def nonempty_batches(self) -> int:
        return sum(1 for p in self.progresses if (p.get("numInputRows") or 0) > 0)

    @property
    def sink_rows_total(self) -> int:
        return sum(
            int((p.get("sink") or {}).get("numOutputRows") or 0)
            for p in self.progresses
        )

    def _final(self) -> dict:
        return max(self.progresses, key=lambda p: p["batchId"])

    @property
    def final_state_rows(self) -> int:
        ops = self._final().get("stateOperators") or []
        return sum(int(o.get("numRowsTotal") or 0) for o in ops)

    @property
    def final_watermark_ms(self) -> int:
        """Final event-time watermark as epoch milliseconds (UTC)."""
        import datetime as _dt

        wm = (self._final().get("eventTime") or {}).get("watermark")
        if not wm:
            return 0
        ts = _dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
        return int(ts.timestamp() * 1000)

    @property
    def rates(self) -> list[float]:
        """processedRowsPerSecond per batch — wall-clock-bound, test-only."""
        return [
            float(p.get("processedRowsPerSecond") or 0.0)
            for p in self.progresses
        ]


@contextlib.contextmanager
def capture_stream_metrics(spark: SparkSession):
    """Attach a :class:`ReplayMetricsListener` for the duration of a replay.

    Usage::

        with capture_stream_metrics(spark) as metrics:
            q = df.writeStream...start(); q.awaitTermination()
            metrics.await_batch(q.lastProgress["batchId"])
        metrics.input_rows_total, metrics.final_watermark_ms, ...
    """
    from pyspark.sql.streaming import StreamingQueryListener

    collector = ReplayMetricsListener()

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            collector.onQueryStarted(event)

        def onQueryProgress(self, event):  # noqa: N802
            collector.onQueryProgress(event)

        def onQueryIdle(self, event):  # noqa: N802
            collector.onQueryIdle(event)

        def onQueryTerminated(self, event):  # noqa: N802
            collector.onQueryTerminated(event)

    listener = _L()
    spark.streams.addListener(listener)
    try:
        yield collector
    finally:
        spark.streams.removeListener(listener)
