"""S5: the Kafka SOURCE/SINK CONTRACT over a file-backed partitioned log.

The reference declares Kafka at study/pom.xml:82-88 and delegates all
broker I/O to the vendor connector jar.  This sandbox has neither the
spark-sql-kafka jar nor a broker, so the wire protocol cannot run — but
everything the ENGINE owns about Kafka semantics can, and does here:

* the exact source schema Spark's Kafka connector produces
  (``key binary, value binary, topic string, partition int, offset
  bigint, timestamp timestamp, timestampType int``);
* topic → partition fan-out with the key-hash partitioner (md5-based so
  the DuckDB oracle recomputes placement arithmetically);
* per-partition monotonically increasing offsets, ``startingOffsets``
  (``earliest`` or the per-partition JSON form ``{"topic": {"0": 5}}``);
* one Spark InputPartition per topic-partition (Kafka's parallelism
  contract) for batch reads;
* the FULL streaming-source offset protocol via ``DataSourceStreamReader``
  — ``initialOffset``/``latestOffset``/``partitions(start, end)``/
  ``read``/``commit`` with per-partition offset dicts, plus a
  ``maxRecordsPerBatch`` throttle mirroring ``maxOffsetsPerTrigger`` so
  one run exercises several micro-batches;
* an exactly-once foreachBatch SINK that routes rows by key hash,
  assigns the next offsets, and dedupes replayed batch ids through a
  committed-batch ledger (the transactional-sink pattern).

The log lives at ``{path}/{topic}/p{N}.jsonl``; line number == offset.
``connectors.kafka_source`` remains the real-broker path (same calling
convention) for jar-present deployments; tests gate on jar presence.

SERIALIZATION RULE (see sources/pysource.py): the DataSource classes are
closure-scoped so cloudpickle ships them by value — executors launched by
a driver running outside the repo cannot import ``flinkexp_spark``.
"""

from __future__ import annotations

import hashlib
import json
import os

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def partition_for_key(key: str, n_partitions: int) -> int:
    """Deterministic key-hash partitioner (md5 — the repo's standard
    cross-engine-reproducible hash; DuckDB mirror:
    ``CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT) % n``)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_partitions


def produce(
    path: str,
    topic: str,
    records: list[tuple[str, str, int]],
    n_partitions: int = 3,
) -> None:
    """Append (key, value, ts_ms) records to the topic log in order.

    Each record lands in partition ``partition_for_key(key)``; its offset
    is the line number, so per-partition offset order == produce order —
    exactly the broker's append contract.
    """
    buckets: dict[int, list[str]] = {}
    for key, value, ts_ms in records:
        p = partition_for_key(key, n_partitions)
        buckets.setdefault(p, []).append(
            json.dumps({"k": key, "v": value, "ts": ts_ms})
        )
    topic_dir = os.path.join(path, topic)
    os.makedirs(topic_dir, exist_ok=True)
    for p in range(n_partitions):
        lines = buckets.get(p, [])
        with open(os.path.join(topic_dir, f"p{p}.jsonl"), "a") as f:
            for ln in lines:
                f.write(ln + "\n")


def make_kafka_log_source():
    """Build the ``kafkalog`` DataSource class (closure-scoped)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    # closure copies of the module helpers: everything the pickled classes
    # touch must ship BY VALUE (workers can't import flinkexp_spark)
    def _topic_partitions(path: str, topic: str) -> dict[int, str]:
        import os as _os

        topic_dir = _os.path.join(path, topic)
        out: dict[int, str] = {}
        if _os.path.isdir(topic_dir):
            for name in _os.listdir(topic_dir):
                if name.startswith("p") and name.endswith(".jsonl"):
                    out[int(name[1:-6])] = _os.path.join(topic_dir, name)
        return out

    def _line_count(file_path: str) -> int:
        n = 0
        with open(file_path, "rb") as f:
            for _ in f:
                n += 1
        return n

    def _starting(options: dict, parts: dict[int, str], topic: str) -> dict[int, int]:
        """startingOffsets -> {partition: first offset to read}."""
        raw = options.get("startingoffsets", "earliest")
        if raw == "earliest":
            return {p: 0 for p in parts}
        if raw == "latest":
            return {p: _line_count(f) for p, f in parts.items()}
        per_topic = json.loads(raw).get(topic, {})
        return {p: int(per_topic.get(str(p), 0)) for p in parts}

    def _read_range(file_path: str, topic: str, p: int, start: int, end: int):
        # runs ON AN EXECUTOR; imports must be local
        import datetime
        import json as _json

        with open(file_path) as f:
            for offset, line in enumerate(f):
                if offset < start:
                    continue
                if offset >= end:
                    break
                rec = _json.loads(line)
                ts = datetime.datetime.fromtimestamp(
                    rec["ts"] / 1000.0, datetime.timezone.utc
                ).replace(tzinfo=None)
                yield (
                    rec["k"].encode() if rec["k"] is not None else None,
                    rec["v"].encode(),
                    topic,
                    p,
                    offset,
                    ts,
                    0,  # timestampType: CreateTime
                )

    class _BatchReader(DataSourceReader):
        def __init__(self, options: dict):
            self.path = options["path"]
            self.topic = options["subscribe"]
            self.options = options

        def partitions(self):
            # one InputPartition per topic-partition — Kafka's parallelism
            # contract; offset bounds resolved driver-side (metadata only,
            # the analog of the connector's offset fetch)
            parts = _topic_partitions(self.path, self.topic)
            start = _starting(self.options, parts, self.topic)
            return [
                InputPartition((p, f, start[p], _line_count(f)))
                for p, f in sorted(parts.items())
            ]

        def read(self, partition):
            p, file_path, start, end = partition.value
            yield from _read_range(file_path, self.topic, p, start, end)

    class _StreamReader(DataSourceStreamReader):
        """Full streaming offset protocol with per-partition offset dicts
        ({"0": 17, "1": 4} — the same shape Kafka checkpoints) and a
        maxRecordsPerBatch throttle (maxOffsetsPerTrigger analog)."""

        def __init__(self, options: dict):
            self.path = options["path"]
            self.topic = options["subscribe"]
            self.options = options
            self.max_per_batch = int(options.get("maxrecordsperbatch", 0))

        def initialOffset(self) -> dict:
            parts = _topic_partitions(self.path, self.topic)
            return {str(p): o for p, o in _starting(self.options, parts, self.topic).items()}

        def latestOffset(self) -> dict:
            # Spark 4.1 calls latestOffset() without the previous offset;
            # emulate maxOffsetsPerTrigger by keeping the last answer.
            parts = _topic_partitions(self.path, self.topic)
            tail = {p: _line_count(f) for p, f in parts.items()}
            prev = getattr(self, "_last", None)
            if prev is None:
                prev = _starting(self.options, parts, self.topic)
            out: dict[int, int] = {}
            budget = self.max_per_batch or sum(tail.values()) + 1
            for p in sorted(tail):
                lo = prev.get(p, 0)
                step = min(tail[p] - lo, budget)
                out[p] = lo + max(step, 0)
                budget -= max(step, 0)
            self._last = out
            return {str(p): o for p, o in out.items()}

        def partitions(self, start: dict, end: dict):
            parts = _topic_partitions(self.path, self.topic)
            return [
                InputPartition((p, parts[p], int(start.get(str(p), 0)), int(e)))
                for p, e in ((int(k), v) for k, v in end.items())
                if int(e) > int(start.get(str(p), 0))
            ]

        def read(self, partition):
            p, file_path, start, end = partition.value
            yield from _read_range(file_path, self.topic, p, start, end)

        def commit(self, end: dict) -> None:
            pass  # the log is immutable; nothing to truncate

    class KafkaLogSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kafkalog"

        def schema(self) -> str:
            return KAFKA_SCHEMA

        def reader(self, schema):
            return _BatchReader({k.lower(): v for k, v in self.options.items()})

        def streamReader(self, schema):
            return _StreamReader({k.lower(): v for k, v in self.options.items()})

    return KafkaLogSource


def register_kafka_log_source(spark) -> None:
    spark.dataSource.register(make_kafka_log_source())


def kafka_log_sink(
    path: str, topic: str, n_partitions: int = 3, ts_col: str = "ts_ms"
):
    """Exactly-once Kafka-pattern sink as a foreachBatch writer.

    Routes each row by key hash, appends with the partition's next
    offsets, and dedupes replayed micro-batches through a committed-batch
    ledger file — the standard transactional-sink recipe (idempotent
    producer + committed-epoch fencing).  Expects (key string, value
    string, ts_ms long) columns.
    """

    def write_batch(df, batch_id: int) -> None:
        ledger = os.path.join(path, topic + ".batches")
        done: set[int] = set()
        if os.path.exists(ledger):
            with open(ledger) as f:
                done = {int(x) for x in f.read().split() if x}
        if batch_id in done:
            return  # replayed after restart — already committed
        rows = df.select("key", "value", ts_col).collect()
        produce(
            path,
            topic,
            [(r[0], r[1], int(r[2])) for r in rows],
            n_partitions,
        )
        with open(ledger, "a") as f:
            f.write(f"{batch_id}\n")

    return write_batch
