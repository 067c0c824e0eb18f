"""S5 Kafka contract over the file-backed log (sources/kafkalog.py).

The wire protocol belongs to the vendor jar (absent in this sandbox,
gated in test_plans.py); everything engine-owned about Kafka semantics —
schema, key-hash partitioning, offsets, startingOffsets, the streaming
offset protocol, exactly-once sink fencing — is exercised here for real.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

import pytest

from flinkexp_spark.sources.kafkalog import (
    kafka_log_sink,
    partition_for_key,
    produce,
    register_kafka_log_source,
)


@pytest.fixture()
def topic_dir():
    d = tempfile.mkdtemp(prefix="kafkalog_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _produce_n(path: str, topic: str, n: int, n_parts: int = 3) -> None:
    produce(
        path,
        topic,
        [(str(i % 7), json.dumps({"i": i}), 1_700_000_000_000 + i) for i in range(n)],
        n_parts,
    )


def test_batch_read_schema_and_offsets(spark, topic_dir):
    register_kafka_log_source(spark)
    _produce_n(topic_dir, "t", 50)
    df = (
        spark.read.format("kafkalog")
        .option("path", topic_dir)
        .option("subscribe", "t")
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    rows = df.collect()
    assert len(rows) == 50
    # per-partition offsets are contiguous from 0 and placement matches
    # the key-hash partitioner
    by_part: dict[int, list[int]] = {}
    for r in rows:
        assert r["topic"] == "t"
        assert r["partition"] == partition_for_key(r["key"].decode(), 3)
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def test_starting_offsets_per_partition_json(spark, topic_dir):
    register_kafka_log_source(spark)
    _produce_n(topic_dir, "t", 60)
    full = (
        spark.read.format("kafkalog")
        .option("path", topic_dir)
        .option("subscribe", "t")
        .load()
        .groupBy("partition")
        .count()
        .collect()
    )
    counts = {r["partition"]: r["count"] for r in full}
    skip = {"t": {"0": 5, "1": 2}}
    df = (
        spark.read.format("kafkalog")
        .option("path", topic_dir)
        .option("subscribe", "t")
        .option("startingOffsets", json.dumps(skip))
        .load()
    )
    got = {r["partition"]: r["count"] for r in df.groupBy("partition").count().collect()}
    assert got[0] == counts[0] - 5
    assert got[1] == counts[1] - 2
    assert got[2] == counts[2]
    # and nothing below the requested start leaks through
    min0 = df.filter("partition = 0").agg({"offset": "min"}).collect()[0][0]
    assert min0 == 5


def test_stream_drains_in_multiple_throttled_batches(spark, topic_dir):
    register_kafka_log_source(spark)
    _produce_n(topic_dir, "t", 120)
    name = f"kmb_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("kafkalog")
        .option("path", topic_dir)
        .option("subscribe", "t")
        .option("maxRecordsPerBatch", "40")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        fed = [
            p["numInputRows"]
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
    assert sum(fed) == 120
    # the maxOffsetsPerTrigger analog actually throttled: >1 micro-batch,
    # none above the cap
    assert len(fed) >= 3
    assert max(fed) <= 40


def test_sink_exactly_once_fencing(spark, topic_dir):
    writer = kafka_log_sink(topic_dir, "out", n_partitions=2)
    df = spark.createDataFrame(
        [(str(i), f"v{i}", 1_700_000_000_000) for i in range(10)],
        "key string, value string, ts_ms long",
    )
    writer(df, 0)
    writer(df, 0)  # replayed micro-batch: must be fenced by the ledger
    writer(df, 1)
    total = 0
    for p in range(2):
        with open(os.path.join(topic_dir, "out", f"p{p}.jsonl")) as f:
            total += sum(1 for _ in f)
    assert total == 20  # batches 0 and 1 once each, replay skipped
