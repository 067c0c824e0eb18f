"""S1-S11: sources, sinks, formats (SURVEY §2.2).

Reference declarations: HDFS/posix files (study/pom.xml:40-57), Kafka
(study/pom.xml:82-88), Redis sink (study/pom.xml:65), JDBC/MySQL
(study/pom.xml:105), HBase (study/pom.xml:126-140, out of t2 scope), JSON
format (study/pom.xml:172), socket source (StreamSocket.scala:13), print
sink (StreamSocket.scala:15).

Everything maps to Spark's native readers/writers; formats carry explicit
schemas (no ``inferSchema`` in the engine paths — schema inference reads the
data twice and guesses types, both wrong at 100 TB).  Connectors whose
backing service isn't available in the test container (Kafka broker, MySQL,
Redis) still build the real reader/writer plumbing; their round-trip tests
are gated on service availability.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------- batch file formats (S1-S4) ------------------------------------


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2: columnar scan; Catalyst pushes filters + prunes columns/partitions."""
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        # Hive-style layout: enables partition pruning for downstream scans.
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S2-adjacent columnar alternative: ORC scan (filter pushdown + column
    pruning work identically to parquet — Spark's native vectorized reader)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_text(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """S1: line-oriented text (the reference's socket payload shape, one
    ``value: string`` column)."""
    return (spark.readStream if streaming else spark.read).text(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """S3: CSV with declared schema."""
    return spark.read.csv(path, schema=schema, header=header)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S4: JSON lines with declared schema (scalar JSON ops are F8)."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


# ---------- streaming endpoints (S5, S9, S11) ------------------------------


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S9: the reference's source — unbounded text lines from TCP
    (socketTextStream, StreamSocket.scala:13)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S11: synthetic unbounded source for harness/smoke use."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S5: Kafka source (flink-connector-kafka analog, study/pom.xml:82).

    Returns (key, value, topic, partition, offset, timestamp); callers parse
    ``value`` with from_json/F8.  Exactly-once: pair with a checkpoint
    location and an idempotent/transactional sink.  Requires the Kafka jars
    on the classpath and a broker — gated in tests.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_sink_writer(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """S5 sink side: value must be string/binary; returns the unstarted writer."""
    out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


# ---------- external stores (S6, S7, S8) -----------------------------------


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S6: JDBC source (flink-jdbc/MySQL analog, study/pom.xml:105).

    Parallel reads REQUIRE the partition column + bounds — a single-threaded
    JDBC scan is the classic ingest bottleneck.  Driver jar must be on the
    classpath; gated in tests (no DB in the container).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kv_sink(
    key_cols: list[str], value_cols: list[str], store: dict
) -> Callable[[DataFrame, int], None]:
    """S7: key-value (Redis-analog, study/pom.xml:65) upsert sink as a
    foreachBatch writer.  ``store`` is any dict-like (a real Redis client
    wrapper in production; a plain dict in tests).  Each micro-batch upserts
    key tuple -> value tuple — idempotent, so checkpoint replay is
    exactly-once at the store level."""

    def write_batch(df: DataFrame, epoch: int) -> None:
        for row in df.select(*key_cols, *value_cols).collect():
            k = tuple(row[c] for c in key_cols)
            v = tuple(row[c] for c in value_cols)
            store[k] = v

    return write_batch


# S8 (HBase wide-column) is declared out of t2 scope (SURVEY §2.2 S8): the
# pattern is identical to kv_sink via foreachBatch + the connector's client.
