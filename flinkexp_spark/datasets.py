"""Fixture table loader (driver-generated parquet, TESTDATA.md).

All queries load through here so that scan behavior is uniform: parquet
columnar scans with Catalyst predicate pushdown and column pruning.  At
100 TB scale the same code path works against a partitioned table root —
``spark.read.parquet`` prunes partitions from the directory layout and
pushes filters into the parquet row-group stats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    if name == "events":
        # Runtime-settable; needed even when the caller's session didn't go
        # through our session factory (e.g. the driver's own session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS), which Spark reads as a raw
    # nanosecond LongType under spark.sql.legacy.parquet.nanosAsLong (set in
    # the session factory).  The fixture carries no sub-microsecond digits,
    # so `div 1000` → timestamp_micros is lossless.  Integer division keeps
    # exactness (a double would overflow 2^53 for epoch-ns values).
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def local_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Small driver-local DataFrame in ONE partition.

    ``spark.createDataFrame(list)`` parallelizes to defaultParallelism
    pickled-RDD slices (32 here); any downstream single-task action —
    ``coalesce(1).write``, a replay sentinel file, a tiny groupBy — then
    pays one Python-worker round trip PER SLICE (~150 ms x 32 ≈ 5 s
    measured for a 1-row write).  One slice makes it one round trip.
    Empty row lists skip the RDD path entirely (Spark requires a
    non-empty RDD to infer nothing from, and an empty LocalRelation is
    what callers want anyway).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
