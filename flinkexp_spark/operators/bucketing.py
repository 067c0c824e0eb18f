"""Bucketed table layout — pre-shuffled storage for co-located joins.

At 100 TB a fact-fact equi-join (lineitem ⋈ orders) shuffles BOTH sides on
every run; that shuffle is the largest network cost in the plan.  Bucketing
pays it once at write time: each table is hash-partitioned into the same
number of buckets on the join key (and sorted within buckets), so every
later join — and every groupBy on that key — reads co-located buckets and
plans with NO Exchange on either side.  ``tests/test_plans.py`` pins the
exchange-free plan shape.

Reference parity: the reference declares batch table connectors only
(reference: study/pom.xml:149-165, no partitioned-source config); bucketing
is the Spark-native analog of Flink's pre-partitioned table sources, and is
how a production deployment would lay out the fact tables this engine scans.

At cluster scale the bucket count is sized so one bucket ≈ one executor
task's memory budget (e.g. 100 TB / 128 MB-ish target → tens of thousands
of buckets); locally the fixtures use a small count.  Bucket-pruning on the
key (``spark.sql.sources.bucketing.enabled``) also turns point lookups into
single-bucket scans.
"""

from __future__ import annotations

import contextlib
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_tables"]


def write_bucketed(
    df: DataFrame, *, key: str, buckets: int, name: str, path: str
) -> str:
    """Materialize ``df`` as a bucketed+sorted parquet table named ``name``.

    The write performs the hash-partition ONCE; all later scans of ``name``
    are pre-shuffled on ``key``.

    ``repartition(buckets, key)`` uses the same murmur3 HashPartitioning as
    the bucket-id assignment, so each write task holds exactly one bucket —
    one file per bucket instead of (tasks × buckets) small files.  At
    100 TB file count is a real scan-planning cost; locally it roughly
    halves the write.
    """
    (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )
    return name


@contextlib.contextmanager
def bucketed_tables(
    spark: SparkSession,
    frames: dict[str, tuple[DataFrame, str]],
    root: str,
    buckets: int = 16,
) -> Iterator[dict[str, DataFrame]]:
    """Materialize ``{alias: (df, key)}`` as co-bucketed tables.

    Yields ``{alias: DataFrame}`` reading the bucketed layout; tables are
    dropped on exit (data files live under ``root``, owned by the caller).
    Every frame gets the SAME bucket count — the precondition for a
    co-located (exchange-free) join between any pair of them.
    """
    names: dict[str, str] = {}
    try:
        for alias, (df, key) in frames.items():
            tbl = f"{alias}_{uuid.uuid4().hex[:12]}"
            write_bucketed(
                df, key=key, buckets=buckets, name=tbl, path=os.path.join(root, tbl)
            )
            names[alias] = tbl
        yield {alias: spark.table(tbl) for alias, tbl in names.items()}
    finally:
        for tbl in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
