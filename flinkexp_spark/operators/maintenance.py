"""Table-maintenance operators: small-file compaction.

Streaming sinks and fine-grained ingest leave long-lived parquet lakes
with thousands of KB-sized files; scan throughput collapses under
per-file open/footer costs and the driver chokes enumerating splits.
Compaction rewrites a directory to ~target-sized files.

Scale design: ``coalesce`` is a NARROW dependency — compaction moves no
rows across the network (contrast ``repartition``: a full shuffle).  On a
partitioned 100 TB table this runs per partition-directory with the same
arithmetic (ceil(dir_bytes / target)), each directory an independent job,
so the rewrite parallelizes across the lake while each output file stays
at the 128 MB scan sweet spot (`spark.sql.files.maxPartitionBytes`,
session.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def parquet_dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for one LOCAL parquet directory.

    os.listdir-based by design (the sandbox has no Hadoop FS); on a real
    lake, size via the Hadoop FileSystem API instead — the compaction
    arithmetic below is unchanged.
    """
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return len(files), sum(os.path.getsize(os.path.join(path, f)) for f in files)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``src_dir`` into ceil(bytes/target) files at ``dst_dir``;
    returns the output file count.  Shuffle-free (coalesce)."""
    _, src_bytes = parquet_dir_stats(src_dir)
    df = spark.read.parquet(src_dir)
    # coalesce only ever REDUCES partition count; clamp so the returned
    # count matches what is actually written when the read splits are
    # already coarser than the target (splitting upward would need a
    # shuffle, defeating compaction's narrow-dependency point).
    n_out = min(
        max(1, -(-src_bytes // target_bytes)), df.rdd.getNumPartitions()
    )
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_dir)
    return n_out


def merge_upsert(
    target,
    updates,
    key: str,
    op_col: str = "op",
    check_unique: bool = True,
):
    """MERGE INTO semantics as one full-outer join (Delta/Iceberg analog).

    ``updates[op_col]``: 'U'/'I' rows replace-or-insert, 'D' rows delete.
    Returns the merged table with the target's columns.

    Contract (enforced, matching SQL MERGE): ``updates`` must carry every
    target column (schema-checked eagerly) and at most one row per key —
    SQL MERGE raises on multiple source matches, so by default this runs a
    small uniqueness assertion on the change set (one extra tiny job; pass
    ``check_unique=False`` only when the caller has already deduped, e.g.
    a keyed ``row_number() == 1``).

    Scale design: MERGE is exactly one join on the key — broadcast when
    the change set is small (the overwhelmingly common case: daily deltas
    vs a 100 TB base), else a key shuffle that a bucketed base avoids on
    its side.  The uniqueness check aggregates only the change set (never
    the base table).  Real lakehouse MERGE additionally limits the rewrite
    to files containing matched keys (copy-on-write); the join below is
    that operation's dataflow, with file pruning delegated to the table
    format.
    """
    from pyspark.sql import functions as F

    missing = [c for c in target.columns if c not in updates.columns]
    if missing:
        raise ValueError(
            f"merge_upsert: updates is missing target columns {missing}; "
            "MERGE needs every target value column in the change set"
        )
    if check_unique:
        dup = (
            # count("*") under an explicit alias: a bare .count() would name
            # the column "count", ambiguous if the change set itself carries
            # a "count" column — the contract check must never error.
            updates.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__merge_dup_n"))
            .filter(F.col("__merge_dup_n") > 1)
            .select(key)
            .limit(5)
            .collect()
        )
        if dup:
            raise ValueError(
                "merge_upsert: duplicate keys in change set (SQL MERGE "
                f"raises on multiple source matches): {[r[0] for r in dup]}"
            )

    t = target.alias("t")
    u = updates.alias("u")
    value_cols = [c for c in target.columns if c != key]
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    merged = joined.filter(
        F.col(f"u.{op_col}").isNull() | (F.col(f"u.{op_col}") != "D")
    ).select(
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(F.col(f"u.{op_col}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged
