"""Data-layout operators: Z-order (Morton) clustering for file skipping.

At 100 TB the scan layer lives or dies on parquet min/max pruning: a table
range-partitioned on ONE key skips files for that key only.  Z-ordering
interleaves the bits of several normalized keys into one Morton value and
range-partitions on it, so files become hyper-rectangles in key space and
min/max footer stats prune scans on ANY of the interleaved dimensions —
the same layout move Delta's OPTIMIZE ZORDER BY performs, expressed here
with plain Spark primitives (bit arithmetic stays in whole-stage codegen;
the only shuffle is the range partitioner's).

Write path: ``write_zordered(df, path, [colA, colB])``.  Read path: plain
``spark.read.parquet`` + filters — pruning needs no reader cooperation
beyond parquet row-group stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension; 2 dims -> 32-bit Morton value


def _normalize(col: Column, lo: Column, hi: Column) -> Column:
    """Map col into [0, 2^Z_BITS) by linear scaling over its [lo, hi] range."""
    span = F.greatest(hi - lo, F.lit(1)).cast("double")
    scaled = ((col - lo).cast("double") / span) * float((1 << Z_BITS) - 1)
    return F.floor(scaled).cast("long")


def zvalue(a: Column, b: Column) -> Column:
    """Morton-interleave two Z_BITS-wide non-negative ints (a even bits,
    b odd bits).  Pure bit arithmetic — whole-stage codegen, no UDF."""
    out = F.lit(0).cast("long")
    for i in range(Z_BITS):
        out = (
            out
            + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(1), 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` on morton(col_a, col_b) into ``n_files`` range-
    partitioned parquet files.  Bounds are computed with one tiny agg (4
    numbers to the driver); the data itself moves through exactly one
    range-partitioning shuffle."""
    bounds = df.agg(
        F.min(col_a).alias("alo"),
        F.max(col_a).alias("ahi"),
        F.min(col_b).alias("blo"),
        F.max(col_b).alias("bhi"),
    ).collect()[0]
    z = zvalue(
        _normalize(F.col(col_a), F.lit(bounds.alo), F.lit(bounds.ahi)),
        _normalize(F.col(col_b), F.lit(bounds.blo), F.lit(bounds.bhi)),
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
