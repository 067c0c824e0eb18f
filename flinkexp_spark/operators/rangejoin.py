"""Binned point-in-interval range join — the scale path for non-equi time
joins.

Reference context: the Flink 1.11 Table/SQL envelope (SURVEY §2.2 J7,
`study/pom.xml:149`) declares interval joins.  When the join has an equi
key (user_id), Spark already plans a hash/sort-merge join with the time
band as a residual filter (catalog/joins.py::q_join_interval).  When there
is NO equi key — "which intervals contain this point?" — naive Spark plans
a BroadcastNestedLoopJoin: O(|points| × |intervals|) comparisons, a
non-starter at 100 TB.

This operator manufactures the equi key: time is cut into fixed-width bins;
each interval is exploded to the bins it covers, each point maps to exactly
one bin, and the join becomes a plain equi-join on the bin id followed by
an exact containment filter.  Each matched (point, interval) pair surfaces
exactly once — a point lives in one bin and an interval covers that bin at
most once — so no post-join dedup is needed.

Cost model: the interval side is replicated ceil(duration / bin) + 1 times.
Pick the bin near the TYPICAL interval duration: replication stays O(1) per
interval while each bin's population stays bounded, which is the same
trade Databricks' range-join hint and KDB's window joins make.  At 100 TB
both sides shuffle once on the bin id (AQE handles hot bins via skew
split); nothing is ever materialized pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN_COL = "_range_bin"


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_ts, end_ts]`` (inclusive both ends) contains ``point_ts``.

    Columns of both inputs are preserved (names must not collide).
    Timestamp/numeric columns are binned via their cast to double seconds.
    ``how`` supports "inner" and "left" (unmatched points kept with NULL
    interval columns — implemented as inner + anti union so the bin column
    never leaks).
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    p = points.withColumn(
        BIN_COL, F.floor(F.col(point_ts).cast("double") / bin_seconds)
    )
    iv = intervals.withColumn(
        BIN_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts).cast("double") / bin_seconds),
                F.floor(F.col(end_ts).cast("double") / bin_seconds),
            )
        ),
    )
    contained = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) <= F.col(end_ts)
    )
    inner = p.join(iv, BIN_COL).filter(contained).drop(BIN_COL)
    if how == "inner":
        return inner
    if how == "left":
        matched = inner.select(*points.columns)
        unmatched = points.exceptAll(matched)
        for f in intervals.schema.fields:
            unmatched = unmatched.withColumn(f.name, F.lit(None).cast(f.dataType))
        return inner.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")
