"""As-of join (SURVEY §2.2 J9) — engine helper.

Flink declares temporal-table (as-of) joins in the Table API envelope the
reference imports (reference: study/pom.xml:149-165); Spark has no native
as-of join, so the engine ships one.

Algorithm ("union + window", the scalable formulation):

1. Tag right rows side=0, left rows side=1; union by name (missing columns
   null-padded).
2. One window pass per key, ordered by (ts, side): ``last(struct-of-values,
   ignorenulls=True)`` over ``rowsBetween(unboundedPreceding, current)``
   carries the most recent right-side ROW (atomically, as one struct)
   forward onto each left row.
3. Keep left rows.

Why this scales where a join doesn't: a naive range join materializes every
candidate pair (O(clicks × views per key)); this is one shuffle + one sort
per key — O(n log n), state O(1) per row.  It is the batch analog of how a
temporal join processes a keyed stream: replay in time order, remember the
latest dim version.  Skewed keys are handled by AQE only at the exchange;
for a pathologically hot key, pre-salt with a coarse time bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "right_",
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with right_ts <= left_ts
    (``direction="backward"``, the default) or the EARLIEST right row with
    right_ts >= left_ts (``direction="forward"`` — the pandas
    ``merge_asof(direction="forward")`` contract: next reading at or after
    the probe instant).

    Exact matches included in both directions; unmatched left rows keep
    nulls (ASOF LEFT JOIN semantics).  Right columns (except keys) come
    back prefixed with ``right_prefix``.  Both directions are the same
    single-shuffle plan — only the window frame and the tie order flip.

    ``tolerance_s`` bounds match staleness, the pandas ``merge_asof
    (tolerance=...)`` contract: a match older than ``tolerance_s`` whole
    seconds (epoch-second truncation on both timestamps) is nulled out as if
    no right row existed.  This is also what a feature-store point-in-time
    join needs — a feature computed too long before the label event is
    stale, and serving it would train on data the online store would never
    return.  The bound is applied AFTER the single window pass (a cheap
    row-local predicate), so the plan cost is identical to the unbounded
    join: one shuffle, one ordered pass, O(1) state per row.
    """
    keys = [on] if isinstance(on, str) else list(on)

    right_value_cols = [c for c in right.columns if c not in keys]
    prefixed = {c: f"{right_prefix}{c}" for c in right_value_cols}

    rt = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(p) for c, p in prefixed.items()],
    )

    left_only = [c for c in left.columns if c not in keys]

    def null_as(df_side: DataFrame, name: str, src: DataFrame, src_name: str) -> Column:
        dtype = src.schema[src_name].dataType
        return F.lit(None).cast(dtype).alias(name)

    # The right-side values travel as ONE struct so the match is atomic: if
    # the as-of row legitimately holds NULL in some value column, the output
    # preserves that row's NULL instead of stitching columns from different
    # right rows (per-column last(ignorenulls) would do exactly that —
    # DuckDB/pandas ASOF JOIN semantics require the matched-row struct).
    row_struct = F.struct(*[F.col(p) for p in prefixed.values()]).alias("__rv")
    struct_type = rt.select(row_struct).schema[0].dataType

    lt_cols = (
        [F.col(k) for k in keys]
        + [F.col(c) for c in left_only]
        + [F.lit(None).cast(struct_type).alias("__rv")]
        + [F.lit(1).alias("__side"), F.col(left_ts).alias("__ord_ts")]
    )
    rt_cols = (
        [F.col(k) for k in keys]
        + [null_as(rt, c, left, c) for c in left_only]
        + [row_struct]
        + [F.lit(0).alias("__side"), F.col(prefixed[right_ts]).alias("__ord_ts")]
    )

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    unioned = left.select(*lt_cols).unionByName(rt.select(*rt_cols))

    if direction == "backward":
        # right rows (side 0) sort BEFORE a left row at the same instant,
        # so last() over the preceding frame includes exact matches
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ord_ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("__rv", ignorenulls=True).over(w)
    else:
        # forward: right rows sort AFTER a left row at the same instant
        # (__side desc puts left=1 first), and the frame looks ahead
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ord_ts"), F.desc("__side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("__rv", ignorenulls=True).over(w)
    filled = unioned.select("*", match.alias("__m"))
    if tolerance_s is not None:
        # Staleness on truncated epoch seconds (both engines' cast-to-long
        # convention); a too-old match degrades to "no match", not an error.
        signed = F.col("__ord_ts").cast("long") - F.col("__m").getField(
            prefixed[right_ts]
        ).cast("long")
        stale = signed if direction == "backward" else -signed
        filled = filled.withColumn(
            "__m",
            F.when(stale <= F.lit(int(tolerance_s)), F.col("__m")).otherwise(
                F.lit(None).cast(struct_type)
            ),
        )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in left_only],
        *[F.col(f"__m.{p}").alias(p) for p in prefixed.values()],
    )
    return out
