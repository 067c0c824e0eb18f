"""Skew mitigation: salted two-phase aggregation and salted broadcast join
(SURVEY §4.2 "skew handling").

AQE's skew-join splitting handles skewed JOIN partitions automatically, but
a skewed GROUP BY key still funnels one key's entire volume through one
reducer.  Salting splits each hot key across ``n_salts`` sub-keys, combines
per sub-key, then merges — the classic two-phase rewrite.

The salt must be DETERMINISTIC (derived from row content, not rand()):
re-computation under task retry/speculation must route a row to the same
salt bucket, or exactly-once recovery breaks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "hot_key_salted_join"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr) where the
    partial expr runs per (key, salt) and the merge expr combines partials
    per key — e.g. ``{"n": (F.count("*"), F.sum("n"))}``.
    ``salt_col`` is any deterministic integer-ish column (an id, a hash).
    """
    salt = F.pmod(
        F.col(salt_col) if isinstance(salt_col, str) else salt_col, n_salts
    ).alias("__salt")
    partial_exprs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    partial = df.groupBy(*keys, salt).agg(*partial_exprs)
    merge_exprs = [
        merge.alias(name) for name, (_, merge) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_col: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted shuffle join: replicate the SMALL side n_salts ways, salt the
    big side deterministically, join on (key, salt).

    When the big side's join key is hot and the small side is too large
    (or the engine is forbidden) to broadcast, a plain shuffle join sends
    the hot key's entire volume to ONE reducer.  Salting fans each key
    out over n_salts reducers at the cost of replicating the small side
    n_salts times — the replicate-fragment analog of AQE's skew split,
    usable when runtime re-planning isn't (e.g. deterministic replays).
    The salt derives from row content (never rand()) so task retries
    re-route rows identically.  Only inner/left joins are supported: the
    small side is replicated n_salts times, so unmatched small rows of a
    right/full join would surface once PER REPLICA.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    small_rep = small.select("*", salts)
    # pmod, not %: Spark's % is sign-preserving, so a negative salt source
    # (hash()/xxhash64) would never match the 0..n_salts-1 replicas and
    # rows would silently vanish from an inner join.
    salt = F.pmod(
        F.col(salt_col) if isinstance(salt_col, str) else salt_col, n_salts
    ).alias("__salt")
    big_s = big.select("*", salt)
    return big_s.join(small_rep, [*on, "__salt"], how).drop("__salt")


def hot_key_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_salt_col: str | Column,
    n_salts: int = 8,
    hot_factor: float = 8.0,
) -> DataFrame:
    """Big-to-big shuffle join with HOT-KEY-ONLY salting.

    ``salted_join`` replicates the whole small side; with two fact-scale
    inputs that is ``n_salts``x the shuffle volume — unaffordable.  This
    variant replicates only the rows whose join key is HOT: a cheap
    map-side-combined count over the LEFT side finds keys whose row count
    exceeds ``hot_factor`` x the mean key count; that (tiny) hot-key set is
    broadcast to both sides.  Left rows under a hot key take a
    deterministic salt in ``[0, n_salts)`` (content hash — task retries
    re-route identically); right rows under a hot key explode into all
    ``n_salts`` replicas; everything else keeps salt 0.  The equi-join then
    runs on ``(*on, __salt)``, splitting each hot key's pair work across
    ``n_salts`` reducers while cold keys pay nothing.

    This is the skew shape of the geospatial cell joins (catalog/geo.py):
    city cells hold orders of magnitude more points than rural cells, and
    AQE's skew split only rebalances SORT-side partitions — it cannot split
    a single hot KEY whose pair product explodes inside one task.  Salting
    the key itself can.  The join is pinned to sort-merge (``merge`` hint):
    a broadcast pick at test scale would hide exactly the reducer this
    operator exists to split.

    Inner joins only (hot right rows are replicated; unmatched-row
    semantics of outer joins would surface once per replica).
    """
    counts = left.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    mean = counts.agg(F.avg("__n").alias("__mean"))
    hot = (
        counts.join(F.broadcast(mean))
        .filter(F.col("__n") >= F.col("__mean") * hot_factor)
        .select(*on, F.lit(True).alias("__hot"))
    )
    src = (
        F.col(left_salt_col)
        if isinstance(left_salt_col, str)
        else left_salt_col
    )
    # NULL-safe salt: a NULL salt source on a hot-key row would make
    # __salt NULL and the inner equi-join on (*on, __salt) would silently
    # DROP the row — diverging from the unsalted join.  Coalesce to salt 0
    # (any constant works: the right side replicates hot keys into every
    # salt, so membership is preserved; only the split of that one
    # degenerate bucket is affected).
    left_s = (
        left.join(F.broadcast(hot), list(on), "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot"),
                F.pmod(F.coalesce(src.cast("long"), F.lit(0)), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    right_s = (
        right.join(F.broadcast(hot), list(on), "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot"), F.sequence(F.lit(0), F.lit(n_salts - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )
    return left_s.hint("merge").join(right_s, [*on, "__salt"]).drop("__salt")
