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

__all__ = ["salted_agg", "salted_join"]


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
