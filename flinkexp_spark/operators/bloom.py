"""Explicit Bloom-filter semi-join prefilter, pure Catalyst codegen.

The 100 TB shape: before shuffling a huge fact table into a join, build a
compact Bloom bitset over the (already filtered, much smaller) build side's
keys, broadcast the KB-sized bitset, and drop non-matching fact rows AT THE
SCAN — so the shuffle moves only rows that can possibly join.  Spark's
optimizer injects the same thing automatically in some plans
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, via an internal
``bloom_filter_agg``), but the injection is heuristic; this operator is the
explicit, composable version (e.g. to reuse one filter across several
consumers, or to prefilter BEFORE an expensive UDF stage, which the
optimizer will not do).

Everything is built-in expressions — ``xxhash64`` double hashing, bitwise
aggregation into 64-bit words, broadcast of a single-row bitset — no Python
row path, false positives removed by the exact join that follows, so
results are EXACTLY the plain join's (which is what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions via double hashing: h1 + i*h2 (Kirsch-Mitzenmacher),
    two xxhash64 seeds.  Both hashes are reduced mod m FIRST so the linear
    combination can't overflow ANSI long arithmetic (i*h2m <= k*m)."""
    h1m = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(m_bits))
    h2m = F.pmod(F.xxhash64(key, F.lit(2)), F.lit(m_bits))
    return [
        F.pmod(h1m + F.lit(i) * h2m, F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 8192, k: int = 3
) -> DataFrame:
    """One-row DataFrame holding the bitset as ``array<long>`` (m_bits/64
    words).  Map-side: each partition ORs its own words (partial bit_or),
    the final merge is k*distinct positions — bytes, not rows."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    bits = (
        df.select(
            F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )
    # densify into a fixed-length array (empty words -> 0)
    return bits.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("wm")
    ).select(
        F.array(
            *[
                F.coalesce(
                    F.element_at(F.col("wm"), F.lit(i)), F.lit(0).cast("long")
                )
                for i in range(n_words)
            ]
        ).alias("bloom_words")
    )


def bloom_prefilter(
    probe: DataFrame,
    bloom: DataFrame,
    key: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the bitset.

    The single-row bitset is broadcast (a 1-row cross join the planner turns
    into BroadcastNestedLoopJoin over a KB payload); the k bit tests are
    whole-stage-codegen'd element_at + bit-ands, evaluated at the scan."""
    # Internal columns carry an unlikely prefix so a probe frame with its
    # own ``bloom_words``/``__bp0`` column can't alias-collide or be
    # silently dropped; a genuine collision is a loud error instead.
    tok = "__bloomf1lter"
    words_col = f"{tok}_words"
    pos_cols = [f"{tok}_p{i}" for i in range(k)]
    clash = set(probe.columns) & ({words_col, *pos_cols})
    if clash:
        raise ValueError(f"probe columns collide with bloom internals: {sorted(clash)}")
    bloom_renamed = bloom.withColumnRenamed("bloom_words", words_col)
    with_pos = probe.crossJoin(F.broadcast(bloom_renamed)).select(
        "*",
        *[
            p.alias(c)
            for p, c in zip(_positions(F.col(key), m_bits, k), pos_cols)
        ],
    )
    might = None
    for c in pos_cols:
        word = F.element_at(
            F.col(words_col), (F.col(c) / 64).cast("int") + F.lit(1)
        )
        test = (
            word.bitwiseAND(F.expr(f"shiftleft(1L, CAST(`{c}` % 64 AS INT))"))
            != 0
        )
        might = test if might is None else (might & test)
    return with_pos.filter(might).drop(words_col, *pos_cols)
