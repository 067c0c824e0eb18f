"""Vector math over embedding columns (``array<float>``) — cosine similarity,
top-k search, and deterministic random-hyperplane LSH bucketing
(SURVEY §2.3 X3).

**Cross-engine determinism.** Cosine is computed with an explicitly-ordered
fold (``zip_with`` + ``aggregate`` in Spark; ``list_transform`` +
``list_reduce`` in the DuckDB oracle) after casting each element to DOUBLE —
both engines execute the *same* sequence of IEEE-double operations, so the
results are bitwise identical and a round-to-5-decimals comparison is exact.
Top-k ordering uses (rounded score DESC, vec_id ASC) on both sides so ties
are broken identically.

**LSH planes** are ±1 sign vectors derived from ``md5(f"{plane}-{dim}")``
parity, computed once in Python (``hashlib.md5`` == Spark ``md5`` == DuckDB
``md5``) and inlined as literals into both engines' expressions — single
source of truth, no RNG.  Sign-random-projection hashing per Charikar
(STOC 2002); the bucket-then-scan layout is the IVF coarse-quantization
pattern (Jégou et al., "Product quantization for nearest neighbor search",
2011).

**Scale notes.** Brute-force top-k broadcasts the (small) query set and
scans the corpus once — a broadcast nested-loop join, no shuffle of the big
side.  The LSH path joins on bucket equality first, turning O(Q·N) into
O(Q·N/2^planes) comparisons; at 100 TB you shard the corpus by bucket
(partitioned write) so each probe touches one partition.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from flinkexp_spark.functions.text import P

N_PLANES = 8
DIM = 64
COS_DECIMALS = 5


def _plane_sign(p: int, d: int) -> int:
    h = int(hashlib.md5(f"{p}-{d}".encode()).hexdigest()[:15], 16) % P
    return (h % 2) * 2 - 1


# PLANES[p][d] in {-1, +1}; inlined as literals on both engine and oracle side.
PLANES: list[list[int]] = [
    [_plane_sign(p, d) for d in range(DIM)] for p in range(N_PLANES)
]


# ---------------------------------------------------------------------------
# cosine
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float-array columns, as DOUBLE."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def norm(a: Column) -> Column:
    """sqrt(a·a) — precompute per ROW before a pair join so each pair pays
    one dot instead of three.  ``dot(a,b)/(norm(a)*norm(b))`` is
    float-identical to :func:`cosine` (same fold order, same sqrt), so
    swapping it in under a rounded comparison cannot move any hash."""
    return F.sqrt(_dot(a, a))


def dot(a: Column, b: Column) -> Column:
    """Public dot product (the cosine numerator); see :func:`norm`."""
    return _dot(a, b)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), (x, y) -> x + y)"
    )


def _dot_sql_native(a: str, b: str) -> str:
    """DuckDB's vectorized ``list_dot_product`` over DOUBLE-cast lists —
    BITWISE-identical to :func:`_dot_sql`'s explicit left-to-right fold
    (both accumulate IEEE doubles in element order; proven on all 199,666
    sf0.1 label pairs and re-asserted in tests/test_vectors_native.py)
    but ~10x faster, for the oracle side of pair-heavy queries."""
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def cosine_sql(a: str, b: str) -> str:
    """Oracle-side cosine — built on ``_dot_sql_native`` (DuckDB's
    vectorized ``list_dot_product``), which is BITWISE-identical to the
    explicit left-to-right fold ``_dot_sql`` (same element-order IEEE
    accumulation from 0.0; pinned in tests/test_vectors_native.py) but
    ~10x faster.  r15: the pair-heavy graph/IVF audit oracles spent
    minutes per sf1 row in three interpreted folds per cosine call."""
    return (
        f"({_dot_sql_native(a, b)} / (sqrt({_dot_sql_native(a, a)}) "
        f"* sqrt({_dot_sql_native(b, b)})))"
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH bucket
# ---------------------------------------------------------------------------

def lsh_bucket(vec: Column) -> Column:
    """N_PLANES-bit sign bucket of a vector (deterministic planes).

    Each plane projection is one ``aggregate(zip_with(vec, signs, x*s))``
    fold — a flat array literal + small lambda — instead of 64 nested
    binary adds per plane.  The nested form produced a ~512-leaf tree that
    Catalyst re-walked (and duplicated into join/filter conditions), costing
    seconds of analysis per query; the fold keeps the same left-to-right
    IEEE sum order (0.0 + s1*x1 + s2*x2 + ...; (-1.0)*x == -x exactly), so
    buckets are bit-identical to the oracle's literal sum.
    """
    out = F.lit(0).cast("long")
    for p in range(N_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in PLANES[p]])
        prods = F.zip_with(vec, signs, lambda x, s: x.cast("double") * s)
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        out = out + F.shiftleft((proj > 0).cast("long"), p)
    return out


def lsh_bucket_sql(vec: str) -> str:
    parts = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"{'' if s > 0 else '-'}CAST({vec}[{d + 1}] AS DOUBLE)"
            for d, s in enumerate(PLANES[p])
        )
        parts.append(f"(CAST(({terms}) > 0 AS BIGINT) << {p})")
    return "(" + " + ".join(parts) + ")"


def dot_sql_n(a: str, b: str, n: int) -> str:
    """Ordered-fold dot product over the first ``n`` components — the
    subvector form of ``_dot_sql`` for product-quantization codebooks
    (same fold order as the Spark-side :func:`dot`, so doubles stay
    bit-identical across engines)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({n}), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )
