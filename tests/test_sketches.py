"""KMV/theta sketch tests — merge exactness and estimator accuracy.

The DuckDB oracle already replays the sketch ALGEBRA; these tests pin the
two properties the oracle can't see: the union merge is lossless at the
sketch level (the composability claim), and the estimates actually land
near the exact cardinalities (the accuracy claim).
"""

import hashlib
import os

import numpy as np
import pytest

from flinkexp_spark.catalog.sketches import KMV_K
from flinkexp_spark.registry import REGISTRY

SF001 = "/root/testdata/sf0.01"


def _h(v: int) -> int:
    """The query's exact hash: 60 bits of md5(str(v) + '|kmv')."""
    return int(
        hashlib.md5(f"{v}|kmv".encode()).hexdigest()[:15], 16
    )


def _bottom_k(hashes, k=KMV_K):
    return sorted(set(hashes))[:k]


def test_union_merge_is_exact():
    # bottom-k(A | B) == bottom-k(sketch(A) | sketch(B)) — the property
    # that makes per-shard sketches composable on a rollup tree
    rng = np.random.default_rng(7)
    a = [_h(int(v)) for v in rng.integers(0, 10**9, 2000)]
    b = [_h(int(v)) for v in rng.integers(5 * 10**8, 15 * 10**8, 3000)]
    direct = _bottom_k(a + b)
    merged = _bottom_k(_bottom_k(a) + _bottom_k(b))
    assert direct == merged


def test_union_merge_is_associative():
    rng = np.random.default_rng(11)
    sets = [
        [_h(int(v)) for v in rng.integers(0, 10**9, 1500)] for _ in range(3)
    ]
    left = _bottom_k(_bottom_k(_bottom_k(sets[0]) + _bottom_k(sets[1])) + _bottom_k(sets[2]))
    right = _bottom_k(_bottom_k(sets[0]) + _bottom_k(_bottom_k(sets[1]) + _bottom_k(sets[2])))
    assert left == right


def test_estimator_formula_on_synthetic_set():
    # 50k distinct keys -> estimate within 4/sqrt(k-1) of truth
    n = 50_000
    hashes = _bottom_k([_h(v) for v in range(n)])
    est = (KMV_K - 1) * float(1 << 60) / hashes[-1]
    assert abs(est - n) / n < 4 / (KMV_K - 1) ** 0.5


@pytest.mark.skipif(
    not os.path.exists(SF001), reason="sf0.01 fixture not present"
)
def test_query_estimates_match_exact_cardinalities(spark):
    """Accuracy contract at fixture scale: every estimate within the
    KMV error envelope of the exact cardinality (deterministic — the
    hash, the data and therefore the measured error are all fixed)."""
    rows = {
        (r["a_type"], r["b_type"]): r
        for r in REGISTRY["sketch_theta_kmv_setops"]
        .fn(spark, SF001)
        .collect()
    }
    ev = (
        spark.read.parquet(f"{SF001}/events.parquet")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    sets = {}
    for r in ev:
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    bound = 4 / (KMV_K - 1) ** 0.5  # ~0.25
    for (a, b), r in rows.items():
        na, nb = len(sets[a]), len(sets[b])
        nu = len(sets[a] | sets[b])
        ni = len(sets[a] & sets[b])
        assert abs(r["est_a"] - na) / na < bound
        assert abs(r["est_b"] - nb) / nb < bound
        assert abs(r["est_union"] - nu) / nu < bound
        # intersection compounds union + overlap noise: wider envelope
        assert abs(r["est_intersect"] - ni) / max(ni, 1) < 2 * bound
