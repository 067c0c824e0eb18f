"""Geo family: the grid block must be LOSSLESS — identical pair sets to
the brute-force cross join — including across the antimeridian and at
cell boundaries.  The DuckDB oracle re-proves this on the fixture data
every correctness run; these tests prove it on adversarial synthetic
points the fixtures may never hit.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flinkexp_spark.catalog.geo import (
    _HAVERSINE,
    _points,
    blocked_distance_pairs,
)


def _pts(spark, rows, key):
    df = spark.createDataFrame(rows, f"{key} long, plat double, plon double")
    return df, key


def _cellify(df, key, cell_deg):
    return _points(df, key, "plat", "plon", cell_deg)


def _brute(left, right, radius_km):
    l = left.select(
        F.col("lid"), F.col("plat").alias("lat1"), F.col("plon").alias("lon1")
    )
    r = right.select(
        F.col("rid"), F.col("plat").alias("lat2"), F.col("plon").alias("lon2")
    )
    return (
        l.crossJoin(r)
        .withColumn("dist_km", F.expr(_HAVERSINE))
        .filter(F.col("dist_km") <= radius_km)
        .select("lid", "rid", "dist_km")
    )


def _blocked(left, right, cell_deg, radius_km):
    return blocked_distance_pairs(
        _cellify(left, "lid", cell_deg),
        _cellify(right, "rid", cell_deg),
        cell_deg,
        radius_km,
    ).select("lid", "rid", "dist_km")


def _assert_same_pairs(spark, left, right, cell_deg, radius_km):
    got = sorted(
        (r.lid, r.rid, r.dist_km)
        for r in _blocked(left, right, cell_deg, radius_km).collect()
    )
    want = sorted(
        (r.lid, r.rid, r.dist_km)
        for r in _brute(left, right, radius_km).collect()
    )
    assert got == want, (
        f"blocking lost/invented pairs at cell={cell_deg} r={radius_km}: "
        f"blocked={len(got)} brute={len(want)}"
    )
    return got


def test_blocking_lossless_on_random_points(spark):
    rng = random.Random(20260815)
    mk = lambda n, off: [  # noqa: E731
        (i + off, rng.uniform(-59.99, 59.99), rng.uniform(-180.0, 180.0))
        for i in range(n)
    ]
    left = spark.createDataFrame(
        mk(80, 0), "lid long, plat double, plon double"
    )
    right = spark.createDataFrame(
        mk(40, 1000), "rid long, plat double, plon double"
    )
    # both shipped (cell, radius) profiles; radius respects the
    # cell_deg * 111.19 * cos(60) bound in each case
    pairs6 = _assert_same_pairs(spark, left, right, 6, 300.0)
    _assert_same_pairs(spark, left, right, 12, 600.0)
    assert pairs6, "degenerate test: no pair within 300 km — reseed"


def test_blocking_keeps_antimeridian_pairs(spark):
    left = spark.createDataFrame(
        [(1, 10.0, 179.9), (2, -30.0, 170.0)],
        "lid long, plat double, plon double",
    )
    right = spark.createDataFrame(
        [(10, 10.05, -179.95), (20, -30.0, -171.0)],
        "rid long, plat double, plon double",
    )
    got = _assert_same_pairs(spark, left, right, 6, 300.0)
    # (1, 10) straddle +-180 ~ 17 km apart: the wrapped cells MUST pair
    # them; (2, 20) are ~1700 km apart and must not appear
    assert [(lid, rid) for lid, rid, _ in got] == [(1, 10)]


def test_blocking_keeps_cell_boundary_pairs(spark):
    # straddle a 6-degree cell edge (lat 54 and lon 6 boundaries) with a
    # gap well inside the radius — neighbor replication must catch both
    left = spark.createDataFrame(
        [(1, 53.999, 5.999)], "lid long, plat double, plon double"
    )
    right = spark.createDataFrame(
        [(10, 54.001, 6.001), (20, 53.5, 5.5)],
        "rid long, plat double, plon double",
    )
    got = _assert_same_pairs(spark, left, right, 6, 300.0)
    assert {(lid, rid) for lid, rid, _ in got} == {(1, 10), (1, 20)}


def test_hot_cell_salting_preserves_pair_sets(spark):
    """Property: hot_key_salted_join over skewed points yields EXACTLY the
    pair set of the plain (unsalted) cell join — salting may only re-route
    rows across reducers, never lose or duplicate a pair.  The fixture
    plants one deliberately hot cell (half of all points) plus a uniform
    background, with points on both sides of the hot cell's edges so
    salted rows must still meet their neighbor-cell partners."""
    from flinkexp_spark.catalog.geo import _replicate_neighbors
    from flinkexp_spark.operators.salting import hot_key_salted_join

    rng = random.Random(20260816)
    hot = [
        (i, 40.0 + rng.uniform(-2.2, 2.2), 8.0 + rng.uniform(-2.2, 2.2))
        for i in range(60)
    ]  # 4-deg cell around (40, 8) plus spill into every neighbor
    cold = [
        (1000 + i, rng.uniform(-59.9, 59.9), rng.uniform(-180.0, 180.0))
        for i in range(60)
    ]
    pts = _cellify(
        spark.createDataFrame(
            hot + cold, "pid long, plat double, plon double"
        ),
        "pid",
        4,
    )
    left = pts.withColumnsRenamed(
        {"pid": "lid", "lat": "lat1", "lon": "lon1"}
    )
    right = _replicate_neighbors(
        pts.withColumnsRenamed({"pid": "rid", "lat": "lat2", "lon": "lon2"}),
        4,
    )

    def finish(joined):
        return sorted(
            (r.lid, r.rid, r.dist_km)
            for r in (
                joined.filter(F.col("lid") < F.col("rid"))
                .withColumn("dist_km", F.expr(_HAVERSINE))
                .filter(F.col("dist_km") <= 200.0)
                .select("lid", "rid", "dist_km")
                .collect()
            )
        )

    plain = finish(left.join(right, ["cell_lat", "cell_lon"]))
    # low hot_factor + few salts so BOTH branches (salted hot cells,
    # untouched cold cells) are exercised at this fixture size
    salted = finish(
        hot_key_salted_join(
            left,
            right,
            ["cell_lat", "cell_lon"],
            F.xxhash64("lid"),
            n_salts=4,
            hot_factor=4.0,
        )
    )
    assert salted == plain and plain, (
        f"salting changed the pair set: salted={len(salted)} "
        f"plain={len(plain)}"
    )


def test_hot_key_salting_null_salt_source_keeps_rows(spark):
    """ADVICE r07: a NULL salt source on a hot-key row must not drop the
    row — the salt is coalesced to bucket 0, so the inner equi-join on
    (*on, __salt) still meets the replicated right side."""
    from flinkexp_spark.operators.salting import hot_key_salted_join

    # one hot key (k=1, 40 rows) + cold background; salt source NULL on
    # half of the hot rows
    left = spark.createDataFrame(
        [(1, i, i if i % 2 == 0 else None) for i in range(40)]
        + [(k, 0, k) for k in range(2, 12)],
        "k long, payload long, saltsrc long",
    )
    right = spark.createDataFrame(
        [(1, 100), (1, 101), (5, 102)], "k long, rval long"
    )
    plain = sorted(
        (r.k, r.payload, r.rval)
        for r in left.join(right, ["k"]).select("k", "payload", "rval").collect()
    )
    salted = sorted(
        (r.k, r.payload, r.rval)
        for r in hot_key_salted_join(
            left, right, ["k"], "saltsrc", n_salts=4, hot_factor=2.0
        )
        .select("k", "payload", "rval")
        .collect()
    )
    assert salted == plain and plain


def test_neighbor_pairs_official_row_is_non_vacuous(spark):
    """VERDICT r07 #2: the unsalted big-big self-join's oracle row must
    carry pairs — a 0-rows-vs-0-rows hash match proves nothing.  Pin the
    exact pair count at the driver's oracle sf (0.01): the number is
    deterministic (coordinates derive from c_custkey), so any drift means
    the radius/cell pairing or the coordinate scheme changed."""
    import os

    from flinkexp_spark.registry import queries  # noqa: PLC0415

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(sf_dir):
        pytest.skip(f"{sf_dir} fixture not present on this machine")
    n = queries()["geo_neighbor_pairs"](spark, sf_dir).count()
    assert n == 274, f"expected 274 neighbor pairs at sf0.01, got {n}"


def test_salted_oracle_dual_chains_agree():
    """The gated dual-chain oracle (geo.py geo_neighbor_pairs_salted): the
    at-scale cell-blocked chain must produce EXACTLY the brute-force
    chain's rows — flip the gate and compare on the sf0.01 corpus (the
    sf0.1 A/B was run at introduction: 3,167,190 identical pairs)."""
    import os

    import duckdb

    if not os.path.exists("/root/testdata/sf0.01/customer.parquet"):
        pytest.skip("sf0.01 customer fixture not present on this machine")

    from flinkexp_spark.registry import REGISTRY, queries

    queries()
    sql = REGISTRY["geo_neighbor_pairs_salted"].oracle
    assert "SALTED_BRUTE_MAX" not in sql  # constant baked in
    assert "COUNT(*) <= 40000" in sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/customer.parquet')"
    )
    brute = con.execute(sql).fetchdf()
    blocked = con.execute(
        sql.replace("COUNT(*) <= 40000", "COUNT(*) < 0")
    ).fetchdf()
    assert len(brute) > 0
    assert brute.equals(blocked)


def test_fold_twin_pair_count_collapses_to_salted_contract(spark):
    """The compact sf1 twin (geo_neighbor_pairs_fold) must count EXACTLY
    the pairs the full salted contract query emits — at fixture scale
    where the full query is cheap, sum(n_pairs) over the twin's cells
    equals the salted row count.  This is the collapse property that
    lets the twin stand in for the salted row in the sf1 sweep
    (make_sf1_artifact EXCLUSION_REASONS): same join, same salting, same
    radius — only the materialization differs.  (The twin quantizes with
    the unrounded chord tree; a divergence here would mean a boundary
    pair classifies differently, which the deterministic fixtures do not
    contain.)"""
    import os

    from flinkexp_spark.registry import queries  # noqa: PLC0415

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if not os.path.exists(sf_dir):
            pytest.skip(f"{sf_dir} fixture not present on this machine")
        qs = queries()
        n_full = qs["geo_neighbor_pairs_salted"](spark, sf_dir).count()
        fold = qs["geo_neighbor_pairs_fold"](spark, sf_dir).agg(
            F.sum("n_pairs").alias("n")
        ).collect()[0]["n"]
        assert n_full > 0, f"vacuous fixture at {sf_dir}"
        assert fold == n_full, (
            f"{sf_dir}: fold twin counts {fold} pairs, salted contract "
            f"emits {n_full}"
        )
