"""Geospatial operators: grid-blocked distance join, nearest-neighbor
lookup, and cell-density aggregation (round 6).

The reference declares no geospatial surface; this family extends the
engine the same way the LLM-pipeline operators do — spatial joins are the
canonical "don't cross-join" problem, and the blocking technique here is
the same bucket-then-join shape as the MinHash-LSH dedup family
(llm_dedup.py): assign every point to a coarse grid cell, replicate one
side into its 3x3 neighbor cells, equi-join on cell id, THEN evaluate the
exact predicate on the tiny candidate set.

Determinism across engines:

* Coordinates are DERIVED from integer keys with modular arithmetic
  (exact BIGINT ops, then one division by 100.0) — both engines compute
  bit-identical doubles without needing a shared random source.
* The haversine distance is ONE shared SQL expression string
  (``_HAVERSINE``): the Spark side evaluates it via ``F.expr`` so the
  expression tree literally cannot drift from the oracle's, and the
  result is rounded to 3 digits (meter precision) before any comparison
  or ranking.
* The oracle is the BRUTE-FORCE cross join with the same predicate —
  a green hash therefore PROVES the grid blocking is lossless, exactly
  like the LSH family's prefix-filter oracle.

Scale notes (100 TB): candidate pairs are bounded by cell occupancy, not
|A| x |B| — the equi-join on (cell_lat, cell_lon) shuffles both sides by
cell id, so skew maps to hot cells (cities): ``geo_neighbor_pairs_salted``
below mitigates exactly that with hot-cell-only salting
(operators/salting.py ``hot_key_salted_join``); refining the grid one
level is the other lever.  The
9x replication factor on ONE side is constant.  Longitude cells wrap
modulo 360/CELL so antimeridian pairs are kept (the haversine formula is
itself 360-periodic in delta-lon, so the brute-force oracle would find
them — blocking must too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.operators.salting import hot_key_salted_join
from flinkexp_spark.registry import register

# Synthetic-but-deterministic coordinates in [-60, 60) lat x [-180, 180)
# lon, derived from the entity key (multipliers coprime with the moduli so
# consecutive keys spread over the whole grid).  |lat| < 60 keeps one
# longitude degree >= 55.7 km, which bounds the cell width needed below.
_CUST_LAT = (
    "(CAST(CAST(c_custkey AS BIGINT) * 7919 % 12000 AS DOUBLE) / 100.0 - 60.0)"
)
_CUST_LON = (
    "(CAST(CAST(c_custkey AS BIGINT) * 104729 % 36000 AS DOUBLE)"
    " / 100.0 - 180.0)"
)
_SUPP_LAT = (
    "(CAST(CAST(s_suppkey AS BIGINT) * 6121 % 12000 AS DOUBLE) / 100.0 - 60.0)"
)
_SUPP_LON = (
    "(CAST(CAST(s_suppkey AS BIGINT) * 15485863 % 36000 AS DOUBLE)"
    " / 100.0 - 180.0)"
)

# City-skewed variant for the salted join below: every third customer
# collapses into one of four city centers (+-0.5 deg jitter), the rest keep
# the uniform spread — deterministic hot cells, same on both engines.
# Membership (key % 3 == 0) makes key % 12 land in {0,3,6,9}, so the city
# index needs no division (CAST(double AS BIGINT) ROUNDS in DuckDB but
# TRUNCATES in Spark — integer-only selectors sidestep that).
_CITY_LAT = (
    "(CASE WHEN c_custkey % 3 = 0 THEN "
    "(CASE c_custkey % 12 WHEN 0 THEN 10.0 WHEN 3 THEN 40.0 "
    "WHEN 6 THEN -30.0 ELSE 50.0 END "
    "+ (CAST(CAST(c_custkey AS BIGINT) * 7907 % 100 AS DOUBLE)"
    " / 100.0 - 0.5)) "
    f"ELSE {_CUST_LAT} END)"
)
_CITY_LON = (
    "(CASE WHEN c_custkey % 3 = 0 THEN "
    "(CASE c_custkey % 12 WHEN 0 THEN 10.0 WHEN 3 THEN -70.0 "
    "WHEN 6 THEN 150.0 ELSE 0.0 END "
    "+ (CAST(CAST(c_custkey AS BIGINT) * 104717 % 100 AS DOUBLE)"
    " / 100.0 - 0.5)) "
    f"ELSE {_CUST_LON} END)"
)

# Haversine great-circle distance in km, quantized to 3 decimals — one
# expression string shared by both engines (sin^2 is 360-periodic in the
# raw coordinate difference, so no explicit antimeridian handling is
# needed here).  r14 hot-path form: the old round(x, 3) allocates a java
# BigDecimal PER CALL on the Spark side — evaluated in the join condition
# AND the projection of the 10^8-pair sf1 joins, that was an allocation/GC
# storm (geo_neighbor_pairs_salted: 401 s of mostly GC).  floor(x*1000 +
# 0.5)/1000.0 is pure double arithmetic; m/1000.0 is the correctly-rounded
# double of m*10^-3, so the result is bitwise what BigDecimal produced
# whenever the integer m agrees (they can differ only when x*1000 sits
# within one ulp of a .5 boundary — and both engines share this exact
# tree, so cross-engine hashes are identical regardless).  pow(s, 2)
# likewise became s*s: Math.pow is ~100 ns against a 1 ns multiply.
# NB the CAST(... AS DOUBLE) around floor(): Spark parses the literal
# 1000.0 as DECIMAL and floor() returns LONG, so a bare m / 1000.0 would
# be a DECIMAL division on the Spark side (DuckDB's stays DOUBLE) — the
# cast pins both engines to the same double division.
_HAVERSINE = (
    "(CAST(floor((2.0 * 6371.0088 * asin(sqrt("
    "sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)"
    " + cos(radians(lat1)) * cos(radians(lat2))"
    " * (sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2))"
    "))) * 1000.0 + 0.5) AS DOUBLE) / 1000.0)"
)

# Chord (unit-sphere 3D) form of the same great-circle distance:
# dist = 2R * asin(|p1 - p2| / 2) over precomputed per-point unit vectors
# (px, py, pz).  Mathematically equal to _HAVERSINE; floating-point
# consistent across engines because BOTH evaluate this exact expression
# tree (the proof pattern every geo query here relies on).  Per pair it
# costs one asin + one sqrt instead of haversine's two sins, two coss and
# two pows — the right trade when the pair stream is 10^8 rows and the
# trig-heavy per-point prep is only 10^5.  Deliberately UNROUNDED:
# Spark's round(double, s) allocates a java BigDecimal PER CALL, which at
# 3 calls x 345M pairs turns the whole join stage into an allocation/GC
# storm (measured 693s -> 30s-class at sf1 when the rounds left the pair
# path); quantization for folds uses _QUANT_MM below instead.
_CHORD_DIST = (
    "2.0 * 6371.0088 * asin(sqrt("
    "(px1 - px2) * (px1 - px2) + (py1 - py2) * (py1 - py2)"
    " + (pz1 - pz2) * (pz1 - pz2)) * 0.5)"
)

# Allocation-free half-up quantization of a nonnegative double distance to
# integer millimeters-of-km (1e-3 km): floor(x*1000 + 0.5) is pure double
# arithmetic + one floor; the result is an integral double < 2^53, so the
# BIGINT cast is exact in both engines (DuckDB's CAST(double AS BIGINT)
# rounds while Spark's truncates — irrelevant here because floor() already
# made the value integral).
_QUANT_MM = "CAST(floor(({dist}) * 1000.0 + 0.5) AS BIGINT)"

# Per-point unit-vector components, evaluated on a `lat`/`lon` pair of
# columns — one string per component so engine and oracle share the tree.
_UNIT_PX = "cos(radians({lat})) * cos(radians({lon}))"
_UNIT_PY = "cos(radians({lat})) * sin(radians({lon}))"
_UNIT_PZ = "sin(radians({lat}))"


def _points(
    df: DataFrame, key: str, lat_sql: str, lon_sql: str, cell_deg: int
) -> DataFrame:
    """Project a keyed table to (key, lat, lon, cell_lat, cell_lon)."""
    lon_cells = 360 // cell_deg
    return df.select(
        F.col(key),
        F.expr(lat_sql).alias("lat"),
        F.expr(lon_sql).alias("lon"),
        F.expr(f"CAST(floor({lat_sql} / {cell_deg}) AS BIGINT)").alias(
            "cell_lat"
        ),
        # longitude cells wrap mod (360/cell) so +-180 are neighbors
        F.expr(
            f"CAST(floor(({lon_sql} + 180.0) / {cell_deg}) AS BIGINT)"
            f" % {lon_cells}"
        ).alias("cell_lon"),
    )


def _replicate_neighbors(df: DataFrame, cell_deg: int) -> DataFrame:
    """Explode each point into its 3x3 neighborhood of cells (lon wraps)."""
    lon_cells = 360 // cell_deg
    offsets = F.array(
        *[
            F.struct(
                (F.col("cell_lat") + F.lit(dy)).alias("g_lat"),
                (
                    (F.col("cell_lon") + F.lit(dx) + F.lit(lon_cells))
                    % F.lit(lon_cells)
                ).alias("g_lon"),
            )
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    return (
        df.withColumn("g", F.explode(offsets))
        .select(
            *[c for c in df.columns if c not in ("cell_lat", "cell_lon")],
            F.col("g.g_lat").alias("cell_lat"),
            F.col("g.g_lon").alias("cell_lon"),
        )
    )


def blocked_distance_pairs(
    left_pts: DataFrame,
    right_pts: DataFrame,
    cell_deg: int,
    radius_km: float,
) -> DataFrame:
    """Pairs within ``radius_km`` between two point frames (each already
    carrying lat/lon + cell ids from :func:`_points`); the grid block
    generates candidates, the exact haversine runs on candidates only.

    ``cell_deg`` must satisfy radius <= cell_deg * 111.19 * cos(60deg)
    (worst-case longitude shrink at the |lat| < 60 cap) so that any true
    pair differs by at most one cell per axis — the 3x3 replication is
    then provably lossless (tests/test_geo.py checks it against the
    in-Spark brute force; the DuckDB oracle re-proves it every run).
    """
    left = left_pts.withColumnsRenamed({"lat": "lat1", "lon": "lon1"})
    right = right_pts.withColumnsRenamed({"lat": "lat2", "lon": "lon2"})
    # replicate the SMALL side into neighbor cells, then broadcast it —
    # at dim-table scale this is a map-side join; with two big sides drop
    # the broadcast and let the cell-id shuffle do the work
    right9 = _replicate_neighbors(right, cell_deg)
    return (
        left.join(F.broadcast(right9), ["cell_lat", "cell_lon"])
        .withColumn("dist_km", F.expr(_HAVERSINE))
        .filter(F.col("dist_km") <= radius_km)
    )


def _blocked_pairs(
    spark: SparkSession, sf_dir: str, cell_deg: int, radius_km: float
) -> DataFrame:
    """Customer-supplier pairs within ``radius_km`` on the derived
    coordinates (see module doc)."""
    cust = _points(
        datasets.load(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT,
        _CUST_LON,
        cell_deg,
    )
    supp = _points(
        datasets.load(spark, sf_dir, "supplier"),
        "s_suppkey",
        _SUPP_LAT,
        _SUPP_LON,
        cell_deg,
    )
    return blocked_distance_pairs(cust, supp, cell_deg, radius_km)


def _oracle_pairs(radius_km: float) -> str:
    """Brute-force oracle: every (customer, supplier) pair against the
    same haversine predicate.

    r13: the pair generation carries a LOSSLESS latitude band as a join
    inequality — on a sphere the great-circle distance is at least the
    pure-latitude separation, 111.19 km/degree, so any true pair
    satisfies |lat1 - lat2| <= radius/111.0 (divisor deliberately under
    111.19 for slack).  This is scalar algebra, not blocking: every pair
    is still judged, but DuckDB plans the two inequalities as an IEJoin
    instead of materializing the full cross product through the
    15-trig-call haversine — sf1: 181s -> seconds for the 600 km radius,
    output identical."""
    return f"""
        WITH c AS (SELECT c_custkey,
                          {_CUST_LAT} AS lat1, {_CUST_LON} AS lon1
                   FROM customer),
        s AS (SELECT s_suppkey,
                     {_SUPP_LAT} AS lat2, {_SUPP_LON} AS lon2
              FROM supplier),
        pairs AS (SELECT c_custkey, s_suppkey, {_HAVERSINE} AS dist_km
                  FROM c JOIN s
                    ON lat1 - lat2 <= {radius_km} / 111.0
                   AND lat2 - lat1 <= {radius_km} / 111.0)
        SELECT c_custkey, s_suppkey, dist_km FROM pairs
        WHERE dist_km <= {radius_km}
    """


@register(
    "geo_distance_join",
    oracle=_oracle_pairs(300.0) + " ORDER BY c_custkey, s_suppkey",
    tags=("J7", "X3"),
)
def q_geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within 300 km, via a 6-degree
    grid-blocked join — the spatial analog of the LSH banded join
    (llm_dedup.py): block coarsely, join on block id, verify exactly.

    The oracle is the full cross join with the same haversine predicate,
    so the hash match proves the blocking loses no pair (including
    antimeridian neighbors, which the wrapped longitude cells keep).
    """
    pairs = _blocked_pairs(spark, sf_dir, cell_deg=6, radius_km=300.0)
    return pairs.select("c_custkey", "s_suppkey", "dist_km").orderBy(
        "c_custkey", "s_suppkey"
    )


@register(
    "geo_nearest_supplier",
    oracle=_oracle_pairs(600.0)
    + """
        QUALIFY row_number() OVER (
            PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) = 1
        ORDER BY c_custkey
    """,
    tags=("J7", "W1"),
)
def q_geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 600 km for each customer: blocked candidate
    generation (12-degree cells — wide enough that a 600 km true pair can
    never skip past a neighbor cell below latitude 60) followed by a
    per-customer row_number over (rounded distance, supplier key).

    Rounding the distance to meters BEFORE ranking keeps the order stable
    across engines; the supplier-key tie-break makes it total.  At scale
    this is the standard blocked-kNN plan: candidates shuffle by cell,
    ranking shuffles by customer — two bounded exchanges, no cross join.
    """
    pairs = _blocked_pairs(spark, sf_dir, cell_deg=12, radius_km=600.0)
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist_km")
        .orderBy("c_custkey")
    )


@register(
    "geo_cell_density",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {_CUST_LAT} AS lat, {_CUST_LON} AS lon,
                   c_acctbal
            FROM customer)
        SELECT CAST(floor(lat / 6) AS BIGINT) AS cell_lat,
               CAST(floor((lon + 180.0) / 6) AS BIGINT) % 60 AS cell_lon,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_acctbal
        FROM pts
        GROUP BY cell_lat, cell_lon
        ORDER BY n_points DESC, cell_lat, cell_lon
        LIMIT 25
    """,
    tags=("A1", "O2"),
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 densest 6-degree grid cells by customer count (the heatmap
    aggregation): one groupBy on the derived cell id — a plain word-count
    shape that partial-aggregates map-side, plus a 25-row ordered take.
    Deterministic tie-break on the cell id keeps LIMIT stable.
    """
    pts = datasets.load(spark, sf_dir, "customer").select(
        F.expr(f"CAST(floor({_CUST_LAT} / 6) AS BIGINT)").alias("cell_lat"),
        F.expr(
            f"CAST(floor(({_CUST_LON} + 180.0) / 6) AS BIGINT) % 60"
        ).alias("cell_lon"),
        "c_acctbal",
    )
    return (
        pts.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy(F.desc("n_points"), "cell_lat", "cell_lon")
        .limit(25)
    )


# Event coordinates for the streaming geofence: same modular derivation
# as the customer/supplier points above.
_EVT_LAT = "(CAST(event_id * 7919 % 12000 AS DOUBLE) / 100.0 - 60.0)"
_EVT_LON = "(CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0)"


@register(
    "stream_geofence_entry",
    oracle=f"""
        WITH pts AS (
            SELECT user_id, ts,
                   10.0 AS lat1, 20.0 AS lon1,
                   {_EVT_LAT} AS lat2, {_EVT_LON} AS lon2
            FROM events)
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_entry,
               CAST(count(*) AS BIGINT) AS n_inside
        FROM pts
        WHERE {_HAVERSINE} <= 500.0
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("T2", "E5", "J7"),
)
def q_stream_geofence_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming geofence alerts: events carry derived coordinates; the
    stream keeps only events inside a 500 km circular fence around
    (10 N, 20 E) and maintains per-user first-entry time + hit count in
    update mode — the final totals are the alert state.

    The fence predicate is the SAME shared haversine expression as the
    batch geo family (filter runs fully JVM-side in the stream), and the
    keyed aggregate is the standard update-mode rolling state — filters
    before state means fence misses cost no state at all.  At scale this
    is the moving-entity alerting pattern: predicate pushdown into the
    stream, state keyed and bounded by |users inside the fence|.
    """
    from flinkexp_spark.catalog._util import TS_FMT
    from flinkexp_spark.streaming.replay import replay

    events = datasets.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.lit(10.0).alias("lat1"),
        F.lit(20.0).alias("lon1"),
        F.expr(_EVT_LAT).alias("lat2"),
        F.expr(_EVT_LON).alias("lon2"),
    )

    def transform(stream: DataFrame) -> DataFrame:
        inside = stream.filter(F.expr(_HAVERSINE) <= 500.0)
        return inside.groupBy("user_id").agg(
            F.date_format(F.min("ts"), TS_FMT).alias("first_entry"),
            F.count(F.lit(1)).alias("n_inside"),
        )

    out = replay(spark, events, transform, output_mode="update")
    return out.select("user_id", "first_entry", "n_inside").orderBy(
        "user_id"
    )


# Radius/cell pairing for the UNSALTED big-big self-join.  VERDICT r07 #2:
# at 200 km the uniform coordinate spread yields ZERO pairs at the oracle
# sf (0-rows-vs-0-rows — a vacuous hash match), so the official row proved
# nothing.  400 km carries 274 pairs at sf0.01 / ~95k at sf0.1.  The cell
# must still bound the radius at the |lat| < 60 cap (55.66 km per lon
# degree): 8 deg * 55.66 = 445 km >= 400.
# brute-proof gate for the salted twin's dual-chain oracle: all shipped
# fixtures (<= 15k customers at sf0.1) take the quadratic chain; sf-scale
# corpora take the cell-blocked mirror
SALTED_BRUTE_MAX = 40000
NEIGHBOR_RADIUS_KM = 400.0
NEIGHBOR_CELL_DEG = 8


@register(
    "geo_neighbor_pairs",
    oracle=f"""
        WITH c AS (SELECT c_custkey,
                          {_CUST_LAT} AS plat, {_CUST_LON} AS plon
                   FROM customer),
        pairs AS (
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   a.plat AS lat1, a.plon AS lon1,
                   b.plat AS lat2, b.plon AS lon2
            FROM c a JOIN c b ON a.c_custkey < b.c_custkey)
        SELECT cust_a, cust_b, {_HAVERSINE} AS dist_km
        FROM pairs WHERE {_HAVERSINE} <= {NEIGHBOR_RADIUS_KM}
        ORDER BY cust_a, cust_b
    """,
    tags=("J7", "J5"),
)
def q_geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-customer neighbor pairs within 400 km — the BIG-to-BIG
    spatial self-join: unlike `geo_distance_join` (dim-sized right side,
    broadcast), neither side here is small, so the cell-id equi-join runs
    as an ordinary shuffle join — the plan shape that holds when both
    inputs are fact-scale (Catalyst/AQE may still pick broadcast at test
    scale; nothing forces it).  8-degree cells bound the 400 km radius at
    the |lat| < 60 cap; the canonical key order (a < b) dedups the
    symmetric pair and drops self-pairs before the distance evaluates.

    The oracle is the brute-force a<b self cross join — quadratic in
    DuckDB, cell-bounded here: the green hash is the losslessness proof,
    and the radius is sized so the proof is NON-VACUOUS at the oracle sf
    (274 pairs at sf0.01; the pre-r08 200 km row matched 0-vs-0 rows).
    """
    pts = _points(
        datasets.load(spark, sf_dir, "customer"),
        "c_custkey",
        _CUST_LAT,
        _CUST_LON,
        cell_deg=NEIGHBOR_CELL_DEG,
    )
    left = pts.withColumnsRenamed(
        {"c_custkey": "cust_a", "lat": "lat1", "lon": "lon1"}
    )
    right = _replicate_neighbors(
        pts.withColumnsRenamed(
            {"c_custkey": "cust_b", "lat": "lat2", "lon": "lon2"}
        ),
        cell_deg=NEIGHBOR_CELL_DEG,
    )
    return (
        left.join(right, ["cell_lat", "cell_lon"])
        .filter(F.col("cust_a") < F.col("cust_b"))
        .withColumn("dist_km", F.expr(_HAVERSINE))
        .filter(F.col("dist_km") <= NEIGHBOR_RADIUS_KM)
        .select("cust_a", "cust_b", "dist_km")
        .orderBy("cust_a", "cust_b")
    )


# --- sampled sf1 audit for the big-big neighbor join (r10 verdict #3) -------
# geo_neighbor_pairs' oracle is the DELIBERATE brute-force a<b cross join
# (~1.1e10 pairs at sf1) and times out there, leaving zero losslessness
# signal at scale.  This audit restricts BOTH sides to customers on an id
# stride (~AUDIT_CUST_TARGET sampled): the ENGINE side is the real
# full-corpus cell-blocked join filtered to sampled-pair endpoints — so it
# audits the actual sf1 run, not a rerun — while the oracle brute-forces
# only the sampled customers (180k pairs at sf1, trivially feasible).
# Sampling must be md5-bucketed, NOT an id stride: the synthetic
# coordinates are key*prime%modulo, a lattice so id-correlated that EVERY
# neighbor pair at sf0.01 has opposite-parity keys (measured: an even-even
# stride keeps 0 of 274 pairs; m=5/7 strides also 0).  Hashing the key
# first destroys the lattice correlation — md5-bucket m=2 keeps 79 pairs
# at sf0.01, and the sampled pair space keeps population density
# (~160 expected pairs at sf1's 10.2M).  Both engines evaluate the same
# md5-hex arithmetic, so the sample sets are identical by construction.
AUDIT_CUST_TARGET = 600
_CUST_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)) AS BIGINT)"
)


@register(
    "geo_neighbor_pairs_sf_audit",
    oracle=f"""
        WITH mm AS (SELECT greatest(1, COUNT(*) // {AUDIT_CUST_TARGET}) AS mv
                    FROM customer),
        c AS (SELECT c_custkey,
                     {_CUST_LAT} AS plat, {_CUST_LON} AS plon
              FROM customer
              WHERE {_CUST_BUCKET} % (SELECT mv FROM mm) = 0),
        pairs AS (
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   a.plat AS lat1, a.plon AS lon1,
                   b.plat AS lat2, b.plon AS lon2
            FROM c a JOIN c b ON a.c_custkey < b.c_custkey)
        SELECT cust_a, cust_b, {_HAVERSINE} AS dist_km
        FROM pairs WHERE {_HAVERSINE} <= {NEIGHBOR_RADIUS_KM}
        ORDER BY cust_a, cust_b
    """,
    tags=("J7", "J5"),
)
def q_geo_neighbor_pairs_sf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-pair losslessness audit of geo_neighbor_pairs (see the
    section comment): the full cell-blocked join's output restricted to
    md5-bucket-sampled endpoints must equal brute force over the sampled
    customers exactly — the sf1-green row recorded where the full
    quadratic oracle is excluded."""
    m = max(
        1,
        datasets.load(spark, sf_dir, "customer").count() // AUDIT_CUST_TARGET,
    )

    def bkt(col: str):
        return (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1, 4), 16, 10
            ).cast("long")
            % m
        )

    return q_geo_neighbor_pairs(spark, sf_dir).filter(
        (bkt("cust_a") == 0) & (bkt("cust_b") == 0)
    )


@register(
    "geo_neighbor_pairs_salted",
    # GATED DUAL-CHAIN oracle (the _scaled_k_sql pattern): below
    # SALTED_BRUTE_MAX customers the BRUTE-FORCE a<b cross join runs — the
    # full quadratic losslessness proof at every shipped fixture
    # (sf0.001/0.01/0.1) — and above it a CELL-BLOCKED mirror of the
    # blocking algebra runs instead (4-degree cells, 3x3 lon-wrapping
    # neighborhood), which is output-bound and feasible at sf1's 150k
    # customers where the quadratic proof is not.  The at-scale chain
    # still independently re-executes the whole join in DuckDB's own
    # plan; what it no longer re-proves at sf1 is cell-blocking
    # losslessness — that proof stays with the brute chains at shipped
    # fixtures and with geo_neighbor_pairs_sf_audit's sampled brute force
    # at sf1.  Each chain's INPUT is gated (constant-false gate = empty
    # scan), so the inactive chain costs nothing.
    oracle=f"""
        WITH c AS MATERIALIZED (
            SELECT c_custkey, {_CITY_LAT} AS plat, {_CITY_LON} AS plon
            FROM customer),
        gate AS (SELECT COUNT(*) <= {SALTED_BRUTE_MAX} AS small FROM c),
        cb AS (SELECT * FROM c WHERE (SELECT small FROM gate)),
        cg AS MATERIALIZED (
            SELECT c_custkey, plat, plon,
                   CAST(floor(plat / 4) AS BIGINT) AS cell_lat,
                   CAST(floor((plon + 180.0) / 4) AS BIGINT) % 90 AS cell_lon
            FROM c WHERE NOT (SELECT small FROM gate)),
        r9 AS (
            SELECT c_custkey, plat, plon,
                   cell_lat + dy.d AS g_lat,
                   (cell_lon + dx.d + 90) % 90 AS g_lon
            FROM cg, (VALUES (-1), (0), (1)) dy(d),
                 (VALUES (-1), (0), (1)) dx(d)),
        pairs AS (
            SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                   a.plat AS lat1, a.plon AS lon1,
                   b.plat AS lat2, b.plon AS lon2
            FROM cb a JOIN cb b ON a.c_custkey < b.c_custkey
            UNION ALL
            SELECT a.c_custkey, b.c_custkey,
                   a.plat, a.plon, b.plat, b.plon
            FROM cg a JOIN r9 b
              ON a.cell_lat = b.g_lat AND a.cell_lon = b.g_lon
             AND a.c_custkey < b.c_custkey)
        SELECT cust_a, cust_b, {_HAVERSINE} AS dist_km
        FROM pairs WHERE {_HAVERSINE} <= 200.0
        ORDER BY cust_a, cust_b
    """,
    tags=("J7", "J5"),
)
def q_geo_neighbor_pairs_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_neighbor_pairs` under SKEW, with hot-cell salting — the
    mitigation the module doc (geo.py:26-31) promises.  A third of the
    customers collapse into four "cities" (deterministic key-derived
    jitter), so a handful of grid cells hold ~100x the mean occupancy and
    a plain cell equi-join funnels each city's quadratic pair work through
    ONE reducer — the skew AQE cannot split, because it is a single KEY.

    :func:`flinkexp_spark.operators.salting.hot_key_salted_join` detects
    hot cells from a map-side-combined count (tiny, broadcast), salts left
    rows in hot cells by a content hash, explodes right rows in hot cells
    into all ``n_salts`` replicas, and sort-merge-joins on
    ``(cell_lat, cell_lon, __salt)`` — each city's pair space now splits
    across 8 reducers while rural cells replicate nothing.  The oracle is
    the brute-force a<b cross join on the SAME skewed coordinates: a green
    hash proves the salted plan loses and duplicates nothing vs the
    unsalted semantics.  tests/test_geo.py additionally property-tests
    salted == unsalted pair sets on random skewed fixtures, and
    tests/test_plans.py pins the SMJ-on-salt plan shape.
    """
    pts = _points(
        datasets.load(spark, sf_dir, "customer"),
        "c_custkey",
        _CITY_LAT,
        _CITY_LON,
        cell_deg=4,
    )
    left = pts.withColumnsRenamed(
        {"c_custkey": "cust_a", "lat": "lat1", "lon": "lon1"}
    )
    right = _replicate_neighbors(
        pts.withColumnsRenamed(
            {"c_custkey": "cust_b", "lat": "lat2", "lon": "lon2"}
        ),
        cell_deg=4,
    )
    joined = hot_key_salted_join(
        left,
        right,
        ["cell_lat", "cell_lon"],
        F.xxhash64("cust_a"),
        n_salts=8,
        hot_factor=8.0,
    )
    return (
        joined.filter(F.col("cust_a") < F.col("cust_b"))
        .withColumn("dist_km", F.expr(_HAVERSINE))
        .filter(F.col("dist_km") <= 200.0)
        .select("cust_a", "cust_b", "dist_km")
        .orderBy("cust_a", "cust_b")
    )


def _fold_oracle_sql(n_slices: int = 32) -> str:
    """Oracle SQL for ``geo_neighbor_pairs_fold``, sliced for parallelism.

    DuckDB's parallelism is SOURCE-driven: the cell-blocked pair pipeline
    hangs off one CTE scan and ran single-threaded regardless of the
    thread count (measured 123.7 s at 1 thread vs 137.2 s at 32 — no
    speedup at all).  Slicing the probe side into ``n_slices`` hash
    buckets (``a.c_custkey % n = k``) and UNION ALLing one
    partially-aggregated branch per bucket gives DuckDB independent
    pipelines it schedules concurrently; the outer GROUP BY sums the
    per-cell partials (exactly Spark's partial/final aggregate split,
    spelled in SQL).  The union of the slice predicates is the whole
    probe side, so the pair multiset is unchanged."""
    chord_ab = (
        "2.0 * 6371.0088 * asin(sqrt("
        "(a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)"
        " + (a.pz - b.pz) * (a.pz - b.pz)) * 0.5)"
    )
    fp = (
        "(cust_a + 13) * (cust_b + 7) + "
        + _QUANT_MM.format(dist="dist_km")
        + " * 31"
    )
    agg = """
            SELECT cell_lat, cell_lon,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(fp % 2147483648) AS BIGINT) AS fold_lo,
                   CAST(SUM(fp // 2147483648) AS BIGINT) AS fold_hi
            FROM (SELECT cell_lat, cell_lon, {fp} AS fp
                  FROM ({pairs}) p
                  WHERE dist_km <= 200.0) f
            GROUP BY cell_lat, cell_lon"""
    brute_pairs = f"""
                SELECT CAST(a.c_custkey AS BIGINT) AS cust_a,
                       CAST(b.c_custkey AS BIGINT) AS cust_b,
                       CAST(floor(a.plat / 4) AS BIGINT) AS cell_lat,
                       CAST(floor((a.plon + 180.0) / 4) AS BIGINT) % 90
                           AS cell_lon,
                       {chord_ab} AS dist_km
                FROM cb a JOIN cb b ON a.c_custkey < b.c_custkey"""
    slice_pairs = [
        f"""
                SELECT CAST(a.c_custkey AS BIGINT) AS cust_a,
                       CAST(b.c_custkey AS BIGINT) AS cust_b,
                       a.cell_lat, a.cell_lon,
                       {chord_ab} AS dist_km
                FROM cg a JOIN r9 b
                  ON a.cell_lat = b.g_lat AND a.cell_lon = b.g_lon
                 AND a.c_custkey < b.c_custkey
                WHERE a.c_custkey % {n_slices} = {k}"""
        for k in range(n_slices)
    ]
    branches = "\n            UNION ALL\n".join(
        agg.format(fp=fp, pairs=p) for p in [brute_pairs, *slice_pairs]
    )
    return f"""
        WITH c AS MATERIALIZED (
            SELECT c_custkey, plat, plon,
                   {_UNIT_PX.format(lat='plat', lon='plon')} AS px,
                   {_UNIT_PY.format(lat='plat', lon='plon')} AS py,
                   {_UNIT_PZ.format(lat='plat')} AS pz
            FROM (SELECT c_custkey, {_CITY_LAT} AS plat, {_CITY_LON} AS plon
                  FROM customer) c0),
        gate AS (SELECT COUNT(*) <= {SALTED_BRUTE_MAX} AS small FROM c),
        cb AS (SELECT * FROM c WHERE (SELECT small FROM gate)),
        cg AS MATERIALIZED (
            SELECT c_custkey, px, py, pz,
                   CAST(floor(plat / 4) AS BIGINT) AS cell_lat,
                   CAST(floor((plon + 180.0) / 4) AS BIGINT) % 90 AS cell_lon
            FROM c WHERE NOT (SELECT small FROM gate)),
        r9 AS (
            SELECT c_custkey, px, py, pz,
                   cell_lat + dy.d AS g_lat,
                   (cell_lon + dx.d + 90) % 90 AS g_lon
            FROM cg, (VALUES (-1), (0), (1)) dy(d),
                 (VALUES (-1), (0), (1)) dx(d)),
        parts AS ({branches})
        SELECT cell_lat, cell_lon,
               CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
               CAST(SUM(fold_lo) AS BIGINT) AS fold_lo,
               CAST(SUM(fold_hi) AS BIGINT) AS fold_hi
        FROM parts GROUP BY cell_lat, cell_lon
    """


@register(
    "geo_neighbor_pairs_fold",
    # Same gated dual-chain pair stream as geo_neighbor_pairs_salted's
    # oracle (brute-force a<b cross join below SALTED_BRUTE_MAX customers,
    # cell-blocked mirror above), COLLAPSED per cell-of-a into a count and
    # an order-insensitive arithmetic fold.  The fold term mixes the two
    # keys MULTIPLICATIVELY and the fixed-point distance additively, so a
    # dropped/duplicated/perturbed pair cannot cancel against another
    # without satisfying a quadratic constraint across the cell — the
    # compact stand-in (r13 verdict #3) that re-verifies the 317M-pair
    # multiset at sf1 WITHOUT 317M-row materialization or per-row md5 on
    # either engine.  Distance is the chord form (_CHORD_DIST, shared
    # expression tree both engines); the fold is an exact 2^31 lo/hi
    # split into two BIGINT sums; the oracle is hash-bucket-sliced for
    # DuckDB pipeline parallelism (see _fold_oracle_sql).
    oracle=_fold_oracle_sql(),
    tags=("J7", "J5"),
)
def q_geo_neighbor_pairs_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACT TWIN of :func:`q_geo_neighbor_pairs_salted` (r13 verdict
    #3): the same salted cell-blocked pair stream, collapsed per
    cell-of-the-smaller-endpoint into ``(n_pairs, fold_lo, fold_hi)``
    where ``fp = (cust_a+13)·(cust_b+7) + round(dist·1000)·31`` and the
    two folds are its exact Σ split at 2^31 (fp < 2^35, so two plain
    long sums encode the exact integer total with full codegen and
    map-side combine — no per-row BigDecimal).  The full-pair haversine
    query remains the correctness contract (hash-proven vs brute force
    at sf0.001/0.01/0.1); THIS row is what the sf1 sweep runs — the
    whole 317M-pair multiset still flows through both engines' joins
    and distance filters, but lands in a partial aggregation instead of
    a 317M-row materialization + per-row md5.  Any lost, duplicated, or
    perturbed pair moves ``n_pairs`` or a fold (multiplicative key
    mixing makes compensating errors require solving a quadratic
    constraint inside one cell).

    Distance here is the UNROUNDED chord form (``_CHORD_DIST``):
    mathematically the same great-circle distance as ``_HAVERSINE``, but
    evaluated from per-point unit vectors so the 10^8-row pair stream
    pays one asin + one sqrt per pair instead of six trig calls, and
    with NO ``round()`` in the pair path — Spark's round(double, s)
    allocates a BigDecimal per call, and three of them per pair turned
    the sf1 join stage into a 693 s allocation/GC storm; the fold's
    distance term quantizes with ``_QUANT_MM`` (floor(x*1000+0.5), pure
    double arithmetic) instead.  Both engines evaluate the identical
    expression tree, so the twin is exactly self-consistent; pairs
    within float-ulp of the 200 km boundary could in principle classify
    differently than under the rounded-haversine tree, which is why the
    haversine full-pair query (not this twin) stays the boundary-exact
    contract at ≤sf0.1.  At 100 TB the aggregate IS the deliverable
    shape for pair-audit jobs: per-cell partial sums combine map-side,
    no pair row ever crosses the shuffle.
    """
    pts = _points(
        datasets.load(spark, sf_dir, "customer"),
        "c_custkey",
        _CITY_LAT,
        _CITY_LON,
        cell_deg=4,
    ).select(
        "c_custkey",
        "cell_lat",
        "cell_lon",
        # per-point unit vector: the 10^5-row trig prep that makes the
        # 10^8-row pair stream trig-free except for one asin each
        F.expr(_UNIT_PX.format(lat="lat", lon="lon")).alias("px"),
        F.expr(_UNIT_PY.format(lat="lat", lon="lon")).alias("py"),
        F.expr(_UNIT_PZ.format(lat="lat")).alias("pz"),
    )
    left = pts.withColumnsRenamed(
        {"c_custkey": "cust_a", "px": "px1", "py": "py1", "pz": "pz1"}
    )
    right = _replicate_neighbors(
        pts.withColumnsRenamed(
            {"c_custkey": "cust_b", "px": "px2", "py": "py2", "pz": "pz2"}
        ),
        cell_deg=4,
    )
    joined = hot_key_salted_join(
        left,
        right,
        ["cell_lat", "cell_lon"],
        F.xxhash64("cust_a"),
        n_salts=8,
        hot_factor=8.0,
    )
    pairs = (
        joined.filter(F.col("cust_a") < F.col("cust_b"))
        .withColumn("dist_km", F.expr(_CHORD_DIST))
        .filter(F.col("dist_km") <= 200.0)
    )
    fp = (
        (F.col("cust_a").cast("long") + F.lit(13))
        * (F.col("cust_b").cast("long") + F.lit(7))
        + F.expr(_QUANT_MM.format(dist="dist_km")) * F.lit(31)
    )
    # exact >64-bit sum without per-row BigDecimal: fp < 2^35, so the
    # lo/hi 2^31 split gives two plain long sums (codegen + map-side
    # combine) that together encode the exact integer total — any pair
    # perturbation moves at least one of them
    return (
        pairs.withColumn("fp", fp)
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("fp") % F.lit(2147483648)).alias("fold_lo"),
            F.sum(F.expr("fp div 2147483648")).alias("fold_hi"),
        )
    )
