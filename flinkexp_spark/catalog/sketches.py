"""Mergeable distinct-count sketches with SET ALGEBRA (KMV / theta).

Extends the sketch family (HLL union — sql_modern.py:109, count-min —
text_analysis.py:514) with the one capability HLL lacks: INTERSECTION and
difference estimates over pre-aggregated summaries.  The bottom-k (KMV)
sketch keeps the k smallest values of a uniform hash of each element;

* distinct estimate: (k-1) / normalized kth-smallest hash;
* union: bottom-k of two sketches' hashes IS the sketch of the union —
  merge is EXACT and associative, the property that makes per-shard /
  per-day sketches composable on a 1000-executor rollup tree;
* intersection (theta style): restrict both sketches to the union
  sketch's threshold and count common hashes — |A∩B| ≈ c/k * |A∪B|.

Everything is arithmetic on a shared hash, so the DuckDB oracle replays
the ENTIRE sketch algebra independently: the hash is 60 bits of md5
(identical in both engines), bottom-k is a windowed rank, and the
estimators are single IEEE divisions — deterministic cross-engine.

100 TB shape: the only input-sized shuffle is the per-(set, hash)
distinct, which map-side combines; the rank/window then runs on distinct
hashes only, and every set operation downstream touches <= k rows per
set.  At cluster scale the distinct+rank collapses to a per-partition
bottom-k followed by a k-row merge per set — the classic sketch rollup.

Reference envelope: aggregate analytics over streams/tables
(study/pom.xml:21,40-57); approximate distinct parity with A4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

KMV_K = 256  # sketch size: rel. error ~ 1/sqrt(k-1) ~ 6%
_TWO60 = float(1 << 60)  # hash domain: 60 bits of md5 (15 hex digits)
_SETS = ("click", "view", "purchase")
_PAIRS = (("click", "view"), ("click", "purchase"), ("view", "purchase"))

# single-set estimator, shared SQL text (Spark and DuckDB execute the
# same CASE / literal arithmetic: one exact double product, one IEEE
# division — bit-identical cross-engine before the final round)
_EST = (
    f"CASE WHEN {{n}} < {KMV_K} THEN CAST({{n}} AS DOUBLE) "
    f"ELSE ({KMV_K - 1}.0 * {_TWO60!r}) / {{hk}} END"
)


def _kmv_sketch(df: DataFrame, k: int = KMV_K) -> DataFrame:
    """(set_name, h) bottom-k sketch rows per set.

    The 60-bit hash comes from md5 of the stringified key — NOT xxhash64,
    deliberately: the oracle must recompute it in DuckDB, and md5 is the
    hash both engines share bit-for-bit.  The distinct is the only wide
    shuffle (map-side combined); the rank runs per set on distinct hashes.
    """
    hashes = (
        df.select(
            F.col("event_type").alias("set_name"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"), F.lit("|kmv")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("set_name").orderBy("h"))
    return hashes.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")


@register(
    "sketch_theta_kmv_setops",
    # The oracle replays the FULL sketch algebra in DuckDB: same 60-bit
    # md5 hash, same bottom-k rank, same union-merge, same theta
    # intersection count, same estimator arithmetic (one exact double
    # product + one IEEE division, rounded once at the end) — an
    # independent-engine re-execution, not a re-statement.
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type AS s,
                   CAST(concat('0x', substr(md5(concat(
                        CAST(user_id AS VARCHAR), '|kmv')), 1, 15))
                        AS BIGINT) AS h
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase')),
        sk AS (
            SELECT s, h FROM h
            QUALIFY row_number() OVER (PARTITION BY s ORDER BY h)
                    <= {KMV_K}),
        single AS (
            SELECT s, COUNT(*) AS n, MAX(h) AS hk FROM sk GROUP BY s),
        pairs(a, b) AS (
            VALUES ('click', 'view'), ('click', 'purchase'),
                   ('view', 'purchase')),
        uh AS (
            SELECT DISTINCT p.a, p.b, sk.h
            FROM pairs p JOIN sk ON sk.s = p.a OR sk.s = p.b),
        usk AS (
            SELECT a, b, h FROM uh
            QUALIFY row_number() OVER (PARTITION BY a, b ORDER BY h)
                    <= {KMV_K}),
        ustat AS (
            SELECT a, b, COUNT(*) AS n_u, MAX(h) AS theta
            FROM usk GROUP BY a, b),
        ovl AS (
            SELECT u.a, u.b, COUNT(*) AS c
            FROM usk u
            WHERE EXISTS (SELECT 1 FROM sk
                          WHERE sk.s = u.a AND sk.h = u.h)
              AND EXISTS (SELECT 1 FROM sk
                          WHERE sk.s = u.b AND sk.h = u.h)
            GROUP BY u.a, u.b)
        SELECT p.a AS a_type,
               p.b AS b_type,
               round({_EST.format(n='sa.n', hk='sa.hk')}, 4) AS est_a,
               round({_EST.format(n='sb.n', hk='sb.hk')}, 4) AS est_b,
               round({_EST.format(n='us.n_u', hk='us.theta')}, 4)
                   AS est_union,
               round(CASE WHEN us.n_u < {KMV_K}
                          THEN CAST(COALESCE(o.c, 0) AS DOUBLE)
                          ELSE COALESCE(o.c, 0)
                               * ({_EST.format(n='us.n_u', hk='us.theta')})
                               / {KMV_K}.0
                     END, 4) AS est_intersect,
               CAST(COALESCE(o.c, 0) AS BIGINT) AS k_overlap
        FROM pairs p
        JOIN single sa ON sa.s = p.a
        JOIN single sb ON sb.s = p.b
        JOIN ustat us ON us.a = p.a AND us.b = p.b
        LEFT JOIN ovl o ON o.a = p.a AND o.b = p.b
    """,
    tags=("A4", "A1"),
)
def q_sketch_theta_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+: KMV (bottom-k / theta) sketches with UNION and INTERSECTION
    estimates over user sets per event type — the set-algebra capability
    HLL sketches (sketch_hll_mergeable) don't have.

    Plan shape: ONE wide shuffle (per-(set, hash) distinct, map-side
    combined), a per-set rank over distinct hashes, then every set
    operation runs on <= k-row sketch frames — the union merge is exact
    (bottom-k(A ∪ B) == bottom-k(sketch_A ∪ sketch_B)), which is what
    makes per-shard sketches composable on a cluster rollup tree.
    """
    ev = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*_SETS))
    )
    # reused 4x below; <= 3*k rows — checkpoint cuts the shared subplan
    sk = _kmv_sketch(ev).localCheckpoint()

    single = sk.groupBy("set_name").agg(
        F.count("*").alias("n"), F.max("h").alias("hk")
    )
    pairs = spark.createDataFrame(
        list(_PAIRS), "a_type string, b_type string"
    )

    # one pair-tagged plan (the oracle's own shape): tag every sketch
    # hash with the pairs its set belongs to, rank per pair, then join
    # the k-row frames — all post-sketch work is broadcast-sized
    uh = (
        pairs.join(
            sk,
            (sk["set_name"] == pairs["a_type"])
            | (sk["set_name"] == pairs["b_type"]),
        )
        .select("a_type", "b_type", "h")
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy("a_type", "b_type").orderBy("h")
    )
    usk = uh.withColumn("rn", rn).filter(F.col("rn") <= KMV_K).drop("rn")
    ustat = usk.groupBy("a_type", "b_type").agg(
        F.count("*").alias("n_u"), F.max("h").alias("theta")
    )
    in_a = sk.select(
        F.col("set_name").alias("sa"), F.col("h").alias("ha")
    )
    in_b = sk.select(
        F.col("set_name").alias("sb"), F.col("h").alias("hb")
    )
    ovl = (
        usk.join(
            in_a,
            (F.col("sa") == F.col("a_type")) & (F.col("ha") == F.col("h")),
            "semi",
        )
        .join(
            in_b,
            (F.col("sb") == F.col("b_type")) & (F.col("hb") == F.col("h")),
            "semi",
        )
        .groupBy("a_type", "b_type")
        .agg(F.count("*").alias("c"))
    )
    sa = single.select(
        F.col("set_name").alias("a_type"),
        F.col("n").alias("na"),
        F.col("hk").alias("hka"),
    )
    sb = single.select(
        F.col("set_name").alias("b_type"),
        F.col("n").alias("nb"),
        F.col("hk").alias("hkb"),
    )
    return (
        pairs.join(sa, "a_type")
        .join(sb, "b_type")
        .join(ustat, ["a_type", "b_type"])
        .join(ovl, ["a_type", "b_type"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .select(
            "a_type",
            "b_type",
            F.round(F.expr(_EST.format(n="na", hk="hka")), 4).alias("est_a"),
            F.round(F.expr(_EST.format(n="nb", hk="hkb")), 4).alias("est_b"),
            F.round(F.expr(_EST.format(n="n_u", hk="theta")), 4).alias(
                "est_union"
            ),
            F.round(
                # below k the union sketch is lossless: c IS the exact
                # overlap, no scaling (mirrored in the oracle)
                F.when(
                    F.col("n_u") < KMV_K, F.col("c").cast("double")
                ).otherwise(
                    F.col("c")
                    * F.expr(_EST.format(n="n_u", hk="theta"))
                    / F.lit(float(KMV_K))
                ),
                4,
            ).alias("est_intersect"),
            F.col("c").cast("long").alias("k_overlap"),
        )
    )
