"""J1-J9: the join surface (SURVEY §2.2).

Reference: declared by the Table/SQL planner envelope (study/pom.xml:149-165);
lookup joins by the MySQL/JDBC dep (study/pom.xml:105); temporal/as-of by the
Flink temporal-table envelope.

Scale notes (how each survives 100 TB):

* Dimension tables (region/nation/supplier/part at star-schema ratios) are
  broadcast — ``F.broadcast`` hint where the optimizer can't know, else the
  64 MB auto-broadcast threshold set in the session.  Fact-to-fact joins
  (lineitem⋈orders) are sort-merge on the shuffled key; AQE converts to
  broadcast at runtime if a filtered side collapses, and splits skewed
  partitions (skewJoin).
* The interval join bounds state by the time band; at scale you'd
  additionally range-partition by a coarse time bucket so both sides
  co-locate (the streaming version in ``catalog/streaming_replay`` bounds
  state with watermarks instead).
* The as-of join avoids a join explosion entirely: union both sides and make
  ONE pass with a window function — O(n log n) in the sort, no candidate
  pairs materialized.  This is the standard Spark formulation of Flink's
  temporal-table join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import dsum, fmt_ts, o_dsum, o_fmt_ts
from flinkexp_spark.operators.asof import asof_join
from flinkexp_spark.registry import register


@register(
    "join_inner",
    oracle=f"""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               {o_dsum('o_totalprice', 'total_value')}
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY c_mktsegment
    """,
    tags=("J1", "A1"),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact⋈dim inner equi-join + grouped agg (sort-merge or broadcast by size)."""
    o = datasets.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    c = datasets.load(spark, sf_dir, "customer")
    from flinkexp_spark.catalog._util import dsum

    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_value"))
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders
          ON o_custkey = c_custkey AND o_orderstatus = 'F'
        WHERE c_custkey < 200
        GROUP BY c_custkey, c_mktsegment
    """,
    tags=("J2",),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer with extra join-side predicate; COUNT(col) skips nulls."""
    c = datasets.load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    o = datasets.load(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
        SELECT COALESCE(a.k, b.k) AS k, COALESCE(a.n_cust, -1) AS n_cust,
               COALESCE(b.n_supp, -1) AS n_supp
        FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust
              FROM customer WHERE c_acctbal > 9000 GROUP BY 1) a
        FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp
                   FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) b
          ON a.k = b.k
    """,
    tags=("J2",),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join of two aggregates (nulls on both sides)."""
    c = (
        datasets.load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        datasets.load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "k", "full").select(
        F.col("k"),
        F.coalesce("n_cust", F.lit(-1)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(-1)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        )
    """,
    tags=("J3",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi join (EXISTS) — no row multiplication, build side deduped."""
    c = datasets.load(spark, sf_dir, "customer")
    o = datasets.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
    tags=("J4",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti join (NOT EXISTS): parts never shipped in bulk."""
    p = datasets.load(spark, sf_dir, "part")
    li = datasets.load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_brand"
    )


@register(
    "join_cross_theta",
    oracle="""
        SELECT r1.r_name AS region_a, r2.r_name AS region_b
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey < r2.r_regionkey
    """,
    tags=("J5",),
)
def q_join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: cross join + theta predicate (tiny side only — crossJoin is O(n*m))."""
    r1 = datasets.load(spark, sf_dir, "region").alias("r1")
    r2 = datasets.load(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") < F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("region_a"), F.col("r2.r_name").alias("region_b")
        )
    )


@register(
    "join_broadcast_star",
    oracle=f"""
        SELECT r_name, n_name, COUNT(*) AS n_suppliers,
               {o_dsum('s_acctbal', 'total_bal')}
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    tags=("J6", "J1"),
)
def q_join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: explicit broadcast of both dims — zero shuffle on the probe side.

    The plan must show BroadcastHashJoin twice (asserted in test_plans);
    at 100 TB the fact side streams through without any exchange until the
    final group-by.
    """
    from flinkexp_spark.catalog._util import dsum

    s = datasets.load(spark, sf_dir, "supplier")
    n = F.broadcast(datasets.load(spark, sf_dir, "nation"))
    r = F.broadcast(datasets.load(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_suppliers"), dsum("s_acctbal", "total_bal"))
    )


@register(
    "join_interval",
    oracle="""
        SELECT a.event_id AS click_id, COUNT(*) AS n_views
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts
         AND b.event_id <> a.event_id
        WHERE a.event_type = 'click' AND b.event_type = 'view'
        GROUP BY a.event_id
    """,
    tags=("J7",),
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (batch form): time-bounded self-join — views within 10 min before a click.

    Equi-key on user_id keeps it a hash/sort-merge join; the time band is a
    post-join filter.  Streaming form (watermark-bounded state) is
    ``stream_interval_join`` in streaming_replay.py.
    """
    e = datasets.load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").alias("a")
    b = e.filter(F.col("event_type") == "view").alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("b.ts") <= F.col("a.ts"))
        & (F.col("b.event_id") != F.col("a.event_id"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.event_id").alias("click_id"))
        .agg(F.count("*").alias("n_views"))
    )


RANGE_PAD_MIN = 15  # session activity window pad (minutes)
RANGE_BIN_S = 1800  # bin width for the binned range join (seconds)


@register(
    "join_range_binned",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered),
        sessions AS (
            SELECT user_id AS s_user,
                   MIN(ts) - INTERVAL {RANGE_PAD_MIN} MINUTE AS s_start,
                   MAX(ts) + INTERVAL {RANGE_PAD_MIN} MINUTE AS s_end
            FROM numbered GROUP BY user_id, sid),
        hits AS (
            SELECT e.event_type, e.event_id
            FROM events e JOIN sessions s
              ON e.ts >= s.s_start AND e.ts <= s.s_end
             AND s.s_user <> e.user_id)
        SELECT event_type,
               COUNT(*) AS n_pairs,
               COUNT(DISTINCT event_id) AS n_events
        FROM hits GROUP BY event_type
    """,
    tags=("J7",),
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (no-equi-key form): point-in-interval range join via time binning
    (operators/rangejoin.py) — for each event, every OTHER user's padded
    activity session containing its timestamp.

    There is no equi key, so a naive formulation is a nested-loop O(n·m)
    scan; the binned operator manufactures the key (interval exploded to
    30-min bins, point hashed to its bin) and Spark plans an ordinary
    shuffle join — survives 100 TB where BroadcastNestedLoopJoin cannot.
    The oracle is DuckDB's exact (IEJoin) range join over the same padded
    sessions.
    """
    from pyspark.sql import Window
    from flinkexp_spark.operators.rangejoin import range_join_binned

    events = datasets.load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w_ord)
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pad = F.expr(f"INTERVAL {RANGE_PAD_MIN} MINUTES")
    sessions = (
        events.select("user_id", "event_id", "ts", new_session.alias("new_session"))
        .withColumn("sid", F.sum("new_session").over(w_run))
        .groupBy("user_id", "sid")
        .agg(
            (F.min("ts") - pad).alias("s_start"),
            (F.max("ts") + pad).alias("s_end"),
        )
        .select(F.col("user_id").alias("s_user"), "s_start", "s_end")
    )
    points = events.select("event_id", "user_id", "event_type", "ts")
    joined = range_join_binned(
        points, sessions, "ts", "s_start", "s_end", RANGE_BIN_S
    ).filter(F.col("s_user") != F.col("user_id"))
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("event_id").alias("n_events"),
    )


@register(
    "join_lookup_dim",
    oracle="""
        SELECT c_mktsegment AS segment, event_type, COUNT(*) AS n
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    tags=("J8",),
)
def q_join_lookup_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (batch form): enrichment lookup against a dimension table.

    The dim is broadcast (lookup-join semantics: every probe row sees the
    full dim without a shuffle).  Streaming form: stream-static join in
    streaming_replay.py.
    """
    e = datasets.load(spark, sf_dir, "events")
    c = F.broadcast(datasets.load(spark, sf_dir, "customer"))
    return (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_asof",
    oracle=f"""
        SELECT a.event_id AS click_id, {o_fmt_ts('a.ts', 'click_ts')},
               COALESCE(b.event_id, -1) AS view_id,
               COALESCE(strftime(b.ts, '%Y-%m-%d %H:%M:%S'), '<none>') AS view_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
    tags=("J9",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: as-of join — for each click, the latest view at-or-before it.

    Implemented by the engine helper :func:`flinkexp_spark.operators.asof.asof_join`
    (single union + window pass; no candidate-pair blow-up).  DuckDB's native
    ASOF JOIN is the oracle.
    """
    e = datasets.load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    joined = asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_prefix="view_",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        fmt_ts("ts", "click_ts"),
        F.coalesce(F.col("view_event_id"), F.lit(-1)).alias("view_id"),
        F.coalesce(
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("<none>")
        ).alias("view_ts"),
    )


@register(
    "join_asof_forward",
    oracle="""
        SELECT a.event_id AS click_id, a.user_id,
               COALESCE(b.event_id, -1) AS next_purchase_id,
               COALESCE(CAST(floor(epoch(b.ts)) AS BIGINT)
                        - CAST(floor(epoch(a.ts)) AS BIGINT), -1) AS wait_s
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id AND a.ts <= b.ts
    """,
    tags=("J9", "W2"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 forward direction: for each click, the user's NEXT purchase
    at-or-after it and the wait in whole seconds (time-to-conversion —
    the pandas ``merge_asof(direction="forward")`` contract).

    Same engine helper and same single-shuffle union+window plan as the
    backward join — only the frame looks ahead and the tie order flips
    (operators/asof.py).  DuckDB's native forward ASOF (``a.ts <= b.ts``)
    is the oracle.
    """
    e = datasets.load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_prefix="p_",
        direction="forward",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.coalesce(F.col("p_event_id"), F.lit(-1)).alias("next_purchase_id"),
        F.coalesce(
            F.col("p_ts").cast("long") - F.col("ts").cast("long"), F.lit(-1)
        ).alias("wait_s"),
    )


@register(
    "join_salted_skew",
    oracle="""
        WITH big AS (SELECT event_id, user_id % 5 AS hot_key, value
                     FROM events),
        dim(hot_key, label) AS (VALUES (0, 'k0'), (1, 'k1'), (2, 'k2'),
                                       (3, 'k3'), (4, 'k4'))
        SELECT label, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM big JOIN dim USING (hot_key)
        GROUP BY label
    """,
    tags=("J1", "A1"),
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SHUFFLE join under extreme key skew (5 keys, whole table hot).

    The big side collapses onto 5 join keys — a plain sort-merge join
    routes ~1/5 of the table through single reducers.  `salted_join`
    replicates the dim 16x and salts the fact by event_id, fanning every
    hot key over 16 reducers; the merge hint forbids broadcast so the
    salting (not AQE or a broadcast) carries the skew.  Result equals the
    unsalted join exactly.
    """
    from flinkexp_spark.catalog._util import dec
    from flinkexp_spark.operators.salting import salted_join

    ev = datasets.load(spark, sf_dir, "events")
    big = ev.select(
        "event_id", (F.col("user_id") % 5).alias("hot_key"), "value"
    )
    dim = datasets.local_df(
        spark,
        [(i, f"k{i}") for i in range(5)],
        "hot_key long, label string",
    ).hint("merge")
    joined = salted_join(big, dim, ["hot_key"], "event_id", n_salts=16)
    return joined.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("total"),
    )


FUZZY_MAX_DIST = 2


@register(
    "join_fuzzy_blocked",
    # The oracle runs the DP over the DISTINCT-NAME histogram, never over
    # key pairs — a pure algebraic rewrite, exact for ANY input: for an
    # unordered name pair {A, B} within a brand (A < B lexicographically;
    # same-name pairs are excluded by the query's p_name <> filter),
    # every (key_a, key_b) cross pair appears exactly once under the
    # key-ordering predicate regardless of which name holds the smaller
    # key, so the pair multiplicity is count(A) * count(B) and the
    # per-brand aggregates weight by it.  This is the BPE-encode
    # memo-table philosophy applied to the oracle: levenshtein cost now
    # scales with DISTINCT names² (length-prefiltered), not rows² — the
    # row-pair form ran ~600s at sf1 (10x name replication = 100x
    # duplicate DP evaluations) and timed out at the watchdog line.  The
    # lossless length-delta prefilter (|len a - len b| > d implies
    # distance > d) still runs ahead of the DP, which evaluates once in a
    # projection.
    oracle=f"""
        WITH grp AS MATERIALIZED (
            SELECT p_brand AS brand, p_name AS nm,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM part GROUP BY p_brand, p_name),
        cand AS MATERIALIZED (
            SELECT a.brand, a.c * b.c AS m, a.nm AS na, b.nm AS nb
            FROM grp a JOIN grp b
              ON a.brand = b.brand AND a.nm < b.nm
            WHERE abs(length(a.nm) - length(b.nm)) <= {FUZZY_MAX_DIST}),
        p AS (
            SELECT brand, m, levenshtein(na, nb) AS d FROM cand)
        SELECT brand,
               CAST(SUM(m) AS BIGINT) AS n_fuzzy_pairs,
               CAST(SUM(m * d) AS BIGINT) AS dist_sum,
               CAST(MIN(d) AS BIGINT) AS min_dist
        FROM p WHERE d <= {FUZZY_MAX_DIST} GROUP BY brand
    """,
    tags=("J5", "F1"),
)
def q_join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: edit-distance similarity join with BLOCKING.

    The record-linkage workhorse: candidate pairs come only from within a
    blocking key (brand), so the pair space is sum-of-block², never n² —
    at 100 TB blocks are the shuffle partitions and each executor resolves
    its own blocks.  Levenshtein runs JVM-side in codegen on candidates
    only; the equality pre-filter removes exact dups before the O(len²)
    distance.  (Both engines implement the same classic DP levenshtein.)
    """
    part = datasets.load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    # The DISTINCT-NAME histogram memoization the oracle has used since
    # r12 now runs engine-side too (r13): within a brand, every key pair
    # of an unordered name pair {A, B} appears exactly once under the
    # key-ordering predicate, so its multiplicity is count(A) * count(B)
    # — the levenshtein DP evaluates once per distinct name pair, never
    # per row pair.  At sf1 (10x key-shifted name replication) that is a
    # 100x cut in DP evaluations: the row-pair form ran ~470s, this runs
    # with the sf0.1 pair volume plus one histogram shuffle.
    grp = part.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_name").alias("nm")
    ).agg(F.count("*").cast("long").alias("c"))
    a = grp.select("brand", F.col("nm").alias("na"), F.col("c").alias("ca"))
    b = grp.select("brand", F.col("nm").alias("nb"), F.col("c").alias("cb"))
    # two lossless prefilters ahead of the O(len^2) DP: a length-delta
    # bound (|len a - len b| > d implies distance > d) that runs in pure
    # codegen arithmetic, and the THRESHOLDED levenshtein (early-exits
    # the DP band and returns -1 past the bound) on what survives
    d = F.levenshtein("na", "nb", FUZZY_MAX_DIST)
    pairs = (
        a.join(b, "brand")
        .filter(
            (F.col("na") < F.col("nb"))
            & (
                F.abs(F.length("na") - F.length("nb"))
                <= FUZZY_MAX_DIST
            )
            & (d >= 0)
        )
        .select("brand", (F.col("ca") * F.col("cb")).alias("m"), d.alias("d"))
    )
    return pairs.groupBy("brand").agg(
        F.sum("m").cast("long").alias("n_fuzzy_pairs"),
        F.sum(F.col("m") * F.col("d")).cast("long").alias("dist_sum"),
        F.min("d").cast("long").alias("min_dist"),
    )


@register(
    "join_bloom_prefilter",
    oracle=f"""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               {o_dsum('o_totalprice', 'revenue')}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 9000
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("J6", "J1", "A1"),
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter prefilter ahead of a fact join
    (operators/bloom.py).

    The selective dimension side (high-balance customers) builds a KB-sized
    bitset over its keys; the bitset broadcasts and drops non-joinable
    orders AT THE SCAN, before any shuffle or join work.  The exact join
    afterwards removes Bloom false positives, so the result — and the
    oracle — is exactly the plain join.  Spark's automatic runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter.enabled) is the planner-driven
    version of this; the operator form composes where the heuristic can't
    reach (reuse across consumers, prefilter before UDF stages).
    """
    from flinkexp_spark.operators.bloom import bloom_build, bloom_prefilter

    cust = (
        datasets.load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_mktsegment")
    )
    orders = datasets.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    bloom = bloom_build(cust, "c_custkey", m_bits=8192, k=3)
    candidates = bloom_prefilter(orders, bloom, "o_custkey", m_bits=8192, k=3)
    return (
        candidates.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("c_mktsegment")
    )
