"""Event-pattern analytics: the Flink CEP / SQL MATCH_RECOGNIZE surface
re-expressed as declarative Spark plans.

Reference parity: Flink ships CEP ("A followed-by B within T", absence
patterns) and MATCH_RECOGNIZE in the Table API envelope (the planner
dependency at study/pom.xml:149-165).  Spark has neither; the engine
expresses the same event-sequence semantics with bounded interval joins +
ranking windows — the canonical batch/at-scale funnel formulation:

* followed-by  -> interval join (user equi-key + time-range predicate),
  rank 1 per trigger = "first B after A within T".
* not-followed-by (absence) -> the same interval join as LEFT ANTI.
* cohort retention -> first-touch cohort day per key + day-offset join.

Scale notes: every pattern is an equi-join on the entity key with a
BOUNDED time predicate — state/shuffle is O(events in window), never
O(pairs).  The per-trigger rank window is bounded by matches within T.
These are exactly the plans a funnel warehouse (Amplitude-style) runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

FUNNEL_WINDOW_S = 3600  # "within 1 hour"
RETENTION_MAX_OFFSET = 7


@register(
    "pattern_funnel",
    oracle=f"""
        WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
        c AS (SELECT * FROM events WHERE event_type = 'click'),
        j AS (
            SELECT v.event_id AS view_id, v.user_id, v.ts AS vts,
                   c.event_id AS click_id, c.ts AS cts,
                   row_number() OVER (PARTITION BY v.event_id
                                      ORDER BY c.ts, c.event_id) AS rn
            FROM v JOIN c
              ON v.user_id = c.user_id
             AND c.ts > v.ts
             AND c.ts <= v.ts + INTERVAL {FUNNEL_WINDOW_S} SECOND)
        SELECT view_id, user_id, click_id,
               -- per-timestamp floor mirrors Spark's unix_timestamp()
               -- second-truncation (fixture ts carries sub-second parts)
               CAST(floor(epoch(cts)) - floor(epoch(vts)) AS BIGINT)
                   AS secs_to_click
        FROM j WHERE rn = 1
    """,
    tags=("J7", "W1"),
)
def q_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP "A followed-by B within T": for every view, the FIRST click by
    the same user within the next hour (Flink `A -> B within 1h`,
    MATCH_RECOGNIZE `PATTERN (A B)` with a range guard).

    Interval join (user equi-key + bounded range) then rank-1 per trigger —
    no unbounded pair space, no per-event Python.  At scale the range
    predicate keeps the join's state bounded by the window, exactly like
    the streaming interval join (stream_interval_join) this mirrors.
    """
    e = datasets.load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("vts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    j = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") > F.col("vts"))
        & (
            F.col("cts")
            <= F.col("vts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_S} SECONDS")
        ),
    )
    w = Window.partitionBy("view_id").orderBy(F.asc("cts"), F.asc("click_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "view_id",
            "user_id",
            "click_id",
            (F.unix_timestamp("cts") - F.unix_timestamp("vts"))
            .cast("long")
            .alias("secs_to_click"),
        )
    )


@register(
    "pattern_absence",
    oracle=f"""
        WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
        c AS (SELECT * FROM events WHERE event_type = 'click')
        SELECT CAST(CAST(v.ts AS DATE) AS STRING) AS day,
               COUNT(*) AS n_unconverted
        FROM v
        WHERE NOT EXISTS (
            SELECT 1 FROM c
            WHERE c.user_id = v.user_id
              AND c.ts > v.ts
              AND c.ts <= v.ts + INTERVAL {FUNNEL_WINDOW_S} SECOND)
        GROUP BY 1
    """,
    tags=("J4", "J7"),
)
def q_pattern_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP absence pattern ("A NOT followed-by B within T"): views with no
    same-user click inside the next hour, counted per day — Flink's
    `notFollowedBy` / timeout pattern, the alerting shape ("cart abandoned",
    "no heartbeat after request").

    LEFT ANTI interval join: same bounded-range equi-join as the funnel,
    with the anti flag replacing the rank.  In streaming this is the
    watermark-timeout emission of stream_late_data; in batch one join.
    """
    e = datasets.load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    unconverted = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") > F.col("vts"))
        & (
            F.col("cts")
            <= F.col("vts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_S} SECONDS")
        ),
        "left_anti",
    )
    return (
        unconverted.groupBy(
            F.col("vts").cast("date").cast("string").alias("day")
        ).agg(F.count("*").alias("n_unconverted"))
    )


@register(
    "cohort_retention",
    oracle=f"""
        WITH first_touch AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id),
        activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        SELECT CAST(f.cohort_day AS STRING) AS cohort_day,
               CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
                   AS day_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM activity a JOIN first_touch f ON a.user_id = f.user_id
        WHERE date_diff('day', f.cohort_day, a.day)
              BETWEEN 0 AND {RETENTION_MAX_OFFSET}
        GROUP BY f.cohort_day, day_offset
    """,
    tags=("A3", "J1"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, counted
    again at each day offset 0..7 — the standard product-analytics rollup
    (and the aggregate a MATCH_RECOGNIZE `PATTERN (FIRST ANY*)` feeds).

    Two shuffles total: first-touch min per user, then the distinct
    (user, day) activity joined back on user_id (co-partitioned by the
    same key, so AQE plans it without a third exchange) and aggregated on
    the tiny (cohort, offset) grid.
    """
    e = datasets.load(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    j = activity.join(first_touch, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day").cast("long")
    )
    return (
        j.filter(F.col("day_offset").between(0, RETENTION_MAX_OFFSET))
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "pattern_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        pairs AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(CAST(n AS DOUBLE) /
                     SUM(n) OVER (PARTITION BY from_type), 6) AS p
        FROM pairs
    """,
    tags=("W2", "A1"),
)
def q_pattern_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov transition matrix: P(next event type | current).

    One lead() window per user (the same keyed-sequence shuffle every CEP
    pattern here uses), then a (from, to) count — the matrix is
    O(types²) rows no matter the corpus, and the row-normalization is a
    window over that tiny table, not the events.
    """
    ev = datasets.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    )


TRI_MAX_PART = 500  # co-purchase graph restricted to part keys < this


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey < {TRI_MAX_PART} AND b.l_partkey < {TRI_MAX_PART}),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e1.v = e2.u
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT (SELECT COUNT(DISTINCT u) FROM (SELECT u FROM e UNION ALL
                SELECT v FROM e)) AS n_nodes,
               (SELECT COUNT(*) FROM e) AS n_edges,
               CAST(n_triangles AS BIGINT) AS n_triangles
        FROM tri
    """,
    tags=("J1", "A2"),
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts bought together).

    The MR-classic (Suri & Vassilvitskii, WWW 2011) with the DEGREE
    orientation: direct every undirected edge from its lower-(degree, id)
    endpoint to its higher one, so each triangle is counted exactly once
    at its minimum-order corner and every node's out-degree — hence wedge
    fan-out — is O(sqrt(m)) even on skewed graphs (a hub of degree d only
    fans out to neighbors of degree >= d, and there are at most 2m/d of
    those).  The count is orientation-invariant, so the id-oriented
    oracle is unchanged.  Every stage remains a hash equi-join on a node
    id; the orientation predicate rides along as a join-level filter.
    """
    li = datasets.load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < TRI_MAX_PART
    ).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    # The edge set feeds FOUR consumers (degrees, orientation, node and
    # edge counts) and the oriented set feeds THREE (both wedge legs and
    # the closing-edge probe).  Materialize each once (localCheckpoint —
    # same loop-invariant discipline as operators/components.py) instead
    # of letting every consumer recompute the build; this is what cut the
    # audited plan from 10 Exchanges to the irreducible ones.
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # attach endpoint degrees (bounded by TRI_MAX_PART nodes — broadcast,
    # no shuffle of the edge set), then orient low-(degree, id) -> high
    ed = e.join(
        F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("du"))), "u"
    ).join(
        F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))), "v"
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # Pre-partition the oriented edges on the wedge corner s BEFORE the
    # checkpoint: localCheckpoint preserves the physical partitioning, so
    # the wedge self-join on x (= s) is already co-located — neither leg
    # re-shuffles.  Only the closing-edge probe (keyed (y, z)) still pays
    # an exchange, which is irreducible: it joins on different keys.
    o = (
        ed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
        )
        .repartition(F.col("s"))
        .localCheckpoint()
    )
    # wedges at the minimum-order corner: two out-edges of s, ordered by
    # (degree, id) so each unordered pair appears once; the closing edge
    # is necessarily oriented t1 -> t2 in that same order
    w1 = o.select(F.col("s").alias("x"), F.col("t").alias("y"), F.col("dt").alias("dy"))
    w2 = o.select(F.col("s").alias("x"), F.col("t").alias("z"), F.col("dt").alias("dz"))
    wedge_order = (F.col("dy") < F.col("dz")) | (
        (F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z"))
    )
    closing = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    tri = (
        w1.join(w2, "x")
        .filter(wedge_order)
        .join(closing, ["y", "z"])
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .agg(F.countDistinct("n").alias("n_nodes"))
    )
    edges = e.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(edges)
        .crossJoin(tri)
        .select("n_nodes", "n_edges", F.col("n_triangles").cast("long").alias("n_triangles"))
    )


ATTR_WINDOW_S = 7 * 86400  # attribution lookback: 7 days


@register(
    "pattern_attribution_last_touch",
    oracle=f"""
        WITH pur AS (SELECT event_id, user_id, ts, value FROM events
                     WHERE event_type = 'purchase'),
        clk AS (SELECT event_id AS cid, user_id, ts AS cts FROM events
                WHERE event_type = 'click'),
        j AS (
            SELECT p.event_id, p.value, c.cid,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.cts DESC, c.cid DESC) AS rn
            FROM pur p JOIN clk c
              ON p.user_id = c.user_id
             AND c.cts <= p.ts
             AND c.cts >= p.ts - INTERVAL {ATTR_WINDOW_S} SECONDS),
        best AS (SELECT event_id, value FROM j WHERE rn = 1)
        SELECT
            CAST((SELECT COUNT(*) FROM pur) AS BIGINT) AS n_purchases,
            CAST((SELECT COUNT(*) FROM best) AS BIGINT) AS n_attributed,
            CAST((SELECT SUM(CAST(value AS DECIMAL(18,2))) FROM best)
                 AS DOUBLE) AS attributed_value
    """,
    tags=("J7", "J9", "W1"),
)
def q_pattern_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase credits the LAST click within a
    7-day lookback (last-touch).

    A bounded interval join on the entity key (state O(events-in-window),
    the same eviction bound as every CEP pattern here) followed by a
    per-purchase rank — deterministic tiebreak on the click id.  At scale
    this is the streaming as-of shape: the click side is watermark-bounded
    to the lookback horizon.
    """
    from flinkexp_spark.catalog._util import dec

    ev = datasets.load(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
    )
    j = pur.join(
        clk,
        (pur.user_id == clk.cuid)
        & (clk.cts <= pur.ts)
        & (clk.cts >= pur.ts - F.expr(f"INTERVAL {ATTR_WINDOW_S} SECONDS")),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("cts"), F.desc("cid")
    )
    best = j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    n_pur = pur.agg(F.count("*").alias("n_purchases"))
    attr = best.agg(
        F.count("*").alias("n_attributed"),
        F.sum(dec("value")).cast("double").alias("attributed_value"),
    )
    return n_pur.crossJoin(attr)


@register(
    "pattern_conversion_latency",
    oracle="""
        WITH first_signup AS (
            SELECT user_id, MIN(ts) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
        first_purchase AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN first_signup s
              ON e.user_id = s.user_id AND e.ts > s.s_ts
            WHERE e.event_type = 'purchase'
            GROUP BY e.user_id),
        lat AS (
            SELECT s.user_id,
                   (epoch_us(p.p_ts) - epoch_us(s.s_ts)) // 1000000
                       AS latency_s
            FROM first_signup s JOIN first_purchase p
              ON s.user_id = p.user_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               round(quantile_cont(latency_s, 0.5), 4) AS p50_s,
               round(quantile_cont(latency_s, 0.9), 4) AS p90_s
        FROM lat
    """,
    tags=("A6", "J1", "W2"),
)
def q_pattern_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort conversion latency: signup -> first-purchase delay percentiles.

    Two keyed min-aggregates (map-side combined) and one tiny per-user
    join — the latency table is O(users), so the exact percentile sorts
    users, never events.  At 100 TB swap the exact percentile for the
    mergeable histogram (`agg_histogram_quantile`) on the same latencies.
    """
    ev = datasets.load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = s.join(p, "user_id").select(
        (
            (F.unix_micros("p_ts") - F.unix_micros("s_ts")) / 1000000
        ).cast("long").alias("latency_s")
    )
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("latency_s", 0.5), 4).alias("p50_s"),
        F.round(F.percentile("latency_s", 0.9), 4).alias("p90_s"),
    )


PAGERANK_ITERS = 3
_PR_EDGES = """
    SELECT sn.n_name AS src, cn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name
"""
_PR_ITER = """
    r{next} AS (
        SELECT nodes.node,
               (SELECT 0.15 / n FROM nn)
               + 0.85 * COALESCE(SUM(r{cur}.r * e.w / outw.tw), 0) AS r
        FROM nodes
        LEFT JOIN e    ON e.dst = nodes.node
        LEFT JOIN outw ON outw.src = e.src
        LEFT JOIN r{cur} ON r{cur}.node = e.src
        GROUP BY nodes.node
    )
"""
_PR_ORACLE = (
    f"""
    WITH e AS ({_PR_EDGES}),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, SUM(w) AS tw FROM e GROUP BY src),
    r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS r FROM nodes),
    """
    + ",".join(
        _PR_ITER.format(cur=i, next=i + 1) for i in range(PAGERANK_ITERS)
    )
    + f"""
    SELECT node, ROUND(r, 6) AS rank
    FROM r{PAGERANK_ITERS} ORDER BY node
    """
)


@register("graph_pagerank", oracle=_PR_ORACLE, tags=("J1", "A1", "J6"))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (supplier nation
    -> customer nation, edge weight = shipment count), PAGERANK_ITERS
    synchronous iterations, damping 0.85.

    The iterative-algorithm shape on DataFrames: each iteration is ONE
    hash join (ranks x out-edges) + ONE aggregation on dst — the Pregel
    step expressed relationally.  Node/edge/out-weight frames are reused
    across iterations; at 100 TB you persist (or checkpoint every ~5
    iterations to cut lineage) and pre-partition edges by src so every
    iteration reuses the same exchange.  The oracle unrolls the identical
    recurrence in SQL; ROUND(6) absorbs float summation-order differences.
    Dangling mass is not redistributed (both sides implement the same
    convention).
    """
    li = datasets.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = datasets.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supp = datasets.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = datasets.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = datasets.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "src")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "dst")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    # The edge/node/out-weight frames are loop INVARIANTS reused by every
    # iteration; localCheckpoint truncates their lineage so the plan joins
    # a tiny materialized table per round instead of replaying the 6-table
    # edge build 3x (85 Exchanges -> ~14).  At cluster scale this is
    # persist() + checkpoint every ~5 rounds.
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    # Node COUNT is a scalar (graph-dimension, bounded): fetch it once
    # instead of crossJoin-broadcasting a 1-row frame into the init and
    # every iteration — that folds 1/n and 0.15/n into plan literals and
    # drops PAGERANK_ITERS+1 broadcast-exchange stages (r12 verdict #3:
    # the per-stage scheduling overhead was the measured regression, A/B
    # median 2.4s -> 1.9s at sf0.1).
    n = float(nodes.count())
    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    ew = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("tw")).alias("frac")
    ).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    # The rank vector is one row per NODE (graph-dimension-sized, not
    # fact-sized), so it broadcasts into the edge join and the contribution
    # table broadcasts back — each iteration is map-side except the one
    # aggregation exchange on dst.  On a billion-node graph you'd instead
    # pre-partition ew and ranks on the same key and let every iteration
    # reuse that exchange.
    for _ in range(PAGERANK_ITERS):
        contrib = (
            ew.join(F.broadcast(ranks), ew.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("frac")).alias("s"))
        )
        ranks = (
            nodes.join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select(
        "node", F.round("r", 6).alias("rank")
    ).orderBy("node")


# MATCH_RECOGNIZE PATTERN (V+ C P) over the per-user event stream, encoded
# as regex over a per-key sequence string: one char per event type.
CEP_PATTERN = "v+cp"
_CEP_CHR = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' "
    "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END"
)


@register(
    "pattern_regex_cep",
    oracle=f"""
        SELECT user_id,
               CAST(len(regexp_extract_all(seq, '{CEP_PATTERN}')) AS BIGINT)
                   AS n_matches,
               CAST(len(seq) AS BIGINT) AS seq_len
        FROM (
            SELECT user_id,
                   string_agg({_CEP_CHR}, '' ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        )
        WHERE len(regexp_extract_all(seq, '{CEP_PATTERN}')) > 0
        ORDER BY user_id
    """,
    tags=("F1", "A7", "W2"),
)
def q_pattern_regex_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General CEP via regex-over-sequence: MATCH_RECOGNIZE's
    ``PATTERN (V+ C P)`` (one-or-more views, then a click, then a purchase,
    contiguous per user) as pure codegen — encode each user's time-ordered
    events as a one-char-per-event string, then count non-overlapping regex
    matches.  ANY regular pattern (alternation, bounded repeats, absence
    via negative classes) compiles to the same two-operator plan: one
    grouped sort-agg to build sequences, one regex pass.

    The interval-join formulations above are the right shape when patterns
    carry TIME constraints; this one trades them for full regular-language
    power at one shuffle.  At 100 TB per-key sequences are bounded by
    per-user activity (chars, not rows); a 10M-event hot key would need the
    windowed variant (split sequences at session gaps first).

    Plan shape (r08 rework, ADVICE r07): ``listagg(c) WITHIN GROUP
    (ORDER BY ts, event_id)`` — the ordering spec lives INSIDE the
    aggregate function, so the engine guarantees per-key time order
    regardless of input order, hash-agg spill, or the sort-based
    ObjectHashAggregate fallback past
    spark.sql.objectHashAggregate.sortBased.fallbackThreshold (the r07
    repartition+sortWithinPartitions form silently depended on input
    order surviving all of those).  It is also FASTER: partial_listagg
    map-side-combines before the shuffle, so the exchange carries one
    buffer per (task, user) instead of every event row — sf0.1 warm
    median 0.49 s vs 0.77 s for the sorted-input form.
    """
    events = datasets.load(spark, sf_dir, "events")
    base = events.select(
        "user_id", "ts", "event_id", F.expr(_CEP_CHR).alias("c")
    )
    seqs = base.groupBy("user_id").agg(
        F.expr("listagg(c) WITHIN GROUP (ORDER BY ts, event_id)").alias("seq")
    )
    n = F.regexp_count("seq", F.lit(CEP_PATTERN))
    return (
        seqs.select(
            "user_id",
            n.cast("long").alias("n_matches"),
            F.length("seq").cast("long").alias("seq_len"),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy("user_id")
    )


COPURCHASE_MIN_SUPPORT = 3


@register(
    "pattern_copurchase_pairs",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey)
        SELECT part_a, part_b, COUNT(*) AS support
        FROM pairs
        GROUP BY part_a, part_b
        HAVING COUNT(*) >= {COPURCHASE_MIN_SUPPORT}
        ORDER BY support DESC, part_a, part_b
    """,
    tags=("J5", "A1", "A9"),
)
def q_pattern_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts bought together in the same order,
    with minimum support — the candidate-generation step of every
    association-rule / co-occurrence pipeline (Apriori's L2 layer).

    The pair space is generated WITHIN the basket key only (self-join on
    l_orderkey with part_a < part_b), so candidates are
    sum-over-orders(lines²) — bounded by basket size (~7 here), never
    corpus².  At 100 TB this is the same blocked-pair discipline as the
    fuzzy join and LSH candidates: the blocking key rides the shuffle,
    pairs exist only inside each group.
    """
    # materialize the distinct projection ONCE: both self-join branches
    # read it, and without this the lineitem scan + distinct shuffle plans
    # twice (same shared-branch convention as llm_dedup's index build)
    items = (
        datasets.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= COPURCHASE_MIN_SUPPORT)
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


CN_TOPK = 20  # link-prediction candidates reported


@register(
    "graph_common_neighbors",
    oracle=f"""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey < {TRI_MAX_PART}),
        e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey),
        adj AS (SELECT u AS n, v AS m FROM e
                UNION ALL SELECT v AS n, u AS m FROM e),
        w AS (SELECT a.n AS u, b.n AS v, CAST(COUNT(*) AS BIGINT) AS common
              FROM adj a JOIN adj b ON a.m = b.m AND a.n < b.n
              GROUP BY a.n, b.n),
        cand AS (SELECT w.u, w.v, w.common FROM w
                 LEFT JOIN e ON e.u = w.u AND e.v = w.v
                 WHERE e.u IS NULL),
        r AS (SELECT *, row_number() OVER (ORDER BY common DESC, u, v)
                        AS rnk FROM cand)
        SELECT u, v, common, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= {CN_TOPK}
    """,
    tags=("J1", "J4", "W1"),
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction on the co-purchase graph: for every
    non-adjacent node pair, count shared neighbors and report the top-20
    candidate edges (count DESC, pair ASC — fully deterministic).

    The wedge join is the same degree-bounded pattern as the triangle
    count: adjacency self-joined on the SHARED neighbor, so the pair space
    is sum-of-squared-degrees, never |V|^2; existing edges drop out with a
    null-producing left join (anti-join semantics, J4).  The edge set is
    materialized once (localCheckpoint) and feeds both the wedge join and
    the anti probe.  At 100 TB the wedge explosion is bounded the same way
    the triangle count bounds it — cap or orient by degree; the fixture
    graph is the TRI_MAX_PART co-purchase slice.
    """
    li = datasets.load(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < TRI_MAX_PART
    ).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    adj = e.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        e.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    w = (
        adj.alias("a")
        .join(adj.alias("b"), F.col("a.m") == F.col("b.m"))
        .filter(F.col("a.n") < F.col("b.n"))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(F.count("*").alias("common"))
    )
    cand = w.join(e, ["u", "v"], "left_anti")
    rnk = F.row_number().over(
        Window.orderBy(F.desc("common"), F.asc("u"), F.asc("v"))
    )
    return (
        cand.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= CN_TOPK)
    )


@register(
    "graph_clustering_coefficient",
    oracle=f"""
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey < {TRI_MAX_PART}
              AND b.l_partkey < {TRI_MAX_PART}),
        deg AS (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
            GROUP BY n),
        tri AS (
            SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM e e1 JOIN e e2 ON e1.v = e2.u
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        t AS (
            SELECT n, CAST(count(*) AS BIGINT) AS n_tri
            FROM (SELECT x AS n FROM tri UNION ALL
                  SELECT y AS n FROM tri UNION ALL
                  SELECT z AS n FROM tri)
            GROUP BY n)
        SELECT deg.n AS node, d AS degree,
               CAST(coalesce(n_tri, 0) AS BIGINT) AS n_triangles,
               round(2.0 * CAST(coalesce(n_tri, 0) AS DOUBLE)
                     / (CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) - 1.0)), 6)
                   AS clustering
        FROM deg LEFT JOIN t ON deg.n = t.n
        WHERE d >= 2
        ORDER BY node
    """,
    tags=("J1", "A1", "W1"),
)
def q_graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient per node: C(v) = 2*T(v) / (d(v) *
    (d(v)-1)) over the co-purchase graph — the per-node refinement of
    `graph_triangle_count`, and the standard community-structure screen.

    Triangles are enumerated ONCE at their id-minimum corner (each
    produces exactly one (x, y, z) row with x < y < z), then attributed
    to all three corners by a 3-way unionAll + groupBy — a word count
    over node ids, so attribution adds one bounded shuffle to the
    triangle plan.  The edge set is materialized once and feeds the
    wedge legs, the closing probe, and the degree table; at hub-skewed
    scale, switch the wedge corner to the degree orientation exactly as
    the global count does (the triangle SET is orientation-invariant, so
    attribution is unchanged).
    """
    li = (
        datasets.load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < TRI_MAX_PART)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .repartition(F.col("u"))
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    w1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    closing = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = (
        w1.join(w2, "x")
        .filter(F.col("y") < F.col("z"))
        .join(closing, ["y", "z"])
    )
    t = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.join(t, "n", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("n").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.expr(
                "round(2.0 * CAST(coalesce(n_tri, 0) AS DOUBLE)"
                " / (CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) - 1.0)), 6)"
            ).alias("clustering"),
        )
        .orderBy("node")
    )


LABELPROP_ROUNDS = 3
_LP_EDGES = """
    SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
"""
_LP_ITER = """
    c{t} AS (
        SELECT e.dst AS node, l{t}.label, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM e JOIN l{t} ON l{t}.node = e.src
        GROUP BY 1, 2
    ),
    p{t} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, label) AS rn
            FROM c{t}) WHERE rn = 1
    ),
    l{next} AS (
        SELECT n.node, COALESCE(p.label, l.label) AS label
        FROM nodes n
        JOIN l{t} l ON l.node = n.node
        LEFT JOIN p{t} p ON p.node = n.node
    )
"""
_LP_ORACLE = (
    f"""
    WITH de AS ({_LP_EDGES}),
    e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS label FROM nodes),
    """
    + ",".join(
        _LP_ITER.format(t=i, next=i + 1) for i in range(LABELPROP_ROUNDS)
    )
    + f"""
    SELECT node, label FROM l{LABELPROP_ROUNDS} ORDER BY node
    """
)


@register("graph_label_propagation", oracle=_LP_ORACLE, tags=("J1", "A1", "W1"))
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan et
    al. 2007) over the undirected nation trade graph: every node starts
    as its own label; each round it adopts the most frequent label among
    its neighbors (ties -> smallest label, making the algorithm fully
    deterministic — the usual random tie-break is what the unrolled SQL
    oracle could never mirror).  LABELPROP_ROUNDS fixed rounds, so the
    loop unrolls into per-round (count, argmax, relabel) CTE triples like
    the PageRank and BPE oracles.

    The per-round plan is one join (labels x edges) + one grouped count +
    one ranking window — integer-only, no float accumulates anywhere.
    At 100 TB: pre-partition edges by src and localCheckpoint the label
    frame every few rounds (the PageRank loop-invariant treatment);
    rounds are bounded, label state is one row per node.
    """
    li = datasets.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = datasets.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supp = datasets.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = datasets.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = datasets.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    de = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "src")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "dst")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # symmetrize once, reuse across every round (localCheckpoint: the edge
    # frame feeds all LABELPROP_ROUNDS joins plus the node set)
    e = de.unionByName(
        de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(LABELPROP_ROUNDS):
        cnt = (
            e.join(labels, e.src == labels.node)
            .groupBy(F.col("dst").alias("nnode"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("nnode").orderBy(
            F.desc("cnt"), F.asc("label")
        )
        pick = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("nnode").alias("node"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
    return labels.orderBy("node")
