"""Feature-store operators: multi-horizon rolling features, point-in-time
training sets, and tolerance-bounded as-of joins (round 5).

These are the shapes a Feast/Tecton-style feature platform compiles down
to, and the reference's Table-API temporal-join envelope (study/pom.xml:
149-165) is the same contract expressed as Flink SQL.  The engine already
ships the J9 as-of core (operators/asof.py); this module adds the three
pipeline-level uses a training-data team actually runs:

* ``feature_rolling_multi_horizon`` — per-event rolling 1h/6h/24h
  activity features, STRICTLY PRIOR frames so the feature row never sees
  its own label event (leakage-free by construction).
* ``feature_pit_training_set`` — assemble (label, features) rows where
  every feature aggregates only orders placed BEFORE the label order —
  point-in-time correctness as a window frame, not a data-dependent join.
* ``join_asof_tolerance`` — backward as-of match with a staleness bound
  (the pandas ``merge_asof(tolerance=...)`` / feature-freshness contract).

Scale notes (100 TB): all three are single-shuffle window plans — one
exchange on the entity key, one ordered pass, O(1) carried state per row.
No self-joins, no explode; the multi-horizon query shares one sort across
its three frames (same partition+order spec), so adding horizons is free.
Integer math (cents / whole seconds / whole days) keeps every aggregate
map-side combinable and bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.operators.asof import asof_join
from flinkexp_spark.registry import register

_HORIZON_USERS = 60  # bound the fixture output; horizons are sf-invariant
_PIT_CUST = 400
_LABEL_CENTS = 20_000_000  # label = "order above $200k"
_TOL_S = 1800  # 30-minute click-attribution freshness bound


@register(
    "feature_rolling_multi_horizon",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE user_id < {_HORIZON_USERS})
        SELECT event_id, user_id,
               count(*) OVER w1h  AS f_cnt_1h,
               count(*) OVER w6h  AS f_cnt_6h,
               count(*) OVER w24h AS f_cnt_24h,
               CAST(COALESCE(SUM(cents) OVER w24h, 0) AS BIGINT)
                   AS f_cents_24h
        FROM e
        WINDOW
          w1h  AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
          w6h  AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 21600 PRECEDING AND 1 PRECEDING),
          w24h AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
        ORDER BY event_id
    """,
    tags=("W4", "W3", "A1"),
)
def q_feature_rolling_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon rolling features per event: 1h/6h/24h activity counts
    and the 24h spend sum, each over a STRICTLY PRIOR range frame
    (``RANGE ... 1 PRECEDING`` on epoch seconds) so the feature vector for
    an event never includes the event itself — the no-leakage invariant a
    training pipeline must hold.

    All three frames share one partition+order spec, so Spark plans a
    single exchange and a single sort; each extra horizon is just another
    frame evaluator over the same sorted run.  Range frames are value-based
    — same-second ties resolve identically on any engine, with no reliance
    on physical row order.
    """
    ev = datasets.load(spark, sf_dir, "events")
    e = ev.filter(F.col("user_id") < _HORIZON_USERS).select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def horizon(seconds: int):
        return (
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rangeBetween(-seconds, -1)
        )

    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(horizon(3600)).alias("f_cnt_1h"),
        F.count(F.lit(1)).over(horizon(21600)).alias("f_cnt_6h"),
        F.count(F.lit(1)).over(horizon(86400)).alias("f_cnt_24h"),
        F.coalesce(
            F.sum("cents").over(horizon(86400)), F.lit(0).cast("long")
        ).alias("f_cents_24h"),
    ).orderBy("event_id")


@register(
    "feature_pit_training_set",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   CAST(o_orderdate AS DATE) AS od,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders WHERE o_custkey < {_PIT_CUST}),
        f AS (
            SELECT o_orderkey, o_custkey, cents,
                   count(*) OVER wprior AS f_prior_cnt,
                   CAST(COALESCE(SUM(cents) OVER wprior, 0) AS BIGINT)
                       AS f_prior_cents,
                   CAST(date_diff('day',
                        lag(od) OVER (PARTITION BY o_custkey
                                      ORDER BY od, o_orderkey),
                        od) AS INTEGER) AS gap_days
            FROM o
            WINDOW wprior AS (PARTITION BY o_custkey
                              ORDER BY od, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING))
        SELECT f.o_orderkey, f.o_custkey,
               CAST(f.cents > {_LABEL_CENTS} AS INTEGER) AS label,
               f.f_prior_cnt, f.f_prior_cents,
               COALESCE(f.gap_days, -1) AS f_days_since_prev,
               c.c_mktsegment AS f_segment
        FROM f JOIN customer c ON c.c_custkey = f.o_custkey
        ORDER BY f.o_orderkey
    """,
    tags=("W3", "W2", "J6", "J9"),
)
def q_feature_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly: one row per label order,
    features aggregated over that customer's PRIOR orders only (rows frame
    ``UNBOUNDED PRECEDING .. 1 PRECEDING``), plus a broadcast dim feature.

    The PIT guarantee is structural — the frame bound IS the as-of cut, so
    no feature row can leak the label order or anything after it.  Versus
    the textbook formulation (a per-label-row as-of join against a feature
    snapshot table), this computes label and features from one sorted pass:
    one exchange on the entity key + one broadcast hash join for the dim.
    At 100 TB the plan is scan-bound; the window state per row is two
    running integers.
    """
    orders = datasets.load(spark, sf_dir, "orders")
    customer = datasets.load(spark, sf_dir, "customer")

    o = orders.filter(F.col("o_custkey") < _PIT_CUST).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    wprior = (
        Window.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wlag = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    f = o.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.count(F.lit(1)).over(wprior).alias("f_prior_cnt"),
        F.coalesce(F.sum("cents").over(wprior), F.lit(0).cast("long")).alias(
            "f_prior_cents"
        ),
        F.datediff(F.col("od"), F.lag("od").over(wlag)).alias("gap_days"),
    )
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
    return (
        f.join(dim, f["o_custkey"] == dim["c_custkey"])
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("cents") > _LABEL_CENTS).cast("int").alias("label"),
            "f_prior_cnt",
            "f_prior_cents",
            F.coalesce("gap_days", F.lit(-1)).alias("f_days_since_prev"),
            F.col("c_mktsegment").alias("f_segment"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_asof_tolerance",
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_id AS cid, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS csec
            FROM events WHERE event_type = 'click'),
        p AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS psec
            FROM events WHERE event_type = 'purchase'),
        u AS (
            SELECT user_id, CAST(NULL AS BIGINT) AS event_id,
                   CAST(NULL AS BIGINT) AS psec,
                   cid, csec, ts AS ots, 0 AS side
            FROM c
            UNION ALL
            SELECT user_id, event_id, psec,
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), ts, 1
            FROM p),
        m AS (
            SELECT *,
                   last_value(cid IGNORE NULLS) OVER w AS mcid,
                   last_value(csec IGNORE NULLS) OVER w AS mcsec
            FROM u
            WINDOW w AS (PARTITION BY user_id ORDER BY ots, side
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id,
               CASE WHEN psec - mcsec <= {_TOL_S} THEN mcid END
                   AS matched_click_id,
               CASE WHEN psec - mcsec <= {_TOL_S} THEN psec - mcsec END
                   AS staleness_s
        FROM m WHERE side = 1 ORDER BY event_id
    """,
    tags=("J9", "W2"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a freshness bound: each purchase matches the user's
    latest click at-or-before it, but only if the click is at most 30
    minutes old — older matches degrade to NULL (pandas
    ``merge_asof(tolerance=...)`` / feature-staleness semantics).

    Runs through the engine's J9 helper (operators/asof.py) with its
    ``tolerance_s`` bound: the union+window formulation costs one exchange
    and one ordered pass regardless of the bound, because staleness is a
    row-local predicate applied after the match — unlike a range join,
    which would materialize every (purchase x click-in-window) pair first.
    """
    ev = datasets.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cid"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        tolerance_s=_TOL_S,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("right_cid").alias("matched_click_id"),
        (
            F.col("ts").cast("long") - F.col("right_ts").cast("long")
        ).alias("staleness_s"),
    ).orderBy("event_id")


_TE_FOLDS = 5  # deterministic fold = event_id % K (no RNG, both engines agree)
_TE_SMOOTH = 20  # pseudo-count pulled toward the global prior


@register(
    "feature_target_encoding",
    oracle=f"""
        WITH e AS (
            SELECT user_id, CAST(event_id % {_TE_FOLDS} AS BIGINT) AS fold,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE user_id IS NOT NULL),
        g AS (
            SELECT CAST(FLOOR(CAST(SUM(cents) AS BIGINT) * 1.0 / COUNT(*))
                        AS BIGINT) AS prior_cents
            FROM e),
        pf AS (
            SELECT user_id, fold, CAST(COUNT(*) AS BIGINT) AS n_f,
                   CAST(SUM(cents) AS BIGINT) AS s_f
            FROM e GROUP BY user_id, fold),
        pu AS (
            SELECT *,
                   CAST(SUM(n_f) OVER (PARTITION BY user_id) AS BIGINT) AS n_u,
                   CAST(SUM(s_f) OVER (PARTITION BY user_id) AS BIGINT) AS s_u
            FROM pf)
        SELECT user_id, fold, n_f,
               CAST(FLOOR((s_u - s_f + {_TE_SMOOTH} * prior_cents) * 1000.0
                          / (n_u - n_f + {_TE_SMOOTH})) AS BIGINT)
                   AS enc_cents_x1000
        FROM pu CROSS JOIN g
        ORDER BY user_id, fold
    """,
    tags=("A1", "W3", "J6"),
)
def q_feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free K-fold target encoding of user_id against spend: the
    encoding served to fold f aggregates every OTHER fold's target plus a
    smoothing prior — the standard out-of-fold mean-target-encode recipe
    (a row never contributes to its own feature, the categorical-feature
    analog of the PIT rule above).

    Single shuffle on (user, fold), then the leave-fold-out sums come from
    a window over the same key's partials — no second pass over the raw
    events, no self-join.  The global prior is a one-row broadcast.  All
    arithmetic is exact integers (cents, permille floor), so both engines
    hash identically; at 100 TB the (user, fold) partial table is the only
    shuffled state and is |users| x K rows.
    """
    e = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            (F.col("event_id") % _TE_FOLDS).cast("long").alias("fold"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    prior = e.agg(
        F.floor(F.sum("cents") * 1.0 / F.count("*"))
        .cast("long")
        .alias("prior_cents")
    )
    pf = e.groupBy("user_id", "fold").agg(
        F.count("*").alias("n_f"), F.sum("cents").alias("s_f")
    )
    wu = Window.partitionBy("user_id")
    pu = pf.select(
        "*",
        F.sum("n_f").over(wu).alias("n_u"),
        F.sum("s_f").over(wu).alias("s_u"),
    )
    return (
        pu.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "fold",
            "n_f",
            F.floor(
                (
                    F.col("s_u")
                    - F.col("s_f")
                    + _TE_SMOOTH * F.col("prior_cents")
                )
                * 1000.0
                / (F.col("n_u") - F.col("n_f") + _TE_SMOOTH)
            )
            .cast("long")
            .alias("enc_cents_x1000"),
        )
        .orderBy("user_id", "fold")
    )
