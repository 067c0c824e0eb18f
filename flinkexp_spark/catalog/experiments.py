"""Experimentation & applied-statistics operators (round 6): CUPED
variance reduction, Kaplan-Meier survival, item co-occurrence lift, and
seasonal decomposition.

These round out the statistics family (stat_chi_square, stat_ks_test,
stat_psi_drift, stats_correlation_matrix) with the four analyses an
experimentation/growth team runs weekly: pre-period covariate adjustment
of an A/B metric, retention/churn survival curves, market-basket lift,
and a seasonality profile with a robust residual scale.

House determinism conventions (see catalog/_util.py, data_profiling.py):
every statistic is assembled from EXACT BIGINT moments over integer-
scaled inputs (cents), and each floating-point output is one shared SQL
expression string evaluated via ``F.expr`` on the Spark side — the
expression tree cannot drift from the oracle's, so ``round(..., k)``
hashes stably across engines.

Scale notes (100 TB):

* CUPED is two aggregates (per-user, then moments) — the per-user rollup
  is the only real shuffle; the moment frames are 1 row and |variants|
  rows, combined with broadcast cross joins.
* Kaplan-Meier groups billions of users down to |distinct durations|
  rows (bounded by the observation span in days); the cumulative-hazard
  window runs over THAT tiny frame, so the unpartitioned window is a
  non-issue (same shape as data_profiling's moment frame).
* Item-lift explodes each basket into O(k^2) pairs — bounded by the max
  basket size (7 lines in TPC-H; cap or sample mega-baskets in the
  wild), then it is a word count over pair keys plus two broadcast-able
  dimension joins and a global top-k.
* Seasonal decompose is two passes over the fact (hour histogram, then
  residuals against the broadcast 24-row profile).  The BIGINT
  |cents*n - s| residual moment is bounded by max_cents * n_h^2
  (~5e4 cents here), crossing 2^63 near n_h ~ 4e6 rows per hour bucket
  (~1e8 events total, sf~100); past that, compute the residual moment
  in DOUBLE and round, or tighten the deviation to |cents - s/n| cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register

_CUTOFF = "TIMESTAMP '2024-01-15 00:00:00'"
_CENSOR = "TIMESTAMP '2024-01-24 00:00:00'"
_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"

# CUPED: theta = cov(pre, post) / var(pre), from pooled exact moments.
_THETA = (
    "((CAST(n AS DOUBLE) * CAST(x_pp AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(ss_pre AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) * CAST(s_pre AS DOUBLE)))"
)
_MEAN_POST = "round(CAST(sv_post AS DOUBLE) / CAST(nv AS DOUBLE), 4)"
_MEAN_ADJ = (
    "round(CAST(sv_post AS DOUBLE) / CAST(nv AS DOUBLE)"
    f" - {_THETA} * (CAST(sv_pre AS DOUBLE) / CAST(nv AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) / CAST(n AS DOUBLE)), 4)"
)
# fraction of metric variance the covariate removes: rho^2(pre, post)
_VAR_REDUCTION = (
    "round((CAST(n AS DOUBLE) * CAST(x_pp AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(x_pp AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))"
    " / ((CAST(n AS DOUBLE) * CAST(ss_pre AS DOUBLE)"
    " - CAST(s_pre AS DOUBLE) * CAST(s_pre AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(ss_post AS DOUBLE)"
    " - CAST(s_post AS DOUBLE) * CAST(s_post AS DOUBLE))), 6)"
)


@register(
    "stat_cuped_adjustment",
    oracle=f"""
        WITH u AS (
            SELECT user_id, user_id % 2 AS variant,
                   CAST(SUM(CASE WHEN ts < {_CUTOFF}
                                 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS pre,
                   CAST(SUM(CASE WHEN ts >= {_CUTOFF}
                                 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS post
            FROM events GROUP BY user_id),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(pre) AS BIGINT) AS s_pre,
                   CAST(SUM(post) AS BIGINT) AS s_post,
                   CAST(SUM(pre * pre) AS BIGINT) AS ss_pre,
                   CAST(SUM(post * post) AS BIGINT) AS ss_post,
                   CAST(SUM(pre * post) AS BIGINT) AS x_pp
            FROM u),
        v AS (
            SELECT variant, CAST(count(*) AS BIGINT) AS nv,
                   CAST(SUM(pre) AS BIGINT) AS sv_pre,
                   CAST(SUM(post) AS BIGINT) AS sv_post
            FROM u GROUP BY variant)
        SELECT variant, nv AS n_users,
               {_MEAN_POST} AS mean_post_cents,
               {_MEAN_ADJ} AS mean_adj_cents,
               round({_THETA}, 6) AS theta,
               {_VAR_REDUCTION} AS var_reduction
        FROM v CROSS JOIN m
        ORDER BY variant
    """,
    tags=("A5", "A2"),
)
def q_stat_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B means: the pre-experiment metric is the control
    covariate, theta = cov(pre, post)/var(pre) is fit on pooled exact
    BIGINT moments, and each variant's post-period mean is shifted by
    -theta * (variant pre-mean - global pre-mean).

    Plan: one per-user rollup (the only large shuffle), one 1-row global
    moment aggregate and one |variants|-row aggregate over it, combined
    by broadcast cross join — the textbook two-pass CUPED at any scale.
    """
    cutoff = F.expr(_CUTOFF)
    cents = F.expr(_CENTS)
    u = (
        datasets.load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0)).alias(
                "pre"
            ),
            F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0)).alias(
                "post"
            ),
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("s_pre"),
        F.sum("post").alias("s_post"),
        F.sum(F.col("pre") * F.col("pre")).alias("ss_pre"),
        F.sum(F.col("post") * F.col("post")).alias("ss_post"),
        F.sum(F.col("pre") * F.col("post")).alias("x_pp"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("pre").alias("sv_pre"),
        F.sum("post").alias("sv_post"),
    )
    return (
        v.crossJoin(F.broadcast(m))
        .select(
            "variant",
            F.col("nv").alias("n_users"),
            F.expr(_MEAN_POST).alias("mean_post_cents"),
            F.expr(_MEAN_ADJ).alias("mean_adj_cents"),
            F.expr(f"round({_THETA}, 6)").alias("theta"),
            F.expr(_VAR_REDUCTION).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# KM hazard term: ln(1 - d/n), guarded so the (only-possible-terminal)
# d = n_risk row yields survival exactly 0 instead of ln(0).
_KM = (
    "CASE WHEN d_events = n_risk THEN 0.0"
    " ELSE round(exp(SUM(CASE WHEN d_events < n_risk"
    " THEN ln(1.0 - CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))"
    " ELSE 0.0 END) OVER (ORDER BY t_hours)), 6) END"
)
# time-to-event: first purchase >= $100; censor at the user's last event
_CONV = (
    "CASE WHEN event_type = 'purchase' AND value >= 100.0 THEN ts END"
)


@register(
    "survival_kaplan_meier",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   -- elapsed whole hours over SECOND boundaries: matches
                   -- Spark's unix_timestamp (truncate-to-second) delta;
                   -- date_diff('hour', ...) would count hour BOUNDARIES
                   CAST(floor(date_diff('second', min(ts),
                              coalesce(min({_CONV}), max(ts))) / 3600.0)
                        AS BIGINT) AS t_hours,
                   CASE WHEN min({_CONV}) IS NOT NULL THEN 1 ELSE 0 END
                       AS observed
            FROM events GROUP BY user_id),
        g AS (
            SELECT t_hours, CAST(count(*) AS BIGINT) AS c,
                   CAST(SUM(observed) AS BIGINT) AS d_events
            FROM u GROUP BY t_hours),
        r AS (
            SELECT t_hours, d_events,
                   CAST(SUM(c) OVER (ORDER BY t_hours
                        ROWS BETWEEN CURRENT ROW
                        AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
            FROM g)
        SELECT t_hours, n_risk, d_events, {_KM} AS km_survival
        FROM r ORDER BY t_hours
    """,
    tags=("A1", "W3"),
)
def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: a user's duration is the hours
    from their first event to their first large purchase (value >= 100);
    users who never convert are right-CENSORED at their last-seen time
    (observed = 0, ~20% of users at every SF).
    S(t) = prod_{t' <= t} (1 - d_t'/n_t'), computed as exp of a running
    sum of log-hazards, with the only-possible-terminal d = n_risk row
    pinned to exactly 0 (ln(0) differs across engines).

    n_risk is a SUFFIX sum of the duration histogram (users still
    unconverted and uncensored at t) — no separate total pass.  Billions
    of users collapse to |distinct durations| rows (bounded by the
    observation span in hours) before any window runs, so the
    unpartitioned windows operate on a calendar-bounded frame.
    """
    conv = F.expr(_CONV)
    u = (
        datasets.load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                (
                    F.unix_timestamp(
                        F.coalesce(F.min(conv), F.max("ts"))
                    )
                    - F.unix_timestamp(F.min("ts"))
                )
                / 3600
            )
            .cast("long")
            .alias("t_hours"),
            F.when(F.min(conv).isNotNull(), 1).otherwise(0).alias(
                "observed"
            ),
        )
    )
    g = u.groupBy("t_hours").agg(
        F.count(F.lit(1)).alias("c"), F.sum("observed").alias("d_events")
    )
    suffix = Window.orderBy("t_hours").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = g.select(
        "t_hours",
        "d_events",
        F.sum("c").over(suffix).alias("n_risk"),
    )
    return r.select(
        "t_hours", "n_risk", "d_events", F.expr(_KM).alias("km_survival")
    ).orderBy("t_hours")


_LIFT = (
    "round(CAST(pair_n AS DOUBLE) * CAST(n_orders AS DOUBLE)"
    " / (CAST(item_a AS DOUBLE) * CAST(item_b AS DOUBLE)), 6)"
)


@register(
    "recsys_item_lift",
    oracle=f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
              FROM lineitem),
        item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_n
                 FROM b GROUP BY l_partkey),
        pair AS (
            SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS pair_n
            FROM b x JOIN b y
              ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey
            GROUP BY x.l_partkey, y.l_partkey
            HAVING count(*) >= 2)
        SELECT part_a, part_b, pair_n, {_LIFT} AS lift
        FROM (SELECT part_a, part_b, pair_n,
                     ia.item_n AS item_a, ib.item_n AS item_b, n_orders
              FROM pair
              JOIN item ia ON part_a = ia.l_partkey
              JOIN item ib ON part_b = ib.l_partkey
              CROSS JOIN n)
        ORDER BY pair_n DESC, part_a, part_b
        LIMIT 100
    """,
    tags=("J5", "A1", "O2"),
)
def q_recsys_item_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket item-to-item lift: for parts co-ordered in the same
    order, lift = P(a,b) / (P(a) P(b)) = pair_n * n_orders /
    (item_n_a * item_n_b); top-100 pairs by support with a deterministic
    (support desc, key, key) order.

    The pair expansion is the basket self-join bounded by basket size
    (<= 7 lines here — cap mega-baskets in the wild); after that it is a
    word count over pair keys plus two joins against the part-frequency
    dim (broadcast-able: |parts| << |pairs|) and a global top-k.
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    # the basket set feeds FOUR consumers (both self-join sides, the
    # item-frequency dim, the basket total); materialize it once,
    # pre-partitioned on the self-join key so the pair expansion is
    # co-located (localCheckpoint preserves physical partitioning —
    # same recipe as the triangle count, catalog/patterns.py)
    b = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .repartition(F.col("l_orderkey"))
        .localCheckpoint()
    )
    n = b.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("item_n"))
    x, y = b.alias("x"), b.alias("y")
    pair = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    enriched = (
        pair.join(
            F.broadcast(item.withColumnsRenamed({"item_n": "item_a"})),
            pair.part_a == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            F.broadcast(item.withColumnsRenamed({"item_n": "item_b"})),
            F.col("part_b") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .crossJoin(F.broadcast(n))
    )
    return (
        enriched.select(
            "part_a", "part_b", "pair_n", F.expr(_LIFT).alias("lift")
        )
        .orderBy(F.desc("pair_n"), "part_a", "part_b")
        .limit(100)
    )


_MEAN_H = "round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4)"
_SEASONAL = (
    "round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    " - CAST(tot_s AS DOUBLE) / CAST(tot_n AS DOUBLE), 4)"
)
# mean |x - mean| with no intermediate float: sum|cents*n - s| / n^2
_MAD_H = (
    "round(CAST(abs_dev AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4)"
)


@register(
    "timeseries_seasonal_decompose",
    oracle=f"""
        WITH e AS (
            SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
                   {_CENTS} AS cents
            FROM events),
        h AS (
            SELECT hod, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s
            FROM e GROUP BY hod),
        t AS (
            SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
                   CAST(SUM(s) AS BIGINT) AS tot_s
            FROM h),
        r AS (
            SELECT e.hod,
                   CAST(SUM(ABS(e.cents * h.n - h.s)) AS BIGINT) AS abs_dev
            FROM e JOIN h ON e.hod = h.hod GROUP BY e.hod)
        SELECT h.hod AS hod, n, {_MEAN_H} AS mean_cents,
               {_SEASONAL} AS seasonal_cents,
               {_MAD_H} AS mean_abs_dev_cents
        FROM h JOIN r ON h.hod = r.hod CROSS JOIN t
        ORDER BY h.hod
    """,
    tags=("A1", "A5", "F3"),
)
def q_timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-of-day seasonal profile of event value: per-hour mean, its
    deviation from the global mean (the additive seasonal component), and
    a mean-absolute-deviation residual scale — all from exact BIGINT
    moments (the residual moment is sum|cents*n - s|, which avoids ever
    materializing a float mean inside an aggregate).

    Two passes over the fact: the 24-row hour histogram, then residuals
    against that profile re-joined BROADCAST.  Both shuffles collapse to
    24 groups with map-side partials.
    """
    ev = datasets.load(spark, sf_dir, "events").select(
        F.hour("ts").cast("int").alias("hod"),
        F.expr(_CENTS).alias("cents"),
    )
    h = ev.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    t = h.agg(
        F.sum("n").alias("tot_n"), F.sum("s").alias("tot_s")
    )
    r = (
        ev.join(F.broadcast(h), "hod")
        .groupBy("hod")
        .agg(
            F.sum(F.abs(F.col("cents") * F.col("n") - F.col("s"))).alias(
                "abs_dev"
            )
        )
    )
    return (
        h.join(r, "hod")
        .crossJoin(F.broadcast(t))
        .select(
            "hod",
            "n",
            F.expr(_MEAN_H).alias("mean_cents"),
            F.expr(_SEASONAL).alias("seasonal_cents"),
            F.expr(_MAD_H).alias("mean_abs_dev_cents"),
        )
        .orderBy("hod")
    )


# RFM quintile boundaries (20/40/60/80th percentiles) — rounded to 6
# digits on BOTH engines before any comparison, so interpolation noise
# cannot flip a boundary customer (house MAD convention).
_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def _score_sql(metric: str, prefix: str, invert: bool) -> str:
    """1..5 score from the four boundaries; invert=True gives 5 to the
    LOW end (recency: smaller = better)."""
    hits = " + ".join(
        f"(CASE WHEN {metric} > {prefix}{i} THEN 1 ELSE 0 END)"
        for i in range(1, 5)
    )
    return f"(1 + {hits})" if not invert else f"(5 - ({hits}))"


_SEG = (
    "concat(CAST(" + _score_sql("recency_days", "r", True) + " AS STRING), "
    "CAST(" + _score_sql("frequency", "f", False) + " AS STRING), "
    "CAST(" + _score_sql("monetary", "m", False) + " AS STRING))"
)


@register(
    "rfm_segmentation",
    oracle=f"""
        WITH base AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS monetary,
                   max(o_orderdate) AS last_order
            FROM orders GROUP BY o_custkey),
        anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
        m AS (
            SELECT o_custkey, frequency, monetary,
                   CAST(floor(date_diff('second', last_order, maxd)
                              / 86400.0) AS BIGINT) AS recency_days
            FROM base CROSS JOIN anchor),
        b AS (
            SELECT
                {", ".join(
                    f"round(quantile_cont(recency_days, {q}), 6) AS r{i+1}, "
                    f"round(quantile_cont(frequency, {q}), 6) AS f{i+1}, "
                    f"round(quantile_cont(monetary, {q}), 6) AS m{i+1}"
                    for i, q in enumerate(_RFM_QS)
                )}
            FROM m)
        SELECT {_SEG} AS segment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_monetary
        FROM m CROSS JOIN b
        GROUP BY segment
        ORDER BY segment
    """,
    tags=("A1", "A6", "W1"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order at the
    corpus anchor), frequency (order count), monetary (exact-decimal
    spend) scored into 1-5 quintiles each, customers grouped by the
    3-digit segment code.

    Scale shape: NO ntile over a global window (the single-partition
    trap) — the per-customer rollup is the only big shuffle; the twelve
    quintile boundaries come from ONE percentile aggregate (a 1-row
    frame broadcast back), and scoring is four comparisons per metric
    against rounded constants.  Boundaries round to 6 digits on both
    engines BEFORE comparison so a boundary-sitting customer cannot
    flip sides.
    """
    orders = datasets.load(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
        F.max("o_orderdate").alias("last_order"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    # the metric frame feeds BOTH the boundary aggregate and the scoring
    # pass — materialize the per-customer rollup once (triangle-count
    # recipe) instead of re-running the orders shuffle per consumer
    m = (
        base.crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            "frequency",
            "monetary",
            F.floor(
                (
                    F.unix_timestamp("maxd")
                    - F.unix_timestamp("last_order")
                )
                / 86400.0
            )
            .cast("long")
            .alias("recency_days"),
        )
        .localCheckpoint()
    )
    b = m.agg(
        *[
            F.round(F.percentile(col, F.lit(q)), 6).alias(f"{p}{i+1}")
            for i, q in enumerate(_RFM_QS)
            for col, p in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary", "m"),
            )
        ]
    )
    return (
        m.crossJoin(F.broadcast(b))
        .groupBy(F.expr(_SEG).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_monetary"),
        )
        .orderBy("segment")
    )


# Forecast backtest: OLS daily trend fit on the first 24 days, scored on
# the last 6 against a seasonal-naive (same-weekday, lag-7) baseline.
_SLOPE = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_INTERCEPT = (
    f"((CAST(sy AS DOUBLE) - {_SLOPE} * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE))"
)
# per-day absolute error of the trend forecast, rounded BEFORE the sum so
# the (order-dependent) float summation never happens — the rounded
# errors sum exactly as DECIMAL(18,4)
_ERR_TREND = (
    "CAST(round(abs(CAST(cents AS DOUBLE)"
    f" - ({_INTERCEPT} + {_SLOPE} * CAST(d AS DOUBLE))), 4)"
    " AS DECIMAL(18,4))"
)
_TRAIN_DAYS = 24


@register(
    "timeseries_forecast_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT date_diff('day', DATE '2024-01-01',
                             CAST(ts AS DATE)) AS d,
                   CAST(SUM({_CENTS}) AS BIGINT) AS cents
            FROM events GROUP BY d),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS sx,
                   CAST(SUM(cents) AS BIGINT) AS sy,
                   CAST(SUM(d * d) AS BIGINT) AS sxx,
                   CAST(SUM(d * cents) AS BIGINT) AS sxy
            FROM daily WHERE d < {_TRAIN_DAYS}),
        test AS (
            SELECT t.d, t.cents, b.cents AS cents_lag7
            FROM daily t JOIN daily b ON b.d = t.d - 7
            WHERE t.d >= {_TRAIN_DAYS})
        SELECT CAST(n AS BIGINT) AS n_train,
               CAST(count(*) AS BIGINT) AS n_test,
               round({_SLOPE}, 6) AS slope_cents_per_day,
               round({_INTERCEPT}, 6) AS intercept_cents,
               round(CAST(SUM({_ERR_TREND}) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 4) AS mae_trend,
               round(CAST(SUM(abs(cents - cents_lag7)) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 4) AS mae_naive
        FROM test CROSS JOIN m
        GROUP BY n, sx, sy, sxx, sxy
    """,
    tags=("A5", "W2", "F3"),
)
def q_timeseries_forecast_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast backtest: fit a linear daily-revenue trend on the first
    24 days (exact-BIGINT OLS moments), score it on the 6 held-out days,
    and report MAE against the seasonal-naive lag-7 baseline — the
    one-row model-selection summary every forecasting pipeline starts
    from.

    Determinism: the only float reduction (summing per-day trend errors)
    is rounded per day and summed as DECIMAL, so no order-dependent
    double accumulation exists anywhere.  Scale: the day rollup is the
    single big shuffle; everything after runs on a |days| frame with the
    5-number moment row broadcast.
    """
    ev = datasets.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
        )
        .agg(F.sum(F.expr(_CENTS)).alias("cents"))
    )
    m = daily.filter(F.col("d") < _TRAIN_DAYS).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
        F.sum(F.col("d") * F.col("cents")).alias("sxy"),
    )
    lag = daily.select(
        (F.col("d") + 7).alias("d"), F.col("cents").alias("cents_lag7")
    )
    test = (
        daily.filter(F.col("d") >= _TRAIN_DAYS)
        .join(lag, "d")
        .crossJoin(F.broadcast(m))
    )
    return test.groupBy("n", "sx", "sy", "sxx", "sxy").agg(
        F.first("n").cast("long").alias("n_train"),
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.expr(_SLOPE), 6).alias("slope_cents_per_day"),
        F.round(F.expr(_INTERCEPT), 6).alias("intercept_cents"),
        F.round(
            F.sum(F.expr(_ERR_TREND)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("mae_trend"),
        F.round(
            F.sum(F.abs(F.col("cents") - F.col("cents_lag7"))).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("mae_naive"),
    ).drop("n", "sx", "sy", "sxx", "sxy")
