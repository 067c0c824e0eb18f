"""Dataset-profiling statistics: pairwise correlation matrix and a
Benford first-digit audit (round 5).

Rounds out the profiling family (profile_table, profile_entropy,
quality_anomaly_mad, stat_psi_drift ...) with the two screens a data-
quality team runs before training on a new corpus: which numeric columns
are redundant (|corr| ~ 1 => drop one), and whether a money-like column's
first-digit distribution is consistent with organic data (Benford's law —
the classic synthetic/fabricated-data tripwire).

Determinism follows the house A5 convention (catalog/aggregates.py OLS):
every moment is an exact BIGINT over integer-scaled inputs — map-side
combinable, order-independent — and the one floating-point expression per
output value is written identically on both engines, so round(...,6)
hashes stably.

Scale notes (100 TB): the correlation matrix is ONE aggregate over the
fact table producing a single 15-number row (4 sums, 4 sum-of-squares,
6 cross-products, 1 count) — partial aggregation does all the work
map-side and the shuffle carries one row per partition.  Adding columns
grows the state quadratically but the pass count stays 1.  The Benford
audit is a 9-group groupBy — same shape as any word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.operators.prefix_sum import running_sums
from flinkexp_spark.registry import register

# Integer scalings: quantity is integral 1..50, price in WHOLE DOLLARS
# (<= ~105k, squared 1.1e10 — cents would overflow sum-of-squares at
# sf10+), discount/tax in percent points 0..10.  Overflow bound: the
# largest moment is SUM(dollars^2) ~= 6e6*sf rows * 1.1e10 ~= 6.6e16*sf,
# which crosses BIGINT's 2^63 (~9.2e18) near sf~140 (and DuckDB would
# silently widen to HUGEINT while Spark ANSI errors — engine divergence,
# not just overflow).  For a >sf100 deployment, rescale dollars to tens
# of dollars (buys 100x headroom) or compute moments in DOUBLE and round
# before comparing; exact-integer moments are the point at gate scale.
_VARS = ("qty", "dollars", "disc_pct", "tax_pct")
_PAIRS = tuple(
    (_VARS[i], _VARS[j])
    for i in range(len(_VARS))
    for j in range(i + 1, len(_VARS))
)

_MOMENT_SQL = """
        SELECT count(*) AS n,
               SUM(qty) AS s_qty, SUM(dollars) AS s_dollars,
               SUM(disc_pct) AS s_disc_pct, SUM(tax_pct) AS s_tax_pct,
               SUM(qty * qty) AS ss_qty, SUM(dollars * dollars) AS ss_dollars,
               SUM(disc_pct * disc_pct) AS ss_disc_pct,
               SUM(tax_pct * tax_pct) AS ss_tax_pct,
               SUM(qty * dollars) AS x_qty_dollars,
               SUM(qty * disc_pct) AS x_qty_disc_pct,
               SUM(qty * tax_pct) AS x_qty_tax_pct,
               SUM(dollars * disc_pct) AS x_dollars_disc_pct,
               SUM(dollars * tax_pct) AS x_dollars_tax_pct,
               SUM(disc_pct * tax_pct) AS x_disc_pct_tax_pct
        FROM (SELECT CAST(round(l_quantity, 0) AS BIGINT) AS qty,
                     CAST(floor(l_extendedprice) AS BIGINT) AS dollars,
                     CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
                     CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_pct
              FROM lineitem)
"""


def _corr_expr_sql(a: str, b: str) -> str:
    """The shared corr formula over exact moments — identical expression
    tree on both engines so the IEEE result is bit-identical."""
    return (
        f"round((CAST(n AS DOUBLE) * CAST(x_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / (sqrt(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * sqrt(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
    )


@register(
    "stats_correlation_matrix",
    oracle="WITH m AS (" + _MOMENT_SQL + ")\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, "
        f"{_corr_expr_sql(a, b)} AS corr FROM m"
        for a, b in _PAIRS
    )
    + "\nORDER BY col_a, col_b",
    tags=("A5", "A2"),
)
def q_stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of lineitem's numeric measures, from
    one exact-moment aggregate pass.

    Spark's built-in ``corr`` accumulates running doubles whose partial-
    aggregation order varies run to run; here all 15 moments are exact
    BIGINTs from ONE groupBy-less aggregate (map-side partials ship a
    single row), and each pair's correlation is one deterministic double
    expression over them.  The 6 output rows are built by cross-joining
    the 1-row moment frame with a literal pair list — no second scan.
    """
    li = datasets.load(spark, sf_dir, "lineitem")
    ints = li.select(
        F.round("l_quantity", 0).cast("long").alias("qty"),
        F.floor("l_extendedprice").cast("long").alias("dollars"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_pct"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax_pct"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(v).alias(f"s_{v}") for v in _VARS]
    aggs += [F.sum(F.col(v) * F.col(v)).alias(f"ss_{v}") for v in _VARS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).alias(f"x_{a}_{b}") for a, b in _PAIRS
    ]
    m = ints.agg(*aggs)

    rows = [
        m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            "n",
            F.expr(_corr_expr_sql(a, b)).alias("corr"),
        )
        for a, b in _PAIRS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("col_a", "col_b")


@register(
    "quality_benford_audit",
    oracle="""
        WITH d AS (
            SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS INTEGER)
                       AS digit
            FROM orders WHERE o_totalprice > 0),
        g AS (
            SELECT digit, count(*) AS n,
                   SUM(count(*)) OVER () AS total
            FROM d GROUP BY digit)
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
               round(log10(1.0 + 1.0 / digit), 6) AS benford,
               round(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                         - log10(1.0 + 1.0 / digit)), 6) AS deviation
        FROM g ORDER BY digit
    """,
    tags=("A1", "F2"),
)
def q_quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals: observed
    digit share vs the Benford expectation log10(1 + 1/d), with absolute
    deviation per digit.  Large deviations on money-like columns flag
    synthetic, truncated, or threshold-gamed data before it trains a model.

    One 9-group aggregate plus a scalar total (window over the 9-row
    frame) — counts are exact; the three doubles are each a single shared
    expression over exact integers.
    """
    orders = datasets.load(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") > 0).select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("int")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    g = g.withColumn("total", F.sum("n").over(Window.partitionBy()))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return g.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(benford, 6).alias("benford"),
        F.round(F.abs(share - benford), 6).alias("deviation"),
    ).orderBy("digit")


_KS_A, _KS_B = "click", "view"  # the two samples under comparison


@register(
    "stat_ks_test",
    oracle=f"""
        WITH s AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS ga
            FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
        n AS (
            SELECT CAST(SUM(ga) AS BIGINT) AS n1,
                   CAST(COUNT(*) - SUM(ga) AS BIGINT) AS n2
            FROM s),
        d AS (
            SELECT v, CAST(SUM(ga) AS BIGINT) AS c1,
                   CAST(COUNT(*) - SUM(ga) AS BIGINT) AS c2
            FROM s GROUP BY v),
        c AS (
            SELECT v,
                   CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2
            FROM d)
        SELECT n1, n2,
               CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS max_scaled,
               CAST(FLOOR(MAX(ABS(f1 * n2 - f2 * n1)) * 1000000.0
                          / (n1 * n2)) AS BIGINT) AS d_x1e6
        FROM c CROSS JOIN n GROUP BY n1, n2
    """,
    tags=("A2", "W3"),
)
def q_stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the click and view
    value distributions — the drift test that catches SHAPE changes PSI's
    fixed bins miss (complement of stat_psi_drift).

    D = max_v |F1(v) - F2(v)| computed entirely in integers: per distinct
    value, cumulative counts of each sample; the sup statistic is
    max |f1*n2 - f2*n1| over the common denominator n1*n2, floored to
    micro-units only at the very end — bit-identical across engines, no
    float CDFs.  One shuffle to the per-value histogram (cardinality of
    the value domain, not the row count), then the running CDFs come from
    the engine's DISTRIBUTED prefix sum (operators/prefix_sum.py: range
    partition -> parallel within-partition scan -> broadcast offsets) —
    no single-partition global window anywhere in the plan, so the CDF
    pass survives an unbounded value domain as long as the histogram
    shuffles.  (The oracle keeps the plain windowed CDF — same numbers.)
    """
    s = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
            F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("ga"),
        )
    )
    n = s.agg(
        F.sum("ga").cast("long").alias("n1"),
        (F.count("*") - F.sum("ga")).cast("long").alias("n2"),
    )
    d = s.groupBy("v").agg(
        F.sum("ga").cast("long").alias("c1"),
        (F.count("*") - F.sum("ga")).cast("long").alias("c2"),
    )
    c = running_sums(d, "v", ["c1", "c2"], prefix="f").select(
        "v", F.col("fc1").alias("f1"), F.col("fc2").alias("f2")
    )
    scaled = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(F.max(scaled).cast("long").alias("max_scaled"))
        .select(
            "n1",
            "n2",
            "max_scaled",
            F.floor(F.col("max_scaled") * 1000000.0 / (F.col("n1") * F.col("n2")))
            .cast("long")
            .alias("d_x1e6"),
        )
    )


@register(
    "stat_mann_whitney",
    oracle=f"""
        WITH s AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS ga
            FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
        d AS (
            SELECT v, CAST(SUM(ga) AS BIGINT) AS c1,
                   CAST(COUNT(*) - SUM(ga) AS BIGINT) AS c2,
                   CAST(COUNT(*) AS BIGINT) AS t
            FROM s GROUP BY v),
        c AS (
            SELECT v, c1, c2, t,
                   CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) AS ft
            FROM d),
        m AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(SUM(c1 * (2 * (ft - t) + t + 1)) AS BIGINT) AS r1_x2,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tiesum
            FROM c)
        SELECT n1, n2,
               CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
               CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT)
                   AS u2_x2,
               tiesum,
               CAST(FLOOR(
                   ((r1_x2 - n1 * (n1 + 1)) - n1 * n2) * 1000000.0
                   / (2.0 * SQRT(
                       n1 * n2 / 12.0
                       * ((n1 + n2 + 1)
                          - tiesum / ((n1 + n2) * (n1 + n2 - 1.0)))))
               ) AS BIGINT) AS z_x1e6
        FROM m
    """,
    tags=("A2", "W3"),
)
def q_stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test between the
    click and view value distributions — the LOCATION-shift drift test
    rounding out the family (chi2 = categorical, PSI = fixed bins,
    KS = shape, MWU = median shift under no distributional assumption).

    Exact-integer discipline: with midranks doubled (2x) every quantity
    stays integral — for a tie group of size t whose preceding cumulative
    count is s, each member's doubled midrank is 2s + t + 1, so the
    doubled rank-sum R1_x2 = sum(c1 * (2s + t + 1)) and the doubled
    statistic U1_x2 = R1_x2 - n1(n1+1) are exact BIGINTs, as is the tie
    correction sum(t^3 - t).  The single float expression (the
    tie-corrected normal z in micro-units) is written identically on
    both engines.  Overflow bound: U1_x2 <= 2*n1*n2 crosses 2^63 near
    N ~ 2e9 rows per side; tiesum <= sum(t^3) stays far below it while
    the value domain (price cents) keeps tie groups << N^(1/3) * 2e6.

    Plan shape (the 100 TB story): one shuffle to the per-value
    histogram (domain cardinality, not row count), then the cumulative
    counts come from the engine's DISTRIBUTED prefix sum
    (operators/prefix_sum.py) — no single-partition global window; the
    final reduce is a one-row aggregate.
    """
    s = (
        datasets.load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
            F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("ga"),
        )
    )
    d = s.groupBy("v").agg(
        F.sum("ga").cast("long").alias("c1"),
        (F.count("*") - F.sum("ga")).cast("long").alias("c2"),
        F.count("*").cast("long").alias("t"),
    )
    c = running_sums(d, "v", ["t"], prefix="f").withColumnRenamed("ft", "ft_")
    m = c.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * (F.col("ft_") - F.col("t")) + F.col("t") + 1)
        )
        .cast("long")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tiesum"),
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    nn = F.col("n1") + F.col("n2")
    var = (
        F.col("n1")
        * F.col("n2")
        / F.lit(12.0)
        * ((nn + 1) - F.col("tiesum") / (nn * (nn - F.lit(1.0))))
    )
    return m.select(
        "n1",
        "n2",
        u1.cast("long").alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1).cast("long").alias("u2_x2"),
        "tiesum",
        F.floor(
            (u1 - F.col("n1") * F.col("n2")) * 1000000.0
            / (F.lit(2.0) * F.sqrt(var))
        )
        .cast("long")
        .alias("z_x1e6"),
    )


@register(
    "stat_kruskal_wallis",
    oracle="""
        WITH s AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
                   event_type AS grp
            FROM events),
        d AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v),
        c AS (
            SELECT v, t, CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) AS ft
            FROM d),
        cg AS (
            SELECT v, grp, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM s GROUP BY v, grp),
        r AS (
            SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_g,
                   CAST(SUM(cnt * (2 * (ft - t) + t + 1)) AS BIGINT)
                       AS rsum_x2
            FROM cg JOIN c USING (v) GROUP BY grp),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tiesum
            FROM d),
        o AS (
            SELECT grp, n_g, rsum_x2,
                   SUM(CAST(rsum_x2 AS DOUBLE) * CAST(rsum_x2 AS DOUBLE)
                       / (4.0 * n_g))
                       OVER (ORDER BY grp
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
            FROM r),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k, max_by(cum, grp) AS s
            FROM o),
        h AS (
            SELECT k, n, tiesum,
                   12.0 * s / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)
                       AS hstat
            FROM agg, tot)
        SELECT o.grp, o.n_g, o.rsum_x2, h.k, h.n, h.tiesum,
               CAST(FLOOR(h.hstat * 1000000.0) AS BIGINT) AS h_x1e6,
               CAST(FLOOR(h.hstat
                          / (1.0 - h.tiesum
                             / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n))
                          * 1000000.0) AS BIGINT) AS h_tie_x1e6
        FROM o, h
        ORDER BY o.grp
    """,
    tags=("A2", "W3"),
)
def q_stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across ALL event-type value distributions —
    the k-group generalization completing the rank-stats family (MWU =
    two-sample location, KS = two-sample shape, chi2/PSI = categorical;
    KW = k-sample location by rank, the nonparametric one-way ANOVA).

    Exact-integer discipline (the r12 Mann-Whitney scheme extended): with
    midranks doubled, each tie group of size t at cumulative offset s
    contributes doubled midrank 2s + t + 1, so every per-group doubled
    rank sum rsum_x2 is an exact BIGINT (hash-checked per group).  The
    quadratic term sum(R_j^2 / n_j) = sum(rsum_x2^2 / (4 n_j)) must leave
    integers (rsum_x2^2 ~ 4 N^4 crosses 2^63 near N ~ 40k rows), so it is
    computed in DOUBLE — and because float addition does not commute
    across k group terms, BOTH engines fold the terms in the SAME
    explicit order: a cumulative window ordered by group name, taking the
    last partial sum (max_by over a k-row frame, k = 5 event types).  The
    remaining float expressions (H and its tie correction) are written
    token-identically on both engines; outputs land in floor-microunits.

    Plan shape (the 100 TB story): one shuffle to the per-value histogram
    (domain cardinality, not row count), the DISTRIBUTED prefix sum of
    operators/prefix_sum.py for cumulative ranks (no single-partition
    global window over data-sized input), one shuffle for the per-(value,
    group) counts, then everything downstream of ``r`` is k rows.
    """
    s = datasets.load(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.col("event_type").alias("grp"),
    )
    # ONE scan (guide §2.3): the (value, group) contingency table is the
    # finest aggregate; the per-value histogram d folds out of it (sum of
    # the k group counts per v == count per v), so events is read and
    # rounded once.  cg is domain-sized (|values| x k) and feeds two
    # consumers — the d branch and the rank join — whose identical
    # aggregate subtrees share ONE shuffle via ReusedExchange; the r14
    # localCheckpoint here blocked and materialized on every cold run and
    # cost more than it saved (VERDICT r14 #2: 1.18 -> 2.37 s).
    cg = s.groupBy("v", "grp").agg(F.count("*").cast("long").alias("cnt"))
    d = cg.groupBy("v").agg(F.sum("cnt").cast("long").alias("t"))
    c = running_sums(d, "v", ["t"], prefix="f")
    r = (
        cg.join(c, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(
                F.col("cnt")
                * (2 * (F.col("ft") - F.col("t")) + F.col("t") + 1)
            )
            .cast("long")
            .alias("rsum_x2"),
        )
    )
    tot = d.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tiesum"),
    )
    # ordered fold of the k float terms (k = #event types, bounded): the
    # unpartitioned window frame is k rows, not data-sized
    w = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, 0)
    term = (
        F.col("rsum_x2").cast("double")
        * F.col("rsum_x2").cast("double")
        / (F.lit(4.0) * F.col("n_g"))
    )
    # k and s fold into a SECOND frame over the same k-row window (full
    # frame instead of running), so `o` is derived once: the r14 shape ran
    # a separate .agg() branch whose plan re-derived o -> r -> cg -> scan
    # (no ReusedExchange fires across the differently-pruned consumers).
    # max_by(cum, grp) over the full frame is the oracle's expression
    # verbatim; the window stays k rows, never data-sized.
    w_all = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = r.select(
        "grp",
        "n_g",
        "rsum_x2",
        F.sum(term).over(w).alias("cum"),
    ).select(
        "grp",
        "n_g",
        "rsum_x2",
        F.count("*").over(w_all).cast("long").alias("k"),
        F.max_by("cum", "grp").over(w_all).alias("s"),
    )
    withh = o.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_g",
        "rsum_x2",
        "k",
        "n",
        "tiesum",
        (
            F.lit(12.0) * F.col("s") / (F.col("n").cast("double") * (F.col("n") + 1))
            - F.lit(3.0) * (F.col("n") + 1)
        ).alias("hstat"),
    )
    return (
        withh.select(
            "grp",
            "n_g",
            "rsum_x2",
            "k",
            "n",
            "tiesum",
            F.floor(F.col("hstat") * 1000000.0).cast("long").alias("h_x1e6"),
            F.floor(
                F.col("hstat")
                / (
                    F.lit(1.0)
                    - F.col("tiesum")
                    / (
                        F.col("n").cast("double") * F.col("n") * F.col("n")
                        - F.col("n")
                    )
                )
                * 1000000.0
            )
            .cast("long")
            .alias("h_tie_x1e6"),
        )
        .orderBy("grp")
    )
