"""Experimentation family: semantic invariants the DuckDB oracle cannot
express (it only proves Spark == SQL; these prove the STATISTICS are
self-consistent)."""

from __future__ import annotations

import re

from flinkexp_spark.registry import queries


def test_kaplan_meier_curve_is_a_survival_function(spark, sf_dir):
    rows = queries()["survival_kaplan_meier"](spark, sf_dir).collect()
    assert rows, "empty KM curve"
    last = 1.0
    total = rows[0].n_risk
    for r in rows:
        assert 0.0 <= r.km_survival <= 1.0
        assert r.km_survival <= last + 1e-9, "survival must be monotone"
        assert 0 <= r.d_events <= r.n_risk
        assert r.n_risk <= total, "risk set can only shrink"
        last, total = r.km_survival, r.n_risk
    assert rows[0].n_risk == sum(1 for _ in rows) or rows[0].n_risk >= len(
        rows
    ), "initial risk set must cover every distinct duration's users"


def test_cuped_preserves_the_pooled_mean_and_bounds_reduction(
    spark, sf_dir
):
    rows = queries()["stat_cuped_adjustment"](spark, sf_dir).collect()
    assert len(rows) == 2
    n = sum(r.n_users for r in rows)
    raw = sum(r.n_users * r.mean_post_cents for r in rows) / n
    adj = sum(r.n_users * r.mean_adj_cents for r in rows) / n
    # CUPED shifts variants against each other but cannot move the pooled
    # mean (the covariate is centered globally)
    assert abs(raw - adj) < 0.01
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0
        assert r.theta == rows[0].theta, "theta is pooled, not per-variant"


def test_rfm_segments_cover_every_customer_with_valid_codes(
    spark, sf_dir
):
    rows = queries()["rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert re.fullmatch(r"[1-5][1-5][1-5]", r.segment), r.segment
        assert r.n_customers > 0
    from flinkexp_spark import datasets
    import pyspark.sql.functions as F

    n_cust = (
        datasets.load(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey"))
        .collect()[0][0]
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_item_lift_is_supported_and_positive(spark, sf_dir):
    rows = queries()["recsys_item_lift"](spark, sf_dir).collect()
    for r in rows:
        assert r.pair_n >= 2, "support pruning must hold"
        assert r.part_a < r.part_b, "pairs must be canonically ordered"
        assert r.lift > 0
