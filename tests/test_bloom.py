"""operators/bloom.py: explicit Bloom prefilter semi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkexp_spark.operators.bloom import bloom_build, bloom_prefilter


def test_bloom_has_no_false_negatives_and_prunes(spark):
    keys = spark.range(0, 200).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=8192, k=3)
    kept = bloom_prefilter(probe, bloom, "k", m_bits=8192, k=3)
    kept_set = {r.k for r in kept.collect()}
    true_set = {r.k for r in keys.collect() if 0 <= r.k < 20000}
    # every true member survives (Bloom guarantees no false negatives)
    assert true_set <= kept_set
    # and the filter actually prunes: fp rate for n=200, m=8192, k=3 is
    # well under 1%, so kept should be close to |true_set|
    assert len(kept_set) < len(true_set) + 0.02 * 20000


def test_bloom_prefilter_plan_is_jvm_only(spark):
    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k")
    plan = bloom_prefilter(probe, bloom, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitset broadcast
