"""Physical-plan assertions: the 100 TB scale contract (SURVEY §4).

Correctness says WHAT is computed; these tests pin HOW — pushdown, pruning,
broadcast, partial aggregation, codegen — so a regression that silently
turns a broadcast join into a shuffle or defeats parquet pushdown fails CI,
not the cluster.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import uuid

from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import queries


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_parquet_filter_pushdown_and_column_pruning(spark, sf_dir):
    li = datasets.load(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan
    # ReadSchema must carry ONLY the two projected columns
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_star_join_broadcasts_small_dims(spark, sf_dir):
    plan = plan_of(queries()["join_broadcast_star"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "small dims must broadcast, not shuffle"


def test_aggregate_is_partial_then_final(spark, sf_dir):
    li = datasets.load(spark, sf_dir, "lineitem")
    plan = plan_of(li.groupBy("l_returnflag").agg(F.sum("l_quantity")))
    # map-side combine: two HashAggregate nodes around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_wordcount_stays_in_codegen(spark, sf_dir):
    df = queries()["wordcount_batch"](spark, sf_dir)
    df.collect()  # materialize THIS plan so AQE pins the final physical plan
    plan = plan_of(df, "simple")
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan, "hot path must run inside a WholeStageCodegen span"
    assert "BatchEvalPython" not in plan, "no row-at-a-time Python in the hot path"


def test_minhash_signatures_combine_map_side(spark, sf_dir):
    from flinkexp_spark.functions.text import minhash_signatures

    docs = datasets.load(spark, sf_dir, "documents")
    plan = plan_of(minhash_signatures(docs), "simple")
    # the shingle-hash explosion must collapse to one row/doc BEFORE the
    # shuffle (partial_min map-side combine)
    assert "partial_min" in plan
    # and each md5 must be computed exactly once (hash in the child of the
    # aggregate, not inlined per-signature-component)
    assert plan.count("md5") == 1


def test_lsh_join_is_not_cartesian(spark, sf_dir):
    plan = plan_of(queries()["dedup_minhash_lsh"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, "band join must be an equi-join"


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    li = datasets.load(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = os.path.join(str(tmp_path), f"li_{uuid.uuid4().hex[:8]}")
    li.write.partitionBy("ship_year").parquet(path)
    try:
        back = spark.read.parquet(path).filter(F.col("ship_year") == 1996)
        plan = plan_of(back)
        assert "PartitionFilters" in plan
        pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
        assert "ship_year" in pf_line
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_sim_search_broadcasts_probe_side(spark, sf_dir):
    plan = plan_of(queries()["sim_search_topk"](spark, sf_dir), "simple")
    assert "Broadcast" in plan, "probe set must broadcast; corpus scans once"


def test_bucketed_join_and_agg_are_exchange_free(spark, sf_dir):
    """Co-bucketed fact tables: SMJ and key-grouped agg plan with NO shuffle.

    This is the pay-the-shuffle-once layout claim in SCALING.md — at 100 TB
    the recurring join shuffle is the dominant network cost, and bucketing
    removes it from every run after the write.
    """
    from flinkexp_spark import datasets
    from flinkexp_spark.operators.bucketing import bucketed_tables
    from flinkexp_spark.streaming.replay import SCRATCH_ROOT

    work = os.path.join(SCRATCH_ROOT, f"bkt_plan_{uuid.uuid4().hex[:10]}")
    os.makedirs(work, exist_ok=True)
    li = datasets.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = datasets.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    try:
        with bucketed_tables(
            spark, {"li": (li, "l_orderkey"), "ord": (orders, "o_orderkey")}, work
        ) as t:
            joined = t["li"].hint("merge").join(
                t["ord"].hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "co-bucketed join must not shuffle"
            assert "SelectedBucketsCount" in plan

            # groupBy on the bucket key rides the same distribution
            agg = t["li"].groupBy("l_orderkey").agg(F.sum("l_quantity"))
            assert "Exchange" not in plan_of(agg)
    finally:
        shutil.rmtree(work, ignore_errors=True)
