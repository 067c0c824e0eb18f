"""S2 depth: parquet schema evolution (mergeSchema) — the lakehouse shape
where years of files coexist under one table root with columns added over
time.

Registered AFTER the round-3 official window (see catalog/__init__.py).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register
from flinkexp_spark.streaming.replay import SCRATCH_ROOT


@register(
    "sink_dynamic_partition_overwrite",
    # the 'O' partition is rewritten with +100.00 per order; others keep
    # their original totals — only the touched partition changes
    oracle="""
        SELECT o_orderstatus AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(
                   (o_totalprice + CASE WHEN o_orderstatus = 'O'
                                        THEN 100.0 ELSE 0.0 END)
                   * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY 1
    """,
    tags=("S2",),
)
def q_sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 sink depth: ``partitionOverwriteMode=dynamic`` — an overwrite
    that replaces ONLY the partitions present in the incoming frame,
    leaving sibling partitions' files untouched.  This is the incremental
    backfill primitive at 100 TB: re-deriving one day/status never
    rewrites (or even lists) the other partitions.

    Static overwrite mode would have dropped the whole table root; the
    assertion is the read-back aggregate: the 'O' partition carries the
    corrected totals, every other partition its original ones.
    """
    orders = datasets.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    work = os.path.join(SCRATCH_ROOT, f"dpo_{uuid.uuid4().hex[:12]}")
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(work)
        fixed = (
            orders.filter(F.col("o_orderstatus") == "O")
            .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        fixed.write.mode("overwrite").partitionBy("o_orderstatus").parquet(work)
        back = spark.read.parquet(work)
        out = back.groupBy(F.col("o_orderstatus").alias("status")).agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )
        rows = out.collect()  # materialize before the scratch dir disappears
        return datasets.local_df(spark, rows, out.schema)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "source_parquet_schema_evolution",
    # v1 rows (o_orderkey % 4 < 2) were written before o_orderstatus
    # existed -> NULL after the merged read; v2 rows carry it
    oracle="""
        SELECT COALESCE(CASE WHEN o_orderkey % 4 < 2 THEN NULL
                             ELSE o_orderstatus END, '?') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY 1
    """,
    tags=("S2",),
)
def q_source_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: schema evolution across parquet file generations — v1 files
    lack ``o_orderstatus`` (written before the column existed), v2 files
    carry it; ``mergeSchema=true`` reconciles the footers and the missing
    column reads as NULL for v1 rows.

    Scale design: schema merge is a FOOTER operation (per-file metadata
    union), not a data rewrite — exactly how a 100 TB table root absorbs
    new columns without touching old files; per-file column pruning still
    applies to each generation.
    """
    orders = datasets.load(spark, sf_dir, "orders")
    work = os.path.join(SCRATCH_ROOT, f"evolve_{uuid.uuid4().hex[:12]}")
    try:
        gen = F.col("o_orderkey") % 4
        v1 = orders.filter(gen < 2).select("o_orderkey", "o_totalprice")
        v2 = orders.filter(gen >= 2).select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        v1.write.mode("overwrite").parquet(os.path.join(work, "gen=1"))
        v2.write.mode("overwrite").parquet(os.path.join(work, "gen=2"))
        merged = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(work, "gen=1"), os.path.join(work, "gen=2")
        )
        out = (
            merged.groupBy(
                F.coalesce(F.col("o_orderstatus"), F.lit("?")).alias("status")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )
        )
        # materialize before the scratch dir disappears
        rows = out.collect()
        return datasets.local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
