"""S2 depth: parquet schema evolution (mergeSchema) — the lakehouse shape
where years of files coexist under one table root with columns added over
time.

Registered AFTER the round-3 official window (see catalog/__init__.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.registry import register
from flinkexp_spark.streaming.replay import scratch_dir


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
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    with scratch_dir("dpo") as work:
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


@register(
    "source_csv_malformed_modes",
    # documents with doc_id % 5 == 0 become malformed lines (non-numeric
    # second field); PERMISSIVE captures them in the corrupt-record column,
    # DROPMALFORMED removes them — both counts derive from doc_id
    oracle="""
        SELECT 'permissive_rows' AS metric,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT 'corrupt_rows',
               CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT 'dropmalformed_rows',
               CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT 'clean_len_sum',
               CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0
                             ELSE strlen(text) END) AS BIGINT)
        FROM documents WHERE doc_id < 200
    """,
    tags=("S3", "S4"),
)
def q_source_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 depth: CSV parse-failure policy — the same malformed file read
    under PERMISSIVE (bad rows land NULL-typed with the raw line captured
    in ``columnNameOfCorruptRecord``, the dead-letter input) and
    DROPMALFORMED (bad rows vanish).  At 100 TB ingest this is the
    contract that decides whether one corrupt shard poisons a job, gets
    quarantined, or silently shrinks the data — so both counts are pinned
    against construction arithmetic.

    Lines with doc_id % 5 == 0 are written with a non-numeric length
    field; the clean-row length sum proves surviving rows parse intact.

    Gotcha pinned here: CSV column pruning means a bare ``count()`` parses
    NO data columns, so DROPMALFORMED drops nothing (nothing failed to
    parse) — the drop count must be measured by an aggregate that
    references the typed columns, forcing them into the parser's required
    schema.  At scale this is the difference between "the job counted the
    file" and "the job validated the file".
    """
    docs = (
        datasets.load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        # octet_length == DuckDB strlen (BYTES); F.length would count
        # CHARACTERS and diverge on any multi-byte text
        .select("doc_id", F.octet_length("text").alias("len"))
    )
    with scratch_dir("csvmal") as work:
        line = F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws(",", F.col("doc_id"), F.lit("not-a-number")),
        ).otherwise(F.concat_ws(",", F.col("doc_id"), F.col("len")))
        docs.select(line.alias("value")).write.mode("overwrite").text(work)

        schema = "doc_id long, len long"
        permissive = spark.read.csv(
            work,
            schema=schema + ", _corrupt string",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt",
        ).cache()
        dropped = spark.read.csv(work, schema=schema, mode="DROPMALFORMED")
        # reference BOTH typed columns so the parser must convert them —
        # a bare count() would prune the schema and drop nothing
        drow = dropped.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("len").alias("len_sum"),
            F.count("doc_id").alias("n_ids"),
        ).collect()[0]

        rows = [
            ("permissive_rows", permissive.count()),
            ("corrupt_rows", permissive.filter(F.col("_corrupt").isNotNull()).count()),
            ("dropmalformed_rows", drow.n),
            (
                "clean_len_sum",
                permissive.filter(F.col("_corrupt").isNull())
                .agg(F.sum("len"))
                .collect()[0][0],
            ),
        ]
        permissive.unpersist()
        return datasets.local_df(
            spark, [(m, int(n)) for m, n in rows], "metric string, n long"
        )


@register(
    "source_file_metadata_lineage",
    # four single-file writes, one per doc_id residue class -> per-file row
    # counts equal the class sizes; ranked by count so the opaque file
    # names never enter the comparison
    oracle="""
        WITH per_file AS (
            SELECT doc_id % 4 AS cls, COUNT(*) AS n
            FROM documents GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY n, cls) AS BIGINT) AS rnk,
               n
        FROM per_file
    """,
    tags=("S2",),
)
def q_source_file_metadata_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: file-level lineage via the ``_metadata`` hidden column — every
    row knows which physical file produced it, without any data column
    spent on it.  This is the backbone of incremental processing at
    100 TB (process only files newer than the last watermark) and of
    shard-level forensics (which file poisoned the aggregate).

    Four single-file writes (one per doc_id residue class) make the
    per-file row counts deterministic; reading back grouped by
    ``_metadata.file_path`` must reproduce exactly those class sizes.
    """
    docs = datasets.load(spark, sf_dir, "documents").select("doc_id")
    with scratch_dir("lineage") as work:
        for i in range(4):
            docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
                "append"
            ).parquet(work)
        back = spark.read.parquet(work).select(
            F.col("_metadata.file_path").alias("src_file")
        )
        per_file = back.groupBy("src_file").agg(F.count("*").alias("n"))
        from pyspark.sql import Window

        w = Window.orderBy(F.col("n"), F.col("src_file"))
        out = per_file.select(
            F.row_number().over(w).alias("rnk"), F.col("n")
        )
        rows = out.collect()  # materialize before the scratch dir disappears
        return datasets.local_df(spark, rows, out.schema)


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
    with scratch_dir("evolve") as work:
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


SHARD_MAX_RECORDS = 4000


@register(
    "sink_sized_shards",
    oracle=f"""
        WITH n AS (SELECT COUNT(*) AS total FROM documents)
        SELECT CAST(total AS BIGINT) AS total_rows,
               CAST(CEIL(total / {float(SHARD_MAX_RECORDS)}) AS BIGINT)
                   AS n_shards,
               CAST(LEAST(total, {SHARD_MAX_RECORDS}) AS BIGINT)
                   AS max_shard_rows,
               CAST(CASE WHEN total % {SHARD_MAX_RECORDS} = 0
                         THEN LEAST(total, {SHARD_MAX_RECORDS})
                         ELSE total % {SHARD_MAX_RECORDS} END AS BIGINT)
                   AS min_shard_rows
        FROM n
    """,
    tags=("S2", "A2"),
)
def q_sink_sized_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export: write the corpus as size-bounded parquet
    shards (``maxRecordsPerFile``) and audit the layout from the files
    themselves via the ``_metadata`` hidden column.

    ``repartition(1)`` + maxRecordsPerFile gives EXACT packing — files of
    SHARD_MAX_RECORDS rows plus one remainder — which is what makes the
    layout oracle-checkable arithmetically.  At 100 TB you keep the
    repartition (on a shard-count divisor, not 1) so each task emits
    full-sized shards; dataloader-facing manifests then read row counts
    from footer metadata exactly as this audit does.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    with scratch_dir("shards") as work:
        out = os.path.join(work, "shards")
        (
            docs.repartition(1)
            .write.option("maxRecordsPerFile", SHARD_MAX_RECORDS)
            .mode("overwrite")
            .parquet(out)
        )
        per_file = (
            spark.read.parquet(out)
            .select(F.col("_metadata.file_name").alias("f"))
            .groupBy("f")
            .agg(F.count("*").alias("rows"))
        )
        audit = per_file.agg(
            F.sum("rows").cast("long").alias("total_rows"),
            F.count("*").cast("long").alias("n_shards"),
            F.max("rows").cast("long").alias("max_shard_rows"),
            F.min("rows").cast("long").alias("min_shard_rows"),
        )
        rows = audit.collect()
    return datasets.local_df(
        spark,
        rows,
        "total_rows long, n_shards long, max_shard_rows long, min_shard_rows long",
    )
