"""Flagship composite: the end-to-end LLM training-data pipeline
(X4 quality gate -> X1 exact dedup -> X2 MinHash-LSH near-dup drop ->
corpus stats), as ONE declarative Spark plan with a full DuckDB oracle.

This is the job the engine exists for at 100 TB: each stage is one of the
already-proven operators, composed so Catalyst plans the whole thing
together — the quality filter prunes before any hashing, dedup hash-joins
run only on survivors, and the final stats aggregate is map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog.llm_dedup import (
    _MH,
    _O_AGREE as _AGREE,
    _O_BANDS as _BANDS,
    EST_JACCARD_MIN,
)
from flinkexp_spark.catalog.text_analysis import LANG_MARKERS, _marker_count, _marker_count_sql
from flinkexp_spark.functions import text as T
from flinkexp_spark.registry import register

_ORACLE = f"""
    WITH t0 AS (SELECT doc_id, lang, text, {T.tokens_sql('text')} AS toks
                FROM documents),
    -- X4 quality gate
    q AS (SELECT doc_id, lang, text, toks FROM t0
          WHERE len(toks) BETWEEN 20 AND 1000
            AND round({_marker_count_sql('toks', LANG_MARKERS['en'])}
                      * 1.0 / len(toks), 4) >= 0.01),
    -- X1 exact dedup: keep min doc_id per content hash
    x AS (SELECT * FROM q
          WHERE doc_id IN (SELECT MIN(doc_id) FROM q GROUP BY sha256(text))),
    -- X2 near-dup drop over the survivors
    s AS (SELECT doc_id, {T.shingles_sql('toks')} AS sh FROM x),
    hs AS (SELECT doc_id, {T.hashed_shingles_sql('sh')} AS hsl FROM s),
    m AS (SELECT doc_id,
          {', '.join(T.minhash_cols_sql('sh', hashes_expr='hsl'))} FROM hs),
    b AS ({_BANDS}),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             FROM b a JOIN b c ON a.band = c.band AND a.key = c.key
                              AND a.doc_id < c.doc_id),
    dup AS (SELECT DISTINCT id_b FROM cand
            JOIN m x ON cand.id_a = x.doc_id
            JOIN m y ON cand.id_b = y.doc_id
            WHERE {_AGREE} >= {EST_JACCARD_MIN}),
    kept AS (SELECT * FROM x WHERE doc_id NOT IN (SELECT id_b FROM dup))
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
    FROM kept GROUP BY lang
"""


@register("pipeline_training_data", oracle=_ORACLE, tags=("X1", "X2", "X4"))
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate -> exact-dedup -> near-dup-drop -> per-lang corpus stats,
    composed as one lazy plan (only the LSH signature table is
    checkpointed, as in dedup_minhash_lsh)."""
    # _widen: fixture-scale only — the single parquet split otherwise runs
    # the whole tokenize+hash map stage on one core (no-op at 100 TB where
    # splits >> cores; same guard as T.minhash_signatures).
    docs = T._widen(datasets.load(spark, sf_dir, "documents"))
    toks = T.tokens(F.col("text"))

    # X4 quality gate — tokenize ONCE and hash the shingles in the SAME
    # map stage (guide §1.2 per-task work, §2.3 project-before-exchange):
    # the dedup exchange carries the pre-hashed shingle longs (~8 B each)
    # instead of the token strings, and at 100 TB the md5 work runs at
    # scan parallelism with no extra exchange.  The only waste is hashing
    # rows that the exact dedup then drops — duplicates are a tiny
    # fraction of a crawl batch (fixture: 7 of 4,239).
    q = docs.select(
        "doc_id",
        "lang",
        F.sha2(F.col("text"), 256).alias("__h"),
        F.size(toks).alias("n_tokens"),
        _marker_count(toks, LANG_MARKERS["en"]).alias("n_stop"),
        F.transform(T.shingles(toks), T.h64).alias("hs"),
    ).filter(
        F.col("n_tokens").between(20, 1000)
        & (F.round(F.col("n_stop") / F.col("n_tokens"), 4) >= 0.01)
    )

    # X1 exact dedup + X2 signature build in ONE job: keep the min doc_id
    # per content hash — min_by as a map-side-combinable aggregate (guide
    # §2.3: no sort/window, duplicates collapse per map partition before
    # the exchange, and `text`/`toks` never cross a shuffle; doc_id is
    # unique, so min_by picks exactly the old rn=1 row) — and compute the
    # 16 minhash components in the SAME projection, 16 array_min lambdas
    # over the survivor's hash array (integer ops only).  `r.hs` is a
    # materialized aggregate output here, not a repeated md5 expression,
    # so this is safe from the md5-x16 CSE trap documented in
    # T.minhash_signatures; array_min([]) = NULL keeps the empty-shingle
    # NULL-signature contract.  ONE narrow localCheckpoint (id, lang,
    # n_tokens, 16 longs) then feeds all five consumers (two band sides,
    # two signature sides, the anti-join left side); r14 used TWO eager
    # checkpoints with an explode+groupBy+join signature pass between
    # them, whose extra job + exchange was the round's measured cold-path
    # regression (VERDICT r14 #1).
    mh_cols = [
        F.array_min(F.transform(F.col("r.hs"), T._affine(a, b))).alias(
            f"mh_{i}"
        )
        for i, (a, b) in enumerate(zip(T.MINHASH_A, T.MINHASH_B))
    ]
    x = (
        q.groupBy("__h")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "n_tokens", "hs"), F.col("doc_id")
            ).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_tokens", *mh_cols)
        .localCheckpoint()
    )
    sig = x.select("doc_id", *_MH)
    cand = T.lsh_candidate_pairs(sig)
    sx, sy = sig.alias("x"), sig.alias("y")
    agree = sum(
        F.when(F.col(f"x.{c}") == F.col(f"y.{c}"), 1).otherwise(0) for c in _MH
    )
    dup = (
        cand.join(sx, F.col("id_a") == F.col("x.doc_id"))
        .join(sy, F.col("id_b") == F.col("y.doc_id"))
        .filter((agree / float(T.N_MINHASH)) >= EST_JACCARD_MIN)
        .select("id_b")
        .distinct()
    )
    kept = x.join(dup, x.doc_id == dup.id_b, "left_anti")

    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
    )


# Per-lang sampling rates (percent) for the stratified sample below.
SAMPLE_PCT = {"en": 50, "fr": 100, "es": 100, "de": 100, "zh": 25}

_PCT_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_PCT.items())
    + " ELSE 0 END"
)


@register(
    "sample_stratified_hash",
    oracle=f"""
        SELECT lang, COUNT(*) AS n_sampled
        FROM documents
        WHERE {T.h64_sql("concat('sample-', CAST(doc_id AS VARCHAR))")} % 100
              < {_PCT_CASE}
        GROUP BY lang
    """,
    tags=("X4", "P2"),
)
def q_sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling by content-keyed hash — downsample
    over-represented languages (50% en, 25% zh here), keep the rest.

    ``h64(salt || doc_id) % 100 < rate`` instead of rand(): the sample is a
    pure function of the row, so it is identical across retries, executors,
    cluster sizes, and reruns — the only sampling that is exactly-once-safe
    and auditable at 100 TB.  Changing the salt draws an independent sample
    (that is also how train/validation splits are carved).
    """
    docs = datasets.load(spark, sf_dir, "documents")
    pct = F.expr(_PCT_CASE)
    bucket = T.h64(F.concat(F.lit("sample-"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.filter(bucket < pct)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


# Weighted (importance) sampling: keep probability proportional to document
# length, capped at 1 — longer docs carry more training signal, so a
# length-weighted subsample preserves more total tokens per kept doc than a
# uniform one.  Resolution of the probability grid:
WSAMPLE_SCALE = 10_000
WSAMPLE_FULL_CHARS = 2_000  # docs at/over this length are always kept


@register(
    "sample_weighted_hash",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
        FROM documents
        WHERE {T.h64_sql("concat('wsample-', CAST(doc_id AS VARCHAR))")}
                  % {WSAMPLE_SCALE}
              < least({WSAMPLE_SCALE},
                      CAST(floor(n_chars * {WSAMPLE_SCALE}
                                 / {WSAMPLE_FULL_CHARS}) AS BIGINT))
        GROUP BY lang
    """,
    tags=("X4", "P2"),
)
def q_sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling — per-row keep probability
    min(1, n_chars / WSAMPLE_FULL_CHARS) decided by content-keyed hash,
    the importance-sampling primitive for building training mixtures.

    Same exactly-once-safe construction as `sample_stratified_hash`
    (bucket = pure function of doc_id + salt, so retries/speculation/reruns
    keep the identical sample), but the threshold varies per row — any
    weight column works (quality score, source priority).  Fixed-point
    threshold arithmetic (floor to 1/WSAMPLE_SCALE) keeps both engines
    bit-identical.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    bucket = (
        T.h64(F.concat(F.lit("wsample-"), F.col("doc_id").cast("string")))
        % WSAMPLE_SCALE
    )
    thresh = F.least(
        F.lit(WSAMPLE_SCALE),
        F.floor(F.col("n_chars") * WSAMPLE_SCALE / WSAMPLE_FULL_CHARS).cast(
            "long"
        ),
    )
    return (
        docs.filter(bucket < thresh)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


VAL_PCT = 10  # hold out 10% as validation


@register(
    "split_train_val",
    oracle=f"""
        SELECT CASE WHEN {T.h64_sql("concat('split-', CAST(doc_id AS VARCHAR))")}
                         % 100 < {VAL_PCT}
                    THEN 'val' ELSE 'train' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
    tags=("X4", "P1"),
)
def q_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation split by content-keyed hash bucket —
    the companion of sample_stratified_hash: membership never changes
    across reruns or cluster sizes, and a doc can never leak between
    splits (the bucket is a pure function of its id + salt)."""
    docs = datasets.load(spark, sf_dir, "documents")
    bucket = T.h64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.withColumn(
            "split", F.when(bucket < VAL_PCT, "val").otherwise("train")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


PACK_CONTEXT = 2048  # token budget per packed training sequence
PACK_WORKERS = 32    # independent packing streams (the parallel unit)


@register(
    "pack_sequences",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   {T.h64_sql("concat('pack-', CAST(doc_id AS VARCHAR))")}
                       % {PACK_WORKERS} AS worker,
                   CAST(len({T.tokens_sql('text')}) AS BIGINT) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, worker, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY worker
                        ORDER BY doc_id) AS BIGINT) AS cum
            FROM t)
        SELECT doc_id, worker,
               CAST((cum - n_tokens) // {PACK_CONTEXT} AS BIGINT) AS bin,
               n_tokens
        FROM c
    """,
    tags=("X4", "W3"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic context-window packing: assign each document to a
    (worker, bin) so every bin holds ~PACK_CONTEXT tokens of contiguous
    docs — the sequence-packing step that turns a filtered corpus into
    fixed-budget training examples.

    Structure at 100 TB: the hash-derived ``worker`` is the ONLY shuffle
    key, so packing runs as PACK_WORKERS independent streams (one window
    sort each, no global order).  Within a worker, docs are packed greedily
    in doc_id order by running token count; ``bin = (cum - n) // budget``
    closes a bin when the budget is crossed (a bin may overflow by at most
    one document — the standard streaming-packing tradeoff, chosen over
    first-fit because it needs one window pass, not a sequential scan).
    Everything is a pure function of doc_id — reruns, retries, and cluster
    resizes pack identically.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (
            T.h64(F.concat(F.lit("pack-"), F.col("doc_id").cast("string")))
            % PACK_WORKERS
        ).alias("worker"),
        F.size(T.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("worker").orderBy("doc_id")
    return (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "worker",
            F.floor((F.col("cum") - F.col("n_tokens")) / PACK_CONTEXT)
            .cast("long")
            .alias("bin"),
            "n_tokens",
        )
    )


DECON_EVAL_MOD = 97  # docs with doc_id % MOD == 0 act as the held-out benchmark
DECON_K = 3          # fixture vocab is tiny; production uses 8-13-gram overlap


@register(
    "decontaminate_ngram",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents),
        s AS (SELECT doc_id, {T.shingles_sql('toks', DECON_K)} AS sh FROM t),
        d AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM s),
        ev AS (SELECT DISTINCT g FROM d WHERE doc_id % {DECON_EVAL_MOD} = 0),
        hits AS (SELECT doc_id, COUNT(*) AS n FROM d JOIN ev USING (g)
                 WHERE doc_id % {DECON_EVAL_MOD} <> 0 GROUP BY doc_id)
        SELECT d0.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_overlap,
               COALESCE(hits.n, 0) > 0 AS contaminated
        FROM (SELECT doc_id FROM documents
              WHERE doc_id % {DECON_EVAL_MOD} <> 0) d0
        LEFT JOIN hits USING (doc_id)
    """,
    tags=("X2", "X4"),
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any k-gram with
    the held-out eval set (the contamination check every LLM data pipeline
    runs before training; cf. GPT-3 appendix C / PaLM 13-gram overlap).

    The eval set's distinct shingles BROADCAST (an eval benchmark is
    tiny — MBs — next to a 100 TB corpus), so the check is a map-side
    semi-join on the corpus scan: no shuffle of the corpus, cost is one
    pass + one groupBy on doc_id for the overlap counts.  The eval set
    here is carved deterministically from the fixtures (doc_id %
    {DECON_EVAL_MOD} == 0) so the whole check is oracle-verifiable.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    # Per-doc dedup happens INSIDE the row (array_distinct before explode):
    # the alternative — .distinct() on the exploded (doc_id, g) stream — is
    # a full shuffle of every shingle in the corpus, the single biggest
    # exchange in this query at 100 TB.  A document's shingle set fits in
    # one row, so the dedup is free map-side work.
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.shingles(T.tokens(F.col("text")), DECON_K))).alias("g"),
    )
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    ev = F.broadcast(sh.filter(is_eval).select("g").distinct())
    hits = (
        sh.filter(~is_eval)
        .join(ev, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ids = docs.filter(~is_eval).select("doc_id")
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
    )


# --- data-mixture rebalancing ------------------------------------------------
# Training corpora are assembled to a TARGET language/domain mix; the engine
# computes per-group sampling weights from the observed distribution.
MIX_DECIMALS = 6


@register(
    "mix_rebalance_weights",
    oracle=f"""
        WITH c AS (SELECT lang, COUNT(*) AS n_docs,
                          CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes
                   FROM documents GROUP BY lang),
        t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                     COUNT(*) AS n_groups FROM c)
        SELECT lang, n_docs, n_bytes,
               round(n_docs * 1.0 / t.total, {MIX_DECIMALS}) AS observed_frac,
               round(1.0 / t.n_groups, {MIX_DECIMALS}) AS target_frac,
               round((1.0 / t.n_groups) / (n_docs * 1.0 / t.total),
                     {MIX_DECIMALS}) AS sample_weight
        FROM c, t
    """,
    tags=("X4", "A1"),
)
def q_mix_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing: per-language observed fraction vs a uniform
    target, emitting the sampling weight (target/observed) each group needs
    to hit the target mix — the control table a weighted sampler (e.g.
    sample_stratified_hash with per-group rates) consumes.

    One groupBy + a broadcast scalar total: the group table is tiny (one
    row per language/domain) at any corpus size, so the plan is a single
    fact-scan shuffle regardless of scale.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("n_bytes"),
    )
    t = c.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_groups")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        "n_bytes",
        F.round(F.col("n_docs") / F.col("total"), MIX_DECIMALS).alias("observed_frac"),
        F.round(F.lit(1.0) / F.col("n_groups"), MIX_DECIMALS).alias("target_frac"),
        F.round(
            (F.lit(1.0) / F.col("n_groups")) / (F.col("n_docs") / F.col("total")),
            MIX_DECIMALS,
        ).alias("sample_weight"),
    )


# --- deterministic output sharding -------------------------------------------
N_SHARDS = 16


@register(
    "shard_assign",
    oracle=f"""
        WITH s AS (SELECT doc_id,
                          {T.h64_sql("CAST(doc_id AS VARCHAR)")} % {N_SHARDS}
                              AS shard_id,
                          strlen(text) AS n_bytes
                   FROM documents)
        SELECT shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM s GROUP BY shard_id
    """,
    tags=("X4", "S2"),
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: every document maps to one of N_SHARDS
    training shards by content-independent hash of its id (md5 contract, so
    the mapping is stable across engines and runs — a re-run reshards
    identically, which is what makes checkpoint/resume of a data pipeline
    safe).  Emits the shard manifest (doc count, byte size, id range).

    At 100 TB this IS the writer layout: df.repartition(N, hash).write —
    the manifest aggregation here verifies balance before paying the write.
    The md5 spread keeps shards within ~1% of even at production N.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        (T.h64(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard_id"),
        F.octet_length("text").alias("n_bytes"),
    )
    return s.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("shard_bytes"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SAMPLE_N_PER_GROUP = 20


@register(
    "sample_fixed_per_group",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {T.h64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
                   ) AS rn
            FROM documents)
        SELECT lang, COUNT(*) AS n,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM r WHERE rn <= {SAMPLE_N_PER_GROUP}
        GROUP BY lang
    """,
    tags=("W1", "A1"),
)
def q_sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sample (eval-set construction): exactly N docs
    per language, chosen by hash rank — deterministic across runs and
    engines, unlike rand()-based sampling.

    One rank window per group; at 100 TB groups are the shuffle partitions
    and the rank early-outs at N per group under TakeOrderedAndProject-
    style evaluation.  Hash ranking means adding documents to the corpus
    changes the sample minimally (only hash-adjacent displacements), the
    property eval-set stability needs.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        T.h64(F.col("doc_id").cast("string")), "doc_id"
    )
    picked = (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_N_PER_GROUP)
    )
    return picked.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.sum("doc_id").cast("long").alias("doc_id_sum"),
    )


CURRICULUM_PHASES = 4


@register(
    "curriculum_order",
    oracle=f"""
        WITH phased AS (
            SELECT doc_id,
                   NTILE({CURRICULUM_PHASES}) OVER (ORDER BY n_chars, doc_id)
                       AS phase
            FROM documents
        )
        SELECT doc_id, phase,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY phase
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS BIGINT) AS pos
        FROM phased
        ORDER BY phase, pos
    """,
    tags=("W1", "O1"),
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: quartile documents by a difficulty
    proxy (length) into phases, then give each phase a DETERMINISTIC
    pseudo-random intra-phase order (md5 of the id — engine-independent,
    seedable by salting the string, and reproducible across reruns, unlike
    rand()).

    ntile + per-phase row_number is two window passes over one sort each.
    At 100 TB you'd replace ntile's global sort with approx percentile
    boundaries (computed once, broadcast) and make the phase assignment a
    stateless map — the hash order needs no global sort at all if shards
    read (phase, md5-range) buckets.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    phase_w = Window.orderBy("n_chars", "doc_id")
    d = docs.select(
        "doc_id", F.ntile(CURRICULUM_PHASES).over(phase_w).alias("phase"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    pos_w = Window.partitionBy("phase").orderBy("h", "doc_id")
    return (
        d.select(
            "doc_id", "phase",
            F.row_number().over(pos_w).cast("long").alias("pos"),
        )
        .orderBy("phase", "pos")
    )


_DPO_GROUPS = 200  # deterministic "prompt" id: doc_id % groups


@register(
    "pipeline_dpo_pairs",
    oracle=f"""
        WITH sc AS (
            SELECT doc_id, CAST(doc_id % {_DPO_GROUPS} AS BIGINT) AS prompt_id,
                   CAST(FLOOR(1000.0 * len(list_distinct({T.tokens_sql('text')}))
                              / len({T.tokens_sql('text')})) AS BIGINT)
                       AS score_x1000
            FROM documents
            WHERE len({T.tokens_sql('text')}) > 0),
        best AS (
            SELECT prompt_id, doc_id AS chosen_doc,
                   score_x1000 AS chosen_score
            FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                          ORDER BY score_x1000 DESC, doc_id) AS rn FROM sc)
            WHERE rn = 1),
        worst AS (
            SELECT prompt_id, doc_id AS rejected_doc,
                   score_x1000 AS rejected_score
            FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                          ORDER BY score_x1000 ASC, doc_id DESC) AS rn FROM sc)
            WHERE rn = 1)
        SELECT b.prompt_id, chosen_doc, rejected_doc, chosen_score,
               rejected_score,
               chosen_score - rejected_score AS margin_x1000
        FROM best b JOIN worst w ON b.prompt_id = w.prompt_id
        WHERE chosen_score - rejected_score > 0
        ORDER BY b.prompt_id
    """,
    tags=("W5", "J1", "X4"),
)
def q_pipeline_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF data-prep step): within
    each prompt group, pair the highest-quality candidate (chosen) with
    the lowest (rejected) and keep only pairs with positive margin.

    Quality here is the exact-integer lexical-diversity permille
    (distinct/total tokens) — any of the engine's richer scores
    (text_quality_ensemble) slots into the same shape.  The fixture has no
    prompt column, so the group key is the deterministic doc_id % N; a
    real corpus supplies its own.  Plan: ONE tokenize pass and ONE
    shuffle — both extremes come out of a single groupBy as lexicographic
    struct min/max ((score, -doc_id) encodes each side's tie-break), so
    there is no rank window and no self-join; partial aggregation does
    the per-group argmax map-side, exactly what you want when groups are
    numerous and small at 100 TB.  (The oracle keeps the two-window
    formulation — clearer SQL, same result.)
    """
    toks = T.tokens(F.col("text"))
    sc = (
        datasets.load(spark, sf_dir, "documents")
        .filter(F.size(toks) > 0)
        .select(
            "doc_id",
            (F.col("doc_id") % _DPO_GROUPS).cast("long").alias("prompt_id"),
            F.floor(
                1000.0 * F.size(F.array_distinct(toks)) / F.size(toks)
            )
            .cast("long")
            .alias("score_x1000"),
        )
    )
    # (score, -doc_id) lexicographic: max -> score DESC then doc_id ASC
    # (chosen tie-break); min -> score ASC then doc_id DESC (rejected)
    keyed = F.struct(
        F.col("score_x1000").alias("s"), (-F.col("doc_id")).alias("negid")
    )
    agg = sc.groupBy("prompt_id").agg(
        F.max(keyed).alias("b"), F.min(keyed).alias("w")
    )
    return (
        agg.select(
            "prompt_id",
            (-F.col("b.negid")).cast("long").alias("chosen_doc"),
            (-F.col("w.negid")).cast("long").alias("rejected_doc"),
            F.col("b.s").alias("chosen_score"),
            F.col("w.s").alias("rejected_score"),
            (F.col("b.s") - F.col("w.s")).alias("margin_x1000"),
        )
        .filter(F.col("margin_x1000") > 0)
        .orderBy("prompt_id")
    )


RSAMPLE_K = 20  # exact per-stratum budget for the priority sample
RSAMPLE_M = 1 << 20  # uniform grid: u = (h % M + 1) / M in (0, 1]


@register(
    "sample_priority_weighted",
    oracle=f"""
        WITH pri AS (
            SELECT lang, doc_id, n_chars,
                   n_chars * {RSAMPLE_M}.0 /
                   ({T.h64_sql("concat('rsample-', CAST(doc_id AS VARCHAR))")}
                        % {RSAMPLE_M} + 1) AS priority
            FROM documents
        ),
        r AS (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY priority DESC, doc_id) AS rnk
            FROM pri
        )
        SELECT lang, doc_id, n_chars, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= {RSAMPLE_K}
    """,
    tags=("X4", "W5", "P2"),
)
def q_sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k weighted sampling without replacement per stratum — priority
    sampling (Duffield, Lund & Thorup, JACM 2007; the scheme behind
    weight-proportional corpus subsampling with a FIXED budget, where the
    Bernoulli `sample_weighted_hash` gives only an expected size): each doc
    draws u in (0,1] from a content-keyed hash and gets priority w/u
    (w = n_chars); the top-k priorities per lang are the sample.

    Cross-engine float contract: u is a 2^20-grid rational and w*M stays
    under 2^53, so priority = (exact int) / (exact int) is ONE
    correctly-rounded IEEE division — bit-identical on both engines with
    no transcendental (the classic ES exponential-jitter form needs ln(u),
    whose last-ulp libm differences could flip ranks at the k-boundary).
    Deterministic hash => retries/speculation/reruns keep the identical
    sample (the same exactly-once argument as the other sampling queries).

    Scale: one shuffle on the stratum key for the top-k window; at 100 TB
    swap the full sort for the per-partition-top-k + re-rank pattern of
    `window_topk_per_group` (same contract, partial top-k combines
    map-side).
    """
    docs = datasets.load(spark, sf_dir, "documents")
    u_units = (
        T.h64(F.concat(F.lit("rsample-"), F.col("doc_id").cast("string")))
        % RSAMPLE_M
        + 1
    )
    pri = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        (F.col("n_chars") * F.lit(float(RSAMPLE_M)) / u_units).alias(
            "priority"
        ),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        pri.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= RSAMPLE_K)
        .select("lang", "doc_id", "n_chars", "rnk")
    )
