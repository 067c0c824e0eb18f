"""X4+ training-data text preparation: document chunking, BPE-ish token
counting, and URL/e-mail (PII) extraction+redaction over ``documents``.

No reference analog; north-star operators for the 100 TB training-data
pipeline (chunk -> tokenize -> redact feeds pack_sequences in
catalog/pipeline.py).  All pure ``pyspark.sql.functions`` expressions —
array lambdas, regexes, no explode until the final chunk fan-out and no
Python in the hot path — with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.functions import text as T
from flinkexp_spark.registry import register

# Chunking contract: fixed-size token windows with overlap.  Starts are the
# multiples of STEP below n_tokens (always at least the 0 chunk); the last
# chunk may be short.  Deterministic, so the oracle mirrors it exactly.
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
CHUNK_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

# BPE-ish pre-tokenizer: alpha runs | single digits | single non-alnum
# non-space.  Same semantics under Java regex (Spark) and RE2 (DuckDB) —
# no lookarounds, no \p classes.
BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"

URL_RE = "https?://[^ ]+"
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"


@register(
    "chunk_documents",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(range(0, greatest(len(toks), 1), {CHUNK_STEP}))
                         AS start
              FROM t)
        SELECT doc_id,
               CAST(start / {CHUNK_STEP} AS BIGINT) AS chunk_id,
               CAST(len(list_slice(toks, start + 1, start + {CHUNK_TOKENS}))
                    AS BIGINT) AS n_tokens,
               array_to_string(
                   list_slice(toks, start + 1, start + {CHUNK_TOKENS}), ' ')
                   AS chunk_text
        FROM s
    """,
    tags=("X4",),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: fixed-size token chunking with overlap ({CHUNK}=32, overlap=8).

    The chunk fan-out is the only explode — tokenization, start generation
    and slicing are array lambdas on the unexploded row, so the operator
    adds no shuffle: at 100 TB it is a narrow map over the corpus whose
    output feeds pack_sequences / embedding stages partition-locally.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("toks")) - 1, F.lit(0)),
        F.lit(CHUNK_STEP),
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STEP).cast("long").alias("chunk_id"),
            F.size(F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
        )
    )


@register(
    "text_tokens_bpe",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}')))
                    AS BIGINT) AS bpe_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               round(CAST(SUM(length(text)) AS DOUBLE)
                     / SUM(len(regexp_extract_all(text, '{BPE_RE}'))), 4)
                   AS chars_per_token
        FROM documents
        GROUP BY lang
    """,
    tags=("X4",),
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: BPE-ish pre-tokenizer counts — alpha runs / digits / punctuation
    as separate tokens, plus the chars-per-token compression ratio (the
    standard budget metric for training-data sizing)."""
    docs = datasets.load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0)))
    return (
        docs.select("lang", n_bpe.alias("nb"), F.length("text").alias("nc"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").cast("long").alias("bpe_tokens"),
            F.sum("nc").cast("long").alias("total_chars"),
            F.round(
                F.sum("nc").cast("double") / F.sum("nb"), 4
            ).alias("chars_per_token"),
        )
    )


# PII extraction is exercised on deterministically AUGMENTED text (the
# synthetic corpus contains no contact strings): docs with doc_id % 7 == 0
# get an e-mail, % 11 == 0 a URL.  The augmentation is part of the query
# text on BOTH engines, so extraction and redaction run against real
# matches, not just the no-match path.
_AUG_SQL = """
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' see https://docs.example.org/page' || CAST(doc_id AS STRING)
            ELSE '' END
"""


@register(
    "text_extract_redact_pii",
    oracle=f"""
        WITH aug AS (SELECT doc_id, {_AUG_SQL} AS atext FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(atext, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(atext, '{URL_RE}')) AS BIGINT)
                   AS n_urls,
               regexp_replace(
                   regexp_replace(atext, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{URL_RE}', '<URL>', 'g') AS redacted
        FROM aug
        WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
    """,
    tags=("X4",),
)
def q_text_extract_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: URL / e-mail detection and redaction — the PII-scrub pass every
    training-data pipeline runs before packing.  Counts via
    regexp_extract_all, scrub via regexp_replace; both whole-stage codegen.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    atext = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" see https://docs.example.org/page"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return (
        docs.select("doc_id", atext.alias("atext"))
        .filter((F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0))
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("atext"), F.lit(EMAIL_RE), F.lit(0))
            )
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(F.col("atext"), F.lit(URL_RE), F.lit(0)))
            .cast("long")
            .alias("n_urls"),
            F.regexp_replace(
                F.regexp_replace(F.col("atext"), EMAIL_RE, "<EMAIL>"),
                URL_RE,
                "<URL>",
            ).alias("redacted"),
        )
    )


# --- vocabulary build + id encoding ------------------------------------------
VOCAB_SIZE = 1000  # top tokens by (count DESC, token ASC); rest -> OOV (-1)
ENCODE_DOCS = 50   # docs encoded in the checked output


@register(
    "vocab_encode_ids",
    oracle=f"""
        WITH t0 AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                    FROM documents),
        w AS (SELECT unnest(toks) AS token FROM t0),
        c AS (SELECT token, COUNT(*) AS cnt FROM w GROUP BY token),
        v AS (SELECT token,
                     CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1
                          AS BIGINT) AS token_id
              FROM c
              QUALIFY row_number() OVER (ORDER BY cnt DESC, token)
                      <= {VOCAB_SIZE}),
        d AS (SELECT doc_id, toks, unnest(range(len(toks))) AS pos
              FROM t0 WHERE doc_id < {ENCODE_DOCS}),
        e AS (SELECT doc_id, pos, toks[pos + 1] AS token FROM d)
        SELECT e.doc_id, e.pos, COALESCE(v.token_id, -1) AS token_id
        FROM e LEFT JOIN v ON e.token = v.token
    """,
    tags=("X4", "E2"),
)
def q_vocab_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style id encoding: build a frequency-ranked vocabulary over
    the corpus (top VOCAB_SIZE tokens; deterministic (count DESC, token)
    rank), then encode documents as (pos, token_id) with OOV -> -1.

    Scale shape: the vocab is a count-shuffle over distinct tokens (Zipf:
    tiny vs corpus) + one global sort of that SMALL table; encoding is a
    broadcast hash join of the vocab against the exploded corpus — no
    corpus-side shuffle at any size.  This is exactly how a production
    tokenizer id-maps with a frozen vocab.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    t0 = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    c = (
        t0.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    v = (
        c.withColumn("token_id", (F.row_number().over(w) - 1).cast("long"))
        .filter(F.col("token_id") < VOCAB_SIZE)
        .select("token", "token_id")
    )
    e = (
        t0.filter(F.col("doc_id") < ENCODE_DOCS)
        .select("doc_id", F.posexplode("toks").alias("pos", "token"))
    )
    return (
        e.join(F.broadcast(v), "token", "left")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.col("token_id"), F.lit(-1)).alias("token_id"),
        )
    )


# --- TF-IDF keyword extraction -----------------------------------------------
# Fixed-point, log-free IDF: idf_fp = floor(1e6 * N / df).  A monotone
# transform of N/df, so rankings match classic tf-idf at equal tf; chosen
# over ln() because JVM Math.log and libm log can differ in the last ulp —
# integer outputs make the oracle exact instead of tolerance-based.
TFIDF_TOPK = 3
TFIDF_FP = 1_000_000


@register(
    "text_tfidf_topk",
    oracle=f"""
        WITH t0 AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                    FROM documents),
        e AS (SELECT doc_id, unnest(toks) AS token FROM t0),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM e
               GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM e
               GROUP BY token),
        n AS (SELECT COUNT(*) AS n FROM t0),
        s AS (SELECT tf.doc_id, tf.token,
                     CAST(tf.tf * CAST(floor({TFIDF_FP}.0 * n.n / df.df)
                                       AS BIGINT) AS BIGINT) AS tfidf_fp
              FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
              WHERE tf.doc_id < {ENCODE_DOCS}),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY tfidf_fp DESC, token) AS rnk FROM s)
        SELECT doc_id, token, tfidf_fp, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= {TFIDF_TOPK}
    """,
    tags=("X4", "A1"),
)
def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 distinguishing terms per document.

    The document-frequency table is another Zipf-small aggregate broadcast
    against per-doc term counts; the per-doc top-k is a bounded ranking
    window.  At 100 TB: tf shuffles on (doc, token) — prunable by doc
    partitioning — df is corpus-wide but tiny, and nothing ever holds more
    than one doc's terms in a window frame.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    t0 = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    e = t0.select("doc_id", F.explode("toks").alias("token"))
    tf = e.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = e.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = t0.agg(F.count("*").alias("n"))
    s = (
        tf.filter(F.col("doc_id") < ENCODE_DOCS)
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * F.floor(F.lit(float(TFIDF_FP)) * F.col("n") / F.col("df")).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("tfidf_fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_fp"), F.asc("token"))
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOPK)
    )


# Deterministic messy-URL synthesis: every doc gets a crawl URL whose mess
# (scheme case, default port, tracking params, fragment, trailing slash)
# derives from doc_id — both engines build and clean the SAME strings.
_RAW_URL = (
    "concat(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END, "
    "'://', CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END, "
    "'.example.com', CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END, "
    "'/doc/', CAST(doc_id % 100 AS {int_t}), "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x' "
    "     ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)


def _canon_sql(url: str, duck: bool = False) -> str:
    """Canonicalization as nested replaces/regexes — same rules both
    engines: lowercase, drop fragment, drop utm_* params, drop default
    :443, drop the trailing slash.  DuckDB's regexp_replace is
    FIRST-MATCH-ONLY unless passed the 'g' option (Spark's is global by
    default), so the multi-occurrence utm rule needs the flag there."""
    g = ", 'g'" if duck else ""
    c = f"lower({url})"
    c = f"regexp_replace({c}, '#.*$', '')"
    c = f"regexp_replace({c}, '[?&]utm_[a-z]+=[^&#]*', ''{g})"
    c = f"regexp_replace({c}, ':443/', '/')"
    c = f"regexp_replace({c}, '/$', '')"
    return c


@register(
    "text_url_canonicalize",
    oracle=f"""
        WITH u AS (
            SELECT doc_id,
                   {_canon_sql(_RAW_URL.format(int_t="VARCHAR"), duck=True)} AS canon
            FROM documents)
        SELECT canon, COUNT(*) AS n_dupes,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc
        FROM u GROUP BY canon HAVING COUNT(*) > 1
        ORDER BY canon
    """,
    tags=("F1", "X1"),
)
def q_text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization + URL-level dedup: lowercase scheme/host,
    strip fragments, tracking (utm_*) params, default ports, and trailing
    slashes, then group — the normalization EVERY crawl pipeline runs
    before URL-keyed dedup, because 'HTTPS://Host…?utm_source=…' and
    'https://host…' are the same fetch.

    All regexp_replace codegen (no UDF); the dedup is one shuffle on the
    canonical string (md5 it first at 100 TB).  The messy URLs are
    synthesized deterministically from doc_id on BOTH engines, so the
    oracle checks the cleaning rules themselves.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.expr(_canon_sql(_RAW_URL.format(int_t="STRING"))).alias("canon"),
    )
    return (
        u.groupBy("canon")
        .agg(
            F.count("*").alias("n_dupes"),
            F.min("doc_id").cast("long").alias("keep_doc"),
        )
        .filter(F.col("n_dupes") > 1)
        .orderBy("canon")
    )
