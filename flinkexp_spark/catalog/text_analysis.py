"""X4 text analysis over ``documents``: token stats, quality scoring,
language-ID heuristic, document fingerprinting (SURVEY §2.3).

No reference analog (the reference's text processing is one `split`,
StreamSocket.scala:15); these are north-star training-data operators.
All pure `pyspark.sql.functions` expressions — whole-stage codegen, no
Python in the hot path — with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.functions import text as T
from flinkexp_spark.registry import register

# Marker stopwords per language for the lang-ID heuristic.  The heuristic's
# CONTRACT is "argmax of marker-word hit counts, ties -> 'und'"; it is
# deterministic and mirrored exactly in the oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "es": ["el", "los", "de", "y", "una"],
    "de": ["der", "die", "und", "ein", "zu"],
}

WORD_RE = "[a-z]+"  # BPE-ish alpha runs; same RE2 semantics in both engines


def _marker_count(toks, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _marker_count_sql(toks: str, words: list[str]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"


@register(
    "text_token_stats",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {T.tokens_sql('text')} AS toks,
                          text FROM documents)
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
               CAST(SUM(len(regexp_extract_all(lower(text), '{WORD_RE}')))
                    AS BIGINT) AS total_words,
               CAST(MAX(len(toks)) AS BIGINT) AS max_tokens
        FROM t GROUP BY lang
    """,
    tags=("X4",),
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: token counting — whitespace tokens + regex word runs, per lang."""
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), 0)
    return (
        docs.select("lang", F.size(toks).alias("nt"), F.size(words).alias("nw"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.sum("nw").alias("total_words"),
            F.max(F.col("nt").cast("long")).alias("max_tokens"),
        )
    )


@register(
    "text_quality_profile",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, n_chars,
                          {T.tokens_sql('text')} AS toks FROM documents),
        q AS (SELECT doc_id, source,
                     len(toks) AS n_tokens,
                     round(n_chars * 1.0 / len(toks), 4) AS chars_per_token,
                     round({_marker_count_sql('toks', LANG_MARKERS['en'])}
                           * 1.0 / len(toks), 4) AS stopword_ratio
              FROM t WHERE len(toks) > 0)
        SELECT source,
               COUNT(*) AS n_docs,
               round(AVG(chars_per_token), 4) AS avg_cpt,
               round(AVG(stopword_ratio), 4) AS avg_stopword_ratio,
               CAST(SUM(CASE WHEN n_tokens BETWEEN 20 AND 1000
                             AND stopword_ratio >= 0.01
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
        FROM q GROUP BY source
    """,
    tags=("X4",),
)
def q_text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: quality scoring — length / stopword-ratio heuristics per source.

    A doc passes the quality gate when 20 <= tokens <= 1000 and the
    stopword ratio >= 1% — the length+stopword rule family from Rae et al.,
    "Scaling Language Models: ... Gopher" (2021), Appendix A (public).
    Averages of exact 4-dp-rounded ratios keep both engines identical.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    base = docs.select(
        "source",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        _marker_count(toks, LANG_MARKERS["en"]).alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    q = base.select(
        "source",
        "n_tokens",
        F.round(F.col("n_chars") / F.col("n_tokens"), 4).alias("cpt"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 4).alias("sr"),
    )
    return q.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("cpt"), 4).alias("avg_cpt"),
        F.round(F.avg("sr"), 4).alias("avg_stopword_ratio"),
        F.sum(
            (
                F.col("n_tokens").between(20, 1000) & (F.col("sr") >= 0.01)
            ).cast("long")
        ).alias("n_quality"),
    )


@register(
    "text_lang_id",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {T.tokens_sql('text')} AS toks
                   FROM documents),
        sc AS (SELECT doc_id, lang,
                      {', '.join(f"{_marker_count_sql('toks', ws)} AS s_{lang}" for lang, ws in LANG_MARKERS.items())}
               FROM t),
        pred AS (SELECT doc_id, lang,
                        CASE
                          {' '.join(f"WHEN s_{lang} > greatest({', '.join('s_' + o for o in LANG_MARKERS if o != lang)}) THEN '{lang}'" for lang in LANG_MARKERS)}
                          ELSE 'und' END AS predicted
                 FROM sc)
        SELECT lang, predicted, COUNT(*) AS n
        FROM pred GROUP BY lang, predicted
    """,
    tags=("X4",),
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: language-ID heuristic — argmax of per-language marker-word hits
    (strict winner, ties -> 'und'), confusion counts vs the labeled lang."""
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    sc = docs.select(
        "lang",
        *[
            _marker_count(toks, ws).alias(f"s_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    expr = None
    for lang in LANG_MARKERS:
        others = [F.col(f"s_{o}") for o in LANG_MARKERS if o != lang]
        cond = F.col(f"s_{lang}") > F.greatest(*others)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr.otherwise("und")
    return (
        sc.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


@register(
    "text_fingerprint",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents)
        SELECT doc_id, {T.fingerprint_sql('toks')} AS fp,
               {T.simhash_sql('toks')} AS simhash
        FROM t WHERE doc_id < 200
    """,
    tags=("X4", "X2"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: document fingerprinting — order-sensitive rolling hash (content
    identity) + SimHash (near-identity), per doc."""
    docs = datasets.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        T.fingerprint_col(toks).alias("fp"),
        T.simhash_col(toks).alias("simhash"),
    )


DUP_TOKEN_MAX = 0.65   # ~p90 on the fixtures; Gopher-style repetition gate
TOP_BIGRAM_MAX = 0.09  # ~p95: most-frequent-bigram share of all bigrams


@register(
    "text_repetition_filter",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents),
        s AS (SELECT doc_id, toks,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     round(1 - len(list_distinct(toks))
                               / CAST(len(toks) AS DOUBLE), 6) AS dup_token_frac
              FROM t WHERE len(toks) > 0),
        bg AS (SELECT doc_id, unnest({T.shingles_sql('toks', 2)}) AS g FROM s),
        c AS (SELECT doc_id, g, COUNT(*) AS n FROM bg GROUP BY doc_id, g),
        top AS (SELECT doc_id, round(MAX(n) / CAST(SUM(n) AS DOUBLE), 6)
                       AS top_bigram_frac
                FROM c GROUP BY doc_id)
        SELECT s.doc_id, s.n_tokens, s.dup_token_frac,
               COALESCE(top.top_bigram_frac, 0.0) AS top_bigram_frac,
               (s.dup_token_frac <= {DUP_TOKEN_MAX}
                AND COALESCE(top.top_bigram_frac, 0.0) <= {TOP_BIGRAM_MAX})
                   AS keep
        FROM s LEFT JOIN top USING (doc_id)
    """,
    tags=("X4",),
)
def q_text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: repetition-based quality gate (the Gopher/RefinedWeb signal
    family): per-doc duplicate-token fraction and most-frequent-bigram
    share, plus the keep/drop verdict.

    Both signals are per-document, so the plan is one scan + one
    (doc_id, bigram) two-level aggregate — shuffle keyed on doc_id only,
    map-side combined, no cross-document state; at 100 TB it scales like
    any grouped agg.  Array-native distinct for the token signal keeps
    that branch shuffle-free entirely.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    base = docs.select("doc_id", T.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    stats = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.round(
            1 - F.size(F.array_distinct("toks")) / F.size("toks").cast("double"), 6
        ).alias("dup_token_frac"),
    )
    bigrams = base.select("doc_id", F.explode(T.shingles(F.col("toks"), 2)).alias("g"))
    top = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.round(F.max("n") / F.sum("n").cast("double"), 6).alias("top_bigram_frac"))
    )
    return (
        stats.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            (
                (F.col("dup_token_frac") <= DUP_TOKEN_MAX)
                & (F.coalesce("top_bigram_frac", F.lit(0.0)) <= TOP_BIGRAM_MAX)
            ).alias("keep"),
        )
    )


# --- corpus-statistics fluency score -----------------------------------------
# Language-model-style quality signal without a model: a document whose
# bigrams are common across the corpus reads as natural text; one full of
# rare bigrams is noise/boilerplate-mangled.  Score = mean corpus document
# frequency of the doc's bigrams, in fixed point (x1000, integer floor) so
# both engines produce identical BIGINTs — no log()/float-mean drift.
FLUENCY_REPORT_DOCS = 100
FLUENCY_FP = 1000


@register(
    "text_bigram_fluency",
    oracle=f"""
        WITH t0 AS (SELECT doc_id, {{toks}} AS toks FROM documents),
        bg AS (
            SELECT doc_id, unnest({{bigrams}}) AS bigram FROM t0),
        df AS (SELECT bigram, COUNT(DISTINCT doc_id) AS df FROM bg
               GROUP BY bigram),
        scored AS (
            SELECT bg.doc_id, df.df
            FROM bg JOIN df ON bg.bigram = df.bigram
            WHERE bg.doc_id < {FLUENCY_REPORT_DOCS})
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(floor(SUM(df) * {FLUENCY_FP}.0 / COUNT(*)) AS BIGINT)
                   AS fluency_fp
        FROM scored GROUP BY doc_id
    """.format(toks=T.tokens_sql("text"), bigrams=T.shingles_sql("toks", 2)),
    tags=("X4", "A1"),
)
def q_text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: corpus-statistics fluency scoring — mean bigram document
    frequency per document, the model-free analog of a perplexity filter
    (rare-bigram documents rank low, like high-perplexity ones).

    Scale shape: the bigram DF table is Zipf-shaped but grows with corpus
    (unlike the unigram vocab), so the join is left UNHINTED — AQE
    broadcasts it while it fits the threshold and falls back to a hash
    join on the bigram key beyond that.  The per-doc mean is one
    map-side-combinable aggregation.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    t0 = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    # T.shingles(k=2) is the one bigram definition shared with the oracle
    # (T.shingles_sql) and with text_repetition_filter; it yields an empty
    # array below 2 tokens, so explode drops those docs without a filter.
    bg = t0.select(
        "doc_id", F.explode(T.shingles(F.col("toks"), 2)).alias("bigram")
    )
    df = bg.groupBy("bigram").agg(F.countDistinct("doc_id").alias("df"))
    scored = bg.filter(F.col("doc_id") < FLUENCY_REPORT_DOCS).join(df, "bigram")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.sum("df") * float(FLUENCY_FP) / F.count("*"))
        .cast("long")
        .alias("fluency_fp"),
    )


CPT_MIN, CPT_MAX = 3.0, 12.0  # chars-per-token sanity band (C4-family gate)


@register(
    "text_quality_ensemble",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, n_chars,
                          {T.tokens_sql('text')} AS toks FROM documents),
        q AS (SELECT source,
                     (len(toks) BETWEEN 20 AND 1000) AS len_ok,
                     (round({_marker_count_sql('toks', LANG_MARKERS['en'])}
                            * 1.0 / len(toks), 4) >= 0.01) AS stop_ok,
                     (round(n_chars * 1.0 / len(toks), 4)
                          BETWEEN {CPT_MIN} AND {CPT_MAX}) AS cpt_ok,
                     (round(1 - len(list_distinct(toks))
                                / CAST(len(toks) AS DOUBLE), 6)
                          <= {DUP_TOKEN_MAX}) AS rep_ok
              FROM t WHERE len(toks) > 0)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN len_ok AND stop_ok AND cpt_ok AND rep_ok
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(SUM(CASE WHEN NOT len_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_len,
               CAST(SUM(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_stop,
               CAST(SUM(CASE WHEN NOT cpt_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_cpt,
               CAST(SUM(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_rep
        FROM q GROUP BY source
    """,
    tags=("X4",),
)
def q_text_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the full quality-gate ENSEMBLE in one scan — length band,
    stopword ratio, chars-per-token sanity band, and duplicate-token
    repetition, with per-source pass/fail attribution (which gate kills
    which docs — the dashboard a corpus curator actually monitors).

    Every signal is array-native arithmetic on the tokens of ONE scan: no
    joins, no second pass, one groupBy(source) with map-side combine — at
    100 TB this runs at scan speed, unlike signal-per-query pipelines that
    rescan the corpus per gate.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    base = docs.select(
        "source",
        "n_chars",
        F.size(toks).alias("nt"),
        _marker_count(toks, LANG_MARKERS["en"]).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("nd"),
    ).filter(F.col("nt") > 0)
    len_ok = F.col("nt").between(20, 1000)
    stop_ok = F.round(F.col("n_stop") / F.col("nt"), 4) >= 0.01
    cpt_ok = F.round(F.col("n_chars") / F.col("nt"), 4).between(CPT_MIN, CPT_MAX)
    rep_ok = (
        F.round(1 - F.col("nd") / F.col("nt").cast("double"), 6) <= DUP_TOKEN_MAX
    )

    def n_where(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        n_where(len_ok & stop_ok & cpt_ok & rep_ok, "n_pass"),
        n_where(~len_ok, "n_fail_len"),
        n_where(~stop_ok, "n_fail_stop"),
        n_where(~cpt_ok, "n_fail_cpt"),
        n_where(~rep_ok, "n_fail_rep"),
    )


# --- hashed linear classifier (fastText-style inference) --------------------
# A quality classifier in production LLM pipelines is usually a linear model
# over hashed bag-of-words features (fastText / logistic regression).  The
# weights here are a deterministic fixture stand-in; the INFERENCE mechanics
# are the real thing: hash token -> bucket, gather weight, fold.  D is tiny
# for the fixture; at scale D is millions of buckets and the weight vector is
# a broadcast array — the plan shape is identical.
CLF_D = 64
CLF_WEIGHTS = [round((j * 37 % 97) / 97 - 0.5, 6) for j in range(CLF_D)]
CLF_BIAS = 0.05


@register(
    "text_classifier_score",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, {T.tokens_sql('text')} AS toks
                   FROM documents),
        w AS (SELECT doc_id, source,
                     list_transform(toks, x ->
                         CAST({list(CLF_WEIGHTS)}[
                             CAST(({T.h64_sql('x')} % {CLF_D}) AS BIGINT) + 1]
                         AS DOUBLE)) AS ws
              FROM t WHERE len(toks) > 0)
        SELECT doc_id, source,
               round(list_reduce(ws, (acc, x) -> acc + x) / len(ws)
                     + {CLF_BIAS}, 4) + 0.0 AS clf_score,
               (list_reduce(ws, (acc, x) -> acc + x) / len(ws)
                     + {CLF_BIAS}) > 0 AS keep
        FROM w
    """,
    tags=("X4", "U1"),
)
def q_text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: hashed-bag-of-words linear classifier inference, zero Python.

    score(doc) = mean over tokens of W[h(token) % D] + bias.  The weight
    gather is `element_at` on a broadcast literal array inside a codegen
    array lambda; the per-doc mean is a LEFT FOLD (F.aggregate), mirrored
    by DuckDB's list_reduce so the IEEE summation order — and therefore
    the hash — is bit-identical.  One scan, no shuffle, no UDF.

    Both sides add ``+ 0.0`` after the round: a doc whose score rounds to
    zero from below yields -0.0 in DuckDB but +0.0 in Spark (BigDecimal has
    no signed zero); IEEE -0.0 + 0.0 = +0.0 normalizes both (seen at sf1,
    where the suffix-marker tokens push some means into (-5e-5, 0)).
    """
    docs = datasets.load(spark, sf_dir, "documents")
    warr = F.array(*[F.lit(w) for w in CLF_WEIGHTS])
    toks = T.tokens(F.col("text"))
    ws = F.transform(
        toks, lambda x: F.element_at(warr, (T.h64(x) % CLF_D + 1).cast("int"))
    )
    score = (
        F.aggregate(ws, F.lit(0.0), lambda acc, x: acc + x) / F.size(ws)
        + CLF_BIAS
    )
    return (
        docs.filter(F.size(toks) > 0)
        .select(
            "doc_id",
            "source",
            (F.round(score, 4) + F.lit(0.0)).alias("clf_score"),
            (score > 0).alias("keep"),
        )
    )


# --- count-min sketch (deterministic, md5-hash rows) ------------------------
# The classic mergeable heavy-hitter sketch (Cormode & Muthukrishnan 2005):
# d independent hash rows of w counters; estimate = min over rows.  Rows are
# salted md5 hashes (functions/text.h64), so the ENTIRE sketch — build and
# probe — is reproducible in ANSI SQL and the estimates hash-match exactly.
CMS_D = 4    # hash rows
CMS_W = 256  # buckets per row
CMS_PROBES = ("join", "spark", "vector", "qqqzzz")  # last never occurs -> est 0


def _cms_bucket(r: int, word):
    return (T.h64(F.concat(F.lit(f"cms{r}|"), word)) % CMS_W).cast("int")


def _cms_bucket_sql(r: int, word_expr: str) -> str:
    salted = f"concat('cms{r}|', {word_expr})"
    return f"CAST({T.h64_sql(salted)} % {CMS_W} AS INT)"


def _cms_oracle() -> str:
    probes = ", ".join(f"('{w}')" for w in CMS_PROBES)
    bucket_rows = " UNION ALL ".join(
        f"SELECT word, {r} AS r, {_cms_bucket_sql(r, 'word')} AS bucket"
        f" FROM probes"
        for r in range(CMS_D)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_bucket_sql(r, 'word')} AS bucket,"
        f" COUNT(*) AS c FROM toks GROUP BY 2"
        for r in range(CMS_D)
    )
    return f"""
        WITH toks AS (
            SELECT unnest({T.tokens_sql('text')}) AS word FROM documents),
        sketch AS ({sketch_rows}),
        probes(word) AS (VALUES {probes}),
        pb AS ({bucket_rows}),
        est AS (
            SELECT pb.word, MIN(COALESCE(s.c, 0)) AS est
            FROM pb LEFT JOIN sketch s ON pb.r = s.r AND pb.bucket = s.bucket
            GROUP BY pb.word),
        tru AS (
            SELECT word, COUNT(*) AS true_count FROM toks
            WHERE word IN ({", ".join(f"'{w}'" for w in CMS_PROBES)})
            GROUP BY word)
        SELECT est.word,
               CAST(est AS BIGINT) AS est,
               CAST(COALESCE(true_count, 0) AS BIGINT) AS true_count,
               est >= COALESCE(true_count, 0) AS never_underestimates
        FROM est LEFT JOIN tru ON est.word = tru.word
    """


@register("sketch_count_min", oracle=_cms_oracle(), tags=("A4", "X4"))
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + probe, bit-deterministic across engines.

    At 100 TB the d×w counter grid is the point: per-partition grids
    merge by cell-wise addition (here: one groupBy over (row, bucket) —
    map-side combined), the sketch is O(d·w) regardless of corpus size,
    and any token's frequency estimate costs d lookups.  The one-sided
    error guarantee (never underestimates) is emitted as a checked column.

    Both the sketch and the probes' true counts derive from ONE word-count
    histogram (guide §2.3 aggregate-before-shuffle / §2.4): the corpus is
    tokenized once, collapsed map-side to per-word counts, and the d
    bucket hashes run per DISTINCT word (weight = its count) instead of
    per token — cell totals are identical (sum of per-word counts per
    cell == count of tokens per cell), and the true-count branch is a
    filter on the same histogram rather than a second full tokenize scan.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.col("text"))).alias("word")
    )
    # one tokenize pass -> per-word counts (map-side combined); feeds both
    # the sketch build and the probes' exact counts
    hist = toks.groupBy("word").agg(F.count("*").alias("n")).localCheckpoint()
    cells = hist.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cms_bucket(r, F.col("word")).alias("bucket")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("cell.r", "cell.bucket", "n")
    sketch = cells.groupBy("r", "bucket").agg(F.sum("n").alias("c"))
    probes = datasets.local_df(
        spark, [(w,) for w in CMS_PROBES], "word string"
    )
    pb = probes.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cms_bucket(r, F.col("word")).alias("bucket")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("word", "cell.r", "cell.bucket")
    est = (
        pb.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    tru = (
        hist.filter(F.col("word").isin(*CMS_PROBES))
        .select("word", F.col("n").alias("true_count"))
    )
    return est.join(tru, "word", "left").select(
        "word",
        F.col("est").cast("long").alias("est"),
        F.coalesce(F.col("true_count"), F.lit(0)).cast("long").alias("true_count"),
        (F.col("est") >= F.coalesce(F.col("true_count"), F.lit(0))).alias(
            "never_underestimates"
        ),
    )


_ZIPF_RANKS = 500  # fit over the top-R ranks (the linear regime)


@register(
    "text_zipf_fit",
    oracle=f"""
        WITH hist AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest({T.tokens_sql('text')}) AS word
                  FROM documents)
            GROUP BY word),
        ranked AS (
            SELECT word, n,
                   row_number() OVER (ORDER BY n DESC, word) AS rnk
            FROM hist),
        pts AS (
            SELECT CAST(FLOOR(ln(rnk) * 1000000) AS BIGINT) AS lx,
                   CAST(FLOOR(ln(n) * 1000000) AS BIGINT) AS ly
            FROM ranked WHERE rnk <= {_ZIPF_RANKS}),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(lx) AS BIGINT) AS sx,
                   CAST(SUM(ly) AS BIGINT) AS sy,
                   CAST(SUM(lx * lx) AS BIGINT) AS sxx,
                   CAST(SUM(lx * ly) AS BIGINT) AS sxy
            FROM pts)
        SELECT k AS n_ranks,
               CAST(FLOOR(1000.0 * (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    AS BIGINT) AS slope_x1000
        FROM m
    """,
    tags=("A5", "W1", "X4"),
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus word histogram: OLS slope of
    log-frequency on log-rank over the top-500 ranks.  Natural text sits
    near slope -1; a corpus drifting toward 0 (too uniform — template
    spam) or strongly steeper (tiny effective vocabulary — boilerplate)
    fails the screen.  The distribution-level companion to the per-doc
    quality scores.

    One corpus tokenize into the word histogram (the same first pass BPE
    training runs), a top-R rank window over the HISTOGRAM (vocabulary-
    sized, not corpus-sized), then exact fixed-point log moments
    (floor(ln * 1e6) as BIGINT — integer sums are order-independent, so
    both engines agree bit-for-bit) with a single final double division.
    """
    hist = (
        datasets.load(spark, sf_dir, "documents")
        .select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    ranked = hist.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("word"))),
    ).filter(F.col("rnk") <= _ZIPF_RANKS)
    pts = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("long")
        .alias("lx"),
        F.floor(F.log(F.col("n").cast("double")) * 1000000)
        .cast("long")
        .alias("ly"),
    )
    m = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
    )
    return m.select(
        F.col("k").alias("n_ranks"),
        F.floor(
            1000.0
            * (
                F.col("k").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("k").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        )
        .cast("long")
        .alias("slope_x1000"),
    )
