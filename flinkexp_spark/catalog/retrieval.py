"""Corpus retrieval operators over ``documents``: BM25 keyword search and an
exact set-similarity join with prefix filtering (AllPairs).

No reference analog (the reference's only text op is the word-count split,
StreamSocket.scala:15); these extend the north-star training-data suite —
keyword retrieval feeds quality-ranked subset selection, and the exact
similarity join is the no-false-negative complement of the capped
inverted-index join in llm_dedup (``dedup_ngram_jaccard``).

Scale design:

* BM25: corpus statistics (N, Σdl, per-term df) reduce to a SINGLE scalar
  row — a map-side-combined global aggregate — which Catalyst broadcasts
  back over the scan (BroadcastNestedLoopJoin of a 1-row side).  Per-doc
  term frequencies are array lambdas inside whole-stage codegen, so the
  whole query is one scan + one 1-row broadcast + TakeOrderedAndProject.
  No posting-list materialization, no per-term shuffle.
* Prefix-filter Jaccard (Bayardo, Ma & Srikant, "Scaling Up All Pairs
  Similarity Search", WWW 2007): a pair at Jaccard >= t MUST share a token
  in either side's (|s| - ceil(t*|s|) + 1)-length prefix when tokens are
  ordered rarest-first, so joining ONLY prefix postings finds every
  qualifying pair with no document-frequency cap and no O(n²) pass.
  Candidates are then verified with the exact intersection.  Shuffles:
  one on shingle (df), one on doc_id (prefix rank), one on shingle
  (candidate join) — all equi-joins, all AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.functions import text as T
from flinkexp_spark.registry import register

# --- BM25 -------------------------------------------------------------------

QUERY_TERMS = ("spark", "vector", "customer")  # fixed query, fixture-hot terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(QUERY_TERMS))
    )
    # identical term order + operand order as the Spark expression: IEEE
    # double arithmetic is then bit-deterministic across engines (ln() may
    # differ in the last ulp -> round(4) absorbs it).
    score = " + ".join(
        f"ln(1.0 + (st.n - st.df{i} + 0.5) / (st.df{i} + 0.5))"
        f" * (d.tf{i} * {BM25_K1 + 1.0})"
        f" / (d.tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / (st.tot / st.n)))"
        for i in range(len(QUERY_TERMS))
    )
    any_tf = " + ".join(f"d.tf{i}" for i in range(len(QUERY_TERMS)))
    return f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents),
        d AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM t),
        st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) AS tot, {df_cols} FROM d)
        SELECT d.doc_id, round({score}, 4) AS bm25
        FROM d, st
        WHERE {any_tf} > 0
        ORDER BY bm25 DESC, d.doc_id
        LIMIT {BM25_TOPK}
    """


@register("search_bm25_topk", oracle=_bm25_oracle(), tags=("X4", "O2"))
def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword retrieval — one scan, one 1-row stats broadcast.

    Term frequencies are per-document array lambdas (no explode, no posting
    shuffle); corpus stats (N, Σdl, df per query term) collapse to one row
    that Catalyst broadcasts back over the scan.  Top-k plans as
    TakeOrderedAndProject (per-partition heap, no global sort).
    """
    docs = datasets.load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        # NB: a (x, t=t) default-arg lambda would be seen by PySpark as the
        # 2-ary (element, index) form — bind the term via a factory instead.
        *[
            F.size(F.filter(toks, (lambda term: lambda x: x == F.lit(term))(t)))
            .alias(f"tf{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
    ).localCheckpoint()  # stats pass + scoring pass share one tokenize
    st = d.agg(
        F.count("*").alias("n"),
        F.sum("dl").cast("double").alias("tot"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    avgdl = F.col("tot") / F.col("n")
    score = None
    for i in range(len(QUERY_TERMS)):
        tf, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(F.lit(1.0) + (F.col("n") - dfi + 0.5) / (dfi + 0.5))
        term = (idf * (tf * (BM25_K1 + 1.0))) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
        score = term if score is None else score + term
    any_tf = sum(F.col(f"tf{i}") for i in range(len(QUERY_TERMS)))
    return (
        d.join(F.broadcast(st))
        .filter(any_tf > 0)
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# --- exact Jaccard join via prefix filtering --------------------------------

# 0.7 keeps every fixture near-dup (all planted pairs sit at j >= 0.8) while
# the prefix shrinks to ~0.3|s|+1 — the threshold is the candidate-volume
# knob of AllPairs (higher t => shorter prefixes => quadratically fewer
# collisions), exactly how it is tuned at corpus scale.
PREFIX_JACCARD_MIN = 0.7
# the replay oracle's integer-exact LENGTH filter (n*10 >= 7*m) is the
# rational form of this threshold — a float ceil(0.7*m) could round past
# the exact boundary and cut a true pair; keep the two in lockstep
assert PREFIX_JACCARD_MIN == 0.7, "update the 10/7 length filter with it"


# brute-proof gate for the dual-chain oracle: every shipped fixture
# (500/500/5000 docs) stays far below it, so the full quadratic
# losslessness proof runs there; sf1's ~100k docs flip to the replay chain.
JACCARD_BRUTE_MAX = 20000


@register(
    "dedup_jaccard_prefix",
    # GATED DUAL-CHAIN oracle (r11's geo_neighbor_pairs_salted pattern,
    # retiring the sf1 exclusion this oracle used to be): below
    # JACCARD_BRUTE_MAX docs the BRUTE-FORCE all-pairs join runs — the
    # prefix filter is lossless (WWW'07 Lemma 1), so the filtered+verified
    # Spark result must equal it exactly; the hash match IS the
    # completeness proof at every shipped fixture.  Above the gate a
    # REPLAY of the AllPairs algebra runs instead (rarest-first posting
    # ranking, |s| - ceil(t|s|) + 1 prefix, candidate join, exact
    # verify), which DuckDB executes in its own plan at sf1's 100k docs
    # where 1e10 intersections are not feasible.  What the at-scale chain
    # no longer re-proves is prefix-filter LOSSLESSNESS — that proof
    # stays with the brute chain at shipped fixtures (gate-flip equality
    # pinned in tests/test_retrieval_dual_chain.py) and with
    # dedup_jaccard_prefix_sf_audit's sampled brute force at sf1.  Each
    # chain's INPUT is gated (constant-false gate = empty scan), so the
    # inactive chain costs nothing.
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents),
        s0 AS (SELECT doc_id, list_distinct({T.shingles_sql('toks')}) AS sh FROM t),
        s AS MATERIALIZED (
            SELECT doc_id, sh, len(sh) AS n FROM s0 WHERE len(sh) > 0),
        gate AS (SELECT COUNT(*) <= {JACCARD_BRUTE_MAX} AS small FROM s),
        sb AS (SELECT * FROM s WHERE (SELECT small FROM gate)),
        pa AS MATERIALIZED (
               -- MATERIALIZED: c is referenced three times downstream; an
               -- inlined CTE re-evaluates list_intersect per reference
               -- inside the final filter (measured 150s of a 164s run)
               SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      len(list_intersect(a.sh, b.sh)) AS c,
                      a.n AS na, b.n AS nb
               FROM sb a JOIN sb b ON a.doc_id < b.doc_id),
        sg AS MATERIALIZED (
            SELECT * FROM s WHERE NOT (SELECT small FROM gate)),
        post AS MATERIALIZED (SELECT doc_id, n, unnest(sh) AS g FROM sg),
        dfreq AS MATERIALIZED (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS gdf,
                   CAST(row_number() OVER (ORDER BY g) AS BIGINT) AS gid
            FROM post GROUP BY g),
        -- verify over dense INTEGER shingle ids, not VARCHAR lists:
        -- list_intersect on BIGINT is ~6x cheaper per candidate pair
        -- (measured 77s -> 15s for 2.4M pairs), and gid is a collision-free
        -- dictionary id (row_number over the distinct-shingle set), so the
        -- intersection COUNT is exactly the string-set count
        sid AS MATERIALIZED (
            SELECT doc_id, any_value(n) AS n, list_sort(list(gid)) AS idv
            FROM post JOIN dfreq USING (g) GROUP BY doc_id),
        pre AS MATERIALIZED (
            SELECT doc_id, g, rn, n FROM (
                SELECT p.doc_id, p.g, p.n,
                       row_number() OVER (PARTITION BY p.doc_id
                                          ORDER BY d.gdf, p.g) AS rn,
                       p.n - CAST(ceil({PREFIX_JACCARD_MIN} * p.n) AS BIGINT)
                           + 1 AS plen
                FROM post p JOIN dfreq d USING (g))
            WHERE rn <= plen),
        -- candidate pruning beyond the bare prefix collision (r13: the
        -- bare DISTINCT join left 19.4M candidates for 250k true pairs
        -- and the verify projection ran 350s single-threaded at sf1):
        --   * LENGTH filter: J >= t forces t*nb <= na <= nb/t, exact in
        --     integers as 10*na >= 7*nb both ways (t = 0.7);
        --   * POSITIONAL upper bound (PPJoin, WWW'08): overlap o <=
        --     matched + min(rest_a, rest_b); at a true pair's FIRST
        --     shared prefix token matched = 1, and MAX over shared
        --     tokens of 1 + min(n - rn) only WEAKENS the bound, so
        --     HAVING it >= the overlap threshold ceil(t/(1+t)*(na+nb))
        --     is lossless.  Together: 19.4M -> ~2M candidates, the sf1
        --     replay 409s -> 73s, output hash-identical (250,500 rows).
        cand AS MATERIALIZED (
                 SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM pre a JOIN pre b
                   ON a.g = b.g AND a.doc_id < b.doc_id
                  AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
                 GROUP BY 1, 2
                 HAVING 1 + MAX(LEAST(a.n - a.rn, b.n - b.rn))
                        >= CEIL({PREFIX_JACCARD_MIN} / (1 + {PREFIX_JACCARD_MIN})
                                * (any_value(a.n) + any_value(b.n)))),
        pb AS MATERIALIZED (
               SELECT k.id_a, k.id_b,
                      len(list_intersect(x.idv, y.idv)) AS c,
                      x.n AS na, y.n AS nb
               FROM cand k
               JOIN sid x ON x.doc_id = k.id_a
               JOIN sid y ON y.doc_id = k.id_b),
        p AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
        SELECT id_a, id_b, round(c * 1.0 / (na + nb - c), 4) AS jaccard
        FROM p WHERE c * 1.0 / (na + nb - c) >= {PREFIX_JACCARD_MIN}
    """,
    tags=("X2",),
)
def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: EXACT Jaccard-threshold self-join via prefix filtering.

    Unlike ``dedup_ngram_jaccard`` (df-capped index — drops hot shingles,
    may miss pairs made only of hot shingles), this is the lossless
    AllPairs algorithm: order each document's shingle set rarest-first and
    index only its first ``|s| - ceil(t*|s|) + 1`` shingles; every pair at
    Jaccard >= t must collide in those prefixes.  Candidates are verified
    with the exact intersection, so the output equals brute force with
    candidate cost ~sum of prefix-posting-list squares, not n².
    """
    docs = datasets.load(spark, sf_dir, "documents")
    return _jaccard_prefix_pairs(docs)


def _jaccard_prefix_pairs(docs: DataFrame) -> DataFrame:
    """The AllPairs pipeline parametrized by the input corpus DF — the
    stratified sf1 audit (q_dedup_jaccard_prefix_sf_audit) runs the
    identical code on its sampled subcorpus."""
    toks = T.tokens(F.col("text"))
    sets = (
        docs.select(
            "doc_id", F.array_distinct(T.shingles(toks)).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .withColumn("n", F.size("sh"))
        # Three plan branches read this table (postings, prefix, verify);
        # materialize once so the scan+shingle pipeline doesn't run 3x.
        # At 100 TB this is the persisted shingle-set table, exactly like
        # the shared MinHash signature table (llm_dedup.signature_table).
        .localCheckpoint()
    )
    post = sets.select("doc_id", "n", F.explode("sh").alias("g"))
    dfreq = post.groupBy("g").agg(F.count("*").alias("gdf"))
    prefix_len = F.col("n") - F.ceil(F.lit(PREFIX_JACCARD_MIN) * F.col("n")) + 1
    prefix = (
        post.join(dfreq, "g")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("gdf", "g")
            ),
        )
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "g", "n", "rn")
    )
    # Candidate pruning beyond the bare prefix collision — the r13 ORACLE
    # optimizations (length filter + PPJoin positional bound, see the
    # oracle comment above), now mirrored engine-side; at sf1 the bare
    # DISTINCT join left 19.4M candidates for 250k true pairs and the
    # exact-intersection verify dominated the whole query (~290 s of the
    # sf1 row).  Both prunes are LOSSLESS, so the verified output is
    # unchanged:
    #   * length: J >= t forces t*nb <= na <= nb/t — exact in integers as
    #     10*n >= 7*m both ways (t = 0.7, pinned above);
    #   * positional (PPJoin, WWW'08): overlap <= matched + min(rest_a,
    #     rest_b); at a true pair's first shared prefix token matched = 1,
    #     and MAX over shared tokens of 1 + min(n - rn) only weakens the
    #     bound.  The overlap threshold ceil(t/(1+t)*(na+nb)) is applied
    #     in exact integers: v >= ceil(7*s/17)  <=>  17*v >= 7*s.
    # The groupBy replaces the old .distinct() — same exchange, extra
    # integer aggregates, ~10x fewer pairs into the verify join.
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") * 10 >= F.col("b.n") * 7)
            & (F.col("b.n") * 10 >= F.col("a.n") * 7),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.max(
                F.least(
                    F.col("a.n") - F.col("a.rn"),
                    F.col("b.n") - F.col("b.rn"),
                )
            ).alias("ub"),
            F.max(F.col("a.n")).alias("na"),
            F.max(F.col("b.n")).alias("nb"),
        )
        .filter(
            F.lit(17) * (F.lit(1) + F.col("ub"))
            >= F.lit(7) * (F.col("na") + F.col("nb"))
        )
        .select("id_a", "id_b")
    )
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    na, nb = F.size("sha"), F.size("shb")
    jac = inter * F.lit(1.0) / (na + nb - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= PREFIX_JACCARD_MIN)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


# --- stratified sf1 audit for the prefix-filter join (r10 verdict #3) -------
# The registered oracle above is the DELIBERATE brute-force O(n²) proof and
# times out at sf1 (100k docs = 1e10 intersections), so the sf1 sweep had
# ZERO losslessness signal there.  This audit runs the IDENTICAL engine
# pipeline on a ~AUDIT_DOC_TARGET-doc subcorpus where brute force is
# feasible.  Sampling must be CONTENT-stratified, not an id stride: the
# fixture's duplicate pairs are sparse (25 at sf0.01) and id-uncorrelated,
# so a uniform stride keeps ~0 of them (measured: m=5 already yields 0) —
# a vacuous 0-vs-0 hash, the r07 geo lesson.  Instead docs are bucketed by
# md5(min shingle): near-dup pairs at j >= t share their minimum shingle
# with probability >= t, so a duplicate CLUSTER lands in one bucket and
# survives sampling together.  Both engines evaluate the same md5-hex
# arithmetic, so the sample sets are identical by construction.  At
# shipped fixtures (n <= target) the modulus is 1 and the audit degrades
# to the full exhaustive proof.
AUDIT_DOC_TARGET = 700


@register(
    "dedup_jaccard_prefix_sf_audit",
    oracle=f"""
        WITH t0 AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                    FROM documents),
        s0 AS (SELECT doc_id, list_distinct({T.shingles_sql('toks')}) AS sh
               FROM t0),
        samp AS (
            SELECT doc_id, sh FROM s0
            WHERE len(sh) > 0
              AND CAST(('0x' || substr(md5(list_aggregate(sh, 'min')), 1, 4))
                       AS BIGINT)
                  % (SELECT greatest(1, COUNT(*) // {AUDIT_DOC_TARGET})
                     FROM documents) = 0),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.sh, b.sh)) AS c,
                     len(a.sh) AS na, len(b.sh) AS nb
              FROM samp a JOIN samp b ON a.doc_id < b.doc_id)
        SELECT id_a, id_b, round(c * 1.0 / (na + nb - c), 4) AS jaccard
        FROM p WHERE c * 1.0 / (na + nb - c) >= {PREFIX_JACCARD_MIN}
    """,
    tags=("X2",),
)
def q_dedup_jaccard_prefix_sf_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified-sample losslessness audit of dedup_jaccard_prefix (see
    the section comment): prefix-filter AllPairs vs brute force on an
    md5(min-shingle)-bucketed subcorpus — the sf1-green row recorded where
    the full-corpus quadratic oracle is excluded."""
    docs = datasets.load(spark, sf_dir, "documents")
    s = max(1, docs.count() // AUDIT_DOC_TARGET)
    toks = T.tokens(F.col("text"))
    sample = (
        docs.withColumn("sh0", F.array_distinct(T.shingles(toks)))
        .filter(F.size("sh0") > 0)
        .filter(
            F.conv(F.substring(F.md5(F.array_min("sh0")), 1, 4), 16, 10)
            .cast("long")
            % s
            == 0
        )
        .drop("sh0")
    )
    return _jaccard_prefix_pairs(sample)


# --- inverted index build ---------------------------------------------------
IDX_MIN_DF = 50  # emit only tokens at/above this document frequency


@register(
    "index_inverted_build",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                   FROM documents),
        post AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM (SELECT doc_id, unnest(toks) AS token FROM t)
               GROUP BY doc_id, token)
        SELECT p.token,
               COUNT(*) AS df,
               CAST(SUM(tf.tf) AS BIGINT) AS total_tf,
               CAST(MIN(p.doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(p.doc_id) AS BIGINT) AS last_doc
        FROM post p JOIN tf ON p.doc_id = tf.doc_id AND p.token = tf.token
        GROUP BY p.token
        HAVING COUNT(*) >= {IDX_MIN_DF}
    """,
    tags=("X4", "A1"),
)
def q_index_inverted_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: (token -> df, Σtf, posting bounds).

    The standing-asset counterpart of `search_bm25_topk`'s one-shot scan:
    at 100 TB the index is built ONCE — explode + one (doc, token) combine
    + one token-key shuffle, then every query is an index lookup instead
    of a corpus scan.  Posting lists would be written bucketed by token
    (the same pay-the-shuffle-once layout as join_bucketed_colocated);
    here the per-token summary stands in for the list payload.
    """
    docs = datasets.load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .filter(F.col("df") >= IDX_MIN_DF)
    )


PHRASE = ("fast", "table")  # the exact 2-gram the phrase query matches


@register(
    "search_phrase_match",
    oracle=f"""
        WITH t AS (SELECT doc_id, {T.tokens_sql('text')} AS toks
                   FROM documents),
        m AS (SELECT doc_id,
                     list_filter(range(1, len(toks)),
                                 i -> toks[i] = '{PHRASE[0]}'
                                  AND toks[i + 1] = '{PHRASE[1]}') AS hits
              FROM t)
        SELECT doc_id,
               CAST(len(hits) AS BIGINT) AS n_matches,
               CAST(list_min(hits) AS BIGINT) AS first_pos,
               CAST(list_max(hits) AS BIGINT) AS last_pos
        FROM m WHERE len(hits) > 0
        ORDER BY n_matches DESC, doc_id
    """,
    tags=("X4", "F1", "P2"),
)
def q_search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search: documents whose token stream contains the
    query words ADJACENT and IN ORDER (the positional-index phrase query
    next to `search_bm25_topk`'s bag-of-words ranking and
    `index_inverted_build`'s df/tf index — positions are what those
    summaries drop).

    Plan shape: ZERO shuffles.  The naive positional-index plan explodes
    (doc, pos, token) and self-joins postings on (doc_id, pos+1); this
    instead evaluates the adjacency predicate INSIDE the row with a
    higher-order array filter over 1-based positions — the whole query
    is scan -> project, embarrassingly parallel, and Catalyst keeps it
    in one WholeStageCodegen span.  At 100 TB the phrase scan runs at
    I/O speed with no exchange at all; a standing positional index (the
    pay-once layout) only wins once the same corpus serves MANY queries.
    Positions are 1-based token offsets; a k-term phrase generalizes by
    chaining k-1 element_at lookaheads.
    """
    docs = datasets.load(spark, sf_dir, "documents")

    # Bind the token array through a 1-element transform (the
    # functions/text.py::shingles trick): a lambda capturing the raw
    # tokens(...) expression would re-run the regex split once PER
    # POSITION — O(|doc|^2) splits per document.
    def over(arr):
        return F.when(
            F.size(arr) >= 2,
            F.filter(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: (F.element_at(arr, i) == PHRASE[0])
                & (F.element_at(arr, i + 1) == PHRASE[1]),
            ),
        ).otherwise(F.array().cast("array<int>"))

    hits = F.element_at(
        F.transform(F.array(T.tokens(F.col("text"))), over), 1
    )
    return (
        docs.select("doc_id", hits.alias("hits"))
        .filter(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("long").alias("n_matches"),
            F.array_min("hits").cast("long").alias("first_pos"),
            F.array_max("hits").cast("long").alias("last_pos"),
        )
        .orderBy(F.desc("n_matches"), "doc_id")
    )
