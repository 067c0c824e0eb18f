"""Text hashing & dedup primitives: tokenize, shingle, MinHash, SimHash,
rolling-hash fingerprints (SURVEY §2.3 X1/X2/X4).

Reference analog: none exercised (the reference's only text op is the
word-count split, StreamSocket.scala:15); these are the north-star
training-data-pipeline operators mandated by BASELINE.json.

Algorithms (public literature): MinHash resemblance + banding LSH follow
Broder, "On the resemblance and containment of documents" (1997) and the
banding analysis in Leskovec/Rajaraman/Ullman, *Mining of Massive
Datasets* ch. 3; SimHash follows Charikar, "Similarity estimation
techniques from rounding algorithms" (STOC 2002) with the 2-of-4 byte-band
pigeonhole trick from Manku/Jain/Sarma, "Detecting near-duplicates for web
crawling" (WWW 2007); the rolling fingerprint is Karp–Rabin.

**Cross-engine hash contract.** Every hash in this module is derived from
``md5`` — the one cryptographic hash Spark and DuckDB both expose with
identical output — via::

    h(s) = int(hex(md5(s))[0:15], 16) % P        # P = 2^31 - 1

15 hex digits = 60 bits, always positive in int64; both engines compute the
identical value (verified: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``).  All MinHash /
SimHash / fingerprint arithmetic stays below 2^62 so int64 never overflows.
Each helper has a ``*_sql`` twin generating the equivalent DuckDB SQL from
the SAME Python constants — single source of truth for engine and oracle.

**Scale notes.** Signatures are computed with array lambdas
(``transform``/``aggregate``) entirely inside whole-stage codegen — zero
shuffles and zero Python until the LSH band join.  The band join shuffles
on (band_idx, band_key), i.e. candidate generation is O(colliding pairs),
never O(n²); a document-frequency cap bounds hot-shingle blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared constants (single source of truth for Spark AND oracle SQL)
# ---------------------------------------------------------------------------

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime); all hash values live in [0, P)
N_MINHASH = 16
BANDS = 8
ROWS_PER_BAND = 2  # 8 bands x 2 rows: threshold s ~ (1/8)^(1/2) ~ 0.35

# Fixed affine coefficients for the N_MINHASH permutations h_i(x) = (a*x+b)%P.
MINHASH_A = [(81_001 * (i + 1) * 2 + 1) % P for i in range(N_MINHASH)]
MINHASH_B = [(1_234_577 * (i + 1)) % P for i in range(N_MINHASH)]

SIMHASH_BITS = 32
SHINGLE_K = 3  # words per shingle
FP_BASE = 31  # rolling-hash base


# ---------------------------------------------------------------------------
# scalar hash
# ---------------------------------------------------------------------------

def h64(c: Column) -> Column:
    """md5-derived hash of a string column into [0, P) — see module doc."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % P


def h64_sql(expr: str) -> str:
    return f"(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) % {P})"


# ---------------------------------------------------------------------------
# tokenize / shingle (array-valued, no explode -> no shuffle)
# ---------------------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Non-empty whitespace tokens, lowercased."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split_regex(lower({expr}), '\\s+'), x -> x <> '')"


def shingles(toks: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles as strings; empty array when fewer than k tokens.

    ``toks`` is bound to a lambda variable through a 1-element outer
    ``transform`` before any per-shingle work: higher-order-function
    lambdas re-evaluate every captured (non-lambda-variable) expression
    on EACH element invocation, so when callers pass a computed
    expression (the usual ``tokens(col)`` regex split), referencing it
    directly inside the per-index lambda re-ran the split k times per
    shingle — O(|doc|^2) splits per document.  Binding first makes the
    split evaluate exactly once per row (measured: the shingle-family
    dedup queries dropped ~10x at sf0.1).
    """

    def over(arr: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(arr) - k)
        join_k = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(arr, i + j + 1) for j in range(k)]
        )
        return F.when(F.size(arr) >= k, F.transform(idx, join_k)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(toks), over), 1)


def shingles_sql(toks_expr: str, k: int = SHINGLE_K) -> str:
    """``toks_expr`` must be a plain column reference (DuckDB lambdas capture
    outer columns by name)."""
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN "
        f"list_transform(range(len({toks_expr}) - {k - 1}), i -> {parts})"
        f" ELSE CAST([] AS VARCHAR[]) END"
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH bands
# ---------------------------------------------------------------------------

def _affine(a: int, b: int):
    # Factory (not default-arg capture): Spark checks lambda arity by signature.
    return lambda h: (F.lit(a) * h + F.lit(b)) % P


def minhash_cols(shingle_col: Column) -> list[Column]:
    """N_MINHASH min-hash values over a shingle array (NULL if no shingles)."""
    hashes = F.transform(shingle_col, h64)
    return [
        F.array_min(F.transform(hashes, _affine(a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def hashed_shingles_sql(shingles_expr: str) -> str:
    """The md5->int64 hash list over a shingle array — the shared inner
    term of every ``minhash_cols_sql`` signature.  Hoist it into its own
    CTE column once per document: inlined per-signature, DuckDB re-runs
    the md5 pass N_MINHASH times per row (r15; the engine side has hashed
    shingles exactly once since r14's pre-hashed ``hs`` projection)."""
    return f"list_transform({shingles_expr}, s -> {h64_sql('s')})"


def minhash_cols_sql(
    shingles_expr: str, hashes_expr: str | None = None
) -> list[str]:
    """N_MINHASH signature expressions.  ``hashes_expr``: a column already
    holding :func:`hashed_shingles_sql` of the shingles — same h64 values
    through the same affine maps and ``list_min``, so signatures are
    bit-identical to the inline form."""
    hs = hashes_expr or hashed_shingles_sql(shingles_expr)
    return [
        f"list_min(list_transform({hs}, h -> ({a} * h + {b}) % {P})) AS mh_{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def band_key(sig_cols: list[str], band: int) -> Column:
    """Band key = md5 over the band's ROWS_PER_BAND signature values."""
    lo = band * ROWS_PER_BAND
    return F.md5(
        F.concat_ws(
            "-", *[F.col(c).cast("string") for c in sig_cols[lo : lo + ROWS_PER_BAND]]
        )
    )


def band_key_sql(band: int) -> str:
    lo = band * ROWS_PER_BAND
    parts = ", ".join(f"CAST(mh_{j} AS VARCHAR)" for j in range(lo, lo + ROWS_PER_BAND))
    return f"md5(concat_ws('-', {parts}))"


def _widen(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Repartition up to the session's core count when the scan produced
    fewer splits than cores.

    CPU-heavy hash stages inherit the SCAN's parallelism (splits =
    bytes / maxPartitionBytes) — a small-but-expensive input (one parquet
    file, thousands of docs) otherwise runs single-core.  The added shuffle
    moves raw rows once and is trivially cheaper than serializing the hash
    work (measured 4x at sf0.1).  At 100 TB the scan yields plenty of
    splits and this is a no-op.

    ``min_bytes``: skip the widen when the plan-estimated input is smaller
    — for per-row work light enough (e.g. one K-way cosine fold per row)
    that below a few MB the extra exchange + stage costs more than the
    serialized compute it saves (r15 interleaved A/B: widening the 0.5 MB
    sf0.1 embedding scan cost the IVF family ~1.7 s/run, while the same
    widen on the 5 MB sf1 corpus saved ~1 s/serve).  The estimate is the
    optimizer's sizeInBytes — no job is triggered.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if min_bytes:
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            if int(stats.sizeInBytes()) < min_bytes:
                return df
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        return df
    return df.repartition(target)


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, mh_0..mh_{N-1}) — one row per doc; NULL signature if < K tokens.

    Formulation: explode shingles -> md5-hash ONCE per shingle row -> groupBy
    doc with N cheap integer min-aggregates.  The alternative (array lambdas,
    see :func:`minhash_cols`) evaluates the md5 array once per signature
    component — Catalyst does not CSE the duplicated subexpression, a
    measured 16x slowdown.  The shuffle here is map-side combined (partial
    min) so it moves one row per doc per partition.
    """
    docs = _widen(docs)
    sh = shingles(tokens(F.col(text_col)))
    hashed = docs.select(F.col(id_col), F.explode(sh).alias("s")).select(
        id_col, h64(F.col("s")).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)
    # explode drops zero-shingle docs; restore them with NULL signatures
    return docs.select(id_col).join(sig, id_col, "left")


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 LSH band.

    Shuffles on (band, key): cost is proportional to collisions, not n².
    """
    sig_cols = [f"mh_{i}" for i in range(N_MINHASH)]
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(sig_cols, b).alias("key"))
                    for b in range(BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(toks: Column) -> Column:
    """SIMHASH_BITS-bit SimHash over token hashes (with multiplicity).

    bit_j(doc) = 1  iff  sum over tokens of (+1 if bit_j(h(tok)) else -1) >= 0
    """
    hs = F.transform(toks, h64)
    total = F.size(hs).cast("long")

    def popcount_at(j: int):
        return lambda acc, h: acc + F.shiftrightunsigned(h, j).bitwiseAND(1)

    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        ones = F.aggregate(hs, F.lit(0).cast("long"), popcount_at(j))
        bit = (F.lit(2) * ones >= total).cast("long")
        out = out + F.shiftleft(bit, j)
    return out


def simhash_sql(toks_expr: str) -> str:
    hs = f"list_transform({toks_expr}, s -> {h64_sql('s')})"
    terms = []
    for j in range(SIMHASH_BITS):
        ones = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hs}),"
            f" (acc, h) -> acc + ((h >> {j}) & 1))"
        )
        terms.append(
            f"(CAST(2 * {ones} >= len({hs}) AS BIGINT) << {j})"
        )
    return "(" + " + ".join(terms) + ")"


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def simhash_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sim) — SimHash per doc via explode + grouped bit-count sums.

    Same rationale as :func:`minhash_signatures`: hash each token ONCE,
    then 32 cheap integer aggregates (map-side combined), instead of 32
    array folds each re-hashing every token.
    """
    docs = _widen(docs)
    hashed = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    ).select(id_col, h64(F.col("t")).alias("h"))
    aggs = [
        F.sum(F.shiftrightunsigned(F.col("h"), j).bitwiseAND(1)).alias(f"ones_{j}")
        for j in range(SIMHASH_BITS)
    ] + [F.count("*").alias("total")]
    per_doc = hashed.groupBy(id_col).agg(*aggs)
    sim = sum(
        F.shiftleft(
            (F.lit(2) * F.col(f"ones_{j}") >= F.col("total")).cast("long"), j
        )
        for j in range(SIMHASH_BITS)
    )
    return per_doc.select(F.col(id_col), sim.alias("sim"))


# ---------------------------------------------------------------------------
# rolling-hash fingerprint
# ---------------------------------------------------------------------------

def fingerprint_col(toks: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes (mod P)."""
    hs = F.transform(toks, h64)
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_BASE + h) % P,
    )


def fingerprint_sql(toks_expr: str) -> str:
    hs = f"list_transform({toks_expr}, s -> {h64_sql('s')})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hs}),"
        f" (acc, h) -> (acc * {FP_BASE} + h) % {P})"
    )
