"""BPE training: the distributed merge loop must EXACTLY reproduce a
pure-Python reference implementation (same histogram, same tiebreak,
same left-to-right merge scan)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog.tokenizer import BPE_MERGES, train_bpe_merges
from flinkexp_spark.functions import text as T


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    hist = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for toks, n in hist.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += n
        if not pairs:
            break
        # max support, then lexicographically smallest pair
        (a, b), support = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = a + b
        merges.append((rank, a, b, merged, support))
        new_hist: dict[tuple, int] = {}
        for toks, n in hist.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2  # scan continues AFTER the fused token
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            new_hist[key] = new_hist.get(key, 0) + n
        hist = new_hist
    return merges


def test_bpe_matches_pure_python_reference(spark, sf_dir):
    docs = datasets.load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    counts = {r.word: r.n for r in words.collect()}
    expected = _reference_bpe(counts, BPE_MERGES)
    got = train_bpe_merges(spark, words, BPE_MERGES)
    assert got == expected


def test_bpe_fold_handles_runs_like_reference_scan(spark):
    """[a,a,a] under (a,a)->aa must give [aa,a] (scan-from-i+2), and
    [a,a,a,a] must give [aa,aa] — the fold must not re-merge the fused
    token with the element that follows it."""
    words = spark.createDataFrame([("aaa", 1), ("aaaa", 1)], "word string, n long")
    merges = train_bpe_merges(spark, words, 1)
    assert merges[0][1:4] == ("a", "a", "aa")
    # support: 'aaa' has 2 adjacent pairs, 'aaaa' has 3
    assert merges[0][4] == 5


def test_bpe_encode_matches_reference_apply(spark, sf_dir):
    """The encode fold must subword-tokenize exactly like applying the
    reference merges with the reference scan."""
    from flinkexp_spark.catalog.tokenizer import apply_bpe_merges

    docs = datasets.load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    counts = {r.word: r.n for r in words.collect()}
    merges = _reference_bpe(counts, BPE_MERGES)

    def ref_encode(word: str) -> int:
        toks = list(word)
        for _, a, b, merged, _ in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    sample = sorted(counts)[:200]
    wdf = spark.createDataFrame([(w,) for w in sample], "word string")
    got = {
        r.word: r.n
        for r in wdf.select(
            "word",
            F.size(
                apply_bpe_merges(
                    F.expr(
                        "transform(sequence(1, length(word)), "
                        "i -> substring(word, i, 1))"
                    ),
                    merges,
                )
            ).alias("n"),
        ).collect()
    }
    for w in sample:
        assert got[w] == ref_encode(w), w


def test_bpe_ignores_empty_words(spark):
    """sequence(1,0) is DESCENDING in Spark — an unguarded char split turns
    '' into ['',''], manufacturing a phantom ('','') pair.  The guard must
    keep empty words contributing zero pairs, like the reference."""
    words = spark.createDataFrame(
        [("", 1000), ("ab", 1)], "word string, n long"
    )
    merges = train_bpe_merges(spark, words, 1)
    assert merges == [(0, "a", "b", "ab", 1)]


def test_batched_selection_is_exact_vs_sequential_bpe():
    """Pure-Python fuzz: the batched acceptance rule in
    _select_exact_batch must reproduce sequential BPE's merge sequence
    EXACTLY on adversarial tiny-alphabet corpora (run-heavy words are
    where the self-pair stop rule earns its keep — seed sweep includes
    the {'bbb': 41} class that broke the first draft)."""
    import random
    from collections import Counter

    from flinkexp_spark.catalog.tokenizer import _select_exact_batch

    def seq(words, n):
        toks = {w: list(w) for w in words}
        out = []
        for _ in range(n):
            c = Counter()
            for w, cnt in words.items():
                t = toks[w]
                for i in range(len(t) - 1):
                    c[(t[i], t[i + 1])] += cnt
            if not c:
                break
            (a, b), s = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((a, b, s))
            for w in toks:
                t = toks[w]
                r = []
                i = 0
                while i < len(t):
                    if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                        r.append(a + b)
                        i += 2
                    else:
                        r.append(t[i])
                        i += 1
                toks[w] = r
        return out

    def batched(words, n, k):
        toks = {w: list(w) for w in words}
        out = []
        rounds = 0
        while len(out) < n:
            c = Counter()
            for w, cnt in words.items():
                t = toks[w]
                for i in range(len(t) - 1):
                    c[(t[i], t[i + 1])] += cnt
            if not c:
                break
            rows = sorted(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )[: k + 1]
            rounds += 1
            floor = rows[-1][1] if len(rows) == k + 1 else 0
            batch = _select_exact_batch(
                [{"a": a, "b": b, "support": s} for (a, b), s in rows[:k]],
                floor,
                n - len(out),
            )
            for a, b, s in batch:
                out.append((a, b, s))
                for w in toks:
                    t = toks[w]
                    r = []
                    i = 0
                    while i < len(t):
                        if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                            r.append(a + b)
                            i += 2
                        else:
                            r.append(t[i])
                            i += 1
                    toks[w] = r
        return out, rounds

    for seed in range(400):
        rng = random.Random(seed)
        words = {}
        alpha = "abcdef"[: rng.randint(1, 6)]
        for _ in range(rng.randint(1, 40)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
            words[w] = words.get(w, 0) + rng.randint(1, 50)
        n = rng.randint(1, 15)
        want = seq(dict(words), n)
        got, _ = batched(dict(words), n, rng.choice([2, 4, 16]))
        assert got == want, f"seed={seed} words={words} n={n}"


def test_batched_training_cuts_spark_rounds(spark, sf_dir):
    """The driver-cadence win itself: training BPE_MERGES merges on the
    fixture corpus must take FEWER pair-count Spark rounds than merges
    (the whole point of VERDICT r6 #5), while the learned table stays
    exactly the sequential reference's (pinned above)."""
    docs = datasets.load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    got = train_bpe_merges(spark, words, BPE_MERGES)
    assert len(got) == BPE_MERGES
    rounds = train_bpe_merges.last_rounds
    assert rounds < BPE_MERGES, (
        f"batching never engaged: {rounds} rounds for {BPE_MERGES} merges"
    )
