"""WordPiece greedy longest-match semantics, pinned against an
independent pure-Python reference (the tests/test_tokenizer.py treatment
applied to the third tokenizer family)."""

from __future__ import annotations

import math


def _ref_vocab(word_counts: dict[str, int], max_len: int, denom: int):
    """Reference vocabulary: prefixes / interior substrings (length <=
    max_len) at weighted frequency >= total/denom; single chars always."""
    total = sum(word_counts.values())
    init: dict[str, int] = {}
    cont: dict[str, int] = {}
    for w, c in word_counts.items():
        for ln in range(1, min(max_len, len(w)) + 1):
            init[w[:ln]] = init.get(w[:ln], 0) + c
        for j in range(1, len(w)):
            for ln in range(1, min(max_len, len(w) - j) + 1):
                piece = w[j : j + ln]
                cont[piece] = cont.get(piece, 0) + c
    keep_i = {p for p, wc in init.items() if len(p) == 1 or wc * denom >= total}
    keep_c = {p for p, wc in cont.items() if len(p) == 1 or wc * denom >= total}
    return keep_i, keep_c


def _ref_encode(word: str, init: set, cont: set, max_len: int) -> list[str]:
    out, pos = [], 0
    while pos < len(word):
        pieces = init if pos == 0 else cont
        for ln in range(min(max_len, len(word) - pos), 0, -1):
            if word[pos : pos + ln] in pieces:
                out.append(word[pos : pos + ln])
                pos += ln
                break
        else:
            raise AssertionError("unreachable: single chars always in vocab")
    return out


def test_greedy_prefers_longest_and_crosses_words() -> None:
    counts = {"customer": 900, "column": 900, "group": 900, "dup": 20}
    init, cont = _ref_vocab(counts, 3, 100)
    # frequent word chunks greedily in 3s
    assert _ref_encode("customer", init, cont, 3) == ["cus", "tom", "er"]
    # the rare word's own prefixes miss the 1% bar, but "up" is frequent
    # INSIDE "group", so "dup" borrows it as a continuation — the
    # cross-word subword sharing that makes WordPiece WordPiece
    assert "dup" not in init and "du" not in init
    assert _ref_encode("dup", init, cont, 3) == ["d", "up"]


def test_vocab_threshold_is_scale_invariant() -> None:
    counts = {"customer": 900, "column": 900, "group": 900, "dup": 20}
    v1 = _ref_vocab(counts, 3, 100)
    v10 = _ref_vocab({w: c * 10 for w, c in counts.items()}, 3, 100)
    assert v1 == v10


def test_engine_matches_reference_on_fixture(spark) -> None:
    """The registered query's per-doc totals must equal the reference
    encoder run over the same corpus."""
    import os

    import pytest

    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        pytest.skip("sf0.01 documents fixture not present")
    from collections import Counter

    from flinkexp_spark.catalog.tokenizer_wordpiece import (
        WP_DENOM,
        WP_MAX_LEN,
    )
    from flinkexp_spark.registry import queries

    rows = (
        queries()["tokenizer_wordpiece_encode"](
            spark, "/root/testdata/sf0.01"
        )
        .collect()
    )
    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    wc: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for r in docs:
        toks = [t for t in r["text"].lower().split() if t]
        per_doc[r["doc_id"]] = toks
        wc.update(toks)
    init, cont = _ref_vocab(dict(wc), WP_MAX_LEN, WP_DENOM)
    memo = {
        w: len(_ref_encode(w, init, cont, WP_MAX_LEN)) for w in wc
    }
    expect = {
        d: (len(ts), sum(memo[t] for t in ts), max(memo[t] for t in ts))
        for d, ts in per_doc.items()
        if ts
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["max_word_pieces"])
        for r in rows
    }
    assert got == expect
    # sanity: the fixture really exercises multi-piece segmentation
    assert max(v[2] for v in got.values()) >= 2
    assert not math.isnan(sum(v[1] for v in got.values()))
