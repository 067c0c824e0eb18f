#!/usr/bin/env python
"""Generate BENCH_VS_BASELINE.md: measured bench medians vs BASELINE.md rows.

Each BASELINE.md budget row maps to the headline queries that exercise it;
this renders the measured medians (from BENCH_LOCAL.json) against each
budget so the within-2x gate is checkable at a glance.

Run after bench.py: ``python tools/bench_vs_baseline.py``.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# BASELINE.md row -> (budget per entry in seconds, optional GROUP-TOTAL
# budget in seconds, headline queries covered).
ROWS = [
    (
        "relational suite (≤10 s/query, ≤300 s total)",
        10.0,
        300.0,
        [
            "agg_pricing_summary", "sql_tpch_q5", "sql_tpch_q9",
            "join_broadcast_star", "join_bucketed_colocated", "join_asof",
            "join_range_binned", "window_topk_per_group", "func_string",
            "join_salted_skew", "agg_histogram_quantile", "table_fingerprint",
            "geo_neighbor_pairs_salted", "changelog_incremental_join",
            "sample_priority_weighted", "multimodal_decode_jpeg_pixels",
            "quality_t_closeness", "graph_label_propagation",
            "profile_join_skew",
            # r11: QOI decode + unigram-LM encode + perplexity filter ride
            # the per-query gate
            "multimodal_decode_qoi_pixels", "tokenizer_unigram_encode",
            "text_perplexity_filter",
            # r13: the new codec trio + the k-group rank test ride the
            # same per-query gate (codecs are doc_id<100 constant-cost)
            "multimodal_decode_bzip2", "multimodal_decode_tiff_lzw",
            "multimodal_decode_zstd_frames", "stat_kruskal_wallis",
        ],
    ),
    (
        "batch word count (≥100 K rows/s → ≲6 s at sf0.1)",
        6.0,
        None,
        ["wordcount_batch", "wordcount_union", "wordcount_datastream_api"],
    ),
    (
        "streaming window replays (≤60 s)",
        60.0,
        None,
        ["stream_tumbling_window", "stream_session_window", "stream_window_topn"],
    ),
    (
        "streaming word count parity (≤30 s)",
        30.0,
        None,
        ["stream_wordcount_update"],
    ),
    (
        "stream-stream interval join (≤90 s)",
        90.0,
        None,
        ["stream_interval_join", "stream_window_join", "stream_temporal_join"],
    ),
    (
        "MinHash-LSH dedup (≤120 s)",
        120.0,
        None,
        [
            "dedup_exact", "dedup_incremental", "dedup_minhash_lsh",
            "dedup_semantic",
        ],
    ),
    (
        "embedding similarity top-k (≤60 s)",
        60.0,
        None,
        ["sim_search_topk", "sim_search_ivf", "sim_search_ivf2",
         "sim_search_adc_rerank", "embed_quantize_pq",
         "sim_search_ivfpq_adc", "sim_search_ivf_bucketed",
         "sim_search_graph_beam"],
    ),
]


def main() -> None:
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)
    med = bench["queries"]

    out = [
        "# BENCH vs BASELINE — measured medians against the self-declared budgets",
        "",
        f"Source: `BENCH_LOCAL.json` (sf{bench.get('sf')}, "
        f"{bench.get('repeats')} repeats, medians). Budgets: `BASELINE.md`; "
        "the gate is within 2x of each budget.",
        "",
        "| baseline row | budget | query | median | ratio |",
        "|---|---|---|---|---|",
    ]
    worst = 0.0
    missing_any = False
    for label, budget, group_total, names in ROWS:
        first = True
        group_sum = 0.0
        for n in names:
            cell = label if first else ""
            first = False
            if n not in med:
                # surface the gap — a silent skip would read as coverage
                missing_any = True
                out.append(
                    f"| {cell} | ≤{budget:g} s | `{n}` | **MISSING** | — |"
                )
                continue
            group_sum += med[n]
            r = med[n] / budget
            worst = max(worst, r)
            out.append(
                f"| {cell} | ≤{budget:g} s | `{n}` "
                f"| {med[n]:.2f} s | {r:.2f}x |"
            )
        if group_total is not None:
            r = group_sum / group_total
            worst = max(worst, r)
            out.append(
                f"| | ≤{group_total:g} s total | _group total_ "
                f"| {group_sum:.2f} s | {r:.2f}x |"
            )
    covered = {n for _, _, _, names in ROWS for n in names}
    rest = sorted(set(med) - covered)
    out += [
        "",
        f"**Worst ratio: {worst:.2f}x** (gate: ≤2x of budget; ≤1x = inside "
        "the budget itself)."
        + (" **Some mapped queries are MISSING from the bench run — "
           "coverage above is incomplete.**" if missing_any else ""),
        "",
        f"Headline queries outside any BASELINE row ({len(rest)}; engine "
        "extensions with no reference analog): "
        + ", ".join(f"`{n}`" for n in rest) + ".",
        "",
    ]
    path = os.path.join(REPO, "BENCH_VS_BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: worst ratio {worst:.2f}x")


if __name__ == "__main__":
    main()
