#!/usr/bin/env python
"""Physical-plan audit: dump per-query plan evidence for the headline suite.

Writes PLANS.md — for each audited query, the scale-relevant facts of its
executed physical plan:

* number of Exchange (shuffle) operators and what keys they hash on,
* join strategies chosen (BroadcastHashJoin / SortMergeJoin / ...),
* parquet scan pushdown (PushedFilters) and column pruning (ReadSchema),
* WholeStageCodegen span count (JVM codegen coverage),
* any Python-boundary operators (ArrowEvalPython / MapInPandas / ...).

This is the artifact form of the "explain until it's the plan you'd want"
rule: a reviewer can check — without running anything — that the star join
broadcasts its dims, the bucketed join has zero Exchange, the LSH join is
not a cartesian, and no relational query crosses into Python.

Streaming-replay queries are skipped: their work happens inside a
terminated streaming query; the returned DataFrame is just the drained
sink (plan tests in tests/test_streaming.py cover their semantics).

Usage: python tools/plan_audit.py [--out PLANS.md] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkexp_spark.registry import REGISTRY, queries  # noqa: E402
from flinkexp_spark.session import get_session  # noqa: E402

# Representative, plan-meaningful batch queries (streaming replays excluded:
# the interesting plan runs inside the replay, not in the returned sink).
AUDIT = [
    "wordcount_batch",
    "wordcount_datastream_api",
    "multimodal_video_frames",
    "multimodal_decode_jpeg_meta",
    "multimodal_decode_ogg_meta",
    "multimodal_decode_mp3_meta",
    "agg_pricing_summary",
    "agg_salted_skew",
    "sql_tpch_q5",
    "sql_tpch_q9",
    "sql_tpch_q18",
    "join_broadcast_star",
    "join_bucketed_colocated",
    "join_asof",
    "window_topk_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lines",
    "dedup_semantic",
    "sim_search_topk",
    "sim_search_ivf",
    "text_quality_profile",
    "text_quality_ensemble",
    "text_classifier_score",
    "search_bm25_topk",
    "dedup_jaccard_prefix",
    "join_scd2_pit",
    "agg_histogram_quantile",
    "agg_regression_ols",
    "maintenance_merge_upsert",
    "sim_search_adc_rerank",
    "sketch_count_min",
    "table_fingerprint",
    "graph_triangle_count",
    "join_salted_skew",
    "index_inverted_build",
    "vocab_encode_ids",
    "decontaminate_ngram",
    "pack_sequences",
    "pipeline_training_data",
    # round-6 additions
    "sim_search_recall_ivf",
    "join_asof_forward",
    "feature_rolling_multi_horizon",
    "feature_target_encoding",
    "graph_common_neighbors",
    "stat_ks_test",
    "interval_concurrency_peak",
    "timeseries_cross_correlation",
    "pipeline_dpo_pairs",
    "text_zipf_fit",
    "multimodal_audio_stats",
    "window_gaps_islands",
    "changelog_incremental_agg",
    "tokenizer_bpe_encode",
    # round-6 late additions: geo + experimentation families
    "geo_distance_join",
    "geo_nearest_supplier",
    "geo_cell_density",
    "recsys_item_lift",
    "survival_kaplan_meier",
    "stat_cuped_adjustment",
    "timeseries_seasonal_decompose",
    "rfm_segmentation",
    "quality_l_diversity",
    "timeseries_forecast_backtest",
    "graph_clustering_coefficient",
    "dedup_containment",
    "join_fuzzy_blocked",
    # round-10 additions: disk-resident IVF + new codecs + graph ANN
    "sim_search_ivf_bucketed",
    "sim_search_recall_ivf_bucketed",
    "multimodal_decode_g711_pcm",
    "multimodal_decode_apng_frames",
    "sim_search_graph_beam",
    # round-11 additions
    "multimodal_decode_qoi_pixels",
    "tokenizer_unigram_train",
    "tokenizer_unigram_encode",
    "text_perplexity_filter",
    # round-7 additions
    "multimodal_decode_jpeg_pixels",
    "geo_neighbor_pairs_salted",
    "changelog_incremental_join",
    "sample_priority_weighted",
    "sim_search_ivf2",
    "sim_search_recall_ivf2",
    "pattern_regex_cep",
    "quality_t_closeness",
    "graph_label_propagation",
    "profile_join_skew",
    "embed_quantize_pq",
    "sim_search_pq_adc",
    "sim_search_ivfpq_adc",
]

PY_OPS = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def audit_one(spark, name: str, sf_dir: str) -> dict:
    df = REGISTRY[name].fn(spark, sf_dir)
    # EXECUTE THE DATASET'S OWN QueryExecution before reading the plan:
    # with AQE on, the pre-execution executedPlan is the initial plan
    # (isFinalPlan=false) — runtime SMJ->BHJ conversions, skew splits, and
    # coalesced exchanges only appear in the final adaptive plan.  A noop
    # *write* would run a separate QueryExecution and leave df's own plan
    # unadapted, so collect() (which keeps every output column, unlike
    # count()) is the correct drain here; audit runs at sf0.01 so the
    # driver-side result is small.
    df.collect()
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # An executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections; keep only the final one or every
    # operator double-counts.
    plan = plan.split("== Initial Plan ==")[0]
    formatted = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", formatted)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        # tree strings mark codegen spans as "*(n) Operator"; the formatted
        # mode's "WholeStageCodegen (n)" headers also appear there
        "codegen": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted))
        ),
        "python": sorted({op for op in PY_OPS if op in plan}),
        "pushed": [s for s in scans if s],
        "schemas": [s[: 100] + ("..." if len(s) > 100 else "") for s in schemas],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    queries()
    spark = get_session(app_name="plan_audit")
    names = [n for n in AUDIT if n in REGISTRY]
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    lines = [
        "# PLANS — physical-plan audit of the headline suite",
        "",
        "Generated by `tools/plan_audit.py` (executed-plan inspection at "
        f"`{args.sf_dir}`; regenerate after plan-shape changes).",
        "",
        "Columns: shuffles = `Exchange` count; joins = strategy counts; "
        "codegen = distinct `WholeStageCodegen` spans; python = Python-"
        "boundary operators present (empty for relational queries — UDF "
        "surfaces only); pushdown = parquet `PushedFilters` entries.",
        "",
        "| query | shuffles | BHJ | SMJ | BNLJ/cart | codegen | python |",
        "|---|---|---|---|---|---|---|",
    ]
    detail: list[str] = []
    for name in names:
        a = audit_one(spark, name, args.sf_dir)
        print(f"{name}: exch={a['exchanges']} bhj={a['bhj']} smj={a['smj']} "
              f"py={a['python']}")
        lines.append(
            f"| `{name}` | {a['exchanges']} | {a['bhj']} | {a['smj']} | "
            f"{a['bnlj'] + a['cartesian']} | {a['codegen']} | "
            f"{', '.join(a['python']) or '—'} |"
        )
        if a["pushed"] or a["schemas"]:
            detail.append(f"### `{name}`")
            for s in a["pushed"]:
                detail.append(f"- PushedFilters: `[{s}]`")
            for s in a["schemas"][:4]:
                detail.append(f"- ReadSchema: `{s}`")
            detail.append("")
    lines += ["", "## Scan pushdown evidence", ""] + detail
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
