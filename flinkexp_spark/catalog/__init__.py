"""Query catalog — importing this package registers every engine query.

Each module maps to a SURVEY.md §2 operator group.

REGISTRATION ORDER MATTERS: the driver's correctness gate walks the
registry in registration order under a finite budget (rounds 1-3 each
checked exactly the first 50 registered queries).  Module import order
seeds the registry; ``_apply_rotation`` below then pins the exact window
composition so a single query can be scheduled without splitting modules.

Rotation history (see COVERAGE.md ledger):
    r01/r02 — first 100 queries in module order (relational core).
    r03     — sources_io + llm_textprep + changelog + retrieval +
              streaming_replay: first-ever rows for S1-S11, T1, T5-T8, T10.
    r04     — temporal, patterns, tws forward path, evolution, TPC-H tail,
              projection/joins/aggregates/text tails, the two real codec
              walkers: CORRECTNESS_r04 = 50/50 green, all first-ever rows.
    r05     — ``_R05_WINDOW`` below: all 52 still-never-official queries
              minus the 2 deferred to ``_R06_NEXT``.

NEW QUERIES added this round land AFTER position 52 automatically (they
are in neither priority list); tests/test_registry_window.py fails loudly
if the window composition drifts.
"""

from flinkexp_spark.catalog import (  # noqa: F401
    sources_io,  # S1-S11
    llm_textprep,  # X4+ chunk/tokenize/redact
    changelog,  # upsert/dynamic-table parity
    retrieval,  # BM25 search + prefix-filter exact Jaccard
    streaming_replay,  # T1-T10, E1-E7
    temporal,  # SCD2 build + point-in-time join
    patterns,  # CEP/MATCH_RECOGNIZE analogs
    streaming_tws,  # T7 forward API (transformWithStateInPandas)
    evolution,  # S2 parquet schema evolution / partition overwrite
    sql_queries,  # TPC-H SQL surface (all 22) + SQL-dialect extras
    projection,  # P1-P4 + quality audits
    joins,  # J1-J9
    aggregates,  # A1-A9 + stats
    text_analysis,  # X4
    llm_multimodal,  # X5
    llm_similarity,  # X3
    llm_dedup,  # X1, X2
    pipeline,  # composites
    scalar_funcs,  # F1-F9
    setops,  # O1-O5
    windows,  # W1-W5
    subqueries,
    wordcount,  # E2-E4 batch parity
    udfs,  # U1-U4
    sql_modern,  # recursive CTE / HLL sketches / VARIANT / LISTAGG / pipe (new r4)
    streaming_extra,  # dropDuplicatesWithinWatermark + foreachBatch MERGE (new r4)
    timeseries,  # LOCF gap-fill + time-weighted avg (new r4)
    tokenizer,  # distributed BPE merge training (new r4)
    kafka_contract,  # S5 source/sink contract over a file-backed log (new r5)
    feature_store,  # PIT training sets / multi-horizon features (new r5)
    data_profiling,  # correlation matrix + Benford audit (new r5)
)

# --------------------------------------------------------------------------
# Round-5 official window: positions 1-50.  Every name here is a query that
# has NO row in CORRECTNESS_r01..r04 — each slot earns a FIRST official row.
# 52 queries remained never-official after r04; the 2 deferred to _R06_NEXT
# are the ones with the strongest already-official siblings
# (multimodal_decode_meta: its jpeg/wav specializations went official in
# r04 and ogg/mp3 are in this window; dedup_lines: the exact-dedup family
# has been official since r01).
_R05_WINDOW: tuple[str, ...] = (
    # _R05_NEXT carry-over from the r04 plan (14 of the 16; 2 deferred)
    "multimodal_decode_ogg_meta",
    "multimodal_decode_mp3_meta",
    "multimodal_video_frames",
    "embed_quantize_int8",
    "dedup_semantic",
    "sim_search_adc_rerank",
    "dedup_components_star",
    "dedup_incremental",
    "dedup_keep_best",
    "dedup_containment",
    "sample_weighted_hash",
    "mix_rebalance_weights",
    "shard_assign",
    "sample_fixed_per_group",
    # sql_modern (9)
    "sql_recursive_cte",
    "sql_date_spine",
    "sketch_hll_mergeable",
    "agg_approx_top_k",
    "sql_variant_json",
    "sql_listagg",
    "sql_pipe_syntax",
    "sql_group_by_all",
    "sql_parameterized",
    # streaming extras (4)
    "stream_dedup_within_watermark",
    "stream_foreachbatch_merge",
    "stream_python_datasource",
    "stream_observed_metrics",
    # Python DataSource batch connector (1)
    "source_python_datasource",
    # timeseries (2)
    "timeseries_locf",
    "timeseries_time_weighted_avg",
    # tokenizer (2) — oracle-ized this round (literal-VALUES BPE oracle)
    "tokenizer_bpe_train",
    "tokenizer_bpe_encode",
    # graph / patterns (3)
    "graph_pagerank",
    "pattern_regex_cep",
    "pattern_copurchase_pairs",
    # audits / profiling (7)
    "profile_table",
    "quality_sequence_gaps",
    "diagnose_skew",
    "profile_entropy",
    "quality_k_anonymity",
    "quality_anomaly_mad",
    "rollup_continuous_aggregate",
    # joins / sinks / text tails (6)
    "join_bloom_prefilter",
    "sink_sized_shards",
    "cdc_apply_ops",
    "text_url_canonicalize",
    "boilerplate_strip",
    "curriculum_order",
    # windows / multimodal tail (2)
    "window_distribution",
    "multimodal_scene_cuts",
)

# Positions 51-52: the final 2 never-official queries — the whole of the
# r06 carry-over.  Anything registered after these is new this round and
# rotates in behind them.
_R06_NEXT: tuple[str, ...] = (
    "multimodal_decode_meta",
    "dedup_lines",
)


def _apply_rotation() -> None:
    """Reorder the registry dict: priority lists first, then module order.

    The registry is a plain insertion-ordered dict; rebuilding it here gives
    query-level control of the driver window without carving modules up.
    """
    from flinkexp_spark import registry

    priority = _R05_WINDOW + _R06_NEXT
    missing = [n for n in priority if n not in registry.REGISTRY]
    if missing:  # a rename/removal must fail loudly, not silently shrink
        raise RuntimeError(f"rotation lists reference unknown queries: {missing}")
    ordered = {n: registry.REGISTRY[n] for n in priority}
    for name, q in registry.REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    registry.REGISTRY.clear()
    registry.REGISTRY.update(ordered)


_apply_rotation()
