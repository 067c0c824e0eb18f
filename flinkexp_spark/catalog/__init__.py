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
    r04     — ``_R04_WINDOW`` below: the 50 highest-value queries that have
              never had an official CORRECTNESS row (temporal, patterns,
              tws forward path, evolution, TPC-H tail, projection/joins/
              aggregates/text tails, the two real codec walkers).
    r05     — ``_R05_NEXT`` (positions 51-66): the remaining 16
              never-official queries, followed by anything new this round.

NEW QUERIES added this round land AFTER position 66 automatically (they
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
)

# --------------------------------------------------------------------------
# Round-4 official window: positions 1-50.  Every name here is a query that
# has NO row in CORRECTNESS_r01/r02/r03 — each slot earns a new official row.
_R04_WINDOW: tuple[str, ...] = (
    # temporal (2)
    "scd2_build",
    "join_scd2_pit",
    # patterns (7)
    "pattern_funnel",
    "pattern_absence",
    "cohort_retention",
    "pattern_transition_matrix",
    "graph_triangle_count",
    "pattern_attribution_last_touch",
    "pattern_conversion_latency",
    # streaming_tws — T7 forward path (5)
    "stream_map_state_totals_tws",
    "stream_list_state_recent_tws",
    "stream_stateful_bootstrap_tws",
    "stream_session_timers_tws",
    "stream_stateful_totals_tws",
    # evolution — S2/S3 edge behaviors (4)
    "sink_dynamic_partition_overwrite",
    "source_csv_malformed_modes",
    "source_file_metadata_lineage",
    "source_parquet_schema_evolution",
    # TPC-H tail + SQL-dialect extras (11)
    "sql_tpch_q2",
    "sql_tpch_q9",
    "sql_tpch_q11",
    "sql_tpch_q12",
    "sql_tpch_q16",
    "sql_tpch_q19",
    "sql_tpch_q20",
    "sql_tpch_q21",
    "sql_tpch_q22",
    "sql_window_tumble",
    "sql_lateral_explode",
    # projection / quality tail (4)
    "project_unpivot",
    "quality_constraints_audit",
    "table_fingerprint",
    "quality_fk_orphans",
    # joins tail (3)
    "join_range_binned",
    "join_salted_skew",
    "join_fuzzy_blocked",
    # aggregates / stats tail (8)
    "agg_grouping_sets",
    "agg_pivot",
    "agg_histogram_quantile",
    "agg_regression_ols",
    "stat_chi_square",
    "agg_winsorized_mean",
    "stat_psi_drift",
    "agg_share_of_parent",
    # text analysis tail (4)
    "text_bigram_fluency",
    "text_quality_ensemble",
    "text_classifier_score",
    "sketch_count_min",
    # real codec walkers (2)
    "multimodal_decode_jpeg_meta",
    "multimodal_decode_wav",
)

# Positions 51-66: the last 16 never-official queries — the whole of the
# r05 carry-over.  Anything registered after these is new this round and
# rotates in behind them.
_R05_NEXT: tuple[str, ...] = (
    "multimodal_decode_meta",
    "multimodal_decode_ogg_meta",
    "multimodal_decode_mp3_meta",
    "multimodal_video_frames",
    "embed_quantize_int8",
    "dedup_semantic",
    "sim_search_adc_rerank",
    "dedup_components_star",
    "dedup_incremental",
    "dedup_lines",
    "dedup_keep_best",
    "dedup_containment",
    "sample_weighted_hash",
    "mix_rebalance_weights",
    "shard_assign",
    "sample_fixed_per_group",
)


def _apply_rotation() -> None:
    """Reorder the registry dict: priority lists first, then module order.

    The registry is a plain insertion-ordered dict; rebuilding it here gives
    query-level control of the driver window without carving modules up.
    """
    from flinkexp_spark import registry

    priority = _R04_WINDOW + _R05_NEXT
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
