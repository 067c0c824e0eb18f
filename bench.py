#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at a fixture scale
and prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Targets are in BASELINE.md (self-declared; the reference publishes none —
see SURVEY.md §6).  Env knobs:

* ``SPARK_GRAFT_SF_DIR``  — fixture dir (default /root/testdata/sf0.1)
* ``SPARK_GRAFT_CPUS``    — local core count (default 32)

Each query runs once cold (includes its own scan); the headline metric is
total wall seconds over the suite.  Every query is drained with a count()
so the full result is computed but rows never collect to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkexp_spark.registry import REGISTRY, queries  # noqa: E402
from flinkexp_spark.session import get_session  # noqa: E402

# Headline suite: one representative per BASELINE.md row.  Names absent from
# the registry are skipped (bench never breaks while the catalog evolves);
# anything present runs.
HEADLINE = [
    # batch word count throughput (E2–E5; BASELINE row 1 definition)
    "wordcount_batch",
    "wordcount_union",
    # relational suite representatives (§2.2): scan-heavy agg, star join,
    # window functions, set ops, scalar-function pipeline
    "agg_pricing_summary",
    "sql_tpch_q5",
    "join_broadcast_star",
    "join_bucketed_colocated",
    "join_asof",
    "window_topk_per_group",
    "func_string",
    # streaming replays (E1–E7, T2–T4, J7/T8)
    "stream_wordcount_update",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_interval_join",
    # LLM-pipeline extensions (X1–X5)
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_search_topk",
    "sim_search_ivf",
    "text_quality_profile",
    "pack_sequences",
    # composite: quality gate -> exact dedup -> near-dup drop -> stats
    "pipeline_training_data",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # infer sf from the dir name, e.g. ".../sf0.1" -> 0.1
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_session(app_name="flinkexp_spark_bench")
    # Warm up the JVM / codegen / parquet footer+page caches so per-query
    # timings measure the engine, not first-touch session costs.
    for t in ("nation", "documents", "events", "lineitem", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    qs = queries()
    suite = [n for n in HEADLINE if n in qs]
    missing = [n for n in HEADLINE if n not in qs]
    if missing:
        print(f"# bench: skipping unregistered queries: {missing}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in suite:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
