"""T7 forward path: ``transformWithStateInPandas`` (Spark 4's successor to
``applyInPandasWithState``), capability-probed.

The state-server IPC needs ``google.protobuf`` importable ON THE WORKERS.
Whether that holds depends on the launching process (PYTHONPATH is captured
at JVM start — see compat/protobuf_shim.py), so the query probes the actual
worker environment with a one-row mapInPandas job and falls back to the
dependency-free ``applyInPandasWithState`` implementation when the probe
fails.  Both paths carry the identical per-key (count, cents) contract, so
the oracle is the same either way — the probe selects an execution engine,
never a semantic.

Registered AFTER the round-3 official window (see catalog/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkexp_spark import datasets
from flinkexp_spark.registry import register
from flinkexp_spark.streaming.replay import replay

_PROBE_CACHE: dict[str, bool] = {}


def workers_have_protobuf(spark: SparkSession) -> bool:
    """True if the Python workers can import google.protobuf (one tiny job,
    memoized per application)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PROBE_CACHE:
        return _PROBE_CACHE[app_id]

    def probe(batches):
        # closure: pickled by value (see streaming/stateful.py module doc)
        import pandas as pd

        try:
            import google.protobuf.descriptor  # noqa: F401

            ok = 1
        except Exception:
            ok = 0
        for _ in batches:
            yield pd.DataFrame({"ok": [ok]})

    rows = spark.range(1).mapInPandas(probe, "ok long").collect()
    result = bool(rows and rows[0][0] == 1)
    _PROBE_CACHE[app_id] = result
    return result


@register(
    "stream_stateful_totals_tws",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY user_id
    """,
    tags=("T7",),
)
def q_stream_stateful_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 (forward API): per-user running totals through a typed
    ``StatefulProcessor`` with RocksDB ValueState — Flink
    KeyedProcessFunction's closest Spark analog (study/pom.xml:72) — when
    the workers can reach the protobuf state-server IPC; otherwise the
    same contract through ``applyInPandasWithState``.

    Money accumulates in integer cents (exact, order-independent); a
    single-batch replay makes the emitted update-mode rows the final
    totals.
    """
    from flinkexp_spark.compat.protobuf_shim import ensure_protobuf
    from flinkexp_spark.streaming.stateful import (
        running_totals_transform,
        running_totals_tws_transform,
    )

    use_tws = ensure_protobuf() and workers_have_protobuf(spark)
    events = datasets.load(spark, sf_dir, "events")
    return replay(
        spark,
        events,
        running_totals_tws_transform if use_tws else running_totals_transform,
        output_mode="update",
        use_checkpoint=True,
        # multi-column-family state (tws) exists only on RocksDB
        state_provider="rocksdb" if use_tws else None,
    )
