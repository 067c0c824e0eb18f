"""T7: custom stateful per-key processing (SURVEY §2.2 T7).

Reference analog: Flink's ``KeyedProcessFunction`` with RocksDB keyed state
(declared via flink-statebackend-rocksdb, study/pom.xml:72).  Spark
realization: ``applyInPandasWithState`` — Arrow-batched per-key state with
the streaming state store (RocksDB provider set in the session factory)
underneath.

Money is accumulated in integer CENTS, not floats: state updates must be
exact and order-independent (a float running sum would drift per partition
ordering and break exactly-once replay equivalence).

Every Python function shipped to executors in this package is defined as a
CLOSURE (nested function), never at module top level: cloudpickle serializes
module-level functions by reference, which requires ``flinkexp_spark`` to be
importable on every worker.  Closures serialize by value, so the engine works
from any driver process without cluster-wide package installation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def running_totals_tws_transform(stream: DataFrame) -> DataFrame:
    """T7 on the Spark 4 ``transformWithStateInPandas`` API (the successor
    of applyInPandasWithState): typed per-key ValueState managed by a
    StatefulProcessor, RocksDB-backed, with timer support.

    Same contract as :func:`running_totals_transform` — per-user
    (count, cents) running totals emitted each batch.

    ENVIRONMENT-GATED: the state-server IPC needs ``google.protobuf``,
    absent in this container — the replay test skips when the import fails
    (tests/test_streaming.py::test_transform_with_state_parity); the
    registered T7 query uses :func:`running_totals_transform`, which has no
    extra dependency.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        # defined inside the closure: pickled by value (module doc)
        def init(self, handle):
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # half-away-from-zero (oracle round(v*100, 0) semantics), not
                # pandas' banker's rounding — values are non-negative amounts
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
            )

        def close(self):
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_totals_transform(stream: DataFrame) -> DataFrame:
    import pandas as pd

    def running_totals(key, pdfs, state):
        import numpy as np

        # Per-user running (count, cents) totals; emits current totals per batch.
        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            # half-away-from-zero, mirroring the oracle's round(v*100, 0)
            # (pandas .round() is banker's half-even — diverges on .5 cases)
            cents += int(
                np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
