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
    DoubleType,
    LongType,
    StringType,
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

    CAPABILITY-GATED: the state-server IPC needs ``google.protobuf`` on
    driver AND workers (compat/protobuf_shim.py bridges the host SDK's
    runtime when pip protobuf is absent).  The registered query
    ``stream_stateful_totals_tws`` (catalog/streaming_tws.py) probes the
    worker environment and falls back to :func:`running_totals_transform`
    — same contract, no extra dependency — when the probe fails.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        # defined inside the closure: pickled by value (module doc)
        def init(self, handle):
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            # ONE state-server round trip, not two: get() returns None when
            # the key has no state, so the separate exists() probe is a
            # second full protobuf IPC per key for nothing (guide §1.2 —
            # measured: ~1500 keys x 1 saved round trip per batch)
            prev = self._state.get()
            n, cents = prev if prev is not None else (0, 0)
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


# --- T7 with TIMERS: per-key sessionization via EventTimeTimeout -------------

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
        StructField("duration_s", LongType()),
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)
SESSION_GAP_S = 1800


def stateful_sessionize(stream: DataFrame) -> DataFrame:
    """T7 with event-time TIMERS: gap-based sessionization through
    ``applyInPandasWithState`` + ``EventTimeTimeout`` — the full Flink
    ``KeyedProcessFunction`` surface (keyed state AND registered timers,
    the part NoTimeout operators don't exercise).

    Sessions close two ways, both exercised: in-band (a new event arrives
    after the gap -> emit the closed session immediately) and by TIMER (the
    watermark passes last_event + gap with no new data -> ``hasTimedOut``
    fires and flushes the open session).  State per key is one 4-long
    struct; the timeout timestamp re-arms on every update, so state never
    outlives gap + lateness — O(active keys), stream-length independent.
    """

    def sessions(key, pdfs, state):
        # closure: pickled by value (see module doc)
        import numpy as np
        import pandas as pd

        def frame(spans):
            # ONE output frame per invocation (guide §4.2): the old 1-row
            # pd.DataFrame + scalar strftime per closed session was the
            # handler's dominant cost at sf1 (~15k keys x 3 batches of
            # invocations).  np.floor(x/1e9) reproduces the old
            # math.floor(ns/1e9) float64 semantics bit-for-bit.
            s = np.array([x[0] for x in spans], dtype="int64")
            e = np.array([x[1] for x in spans], dtype="int64")
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(spans),
                    "session_start": pd.Series(
                        s.astype("datetime64[ns]")
                    ).dt.strftime("%Y-%m-%d %H:%M:%S"),
                    "n_events": [x[2] for x in spans],
                    "cents": [x[3] for x in spans],
                    "duration_s": (
                        np.floor(e / 1e9) - np.floor(s / 1e9)
                    ).astype("int64"),
                }
            )

        if state.hasTimedOut:
            s_ns, e_ns, n, cents = state.get
            state.remove()
            yield frame([(s_ns, e_ns, n, cents)])
            return
        cur = state.get if state.exists else None
        closed = []
        gap_ns = SESSION_GAP_S * 1_000_000_000
        # One key's batch arrives as multiple Arrow chunks in ARRIVAL order,
        # not time order — one lexsort over the concatenated arrays, else
        # chunk boundaries split or merge sessions nondeterministically.
        # Memory = this key's rows in this batch (bounded by batch size,
        # not stream length).  lexsort on the extracted columns replaces
        # the old concat + DataFrame.sort_values (same (ts, event_id)
        # order, no sorted-frame copy).
        chunks = list(pdfs)
        whole = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        if len(whole):
            ts_np = (
                whole["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            )
            order = np.lexsort((whole["event_id"].to_numpy(), ts_np))
            t = ts_np[order]
            c = np.floor(
                whole["value"].to_numpy()[order] * 100 + 0.5
            ).astype("int64")
            # vectorized gaps-and-islands within the batch; the carried
            # state stitches across batches
            brk = np.empty(len(t), dtype=bool)
            brk[0] = cur is None or (t[0] - cur[1]) > gap_ns
            brk[1:] = (t[1:] - t[:-1]) > gap_ns
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(t))
            if brk[0] and cur is not None:
                # batch's first row exceeds the gap: the carried session
                # closes NOW (the row loop's "emit then open" first branch)
                closed.append(cur)
                cur = None
            if not brk[0]:
                # rows [0, first break) continue the carried session
                cont = int(starts[0]) if len(starts) else len(t)
                cur = (
                    cur[0],
                    max(cur[1], int(t[cont - 1])),  # chunks can arrive
                    # time-interleaved within a batch; last must not regress
                    cur[2] + cont,
                    cur[3] + int(c[:cont].sum()),
                )
                if len(starts):  # a later break closes the carried session
                    closed.append(cur)
                    cur = None
            for i, (s, e) in enumerate(zip(starts, ends)):
                span = (int(t[s]), int(t[e - 1]), int(e - s), int(c[s:e].sum()))
                if i < len(starts) - 1:
                    closed.append(span)
                else:
                    cur = span  # last span stays open for the next batch
        state.update(cur)
        # re-arm the event-time timer: fire when the watermark passes the
        # session's gap horizon (ms epoch, per the GroupState API)
        state.setTimeoutTimestamp(cur[1] // 1_000_000 + SESSION_GAP_S * 1000)
        if closed:
            yield frame(closed)

    return (
        stream.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessions,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# state for the tws sessionizer: the 4-long session struct plus the armed
# timer's expiry (ms) so stale timers can be deleted before re-arming
SESSION_TWS_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("timer_ms", LongType()),
    ]
)


def sessionize_tws_transform(stream: DataFrame) -> DataFrame:
    """T7 timers on the FORWARD API: gap sessionization through
    ``transformWithStateInPandas`` with EXPLICIT timer management —
    ``handle.registerTimer`` / ``deleteTimer`` re-armed per event batch and
    ``handleExpiredTimer`` flushing the open session when the watermark
    passes its gap horizon.  This is the literal Flink
    ``KeyedProcessFunction`` shape (``ctx.timerService()
    .registerEventTimeTimer`` + ``onTimer``), one step more explicit than
    :func:`stateful_sessionize`'s EventTimeTimeout.

    Same contract as :func:`stateful_sessionize` (identical oracle).
    Capability-gated like :func:`running_totals_tws_transform`.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class Sessionizer(StatefulProcessor):
        # defined inside the closure: pickled by value (module doc)
        def init(self, handle):
            self._handle = handle
            self._state = handle.getValueState("session", SESSION_TWS_STATE_SCHEMA)

        @staticmethod
        def _frame(key, spans):
            # ONE output frame per invocation — same vectorized emit as
            # stateful_sessionize.frame (np.floor(x/1e9) == the old
            # math.floor(ns/1e9) float64 semantics bit-for-bit).
            import numpy as np

            s = np.array([x[0] for x in spans], dtype="int64")
            e = np.array([x[1] for x in spans], dtype="int64")
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(spans),
                    "session_start": pd.Series(
                        s.astype("datetime64[ns]")
                    ).dt.strftime("%Y-%m-%d %H:%M:%S"),
                    "n_events": [x[2] for x in spans],
                    "cents": [x[3] for x in spans],
                    "duration_s": (
                        np.floor(e / 1e9) - np.floor(s / 1e9)
                    ).astype("int64"),
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            gap_ns = SESSION_GAP_S * 1_000_000_000
            cur = None
            prev = self._state.get()  # None when absent: one IPC, not two
            if prev is not None:
                s_ns, e_ns, n, cents, timer_ms = prev
                cur = (s_ns, e_ns, n, cents)
                # the armed timer is stale the moment new data arrives
                self._handle.deleteTimer(timer_ms)
            closed = []
            chunks = list(rows)
            whole = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            if len(whole):
                # same vectorized gaps-and-islands as stateful_sessionize:
                # lexsort the batch, break where the gap exceeds, stitch
                # the carried session across batches
                ts_np = (
                    whole["ts"]
                    .to_numpy()
                    .astype("datetime64[ns]")
                    .astype("int64")
                )
                order = np.lexsort((whole["event_id"].to_numpy(), ts_np))
                t = ts_np[order]
                c = np.floor(
                    whole["value"].to_numpy()[order] * 100 + 0.5
                ).astype("int64")
                brk = np.empty(len(t), dtype=bool)
                brk[0] = cur is None or (t[0] - cur[1]) > gap_ns
                brk[1:] = (t[1:] - t[:-1]) > gap_ns
                starts = np.flatnonzero(brk)
                ends = np.append(starts[1:], len(t))
                if brk[0] and cur is not None:
                    closed.append(cur)
                    cur = None
                if not brk[0]:
                    cont = int(starts[0]) if len(starts) else len(t)
                    cur = (
                        cur[0],
                        max(cur[1], int(t[cont - 1])),
                        cur[2] + cont,
                        cur[3] + int(c[:cont].sum()),
                    )
                    if len(starts):
                        closed.append(cur)
                        cur = None
                for i, (s, e) in enumerate(zip(starts, ends)):
                    span = (
                        int(t[s]), int(t[e - 1]), int(e - s), int(c[s:e].sum())
                    )
                    if i < len(starts) - 1:
                        closed.append(span)
                    else:
                        cur = span
            if cur is not None:
                # re-arm: fire when the watermark passes the gap horizon
                timer_ms = cur[1] // 1_000_000 + SESSION_GAP_S * 1000
                self._handle.registerTimer(timer_ms)
                self._state.update((*cur, timer_ms))
            else:
                # every session closed in-band; nothing to time out
                self._state.clear()
            if closed:
                yield self._frame(key, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # No deleteTimer here: PySpark 4.1 removes each expired timer
            # right after this hook returns (stateful_processor_util.py), and
            # a redundant delete logs a TimerStateImpl WARN per firing.
            pass
            # stale timers are deleted on every update, so a firing timer is
            # the live horizon: flush the open session
            prev = self._state.get()  # None when absent: one IPC, not two
            if prev is not None:
                s_ns, e_ns, n, cents, _timer_ms = prev
                self._state.clear()
                yield self._frame(key, [(s_ns, e_ns, n, cents)])

        def close(self):
            pass

    return (
        stream.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Sessionizer(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


MAP_TOTALS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)


def map_totals_tws_transform(stream: DataFrame) -> DataFrame:
    """T7 MapState on the forward API: per-user ``MapState[event_type ->
    (n, cents)]`` — Flink's ``MapState`` keyed-state primitive
    (study/pom.xml:72), which applyInPandasWithState cannot express (its
    GroupState is a single value).  Each batch updates the per-type slots
    it touched and emits every slot's running totals (update mode);
    single-batch replay -> the emitted rows are the final per-(user, type)
    totals.

    Scale: state per user is O(distinct event types), and only touched
    slots serialize per batch — the point of MapState over a value-typed
    dict blob.  Capability-gated like the other tws transforms.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class MapTotals(StatefulProcessor):
        # defined inside the closure: pickled by value (module doc)
        def init(self, handle):
            self._m = handle.getMapState(
                "totals", "event_type string", "n long, cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            for pdf in rows:
                cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(
                    "int64"
                )
                g = pd.DataFrame(
                    {"event_type": pdf["event_type"], "cents": cents}
                ).groupby("event_type", sort=False)
                for etype, grp in g:
                    k = (str(etype),)
                    if self._m.containsKey(k):
                        n0, c0 = self._m.getValue(k)
                    else:
                        n0, c0 = 0, 0
                    self._m.updateValue(
                        k, (n0 + len(grp), c0 + int(grp["cents"].sum()))
                    )
            out = [
                (key[0], k[0], v[0], v[1])
                for k, v in self._m.iterator()
            ]
            yield pd.DataFrame(
                out, columns=["user_id", "event_type", "n", "cents"]
            )

        def close(self):
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=MapTotals(),
        outputStructType=MAP_TOTALS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


RECENT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("slot", LongType()),
        StructField("event_id", LongType()),
    ]
)
RECENT_N = 3


def recent_events_tws_transform(stream: DataFrame) -> DataFrame:
    """T7 ListState on the forward API: per-user bounded buffer of the
    RECENT_N latest (ts, event_id) — Flink's ``ListState`` primitive
    (study/pom.xml:72), the state shape behind CEP lookback and
    "last-N actions" features.  Each batch appends its events, truncates
    to the N latest by (ts, event_id), and emits the buffer with slot
    ranks (1 = newest); single-batch replay -> final last-N per user.

    Scale: state per key is a constant N rows — the buffer IS the bound.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RecentEvents(StatefulProcessor):
        # defined inside the closure: pickled by value (module doc)
        def init(self, handle):
            self._buf = handle.getListState("recent", "ts_ns long, event_id long")

        def handleInputRows(self, key, rows, timerValues):
            items = (
                [tuple(r) for r in self._buf.get()] if self._buf.exists() else []
            )
            for pdf in rows:
                t = pdf["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
                items.extend(zip(t.tolist(), pdf["event_id"].tolist()))
            items.sort(reverse=True)  # newest first by (ts, event_id)
            items = items[:RECENT_N]
            self._buf.put([(int(t), int(e)) for t, e in items])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "slot": list(range(1, len(items) + 1)),
                    "event_id": [e for _, e in items],
                }
            )

        def close(self):
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RecentEvents(),
        outputStructType=RECENT_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def bootstrapped_totals_tws_transform(initial_state_df):
    """T7 state bootstrap on the forward API: seed per-key state from a
    BATCH DataFrame via ``initialState`` + ``handleInitialState`` — the
    Flink savepoint-bootstrap analog (State Processor API): migrate an
    engine by materializing its state as a table and resuming the stream
    on top of it.

    ``initial_state_df`` carries (user_id, n, cents) "savepoint" rows;
    the returned transform seeds ValueState from them in batch 0, then
    accumulates streamed events on top — totals emitted per batch equal
    savepoint + streamed.
    """

    def transform(stream: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        class Bootstrapped(StatefulProcessor):
            # defined inside the closure: pickled by value (module doc)
            def init(self, handle):
                self._state = handle.getValueState("totals", STATE_SCHEMA)

            def handleInitialState(self, key, initialState, timerValues):
                # one pandas row group per key from the initialState plan
                self._state.update(
                    (
                        int(initialState["n"].sum()),
                        int(initialState["cents"].sum()),
                    )
                )

            def handleInputRows(self, key, rows, timerValues):
                import numpy as np

                prev = self._state.get()  # None when absent: one IPC, not two
                n, cents = prev if prev is not None else (0, 0)
                for pdf in rows:
                    n += len(pdf)
                    cents += int(
                        np.floor(pdf["value"].to_numpy() * 100 + 0.5)
                        .astype("int64")
                        .sum()
                    )
                self._state.update((n, cents))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
                )

            def close(self):
                pass

        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Bootstrapped(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
            initialState=initial_state_df.groupBy("user_id"),
        )

    return transform


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma_transform(stream: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Streaming per-key EWMA with O(1) state — the unbounded twin of the
    batch ordered-fold (catalog/windows.q_window_ewma_per_user): state is
    ONE (count, ewma) pair per key; each batch folds its rows in
    (ts, event_id) order on top of the carried value.  Equivalent to the
    batch fold whenever micro-batches arrive time-ordered (the replay rig
    guarantees it; a production job gets it from watermarked sources).
    """

    def ewma(key, pdfs, state):  # closure: pickled by value
        import pandas as pd

        n, acc = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].to_numpy():
                acc = acc * (1 - alpha) + float(v) * alpha
                n += 1
        state.update((n, acc))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "ewma": [round(acc, 6)]}
        )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("ewma", DoubleType())]
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        ewma,
        EWMA_OUTPUT_SCHEMA,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
