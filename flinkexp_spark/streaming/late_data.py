"""T5 helper: allowed-lateness side output (SURVEY §2.2 T5 ⚠).

Flink's watermark envelope offers side outputs for late rows; Spark drops
rows behind the watermark once window state is evicted (see
catalog/streaming_replay.q_stream_late_data for the pinned semantics).
This helper restores the Flink capability: a ``foreachBatch`` router that
tracks the watermark driver-side and forks each micro-batch into on-time
rows (handed to your handler) and late rows (appended to a side location).

At cluster scale the router's per-batch work is two narrow filters — no
extra shuffle; the side sink is an append-only parquet directory partitioned
like the main output.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class LateRowRouter:
    """foreachBatch callable splitting each micro-batch on a tracked watermark.

    The watermark mirrors Spark's: max event time seen so far minus
    ``delay``; rows with ``ts < watermark`` at batch start are late.
    """

    def __init__(
        self,
        ts_col: str,
        delay: timedelta,
        on_time: Callable[[DataFrame, int], None],
        side_path: str | None = None,
        on_late: Callable[[DataFrame, int], None] | None = None,
    ) -> None:
        self.ts_col = ts_col
        self.delay = delay
        self.on_time = on_time
        self.side_path = side_path
        self.on_late = on_late
        self.watermark: datetime | None = None

    def __call__(self, df: DataFrame, epoch: int) -> None:
        # max(ts) rides the cache-materializing pass as an observed metric —
        # no separate agg/collect job over the batch.  count() (not
        # isEmpty/limit) so the observation sees EVERY row; the late/on_time
        # subsets below then scan the populated cache.
        obs = Observation()
        df = df.observe(obs, F.max(F.col(self.ts_col)).alias("max_ts")).persist()
        try:
            n_rows = df.count()
            if self.watermark is None:
                late = df.limit(0)
                late_empty = True
                on_time = df
            else:
                is_late = F.col(self.ts_col) < F.lit(self.watermark)
                late = df.filter(is_late)
                late_empty = late.isEmpty()
                on_time = df.filter(~is_late)

            # skip the write when nothing is late (incl. the guaranteed-
            # empty first batch): one empty parquet file per micro-batch is
            # exactly the small-file blowup maintenance.compact exists for
            if self.side_path is not None and not late_empty:
                late.write.mode("append").parquet(self.side_path)
            if self.on_late is not None:
                self.on_late(late, epoch)
            self.on_time(on_time, epoch)

            mx = obs.get["max_ts"] if n_rows else None
            if mx is not None:
                cand = mx - self.delay
                if self.watermark is None or cand > self.watermark:
                    self.watermark = cand
        finally:
            df.unpersist()
