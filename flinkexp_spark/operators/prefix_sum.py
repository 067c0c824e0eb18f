"""Distributed global running sums (prefix sums) without a global sort.

``Window.orderBy(col)`` with no partition key funnels every row through
ONE task — the classic scale cliff of cumulative aggregates (running
CDFs, sweep-line counters, cumulative revenue).  The textbook fix is the
two-pass prefix-sum:

1. range-partition the rows on the order key, so partition i holds a
   contiguous key range and partitions are globally ordered;
2. running-sum WITHIN each partition (bounded state, fully parallel);
3. aggregate one total row per partition (tiny — numPartitions rows),
   exclusive-scan those totals on the driver, and broadcast the offsets
   back: global_cum = within_cum + offset[partition].

Cost: one range exchange + one hash exchange on the partition id + a
numPartitions-row collect — independent of row count per step, so the
plan survives any scale the shuffle fabric does.  Ties across a range
boundary are safe: ``repartitionByRange`` keeps equal keys in one
partition, so per-key aggregated inputs (the engine's callers aggregate
per distinct key first) see deterministic results.

Used by ``stat_ks_test`` (running CDFs) and
``interval_concurrency_peak`` (sweep-line) in place of the
single-partition window; correctness is pinned by the unchanged DuckDB
oracles and a property test against the naive window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Matches the session's shuffle parallelism; callers can override.
DEFAULT_PARTS = 32


def running_sums(
    df: DataFrame,
    order_col: str,
    val_cols: list[str],
    n_partitions: int = DEFAULT_PARTS,
    prefix: str = "cum_",
) -> DataFrame:
    """Append ``prefix+c`` global running-sum columns ordered by
    ``order_col`` (rows-unbounded-preceding semantics per distinct input
    row; callers should pre-aggregate per key if the order key repeats).

    Returns the input columns plus one running sum per ``val_cols``
    entry.  No single-partition exchange appears in the plan.
    """
    # Pin partition placement: spark_partition_id() is recompute-sensitive,
    # so materialize the ranged layout before deriving pid from it.
    ranged = df.repartitionByRange(n_partitions, F.col(order_col)).localCheckpoint()
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())

    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = with_pid.select(
        "*", *[F.sum(c).over(w_in).alias(f"__in_{c}") for c in val_cols]
    )

    # Reject non-numeric inputs up front (ANSI SUM would accept a string by
    # casting and then fail row-at-a-time deep inside a task), then carry
    # the SUM-promoted type (long for integrals, double for floats, widened
    # decimal for decimals) through the offset schema and the final cast, so
    # non-integer inputs keep their precision instead of being truncated.
    from pyspark.sql.types import NumericType

    for c in val_cols:
        t_in = df.schema[c].dataType
        if not isinstance(t_in, NumericType):
            raise TypeError(
                f"running_sums: val_col '{c}' has non-numeric type "
                f"{t_in.simpleString()}"
            )
    sum_types = {
        c: within.schema[f"__in_{c}"].dataType.simpleString() for c in val_cols
    }

    # numPartitions-row scan: totals per pid -> exclusive offsets
    totals = (
        with_pid.groupBy("__pid")
        .agg(*[F.sum(c).alias(c) for c in val_cols])
        .orderBy("__pid")
        .collect()
    )
    from decimal import Decimal

    def _zero(t: str):
        if t in ("double", "float"):
            return 0.0
        if t.startswith("decimal"):
            return Decimal(0)
        return 0

    offsets: dict[int, dict[str, object]] = {}
    acc = {c: _zero(sum_types[c]) for c in val_cols}
    for r in totals:
        offsets[r["__pid"]] = dict(acc)
        for c in val_cols:
            acc[c] += r[c] if r[c] is not None else _zero(sum_types[c])
    off_rows = [
        tuple([pid] + [offsets[pid][c] for c in val_cols]) for pid in offsets
    ]
    schema = ", ".join(
        ["__pid int"] + [f"__off_{c} {sum_types[c]}" for c in val_cols]
    )
    off_df = df.sparkSession.createDataFrame(off_rows, schema)

    out = within.join(F.broadcast(off_df), "__pid")
    for c in val_cols:
        out = out.withColumn(
            prefix + c,
            (F.col(f"__in_{c}") + F.col(f"__off_{c}")).cast(sum_types[c]),
        )
    return out.drop(
        "__pid", *[f"__in_{c}" for c in val_cols], *[f"__off_{c}" for c in val_cols]
    )
