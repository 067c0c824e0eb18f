"""Shared helpers for oracle-checkable queries.

Cross-engine determinism rules (Spark vs DuckDB):

* **Money sums must be exact.**  Summing doubles is order-dependent, and
  Spark's partial/final aggregation order differs from DuckDB's.  We cast to
  DECIMAL(18,2) *before* aggregating — both engines then compute the exact
  same decimal — and cast the final result back to DOUBLE (a deterministic
  conversion).  Helpers: :func:`dsum` (Spark side); oracle SQL uses
  ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
* **Averages** are emitted as exact-decimal-sum / count — IEEE division of
  identical doubles is deterministic in both engines.
* **Timestamps are formatted to strings** ('yyyy-MM-dd HH:mm:ss') — pandas
  dtype/precision differences (ns vs us) would otherwise break the hash.
* **Counts**: DuckDB SUM(int) returns HUGEINT; oracle SQL must CAST to
  BIGINT wherever Spark emits LongType.
* **Inexact statistics** (stddev, corr, percentile) are rounded to a fixed
  number of digits on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"
# DuckDB strftime equivalent of TS_FMT
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, alias: str) -> Column:
    """Exact sum of a money-like double, returned as DOUBLE (see module doc)."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum divided by count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def fmt_ts(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT).alias(alias)


# Oracle-side SQL fragments ------------------------------------------------

def o_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def o_fmt_ts(expr: str, alias: str) -> str:
    return f"strftime({expr}, '{TS_FMT_DUCK}') AS {alias}"
