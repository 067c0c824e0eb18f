"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count + column names + an
order-insensitive value comparison.  Used by the pytest suite so we catch
oracle mismatches *before* the driver does.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from flinkexp_spark import datasets
from flinkexp_spark.registry import REGISTRY


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in datasets.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{datasets.table_path(sf_dir, t)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == object:
            out[c] = s.apply(
                lambda v: sorted(v) if isinstance(v, (list, set)) else v
            ).astype(str)
    out = out[sorted(out.columns)]
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av, bv)):
                bothnan = (x is None or (isinstance(x, float) and math.isnan(x))) and (
                    y is None or (isinstance(y, float) and math.isnan(y))
                )
                if bothnan:
                    continue
                if x != y:
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
        else:
            if not av.equals(bv):
                diff = av != bv
                if diff.any():
                    i = int(diff[diff].index[0])
                    return (
                        False,
                        f"col {c} first diff at row {i}: "
                        f"{av.iloc[i]!r} != {bv.iloc[i]!r}",
                    )
                # equals() failed but no elementwise != hit: dtype mismatch
                # (int64 7 vs float64 7.0) or None-pair in an object column
                return (
                    False,
                    f"col {c}: values compare equal elementwise but dtypes/"
                    f"null-repr differ ({av.dtype} vs {bv.dtype})",
                )
    return True, ""


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
    timings: dict | None = None,
) -> CompareResult:
    """Run one registered query against its oracle (the driver's compare).

    ``timings``, when given, receives ``{"spark_s": .., "oracle_s": ..}`` —
    the ONE comparison pipeline also serves tools/gate_sim.py, so the
    verdict logic can never drift between the test path and the gate sim.
    """
    import time as _time

    q = REGISTRY[name]
    t0 = _time.monotonic()
    sdf = q.fn(spark, sf_dir).toPandas()
    t1 = _time.monotonic()
    if timings is not None:
        timings["spark_s"] = round(t1 - t0, 2)
        timings["oracle_s"] = 0.0
    if q.oracle is None:
        return CompareResult(name, True, f"rows-only check: {len(sdf)} rows")
    odf = con.sql(q.oracle).df()
    if timings is not None:
        timings["oracle_s"] = round(_time.monotonic() - t1, 2)
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
    a, b = _normalize(sdf), _normalize(odf)
    ok, detail = _values_equal(a, b)
    return CompareResult(name, ok, detail)
