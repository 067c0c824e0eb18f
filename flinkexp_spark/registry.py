"""Query registry — the engine's public query catalog.

Every operator from SURVEY.md §2 is shipped as one (or more) registered
queries.  A registered query carries:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native implementation,
* ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (or ``None`` for
  genuinely non-SQL-expressible operators; the driver then records a weaker
  rows-only check),
* ``tags`` — SURVEY §2 operator ids this query covers (e.g. ``("J1", "A1")``).

The driver contract (``__spark_entry__.py``) is a thin view over this
registry.  Oracle SQL must alias every computed column to the SAME name the
Spark side uses — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

__all__ = ["Query", "REGISTRY", "register", "queries", "oracle_sql"]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str | None = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the engine catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def _ensure_loaded() -> None:
    # Import for side effect: populates REGISTRY.
    import importlib; importlib.import_module("flinkexp_spark.catalog")  # noqa: F401
