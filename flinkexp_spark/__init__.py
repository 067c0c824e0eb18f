"""flinkexp_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capability surface of the reference repo
``yourgentlesmile/Flinkexp`` (a Flink 1.11 streaming word-count experiment
plus its declared Table/SQL + connector envelope — see SURVEY.md), expressed
Spark-first: DataFrame/SQL for batch, Structured Streaming for unbounded
inputs, Catalyst/AQE for optimization, Arrow-vectorized Pandas UDFs for the
few operators Spark lacks natively.
"""

from flinkexp_spark.registry import REGISTRY, oracle_sql, queries, register
from flinkexp_spark.session import get_session

__all__ = ["get_session", "register", "queries", "oracle_sql", "REGISTRY"]
__version__ = "0.1.0"
