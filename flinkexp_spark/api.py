"""Public engine facade — the user-facing API surface (SURVEY §3 entry
points).

The reference's single entry point is
``StreamExecutionEnvironment.getExecutionEnvironment`` + method chaining
(StreamSocket.scala:12-16).  Our engine exposes the three Spark-native
entry points documented in SURVEY §3.1:

1. ``engine.sql("SELECT ...")``   — SQL over the registered tables
2. ``engine.table(name)``          — DataFrame method chaining
3. ``engine.stream(...)``          — Structured Streaming sources

Example::

    from flinkexp_spark.api import FlinkexpEngine

    eng = FlinkexpEngine.create(data_dir="/data/tables")
    top = eng.sql("SELECT word, count(*) c FROM docs GROUP BY word")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkexp_spark import datasets, sources
from flinkexp_spark.session import get_session


class FlinkexpEngine:
    """A configured SparkSession + registered table catalog."""

    def __init__(self, spark: SparkSession, data_dir: str | None = None):
        self.spark = spark
        self.data_dir = data_dir
        if data_dir is not None:
            datasets.register_views(spark, data_dir)

    @classmethod
    def create(
        cls,
        app_name: str = "flinkexp_spark",
        data_dir: str | None = None,
        **session_kwargs,
    ) -> "FlinkexpEngine":
        return cls(get_session(app_name=app_name, **session_kwargs), data_dir)

    # -- entry point 1: SQL -------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Parse/analyze/optimize/execute via Catalyst (SURVEY §3.1.1)."""
        return self.spark.sql(query)

    # -- entry point 2: DataFrame chaining ---------------------------------
    def table(self, name: str) -> DataFrame:
        if self.data_dir is not None:
            return datasets.load(self.spark, self.data_dir, name)
        return self.spark.table(name)

    # -- entry point 3: streaming ------------------------------------------
    def stream_socket(self, host: str, port: int) -> DataFrame:
        """The reference's source (socketTextStream, StreamSocket.scala:13)."""
        return sources.socket_source(self.spark, host, port)

    def stream_env(self):
        """Flink DataStream-API adapter (StreamExecutionEnvironment analog,
        StreamSocket.scala:12) — port the reference's fluent chain 1:1:
        ``socket_text_stream(...).flat_map(...).key_by(0).sum(1).print()``;
        ``env.execute()`` submits.  See flinkexp_spark/datastream.py."""
        from flinkexp_spark.datastream import StreamExecutionEnvironment

        return StreamExecutionEnvironment(self.spark)

    def stream_rate(self, rows_per_second: int = 100) -> DataFrame:
        return sources.rate_source(self.spark, rows_per_second)

    def read_parquet(self, path: str) -> DataFrame:
        return sources.read_parquet(self.spark, path)

    def read_csv(self, path: str, schema, header: bool = True) -> DataFrame:
        return sources.read_csv(self.spark, path, schema, header)

    def read_json(self, path: str, schema) -> DataFrame:
        return sources.read_json(self.spark, path, schema)

    # -- entry point 4: the operator catalog --------------------------------
    def catalog(self) -> list[str]:
        """Names of every registered engine query (SURVEY §2 inventory)."""
        from flinkexp_spark.registry import REGISTRY, queries

        queries()  # ensure the catalog is loaded
        return sorted(REGISTRY)

    def run(self, query_name: str) -> DataFrame:
        """Run a registered catalog query against this engine's data_dir."""
        if self.data_dir is None:
            raise ValueError("engine was created without data_dir")
        from flinkexp_spark.registry import REGISTRY, queries

        queries()
        return REGISTRY[query_name].fn(self.spark, self.data_dir)

    def explain(self, query_name: str, mode: str = "formatted") -> str:
        """The physical plan of a registered query (same text the plan
        audit in PLANS.md reads) — the first thing to check before
        running anything at scale: pushed filters, broadcast vs
        sort-merge, partial aggregation, codegen spans.

        CAVEAT: building the DataFrame for an EAGER catalog query (the
        streaming replays and sink round-trips) executes the workload,
        and the returned plan is then the trivial scan of the collected
        local result — the annotation below flags that case so the text
        is never mistaken for the pipeline's plan."""
        df = self.run(query_name)
        text = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )
        local_only = (
            "LocalTableScan" in text or "LocalRelation" in text
        ) and "Scan " not in text.replace("LocalTableScan", "")
        if local_only:
            text = (
                "NOTE: this catalog query materializes eagerly (streaming "
                "replay / sink round-trip); building it already ran the "
                "workload, and the plan below is the scan of its collected "
                "local result, not the executed pipeline.\n" + text
            )
        return text
