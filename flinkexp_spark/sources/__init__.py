from flinkexp_spark.sources.connectors import (  # noqa: F401
    kafka_sink_writer,
    kafka_source,
    kv_sink,
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
    read_text,
    socket_source,
    write_csv,
    write_json,
    write_parquet,
)
