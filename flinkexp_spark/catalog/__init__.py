"""Query catalog — importing this package registers every engine query.

Each module maps to a SURVEY.md §2 operator group.
"""

from flinkexp_spark.catalog import (  # noqa: F401
    aggregates,
    joins,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    pipeline,
    projection,
    scalar_funcs,
    setops,
    sources_io,
    sql_queries,
    streaming_replay,
    subqueries,
    text_analysis,
    udfs,
    windows,
    wordcount,
)
