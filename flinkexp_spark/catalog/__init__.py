"""Query catalog — importing this package registers every engine query.

Each module maps to a SURVEY.md §2 operator group.
"""

from flinkexp_spark.catalog import (  # noqa: F401
    aggregates,
    joins,
    projection,
    scalar_funcs,
    setops,
    sources_io,
    streaming_replay,
    windows,
    wordcount,
)
