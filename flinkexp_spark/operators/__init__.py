"""Reusable DataFrame -> DataFrame operators (the library surface behind
the query catalog).

Each module is importable on its own; this package re-exports the
stable entry points so library users write
``from flinkexp_spark.operators import asof_join`` without knowing the
module layout.
"""

from flinkexp_spark.operators.asof import asof_join
from flinkexp_spark.operators.bloom import bloom_build, bloom_prefilter
from flinkexp_spark.operators.bucketing import bucketed_tables, write_bucketed
from flinkexp_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from flinkexp_spark.operators.layout import write_zordered, zvalue
from flinkexp_spark.operators.maintenance import compact_parquet, merge_upsert
from flinkexp_spark.operators.rangejoin import range_join_binned
from flinkexp_spark.operators.salting import salted_agg, salted_join

__all__ = [
    "asof_join",
    "bloom_build",
    "bloom_prefilter",
    "bucketed_tables",
    "write_bucketed",
    "connected_components",
    "connected_components_star",
    "write_zordered",
    "zvalue",
    "compact_parquet",
    "merge_upsert",
    "range_join_binned",
    "salted_agg",
    "salted_join",
]
