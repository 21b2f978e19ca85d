"""SURVEY.md §2.B declared-query suite.

Importing this package populates ``s2_spark.registry.REGISTRY``. One
module per operator family; each query carries its reference citation
and its DuckDB oracle SQL.
"""

from s2_spark.suite import (  # noqa: F401
    aggregates,
    extensions,
    functions,
    joins,
    scalar_extra,
    scans,
    setops,
    sorts,
    stream_semantics,
    streaming_batch,
    tpch,
    windows,
)
