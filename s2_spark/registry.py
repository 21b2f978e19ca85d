"""Declared-query registry — the correctness contract surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
``Query``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
the operator is relationally expressible, the equivalent DuckDB SQL the
driver co-executes for hash comparison. Column names/types are aligned
on both sides (the driver sorts columns by name before hashing).

Determinism contract (SURVEY.md §2.B): explicit full ORDER BY, DOUBLE
results rounded to 4 places, timestamps emitted as epoch milliseconds
(BIGINT), LIMIT only after total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a suite query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import the full suite and return the populated registry."""
    from s2_spark import suite  # noqa: F401  (import populates REGISTRY)

    return REGISTRY
