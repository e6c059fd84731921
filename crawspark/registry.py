"""Query registry: every operator exposed to the driver contract.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over the
pre-registered testdata views (__spark_entry__.py contract). Column names
and types are aligned on both sides — the driver's compare hashes values
after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None  # None → non-SQL-expressible (rows-only check)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(spark=fn, sql=sql)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules so their @register calls run."""
    from crawspark.operators import (  # noqa: F401
        analytics,
        curate,
        decode,
        dedup,
        export,
        extraction_queries,
        multimodal,
        relational,
        similarity,
        textops,
    )
    from crawspark.streaming import queries as _streaming_queries  # noqa: F401
    return REGISTRY
