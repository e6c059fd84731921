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
    # None → non-SQL-expressible (rows-only check). A callable receives the
    # runtime sf_dir and returns the SQL — used by extraction queries whose
    # oracle is an SF-specific materialized twin parquet (VERDICT r3 #4:
    # the oracle path must follow the SF the query actually runs at).
    sql: str | Callable[[str], str] | None = None

    def render_sql(self, sf_dir: str) -> str | None:
        return self.sql(sf_dir) if callable(self.sql) else self.sql


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # A duplicate name would SILENTLY shadow the earlier query (dict
        # overwrite) and drop it from every driver/oracle surface — found
        # the hard way when a second pack_training_sequences replaced the
        # first for a whole session. Fail loudly at import instead.
        if name in REGISTRY:
            raise ValueError(f"duplicate registry name: {name!r}")
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
        lmquality,
        merge,
        multimodal,
        relational,
        sampling,
        similarity,
        sketches,
        textops,
        webarchive,
    )
    from crawspark.streaming import queries as _streaming_queries  # noqa: F401
    return REGISTRY


def check_query(spark, con, name: str, sf_dir: str) -> dict:
    """Driver-mirror compare for ONE registry query: Spark result vs the
    DuckDB oracle (row count, column-name set, order-insensitive values
    with the driver's float normalization). Returns the CORRECTNESS-row
    shape. ``con`` must have the testdata views registered; rows-only
    queries (sql=None) get the weaker runs-and-has-schema check."""
    import math

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0:
                v = 0.0  # fold -0.0 → 0.0: engines may differ on zero sign
            return f"{v:.6g}"
        return "NULL" if v is None else str(v)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    out = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": len(srows), "oracle_rows": None, "err": None}
    sql = spec.render_sql(sf_dir)
    if sql is None:
        out["err"] = "no_oracle"
        if not sdf.columns:
            out["err"] = "no_columns"
        return out
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    out["oracle_rows"] = len(drows)
    out["rows_match"] = len(srows) == len(drows)
    out["schema_match"] = sorted(sdf.columns) == sorted(dcols)
    out["hash_match"] = (out["rows_match"] and out["schema_match"]
                         and canon(srows, sdf.columns) == canon(drows, dcols))
    return out
