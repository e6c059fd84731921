"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline over sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + training-data
ops), from the crawspark registry.
``oracle_sql()`` — DuckDB-equivalent SQL for all but the six
hash-structure entries (exact counts live in COVERAGE.md).
Extraction-pipeline queries are hash-checked against the frozen Python
oracle's MATERIALIZED extraction of the sf0.01 table
(tools/gen_extract_oracle.py — deterministic by construction, so the
parquet IS the oracle). The 6 remaining rows-only entries
(minhash/simhash/LSH bucket structures and the rolling-hash media
features) derive from executor-side hashes and are pinned by recall
floors (tests/test_recall.py) and determinism tests
(tests/test_multimodal.py) instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan sf0.001 documents → interleaved spans → vectorized
    Goose-style extraction → per-doc summary. Driver checks rows>0."""
    from crawspark.bundle import ensure_shipped
    from crawspark.operators.extract import interleave_and_extract
    from crawspark.sources import read_testdata

    ensure_shipped(spark)
    docs = read_testdata(spark, "/root/testdata/sf0.001", "documents")
    from pyspark.sql import functions as F

    return (interleave_and_extract(docs)
            .select("doc_id", "lang", "n_spans",
                    F.element_at("spans", 1)["kind"].alias("first_kind"),
                    F.element_at("spans", 1)["text"].alias("title")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawspark.bundle import ensure_shipped
    from crawspark.registry import load_all

    def wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)  # executors need the package for UDF stages
            return fn(spark, sf_dir)
        return run

    return {name: wrap(spec.spark) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    import os

    from crawspark.registry import load_all

    # The driver's correctness compare runs at sf=0.01 (contract). SQL
    # registered as a callable is rendered against that SF's materialized
    # oracle twin; CRAWSPARK_ORACLE_SF_DIR overrides for out-of-band runs.
    sf_dir = os.environ.get("CRAWSPARK_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    return {name: spec.render_sql(sf_dir)
            for name, spec in load_all().items() if spec.sql is not None}
