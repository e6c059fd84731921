"""Table layer (SURVEY.md §7 M1): one interface, two backends.

- ``ParquetBackend`` — plain parquet directories (always available; used in
  this sandbox where the Iceberg runtime jar is absent [measured,
  SURVEY.md §0.2]).
- ``IcebergBackend`` — activated when ``iceberg-spark-runtime`` is on the
  session classpath; identical schemas, ``writeTo(...).append()`` semantics,
  hidden-partitioning via table properties. The pipeline code never
  branches on the backend: it calls ``read``/``append``/``overwrite``.

At 100 TB the Iceberg path is the real one: file-level min/max pruning +
partition-spec evolution give partition pruning on (bucket, lang, date)
without rewriting the pipeline; the parquet path keeps local tests and the
DuckDB oracle hermetic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableBackend:
    """Minimal table interface used by all jobs."""

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame, name: str) -> None:
        raise NotImplementedError

    def overwrite(self, df: DataFrame, name: str) -> None:
        raise NotImplementedError

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_col: str) -> None:
        """Replace exactly the partitions present in ``df`` (idempotent
        re-processing unit for resumable runs)."""
        raise NotImplementedError

    def exists(self, spark: SparkSession, name: str) -> bool:
        raise NotImplementedError


class ParquetBackend(TableBackend):
    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self._path(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(self._path(name))

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_col: str) -> None:
        # Dynamic partition overwrite: only directories for partition
        # values present in df are replaced.
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
        (df.write.mode("overwrite").partitionBy(partition_col)
         .parquet(self._path(name)))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(self._path(name))


class IcebergBackend(TableBackend):
    """Iceberg catalog tables (``catalog.db.name``). Requires the runtime
    jar + a configured catalog; gated behind ``_iceberg_available``."""

    def __init__(self, namespace: str = "spark_catalog.default"):
        self.namespace = namespace

    def _tbl(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format("iceberg").load(self._tbl(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.writeTo(self._tbl(name)).append()

    def overwrite(self, df: DataFrame, name: str) -> None:
        df.writeTo(self._tbl(name)).createOrReplace()

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_col: str) -> None:
        # Iceberg's dynamic overwrite is an atomic snapshot commit.
        df.writeTo(self._tbl(name)).overwritePartitions()

    def exists(self, spark: SparkSession, name: str) -> bool:
        return spark.catalog.tableExists(self._tbl(name))


def get_backend(spark: SparkSession, root: str | None = None) -> TableBackend:
    """Iceberg when available and no local root forced, else parquet."""
    if root is None and _iceberg_available(spark):
        return IcebergBackend()
    return ParquetBackend(root or os.environ.get("CRAWSPARK_DATA", "/tmp/crawspark"))


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
