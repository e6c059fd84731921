"""Checkpointed, idempotently-resumable extraction runs
(BASELINE.json:L6,L14; FIXTURES.md §1.3).

Design:
- The resume unit is a LOGICAL partition: ``partition_key =
  'part=' || pmod(xxhash64(doc_id), n_parts)`` — stable across runs and
  cluster sizes (Spark's physical partition ids are not).
- ``input_fingerprint`` = bit_xor of xxhash64(doc_id) within the
  partition — order-independent, computed JVM-side; a resumed run skips a
  partition only when BOTH status='done' AND the fingerprint still matches
  (input drift invalidates the checkpoint).
- Results are written with dynamic partition overwrite keyed on
  ``partition_key``: re-processing a partition REPLACES its output files,
  so a crash between the results write and the checkpoint write cannot
  double-count — the rerun converges to the same table state
  (Iceberg's overwritePartitions gives the same semantics atomically).
- ``completed_ts`` is injected by the caller (no wall-clock in tests).

The reference has no analog — crawtext restarts re-query MongoDB for
unseen URLs [R: database.py queue semantics]; this is the Spark-native
equivalent demanded by the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from crawspark.operators.extract import extract_documents
from crawspark.operators.partitioning import salted_repartition
from crawspark.sources.tables import TableBackend


def with_partition_key(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn(
        "partition_key",
        F.concat(F.lit("part="),
                 F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("string")))


def partition_fingerprints(df: DataFrame) -> DataFrame:
    """(partition_key, input_fingerprint, docs_in) — JVM-side aggregates."""
    return (df.groupBy("partition_key")
            .agg(F.expr("cast(bit_xor(xxhash64(doc_id)) as string)")
                 .alias("input_fingerprint"),
                 F.count("*").alias("docs_in")))


class CheckpointedExtraction:
    def __init__(self, backend: TableBackend,
                 results_table: str = "extracted_spans",
                 checkpoint_table: str = "checkpoint",
                 n_parts: int = 64):
        self.backend = backend
        self.results_table = results_table
        self.checkpoint_table = checkpoint_table
        self.n_parts = n_parts

    def _done_keys(self, spark: SparkSession, run_id: str,
                   fps: DataFrame) -> DataFrame:
        """Partitions already done for this run_id with matching input."""
        if not self.backend.exists(spark, self.checkpoint_table):
            return fps.limit(0).select("partition_key")
        ckpt = (self.backend.read(spark, self.checkpoint_table)
                .filter((F.col("run_id") == run_id)
                        & (F.col("status") == "done"))
                .select("partition_key", F.col("input_fingerprint")
                        .alias("done_fingerprint")))
        return (fps.join(ckpt, "partition_key")
                .filter(F.col("input_fingerprint") == F.col("done_fingerprint"))
                .select("partition_key"))

    def run(self, spark: SparkSession, docs: DataFrame, run_id: str,
            completed_ts: str, max_partitions: int | None = None) -> dict:
        """Extract ``docs`` (documents_interleaved shape); resume-aware.

        ``max_partitions`` limits how many pending partitions this
        invocation processes (also the crash-simulation hook for tests).
        Returns counters for the run report.
        """
        keyed = with_partition_key(docs, self.n_parts)
        fps = partition_fingerprints(keyed).cache()
        done = self._done_keys(spark, run_id, fps)
        pending_keys = (fps.join(done, "partition_key", "left_anti")
                        .select("partition_key", "input_fingerprint", "docs_in"))
        if max_partitions is not None:
            pending_keys = (pending_keys.orderBy("partition_key")
                            .limit(max_partitions))
        pending_keys = pending_keys.cache()
        n_pending = pending_keys.count()
        if n_pending == 0:
            fps.unpersist()
            return {"run_id": run_id, "partitions_processed": 0,
                    "docs_out": 0, "spans_out": 0}

        pending = keyed.join(F.broadcast(pending_keys.select("partition_key")),
                             "partition_key")
        extracted = extract_documents(
            salted_repartition(pending, partitions=self.n_parts))
        extracted = with_partition_key(extracted, self.n_parts).cache()

        # Idempotent per-partition replace (parquet: dynamic overwrite;
        # Iceberg backend: atomic overwritePartitions).
        self.backend.overwrite_partitions(
            extracted.select("partition_key", "doc_id", "spans", "lang",
                             "n_spans"),
            self.results_table, "partition_key")

        # Collect per-partition metrics to the driver BEFORE touching the
        # checkpoint table: appending to it invalidates (recacheByPath)
        # every cached plan whose lineage reads that path — including
        # `extracted` via the resume anti-join — so any lazy computation
        # after the append would see its own checkpoint rows.
        metrics = {r["partition_key"]: (r["docs_out"], r["spans_out"])
                   for r in (extracted.groupBy("partition_key")
                             .agg(F.count("*").alias("docs_out"),
                                  F.sum("n_spans").cast("long")
                                  .alias("spans_out")).collect())}
        key_rows = pending_keys.collect()
        ckpt_rows = spark.createDataFrame(
            [(run_id, k["partition_key"], "done", int(k["docs_in"]),
              int(metrics.get(k["partition_key"], (0, 0))[0]),
              int(metrics.get(k["partition_key"], (0, 0))[1] or 0),
              k["input_fingerprint"])
             for k in key_rows],
            schema=("run_id string, partition_key string, status string, "
                    "docs_in long, docs_out long, spans_out long, "
                    "input_fingerprint string"),
        ).withColumn("completed_ts", F.lit(completed_ts).cast("timestamp"))
        self.backend.append(ckpt_rows, self.checkpoint_table)

        docs_out = sum(m[0] for m in metrics.values())
        spans_out = sum(int(m[1] or 0) for m in metrics.values())
        fps.unpersist()
        pending_keys.unpersist()
        extracted.unpersist()
        return {"run_id": run_id, "partitions_processed": n_pending,
                "docs_out": docs_out, "spans_out": spans_out}
