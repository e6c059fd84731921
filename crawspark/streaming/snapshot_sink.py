"""Streaming extraction into a transactional table: foreachBatch →
SnapshotParquetBackend commits, exactly-once under microbatch replay.

Structured Streaming's foreachBatch contract is AT-LEAST-once: after a
failure the same ``batch_id`` can be re-delivered, so an append-only
parquet sink duplicates rows. The lakehouse pattern (Iceberg/Delta
``txnAppId``/snapshot-summary idempotence) is: record the batch id IN
the table commit, atomically with the data, and skip any replayed batch
whose id is <= the committed one. SnapshotParquetBackend's manifest
props carry that id here — the same job against real Iceberg writes it
to the snapshot summary.

At 10^12 documents this is the shape of the continuously-ingesting
extraction pipeline: file-source stream over the interleaved table,
the SAME extract operator as batch, one transactional commit per
microbatch, time travel across ingestion history for free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from crawspark.operators.extract import extract_documents
from crawspark.schema import DOCUMENTS_INTERLEAVED
from crawspark.sources.tables import SnapshotParquetBackend

BATCH_PROP = "stream_batch_id"


def commit_batch(backend: SnapshotParquetBackend, table: str,
                 batch_df, batch_id: int) -> bool:
    """Idempotently commit one extracted microbatch. Returns False when
    ``batch_id`` was already committed (replay after failure) — the
    duplicate delivery is dropped without touching the table."""
    last = backend.table_props(table).get(BATCH_PROP)
    if last is not None and int(last) >= batch_id:
        return False
    backend.append(extract_documents(batch_df), table,
                   props={BATCH_PROP: batch_id})
    return True


def run_extract_to_snapshot(spark: SparkSession, input_path: str,
                            checkpoint_path: str,
                            backend: SnapshotParquetBackend, table: str,
                            timeout_sec: int = 300,
                            files_per_trigger: int | None = None) -> bool:
    """Drain currently-available interleaved input into ``table`` as one
    snapshot commit per microbatch; re-invocations process only new
    files (streaming checkpoint) and replayed batches commit nothing
    (manifest-props idempotence). ``files_per_trigger`` splits the drain
    into multiple microbatches (one commit each) — the multi-commit
    regime a continuous ingest runs in."""
    from crawspark.bundle import ensure_shipped
    ensure_shipped(spark)

    reader = spark.readStream.schema(DOCUMENTS_INTERLEAVED)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df, batch_id: int) -> None:
        commit_batch(backend, table, batch_df, batch_id)

    query = (stream.writeStream
             .foreachBatch(process)
             .option("checkpointLocation", checkpoint_path)
             .trigger(availableNow=True)
             .start())
    return query.awaitTermination(timeout_sec)
