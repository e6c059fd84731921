"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.7,
§7 M8 — optional milestone).

The reference's crawl loop is a long-running incremental process
[R: crawtext.py main loop]; its Spark-native equivalent is a file-source
stream over the interleaved documents table with ``Trigger.AvailableNow``:
each invocation drains whatever input has appeared since the last run and
stops — incremental batch with streaming-checkpoint exactly-once
bookkeeping (offsets + sink commit log), complementing the batch
checkpoint table (crawspark.checkpoint) with engine-level dedup of input
files.

No watermarks / event-time windows: the semantics have no late-data or
event-time aggregation (SURVEY.md §2.7) — the stream is stateless
per-document extraction, so ``foreachBatch`` applies the SAME
extract_documents operator used in batch (one implementation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from crawspark.operators.extract import extract_documents
from crawspark.schema import DOCUMENTS_INTERLEAVED


def run_available_now(spark: SparkSession, input_path: str, output_path: str,
                      checkpoint_path: str, timeout_sec: int = 300) -> bool:
    """Drain all currently-available input files through extraction into
    ``output_path``; returns True when the drain completed. Re-invoking
    after new files land processes only the new files (exactly-once via
    the streaming checkpoint)."""
    # Ship the package before building the stream: the foreachBatch
    # extraction stage pickles a mapInArrow UDF whose workers must import
    # crawspark regardless of the driver's cwd/sys.path (the registry
    # wrapper also ships, but direct callers get the same guarantee here).
    from crawspark.bundle import ensure_shipped
    ensure_shipped(spark)

    stream = (spark.readStream
              .schema(DOCUMENTS_INTERLEAVED)
              .parquet(input_path))

    def process(batch_df, batch_id: int) -> None:
        (extract_documents(batch_df)
         .write.mode("append").parquet(output_path))

    query = (stream.writeStream
             .foreachBatch(process)
             .option("checkpointLocation", checkpoint_path)
             .trigger(availableNow=True)
             .start())
    return query.awaitTermination(timeout_sec)
