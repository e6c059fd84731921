"""Watermarked stream-stream interval join (SURVEY.md §2.7 extension).

The crawl/ingestion monitoring shape the other streaming operators don't
cover: two live event feeds correlated per user within a bounded time
interval. Both sides carry watermarks and the join condition pairs an
equality key with a time range — exactly what Structured Streaming needs
to bound the join state (rows older than watermark + interval are evicted
instead of accumulating forever, the property that keeps this runnable
against an unbounded 10^12-event feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")


def stream_stream_user_join(spark: SparkSession, left_path: str,
                            right_path: str,
                            interval: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Inner-join two event streams on user_id where the right event
    falls within ``interval`` AFTER the left event (inclusive bounds)."""
    left = (spark.readStream.schema(_EVENTS_SCHEMA).parquet(left_path)
            .withWatermark("ts", watermark).alias("l"))
    right = (spark.readStream.schema(_EVENTS_SCHEMA).parquet(right_path)
             .withWatermark("ts", watermark).alias("r"))
    cond = F.expr(
        f"l.user_id = r.user_id AND r.ts >= l.ts "
        f"AND r.ts <= l.ts + interval {interval}")
    return (left.join(right, cond)
            .select(F.col("l.user_id").alias("user_id"),
                    F.col("l.event_id").alias("left_id"),
                    F.col("r.event_id").alias("right_id")))


def run_join_available_now(spark: SparkSession, left_path: str,
                           right_path: str, output_path: str,
                           checkpoint_path: str,
                           timeout_sec: int = 300,
                           watermark: str = "30 minutes") -> bool:
    """Drain the interval join with availableNow. NOTE: if the drain
    splits into multiple microbatches, rows older than watermark +
    interval are evicted between batches — that is correct streaming
    semantics, but callers comparing against a BATCH join must pass a
    watermark covering the input's full time span (see the registry
    query's span-derived watermark)."""
    joined = stream_stream_user_join(spark, left_path, right_path,
                                     watermark=watermark)
    q = (joined.writeStream.format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    return q.awaitTermination(timeout_sec)
