"""Registry surface for the Structured Streaming pipeline (SURVEY.md §2.7).

``stream_extract_incremental`` drives the REAL streaming path end to end —
write the interleaved table, drain it through the AvailableNow stream
(foreachBatch → the same extract_documents operator as batch), read the
sink back — and returns a per-language aggregate of the streamed output.
Because streaming and batch share one extraction implementation, the
result is oracle-checkable against the frozen oracle's materialized
extraction: an exactly-once / batch-parity property the driver's hash
compare verifies on every run.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zlib

from pyspark.sql import functions as F

from crawspark.operators.extraction_queries import ORACLE_PQ
from crawspark.registry import register


@register("stream_extract_incremental", sql=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_spans) AS BIGINT) AS total_spans
    FROM {ORACLE_PQ} GROUP BY lang
""")
def stream_extract_incremental(spark, sf_dir):
    from crawspark.operators.extract import interleave_documents
    from crawspark.sources import read_testdata
    from crawspark.streaming.extract_stream import run_available_now

    # crc32, not builtin hash() (salted per process); pid-scoped so a
    # concurrent driver + pytest pair cannot clobber each other's
    # snapshot or streaming checkpoint mid-drain. Re-runs within one
    # process reuse the same dir; atexit removes it so driver runs don't
    # accumulate corpus snapshots in tempdir.
    import atexit

    base = os.path.join(
        tempfile.gettempdir(),
        f"crawspark_stream_{os.getpid()}_{zlib.crc32(sf_dir.encode()):08x}")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    inp, out, ck = (os.path.join(base, d) for d in ("in", "out", "ck"))
    # fresh drain per invocation: clear sink + stream checkpoint, rewrite
    # the input snapshot (a second invocation with the checkpoint kept
    # would correctly drain zero new files — tested in
    # tests/test_streaming.py — but the registry contract wants the
    # full result every run).
    for d in (out, ck):
        shutil.rmtree(d, ignore_errors=True)
    (interleave_documents(read_testdata(spark, sf_dir, "documents"))
     .write.mode("overwrite").parquet(inp))
    if not run_available_now(spark, inp, out, ck, timeout_sec=600):
        raise RuntimeError("stream drain did not complete within timeout")
    return (spark.read.parquet(out)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_spans").cast("long").alias("total_spans")))
