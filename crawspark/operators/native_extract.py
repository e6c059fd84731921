"""Arrow-native extraction job: workers read their own parquet splits and
write their own output shards; the JVM only schedules tasks and collects
per-file metrics.

Why this exists (measured in this sandbox, 32 cores, pinned):

| pipeline                             | docs/s @8 | docs/s @32 |
|--------------------------------------|-----------|------------|
| raw multiprocessing (substrate)      | 2251      | 5627       |
| JVM scan -> mapInArrow -> JVM write  | 1879      | 4072       |
| worker-native read+extract+write     | 2599      | 5514       |

Spark's InternalRow<->Arrow conversion and nested-parquet encode compete
with the Python workers for the same cores; moving I/O into the workers
(pyarrow C++ readers/writers) brings the job to ~parity with the raw
process substrate. On a real cluster the same layout means executors'
python workers stream straight from object storage — the JVM never
touches the payload bytes.

Exactly-once semantics: the output shard name is derived from the input
file name, shards are written to a run-scoped directory, and the
checkpoint table records (file, fingerprint, counts) — re-running a file
REPLACES its shard (idempotent), mirroring Iceberg overwritePartitions.
This is the file-granular twin of crawspark.checkpoint (doc-hash
granular); at 10^12 docs the file/manifest granularity is the one Iceberg
gives you for free.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

METRICS_SCHEMA = ("file string, docs_in long, docs_out long, spans_out long, "
                  "input_fingerprint string")


def list_parquet_files(input_path: str) -> list[str]:
    return sorted(
        os.path.join(input_path, f) for f in os.listdir(input_path)
        if f.endswith(".parquet"))


def _doc_hash64(doc_id) -> int:
    """Stable (process/run/executor-independent) 64-bit doc hash.

    Python's builtin ``hash()`` is salted per process (PYTHONHASHSEED), so
    fingerprints built from it are not comparable across runs — blake2b is.
    """
    return int.from_bytes(
        hashlib.blake2b(str(doc_id).encode(), digest_size=8).digest(), "big")


def _content_sig(path: str) -> str:
    """Physical-bytes drift signal from the parquet footer alone: compressed
    file size + row count + uncompressed row-group bytes. A rewritten shard
    whose doc_ids are unchanged but whose payloads differ changes the
    compressed size with near-certainty (ADVICE r2 — the doc-id xor alone
    silently skipped such shards)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    tbs = sum(md.row_group(i).total_byte_size
              for i in range(md.num_row_groups))
    return f"{os.path.getsize(path)}:{md.num_rows}:{tbs}"


def _combined_fp(xor_fp: int, path: str) -> str:
    """THE fingerprint format — single construction site so the
    extract-time computation (_make_worker) and the resume re-check
    (file_fingerprint) can never drift apart (format drift would make
    recorded and recomputed fingerprints permanently unequal and silently
    defeat resume). Note: extending this format invalidates checkpoints
    recorded under the previous format — one full re-extract, then
    steady state."""
    return f"{xor_fp}:{_content_sig(path)}"


def file_fingerprint(path: str) -> str:
    """Order-independent doc-membership fingerprint (xor of per-doc 64-bit
    hashes) + the footer content signature.

    Reads ONLY the doc_id column (columnar projection) plus the footer —
    cheap relative to re-extracting, which is the whole point of the
    resume drift check."""
    import pyarrow.parquet as pq

    fp = 0
    for rb in pq.read_table(path, columns=["doc_id"]).to_batches():
        for doc_id in rb.column("doc_id").to_pylist():
            fp ^= _doc_hash64(doc_id)
    return _combined_fp(fp, path)


def _fingerprint_worker(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    pa.set_cpu_count(1)  # see read_extract_write
    for b in batches:
        for path in b.column("path").to_pylist():
            yield pa.RecordBatch.from_pydict({
                "file": [os.path.basename(path)],
                "input_fingerprint": [file_fingerprint(path)],
            })


def _make_worker(out_dir: str):
    def read_extract_write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from crawspark.operators.extract import (
            TARGET_BATCH_BYTES,
            _extract_rows,
            _rechunk_rows,
        )

        # One worker per core: pyarrow's INTERNAL pool defaults to
        # os.cpu_count() threads PER WORKER (32 workers x 32 arrow threads
        # thrash the scheduler — measured 6574 -> ~11500 docs/s at
        # local[32] on 32 pinned cores once capped).
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)

        for b in batches:
            cols = b.schema.names
            rg_los = (b.column("rg_lo").to_pylist() if "rg_lo" in cols
                      else [None] * b.num_rows)
            rg_his = (b.column("rg_hi").to_pylist() if "rg_hi" in cols
                      else [None] * b.num_rows)
            for path, rg_lo, rg_hi in zip(b.column("path").to_pylist(),
                                          rg_los, rg_his):
                fp = 0
                docs_in = 0
                docs_out = 0
                spans_out = 0
                name = os.path.basename(path)
                # Fully streaming per unit (heavy-tail mandate): Arrow
                # batches in via iter_batches, byte-bounded re-chunks
                # through extraction, row groups out via ParquetWriter —
                # worker memory is ~TARGET_BATCH_BYTES + one document,
                # never the whole shard (the old path accumulated every
                # output batch before one write_table).
                pf = pq.ParquetFile(path)
                if rg_lo is None:           # whole-file unit
                    it = pf.iter_batches(batch_size=1000)
                else:                        # row-group-range unit
                    it = pf.iter_batches(
                        batch_size=1000, row_groups=range(rg_lo, rg_hi))
                    name = f"{name[:-len('.parquet')]}-rg{rg_lo}.parquet"
                writer = None
                try:
                    for rows in _rechunk_rows(it, TARGET_BATCH_BYTES):
                        docs_in += len(rows)
                        for r in rows:
                            # order-independent fingerprint (xor of stable
                            # 64-bit doc hashes) — resume invalidates on
                            # input drift
                            fp ^= _doc_hash64(r["doc_id"])
                        out = _extract_rows(rows)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                os.path.join(out_dir, name), out.schema,
                                compression="snappy")
                        writer.write_batch(out)
                        docs_out += out.num_rows
                        spans_out += sum(out.column("n_spans").to_pylist())
                    if writer is None:  # zero-row shard still gets a file
                        empty = _extract_rows([])
                        writer = pq.ParquetWriter(
                            os.path.join(out_dir, name), empty.schema,
                            compression="snappy")
                        writer.write_batch(empty)
                finally:
                    if writer is not None:
                        writer.close()
                    pf.close()
                fprint = ("" if rg_lo is not None
                          else _combined_fp(fp, path))
                yield pa.RecordBatch.from_pydict({
                    "file": [name],
                    "docs_in": [docs_in],
                    "docs_out": [docs_out],
                    "spans_out": [spans_out],
                    "input_fingerprint": [fprint],
                })
    return read_extract_write


def plan_units(files: list[str],
               target_units: int) -> list[tuple[str, int, int]]:
    """Split files into (path, rg_lo, rg_hi) work units of roughly equal
    row-group counts so ~``target_units`` units cover the input — the
    native-worker twin of FileSourceScanExec's maxPartitionBytes file
    splitting. Smaller units shrink the straggler tail: with one unit
    per file the last wave idles (cores-1) slots for up to one whole
    file's duration (measured: ~2.1 s/file at 32 cores = the entire
    spark-vs-substrate gap); quarter-file units cut that tail 4x. Only
    the parquet FOOTERS are read here (the planning step — at 10^12 docs
    this is the manifest scan Iceberg does for free)."""
    import pyarrow.parquet as pq

    n_files = max(len(files), 1)
    per_file = max(1, round(target_units / n_files))
    units: list[tuple[str, int, int]] = []
    for f in files:
        n_rg = pq.read_metadata(f).num_row_groups
        if n_rg == 0:
            # Spark writes zero-row-group parquet for empty partitions;
            # one empty unit keeps the zero-row output shard + metrics
            # row the whole-file path produces (r5 review finding:
            # divmod by zero crashed planning here).
            units.append((f, 0, 0))
            continue
        k = min(per_file, n_rg)
        # contiguous row-group ranges, sizes differing by at most 1
        base, rem = divmod(n_rg, k)
        lo = 0
        for i in range(k):
            hi = lo + base + (1 if i < rem else 0)
            units.append((f, lo, hi))
            lo = hi
    return units


def native_extract_job(spark: SparkSession, input_path: str, output_path: str,
                       done_files: set[str] | None = None,
                       target_units: int | None = None) -> DataFrame:
    """Distributed read→extract→write with worker-native I/O.

    Returns the per-file metrics DataFrame (tiny); the extracted table is
    written to ``output_path`` as one shard per input file. ``done_files``
    (from the checkpoint table) are skipped — resume support.

    ``target_units``: split files into roughly this many row-group-range
    units (plan_units) instead of one task per file — the straggler-tail
    fix for wide clusters (pass ~8x the core count). Sub-file units do
    not record fingerprints (resume stays file-granular); leave None on
    checkpointed runs."""
    if done_files and target_units is not None:
        # sub-file units record no fingerprints, so a checkpoint written
        # from a split run can never match on resume — every file would
        # silently re-extract forever (r5 review finding: the docstring
        # was the only guard)
        raise ValueError(
            "target_units is incompatible with checkpointed resume "
            "(done_files): sub-file units record no fingerprints")
    os.makedirs(output_path, exist_ok=True)
    files = list_parquet_files(input_path)
    if done_files:
        files = [f for f in files if os.path.basename(f) not in done_files]
    if not files:
        return spark.createDataFrame([], METRICS_SCHEMA)
    if target_units is not None and target_units > len(files):
        units = plan_units(files, target_units)
        udf_ = spark.createDataFrame(units, "path string, rg_lo int, rg_hi int")
        return (udf_.repartition(len(units))
                .mapInArrow(_make_worker(output_path), METRICS_SCHEMA))
    fdf = (spark.createDataFrame([(f,) for f in files], "path string")
           .repartition(len(files)))
    return fdf.mapInArrow(_make_worker(output_path), METRICS_SCHEMA)


def run_native_checkpointed(spark: SparkSession, input_path: str,
                            output_path: str, checkpoint_path: str,
                            run_id: str, completed_ts: str) -> dict:
    """Resumable wrapper: skip files already checkpointed for this run.

    A file is only skipped when its RECORDED fingerprint matches the file's
    CURRENT fingerprint — drift (a rewritten input shard) forces re-extract.
    The fingerprint re-check is itself distributed (doc_id-column-only scan
    via mapInArrow) so the driver never reads payload bytes."""
    done: set[str] = set()
    if os.path.isdir(checkpoint_path) and os.listdir(checkpoint_path):
        ck = spark.read.parquet(checkpoint_path)
        recorded = {r["file"]: r["input_fingerprint"] for r in
                    (ck.filter((F.col("run_id") == run_id)
                               & (F.col("status") == "done"))
                     .select("file", "input_fingerprint").collect())}
        candidates = [f for f in list_parquet_files(input_path)
                      if os.path.basename(f) in recorded]
        if candidates:
            cdf = (spark.createDataFrame([(f,) for f in candidates],
                                         "path string")
                   .repartition(len(candidates)))
            current = cdf.mapInArrow(
                _fingerprint_worker,
                "file string, input_fingerprint string").collect()
            done = {r["file"] for r in current
                    if recorded.get(r["file"]) == r["input_fingerprint"]}
    metrics = native_extract_job(spark, input_path, output_path, done)
    rows = metrics.collect()
    if rows:
        ck_rows = spark.createDataFrame(
            [(run_id, r["file"], "done", r["docs_in"], r["docs_out"],
              r["spans_out"], r["input_fingerprint"]) for r in rows],
            schema=("run_id string, file string, status string, docs_in long,"
                    " docs_out long, spans_out long, input_fingerprint string"),
        ).withColumn("completed_ts", F.lit(completed_ts).cast("timestamp"))
        ck_rows.write.mode("append").parquet(checkpoint_path)
    return {
        "run_id": run_id,
        "files_processed": len(rows),
        "files_skipped": len(done),
        "docs_out": sum(r["docs_out"] for r in rows),
        "spans_out": sum(r["spans_out"] for r in rows),
    }
