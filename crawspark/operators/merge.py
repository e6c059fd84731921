"""MERGE INTO (upsert) over the transactional table layer.

The reference persists crawl/extraction results with per-URL upserts
[R: database.py store/update — matched rows replaced, new rows
inserted]. Spark-native shape: MERGE INTO target USING updates ON key —
WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT. With a real
Iceberg runtime this is one `MERGE INTO` SQL statement (copy-on-write);
the SnapshotParquetBackend emulation rewrites the table as one atomic
snapshot commit: anti-join keeps unmatched current rows, the updates
frame supplies matched replacements and inserts.

Scale note (10^12 rows): the anti-join shuffles on the merge key only;
with the target bucketed by key the join co-locates and the rewrite
cost is bounded by the touched buckets (Iceberg's merge-on-read shifts
it further to read time). The emulation rewrites everything — correct,
and the commit is still atomic — while the IcebergBackend path would
delegate to the engine's MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawspark.registry import register
from crawspark.sources import read_testdata
from crawspark.sources.tables import SnapshotParquetBackend


def merge_upsert(spark: SparkSession, backend: SnapshotParquetBackend,
                 table: str, updates: DataFrame, key: str) -> None:
    """Upsert ``updates`` into ``table`` on ``key`` (whole-row replace
    for matches, insert for new keys) as ONE atomic snapshot commit."""
    if not backend.exists(spark, table):
        backend.overwrite(updates, table)
        return
    current = backend.read(spark, table)
    kept = current.join(updates.select(key).distinct(), key, "left_anti")
    # preserve commit props (e.g. the streaming sink's batch-id marker)
    backend.overwrite(kept.unionByName(updates), table,
                      props=backend.table_props(table))


@register("merge_upsert_documents", sql="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id < 10000000 AND doc_id % 3 = 0
                         THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
             AS total_chars,
           CAST(sum(CASE WHEN doc_id >= 10000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inserted
    FROM (
      SELECT doc_id, source, n_chars FROM documents
      UNION ALL
      SELECT 10000000 + doc_id, 'merge-insert', 77
      FROM documents WHERE doc_id % 50 = 0
    ) GROUP BY source
""")
def merge_upsert_documents(spark, sf_dir):
    # Seed the table with the documents rows, then one MERGE that updates
    # every doc_id%3==0 row (n_chars += 1000) AND inserts a synthetic row
    # per doc_id%50==0 under a new key range; the final per-source
    # aggregate is closed-form in SQL. Pins: matched rows replaced not
    # duplicated, unmatched rows kept, inserts landed, all in one commit.
    from pyspark.sql import functions as F

    from crawspark.scratch import scratch_dir_fresh

    backend = SnapshotParquetBackend(scratch_dir_fresh("merge", sf_dir))
    docs = (read_testdata(spark, sf_dir, "documents")
            .select("doc_id", "source", "n_chars"))
    backend.overwrite(docs, "docs")
    updates = (docs.filter(F.col("doc_id") % 3 == 0)
               .withColumn("n_chars", F.col("n_chars") + 1000)
               .unionByName(
                   docs.filter(F.col("doc_id") % 50 == 0)
                   .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                           F.lit("merge-insert").alias("source"),
                           F.lit(77).cast("long").alias("n_chars"))))
    merge_upsert(spark, backend, "docs", updates, "doc_id")
    return (backend.read(spark, "docs")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.sum((F.col("doc_id") >= 10_000_000).cast("int"))
                 .cast("long").alias("n_inserted")))


def delete_where(spark: SparkSession, backend: SnapshotParquetBackend,
                 table: str, condition) -> int:
    """DELETE FROM table WHERE condition, as one atomic snapshot commit.
    Returns the number of rows deleted. With real Iceberg this is the
    engine's DELETE (positional/equality deletes); the emulation rewrites
    the survivors — prior snapshots still time-travel to the full data."""
    total = backend.read(spark, table).count()
    survivors = backend.read(spark, table).filter(~condition)
    # preserve commit props; count the survivors from the NEW snapshot
    # (already rewritten, smaller) instead of a third full source scan
    # (r4 review: three scans per delete)
    backend.overwrite(survivors, table, props=backend.table_props(table))
    return total - backend.read(spark, table).count()


@register("delete_where_documents", sql="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE NOT (n_chars < 100 OR doc_id % 7 = 0)
    GROUP BY source
""")
def delete_where_documents(spark, sf_dir):
    # DELETE of short docs + a key stripe, then aggregate the survivors;
    # oracle is the complementary filter over the source parquet.
    from pyspark.sql import functions as F

    from crawspark.scratch import scratch_dir_fresh

    backend = SnapshotParquetBackend(scratch_dir_fresh("del", sf_dir))
    docs = (read_testdata(spark, sf_dir, "documents")
            .select("doc_id", "source", "n_chars"))
    backend.overwrite(docs, "docs")
    delete_where(spark, backend, "docs",
                 (F.col("n_chars") < 100) | (F.col("doc_id") % 7 == 0))
    return (backend.read(spark, "docs")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars")))
