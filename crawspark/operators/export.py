"""Corpus export sinks [R: export.py; report.py] and content-type routing.

The reference exports MongoDB collections to CSV/JSON; here the extracted
span table flattens (spans → to_json / exploded rows) and writes through
the standard DataFrame writers, so Catalyst owns the format encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawspark.operators.extraction_queries import (
    ORACLE_PQ as _ORACLE_PQ,
    _sf_sql,
)
from crawspark.registry import register
from crawspark.sources import read_testdata


def export_json(extracted: DataFrame, path: str) -> None:
    """One JSON object per document; spans nested (lossless export)."""
    extracted.write.mode("overwrite").json(path)


def export_csv(extracted: DataFrame, path: str) -> None:
    """CSV needs flat columns: spans serialize to a JSON string column and
    any other array column (tags) joins to a delimited string
    [R: export.py CSV field flattening]."""
    df = extracted.withColumn("spans_json", F.to_json("spans")).drop("spans")
    for name, dtype in df.dtypes:
        if dtype.startswith("array"):
            df = df.withColumn(name, F.array_join(name, "|"))
    df.write.mode("overwrite").option("header", True).csv(path)


def export_flat_spans(extracted: DataFrame, path: str) -> None:
    """Analysis-friendly export: one row per span (doc_id, kind, text,
    media_ref, offset) — the layout column stores scan best at 100 TB."""
    (extracted.select("doc_id", "lang", F.explode("spans").alias("s"))
     .select("doc_id", "lang", "s.kind", "s.text", "s.media_ref", "s.offset")
     .write.mode("overwrite").parquet(path))


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

@register("filter_content_type", sql="""
    SELECT CASE WHEN doc_id % 10 < 8 THEN 'html'
                WHEN doc_id % 10 < 9 THEN 'pdf'
                ELSE 'text' END AS kind,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY kind
""")
def filter_content_type(spark, sf_dir):
    # Content-type routing [R: url.py extension whitelist; page.py
    # content-type check]: the testdata proxy assigns kinds by the same
    # deterministic rule the interleave wrapper would use.
    kind = (F.when(F.col("doc_id") % 10 < 8, "html")
            .when(F.col("doc_id") % 10 < 9, "pdf")
            .otherwise("text"))
    return (read_testdata(spark, sf_dir, "documents")
            .groupBy(kind.alias("kind"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


@register("extract_outlinks", sql=_sf_sql(f"""
    SELECT doc_id, n_outlinks
    FROM {_ORACLE_PQ}
"""))
def extract_outlinks_q(spark, sf_dir):
    # Outlink surface [R: page.py outlinks]: per-doc distinct absolutized
    # hrefs from the content sequence. Per-doc rows (not an aggregate) so
    # the driver's value hash pins every document against the frozen
    # oracle's materialized extraction (tools/gen_extract_oracle.py).
    from crawspark.operators.extract import interleave_documents

    import pyarrow as pa

    def links(batches):
        from crawspark.oracle import extract_document
        for b in batches:
            rows = b.to_pylist()
            ids, counts = [], []
            for r in rows:
                res = extract_document(r["doc_id"], r["spans"] or [])
                ids.append(r["doc_id"])
                counts.append(len(res["outlinks"]))
            yield pa.RecordBatch.from_pydict(
                {"doc_id": ids, "n_outlinks": counts})

    docs = interleave_documents(read_testdata(spark, sf_dir, "documents"))
    return docs.mapInArrow(links, "doc_id string, n_outlinks long")


@register("scan_csv_json_sources", sql="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_from_csv
    FROM documents GROUP BY source
""")
def scan_csv_json_sources(spark, sf_dir):
    # Source-format surface: the documents table round-trips through BOTH
    # non-parquet readers — even doc_ids via CSV (header + explicit
    # schema; text column excluded: CSV is for flat typed columns),
    # odd doc_ids via JSON lines — then unions back and aggregates. The
    # oracle reads the parquet directly, so any reader/writer mangling
    # (type drift, quoting, header loss) flips the hash. Explicit schemas
    # on read: schema inference is an extra full scan at 100 TB and can
    # widen types nondeterministically.
    import os

    from crawspark.scratch import scratch_dir
    from crawspark.sources import read_testdata

    base = scratch_dir("srcfmt", sf_dir)
    csv_dir, json_dir = os.path.join(base, "csv"), os.path.join(base, "json")
    docs = read_testdata(spark, sf_dir, "documents")
    flat = docs.select("doc_id", "lang", "source", "n_chars")
    (flat.filter(F.col("doc_id") % 2 == 0)
     .write.mode("overwrite").option("header", True).csv(csv_dir))
    (flat.filter(F.col("doc_id") % 2 == 1)
     .write.mode("overwrite").json(json_dir))
    schema = "doc_id long, lang string, source string, n_chars long"
    from_csv = (spark.read.schema(schema).option("header", True).csv(csv_dir)
                .withColumn("from_csv", F.lit(1)))
    from_json = (spark.read.schema(schema).json(json_dir)
                 .withColumn("from_csv", F.lit(0)))
    both = from_csv.unionByName(from_json)
    return (both.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.sum("from_csv").cast("long").alias("n_from_csv")))


@register("scan_orc_roundtrip", sql="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(0 AS BIGINT) AS n_mismatched
    FROM documents GROUP BY lang
""")
def scan_orc_roundtrip(spark, sf_dir):
    # Third columnar format surface: the full documents table (including
    # the text column — ORC handles strings natively, unlike the CSV
    # path) round-trips through Spark's built-in ORC writer+reader and is
    # then FULL-OUTER-joined back to the original on doc_id, comparing a
    # per-row md5(text) digest plus the typed columns. Any row lost,
    # duplicated or mangled by the round trip lands in n_mismatched
    # (oracle pins 0 per lang) or shifts the per-lang counts. 100 TB
    # shape: the join shuffles doc_id + 32-byte digests, never text —
    # the crawl_snapshot_diff idiom, O(1) state per row (an earlier
    # draft collect_list'd every doc_id of a language into one
    # aggregation buffer; this replaces it).
    import os

    from crawspark.scratch import scratch_dir

    base = scratch_dir("orcfmt", sf_dir)
    orc_dir = os.path.join(base, "orc")
    docs = read_testdata(spark, sf_dir, "documents")
    docs.write.mode("overwrite").orc(orc_dir)
    orig = docs.select("doc_id", "lang", "n_chars",
                       F.md5("text").alias("h"))
    back = (spark.read.orc(orc_dir)
            .select(F.col("doc_id").alias("b_id"),
                    F.col("lang").alias("b_lang"),
                    F.col("n_chars").alias("b_chars"),
                    F.md5("text").alias("b_h")))
    j = orig.join(back, orig["doc_id"] == back["b_id"], "full")
    mism = (F.col("doc_id").isNull() | F.col("b_id").isNull()
            | (F.col("h") != F.col("b_h"))
            | (F.col("lang") != F.col("b_lang"))
            | (F.col("n_chars") != F.col("b_chars")))
    return (j.groupBy(F.coalesce("lang", "b_lang").alias("lang"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce("b_chars", "n_chars")).cast("bigint")
                 .alias("total_chars"),
                 F.sum(mism.cast("int")).cast("bigint")
                 .alias("n_mismatched")))
