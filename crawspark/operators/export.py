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


@register("scan_orc_avro_roundtrip", sql="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY CAST(doc_id AS VARCHAR))) AS ids_md5
    FROM documents GROUP BY lang
""")
def scan_orc_avro_roundtrip(spark, sf_dir):
    # Third columnar format surface: the full documents table (including
    # the text column — ORC handles strings natively, unlike the CSV
    # path) round-trips through Spark's built-in ORC writer+reader, then
    # aggregates WITH a per-group id digest, so a row lost, duplicated or
    # type-mangled by the round trip flips the hash against the oracle
    # reading the original parquet. Avro is attempted too when the
    # spark-avro package is on the classpath (it is external to Spark
    # core) — gated, not required, so the query is env-portable.
    import os

    from crawspark.scratch import scratch_dir
    from crawspark.sources import read_testdata

    base = scratch_dir("orcfmt", sf_dir)
    orc_dir = os.path.join(base, "orc")
    docs = read_testdata(spark, sf_dir, "documents")
    docs.write.mode("overwrite").orc(orc_dir)
    back = spark.read.orc(orc_dir)
    try:  # optional: exercise Avro when the external package exists
        avro_dir = os.path.join(base, "avro")
        docs.limit(1).write.mode("overwrite").format("avro").save(avro_dir)
    except Exception:
        pass  # spark-avro not on the classpath — ORC is the claim here
    return (back.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.md5(F.concat_ws(
                     ",", F.sort_array(F.collect_list(
                         F.col("doc_id").cast("string")))))
                 .alias("ids_md5")))
