"""Spark extraction stage: result parity with the pure-Python oracle
(one implementation, two harnesses — the Spark path must produce the SAME
span sequences the oracle produces directly)."""

from __future__ import annotations

from crawspark.corpus import make_doc
from crawspark.operators.extract import (
    extract_documents,
    interleave_documents,
    synthetic_corpus,
)
from crawspark.operators.partitioning import salted_repartition, with_size_bucket
from crawspark.oracle import extract_document
from crawspark.schema import DOCUMENTS_INTERLEAVED
from crawspark.sources import read_testdata


def _seq(spans) -> list[tuple]:
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_extract_matches_oracle(spark):
    docs = [make_doc(42, i) for i in range(24)]
    df = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs], schema=DOCUMENTS_INTERLEAVED)
    out = {r["doc_id"]: r.asDict(recursive=True)
           for r in extract_documents(df).collect()}
    assert len(out) == 24
    for d in docs:
        expected = extract_document(d["doc_id"], d["spans"])
        got = out[d["doc_id"]]
        assert _seq(got["spans"]) == _seq(expected["spans"]), d["doc_id"]
        assert got["lang"] == expected["lang"]
        assert got["n_spans"] == expected["n_spans"]


def test_extract_survives_salted_repartition(spark):
    docs = [make_doc(42, i) for i in range(16)]
    df = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs], schema=DOCUMENTS_INTERLEAVED)
    df = salted_repartition(df, partitions=4, salt_buckets=8)
    out = extract_documents(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 16
    for d in docs:  # same results regardless of partitioning
        expected = extract_document(d["doc_id"], d["spans"])
        assert rows[d["doc_id"]]["n_spans"] == expected["n_spans"]


def test_size_bucket_columns(spark):
    docs = [make_doc(42, i) for i in range(8)]
    df = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs], schema=DOCUMENTS_INTERLEAVED)
    rows = with_size_bucket(df).select("doc_id", "size_bytes", "bucket").collect()
    for r in rows:
        assert r["size_bytes"] > 0
        assert r["bucket"] == int(r["size_bytes"]).bit_length() - 1


def test_interleave_documents_testdata(spark, sf_dir):
    df = read_testdata(spark, sf_dir, "documents").limit(20)
    inter = interleave_documents(df)
    out = extract_documents(inter).collect()
    assert len(out) == 20
    # every non-empty source text must yield at least a title span
    nonempty = [r for r in out if r["n_spans"] > 0]
    assert len(nonempty) >= 18


def test_synthetic_corpus_distributed(spark):
    df = synthetic_corpus(spark, 50, seed=42, heavy_tail=False, partitions=4)
    assert df.count() == 50
    # determinism: regenerating gives identical doc_ids
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids[0] == "d42-000000000000" and len(set(ids)) == 50


def test_fused_path_equals_two_stage(spark, sf_dir):
    # interleave_and_extract (one Arrow hop) must be row-identical to
    # extract_documents(interleave_documents(df)) — both pure functions.
    from crawspark.operators.extract import interleave_and_extract
    from crawspark.sources import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    fused = {r["doc_id"]: r.asDict(recursive=True)
             for r in interleave_and_extract(docs).collect()}
    staged = {r["doc_id"]: r.asDict(recursive=True)
              for r in extract_documents(interleave_documents(docs)).collect()}
    assert fused == staged
