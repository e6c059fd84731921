"""Materialize the frozen Python oracle's extraction of the driver testdata
as a single parquet file, so the extraction-pipeline registry queries get a
real DuckDB oracle (VERDICT r1 item 2).

Deterministic by construction: ``interleave_from_text`` and
``extract_document`` are pure functions of each `documents` row, so the
Spark path (mapInArrow over the same code) and this file agree exactly.
Regenerate with::

    python tools/gen_extract_oracle.py

Output: tests/fixtures/extract_oracle/sf0_01.parquet with one row per
document: doc_id, lang, n_spans, spans (extracted), raw_chars (interleaved
input payload chars), content_chars (extracted payload chars), n_outlinks.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawspark.corpus import interleave_from_text  # noqa: E402
from crawspark.oracle import extract_document  # noqa: E402

SPAN_T = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))
SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("lang", pa.string()),
    ("n_spans", pa.int32()),
    ("spans", SPAN_T),
    ("raw_chars", pa.int64()),
    ("content_chars", pa.int64()),
    ("n_outlinks", pa.int64()),
    ("publish_date", pa.string()),
    ("tags", pa.list_(pa.string())),
    ("outlinks", pa.list_(pa.string())),
])


def materialize(sf_dir: str, out_path: str) -> int:
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    rows = {k: [] for k in SCHEMA.names}
    for r in docs.to_pylist():
        inter = interleave_from_text(r["doc_id"], r.get("text") or "",
                                     r.get("lang") or "en")
        res = extract_document(inter["doc_id"], inter["spans"])
        rows["doc_id"].append(res["doc_id"])
        rows["lang"].append(res["lang"])
        rows["n_spans"].append(res["n_spans"])
        rows["spans"].append(res["spans"])
        rows["raw_chars"].append(
            sum(len(s.get("text") or "") for s in inter["spans"]))
        rows["content_chars"].append(
            sum(len(s.get("text") or "") for s in res["spans"]))
        rows["n_outlinks"].append(len(res["outlinks"]))
        rows["publish_date"].append(res["publish_date"])
        rows["tags"].append(res["tags"])
        rows["outlinks"].append(res["outlinks"])
    tbl = pa.Table.from_pydict(rows, schema=SCHEMA)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(tbl, out_path, compression="zstd")
    return tbl.num_rows


if __name__ == "__main__":
    for sf, name in (("sf0.01", "sf0_01"), ("sf0.001", "sf0_001"),
                     ("sf0.1", "sf0_1")):
        sf_dir = f"/root/testdata/{sf}"
        out = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures", "extract_oracle", f"{name}.parquet")
        n = materialize(sf_dir, os.path.abspath(out))
        print(f"{sf}: {n} rows -> {out}")
