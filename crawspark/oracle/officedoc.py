"""OOXML (.docx) text extraction — ECMA-376 / ISO 29500.

A web crawl surfaces Office documents constantly; the text lives in
``word/document.xml`` inside a ZIP container. Extraction walks the
WordprocessingML body: one output entry per paragraph (``w:p``), the
concatenation of its text runs (``w:t``, with ``xml:space`` honored),
tabs (``w:tab`` → "\\t") and line breaks (``w:br`` → "\\n") in run
order. Table cells are paragraphs like any other and appear in
document order. stdlib only (zipfile + ElementTree).

The synthetic twin ``make_docx`` writes a deterministic container
(fixed ZipInfo timestamps, fixed member order) so the registry oracle
can recompute every paragraph closed-form.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_NS = {"w": _W}

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.'
    'main+xml"/></Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>')


def extract_docx_text(payload: bytes) -> list[str]:
    """One string per paragraph, document order. Never raises;
    non-OOXML bytes yield []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        with zf.open("word/document.xml") as f:
            root = ET.parse(f).getroot()
    except Exception:
        return []
    out: list[str] = []
    for p in root.iter(f"{{{_W}}}p"):
        parts: list[str] = []
        for node in p.iter():
            tag = node.tag
            if tag == f"{{{_W}}}t":
                parts.append(node.text or "")
            elif tag == f"{{{_W}}}tab":
                parts.append("\t")
            elif tag == f"{{{_W}}}br":
                parts.append("\n")
        out.append("".join(parts))
    return out


def make_docx(doc_id: int) -> bytes:
    """Deterministic .docx: 2 + d%4 paragraphs, each with 1 + (d+p)%3
    text runs ("doc {d} para {p} run {r}", space-separated via
    explicit runs — run texts concatenate with NO implicit space, so
    the separator run exercises xml:space='preserve'); every third
    paragraph carries a w:tab between runs. Fixed timestamps and
    member order keep the container byte-deterministic."""
    d = doc_id
    paras = []
    for p in range(2 + d % 4):
        runs = []
        for r in range(1 + (d + p) % 3):
            if r:
                runs.append(f'<w:r><w:t xml:space="preserve"> </w:t></w:r>'
                            if (d + p) % 3 != 2 or r != 1 else
                            "<w:r><w:tab/></w:r>")
            runs.append(f"<w:r><w:t>doc {d} para {p} run {r}</w:t></w:r>")
        paras.append("<w:p>" + "".join(runs) + "</w:p>")
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{_W}"><w:body>'
           + "".join(paras) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("word/document.xml", doc)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def docx_paragraph_expected(doc_id: int) -> list[str]:
    """The closed-form paragraphs make_docx encodes — the pure-Python
    statement of the oracle the SQL twin mirrors."""
    d = doc_id
    out = []
    for p in range(2 + d % 4):
        parts = []
        for r in range(1 + (d + p) % 3):
            if r:
                parts.append("\t" if (d + p) % 3 == 2 and r == 1 else " ")
            parts.append(f"doc {d} para {p} run {r}")
        out.append("".join(parts))
    return out
