"""OOXML (.docx / .xlsx) text extraction — ECMA-376 / ISO 29500.

A web crawl surfaces Office documents constantly; the text lives in
``word/document.xml`` (WordprocessingML) or ``xl/worksheets/*.xml``
(SpreadsheetML) inside a ZIP container.

DOCX extraction walks the WordprocessingML body: one output entry per
paragraph (``w:p``), the concatenation of its text runs (``w:t``, with
``xml:space`` honored), tabs (``w:tab`` → "\\t") and line breaks
(``w:br`` → "\\n") in run order. Table cells are paragraphs like any
other and appear in document order.

XLSX extraction resolves the three layers a real workbook indirects
through: ``xl/workbook.xml`` declares sheet ORDER and r:ids,
``xl/_rels/workbook.xml.rels`` maps each r:id to its worksheet part,
and shared-string cells (``t="s"``) hold an integer index into
``xl/sharedStrings.xml`` ``<si><t>`` entries. Cells within a row are
ordered by their A1-style column reference (writers may emit them out
of order); inline strings (``t="inlineStr"``, ``<is><t>``) and raw
numeric ``<v>`` text are taken verbatim. stdlib only
(zipfile + ElementTree).

The synthetic twins ``make_docx`` / ``make_xlsx`` write deterministic
containers (fixed ZipInfo timestamps, fixed member order) so the
registry oracles can recompute every paragraph / row closed-form.
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


_SS_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R_NS = ("http://schemas.openxmlformats.org/officeDocument/2006/"
         "relationships")
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_index(ref: str) -> int:
    """A1-style column letters → 0-based index (A=0, Z=25, AA=26)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def extract_xlsx_rows(payload: bytes) -> list[str]:
    """One string per sheet row (cells tab-joined in column order),
    sheets in workbook order. Resolves workbook → rels → worksheet
    parts and the sharedStrings indirection. Never raises; non-XLSX
    bytes yield []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        wb = ET.parse(zf.open("xl/workbook.xml")).getroot()
        rels = ET.parse(zf.open("xl/_rels/workbook.xml.rels")).getroot()
    except Exception:
        return []
    # r:id → worksheet part path (targets are workbook-relative)
    targets = {
        rel.get("Id"): "xl/" + rel.get("Target", "").lstrip("/")
        for rel in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
    }
    shared: list[str] = []
    try:
        sst = ET.parse(zf.open("xl/sharedStrings.xml")).getroot()
        for si in sst.iter(f"{{{_SS_NS}}}si"):
            shared.append("".join(
                t.text or "" for t in si.iter(f"{{{_SS_NS}}}t")))
    except KeyError:
        pass  # workbook with no string cells ships no sharedStrings part
    except Exception:
        return []
    out: list[str] = []
    for sheet in wb.iter(f"{{{_SS_NS}}}sheet"):
        part = targets.get(sheet.get(f"{{{_R_NS}}}id"))
        if not part:
            continue
        try:
            ws = ET.parse(zf.open(part)).getroot()
        except Exception:
            continue
        for row in ws.iter(f"{{{_SS_NS}}}row"):
            cells: list[tuple[int, str]] = []
            for pos, c in enumerate(row.iter(f"{{{_SS_NS}}}c")):
                ref = c.get("r")
                col = _col_index(ref) if ref else pos
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{{{_SS_NS}}}is")
                    text = "".join(
                        t.text or ""
                        for t in is_el.iter(f"{{{_SS_NS}}}t")
                    ) if is_el is not None else ""
                else:
                    v = c.find(f"{{{_SS_NS}}}v")
                    raw = (v.text or "") if v is not None else ""
                    if ctype == "s":
                        try:
                            text = shared[int(raw)]
                        except (ValueError, IndexError):
                            text = ""
                    else:  # numeric / str-formula / boolean: verbatim <v>
                        text = raw
                cells.append((col, text))
            cells.sort(key=lambda kv: kv[0])
            out.append("\t".join(t for _, t in cells))
    return out


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    '</Types>')

_XLSX_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>')


def xlsx_shared_strings(doc_id: int) -> list[str]:
    return [f"doc {doc_id} shared {i}" for i in range(3 + doc_id % 3)]


def make_xlsx(doc_id: int) -> bytes:
    """Deterministic .xlsx: 1 + d%2 sheets; sheet s has 2 + (d+s)%3
    rows; each row holds a shared-string cell (col A, index
    (d+s+r) % n_shared), an inline-string cell (col B) and a numeric
    cell (col C). Odd (d+s+r) rows emit the cells in REVERSE XML order
    so the extractor's column-ref sort is on the hash path. Sheet rels
    are intentionally listed reversed to exercise r:id resolution."""
    d = doc_id
    shared = xlsx_shared_strings(d)
    n_sheets = 1 + d % 2
    sheets_xml: list[str] = []
    for s in range(n_sheets):
        rows = []
        for r in range(2 + (d + s) % 3):
            num = d * 100 + s * 10 + r
            cells = [
                f'<c r="A{r + 1}" t="s"><v>{(d + s + r) % len(shared)}'
                '</v></c>',
                f'<c r="B{r + 1}" t="inlineStr"><is><t xml:space='
                f'"preserve">inline {d} {s} {r}</t></is></c>',
                f'<c r="C{r + 1}"><v>{num}</v></c>',
            ]
            if (d + s + r) % 2:
                cells.reverse()
            rows.append(f'<row r="{r + 1}">' + "".join(cells) + "</row>")
        sheets_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_SS_NS}"><sheetData>'
            + "".join(rows) + "</sheetData></worksheet>")
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          f'<workbook xmlns="{_SS_NS}" xmlns:r="{_R_NS}"><sheets>'
          + "".join(f'<sheet name="s{s}" sheetId="{s + 1}" '
                    f'r:id="rId{s + 1}"/>' for s in range(n_sheets))
          + "</sheets></workbook>")
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               f'<Relationships xmlns="{_PKG_REL_NS}">'
               + "".join(
                   f'<Relationship Id="rId{s + 1}" Type="http://schemas.'
                   'openxmlformats.org/officeDocument/2006/relationships/'
                   f'worksheet" Target="worksheets/sheet{s + 1}.xml"/>'
                   for s in reversed(range(n_sheets)))
               + '<Relationship Id="rIdS" Type="http://schemas.'
               'openxmlformats.org/officeDocument/2006/relationships/'
               'sharedStrings" Target="sharedStrings.xml"/>'
               '</Relationships>')
    sst = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<sst xmlns="{_SS_NS}" count="{len(shared)}" '
           f'uniqueCount="{len(shared)}">'
           + "".join(f'<si><t xml:space="preserve">{t}</t></si>'
                     for t in shared)
           + "</sst>")
    members = [("[Content_Types].xml", _XLSX_CONTENT_TYPES),
               ("_rels/.rels", _XLSX_ROOT_RELS),
               ("xl/workbook.xml", wb),
               ("xl/_rels/workbook.xml.rels", wb_rels),
               ("xl/sharedStrings.xml", sst)]
    members += [(f"xl/worksheets/sheet{s + 1}.xml", sheets_xml[s])
                for s in range(n_sheets)]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def xlsx_rows_expected(doc_id: int) -> list[str]:
    """The closed-form rows make_xlsx encodes — the pure-Python
    statement of the oracle the SQL twin mirrors."""
    d = doc_id
    shared = xlsx_shared_strings(d)
    out = []
    for s in range(1 + d % 2):
        for r in range(2 + (d + s) % 3):
            out.append("\t".join([
                shared[(d + s + r) % len(shared)],
                f"inline {d} {s} {r}",
                str(d * 100 + s * 10 + r),
            ]))
    return out


_ODF_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODF_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def extract_odt_text(payload: bytes) -> list[str]:
    """OpenDocument Text (ODF 1.2): one string per ``text:p``/``text:h``
    in ``content.xml`` body order; ``text:s`` expands to its ``text:c``
    count of spaces (ODF collapses literal runs of spaces — the
    expansion is the real mechanic), ``text:tab`` → "\\t",
    ``text:line-break`` → "\\n", spans flatten. Never raises; non-ODT
    bytes yield []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        root = ET.parse(zf.open("content.xml")).getroot()
    except Exception:
        return []
    out: list[str] = []
    for p in root.iter():
        if p.tag not in (f"{{{_ODF_TEXT}}}p", f"{{{_ODF_TEXT}}}h"):
            continue
        parts: list[str] = []

        def walk(node) -> None:
            if node.tag == f"{{{_ODF_TEXT}}}s":
                parts.append(" " * int(node.get(
                    f"{{{_ODF_TEXT}}}c", "1")))
            elif node.tag == f"{{{_ODF_TEXT}}}tab":
                parts.append("\t")
            elif node.tag == f"{{{_ODF_TEXT}}}line-break":
                parts.append("\n")
            if node.text:
                parts.append(node.text)
            for child in node:
                walk(child)
                if child.tail:
                    parts.append(child.tail)

        walk(p)
        out.append("".join(parts))
    return out


def odt_paragraphs_expected(doc_id: int) -> list[str]:
    """Closed form of make_odt: heading then 1 + d%3 paragraphs."""
    d = doc_id
    out = [f"doc {d} odt heading"]
    for p in range(1 + d % 3):
        t = f"doc {d} odt para {p}"
        t += " " * (1 + (d + p) % 3) + "gap"
        if (d + p) % 2 == 1:
            t += "\tcafé"
        out.append(t)
    return out


def make_odt(doc_id: int) -> bytes:
    """Deterministic .odt: mimetype member (STORED first, per OCF),
    content.xml with a heading, spans, multi-space text:s expansion
    and text:tab on odd parities."""
    d = doc_id
    paras = [f'<text:h text:outline-level="1">doc {d} odt heading'
             "</text:h>"]
    for p in range(1 + d % 3):
        inner = (f"doc {d} odt "
                 f"<text:span>para {p}</text:span>"
                 f'<text:s text:c="{1 + (d + p) % 3}"/>gap')
        if (d + p) % 2 == 1:
            inner += "<text:tab/>café"
        paras.append(f"<text:p>{inner}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
        f'xmlns:text="{_ODF_TEXT}"><office:body><office:text>'
        + "".join(paras)
        + "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, "application/vnd.oasis.opendocument.text")
        zi = zipfile.ZipInfo("content.xml",
                             date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(zi, content.encode())
    return buf.getvalue()


_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P_NS = ("http://schemas.openxmlformats.org/presentationml/2006/main")


def extract_pptx_text(payload: bytes) -> list[str]:
    """One string per DrawingML paragraph (``a:p`` — runs ``a:t``
    concatenated, ``a:br`` → "\\n"), slides in ``p:sldIdLst`` order
    resolved through the presentation rels. Never raises; non-PPTX
    bytes yield []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        pres = ET.parse(zf.open("ppt/presentation.xml")).getroot()
        rels = ET.parse(
            zf.open("ppt/_rels/presentation.xml.rels")).getroot()
    except Exception:
        return []
    targets = {
        rel.get("Id"): "ppt/" + rel.get("Target", "").lstrip("/")
        for rel in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
    }
    out: list[str] = []
    for sld in pres.iter(f"{{{_P_NS}}}sldId"):
        part = targets.get(sld.get(f"{{{_R_NS}}}id"))
        if not part:
            continue
        try:
            root = ET.parse(zf.open(part)).getroot()
        except Exception:
            continue
        for p in root.iter(f"{{{_A_NS}}}p"):
            parts: list[str] = []
            for node in p.iter():
                if node.tag == f"{{{_A_NS}}}t":
                    parts.append(node.text or "")
                elif node.tag == f"{{{_A_NS}}}br":
                    parts.append("\n")
            out.append("".join(parts))
    return out


def make_pptx(doc_id: int) -> bytes:
    """Deterministic .pptx: 1 + d%3 slides; slide s holds 1 + (d+s)%3
    paragraphs; paragraph p is one run, plus a second run
    " x{(d+s+p)%5}" when (d+s+p) is odd (run concatenation on the hash
    path). The sldIdLst is in order but the rels are listed REVERSED to
    exercise r:id resolution."""
    d = doc_id
    n_slides = 1 + d % 3
    slides_xml = []
    for s in range(n_slides):
        paras = []
        for p in range(1 + (d + s) % 3):
            runs = f"<a:r><a:t>doc {d} slide {s} para {p}</a:t></a:r>"
            if (d + s + p) % 2:
                runs += f"<a:r><a:t> x{(d + s + p) % 5}</a:t></a:r>"
            paras.append("<a:p>" + runs + "</a:p>")
        slides_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P_NS}" xmlns:a="{_A_NS}"><p:cSld>'
            "<p:spTree><p:sp><p:txBody>" + "".join(paras)
            + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
    pres = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:presentation xmlns:p="{_P_NS}" xmlns:r="{_R_NS}">'
            "<p:sldIdLst>"
            + "".join(f'<p:sldId id="{256 + s}" r:id="rId{s + 1}"/>'
                      for s in range(n_slides))
            + "</p:sldIdLst></p:presentation>")
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">'
            + "".join(
                f'<Relationship Id="rId{s + 1}" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                f'slide" Target="slides/slide{s + 1}.xml"/>'
                for s in reversed(range(n_slides)))
            + "</Relationships>")
    members = [("_rels/.rels", _XLSX_ROOT_RELS.replace(
                    "xl/workbook.xml", "ppt/presentation.xml")),
               ("ppt/presentation.xml", pres),
               ("ppt/_rels/presentation.xml.rels", rels)]
    members += [(f"ppt/slides/slide{s + 1}.xml", slides_xml[s])
                for s in range(n_slides)]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def pptx_paragraphs_expected(doc_id: int) -> list[str]:
    """The closed-form paragraphs make_pptx encodes."""
    d = doc_id
    out = []
    for s in range(1 + d % 3):
        for p in range(1 + (d + s) % 3):
            t = f"doc {d} slide {s} para {p}"
            if (d + s + p) % 2:
                t += f" x{(d + s + p) % 5}"
            out.append(t)
    return out


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
