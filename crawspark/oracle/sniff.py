"""Format sniffing + unified extraction routing — the ingestion
front door.

A crawl's payload column is a bag of mixed bytes; before any parser
runs, something must decide WHICH parser. ``sniff_format`` detects the
container from magic bytes plus cheap structural probes (ZIP members
for the OOXML/EPUB family, the CFB directory for legacy Office, header
shape for mail), never trusting file extensions or Content-Type — both
lie constantly on the web. ``extract_any`` dispatches to the matching
from-scratch extractor and returns uniform (format, text units).

Detection order matters: every ZIP is ``PK\\x03\\x04``, every legacy
Office file is CFB — the refinement probes must run before the generic
fallbacks. All probes are bounded (central directory / first KB), so
sniffing a 100 MB payload stays cheap.
"""

from __future__ import annotations

import io
import re
import zipfile

_MAGIC = (
    (b"%PDF-", "pdf"),
    (b"{\\rtf", "rtf"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"BM", "bmp"),
    (b"WARC/1.", "warc"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "cfb"),
    (b"PK\x03\x04", "zip"),
    (b"fLaC", "flac"),
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
)

_RE_HDR = re.compile(rb"^[A-Za-z][A-Za-z0-9-]*:", re.MULTILINE)


def sniff_format(payload: bytes) -> str:
    """Container format from content alone. One of: pdf docx xlsx pptx
    epub zip doc cfb rtf eml html warc png gif jpeg bmp webp wav mp4
    mp3 flac text unknown."""
    if not payload:
        return "unknown"
    head = payload[:64]
    kind = None
    for magic, name in _MAGIC:
        if head.startswith(magic):
            kind = name
            break
    if kind is None:
        if head[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            kind = "wav"
        elif head[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            kind = "webp"
        elif payload[4:8] == b"ftyp":
            kind = "mp4"
        elif head[:3] == b"ID3" or head[:2] in (b"\xff\xfb", b"\xff\xfa"):
            kind = "mp3"
        elif payload[257:262] == b"ustar":
            kind = "tar"
    if kind in ("gzip", "bzip2", "xz"):
        # refine: a compressed tar is the common dump container —
        # stream just the first block out, never the whole payload
        try:
            if kind == "gzip":
                import zlib as _z
                first = _z.decompressobj(31).decompress(
                    payload[:8192], 512)
            elif kind == "bzip2":
                import bz2 as _b
                first = _b.BZ2Decompressor().decompress(
                    payload[:8192], 512)
            else:
                import lzma as _l
                first = _l.LZMADecompressor().decompress(
                    payload[:8192], 512)
            if first[257:262] == b"ustar":
                return "tar"
        except Exception:
            pass
        return kind
    if kind == "zip":
        try:
            names = set(zipfile.ZipFile(io.BytesIO(payload)).namelist())
        except Exception:
            return "zip"
        if "word/document.xml" in names:
            return "docx"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "ppt/presentation.xml" in names:
            return "pptx"
        if "META-INF/container.xml" in names:
            return "epub"
        if "content.xml" in names:
            try:
                mt = zipfile.ZipFile(io.BytesIO(payload)).read(
                    "mimetype").decode("ascii", "replace")
            except Exception:
                mt = ""
            if "opendocument.text" in mt:
                return "odt"
            return "odf" if "opendocument" in mt else "zip"
        return "zip"
    if kind == "cfb":
        # refine: a Word file carries a WordDocument stream
        try:
            from crawspark.oracle.cfbdoc import _Cfb
            names = {e[0] for e in _Cfb(payload).entries}
            return "doc" if "WordDocument" in names else "cfb"
        except Exception:
            return "cfb"
    if kind is not None:
        return kind
    probe = payload[:4096]
    low = probe[:512].lstrip().lower()
    if low.startswith((b"<!doctype html", b"<html")) or b"<html" in low:
        return "html"
    # mail: a header block (name: value lines) with mail-specific names
    # before the first blank line
    head_block = probe.split(b"\n\n", 1)[0].split(b"\r\n\r\n", 1)[0]
    if _RE_HDR.search(head_block):
        lowered = head_block.lower()
        if (b"subject:" in lowered or b"from:" in lowered) and \
                b"mime-version:" in lowered or b"received:" in lowered:
            return "eml"
        if b"subject:" in lowered and b"from:" in lowered:
            return "eml"
    try:
        text = probe.decode("utf-8")
    except UnicodeDecodeError:
        return "unknown"
    if "\\documentclass" in text[:512] or "\\begin{document}" in text:
        return "latex"
    first = text.lstrip("\n").split("\n", 1)[0]
    if (first.startswith("# ") or "\n## " in text or "\n```" in text
            or "](http" in text):
        return "markdown"
    return "text"


def build_format_payload(doc_id: int) -> bytes:
    """The router corpus: doc_id % 8 selects which of the eight binary
    formats this doc synthesizes (shared by the batch router, the
    streaming router, and the WARC-wrapped transport query — one
    builder, one oracle)."""
    d, k = doc_id, doc_id % 8
    if k == 0:
        from crawspark.oracle.officedoc import make_docx
        return make_docx(d)
    if k == 1:
        from crawspark.oracle.officedoc import make_xlsx
        return make_xlsx(d)
    if k == 2:
        from crawspark.oracle.officedoc import make_pptx
        return make_pptx(d)
    if k == 3:
        from crawspark.oracle.rtf import make_rtf
        return make_rtf(d)
    if k == 4:
        from crawspark.oracle.cfbdoc import make_legacy_doc
        return make_legacy_doc(d)
    if k == 5:
        from crawspark.oracle.mailmsg import make_eml
        return make_eml(d)
    if k == 6:
        from crawspark.oracle.epub import make_epub
        return make_epub(d)
    from crawspark.oracle.pdfcrypt import make_plain_pdf
    pages = [[f"doc {d} page {p} line {j}"
              for j in range(2 + (d + p) % 3)]
             for p in range(1 + d % 3)]
    return make_plain_pdf(pages, flate=d % 2 == 0)


def extract_any(payload: bytes) -> tuple[str, list[str]]:
    """(detected format, text units). Units are the format's natural
    granularity — paragraphs, sheet rows, slide paras, pages, chapters,
    mail subject+body lines, html <p> texts. Unknown → []."""
    fmt = sniff_format(payload)
    if fmt == "docx":
        from crawspark.oracle.officedoc import extract_docx_text
        return fmt, extract_docx_text(payload)
    if fmt == "xlsx":
        from crawspark.oracle.officedoc import extract_xlsx_rows
        return fmt, extract_xlsx_rows(payload)
    if fmt == "pptx":
        from crawspark.oracle.officedoc import extract_pptx_text
        return fmt, extract_pptx_text(payload)
    if fmt == "odt":
        from crawspark.oracle.officedoc import extract_odt_text
        return fmt, extract_odt_text(payload)
    if fmt == "epub":
        from crawspark.oracle.epub import extract_epub_text
        return fmt, extract_epub_text(payload)
    if fmt == "rtf":
        from crawspark.oracle.rtf import extract_rtf_text
        return fmt, extract_rtf_text(payload)
    if fmt == "doc":
        from crawspark.oracle.cfbdoc import extract_doc_text
        return fmt, extract_doc_text(payload)
    if fmt == "pdf":
        from crawspark.oracle.pdfparse import extract_pdf_text
        return fmt, extract_pdf_text(payload.decode("latin-1"))
    if fmt == "tar":
        from crawspark.oracle.tarzip import parse_tar
        return fmt, [body.decode("utf-8", "replace")
                     for _, body in parse_tar(payload)]
    if fmt == "zip":
        # a GENERIC zip (no OOXML/ODF/EPUB member signature matched the
        # container probe): member texts in central-directory order,
        # the tar-route twin (r5: the router sniffed these correctly
        # but dropped their content)
        from crawspark.oracle.tarzip import parse_zip
        return fmt, [body.decode("utf-8", "replace")
                     for _, body in parse_zip(payload)]
    if fmt == "eml":
        from crawspark.oracle.mailmsg import extract_eml
        subject, lines = extract_eml(payload)
        return fmt, [subject] + lines
    if fmt == "html":
        from crawspark.oracle.dom import parse_html
        root = parse_html(payload.decode("utf-8", "replace"))
        return fmt, [p.text() for p in root.find_all("p") if p.text()]
    if fmt == "latex":
        from crawspark.oracle.latex import extract_latex
        return fmt, extract_latex(payload.decode("utf-8", "replace"))
    if fmt == "markdown":
        from crawspark.oracle.markdown import extract_markdown
        return fmt, extract_markdown(payload.decode("utf-8", "replace"))
    return fmt, []
