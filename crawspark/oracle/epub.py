"""EPUB text extraction — OCF/OPF (EPUB 3 / IDPF), stdlib zip + the
repo's own DOM tokenizer.

Ebooks circulate on the open web and in public-domain mirrors; the
format is three indirection layers inside a ZIP:

- **OCF container** (``META-INF/container.xml``): the ``rootfile``
  element's ``full-path`` locates the package document — its directory
  becomes the base for every manifest href.
- **OPF package**: the ``manifest`` maps item ids to hrefs; the
  ``spine`` lists ``itemref idref``s in READING ORDER (which need not
  match manifest order or file names).
- **XHTML chapters**: parsed through the real extraction-core DOM
  tokenizer (``oracle/fastparse`` via ``oracle/dom.parse_html``) — the
  same parser the article pipeline uses — taking ``<p>`` text in
  document order.

``extract_epub_text`` returns one string per spine chapter (paragraph
texts joined with "\\n"). ``make_epub`` writes a deterministic book
whose spine is REVERSED vs the manifest listing and whose OPF lives in
a subdirectory (href resolution on the hash path).
"""

from __future__ import annotations

import io
import posixpath
import zipfile
import xml.etree.ElementTree as ET

from crawspark.oracle.dom import parse_html

_CNT_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"


def extract_epub_text(payload: bytes) -> list[str]:
    """One string per spine chapter, reading order. Never raises;
    non-EPUB bytes yield []."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        cont = ET.parse(zf.open("META-INF/container.xml")).getroot()
        root_el = cont.find(
            f".//{{{_CNT_NS}}}rootfile[@full-path]")
        if root_el is None:
            return []
        opf_path = root_el.get("full-path", "")
        opf = ET.parse(zf.open(opf_path)).getroot()
    except Exception:
        return []
    base = posixpath.dirname(opf_path)
    hrefs = {
        item.get("id"): item.get("href", "")
        for item in opf.iter(f"{{{_OPF_NS}}}item")
    }
    out: list[str] = []
    for ref in opf.iter(f"{{{_OPF_NS}}}itemref"):
        href = hrefs.get(ref.get("idref", ""))
        if not href:
            continue
        part = posixpath.normpath(posixpath.join(base, href))
        try:
            html = zf.read(part).decode("utf-8", "replace")
        except Exception:  # missing member, bad CRC, corrupt deflate
            continue
        root = parse_html(html)
        paras = [p.text() for p in root.find_all("p")]
        out.append("\n".join(t for t in paras if t))
    return out


def epub_chapters_expected(doc_id: int) -> list[str]:
    """Closed form of make_epub: chapter c (READING order) has
    1 + (d+c)%3 paragraphs."""
    d = doc_id
    out = []
    for c in range(1 + d % 3):
        paras = []
        for p in range(1 + (d + c) % 3):
            t = f"doc {d} chap {c} para {p}"
            if (d + c + p) % 2 == 1:
                t += " café"
            paras.append(t)
        out.append("\n".join(paras))
    return out


def make_epub(doc_id: int) -> bytes:
    """Deterministic EPUB: OPF under OEBPS/ (relative hrefs), manifest
    listed in file order but the spine REVERSED — chapter files are
    named counter to reading order so only correct idref resolution
    extracts the right sequence. Chapter XHTML carries nav/header junk
    the <p>-walk must ignore."""
    d = doc_id
    chapters = epub_chapters_expected(d)
    n = len(chapters)
    files: list[tuple[str, bytes]] = []
    files.append(("mimetype", b"application/epub+zip"))
    files.append(("META-INF/container.xml", (
        '<?xml version="1.0"?>'
        f'<container version="1.0" xmlns="{_CNT_NS}">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>").encode()))
    # file k holds READING-order chapter n-1-k (reversed on disk)
    for k in range(n):
        c = n - 1 - k
        body = "".join(
            f"<p>{t}</p>" for t in chapters[c].split("\n"))
        files.append((f"OEBPS/part{k}.xhtml", (
            "<?xml version='1.0' encoding='utf-8'?>"
            "<html xmlns='http://www.w3.org/1999/xhtml'><head>"
            f"<title>part {k}</title></head><body>"
            f"<nav><a href='#'>skip {d}</a></nav>"
            f"{body}</body></html>").encode()))
    manifest = "".join(
        f'<item id="it{k}" href="part{k}.xhtml" '
        'media-type="application/xhtml+xml"/>' for k in range(n))
    spine = "".join(
        f'<itemref idref="it{n - 1 - c}"/>' for c in range(n))
    files.append(("OEBPS/content.opf", (
        '<?xml version="1.0"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" '
        'unique-identifier="uid">'
        f"<manifest>{manifest}</manifest>"
        f"<spine>{spine}</spine></package>").encode()))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in files:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = (zipfile.ZIP_STORED if name == "mimetype"
                                else zipfile.ZIP_DEFLATED)
            zf.writestr(zi, data)
    return buf.getvalue()
