"""WARC (Web ARChive, ISO 28500 / WARC 1.1) reading and writing — the
container format crawl pipelines store raw fetches in (Common Crawl
publishes exactly this shape). Reconstructed behavior: crawtext persists
fetched page content before extraction [R: crawtext store step]; at
10^12-document scale the storage layer is WARC segments, so the engine
must parse them without any external library.

Format (WARC 1.1 §4): a file is a sequence of records; each record is

    WARC/1.1<CRLF>
    <named fields, one per line, case-insensitive names><CRLF>
    <CRLF>
    <Content-Length octets of block>
    <CRLF><CRLF>

The block length comes ONLY from ``Content-Length`` — the block is
arbitrary bytes and is never scanned for separators (same discipline as
the PDF /Length rule, oracle/pdfparse.py). Files are customarily
compressed with **one gzip member per record** (WARC 1.1 Annex C);
that convention is what makes a WARC splittable — any byte offset can
be resynced to the next 0x1f8b member boundary — so the reader handles
multi-member gzip streams natively via stdlib zlib.

Malformed trailing garbage ends the record walk rather than raising; a
crawl archive is read best-effort.
"""

from __future__ import annotations

import zlib

from crawspark.oracle import httpmsg

CRLF = b"\r\n"
GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> bytes:
    """Concatenated per-record gzip members → plain bytes. Stops at the
    first undecodable byte run (best-effort tail behavior)."""
    out = bytearray()
    while data.startswith(GZIP_MAGIC):
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
        except zlib.error:
            break
        if not d.eof:
            break  # truncated final member
        out += d.flush()
        data = d.unused_data
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC file held in memory (gzip multi-member or plain).

    Returns one dict per record: {version, headers (lower-cased names),
    warc_type, record_id, target_uri, date, content_type, block(bytes)}.
    Stops at the first structurally broken record."""
    if data.startswith(GZIP_MAGIC):
        data = gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # not a record boundary: stop the walk
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        lines = data[pos:head_end].split(CRLF)
        version = lines[0][len(b"WARC/"):].decode("latin-1")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, sep, value = line.partition(b":")
            if not sep:
                continue
            headers[name.strip().decode("latin-1").lower()] = (
                value.strip().decode("latin-1"))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = head_end + 4
        if block_start + length > n:
            break  # truncated block
        records.append({
            "version": version,
            "headers": headers,
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "block": data[block_start:block_start + length],
        })
        pos = block_start + length
    return records


def build_record(warc_type: str, block: bytes, *, target_uri: str = "",
                 date: str = "", record_id: str = "",
                 content_type: str = "", version: str = "1.1",
                 extra_fields: tuple = ()) -> bytes:
    """Serialize one WARC record (header fields in canonical order;
    ``extra_fields`` are (name, value) pairs — values must be latin-1
    safe, percent-encode anything else)."""
    fields = [("WARC-Type", warc_type)]
    if record_id:
        fields.append(("WARC-Record-ID", record_id))
    if date:
        fields.append(("WARC-Date", date))
    if target_uri:
        fields.append(("WARC-Target-URI", target_uri))
    if content_type:
        fields.append(("Content-Type", content_type))
    fields.extend(extra_fields)
    fields.append(("Content-Length", str(len(block))))
    head = b"".join(b"%s: %s\r\n" % (k.encode("latin-1"),
                                     v.encode("latin-1"))
                    for k, v in fields)
    return (b"WARC/" + version.encode("latin-1") + CRLF + head + CRLF
            + block + CRLF + CRLF)


def build_warc(records: list[bytes], *, gzip_members: bool = False) -> bytes:
    """Records → file bytes; gzip_members compresses each record as its
    own gzip member (WARC 1.1 Annex C — the splittable convention)."""
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out += co.compress(rec) + co.flush()
    return bytes(out)


# ---------------------------------------------------------------------------
# Interleaved document ↔ WARC segment (the storage round trip)
# ---------------------------------------------------------------------------
#
# One record per span. Text-payload spans (html/pdf/text) ship as
# ``response`` records whose block is a full HTTP/1.1 message
# (httpmsg.build_response — framing variant cycles the 2×2
# chunked × gzip grid per span); media spans ship as ``resource``
# records with the raw caption bytes as the block. Span identity
# (kind, media_ref, offset, null-ness of text) rides in X-Crawspark-*
# named fields — WARC 1.1 §4 allows extension fields; values are
# percent-encoded so any unicode media_ref stays latin-1 safe on the
# wire. ``interleaved_from_segment`` inverts the mapping exactly, so
# segment→parse→extract equals direct extraction span for span — the
# property the driver-hashed ``extract_from_warc`` query pins against
# the frozen extraction oracle.

_HTTP_KINDS = ("html", "pdf", "text")


def segment_from_interleaved(doc: dict) -> bytes:
    """Interleaved doc {doc_id, spans} → one WARC segment. Gzip member
    framing (Annex C) is used when crc32(doc_id) is odd, plain
    otherwise — both paths stay on the round-trip hash path."""
    from urllib.parse import quote

    from crawspark.oracle import httpmsg

    doc_id = str(doc["doc_id"])
    seed = zlib.crc32(doc_id.encode("utf-8"))
    recs = [build_record(
        "warcinfo", b"software: crawspark/1.0\r\n",
        record_id=f"<urn:crawspark:{quote(doc_id, safe='')}:info>",
        content_type="application/warc-fields",
        extra_fields=(("X-Crawspark-Doc", quote(doc_id, safe="")),))]
    for i, span in enumerate(doc["spans"] or []):
        text = span.get("text")
        kind = span.get("kind") or ""
        fields = [("X-Crawspark-Kind", quote(kind, safe="")),
                  ("X-Crawspark-Offset", str(span.get("offset")))]
        if span.get("media_ref") is not None:
            fields.append(("X-Crawspark-Media-Ref",
                           quote(span["media_ref"], safe="")))
        if text is None:
            fields.append(("X-Crawspark-Null-Text", "1"))
        body = (text or "").encode("utf-8")
        uri = f"urn:crawspark:{quote(doc_id, safe='')}/{i}"
        if kind in _HTTP_KINDS:
            block = httpmsg.build_response(body, seed + i)
            recs.append(build_record(
                "response", block, target_uri=uri,
                content_type="application/http;msgtype=response",
                extra_fields=tuple(fields)))
        else:
            recs.append(build_record(
                "resource", body, target_uri=uri,
                content_type="application/octet-stream",
                extra_fields=tuple(fields)))
    return build_warc(recs, gzip_members=bool(seed % 2))


def interleaved_from_segment(data: bytes) -> dict:
    """Inverse of ``segment_from_interleaved``: WARC segment bytes →
    {doc_id, spans} with spans ordered by their recorded offset."""
    from urllib.parse import unquote

    from crawspark.oracle import httpmsg

    doc_id = ""
    spans: list[dict] = []
    for rec in parse_warc(data):
        h = rec["headers"]
        if rec["warc_type"] == "warcinfo":
            doc_id = unquote(h.get("x-crawspark-doc", ""))
            continue
        if rec["warc_type"] == "response":
            resp = httpmsg.parse_response(rec["block"])
            body = b"" if resp is None else resp["body"]
        else:
            body = rec["block"]
        text = (None if h.get("x-crawspark-null-text") == "1"
                else body.decode("utf-8"))
        ref = h.get("x-crawspark-media-ref")
        spans.append({"kind": unquote(h.get("x-crawspark-kind", "")),
                      "text": text,
                      "media_ref": None if ref is None else unquote(ref),
                      "offset": int(h.get("x-crawspark-offset", "0"))})
    spans.sort(key=lambda s: s["offset"])
    return {"doc_id": doc_id, "spans": spans}


# ---------------------------------------------------------------------------
# Deterministic synthesis (closed forms the DuckDB oracle replays)
# ---------------------------------------------------------------------------


def warc_date(d: int, j: int) -> str:
    """2025-03-01T00:00:00Z + (13d + 7j) % 86400 seconds, ISO-8601."""
    import datetime

    t = (datetime.datetime(2025, 3, 1)
         + datetime.timedelta(seconds=(13 * d + 7 * j) % 86400))
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def n_responses(d: int) -> int:
    return 2 + d % 3


def make_warc_file(doc_id: int) -> bytes:
    """Deterministic single-host WARC segment for doc_id: one warcinfo
    record followed by 2 + d%3 ``response`` records whose blocks are the
    raw HTTP responses of oracle/httpmsg.make_response(d, j) (so the
    full chain — gzip member → WARC block → HTTP framing → body — is on
    the hash path). Odd doc_ids use per-record gzip members, even ones
    plain WARC; both must parse identically."""
    d = int(doc_id)
    recs = [build_record(
        "warcinfo",
        b"software: crawspark/1.0\r\nformat: WARC File Format 1.1\r\n",
        date=warc_date(d, 0), record_id=f"<urn:uuid:{d:08d}-info>",
        content_type="application/warc-fields")]
    for j in range(n_responses(d)):
        recs.append(build_record(
            "response", httpmsg.make_response(d, j),
            target_uri=f"https://h{d % 23}.example.org/p/{d}/{j}",
            date=warc_date(d, j), record_id=f"<urn:uuid:{d:08d}-{j:04d}>",
            content_type='application/http;msgtype=response'))
    return build_warc(recs, gzip_members=(d % 2 == 1))
