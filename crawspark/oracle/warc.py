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
                 content_type: str = "", version: str = "1.1") -> bytes:
    """Serialize one WARC record (header fields in canonical order)."""
    fields = [("WARC-Type", warc_type)]
    if record_id:
        fields.append(("WARC-Record-ID", record_id))
    if date:
        fields.append(("WARC-Date", date))
    if target_uri:
        fields.append(("WARC-Target-URI", target_uri))
    if content_type:
        fields.append(("Content-Type", content_type))
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
