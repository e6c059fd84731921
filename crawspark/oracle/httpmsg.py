"""HTTP/1.1 response message parsing — the byte layer between a fetched
socket stream (or a WARC ``response`` record payload) and the decoder
chain (oracle/encoding.py). Reconstructed behavior: crawtext fetches
pages over HTTP and hands decoded bodies to the extractor [R: crawtext
fetch loop]; a from-storage pipeline replays raw captured responses, so
it must undo the two wire framings RFC 9112 defines before charset
decode can start:

- **Transfer-Encoding: chunked** (RFC 9112 §7.1): hex chunk-size lines
  (optionally with ``;ext`` chunk extensions, which are ignored), chunk
  data, a terminating 0-size chunk, then optional trailer fields up to a
  blank line — all consumed, trailers merged into the header map.
- **Content-Encoding: gzip / x-gzip / deflate** (RFC 9110 §8.4.1):
  stdlib zlib. ``deflate`` in the wild is ambiguous between zlib-wrapped
  and raw deflate streams; both are accepted (try RFC 1950 first, fall
  back to raw per the long-standing browser behavior).

Everything is stdlib; header names are case-insensitive per RFC 9110
§5.1 (stored lower-cased). Malformed input yields ``None`` rather than
raising — a crawl corpus always contains garbage responses.
"""

from __future__ import annotations

import zlib

CRLF = b"\r\n"


def _split_head(raw: bytes) -> tuple[bytes, bytes] | None:
    # RFC 9112 §2.2: a lone LF SHOULD be tolerated as a line terminator.
    # Split at whichever blank line occurs FIRST — an LF-framed head
    # followed by a body that happens to contain CRLFCRLF must not have
    # its head extended into the body (r5 review finding).
    best = None
    for sep in (b"\r\n\r\n", b"\n\n"):
        i = raw.find(sep)
        if i >= 0 and (best is None or i < best[0]):
            best = (i, sep)
    if best is None:
        return None
    i, sep = best
    return raw[:i], raw[i + len(sep):]


def _parse_headers(lines: list[bytes]) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in lines:
        if b":" not in line:
            continue  # garbage header line: skip, don't abort the message
        name, _, value = line.partition(b":")
        key = name.strip().decode("latin-1").lower()
        val = value.strip().decode("latin-1")
        # repeated fields combine with a comma (RFC 9110 §5.2)
        headers[key] = headers[key] + ", " + val if key in headers else val
    return headers


def _dechunk(body: bytes) -> tuple[bytes, dict[str, str]] | None:
    """Chunked → (payload, trailer headers). None on framing errors."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\n", pos)
        if eol < 0:
            return None
        size_line = body[pos:eol].strip()
        pos = eol + 1
        size_tok = size_line.split(b";", 1)[0].strip()  # drop chunk-ext
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        if size == 0:
            break
        if pos + size > len(body):
            return None  # truncated chunk
        out += body[pos:pos + size]
        pos += size
        # chunk data is followed by CRLF (tolerate lone LF)
        if body[pos:pos + 2] == CRLF:
            pos += 2
        elif body[pos:pos + 1] == b"\n":
            pos += 1
        else:
            return None
    # trailer section: header lines up to a blank line (or EOF)
    trailer_lines: list[bytes] = []
    while pos < len(body):
        eol = body.find(b"\n", pos)
        line = (body[pos:] if eol < 0 else body[pos:eol]).rstrip(b"\r")
        pos = len(body) if eol < 0 else eol + 1
        if not line:
            break
        trailer_lines.append(line)
    return bytes(out), _parse_headers(trailer_lines)


def _decompress(body: bytes, encoding: str) -> bytes | None:
    try:
        if encoding in ("gzip", "x-gzip"):
            return zlib.decompress(body, wbits=31)
        if encoding == "deflate":
            try:
                return zlib.decompress(body, wbits=15)  # RFC 1950 zlib
            except zlib.error:
                return zlib.decompress(body, wbits=-15)  # raw deflate
        if encoding in ("identity", ""):
            return body
    except zlib.error:
        return None
    return None  # br/zstd etc.: no stdlib codec — surface as unparseable


def parse_response(raw: bytes) -> dict | None:
    """Parse one HTTP/1.1 response message held fully in memory.

    Returns {status:int, reason:str, headers:{lower-name: value},
    body:bytes} with chunked framing and gzip/deflate content coding
    already removed, or None if the message is malformed."""
    split = _split_head(raw)
    if split is None:
        return None
    head, rest = split
    lines = [ln.rstrip(b"\r") for ln in head.split(b"\n")]
    status_line = lines[0].split(None, 2)
    if len(status_line) < 2 or not status_line[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(status_line[1])
    except ValueError:
        return None
    reason = status_line[2].decode("latin-1") if len(status_line) > 2 else ""
    headers = _parse_headers(lines[1:])

    body = rest
    if "chunked" in headers.get("transfer-encoding", "").lower():
        dechunked = _dechunk(rest)
        if dechunked is None:
            return None
        body, trailers = dechunked
        headers.update(trailers)
    elif "content-length" in headers:
        try:
            n = int(headers["content-length"])
        except ValueError:
            return None
        if n > len(rest):
            return None  # truncated capture
        body = rest[:n]

    ce = headers.get("content-encoding", "").strip().lower()
    if ce:
        decoded = _decompress(body, ce)
        if decoded is None:
            return None
        body = decoded
    return {"status": status, "reason": reason, "headers": headers,
            "body": body}


# ---------------------------------------------------------------------------
# Deterministic synthesis (closed forms the DuckDB oracles replay)
# ---------------------------------------------------------------------------

STATUS_GRID = (200, 200, 301, 404, 503)
REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
           503: "Service Unavailable"}
_CHUNK = 7  # chunk payload size used by the synthetic chunked variants


def body_text(d: int, j: int) -> str:
    """Closed-form body: repeat('Doc {d} part {j} ', 3 + (d+j)%4)."""
    return f"Doc {d} part {j} " * (3 + (d + j) % 4)


def _gzip_bytes(data: bytes) -> bytes:
    # zlib's gzip header is deterministic (MTIME=0), unlike gzip.compress
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


_WIRE_CHUNK = 1024  # chunk payload size for real (non-synthetic) bodies


def build_response(body: bytes, variant: int, *, status: int = 200,
                   content_type: str = "text/html; charset=utf-8",
                   extra_headers: tuple = (), chunk_size: int = 0,
                   trailers: tuple = ()) -> bytes:
    """Serialize one HTTP/1.1 response around ``body`` using the same
    2×2 framing grid as the synthetic corpus (variant % 4): 0 =
    Content-Length identity, 1 = chunked identity, 2 = Content-Length
    gzip, 3 = chunked gzip. ``extra_headers`` are (name, value) pairs
    appended verbatim (values must be latin-1 safe); ``chunk_size``
    overrides the default wire chunk; ``trailers`` are (name, value)
    pairs emitted after the last chunk (chunked variants only, RFC 9112
    §7.1.2). The builder is the encode half of ``parse_response`` —
    every output round-trips. The ONLY serializer: make_response wraps
    this rather than keeping a second framing copy (r5 review)."""
    variant %= 4
    chunk_size = chunk_size or _WIRE_CHUNK
    headers = [f"HTTP/1.1 {status} {REASONS.get(status, 'OK')}",
               f"Content-Type: {content_type}"]
    headers += [f"{k}: {v}" for k, v in extra_headers]
    wire = body
    if variant >= 2:
        headers.append("Content-Encoding: gzip")
        wire = _gzip_bytes(body)
    if variant % 2 == 1:
        headers.append("Transfer-Encoding: chunked")
        chunks = [wire[i:i + chunk_size]
                  for i in range(0, len(wire), chunk_size)]
        framed = b"".join(b"%x\r\n%s\r\n" % (len(c), c) for c in chunks)
        trailer = "".join(f"{k}: {v}\r\n" for k, v in trailers)
        wire = framed + b"0\r\n" + trailer.encode("latin-1") + b"\r\n"
    else:
        headers.append(f"Content-Length: {len(wire)}")
    head = "\r\n".join(headers).encode("latin-1")
    return head + b"\r\n\r\n" + wire


def make_response(d: int, j: int) -> bytes:
    """Deterministic raw HTTP response for (doc d, variant j). The wire
    framing cycles through the 2×2 grid by (d+j)%4: 0 = Content-Length
    identity, 1 = chunked identity, 2 = Content-Length gzip, 3 = chunked
    gzip with a trailer field (X-Crawl-Doc: {d}) that parsing must
    consume and merge."""
    variant = (d + j) % 4
    return build_response(
        body_text(d, j).encode("ascii"), variant,
        status=STATUS_GRID[(d + j) % 5],
        extra_headers=(("Server", f"synth/{d % 3}"),),
        chunk_size=_CHUNK,
        trailers=(("X-Crawl-Doc", d),) if variant == 3 else ())
