"""Email (.eml) text extraction — RFC 5322 / MIME (RFC 2045–2047),
hand-parsed from the specs (no ``email`` stdlib module, matching the
repo's from-scratch byte-layer style).

Crawled archives and list-server mirrors surface raw messages
constantly. Extraction needs four real mechanics:

- **Header unfolding** (RFC 5322 §2.2.3): a CRLF followed by WSP
  continues the previous header line; header names are
  case-insensitive.
- **Encoded-words** (RFC 2047) in Subject/From/To:
  ``=?charset?B?base64?=`` and ``=?charset?Q?quoted?=`` (Q uses ``_``
  for space and ``=XX`` hex); adjacent encoded-words join with the
  whitespace between them DROPPED.
- **Content-Transfer-Encoding** (RFC 2045 §6): ``quoted-printable``
  (soft ``=\\r\\n`` line breaks, ``=XX`` bytes) and ``base64`` bodies,
  decoded to the part's ``charset`` parameter (default us-ascii,
  treated as utf-8-compatible here).
- **Multipart walks** (RFC 2046): ``--boundary`` delimiters with the
  closing ``--boundary--``; nesting (mixed > alternative) recurses;
  for ``multipart/alternative`` the LAST text/plain wins per spec
  preference order (later = more faithful), otherwise all text/plain
  parts concatenate in order.

``extract_eml`` returns (subject, body_lines). ``make_eml`` builds a
deterministic nested message with every mechanic on the hash path.
"""

from __future__ import annotations

import base64
import binascii
import quopri
import re

_ENCW = re.compile(r"=\?([^?]+)\?([BbQq])\?([^?]*)\?=")
_ENCW_JOIN = re.compile(r"(\?=)\s+(=\?)")


def _decode_word(m: re.Match) -> str:
    charset, enc, payload = m.group(1), m.group(2), m.group(3)
    try:
        if enc in "Bb":
            raw = base64.b64decode(payload + "=" * (-len(payload) % 4))
        else:
            raw = quopri.decodestring(
                payload.replace("_", " ").encode("ascii", "replace"),
                header=False)
        return raw.decode(charset, "replace")
    except (binascii.Error, LookupError, ValueError):
        return m.group(0)


def decode_header_value(value: str) -> str:
    """RFC 2047: decode encoded-words; whitespace BETWEEN two
    encoded-words is dropped, other text kept verbatim."""
    value = _ENCW_JOIN.sub(r"\1\2", value)
    return _ENCW.sub(_decode_word, value)


def _split_headers(raw: bytes) -> tuple[dict[str, str], bytes]:
    """Unfold and lowercase-key the header block; return (headers,
    body). Accepts CRLF or bare LF line endings."""
    raw = raw.replace(b"\r\n", b"\n")
    head, sep, body = raw.partition(b"\n\n")
    if not sep:
        return {}, b""
    lines: list[str] = []
    for ln in head.decode("latin-1").split("\n"):
        if ln[:1] in (" ", "\t") and lines:
            lines[-1] += " " + ln.strip()  # unfold
        else:
            lines.append(ln)
    headers: dict[str, str] = {}
    for ln in lines:
        name, colon, val = ln.partition(":")
        if colon:
            headers[name.strip().lower()] = val.strip()
    return headers, body


def _param(header_value: str, name: str) -> str | None:
    """Extract a ;-separated MIME parameter (quoted or token form)."""
    m = re.search(
        rf'{name}\s*=\s*(?:"([^"]*)"|([^;\s]+))', header_value,
        re.IGNORECASE)
    return (m.group(1) if m.group(1) is not None else m.group(2)) \
        if m else None


def _decode_body(body: bytes, headers: dict[str, str]) -> str:
    cte = headers.get("content-transfer-encoding", "7bit").lower()
    if cte == "base64":
        try:
            body = base64.b64decode(re.sub(rb"\s+", b"", body)
                                    + b"=" * 4)
        except binascii.Error:
            return ""
    elif cte == "quoted-printable":
        body = quopri.decodestring(body)
    charset = _param(headers.get("content-type", ""), "charset") \
        or "utf-8"
    try:
        return body.decode(charset, "replace")
    except LookupError:
        return body.decode("utf-8", "replace")


def _collect_plain(headers: dict[str, str], body: bytes) -> list[str]:
    """Recursive multipart walk → list of decoded text/plain bodies."""
    ctype = headers.get("content-type", "text/plain").lower()
    mime = ctype.split(";")[0].strip()
    if mime.startswith("multipart/"):
        boundary = _param(headers.get("content-type", ""), "boundary")
        if not boundary:
            return []
        norm = body.replace(b"\r\n", b"\n")
        delim = b"--" + boundary.encode("latin-1")
        chunks = norm.split(b"\n" + delim)
        # first chunk is the preamble unless the body STARTS with --b
        if norm.startswith(delim):
            chunks[0] = chunks[0][len(delim):]
        else:
            chunks = chunks[1:]
        parts: list[list[str]] = []
        for chunk in chunks:
            if chunk[:2] == b"--":
                break  # closing delimiter
            sub_h, sub_b = _split_headers(chunk.lstrip(b"\n"))
            got = _collect_plain(sub_h, sub_b)
            if got:
                parts.append(got)
        if mime == "multipart/alternative":
            return parts[-1] if parts else []
        return [t for p in parts for t in p]
    if mime == "text/plain":
        return [_decode_body(body, headers)]
    return []  # html/images/attachments: not the plain-text surface


def extract_eml(payload: bytes) -> tuple[str, list[str]]:
    """(decoded subject, plain-text body lines). Never raises;
    non-mail bytes yield ("", [])."""
    try:
        headers, body = _split_headers(payload)
        if "from" not in headers and "subject" not in headers:
            return "", []
        subject = decode_header_value(headers.get("subject", ""))
        texts = _collect_plain(headers, body)
        lines = [ln for t in texts
                 for ln in t.replace("\r\n", "\n").split("\n")]
        while lines and lines[-1] == "":
            lines.pop()
        return subject, lines
    except Exception:
        return "", []


# --------------------------------------------------------------- builder

def eml_expected(doc_id: int) -> tuple[str, list[str]]:
    """Closed form of make_eml: subject joins two encoded-words;
    body is the LAST alternative's text/plain (the qp one), then the
    mixed sibling's plain attachment note."""
    d = doc_id
    subject = f"doc {d}: résumé №{d % 9}"
    body = [f"doc {d} mail line {i}" + (" café" if (d + i) % 2 else "")
            for i in range(2 + d % 3)]
    body.append(f"note {d % 5} attached")
    return subject, body


def make_eml(doc_id: int) -> bytes:
    """Deterministic nested message: multipart/mixed containing
    (a) multipart/alternative with a base64 text/plain DECOY and the
    authoritative quoted-printable text/plain (alternative rule: last
    wins), plus a text/html part that must be ignored, and (b) a
    text/plain note. Subject splits into two RFC 2047 encoded-words
    (B then Q) whose separating whitespace must drop; From carries an
    encoded display name. Headers are folded across lines."""
    d = doc_id
    subject, body = eml_expected(d)
    plain = "\n".join(body[:-1]) + "\n"
    qp = quopri.encodestring(plain.encode("utf-8")).decode("ascii")
    w1 = base64.b64encode(f"doc {d}: ".encode()).decode()
    w2 = (f"résumé №{d % 9}".encode("utf-8").hex().upper())
    w2 = "".join("=" + w2[i:i + 2] for i in range(0, len(w2), 2))
    decoy = base64.b64encode(f"WRONG alternative {d}".encode()).decode()
    note64 = base64.b64encode(
        f"note {d % 5} attached\r\n".encode()).decode()
    msg = (
        f"From: =?utf-8?Q?Crawl_Bot_{d % 7}?=\r\n"
        f" <bot{d % 7}@example.test>\r\n"
        f"To: corpus@example.test\r\n"
        f"Subject: =?utf-8?B?{w1}?=\r\n"
        f"  =?utf-8?Q?{w2}?=\r\n"
        f"MIME-Version: 1.0\r\n"
        f"Content-Type: multipart/mixed;\r\n"
        f"\tboundary=\"outer{d}\"\r\n"
        f"\r\n"
        f"preamble to ignore\r\n"
        f"--outer{d}\r\n"
        f"Content-Type: multipart/alternative; boundary=\"inner{d}\"\r\n"
        f"\r\n"
        f"--inner{d}\r\n"
        f"Content-Type: text/plain; charset=utf-8\r\n"
        f"Content-Transfer-Encoding: base64\r\n"
        f"\r\n"
        f"{decoy}\r\n"
        f"--inner{d}\r\n"
        f"Content-Type: text/plain; charset=\"utf-8\"\r\n"
        f"Content-Transfer-Encoding: quoted-printable\r\n"
        f"\r\n"
        f"{qp}"
        f"--inner{d}\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"\r\n"
        f"<p>html decoy {d}</p>\r\n"
        f"--inner{d}--\r\n"
        f"--outer{d}\r\n"
        f"Content-Type: text/plain; charset=us-ascii\r\n"
        f"Content-Transfer-Encoding: base64\r\n"
        f"\r\n"
        f"{note64}\r\n"
        f"--outer{d}--\r\n"
        f"epilogue\r\n")
    return msg.encode("utf-8")
