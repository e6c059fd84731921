"""RTF text extraction — from the public RTF 1.9.1 specification.

Legacy rich-text documents still circulate on the open web (and as
email attachments archived into crawls). The format is a brace-grouped
control-word stream; text extraction needs four real mechanics:

- **Groups** ``{...}`` push/pop reader state; destination groups that
  carry no document text (``\\fonttbl``, ``\\colortbl``,
  ``\\stylesheet``, ``\\info``, ``\\pict`` and any ``{\\*\\...}``
  unknown destination) are skipped wholesale.
- **Control words** ``\\word[N]`` with an optional signed numeric
  parameter, terminated by one swallowed space. ``\\par`` ends a
  paragraph, ``\\line``/``\\tab`` emit "\\n"/"\\t"; formatting words
  (``\\b``, ``\\fs24``, ...) are ignored.
- **Escapes**: ``\\'xx`` is a code-page byte (cp1252 here — matching
  ``\\ansicpg1252``), ``\\\\ \\{ \\}`` are literal characters, and
  ``\\uN`` is a signed 16-bit Unicode scalar whose next ``\\ucN``
  fallback characters must be SKIPPED (the classic interop trap —
  naive parsers double-emit every non-ASCII char).
- ``\\ucN`` itself is GROUP-SCOPED state, restored on ``}``.

``extract_rtf_text`` returns one string per paragraph. ``make_rtf``
writes a deterministic document whose paragraphs
``rtf_paragraphs_expected`` states closed-form, exercising every
mechanic above on the hash path.
"""

from __future__ import annotations

import re

_CW = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?")

# Destinations that never contribute document text (RTF 1.9.1 §"Header").
_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"header", b"footer", b"footnote", b"annotation", b"object",
    b"themedata", b"datastore", b"listtable", b"listoverridetable",
}

_SYMBOLS = {
    b"par": "\x00PAR\x00",  # sentinel; split at the end
    b"line": "\n",
    b"tab": "\t",
    b"emdash": "\u2014",
    b"endash": "\u2013",
    b"lquote": "\u2018",
    b"rquote": "\u2019",
    b"ldblquote": "\u201c",
    b"rdblquote": "\u201d",
    b"bullet": "\u2022",
    b"~": "\u00a0",
}


def extract_rtf_text(payload: bytes) -> list[str]:
    """One string per paragraph. Never raises; non-RTF bytes yield []."""
    if not payload.lstrip()[:5] == b"{\\rtf":
        return []
    out: list[str] = []
    # group-scoped state stack: (uc_skip_count, in_skipped_destination)
    stack: list[tuple[int, bool]] = []
    uc, skipping = 1, False
    pend_skip = 0  # chars still to swallow after a \uN
    i, n = 0, len(payload)
    while i < n:
        b = payload[i:i + 1]
        if b == b"{":
            stack.append((uc, skipping))
            i += 1
            # {\*\dest ...} — unknown starred destination: skip group
            if payload[i:i + 2] == b"\\*":
                skipping = True
        elif b == b"}":
            if stack:
                uc, skipping = stack.pop()
            i += 1
        elif b == b"\\":
            nxt = payload[i + 1:i + 2]
            if nxt == b"'":
                try:
                    ch = bytes.fromhex(
                        payload[i + 2:i + 4].decode("ascii", "replace"))
                except ValueError:  # truncated / malformed hex escape
                    ch = b""
                i += 4
                if pend_skip:
                    pend_skip -= 1
                elif not skipping:
                    out.append(ch.decode("cp1252", "replace"))
            elif nxt in (b"\\", b"{", b"}", b"~"):
                i += 2
                if pend_skip:
                    pend_skip -= 1
                elif not skipping:
                    out.append(_SYMBOLS.get(nxt, nxt.decode("latin-1")))
            elif nxt.isalpha():
                m = _CW.match(payload, i)
                word = m.group(1)
                param = m.group(2)
                i = m.end()
                if word == b"u":
                    cp = int(param or 0)
                    if cp < 0:
                        cp += 65536
                    if pend_skip:
                        pend_skip -= 1
                    elif not skipping:
                        out.append(chr(cp))
                        pend_skip = uc
                elif word == b"uc":
                    uc = int(param or 0)
                elif word in _SKIP_DESTS:
                    skipping = True
                elif word in _SYMBOLS:
                    if not skipping:
                        out.append(_SYMBOLS[word])
                # any other control word: formatting — ignore
            else:
                i += 2  # \<digit> etc: ignore
        elif b in (b"\r", b"\n", b"\x00"):
            i += 1
        else:
            i += 1
            if pend_skip:
                pend_skip -= 1
            elif not skipping:
                out.append(b.decode("cp1252", "replace"))
    text = "".join(out)
    paras = text.split("\x00PAR\x00")
    if paras and paras[-1] == "":
        paras.pop()  # trailing \par closes the last paragraph
    return paras


def make_rtf(doc_id: int) -> bytes:
    """Deterministic RTF exercising every extraction mechanic: fonttbl
    + starred-generator destinations (skipped), nested formatting
    groups, \\'e9 code-page bytes, \\uN with \\uc1 fallbacks that must
    be swallowed, \\tab, and symbol words."""
    d = doc_id
    paras = []
    for p in range(2 + d % 3):
        seg = f"doc {d} para {p}"
        body = seg.replace(" ", "\\~ ", 1)  # nbsp escape on the path
        # wrap a middle word in a bold group — no text effect
        body = "{\\b " + body + "} tail"
        if (d + p) % 2 == 1:
            body += " caf\\'e9"
        if (d + p) % 3 == 2:
            body += " \\u945a"  # α with fallback 'a' (uc1: swallowed)
        if p == 0:
            body = "T:\\tab " + body
        paras.append(body + "\\par")
    doc = ("{\\rtf1\\ansi\\ansicpg1252\\deff0"
           "{\\fonttbl{\\f0 Times New Roman;}}"
           "{\\*\\generator crawspark synthetic;}"
           "\\uc1 " + "\n".join(paras) + "}")
    return doc.encode("cp1252")


def rtf_paragraphs_expected(doc_id: int) -> list[str]:
    """Closed form of make_rtf's paragraphs."""
    d = doc_id
    out = []
    for p in range(2 + d % 3):
        t = f"doc\u00a0 {d} para {p} tail"
        if (d + p) % 2 == 1:
            t += " caf\u00e9"
        if (d + p) % 3 == 2:
            t += " \u03b1"
        if p == 0:
            t = "T:\t" + t
        out.append(t)
    return out
