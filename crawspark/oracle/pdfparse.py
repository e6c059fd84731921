"""Minimal from-scratch PDF text extraction (stdlib zlib + re only).

The reference does NOT parse PDFs (they are filtered by URL extension
[R: url.py extension blacklist]); this route is mandated by the north rule
"PDF/layout parse" (BASELINE.json:L14, SURVEY.md §2.3 ``parse_pdf``).

Scope: xref-free sequential object scan, ``FlateDecode`` streams via
zlib, text from ``Tj`` / ``TJ`` / ``'`` / ``"`` show operators with
``Td/TD/Tm/TL/T*`` positioning (PDF 32000-1 §9.4 semantics: TD sets
leading, ``'``/``"`` imply T*, BT resets text state), and ``/Contents``
given as either one stream ref or an array of refs (streams concatenate;
token state persists across them). Layout rule: within a page, text
chunks sort by (-y, x) (top-to-bottom, left-to-right); one output text
block per page, lines joined with ``\\n``. PDF 1.5+ compressed object
streams (``/ObjStm``) are inflated into the object table, and the
cross-reference chain — stream form (``/Type /XRef``, incl. /Prev chains
and PNG row predictors) or classic ``xref`` tables — overrides the
sequential scan's last-wins object resolution where it resolves:
orphaned incremental-update copies no longer shadow the referenced
object. Show-text strings come in literal ``(...)`` and hex ``<...>``
forms. Stream filters: ``FlateDecode``, ``ASCIIHexDecode``,
``ASCII85Decode``, ``LZWDecode`` (EarlyChange=1), ``RunLengthDecode``
(chained in /Filter order); streams are delimited by a direct
``/Length`` when present (raw deflate bytes may contain the
``endstream``/``endobj`` keywords), textual scan otherwise. Simple-font
encodings (r5): /WinAnsiEncoding, /MacRomanEncoding, /StandardEncoding
and /Encoding dicts with /BaseEncoding + /Differences resolve
character-code bytes through an Adobe Glyph List subset, selected per
show operator by ``Tf``; fonts without a recognized /Encoding keep the
latin-1 byte mapping. /ToUnicode CMaps (bfchar, bfrange in both
incrementing and array forms) are authoritative when present and carry
Type0/CID composite fonts (2-byte Identity-H codes); LZW honors
/DecodeParms /EarlyChange 0. Image XObjects (r5, ``extract_pdf_images``)
report per-image metadata and REAL pixel means: /DCTDecode through the
from-scratch baseline JPEG decoder (oracle/jpegcodec.py), raw-sample
Flate/LZW 8-bit DeviceRGB/DeviceGray with bpp-aware PNG /Predictor undo,
and /CCITTFaxDecode — Group 4 / T.6 MMR (/K < 0), Group 3 / T.4 1D MH
(/K = 0) and mixed 1D/2D (/K > 0) — through the from-scratch codec
(oracle/ccittcodec.py) honoring /Columns /Rows /BlackIs1
/EncodedByteAlign. Not handled: JPXDecode/JBIG2Decode pixel data —
metadata-only, ``decoded=False`` — CID fonts
without /ToUnicode (glyph-id codes carry no recoverable text — emitted
as empty), predefined CMap names — gaps documented in SURVEY.md §2.3.

Input transport: raw PDF bytes arrive latin-1-mapped into the ``text``
field of a ``kind='pdf'`` span (FIXTURES.md §1.1) — lossless bytes 0-255.
"""

from __future__ import annotations

import re
import zlib

_RE_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_RE_CONTENTS_ARR = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_RE_CONTENTS = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_RE_KIDS = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_RE_REF = re.compile(rb"(\d+)\s+0\s+R")
# Positioning + show-text operators inside a content stream (PDF 32000-1
# §9.4): Td/TD/Tm/TL/T* move the line; Tj/TJ/'/" show text.
_NUM = rb"-?\d+(?:\.\d+)?"
_STR = rb"(?:[^()\\]|\\.)*"
_HEX = rb"[0-9A-Fa-f\s]*"
_RE_TOKEN = re.compile(
    rb"(?P<num>" + _NUM + rb")\s+(?P<num2>" + _NUM + rb")\s+(?P<op>Td|TD)"
    rb"|(?P<tm>(?:" + _NUM + rb"\s+){6})Tm"
    rb"|(?P<tl>" + _NUM + rb")\s+TL"
    rb"|/(?P<fname>[^\s/<>()\[\]]+)\s+" + _NUM + rb"\s+Tf"
    rb"|(?P<tstar>T\*)"
    rb"|(?P<bt>BT)"
    rb"|\((?P<str>" + _STR + rb")\)\s*Tj"
    rb"|<(?P<hstr>" + _HEX + rb")>\s*Tj"
    rb"|\((?P<qstr>" + _STR + rb")\)\s*'"
    rb"|<(?P<hqstr>" + _HEX + rb")>\s*'"
    rb"|(?P<aw>" + _NUM + rb")\s+(?P<ac>" + _NUM + rb")\s+"
    rb"(?:\((?P<qqstr>" + _STR + rb")\)|<(?P<hqqstr>" + _HEX + rb")>)\s*\""
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ",
    re.DOTALL,
)
_RE_ARR_STR = re.compile(
    rb"\((?P<s>(?:[^()\\]|\\.)*)\)|<(?P<h>" + _HEX + rb")>")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unhex_b(raw: bytes) -> bytes:
    """Hex string ``<48656C6C6F>`` → raw character-code bytes. Whitespace
    is ignored and an odd final digit takes an implied trailing 0
    (PDF 32000-1 §7.3.4.3)."""
    digits = re.sub(rb"\s+", b"", raw)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return b""


def _unescape_b(raw: bytes) -> bytes:
    """Literal string ``(...)`` → raw character-code bytes (escape and
    octal sequences resolved; §7.3.4.2)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Simple-font encodings (PDF 32000-1 §9.6.5 + Annex D): a font's
# /Encoding maps character-code bytes to glyphs. Supported:
# /WinAnsiEncoding (≡ Windows code page 1252 — Python's cp1252 codec),
# /MacRomanEncoding (Python's mac_roman, patched where Annex D differs:
# 0xDB is "currency" — the pre-euro Mac OS Roman — and 0xF0, the Apple
# logo, has no glyph name), /StandardEncoding (Adobe's table, hand-built
# from Annex D), and encoding DICTS with /BaseEncoding + /Differences
# overrides. Glyph names resolve through a hand-written Adobe Glyph List
# subset plus the AGL uniXXXX/uXXXXXX algorithmic names. A font with no
# recognized /Encoding keeps the historical latin-1 byte mapping (its
# built-in encoding is unknowable without the font program). Remaining
# gap: CID/Type0 composite fonts (multi-byte codes, /ToUnicode CMaps).
# ---------------------------------------------------------------------------

_AGL: dict[str, str] = {
    # ASCII punctuation / digits (AGL names)
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Latin-1 letters (AGL names = PostScript glyph names)
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "multiply": "×",
    "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú",
    "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "Thorn": "Þ", "germandbls": "ß",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ae": "æ", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î",
    "idieresis": "ï", "eth": "ð", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö", "divide": "÷",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ",
    # Latin-1 signs
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·", "cedilla": "¸",
    "onesuperior": "¹", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾", "questiondown": "¿",
    # Typographic / Annex D names beyond Latin-1
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "florin": "ƒ", "endash": "–",
    "emdash": "—", "trademark": "™", "Euro": "€",
    "fi": "ﬁ", "fl": "ﬂ", "circumflex": "ˆ",
    "caron": "ˇ", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "tilde": "˜",
    "hungarumlaut": "˝", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "Ydieresis": "Ÿ",
    "OE": "Œ", "oe": "œ", "Lslash": "Ł", "lslash": "ł",
    "dotlessi": "ı", "minus": "−",
}
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL[_c] = _c


def _glyph_char(name: str) -> str:
    """Glyph name → text via the AGL subset, the AGL algorithmic
    uniXXXX / uXXXX[XX] forms, or '' for an unknown name (notdef)."""
    got = _AGL.get(name)
    if got is not None:
        return got
    try:
        cp = None
        if name.startswith("uni") and len(name) == 7:
            cp = int(name[3:], 16)
        elif name.startswith("u") and len(name) in (5, 7):
            cp = int(name[1:], 16)
        if cp is not None and not 0xD800 <= cp <= 0xDFFF:
            # lone surrogates pass chr() but cannot be UTF-8 encoded —
            # they would crash far downstream at parquet/JSON write
            # (r5 review finding); treat as notdef
            return chr(cp)
    except ValueError:
        pass
    return ""


# StandardEncoding's deviations from ASCII (Annex D.2, octal codes; all
# codes outside ASCII and this table are unmapped in StandardEncoding).
_STD_HIGH = {
    0o47: "quoteright", 0o140: "quoteleft",
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling",
    0o244: "fraction", 0o245: "yen", 0o246: "florin", 0o247: "section",
    0o250: "currency", 0o251: "quotesingle", 0o252: "quotedblleft",
    0o253: "guillemotleft", 0o254: "guilsinglleft",
    0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase", 0o272: "quotedblright",
    0o273: "guillemotright", 0o274: "ellipsis", 0o275: "perthousand",
    0o277: "questiondown", 0o301: "grave", 0o302: "acute",
    0o303: "circumflex", 0o304: "tilde", 0o305: "macron", 0o306: "breve",
    0o307: "dotaccent", 0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron",
    0o320: "emdash", 0o341: "AE", 0o343: "ordfeminine", 0o350: "Lslash",
    0o351: "Oslash", 0o352: "OE", 0o353: "ordmasculine", 0o361: "ae",
    0o365: "dotlessi", 0o370: "lslash", 0o371: "oslash", 0o372: "oe",
    0o373: "germandbls",
}


def _base_table(name: bytes) -> list[str] | None:
    """256-entry code→text table for a named base encoding, or None for
    an unrecognized name (callers fall back to latin-1)."""
    if name == b"WinAnsiEncoding":
        table = []
        for i in range(256):
            try:
                table.append(bytes([i]).decode("cp1252"))
            except UnicodeDecodeError:
                # Annex D note: unused WinAnsi codes map to bullet
                table.append("•")
        return table
    if name == b"MacRomanEncoding":
        table = [bytes([i]).decode("mac_roman") for i in range(256)]
        table[0xDB] = "¤"  # Annex D: "currency" (pre-euro Mac Roman)
        table[0xF0] = ""        # Apple logo — no glyph in Annex D
        return table
    if name == b"StandardEncoding":
        table = [chr(i) if 0x20 <= i <= 0x7E else "" for i in range(256)]
        for code, glyph in _STD_HIGH.items():
            table[code] = _glyph_char(glyph)
        return table
    return None


# --- /ToUnicode CMaps (§9.10.3) — the text-extraction mapping for
# composite (Type0/CID) fonts, and authoritative for simple fonts too
# when present. bfchar lists (src, dst) pairs; bfrange maps contiguous
# source ranges either by incrementing a destination start or through an
# explicit destination array. Destinations are UTF-16BE code sequences
# (multi-unit for ligatures). Source code width comes from the src hex
# token length (Identity-H = 2 bytes).
_RE_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_RE_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_RE_HEXTOK = re.compile(rb"<([0-9A-Fa-f]+)>")
_RE_CMAP_TOK = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
_RE_TOUNICODE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")


def _utf16be(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be")
    except (ValueError, UnicodeDecodeError):
        return ""


def _parse_tounicode(content: bytes) -> tuple[int, dict[int, str]]:
    """(code byte-width, code → text) from a ToUnicode CMap stream."""
    cmap: dict[int, str] = {}
    width = 0
    for m in _RE_BFCHAR.finditer(content):
        toks = _RE_HEXTOK.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            src, dst = toks[i], toks[i + 1]
            width = width or len(src) // 2
            cmap[int(src, 16)] = _utf16be(dst)
    for m in _RE_BFRANGE.finditer(content):
        # flatten to (hex_or_None, is_open, is_close) tokens
        toks = [(t.group(1), t.group(2) is not None, t.group(3) is not None)
                for t in _RE_CMAP_TOK.finditer(m.group(1))]
        i = 0
        while i + 2 < len(toks):
            lo_t, hi_t, dst_t = toks[i], toks[i + 1], toks[i + 2]
            if lo_t[0] is None or hi_t[0] is None:
                break  # malformed entry — stop this block
            lo, hi = int(lo_t[0], 16), int(hi_t[0], 16)
            width = width or len(lo_t[0]) // 2
            if dst_t[1]:  # [ <dst> <dst> ... ] — one destination per code
                j = i + 3
                code = lo
                while j < len(toks) and not toks[j][2]:
                    if toks[j][0] is not None and code <= hi:
                        cmap[code] = _utf16be(toks[j][0])
                        code += 1
                    j += 1
                i = j + 1
            elif dst_t[0] is not None:  # incrementing destination start
                # the increment applies to the LAST UTF-16 unit (§9.10.3).
                # Malformed destinations (odd hex length, or an increment
                # overflowing the 16-bit unit) skip the ENTRY, not the
                # document — extract_pdf_text's never-raises contract
                # (r5 review finding: both cases crashed the worker).
                try:
                    base = bytes.fromhex(dst_t[0].decode("ascii"))
                    prefix = base[:-2]
                    last = int.from_bytes(base[-2:], "big")
                    for k in range(hi - lo + 1):
                        cmap[lo + k] = _utf16be(
                            (prefix + (last + k).to_bytes(2, "big"))
                            .hex().encode("ascii"))
                except (ValueError, OverflowError):
                    pass
                i += 3
            else:
                break
    return (width or 2), cmap


_RE_RESOURCES_REF = re.compile(rb"/Resources\s+(\d+)\s+0\s+R")
_RE_FONT_DICT = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_RE_FONT_PAIR = re.compile(rb"/([^\s/<>()\[\]]+)\s+(\d+)\s+0\s+R")
_RE_ENC_NAME = re.compile(rb"/Encoding\s*/([A-Za-z]+)")
_RE_ENC_REF = re.compile(rb"/Encoding\s+(\d+)\s+0\s+R")
_RE_BASE_ENC = re.compile(rb"/BaseEncoding\s*/([A-Za-z]+)")
_RE_DIFFS = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_RE_DIFF_TOK = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)")


def _font_table(font_body: bytes, objs: dict[int, bytes]):
    """Decode table for one font object.

    Returns one of: a 256-entry list (simple-font encoding table),
    ``("cmap", width, dict, fallback)`` (a /ToUnicode CMap —
    authoritative for text extraction when present, §9.10.2; the only
    extraction path for Type0/CID composite fonts, whose codes are
    glyph ids; ``fallback`` is the simple-font table consulted for
    codes the CMap omits, None for composite fonts), or None (no
    recognized /Encoding → latin-1 passthrough)."""
    tm = _RE_TOUNICODE.search(font_body)
    if tm:
        tobj = objs.get(int(tm.group(1)))
        if tobj is not None:
            raw = _stream_bytes(tobj)
            if raw is not None:
                content = _decode_filters(tobj, raw)
                if content is not None:
                    width, cmap = _parse_tounicode(content)
                    if b"/Type0" in font_body:
                        # Identity-H: 2-byte glyph-id codes; no byte-level
                        # fallback exists for unmapped codes
                        return ("cmap", max(width, 2), cmap, None)
                    # simple font: codes absent from the CMap fall back
                    # to the font's encoding (§9.10.2 step 2)
                    fb = _simple_table(font_body, objs) \
                        or [chr(i) for i in range(256)]
                    return ("cmap", width, cmap, fb)
    if b"/Type0" in font_body:
        # composite font without a usable ToUnicode: codes are glyph ids
        # with no recoverable text — emit nothing rather than mojibake
        return ("cmap", 2, {}, None)
    return _simple_table(font_body, objs)


def _simple_table(font_body: bytes,
                  objs: dict[int, bytes]) -> list[str] | None:
    """Simple-font /Encoding resolution (named base or dict with
    /BaseEncoding + /Differences); None → latin-1 passthrough."""
    enc_body = None
    nm = _RE_ENC_NAME.search(font_body)
    if nm:
        return _base_table(nm.group(1))
    rm = _RE_ENC_REF.search(font_body)
    if rm:
        enc_body = objs.get(int(rm.group(1)))
    elif b"/Encoding" in font_body:
        dm = re.search(rb"/Encoding\s*<<(.*?)>>", font_body, re.DOTALL)
        if dm:
            enc_body = dm.group(0)
    if enc_body is None:
        return None
    bm = _RE_BASE_ENC.search(enc_body)
    table = _base_table(bm.group(1)) if bm else None
    if table is None:
        # /BaseEncoding absent (or unrecognized): the spec defaults to the
        # font's built-in encoding; keep the historical latin-1 mapping as
        # the base under the /Differences overrides.
        table = [chr(i) for i in range(256)]
    dm = _RE_DIFFS.search(enc_body)
    if dm:
        code = 0
        for tok in _RE_DIFF_TOK.finditer(dm.group(1)):
            if tok.group(1) is not None:
                code = int(tok.group(1))
            else:
                if 0 <= code <= 255:
                    table[code] = _glyph_char(
                        tok.group(2).decode("latin-1"))
                code += 1
    return table


def _page_fonts(page_body: bytes, objs: dict[int, bytes]) -> dict:
    """Font-resource name → decode table (list / cmap tuple / None) for
    one page. /Resources may be inline in the page dict or an indirect
    object; the /Font dict's entries are refs to font objects."""
    region = page_body
    fm = _RE_FONT_DICT.search(region)
    if not fm:
        rm = _RE_RESOURCES_REF.search(page_body)
        if rm:
            region = objs.get(int(rm.group(1)), b"")
            fm = _RE_FONT_DICT.search(region)
    if not fm:
        return {}
    fonts: dict[bytes, list[str] | None] = {}
    for pm in _RE_FONT_PAIR.finditer(fm.group(1)):
        body = objs.get(int(pm.group(2)))
        fonts[pm.group(1)] = _font_table(body, objs) if body else None
    return fonts


def _apply_enc(bs: bytes, enc) -> str:
    if enc is None:
        return bs.decode("latin-1")
    if isinstance(enc, tuple):  # ("cmap", width, code -> text, fallback)
        _, w, cm, fb = enc
        out = []
        for i in range(0, len(bs) - w + 1, w):
            code = int.from_bytes(bs[i:i + w], "big")
            got = cm.get(code)
            if got is None:
                got = fb[code] if (fb is not None and code < 256) else ""
            out.append(got)
        return "".join(out)
    return "".join(enc[b] for b in bs)


# ---------------------------------------------------------------------------
# Stream filters (PDF 32000-1 §7.4): FlateDecode + the two ASCII transport
# encodings, applied in /Filter order. LZW/RunLength/DCT remain documented
# gaps (SURVEY.md §2.3).
# ---------------------------------------------------------------------------

_RE_FILTER = re.compile(rb"/Filter\s*(?:\[(.*?)\]|/([A-Za-z0-9]+))", re.DOTALL)


def _ascii_hex_decode(content: bytes) -> bytes:
    """/ASCIIHexDecode: hex digits, whitespace ignored, ``>`` is EOD, an
    odd final digit takes an implied trailing 0 (§7.4.2)."""
    eod = content.find(b">")
    if eod != -1:
        content = content[:eod]
    digits = re.sub(rb"\s+", b"", content)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85_decode(content: bytes) -> bytes:
    """/ASCII85Decode (§7.4.3): base-85 groups, ``z`` = four zero bytes,
    ``~>`` EOD, whitespace ignored. stdlib a85decode implements the same
    Adobe alphabet; the leading ``<~`` frame is not used by PDF."""
    import base64

    eod = content.find(b"~>")
    if eod != -1:
        content = content[:eod]
    return base64.a85decode(re.sub(rb"\s+", b"", content))


def _lzw_decode(content: bytes, early: int = 1) -> bytes:
    """/LZWDecode (§7.4.4): variable-code-width LZW, MSB-first bit
    packing, code width 9→12 bits, code 256 = clear table, 257 = EOD.
    ``early`` is the /DecodeParms /EarlyChange value: 1 (the default)
    grows the width one code early (table reaches 2^w - 1); 0 grows it
    exactly at 2^w (r5 — previously an EarlyChange=0 stream desynced and
    was skipped)."""
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    width = 9
    buf = acc = 0
    prev: bytes | None = None
    for byte in content:
        acc = (acc << 8) | byte
        buf += 8
        while buf >= width:
            code = (acc >> (buf - width)) & ((1 << width) - 1)
            buf -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if code > len(table):
                # KwKwK is only valid for code == len(table); anything
                # beyond means a desynchronized stream (corrupt data or
                # a mismatched EarlyChange) — raise so _decode_filters
                # skips the stream like every other corrupt-filter case
                # instead of emitting garbage text (r4 review finding)
                raise ValueError("LZW code out of range")
            if prev is None:
                if code == len(table):
                    raise ValueError("LZW KwKwK with no previous entry")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case (code == len(table))
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # width grows when the next code could overflow; EarlyChange=1
            # triggers one code early
            if len(table) >= (1 << width) - (1 if early else 0) \
                    and width < 12:
                width += 1
    return bytes(out)


def _runlength_decode(content: bytes) -> bytes:
    """/RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next
    L+1 bytes literally, 129..255 repeats the next byte 257-L times,
    128 = EOD."""
    out = bytearray()
    i = 0
    while i < len(content):
        ln = content[i]
        if ln == 128:
            break
        if ln < 128:
            out += content[i + 1:i + 2 + ln]
            i += 2 + ln
        else:
            out += content[i + 1:i + 2] * (257 - ln)
            i += 2
    return bytes(out)


_RE_EARLYCHANGE = re.compile(rb"/EarlyChange\s+(\d+)")


def _decode_filters(body: bytes, content: bytes) -> bytes | None:
    """Apply the object's /Filter chain (name or array, in order) to raw
    stream bytes. Returns None on an unsupported filter or corrupt data —
    callers skip the stream, matching the old Flate-only behavior.

    The /Filter search is bounded to the DICT region (before the stream
    keyword): a literal "/Filter /DCTDecode" inside an unfiltered content
    stream's text must not be mistaken for the object's filter chain
    (r4 review finding — reproduced dropping a valid stream)."""
    km = _RE_STREAM_KW.search(body)
    head = body[:km.start() if km else len(body)]
    names = _filter_names(head)
    if not names:
        return content
    em = _RE_EARLYCHANGE.search(head)
    early = int(em.group(1)) if em else 1
    # delegates to the shared chain (also used by extract_pdf_images) so
    # the five-filter semantics live in exactly one place
    return _apply_basic_filters(content, names, early)


# /Length as a DIRECT integer. The (?=[^0-9]) guard plus the indirect-ref
# lookahead rejects "/Length 5 0 R" without letting backtracking shorten
# "50" to "5" (both digits must be consumed before the lookaheads run).
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+0\s+R)")
_RE_STREAM_KW = re.compile(rb"stream\r?\n")


def _stream_bytes(body: bytes) -> bytes | None:
    """Raw (still-encoded) stream content of an object body.

    Prefers the dict's direct /Length to delimit the stream — raw Flate
    bytes legitimately contain ``endstream``/``endobj`` byte sequences,
    which truncate any textual search (ADVICE r3: a truncated xref
    stream silently disabled the whole overlay). Falls back to the
    textual ``endstream`` scan when /Length is absent, indirect, or
    inconsistent."""
    km = _RE_STREAM_KW.search(body)
    if km is None:
        return None
    lm = _RE_LENGTH.search(body, 0, km.start())
    if lm:
        n = int(lm.group(1))
        content = body[km.end():km.end() + n]
        if (len(content) == n
                and re.match(rb"\s*endstream", body[km.end() + n:])):
            return content
    m = _RE_STREAM.search(body)
    return m.group(1) if m else None


def _object_body_at(data: bytes, start: int) -> bytes:
    """Object body from ``start`` (just past ``N G obj``) to its true
    ``endobj``: when the object carries a stream with a direct /Length,
    jump over exactly that many content bytes before searching — stream
    bytes may legitimately contain the ``endobj`` keyword."""
    em = data.find(b"endobj", start)
    km = _RE_STREAM_KW.search(data, start, em if em != -1 else len(data))
    if km is not None:
        lm = _RE_LENGTH.search(data, start, km.start())
        if lm:
            cend = km.end() + int(lm.group(1))
            if re.match(rb"\s*endstream", data[cend:cend + 32]):
                em = data.find(b"endobj", cend)
    return data[start:em if em != -1 else len(data)]


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Sequential last-wins object scan with /Length-aware stream
    skipping (replaces the ``(.*?)endobj`` regex, which a stream
    containing ``endobj`` bytes both truncated AND desynchronized)."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _RE_OBJ_HDR.search(data, pos)
        if m is None:
            break
        body = _object_body_at(data, m.end())
        objs[int(m.group(1))] = body
        pos = m.end() + len(body)
    return objs


_RE_OBJSTM_N = re.compile(rb"/N\s+(\d+)")
_RE_OBJSTM_FIRST = re.compile(rb"/First\s+(\d+)")
_RE_INT_PAIR = re.compile(rb"(\d+)\s+(\d+)")


def _objstm_members(body: bytes) -> list[tuple[int, bytes]]:
    """Members of a /Type /ObjStm object, in pair-table order: the stream
    holds N objects packed after a (objnum, offset) pair table."""
    raw = _stream_bytes(body)
    nm = _RE_OBJSTM_N.search(body)
    fm = _RE_OBJSTM_FIRST.search(body)
    if not (raw is not None and nm and fm):
        return []
    content = _decode_filters(body, raw)
    if content is None:
        return []
    n, first = int(nm.group(1)), int(fm.group(1))
    pairs = _RE_INT_PAIR.findall(content[:first])[:n]
    offsets = [(int(num), int(off)) for num, off in pairs]
    out: list[tuple[int, bytes]] = []
    for i, (num, off) in enumerate(offsets):
        end = (offsets[i + 1][1] if i + 1 < len(offsets)
               else len(content) - first)
        out.append((num, content[first + off:first + end]))
    return out


def _inflate_object_streams(objs: dict[int, bytes]) -> None:
    """Inflate every /ObjStm's members into the object dict (without
    overwriting objects already resolved — the xref overlay and the
    top-level scan take precedence) so the page walk sees
    Pages/Page/Contents dicts that live inside an ObjStm."""
    for body in list(objs.values()):
        if b"/ObjStm" not in body:
            continue
        for num, member in _objstm_members(body):
            objs.setdefault(num, member)


# --- PDF 1.5+ cross-reference streams ---------------------------------------

_RE_STARTXREF = re.compile(rb"startxref\s+(\d+)")
_RE_OBJ_HDR = re.compile(rb"(\d+)\s+(\d+)\s+obj")
_RE_W3 = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_RE_XIDX = re.compile(rb"/Index\s*\[((?:\s*\d+)+)\s*\]")
_RE_XSIZE = re.compile(rb"/Size\s+(\d+)")
_RE_XPREV = re.compile(rb"/Prev\s+(\d+)")
_RE_PREDICTOR = re.compile(rb"/Predictor\s+(\d+)")


def _png_unpredict(data: bytes, row_bytes: int, predictor: int,
                   bpp: int = 1) -> bytes:
    """Undo PNG row predictors (10-15; xref streams almost always use
    /Predictor 12 = Up). Each encoded row is 1 filter-type byte + row_bytes
    data bytes. ``bpp`` is the byte distance to the "left" sample —
    1 for xref fields (8-bit single-component), /Colors * BPC/8 for
    image XObject sample data (PDF 32000-1 §7.4.4.4)."""
    if predictor < 10:
        return data
    step = row_bytes + 1
    out = bytearray()
    prev = bytearray(row_bytes)
    for r0 in range(0, len(data) - step + 1, step):
        ft = data[r0]
        row = bytearray(data[r0 + 1:r0 + step])
        if ft == 1:  # Sub
            for i in range(bpp, row_bytes):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_bytes):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_bytes):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_bytes):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = (left if pa <= pb and pa <= pc
                        else prev[i] if pb <= pc else ul)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _parse_xref_stream_at(data: bytes, off: int):
    """Parse a /Type /XRef stream object at byte offset ``off``.

    Returns (entries, prev_offset) where entries is a list of
    (objnum, type, field2, field3) in stream order — type 1: field2 =
    byte offset of the object; type 2: field2 = ObjStm object number,
    field3 = index within it — or None when ``off`` does not hold an xref
    STREAM (e.g. a classic ``xref`` table: the sequential scan already
    covers those files)."""
    m = _RE_OBJ_HDR.match(data, off)
    if not m:
        return None
    # /Length-aware delimitation (ADVICE r3): raw Flate bytes containing
    # "endobj" would truncate a find()-bounded body and silently disable
    # the whole xref overlay.
    body = _object_body_at(data, m.end())
    if b"/XRef" not in body:
        return None
    raw = _stream_bytes(body)
    wm = _RE_W3.search(body)
    if raw is None or not wm:
        return None
    content = _decode_filters(body, raw)
    if content is None:
        return None
    w1, w2, w3 = (int(g) for g in wm.groups())
    pm = _RE_PREDICTOR.search(body)
    if pm:
        content = _png_unpredict(content, w1 + w2 + w3, int(pm.group(1)))
    im = _RE_XIDX.search(body)
    if im:
        nums = [int(x) for x in im.group(1).split()]
        index = list(zip(nums[0::2], nums[1::2]))
    else:
        zm = _RE_XSIZE.search(body)
        index = [(0, int(zm.group(1)))] if zm else []
    entries: list[tuple[int, int, int, int]] = []
    step = w1 + w2 + w3
    pos = 0
    for start, count in index:
        for num in range(start, start + count):
            if pos + step > len(content):
                break
            row = content[pos:pos + step]
            pos += step
            # w1 == 0 => type defaults to 1 (PDF 32000-1 table 17)
            t = int.from_bytes(row[:w1], "big") if w1 else 1
            f2 = int.from_bytes(row[w1:w1 + w2], "big")
            f3 = int.from_bytes(row[w1 + w2:], "big")
            entries.append((num, t, f2, f3))
    prevm = _RE_XPREV.search(body)
    return entries, (int(prevm.group(1)) if prevm else None)


_RE_XSUB = re.compile(rb"(\d+)\s+(\d+)\s*")
_RE_XENT = re.compile(rb"(\d{10})\s(\d{5})\s([nf])\s?\s?")
_RE_TRAILER = re.compile(rb"trailer\s*<<")


def _parse_classic_xref_at(data: bytes, off: int):
    """Classic ``xref`` table at byte offset ``off`` → same (entries,
    prev) shape as the stream parser (types 0/1 only — classic tables
    cannot reference ObjStm members)."""
    m = re.compile(rb"xref\s*").match(data, off)
    if not m:
        return None
    pos = m.end()
    entries: list[tuple[int, int, int, int]] = []
    while True:
        sub = _RE_XSUB.match(data, pos)
        if not sub:
            break
        start, count = int(sub.group(1)), int(sub.group(2))
        pos = sub.end()
        ok = True
        for i in range(count):
            ent = _RE_XENT.match(data, pos)
            if not ent:
                ok = False
                break
            t = 1 if ent.group(3) == b"n" else 0
            entries.append((start + i, t, int(ent.group(1)),
                            int(ent.group(2))))
            pos = ent.end()
        if not ok:
            break
    if not entries:
        return None
    tm = _RE_TRAILER.search(data, pos)
    prev = None
    if tm:
        end = data.find(b">>", tm.end())
        pm = _RE_XPREV.search(data[tm.start():end if end != -1 else len(data)])
        if pm:
            prev = int(pm.group(1))
    return entries, prev


def _overlay_xref(data: bytes, objs: dict[int, bytes]) -> None:
    """Authoritative object resolution from the trailing xref chain —
    stream form (PDF 1.5+) or classic table: where the chain resolves an
    object number, it OVERRIDES the sequential scan's last-wins guess —
    an orphaned later copy of an object (incremental update debris,
    number reuse after free) must not shadow the copy the xref actually
    references. Unparseable chains keep the scan's resolution unchanged."""
    starts = _RE_STARTXREF.findall(data)
    if not starts:
        return
    resolved: dict[int, tuple[int, int, int]] = {}
    off = int(starts[-1])
    visited: set[int] = set()
    while off is not None and off not in visited:
        visited.add(off)
        parsed = (_parse_xref_stream_at(data, off)
                  or _parse_classic_xref_at(data, off))
        if parsed is None:
            break
        entries, off = parsed
        for num, t, f2, f3 in entries:
            resolved.setdefault(num, (t, f2, f3))  # newest section wins
    # Pass 0: objects the NEWEST sections mark free are deleted — a
    # conforming reader resolves references to them as nothing, so the
    # sequential scan's orphan copy must not keep serving their content
    # (r3 review finding). Object 0 is the permanent free-list head.
    for num, (t, _f2, _f3) in resolved.items():
        if t == 0 and num != 0:
            objs.pop(num, None)
    # Pass 1: direct (type 1) objects — needed before ObjStm lookups so a
    # type-2 member's container is itself xref-resolved.
    for num, (t, f2, _f3) in resolved.items():
        if t != 1:
            continue
        hm = _RE_OBJ_HDR.match(data, f2)
        if not hm or int(hm.group(1)) != num:
            continue
        end = data.find(b"endobj", hm.end())
        objs[num] = data[hm.end():end if end != -1 else len(data)]
    # Pass 2: compressed (type 2) objects by (container, index).
    members_cache: dict[int, list[tuple[int, bytes]]] = {}
    for num, (t, f2, f3) in resolved.items():
        if t != 2:
            continue
        members = members_cache.get(f2)
        if members is None:
            members = members_cache[f2] = _objstm_members(objs.get(f2, b""))
        if f3 < len(members):
            objs[num] = members[f3][1]


def extract_pdf_text(payload: str) -> list[str]:
    """latin-1-mapped PDF bytes → one text block per page (document order).

    Never raises; unparseable payloads yield []."""
    try:
        data = payload.encode("latin-1", errors="replace")
    except Exception:
        return []
    objs = _scan_objects(data)
    _overlay_xref(data, objs)  # xref-stream chain overrides last-wins scan
    # encrypted documents (standard security handler, empty user
    # password): decipher streams/strings in place BEFORE ObjStm
    # inflation — compressed object streams are themselves encrypted
    from crawspark.oracle.pdfcrypt import decrypt_objects
    decrypt_objects(data, objs)
    _inflate_object_streams(objs)

    # Page order: follow /Kids arrays when present, else /Type /Page objects
    # in object-number order (our generator emits them sequentially).
    page_ids: list[int] = []
    for num in sorted(objs):
        body = objs[num]
        if b"/Type" in body and b"/Pages" in body:
            km = _RE_KIDS.search(body)
            if km:
                page_ids = [int(r.group(1)) for r in _RE_REF.finditer(km.group(1))]
                break
    if not page_ids:
        page_ids = [n for n in sorted(objs)
                    if b"/Type" in objs[n] and b"/Page" in objs[n]
                    and b"/Pages" not in objs[n]]

    pages: list[str] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        # /Contents may be one stream ref or an ARRAY of refs (PDF splits
        # long pages across streams; token state persists across them, so
        # decode each and concatenate before tokenizing).
        am = _RE_CONTENTS_ARR.search(body)
        if am:
            refs = [int(r.group(1)) for r in _RE_REF.finditer(am.group(1))]
        else:
            cm = _RE_CONTENTS.search(body)
            if not cm:
                continue
            refs = [int(cm.group(1))]
        parts: list[bytes] = []
        for ref in refs:
            stream_obj = objs.get(ref, b"")
            raw = _stream_bytes(stream_obj)
            if raw is None:
                continue
            chunk = _decode_filters(stream_obj, raw)
            if chunk is None:
                continue
            parts.append(chunk)
        if not parts:
            continue
        content = b"\n".join(parts)
        fonts = _page_fonts(body, objs)
        enc: list[str] | None = None  # current font's decode table
        chunks: list[tuple[float, float, str]] = []  # (y, x, text)
        x = y = leading = 0.0
        for tok in _RE_TOKEN.finditer(content):
            if tok.group("op"):
                dx, dy = float(tok.group("num")), float(tok.group("num2"))
                x, y = x + dx, y + dy
                if tok.group("op") == b"TD":  # TD also sets leading = -ty
                    leading = -dy
            elif tok.group("tm"):
                parts6 = tok.group("tm").split()
                x, y = float(parts6[4]), float(parts6[5])
            elif tok.group("tl"):
                leading = float(tok.group("tl"))
            elif tok.group("fname") is not None:
                # Tf selects the font — and with it the byte→glyph
                # encoding for every following show operator. Text
                # STATE: persists across BT/ET (§9.3.1).
                enc = fonts.get(tok.group("fname"))
            elif tok.group("tstar"):
                y -= leading
            elif tok.group("bt"):
                # BT resets the text/line MATRICES; TL is a text-STATE
                # parameter and persists across text objects (PDF 32000-1
                # §9.3.1) — do not zero the leading here.
                x = y = 0.0
            elif tok.group("str") is not None:
                chunks.append((y, x, _apply_enc(_unescape_b(tok.group("str")),
                                                enc)))
            elif tok.group("hstr") is not None:
                chunks.append((y, x, _apply_enc(_unhex_b(tok.group("hstr")),
                                                enc)))
            elif tok.group("qstr") is not None:  # ' = T* + show
                y -= leading
                chunks.append((y, x, _apply_enc(_unescape_b(tok.group("qstr")),
                                                enc)))
            elif tok.group("hqstr") is not None:
                y -= leading
                chunks.append((y, x, _apply_enc(_unhex_b(tok.group("hqstr")),
                                                enc)))
            elif tok.group("qqstr") is not None:  # " = spacing + T* + show
                y -= leading
                chunks.append((y, x, _apply_enc(
                    _unescape_b(tok.group("qqstr")), enc)))
            elif tok.group("hqqstr") is not None:
                y -= leading
                chunks.append((y, x, _apply_enc(_unhex_b(tok.group("hqqstr")),
                                                enc)))
            elif tok.group("arr") is not None:
                text = "".join(
                    _apply_enc(_unescape_b(s.group("s")), enc)
                    if s.group("s") is not None
                    else _apply_enc(_unhex_b(s.group("h")), enc)
                    for s in _RE_ARR_STR.finditer(tok.group("arr")))
                chunks.append((y, x, text))
        chunks.sort(key=lambda c: (-c[0], c[1]))
        lines = [t for _, _, t in chunks if t.strip()]
        if lines:
            pages.append("\n".join(lines))
    return pages


# ---------------------------------------------------------------------------
# Image XObjects (r5): /Subtype /Image metadata + REAL pixel decode where
# the embedded codec allows — /DCTDecode routes through the from-scratch
# baseline JPEG decoder (oracle/jpegcodec.py), /FlateDecode raw samples
# inflate via zlib with PNG /Predictor rows undone bpp-aware,
# /CCITTFaxDecode K<0 through the T.6 codec (oracle/ccittcodec.py).
# JPXDecode / JBIG2 / G3 stay metadata-only (decoded=False), honestly
# reported.
# ---------------------------------------------------------------------------

_RE_IMG_W = re.compile(rb"/Width\s+(\d+)")
_RE_IMG_H = re.compile(rb"/Height\s+(\d+)")
_RE_IMG_BPC = re.compile(rb"/BitsPerComponent\s+(\d+)")
_RE_IMG_CS = re.compile(rb"/ColorSpace\s*/([A-Za-z0-9]+)")
_RE_IMG_COLORS = re.compile(rb"/Colors\s+(\d+)")
_RE_CCITT_K = re.compile(rb"/K\s+(-?\d+)")
_RE_CCITT_COLS = re.compile(rb"/Columns\s+(\d+)")
_RE_CCITT_ROWS = re.compile(rb"/Rows\s+(\d+)")
_RE_CCITT_BLACK1 = re.compile(rb"/BlackIs1\s+(true|false)")
_RE_CCITT_ALIGN = re.compile(rb"/EncodedByteAlign\s+(true|false)")

_BASIC_FILTERS = (b"FlateDecode", b"ASCIIHexDecode", b"ASCII85Decode",
                  b"LZWDecode", b"RunLengthDecode")


def _filter_names(head: bytes) -> list[bytes]:
    fm = _RE_FILTER.search(head)
    if not fm:
        return []
    if fm.group(1) is not None:
        return re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    return [fm.group(2)]


def _apply_basic_filters(content: bytes, names: list[bytes],
                         early: int) -> bytes | None:
    for name in names:
        try:
            if name == b"FlateDecode":
                content = zlib.decompress(content)
            elif name == b"ASCIIHexDecode":
                content = _ascii_hex_decode(content)
            elif name == b"ASCII85Decode":
                content = _ascii85_decode(content)
            elif name == b"LZWDecode":
                content = _lzw_decode(content, early)
            elif name == b"RunLengthDecode":
                content = _runlength_decode(content)
            else:
                return None
        except (ValueError, IndexError, zlib.error):
            return None
    return content


def extract_pdf_images(payload: str) -> list[dict]:
    """Image XObjects in object-number order. Per image: width, height,
    bits, colorspace, the /Filter chain, and — when the terminal codec
    is decodable — the REAL per-channel pixel means.

    Decodable today: /DCTDecode (baseline JPEG, any basic-filter prefix
    chain) and raw-sample /FlateDecode//LZWDecode 8-bit /DeviceRGB or
    /DeviceGray (PNG /Predictor rows undone with the component-aware
    left distance). Never raises; unparseable payloads yield []."""
    try:
        data = payload.encode("latin-1", errors="replace")
    except Exception:
        return []
    objs = _scan_objects(data)
    _overlay_xref(data, objs)
    from crawspark.oracle.pdfcrypt import decrypt_objects
    decrypt_objects(data, objs)
    _inflate_object_streams(objs)
    out: list[dict] = []
    for num in sorted(objs):
        body = objs[num]
        km = _RE_STREAM_KW.search(body)
        head = body[:km.start()] if km else body
        if b"/Subtype" not in head or b"/Image" not in head:
            continue
        wm, hm = _RE_IMG_W.search(head), _RE_IMG_H.search(head)
        if not (wm and hm):
            continue
        w, h = int(wm.group(1)), int(hm.group(1))
        bm = _RE_IMG_BPC.search(head)
        bpc = int(bm.group(1)) if bm else 8
        cm = _RE_IMG_CS.search(head)
        cs = cm.group(1).decode("ascii", "replace") if cm else ""
        names = _filter_names(head)
        rec = {"obj": num, "width": w, "height": h, "bpc": bpc,
               "colorspace": cs,
               "filter": "+".join(n.decode("ascii", "replace")
                                  for n in names) or "None",
               "decoded": False,
               "mean_r": -1.0, "mean_g": -1.0, "mean_b": -1.0}
        raw = _stream_bytes(body)
        em = _RE_EARLYCHANGE.search(head)
        early = int(em.group(1)) if em else 1
        if raw is not None and names and names[-1] == b"DCTDecode":
            pre = _apply_basic_filters(raw, names[:-1], early)
            if pre is not None:
                from crawspark.oracle.jpegcodec import decode_jpeg_pixels
                got = decode_jpeg_pixels(pre)
                if got is not None and got[0] == w and got[1] == h:
                    rec["decoded"] = True
                    rec["mean_r"], rec["mean_g"], rec["mean_b"] = got[2:5]
        elif raw is not None and names and names[-1] == b"CCITTFaxDecode":
            # /K < 0: Group 4 (T.6 MMR — the overwhelmingly common case
            # in scanned PDFs); /K = 0: Group 3 1D (MH); /K > 0: G3
            # mixed 1D/2D — all through the from-scratch T.4/T.6 codec.
            km = _RE_CCITT_K.search(head)
            k = int(km.group(1)) if km else 0
            pre = _apply_basic_filters(raw, names[:-1], early)
            if pre is not None:
                from crawspark.oracle.ccittcodec import decode_g3, decode_g4
                cm2 = _RE_CCITT_COLS.search(head)
                cols = int(cm2.group(1)) if cm2 else 1728
                rm = _RE_CCITT_ROWS.search(head)
                nrows = int(rm.group(1)) if rm else h
                b1m = _RE_CCITT_BLACK1.search(head)
                black_is_1 = bool(b1m) and b1m.group(1) == b"true"
                am = _RE_CCITT_ALIGN.search(head)
                aligned = bool(am) and am.group(1) == b"true"
                if k < 0:
                    px = decode_g4(pre, cols, rows=nrows,
                                   byte_align=aligned)
                else:
                    px = decode_g3(pre, cols, rows=nrows, k=k,
                                   byte_align=aligned)
                if px is not None and cols == w and len(px) == h:
                    n_white = sum(r.count(1) for r in px)
                    n = cols * len(px)
                    # default (BlackIs1 false): 0 bits are black, so the
                    # 1-bit gray sample is 1 for white; BlackIs1 flips it
                    frac = (n - n_white if black_is_1 else n_white) / n
                    rec["mean_r"] = rec["mean_g"] = rec["mean_b"] = (
                        255.0 * frac)
                    rec["decoded"] = True
        elif (raw is not None and bpc == 8
              and cs in ("DeviceRGB", "DeviceGray")
              and names and all(n in _BASIC_FILTERS for n in names)):
            content = _apply_basic_filters(raw, names, early)
            if content is not None:
                ncomp = 3 if cs == "DeviceRGB" else 1
                pm = _RE_PREDICTOR.search(head)
                if pm:
                    colm = _RE_IMG_COLORS.search(head)
                    bpp = int(colm.group(1)) if colm else ncomp
                    content = _png_unpredict(content, w * ncomp,
                                             int(pm.group(1)), bpp)
                need = w * h * ncomp
                if len(content) >= need:
                    if ncomp == 3:
                        px = content[:need]
                        sums = [0, 0, 0]
                        for c in range(3):
                            sums[c] = sum(px[c::3])
                        n = w * h
                        rec["mean_r"] = sums[0] / n
                        rec["mean_g"] = sums[1] / n
                        rec["mean_b"] = sums[2] / n
                    else:
                        mean = sum(content[:need]) / need
                        rec["mean_r"] = rec["mean_g"] = rec["mean_b"] = mean
                    rec["decoded"] = True
        out.append(rec)
    return out


def make_pdf_with_images(jpeg_bytes: bytes, jw: int, jh: int,
                         w2: int, h2: int, predictor: int = 0) -> bytes:
    """One-page PDF embedding two image XObjects: obj 4 carries the
    given baseline JPEG via /DCTDecode, obj 5 an 8-bit /DeviceRGB
    gradient (B=x%256, G=y%256, R=(x+2y)%256 — the BMP twin's closed
    form) via /FlateDecode, with PNG Up-predictor rows when
    ``predictor`` is 12. For the SQL oracle: with w2 <= 126 and
    h2 <= 62 there is no wraparound, so mean_r = (w2-1)/2 + (h2-1),
    mean_g = (h2-1)/2, mean_b = (w2-1)/2."""
    rows = []
    for y in range(h2):
        rows.append(bytes(b for x in range(w2)
                          for b in ((x + 2 * y) % 256, y % 256, x % 256)))
    if predictor == 12:
        enc = bytearray()
        prev = bytes(w2 * 3)
        for row in rows:
            enc += b"\x02" + bytes((row[i] - prev[i]) & 0xFF
                                   for i in range(len(row)))
            prev = row
        samples = zlib.compress(bytes(enc))
        parms = (b" /DecodeParms << /Predictor 12 /Colors 3"
                 b" /BitsPerComponent 8 /Columns " +
                 str(w2).encode() + b" >>")
    else:
        samples = zlib.compress(b"".join(rows))
        parms = b""

    def obj(num: int, body: bytes) -> bytes:
        return str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"

    content = b"q 72 0 0 72 36 360 cm /Im1 Do Q q 72 0 0 72 36 144 cm /Im2 Do Q"
    parts = [b"%PDF-1.5\n"]
    parts.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    parts.append(obj(
        3, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R /Resources"
           b" << /XObject << /Im1 4 0 R /Im2 5 0 R >> >> >>"))
    parts.append(obj(4, b"<< /Subtype /Image /Width " + str(jw).encode()
                     + b" /Height " + str(jh).encode()
                     + b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
                     + b" /Filter /DCTDecode /Length "
                     + str(len(jpeg_bytes)).encode()
                     + b" >>\nstream\n" + jpeg_bytes + b"\nendstream"))
    parts.append(obj(5, b"<< /Subtype /Image /Width " + str(w2).encode()
                     + b" /Height " + str(h2).encode()
                     + b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
                     + b" /Filter /FlateDecode" + parms
                     + b" /Length " + str(len(samples)).encode()
                     + b" >>\nstream\n" + samples + b"\nendstream"))
    parts.append(obj(6, b"<< /Length " + str(len(content)).encode()
                     + b" >>\nstream\n" + content + b"\nendstream"))
    return b"".join(parts) + b"%%EOF\n"

def make_pdf_with_ccitt(w: int, h: int, x0: int, bw: int, y0: int,
                        bh: int, black_is_1: bool = False,
                        byte_align: bool = False, k: int = -1) -> bytes:
    """One-page PDF whose image XObject is a REAL CCITT bitstream —
    Group 4 / T.6 when ``k`` < 0 (the default), Group 3 / T.4 when
    ``k`` >= 0 (1D MH at 0, mixed 1D/2D above): a w x h page, white
    except a black rectangle [x0, x0+bw) x [y0, y0+bh). Closed form for
    the oracle: mean = 255 * (bw*bh)/(w*h) when BlackIs1, else
    255 * (1 - (bw*bh)/(w*h))."""
    from crawspark.oracle.ccittcodec import encode_g3, encode_g4

    rows_px = []
    for y in range(h):
        row = bytearray([1]) * w
        if y0 <= y < y0 + bh:
            for x in range(x0, min(x0 + bw, w)):
                row[x] = 0
        rows_px.append(bytes(row))
    data = (encode_g4(rows_px, w, byte_align=byte_align) if k < 0
            else encode_g3(rows_px, w, k=k, byte_align=byte_align))
    tf = b"true" if black_is_1 else b"false"
    af = b"true" if byte_align else b"false"

    def obj(num: int, body: bytes) -> bytes:
        return str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"

    content = b"q 72 0 0 72 36 360 cm /Im1 Do Q"
    parts = [b"%PDF-1.5\n"]
    parts.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    parts.append(obj(
        3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources"
           b" << /XObject << /Im1 4 0 R >> >> >>"))
    parts.append(obj(4, b"<< /Subtype /Image /Width " + str(w).encode()
                     + b" /Height " + str(h).encode()
                     + b" /ColorSpace /DeviceGray /BitsPerComponent 1"
                     + b" /Filter /CCITTFaxDecode /DecodeParms << /K "
                     + str(k).encode()
                     + b" /Columns " + str(w).encode()
                     + b" /Rows " + str(h).encode()
                     + b" /BlackIs1 " + tf
                     + b" /EncodedByteAlign " + af + b" >>"
                     + b" /Length " + str(len(data)).encode()
                     + b" >>\nstream\n" + data + b"\nendstream"))
    parts.append(obj(5, b"<< /Length " + str(len(content)).encode()
                     + b" >>\nstream\n" + content + b"\nendstream"))
    return b"".join(parts) + b"%%EOF\n"
