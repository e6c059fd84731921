"""Pure-Python image container-header parsing: real dimension decode with
zero codec dependencies.

The multimodal PIXEL decode stays a stub (no PIL/ffmpeg in this
container), but container headers are plain public byte layouts — PNG
IHDR (RFC 2083 §3.1), GIF logical screen descriptor (GIF89a spec §18),
JPEG SOFn frame headers (ITU-T T.81 §B.2.2), BMP BITMAPINFOHEADER — so
width/height/format extraction is implemented for real and unit-tested
against hand-written byte vectors. This is the metadata a 100 TB media
curation pipeline actually filters on (resolution gates, aspect buckets)
before any pixel work.
"""

from __future__ import annotations

import struct

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOFn markers that carry frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
# (C4=DHT, C8=JPG extension, CC=DAC are not frame headers).
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the container header, or None when the
    payload is not a recognized image. Never raises."""
    try:
        if payload.startswith(_PNG_SIG) and len(payload) >= 24:
            # 8-byte sig, 4-byte chunk length, b"IHDR", then w/h as be32
            if payload[12:16] == b"IHDR":
                w, h = struct.unpack(">II", payload[16:24])
                return "png", w, h
            return None
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return "gif", w, h
        if payload[:2] == b"\xff\xd8":
            return _parse_jpeg(payload)
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return "bmp", w, abs(h)  # negative height = top-down rows
    except (struct.error, IndexError):
        return None
    return None


def _parse_jpeg(payload: bytes) -> tuple[str, int, int] | None:
    """Walk the marker stream to the first SOFn frame header: dimensions
    live at offset +5 (height be16) and +7 (width be16) past the length
    field (ITU-T T.81 §B.2.2)."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None  # desynchronized marker stream
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", payload[i + 5:i + 9])
            return "jpeg", w, h
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# Deterministic synthesis (pure function of (fmt, w, h)) — the test/bench
# corpus generator; the registry oracle reproduces the dims arithmetic in
# closed-form SQL while Spark round-trips real bytes through the parser.
# ---------------------------------------------------------------------------

def make_image_bytes(fmt: str, w: int, h: int) -> bytes:
    """Minimal valid header bytes for a (fmt, w, h) image. Bodies are
    truncated/filler — enough for any header-level parser, deliberately
    not a full image (pixel decode is out of scope without codecs)."""
    if fmt == "png":
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        return (_PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr
                + b"\x00\x00\x00\x00")  # placeholder CRC (not validated)
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" \
            + b"\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
        sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" \
            + struct.pack(">HH", h, w) \
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if fmt == "bmp":
        info = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
        header = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40)
        return header + info
    raise ValueError(f"unknown format {fmt!r}")
