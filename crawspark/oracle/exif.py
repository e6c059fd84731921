"""EXIF metadata (JEITA CP-3451 / TIFF 6.0) from JPEG APP1 segments.

The orientation/camera/timestamp channel an image pipeline reads
before any pixel work (auto-rotation at orientation 5-8 swaps the
effective dimensions). The EXIF payload is a little TIFF file embedded
in an APP1 marker: ``Exif\\0\\0`` + byte-order header + IFD0, whose
tag 34665 points at the Exif sub-IFD. Both II and MM byte orders are
walked; ASCII values beyond 4 bytes live at value offsets relative to
the TIFF origin (NOT the file origin — the classic off-by-APP1 bug).

``make_exif_jpeg`` splices a deterministic APP1 into a real baseline
JPEG right after SOI, so the bytes remain a decodable image.
"""

from __future__ import annotations

import struct

_TAG_MAKE = 271
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_PIXEL_X = 40962
_TAG_PIXEL_Y = 40963


def _read_ifd(data: bytes, e: str, off: int) -> dict[int, object]:
    out: dict[int, object] = {}
    n = struct.unpack(e + "H", data[off:off + 2])[0]
    for i in range(n):
        ent = data[off + 2 + 12 * i:off + 14 + 12 * i]
        if len(ent) < 12:
            break
        tag, typ = struct.unpack(e + "HH", ent[:4])
        cnt = struct.unpack(e + "I", ent[4:8])[0]
        if typ == 3:  # SHORT
            out[tag] = struct.unpack(e + "H", ent[8:10])[0]
        elif typ == 4:  # LONG
            out[tag] = struct.unpack(e + "I", ent[8:12])[0]
        elif typ == 2:  # ASCII, NUL-terminated; >4 bytes → at offset
            if cnt <= 4:
                raw = ent[8:8 + cnt]
            else:
                voff = struct.unpack(e + "I", ent[8:12])[0]
                raw = data[voff:voff + cnt]
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    return out


def parse_exif(jpeg: bytes) -> dict | None:
    """{'orientation', 'make', 'datetime', 'pixel_x', 'pixel_y'} from
    the first APP1 Exif segment; None when absent. Never raises."""
    try:
        if jpeg[:2] != b"\xff\xd8":
            return None
        i = 2
        tiff = None
        while i + 4 <= len(jpeg):
            if jpeg[i] != 0xFF:
                return None
            marker = jpeg[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", jpeg[i + 2:i + 4])[0]
            if marker == 0xE1 and jpeg[i + 4:i + 10] == b"Exif\x00\x00":
                tiff = jpeg[i + 10:i + 2 + seglen]
                break
            if marker == 0xDA:  # SOS: entropy data follows, stop
                break
            i += 2 + seglen
        if tiff is None:
            return None
        if tiff[:4] == b"II\x2a\x00":
            e = "<"
        elif tiff[:4] == b"MM\x00\x2a":
            e = ">"
        else:
            return None
        ifd0 = _read_ifd(tiff, e, struct.unpack(e + "I", tiff[4:8])[0])
        sub: dict[int, object] = {}
        if isinstance(ifd0.get(_TAG_EXIF_IFD), int):
            sub = _read_ifd(tiff, e, ifd0[_TAG_EXIF_IFD])
        return {
            "orientation": int(ifd0.get(_TAG_ORIENTATION, 0)) or None,
            "make": ifd0.get(_TAG_MAKE, "") or "",
            "datetime": ifd0.get(_TAG_DATETIME, "") or "",
            "pixel_x": int(sub.get(_TAG_PIXEL_X, 0)) or None,
            "pixel_y": int(sub.get(_TAG_PIXEL_Y, 0)) or None,
        }
    except (IndexError, struct.error):
        return None


def _entry(e: str, tag: int, typ: int, cnt: int, val: bytes) -> bytes:
    return struct.pack(e + "HHI", tag, typ, cnt) + val.ljust(4, b"\x00")


def build_exif_tiff(*, orientation: int, make: str, datetime_s: str,
                    pixel_x: int, pixel_y: int, big_endian: bool) -> bytes:
    """The embedded TIFF: IFD0 (Make at a value offset, Orientation,
    DateTime at an offset, ExifIFD pointer) + Exif sub-IFD (pixel
    dims). All offsets relative to the TIFF origin, per spec."""
    e = ">" if big_endian else "<"
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime_s.encode("ascii") + b"\x00"
    n0 = 4
    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * n0 + 4  # after IFD0 + next-IFD ptr
    n1 = 2
    data_off = sub_off + 2 + 12 * n1 + 4
    make_off = data_off
    dt_off = make_off + len(make_b)
    ifd0 = struct.pack(e + "H", n0)
    ifd0 += _entry(e, _TAG_MAKE, 2, len(make_b),
                   struct.pack(e + "I", make_off))
    ifd0 += _entry(e, _TAG_ORIENTATION, 3, 1,
                   struct.pack(e + "H", orientation))
    ifd0 += _entry(e, _TAG_DATETIME, 2, len(dt_b),
                   struct.pack(e + "I", dt_off))
    ifd0 += _entry(e, _TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", sub_off))
    ifd0 += struct.pack(e + "I", 0)
    sub = struct.pack(e + "H", n1)
    sub += _entry(e, _TAG_PIXEL_X, 4, 1, struct.pack(e + "I", pixel_x))
    sub += _entry(e, _TAG_PIXEL_Y, 4, 1, struct.pack(e + "I", pixel_y))
    sub += struct.pack(e + "I", 0)
    head = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + \
        struct.pack(e + "I", ifd0_off)
    return head + ifd0 + sub + make_b + dt_b


def make_exif_jpeg(jpeg: bytes, **kw) -> bytes:
    """Splice an Exif APP1 right after SOI of a real JPEG."""
    tiff = build_exif_tiff(**kw)
    seg = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
    return jpeg[:2] + app1 + jpeg[2:]
