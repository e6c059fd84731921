"""Legacy Word ``.doc`` text extraction — MS-CFB + MS-DOC, from the
public Microsoft Open Specifications (stdlib ``struct`` only).

Pre-2007 Office files are OLE2 *compound files*: a FAT filesystem in
miniature. Text extraction needs two real layers:

**MS-CFB container**: 512-byte header (signature ``D0CF11E0A1B11AE1``,
sector shift, DIFAT); a FAT (uint32 next-sector chains, special values
``FATSECT``/``ENDOFCHAIN``/``FREESECT``); a directory of 128-byte
entries (UTF-16 names, start sector, size); and for streams smaller
than 4096 bytes a SECOND layer — the miniFAT chains 64-byte
minisectors *inside* the root entry's ministream, itself a FAT-chained
stream. Both layers are walked here.

**MS-DOC**: the ``WordDocument`` stream starts with the FIB
(``wIdent=0xA5EC``; bit 0x0200 of the flags word at 0x0A selects the
``0Table``/``1Table`` companion stream). ``fcClx``/``lcbClx`` (offsets
0x1A2/0x1A6, nFib 0x00C1 layout) locate the CLX in the table stream.
The CLX's Pcdt (clxt=2, after skipping clxt=1 Prc entries) holds the
*piece table*: n+1 character positions plus n PCDs; each PCD's fc has
bit 30 set for "compressed" pieces (8-bit cp1252 bytes at ``fc>>1``)
and clear for UTF-16LE pieces at ``fc``. Pieces need not be laid out
in CP order in the stream. When ``lcbClx`` is 0 (Word 6 era,
non-complex) the text is the raw ``fcMin..fcMax`` byte range.

``extract_doc_text`` returns one string per paragraph (text split on
``\\r``, Word's paragraph mark). ``make_legacy_doc`` builds a
spec-conformant container: the WordDocument stream is >4096 bytes
(regular FAT chain, multiple sectors), the table stream is small
(miniFAT path), pieces are stored in REVERSE cp order with a cp1252
and a UTF-16 piece both on the hash path.
"""

from __future__ import annotations

import struct

_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_FREESECT = 0xFFFFFFFF
_MINI_CUTOFF = 4096


# ---------------------------------------------------------------- reader

def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out, s = [], start
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(fat):
        out.append(s)
        if len(out) > limit:  # cycle guard
            return []
        s = fat[s]
    return out


class _Cfb:
    """Minimal compound-file reader: header → FAT → directory →
    per-stream bytes (FAT or miniFAT layer chosen by size)."""

    def __init__(self, payload: bytes):
        if payload[:8] != _SIG:
            raise ValueError("not CFB")
        (self.sshift,) = struct.unpack_from("<H", payload, 0x1E)
        (self.mshift,) = struct.unpack_from("<H", payload, 0x20)
        self.ssz, self.msz = 1 << self.sshift, 1 << self.mshift
        (n_fat,) = struct.unpack_from("<I", payload, 0x2C)
        (dir_start,) = struct.unpack_from("<I", payload, 0x30)
        (self.cutoff,) = struct.unpack_from("<I", payload, 0x38)
        (minifat_start,) = struct.unpack_from("<I", payload, 0x3C)
        (n_minifat,) = struct.unpack_from("<I", payload, 0x40)
        (difat_start,) = struct.unpack_from("<I", payload, 0x44)
        self.buf = payload
        # DIFAT: 109 header slots, then chained DIFAT sectors (each
        # holds ssz/4-1 FAT locators + a next-DIFAT pointer)
        difat = list(struct.unpack_from("<109I", payload, 0x4C))
        s = difat_start
        per = self.ssz // 4 - 1
        while s not in (_ENDOFCHAIN, _FREESECT):
            ent = struct.unpack_from(f"<{per + 1}I", payload,
                                     512 + s * self.ssz)
            difat.extend(ent[:per])
            s = ent[-1]
        fat: list[int] = []
        for loc in difat[:max(n_fat, 1)]:
            if loc in (_FREESECT, _ENDOFCHAIN):
                break
            fat.extend(struct.unpack_from(
                f"<{self.ssz // 4}I", payload, 512 + loc * self.ssz))
        self.fat = fat
        nsect = (len(payload) - 512 + self.ssz - 1) // self.ssz
        dir_raw = b"".join(self._sector(s)
                           for s in _chain(fat, dir_start, nsect))
        self.entries = []
        for off in range(0, len(dir_raw), 128):
            ent = dir_raw[off:off + 128]
            if len(ent) < 128:
                break
            (nlen,) = struct.unpack_from("<H", ent, 0x40)
            nlen = min(nlen, 64)
            name = ent[:max(nlen - 2, 0)].decode("utf-16-le", "replace")
            otype = ent[0x42]
            (start,) = struct.unpack_from("<I", ent, 0x74)
            (size,) = struct.unpack_from("<Q", ent, 0x78)
            self.entries.append((name, otype, start, size))
        # ministream: the root entry's own chain + the miniFAT
        root = next((e for e in self.entries if e[1] == 5), None)
        self.mini = b""
        self.minifat: list[int] = []
        if root is not None:
            self.mini = b"".join(
                self._sector(s)
                for s in _chain(fat, root[2], nsect))[:root[3]]
            mf_raw = b"".join(self._sector(s) for s in
                              _chain(fat, minifat_start, nsect))
            self.minifat = list(struct.unpack_from(
                f"<{len(mf_raw) // 4}I", mf_raw)) if mf_raw else []
            del n_minifat

    def _sector(self, s: int) -> bytes:
        off = 512 + s * self.ssz
        return self.buf[off:off + self.ssz].ljust(self.ssz, b"\x00")

    def stream(self, name: str) -> bytes | None:
        for ename, otype, start, size in self.entries:
            if otype == 2 and ename == name:
                if size < self.cutoff:
                    chunks = [
                        self.mini[s * self.msz:(s + 1) * self.msz]
                        for s in _chain(self.minifat, start,
                                        len(self.minifat) + 1)]
                    return b"".join(chunks)[:size]
                nsect = (len(self.buf) - 512 + self.ssz - 1) // self.ssz
                return b"".join(self._sector(s) for s in
                                _chain(self.fat, start, nsect))[:size]
        return None


def _parse_clx(clx: bytes) -> tuple[list[int], list[tuple[int, bool]]]:
    """CLX → (cp boundaries, [(fc, compressed)]). Skips Prc entries."""
    pos = 0
    while pos < len(clx):
        kind = clx[pos]
        if kind == 1:  # Prc: 2-byte cb + grpprl — property mods, skip
            (cb,) = struct.unpack_from("<H", clx, pos + 1)
            pos += 3 + cb
        elif kind == 2:  # Pcdt
            (lcb,) = struct.unpack_from("<I", clx, pos + 1)
            plc = clx[pos + 5:pos + 5 + lcb]
            n = (len(plc) - 4) // 12  # n+1 CPs (4B) + n PCDs (8B)
            cps = list(struct.unpack_from(f"<{n + 1}I", plc, 0))
            pieces = []
            for i in range(n):
                off = (n + 1) * 4 + i * 8
                (fc_raw,) = struct.unpack_from("<I", plc, off + 2)
                compressed = bool(fc_raw & 0x40000000)
                fc = fc_raw & 0x3FFFFFFF
                pieces.append((fc >> 1 if compressed else fc, compressed))
            return cps, pieces
        else:
            break
    return [], []


def extract_doc_text(payload: bytes) -> list[str]:
    """One string per paragraph (\\r-delimited), piece-table order.
    Never raises; non-.doc bytes yield []."""
    try:
        cfb = _Cfb(payload)
        word = cfb.stream("WordDocument")
        if word is None or len(word) < 0x200:
            return []
        (ident,) = struct.unpack_from("<H", word, 0)
        if ident != 0xA5EC:
            return []
        (flags,) = struct.unpack_from("<H", word, 0x0A)
        table = cfb.stream("1Table" if flags & 0x0200 else "0Table")
        (fc_min,) = struct.unpack_from("<I", word, 0x18)
        (fc_max,) = struct.unpack_from("<I", word, 0x1C)
        (ccp_text,) = struct.unpack_from("<I", word, 0x4C)
        (fc_clx,) = struct.unpack_from("<I", word, 0x1A2)
        (lcb_clx,) = struct.unpack_from("<I", word, 0x1A6)
        if lcb_clx == 0 or table is None:
            text = word[fc_min:fc_max].decode("cp1252", "replace")
        else:
            cps, pieces = _parse_clx(table[fc_clx:fc_clx + lcb_clx])
            parts = []
            for i, (fc, compressed) in enumerate(pieces):
                n_cp = cps[i + 1] - cps[i]
                if compressed:
                    parts.append(
                        word[fc:fc + n_cp].decode("cp1252", "replace"))
                else:
                    parts.append(word[fc:fc + 2 * n_cp]
                                 .decode("utf-16-le", "replace"))
            text = "".join(parts)[:ccp_text or None]
    except Exception:
        return []
    paras = text.split("\r")
    if paras and paras[-1] == "":
        paras.pop()
    return paras


# --------------------------------------------------------------- builder

def doc_paragraphs_expected(doc_id: int) -> list[str]:
    """Closed form of make_legacy_doc's paragraphs."""
    d = doc_id
    out = []
    for p in range(2 + d % 3):
        t = f"doc {d} legacy para {p}"
        if (d + p) % 2 == 1:
            t += " café"
        out.append(t)
    out[-1] += f" τ{d % 7}"  # lives in the UTF-16 piece
    return out


def _dir_entry(name: str, otype: int, start: int, size: int,
               left: int = _FREESECT, right: int = _FREESECT,
               child: int = _FREESECT) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    ent = bytearray(128)
    ent[:len(raw)] = raw
    struct.pack_into("<H", ent, 0x40, len(raw))
    ent[0x42] = otype
    ent[0x43] = 1  # black
    struct.pack_into("<III", ent, 0x44, left, right, child)
    struct.pack_into("<I", ent, 0x74, start)
    struct.pack_into("<Q", ent, 0x78, size)
    return bytes(ent)


def make_legacy_doc(doc_id: int) -> bytes:
    """Deterministic .doc: 2 + d%3 paragraphs; all but the last
    paragraph in a cp1252 "compressed" piece, the last in a UTF-16
    piece that is stored FIRST in the stream (fc order != cp order);
    table stream name alternates 0Table/1Table by d parity; the table
    stream rides the miniFAT, WordDocument the regular FAT."""
    d = doc_id
    paras = doc_paragraphs_expected(d)
    text = "\r".join(paras) + "\r"
    n_last = len(paras[-1]) + 1  # + its \r
    piece0_txt, piece1_txt = text[:-n_last], text[-n_last:]

    fib = bytearray(0x1000)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)
    flags = 0x0200 if d % 2 else 0
    struct.pack_into("<H", fib, 0x0A, flags)
    ccp = len(text)
    struct.pack_into("<I", fib, 0x4C, ccp)
    # piece 1 (UTF-16) first in the stream, then piece 0 (cp1252)
    fc1 = 0x1000
    b1 = piece1_txt.encode("utf-16-le")
    fc0 = fc1 + len(b1)
    b0 = piece0_txt.encode("cp1252")
    word_stream = bytes(fib) + b1 + b0
    word_stream = word_stream.ljust(_MINI_CUTOFF + 64, b"\x00")

    cp_split = len(piece0_txt)
    plc = struct.pack("<3I", 0, cp_split, ccp)
    plc += struct.pack("<HIH", 0, (fc0 << 1) | 0x40000000, 0)
    plc += struct.pack("<HIH", 0, fc1, 0)
    pcdt = b"\x02" + struct.pack("<I", len(plc)) + plc
    prc = b"\x01" + struct.pack("<H", 4) + b"\xde\xad\xbe\xef"
    prefix = bytes(range(0x41, 0x41 + d % 5))  # exercises fcClx offset
    table_stream = prefix + prc + pcdt
    struct.pack_into("<II", fib, 0x1A2,
                     len(prefix), len(prc) + len(pcdt))
    word_stream = bytes(fib) + word_stream[0x1000:]

    # --- container assembly (v3: 512B sectors, 64B minisectors)
    ssz, msz = 512, 64
    mini = table_stream + b"\x00" * (-len(table_stream) % msz)
    n_minisect = len(mini) // msz
    minifat = [i + 1 for i in range(n_minisect)]
    minifat[-1] = _ENDOFCHAIN
    minifat += [_FREESECT] * (ssz // 4 - len(minifat))
    minifat_sector = struct.pack(f"<{ssz // 4}I", *minifat)

    # sector plan: 0=FAT, 1=directory, 2=miniFAT, then ministream
    # sectors, then WordDocument sectors
    n_mini_cont = (len(mini) + ssz - 1) // ssz
    n_word = (len(word_stream) + ssz - 1) // ssz
    mini_start, word_start = 3, 3 + n_mini_cont
    fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
    fat += [mini_start + i + 1 for i in range(n_mini_cont)]
    fat[-1] = _ENDOFCHAIN
    fat += [word_start + i + 1 for i in range(n_word)]
    fat[-1] = _ENDOFCHAIN
    assert len(fat) <= ssz // 4, "single FAT sector exceeded"
    fat += [_FREESECT] * (ssz // 4 - len(fat))
    fat_sector = struct.pack(f"<{ssz // 4}I", *fat)

    table_name = "1Table" if d % 2 else "0Table"
    entries = (
        _dir_entry("Root Entry", 5, mini_start, len(mini), child=1)
        + _dir_entry("WordDocument", 2, word_start, len(word_stream),
                     right=2)
        + _dir_entry(table_name, 2, 0, len(table_stream))
        + b"\x00" * 128)
    dir_sector = entries.ljust(ssz, b"\x00")

    header = bytearray(512)
    header[:8] = _SIG
    struct.pack_into("<HH", header, 0x18, 0x3E, 0x03)
    struct.pack_into("<H", header, 0x1C, 0xFFFE)
    struct.pack_into("<HH", header, 0x1E, 9, 6)
    struct.pack_into("<I", header, 0x2C, 1)          # one FAT sector
    struct.pack_into("<I", header, 0x30, 1)          # directory start
    struct.pack_into("<I", header, 0x38, _MINI_CUTOFF)
    struct.pack_into("<II", header, 0x3C, 2, 1)      # miniFAT start/cnt
    struct.pack_into("<II", header, 0x44, _ENDOFCHAIN, 0)  # no DIFAT
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 0x4C, *difat)

    body = fat_sector + dir_sector + minifat_sector
    body += mini + b"\x00" * (-len(mini) % ssz)
    body += word_stream + b"\x00" * (-len(word_stream) % ssz)
    return bytes(header) + body
