"""From-scratch CCITT Group 4 (ITU-T T.6) codec — the 2D MMR coding
used by /CCITTFaxDecode (K < 0) in scanned PDFs and by TIFF
Compression=4. Pure stdlib, spec-only sources: ITU-T T.4 (run-length
Huffman tables, §2/Tables 2-4) and T.6 §2 (2D modes: pass, horizontal,
vertical V0/VR1-3/VL1-3; EOFB termination).

Decoder and encoder share the public code tables; decoder correctness
is pinned by hand-packed bitstream vectors (tests/test_ccitt.py) in
addition to round-trips, and the tables themselves carry a prefix-free
structural test — the defense the r4/r5 reviews proved necessary
against parser+generator pairs hiding a shared table typo.

Internal bitmap convention: one byte per pixel, 0 = black, 1 = white
(the PhotometricInterpretation question — BlackIs1 — is applied by the
CALLER when mapping to sample values, see pdfparse)."""

from __future__ import annotations

# --- T.4 run-length code tables -------------------------------------------
# code string (MSB-first bits) -> run length. Terminating codes 0..63,
# make-up codes 64..1728 per colour, extended make-ups 1792..2560 shared.

WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2D mode codes (T.6 Table 1/T.4 Table 4)
MODE_PASS = "0001"
MODE_HORIZ = "001"
MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
          3: "0000011", -3: "0000010"}
EOFB = "000000000001" * 2

# Decode maps: bit-string -> run/mode. Built once.
_WHITE_DEC = {v: k for k, v in {**WHITE_CODES, **EXT_CODES}.items()}
_BLACK_DEC = {v: k for k, v in {**BLACK_CODES, **EXT_CODES}.items()}
_MAXLEN_W = max(len(c) for c in _WHITE_DEC)
_MAXLEN_B = max(len(c) for c in _BLACK_DEC)


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> str | None:
        if self.pos + n > len(self.data) * 8:
            return None
        out = []
        for i in range(self.pos, self.pos + n):
            out.append("1" if self.data[i >> 3] & (0x80 >> (i & 7)) else "0")
        self.pos += n
        return "".join(out)

    def peek(self, n: int) -> str:
        save = self.pos
        got = self.read(n)
        self.pos = save
        return got or ""

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _Bits, white: bool) -> int | None:
    """One full run length: make-up codes (>=64, repeatable for runs
    beyond 2560) followed by a terminating code (<64)."""
    table = _WHITE_DEC if white else _BLACK_DEC
    maxlen = _MAXLEN_W if white else _MAXLEN_B
    total = 0
    while True:
        code = ""
        run = None
        while len(code) <= maxlen:
            b = bits.read(1)
            if b is None:
                return None
            code += b
            if code in table:
                run = table[code]
                break
        if run is None:
            return None
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _changes(row: bytes) -> list[int]:
    """Positions where colour changes vs the previous pixel (row starts
    conceptually white)."""
    out = []
    prev = 1
    for i, px in enumerate(row):
        if px != prev:
            out.append(i)
            prev = px
    return out


def _b1_b2(ref_changes: list[int], a0: int, color_white: bool,
           columns: int) -> tuple[int, int]:
    """b1: first changing element on the reference line right of a0 with
    the opposite colour of a0's colour; b2: the next after b1. Changing
    elements alternate white->black (even index), black->white (odd)."""
    want_parity = 0 if color_white else 1
    b1 = columns
    i = 0
    for i, c in enumerate(ref_changes):
        if c > a0 and i % 2 == want_parity:
            b1 = c
            break
    else:
        return columns, columns
    b2 = ref_changes[i + 1] if i + 1 < len(ref_changes) else columns
    return b1, min(b2, columns)


def _decode_row_2d(bits: _Bits, ref_changes: list[int],
                   columns: int) -> bytes | None:
    """One 2D-coded row (shared by T.6 and T.4 K>0). None on malform."""
    row = bytearray([1]) * columns
    a0 = -1
    white = True
    while a0 < columns:
        b1, b2 = _b1_b2(ref_changes, a0, white, columns)
        if bits.peek(1) == "1":  # V0
            bits.read(1)
            a1 = b1
        elif bits.peek(3) == MODE_HORIZ:
            bits.read(3)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            if r1 is None or r2 is None:
                return None
            start = max(a0, 0)
            a1 = min(start + r1, columns)
            a2 = min(a1 + r2, columns)
            if a2 <= a0 and a0 >= 0:  # malformed: no progress
                return None
            if not white:
                for i in range(start, a1):
                    row[i] = 0
            else:
                for i in range(a1, a2):
                    row[i] = 0
            a0 = a2
            continue
        elif bits.peek(4) == MODE_PASS:
            bits.read(4)
            if not white:
                for i in range(max(a0, 0), b2):
                    row[i] = 0
            a0 = b2
            continue
        else:
            for d in (1, -1, 2, -2, 3, -3):
                code = MODE_V[d]
                if bits.peek(len(code)) == code:
                    bits.read(len(code))
                    a1 = b1 + d
                    break
            else:
                return None
            a1 = max(0, min(a1, columns))
        # vertical modes land here: run a0..a1 in current colour
        if a1 <= a0:  # malformed: changing elements must advance
            return None
        if not white:
            for i in range(max(a0, 0), a1):
                row[i] = 0
        a0 = a1
        white = not white
    return bytes(row)


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False) -> list[bytes] | None:
    """Decode a T.6 bitstream into rows of 0(black)/1(white) bytes.
    Stops at EOFB, after ``rows`` rows, or when bits run out (the PDF
    /Rows key makes EOFB optional). Returns None on malformed input."""
    bits = _Bits(data)
    out: list[bytes] = []
    ref_changes: list[int] = []  # imaginary all-white line above row 0
    while rows is None or len(out) < rows:
        if bits.peek(len(EOFB)) == EOFB:
            break
        if rows is None and bits.pos >= len(data) * 8 - 7:
            break  # trailing pad bits only
        row = _decode_row_2d(bits, ref_changes, columns)
        if row is None:
            return None
        out.append(row)
        ref_changes = _changes(row)
        if byte_align:
            bits.align()
    return out


# --- Group 3 (ITU-T T.4) — 1D Modified Huffman (K = 0) and mixed
# 1D/2D (K > 0), the /CCITTFaxDecode K >= 0 cases and TIFF
# Compression=2/3. EOL = eleven 0s + 1 (T.4 §2.2.2); no valid code
# word or fill sequence contains eleven consecutive 0s followed by a 1
# at a non-EOL position, so scanning zeros-then-one is unambiguous.

EOL = "000000000001"


def _try_eol(bits: _Bits) -> bool:
    """Consume fill zeros + one EOL if the stream continues with
    (zeros*, EOL); otherwise leave the position untouched."""
    save = bits.pos
    zeros = 0
    while True:
        b = bits.read(1)
        if b == "0":
            zeros += 1
            continue
        if b == "1" and zeros >= 11:
            return True
        bits.pos = save
        return False


def _peek_eol(bits: _Bits) -> bool:
    save = bits.pos
    got = _try_eol(bits)
    bits.pos = save
    return got


def _decode_row_1d(bits: _Bits, columns: int) -> bytes | None:
    """One 1D (MH) row: alternating run-length codes starting with a
    white run (possibly 0), totalling exactly ``columns`` pixels."""
    row = bytearray([1]) * columns
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        if run is None or pos + run > columns:
            return None
        if not white:
            for i in range(pos, pos + run):
                row[i] = 0
        pos += run
        white = not white
    return bytes(row)


def decode_g3(data: bytes, columns: int, rows: int | None = None,
              k: int = 0, byte_align: bool = False) -> list[bytes] | None:
    """Decode a T.4 Group 3 bitstream into rows of 0(black)/1(white)
    bytes. ``k`` is the /CCITTFaxDecode K value: 0 → every line 1D
    (EOLs optional, as PDF emits them); K > 0 → each line is preceded
    by EOL + a tag bit (1 = 1D, 0 = 2D vs the previous line, T.4
    §2.2.4). Terminates on RTC (consecutive EOLs), after ``rows``, or
    at end of data. Returns None on malformed input."""
    bits = _Bits(data)
    out: list[bytes] = []
    ref_changes: list[int] = []
    saw_eol = False
    while rows is None or len(out) < rows:
        if byte_align and not saw_eol:
            # no-EOL framing (TIFF Compression=2 style): each row begins
            # at a byte boundary. When EOLs are present alignment fill is
            # consumed by the fill-tolerant EOL scan instead — aligning
            # there could eat leading zeros of an unpadded RTC.
            bits.align()
        one_dim = True
        if _try_eol(bits):
            saw_eol = True
            if k > 0:
                tag = bits.read(1)
                if tag is None:
                    break
                one_dim = tag == "1"
            if _peek_eol(bits):
                break  # RTC: an EOL immediately after an EOL(+tag)
        else:
            if bits.pos >= len(data) * 8 - 7:
                break  # trailing pad bits only
            if k > 0 and out:
                return None  # mixed mode requires EOL+tag between lines
        row = (_decode_row_1d(bits, columns) if one_dim
               else _decode_row_2d(bits, ref_changes, columns))
        if row is None:
            return None
        out.append(row)
        ref_changes = _changes(row)
    return out


def _encode_run(run: int, white: bool) -> str:
    table = WHITE_CODES if white else BLACK_CODES
    out = []
    while run > 2560 + 63:  # chain max ext make-up until encodable
        out.append(EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        out.append(EXT_CODES[makeup] if makeup >= 1792 else table[makeup])
        run -= makeup
    out.append(table[run])
    return "".join(out)


def _encode_row_2d(row: bytes, ref_changes: list[int],
                   columns: int) -> list[str]:
    """2D-code one row against the reference line: pass when b2 < a1,
    vertical when |a1-b1| <= 3, horizontal otherwise."""
    bits: list[str] = []
    cur_changes = _changes(row)
    a0 = -1
    white = True
    while a0 < columns:
        # a1: next change right of a0 to the opposite of current colour
        a1 = columns
        for i, c in enumerate(cur_changes):
            if c > a0 and i % 2 == (0 if white else 1):
                a1 = c
                break
        b1, b2 = _b1_b2(ref_changes, a0, white, columns)
        if b2 < a1:
            bits.append(MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bits.append(MODE_V[a1 - b1])
            a0 = a1
            white = not white
        else:
            # a2: next change after a1 (back to current colour)
            a2 = columns
            for i, c in enumerate(cur_changes):
                if c > a1 and i % 2 == (1 if white else 0):
                    a2 = c
                    break
            start = max(a0, 0)
            bits.append(MODE_HORIZ)
            bits.append(_encode_run(a1 - start, white))
            bits.append(_encode_run(a2 - a1, not white))
            a0 = a2
    return bits


def _encode_row_1d(row: bytes, columns: int) -> list[str]:
    """MH-code one row: alternating runs starting white (0-run first
    when the row starts black)."""
    bits: list[str] = []
    changes = _changes(row) + [columns]
    pos = 0
    white = True
    for c in changes:
        bits.append(_encode_run(c - pos, white))
        pos = c
        white = not white
        if pos >= columns:
            break
    return bits


def encode_g4(rows_px: list[bytes], columns: int,
              byte_align: bool = False) -> bytes:
    """Encode rows of 0(black)/1(white) bytes as a T.6 bitstream ending
    in EOFB."""
    bits: list[str] = []
    ref_changes: list[int] = []
    for row in rows_px:
        bits.extend(_encode_row_2d(row, ref_changes, columns))
        ref_changes = _changes(row)
        if byte_align:
            total = sum(len(b) for b in bits)
            if total % 8:
                bits.append("0" * (8 - total % 8))
    bits.append(EOFB)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def encode_g3(rows_px: list[bytes], columns: int, k: int = 0,
              byte_align: bool = False, with_eol: bool = True) -> bytes:
    """Encode rows as a T.4 Group 3 bitstream. k=0: EOL + 1D codes per
    line; k>0: EOL + tag bit per line, a 1D line every k lines (T.4
    §2.2.4), 2D between; ends with RTC (six EOLs, tag 1 each in mixed
    mode). ``byte_align``: fill zeros so each encoded line — EOL and
    tag bit included — begins at a byte boundary (the PDF
    /EncodedByteAlign contract). ``with_eol=False`` (k=0 only) emits
    bare MH rows, byte-aligned per row — TIFF Compression=2 framing."""
    bits: list[str] = []
    total = 0

    def emit(code: str) -> None:
        nonlocal total
        bits.append(code)
        total += len(code)

    ref_changes: list[int] = []
    for idx, row in enumerate(rows_px):
        one_dim = k <= 0 or idx % k == 0
        if byte_align and total % 8:
            # each encoded line — EOL and tag bit included — begins at a
            # byte boundary (PDF 32000-1 /EncodedByteAlign)
            emit("0" * (8 - total % 8))
        if with_eol:
            emit(EOL)
            if k > 0:
                emit("1" if one_dim else "0")
        for code in (_encode_row_1d(row, columns) if one_dim
                     else _encode_row_2d(row, ref_changes, columns)):
            emit(code)
        ref_changes = _changes(row)
    if with_eol:
        for _ in range(6):  # RTC
            emit(EOL)
            if k > 0:
                emit("1")
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
