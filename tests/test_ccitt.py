"""CCITT Group 4 (T.6) and Group 3 (T.4) codecs: hand-derived bitstream
vectors (mode decisions and run codes worked out on paper from T.4/T.6,
independent of the encoder), structural prefix-freeness of the public
code tables, and randomized round-trips across every K class and
framing (EOL / byte-aligned / bare-MH)."""

from __future__ import annotations

import random

from crawspark.oracle.ccittcodec import (
    BLACK_CODES,
    EOFB,
    EXT_CODES,
    MODE_HORIZ,
    MODE_PASS,
    MODE_V,
    WHITE_CODES,
    decode_g3,
    decode_g4,
    encode_g3,
    encode_g4,
)

W, B = 1, 0


def _pack(bitstr: str) -> bytes:
    bitstr += "0" * (-len(bitstr) % 8)
    return bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))


def _row(*px) -> bytes:
    return bytes(px)


def test_tables_are_prefix_free():
    # A transcription typo in a Huffman table usually breaks the prefix
    # property — check every colour's combined terminating+makeup+ext set.
    for table in ({**WHITE_CODES, **EXT_CODES},
                  {**BLACK_CODES, **EXT_CODES}):
        codes = sorted(table.values(), key=len)
        assert len(set(codes)) == len(codes)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a), (a, b)
    # 2D mode set incl. both horizontal-extension prefixes is prefix-free
    modes = [MODE_PASS, MODE_HORIZ] + list(MODE_V.values())
    for i, a in enumerate(sorted(modes, key=len)):
        for b in sorted(modes, key=len)[i + 1:]:
            assert not b.startswith(a), (a, b)


def test_hand_vector_horizontal_and_v0():
    # 8x2, both rows WWBBWWWW. Row 1 vs the imaginary white line:
    # horizontal (b1=8 far right) with runs white-2 + black-2, then V0.
    # Row 2 vs row 1: three V0s (changes align exactly).
    bits = (MODE_HORIZ + WHITE_CODES[2] + BLACK_CODES[2] + MODE_V[0]
            + MODE_V[0] + MODE_V[0] + MODE_V[0] + EOFB)
    want = [_row(W, W, B, B, W, W, W, W)] * 2
    assert decode_g4(_pack(bits), columns=8, rows=2) == want
    assert encode_g4(want, columns=8) == _pack(bits)


def test_hand_vector_pass_mode():
    # Row 1 WBBWWWWW (changes 1,3); row 2 all white. Decoding row 2:
    # b1=1, b2=3 < a1=8 -> PASS consumes the black run, then V0 at 8.
    bits = (MODE_HORIZ + WHITE_CODES[1] + BLACK_CODES[2] + MODE_V[0]
            + MODE_PASS + MODE_V[0] + EOFB)
    want = [_row(W, B, B, W, W, W, W, W),
            _row(W, W, W, W, W, W, W, W)]
    assert decode_g4(_pack(bits), columns=8, rows=2) == want
    assert encode_g4(want, columns=8) == _pack(bits)


def test_hand_vector_vertical_left():
    # Row 1 WWWWBBWW (changes 4,6); row 2 WWWBBBWW (changes 3,6):
    # VL1 (a1=3 = b1-1), then V0 (6=6), then V0 (8=8).
    bits = (MODE_HORIZ + WHITE_CODES[4] + BLACK_CODES[2] + MODE_V[0]
            + MODE_V[-1] + MODE_V[0] + MODE_V[0] + EOFB)
    want = [_row(W, W, W, W, B, B, W, W),
            _row(W, W, W, B, B, B, W, W)]
    assert decode_g4(_pack(bits), columns=8, rows=2) == want
    assert encode_g4(want, columns=8) == _pack(bits)


def test_roundtrip_random_bitmaps():
    rng = random.Random(406)
    for cols, rows in ((8, 4), (63, 7), (128, 5), (331, 3)):
        img = []
        for _ in range(rows):
            row = bytearray()
            color = W
            while len(row) < cols:
                run = min(rng.randint(1, cols), cols - len(row))
                row += bytes([color]) * run
                color ^= 1
            img.append(bytes(row))
        data = encode_g4(img, cols)
        assert decode_g4(data, cols, rows=rows) == img
        # EOFB lets the decoder stop without a row count too
        assert decode_g4(data, cols) == img


def test_roundtrip_makeup_chains():
    # Runs that need make-up codes: 64..1728 band, the 1792..2560
    # extended band, and >2560 chained 2560s.
    for cols in (200, 1900, 2600, 6000):
        img = [bytes([W]) * cols,
               bytes([B]) * cols,
               bytes([W]) * 70 + bytes([B]) * (cols - 70)]
        data = encode_g4(img, cols)
        assert decode_g4(data, cols, rows=3) == img


def test_byte_align_and_malformed():
    img = [_row(W, W, B, B, W, W, W, W), _row(B, B, B, B, W, W, W, W)]
    data = encode_g4(img, 8, byte_align=True)
    assert decode_g4(data, 8, rows=2, byte_align=True) == img
    # malformed: an unknown code path must yield None, not hang
    assert decode_g4(b"\x00\x00\x00\x00", 8, rows=2) is None
    # an empty stream cannot satisfy a requested row count
    assert decode_g4(b"", 8, rows=1) is None
    # bare EOFB is a valid zero-row stream
    assert decode_g4(_pack(EOFB), 8) == []


def test_pdf_ccitt_integration():
    # Through the full PDF parse: dims + exact closed-form mean, the
    # BlackIs1 sample inversion, byte-aligned rows, and every /K class
    # (-1 = G4, 0 = G3 1D, 2/4 = G3 mixed).
    from crawspark.oracle.pdfparse import (
        extract_pdf_images,
        make_pdf_with_ccitt,
    )

    for k in (-1, 0, 2, 4):
        for b1, align in ((False, False), (True, False), (False, True)):
            doc = make_pdf_with_ccitt(24, 12, x0=2, bw=6, y0=3, bh=4,
                                      black_is_1=b1, byte_align=align, k=k)
            rec = extract_pdf_images(doc.decode("latin-1"))[0]
            assert rec["decoded"] and rec["filter"] == "CCITTFaxDecode"
            assert (rec["width"], rec["height"]) == (24, 12)
            bf = (6 * 4) / (24 * 12)
            want = 255.0 * bf if b1 else 255.0 * ((24 * 12 - 24)
                                                  / (24 * 12))
            assert rec["mean_r"] == want, (k, b1, align)
    # a G4 bitstream mislabeled /K 0 must not produce wrong pixels: the
    # MH decode either fails or the dims gate rejects it
    g3 = make_pdf_with_ccitt(24, 12, 2, 6, 3, 4).replace(
        b"/K -1", b"/K 0")
    rec = extract_pdf_images(g3.decode("latin-1"))[0]
    assert not rec["decoded"] and rec["mean_r"] == -1.0


# --- Group 3 (T.4) ----------------------------------------------------------

def test_g3_hand_vector_1d():
    # Hand-derived from the T.4 tables: EOL (eleven 0s + 1), then
    # white-3 = 1000, black-5 = 0011 for an 8-wide row; a second row
    # starting black needs the zero-length white run 00110101 first:
    # black-4 = 011, then white-4 = 1011.
    bits = ("000000000001" + "1000" + "0011"
            + "000000000001" + "00110101" + "011" + "1011")
    rows = decode_g3(_pack(bits), 8, rows=2, k=0)
    assert rows == [_row(W, W, W, B, B, B, B, B),
                    _row(B, B, B, B, W, W, W, W)]


def test_g3_hand_vector_extended_makeup():
    # white-1800 = makeup-1792 (00000001000) + terminating-8 (10011)
    bits = "000000000001" + "00000001000" + "10011"
    rows = decode_g3(_pack(bits), 1800, rows=1, k=0)
    assert rows == [bytes([W]) * 1800]


def test_g3_hand_vector_mixed_2d():
    # K>0: EOL + tag. Row 0 (tag 1, 1D): white-3 black-5. Row 1
    # (tag 0, 2D) identical to row 0: V0 at b1=3, V0 at b1=8 — bits 11.
    bits = ("000000000001" + "1" + "1000" + "0011"
            + "000000000001" + "0" + "1" + "1")
    want = _row(W, W, W, B, B, B, B, B)
    assert decode_g3(_pack(bits), 8, rows=2, k=2) == [want, want]


def test_g3_hand_vector_rtc_stops_without_rowcount():
    # one 1D row then RTC (six EOLs): rows=None must stop at the RTC
    bits = ("000000000001" + "1000" + "0011") + "000000000001" * 6
    assert decode_g3(_pack(bits), 8, k=0) == [_row(W, W, W, B, B, B, B, B)]


def test_g3_roundtrips_all_k_and_framings():
    rng = random.Random(1404)
    for cols, nrows in ((8, 4), (63, 7), (128, 5)):
        img = []
        for _ in range(nrows):
            row = bytearray()
            color = W
            while len(row) < cols:
                run = min(rng.randint(1, cols), cols - len(row))
                row += bytes([color]) * run
                color ^= 1
            img.append(bytes(row))
        for k in (0, 1, 2, 4):
            for align in (False, True):
                data = encode_g3(img, cols, k=k, byte_align=align)
                assert decode_g3(data, cols, rows=nrows, k=k,
                                 byte_align=align) == img
                # RTC termination without a row count
                assert decode_g3(data, cols, k=k, byte_align=align) == img
        # TIFF Compression=2 framing: no EOLs, byte-aligned MH rows
        data = encode_g3(img, cols, k=0, byte_align=True, with_eol=False)
        assert decode_g3(data, cols, rows=nrows, byte_align=True) == img


def test_g3_malformed():
    assert decode_g3(b"\xff\xff\xff", 8, rows=1, k=0) is None  # bad MH code
    assert decode_g3(b"", 8, rows=1, k=0) == []  # empty: no rows decodable
    # mixed mode requires EOL+tag between lines
    one_row = encode_g3([_row(W, W, W, B, B, B, B, B)], 8, k=0,
                        with_eol=False)
    assert decode_g3(one_row + one_row, 8, rows=2, k=2) is None
