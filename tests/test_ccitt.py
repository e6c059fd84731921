"""CCITT Group 4 (T.6) codec: hand-derived bitstream vectors (mode
decisions worked out on paper from T.4/T.6, independent of the encoder),
structural prefix-freeness of the public code tables, and randomized
round-trips including make-up-chain run lengths."""

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
    decode_g4,
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


def test_pdf_ccitt_integration_and_g3_honesty():
    # Through the full PDF parse: dims + exact closed-form mean, the
    # BlackIs1 sample inversion, and byte-aligned rows. A /K 0 (G3)
    # stream must stay decoded=False — metadata-only honesty.
    from crawspark.oracle.pdfparse import (
        extract_pdf_images,
        make_pdf_with_ccitt,
    )

    for b1, align in ((False, False), (True, False), (False, True)):
        doc = make_pdf_with_ccitt(24, 12, x0=2, bw=6, y0=3, bh=4,
                                  black_is_1=b1, byte_align=align)
        rec = extract_pdf_images(doc.decode("latin-1"))[0]
        assert rec["decoded"] and rec["filter"] == "CCITTFaxDecode"
        assert (rec["width"], rec["height"]) == (24, 12)
        bf = (6 * 4) / (24 * 12)
        want = 255.0 * bf if b1 else 255.0 * ((24 * 12 - 24) / (24 * 12))
        assert rec["mean_r"] == want
    g3 = make_pdf_with_ccitt(24, 12, 2, 6, 3, 4).replace(
        b"/K -1", b"/K 0")
    rec = extract_pdf_images(g3.decode("latin-1"))[0]
    assert not rec["decoded"] and rec["mean_r"] == -1.0
