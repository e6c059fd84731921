"""Baseline JPEG codec: closed-form round-trips for the generator path,
HAND-PACKED entropy-stream vectors for the general decoder path (AC
run/size, ZRL, negative EXTEND, custom quant tables — none of which the
DC-only generator emits, so these are independent of it), an
independent-loop reference IDCT, cropping, and rejection cases."""

from __future__ import annotations

import math
import struct

import pytest

from crawspark.oracle.jpegcodec import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    ZIGZAG,
    _BitWriter,
    _HuffTable,
    block_y,
    decode_jpeg_pixels,
    make_jpeg_pixels,
    rgb_offsets,
)


def _expected_stats(w, h, cb, cr):
    """Closed form of the generator image (w, h multiples of 8)."""
    bxn, byn = w // 8, h // 8
    kr, kg, kb = rgb_offsets(cb, cr)
    ys = [block_y(bx, by) for by in range(byn) for bx in range(bxn)]
    my = sum(ys) / len(ys)
    y0 = block_y(0, 0)
    return (w, h, my + kr, my + kg, my + kb, (y0 + kr, y0 + kg, y0 + kb))


@pytest.mark.parametrize("w,h,cb,cr,sub,ri", [
    (64, 32, 128, 128, "444", 0),
    (64, 32, 118, 138, "444", 0),
    (128, 64, 108, 148, "420", 0),
    (96, 48, 138, 118, "444", 3),
    (160, 96, 148, 108, "420", 2),
    (72, 40, 108, 108, "444", 1),
])
def test_roundtrip_closed_form(w, h, cb, cr, sub, ri):
    got = decode_jpeg_pixels(make_jpeg_pixels(w, h, cb, cr, sub, ri))
    assert got == _expected_stats(w, h, cb, cr)


def test_cropping_non_mcu_multiple():
    # 60x28: edge blocks are encoded full but cropped on decode; blocks
    # are constant, so the cropped mean weights edge blocks by their
    # surviving pixel count.
    w, h, cb, cr = 60, 28, 118, 138
    got = decode_jpeg_pixels(make_jpeg_pixels(w, h, cb, cr))
    assert got is not None and got[0] == w and got[1] == h
    kr, kg, kb = rgb_offsets(cb, cr)
    tot = cnt = 0
    for y in range(h):
        for x in range(w):
            tot += block_y(x // 8, y // 8)
            cnt += 1
    my = tot / cnt
    assert got[2] == my + kr and got[3] == my + kg and got[4] == my + kb


def test_chroma_offset_margins_guard():
    # Every (cb, cr) the registry generator can emit must keep the
    # pre-floor values of all three channel offsets >= 0.05 away from an
    # integer boundary, or float noise from the IDCT could flip a pixel.
    vals = [108, 118, 128, 138, 148]
    for cb in vals:
        for cr in vals:
            for x in (1.402 * (cr - 128) + 0.5,
                      -0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5,
                      1.772 * (cb - 128) + 0.5):
                margin = min(x - math.floor(x), math.ceil(x) - x)
                assert margin >= 0.05, (cb, cr, x)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _grayscale_jpeg(w, h, qt_zigzag, coeff_blocks):
    """Hand-assemble a single-component baseline JPEG: natural-order
    coefficient blocks are entropy-packed HERE (run/size encoding written
    independently of the production encoder, which is DC-only)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_zigzag))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS)
                + bytes(DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS)
                + bytes(AC_LUM_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    dc_t = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    ac_t = _HuffTable(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0

    def size_of(v):
        t = 0
        a = abs(v)
        while a:
            a >>= 1
            t += 1
        return t

    def put(table, sym, v, t):
        code, length = table.encode[sym]
        bw.write(code, length)
        if t:
            bw.write(v if v >= 0 else v + (1 << t) - 1, t)

    for block in coeff_blocks:
        zz = [block[r][c] for (r, c) in ZIGZAG]
        diff = zz[0] - pred
        pred = zz[0]
        put(dc_t, size_of(diff), diff, size_of(diff))
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                put(ac_t, 0xF0, 0, 0)  # ZRL
                run -= 16
            t = size_of(zz[k])
            put(ac_t, (run << 4) | t, zz[k], t)
            run = 0
        if last_nz < 63:
            put(ac_t, 0x00, 0, 0)  # EOB
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _reference_decode(qt_natural, block):
    """Independent IDCT: the textbook double loop straight from T.81
    §A.3.3, no numpy, no shared code with the decoder. Natural-order
    convention (libjpeg): block[row][col] with row = vertical frequency
    v and col = horizontal frequency u — matching T.81 Figure 5's
    zigzag, whose first step (k=1) is the HORIZONTAL frequency (0,1)."""
    def c(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    pix = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += (c(u) * c(v) / 4.0 * block[v][u] * qt_natural[v][u]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            val = math.floor(s + 128.0 + 0.5)
            pix[y][x] = min(255, max(0, val))
    return pix


def test_hand_packed_ac_vector():
    # One 8x8 block with DC=-30 (negative EXTEND), an AC at zigzag 1, a
    # 3-zero run to zigzag 5 with a negative AC, a ZRL jump to zigzag 22,
    # and a non-trivial quant table — nothing the production encoder can
    # produce.
    qt_zig = [(3 * k) % 17 + 1 for k in range(64)]
    qt_nat = [[0] * 8 for _ in range(8)]
    for k, (r, c) in enumerate(ZIGZAG):
        qt_nat[r][c] = qt_zig[k]
    block = [[0] * 8 for _ in range(8)]
    for k, v in ((0, -30), (1, 7), (5, -2), (22, 1)):
        r, c = ZIGZAG[k]
        block[r][c] = v
    payload = _grayscale_jpeg(8, 8, qt_zig, [block])
    got = decode_jpeg_pixels(payload)
    assert got is not None and got[0] == 8 and got[1] == 8
    ref = _reference_decode(qt_nat, block)
    n = sum(sum(row) for row in ref)
    assert got[2] == got[3] == got[4] == n / 64
    assert got[5] == (ref[2][1],) * 3


def test_hand_packed_multi_block_dc_prediction():
    # Two blocks exercise DC prediction across blocks and a full-AC EOB
    # on the second.
    qt_zig = [1] * 64
    qt_nat = [[0] * 8 for _ in range(8)]
    for k, (r, c) in enumerate(ZIGZAG):
        qt_nat[r][c] = 1
    b1 = [[0] * 8 for _ in range(8)]
    b1[0][0] = 96  # DC
    b2 = [[0] * 8 for _ in range(8)]
    b2[0][0] = -64
    b2[7][7] = 3  # zigzag 63: run of 62 zeros -> 3x ZRL + (14, size)
    payload = _grayscale_jpeg(16, 8, qt_zig, [b1, b2])
    got = decode_jpeg_pixels(payload)
    assert got is not None
    r1 = _reference_decode(qt_nat, b1)
    r2 = _reference_decode(qt_nat, b2)
    n = sum(sum(row) for row in r1) + sum(sum(row) for row in r2)
    assert got[2] == n / 128
    assert got[5] == (r1[2][1],) * 3


def test_random_coeff_differential():
    # Randomized blocks vs the independent reference IDCT — exact
    # integer equality after rounding (both sides are float64 and the
    # clamp/round contract is identical).
    import random

    rng = random.Random(20260817)
    qt_zig = [rng.randint(1, 24) for _ in range(64)]
    qt_nat = [[0] * 8 for _ in range(8)]
    for k, (r, c) in enumerate(ZIGZAG):
        qt_nat[r][c] = qt_zig[k]
    for _ in range(10):
        block = [[0] * 8 for _ in range(8)]
        for _ in range(rng.randint(1, 12)):
            k = rng.randint(0, 63)
            r, c = ZIGZAG[k]
            block[r][c] = rng.randint(-40, 40)
        payload = _grayscale_jpeg(8, 8, qt_zig, [block])
        got = decode_jpeg_pixels(payload)
        assert got is not None
        ref = _reference_decode(qt_nat, block)
        n = sum(sum(row) for row in ref)
        assert got[2] == n / 64, (block, got, ref)


def test_rejects_unsupported():
    base = make_jpeg_pixels(32, 16, 118, 138)
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(base[:40]) is None  # truncated in headers
    idx = base.find(b"\xff\xc0")
    # arithmetic-coded sequential: SOF0 -> SOF9
    arith = base[:idx] + b"\xff\xc9" + base[idx + 2:]
    assert decode_jpeg_pixels(arith) is None
    # lossless: SOF0 -> SOF3
    lossless = base[:idx] + b"\xff\xc3" + base[idx + 2:]
    assert decode_jpeg_pixels(lossless) is None
    # 12-bit precision: patch the SOF precision byte
    deep = bytearray(base)
    deep[idx + 4] = 12
    assert decode_jpeg_pixels(bytes(deep)) is None
    # SOF2 with a sequential full-band scan decodes identically (the
    # scan header, not the frame marker, drives the scan decoder)
    prog = base[:idx] + b"\xff\xc2" + base[idx + 2:]
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_decoder_vs_header_parser_agree_on_dims():
    from crawspark.oracle.imagemeta import parse_image_dims

    payload = make_jpeg_pixels(96, 48, 128, 128, "420", 2)
    assert parse_image_dims(payload) == ("jpeg", 96, 48)
    got = decode_jpeg_pixels(payload)
    assert (got[0], got[1]) == (96, 48)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode: encoder twins + HAND-PACKED multi-scan
# vectors for the paths the DC-only progressive encoder cannot emit
# (AC-first bands with values, AC refinement with corrections, EOBRUN
# skip/correction accounting).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h,cb,cr,sub", [
    (64, 32, 118, 138, "444"),
    (128, 64, 108, 148, "420"),
    (96, 48, 148, 108, "420"),
])
def test_progressive_equals_baseline(w, h, cb, cr, sub):
    from crawspark.oracle.jpegcodec import make_progressive_jpeg_pixels

    base = decode_jpeg_pixels(make_jpeg_pixels(w, h, cb, cr, sub))
    prog = decode_jpeg_pixels(
        make_progressive_jpeg_pixels(w, h, cb, cr, sub))
    assert prog is not None and prog == base == _expected_stats(w, h, cb, cr)


# one shared 8-codes-of-length-3 AC table for the hand-packed scans
_ACT_BITS = [0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ACT_VALS = [0x00, 0x01, 0x02, 0x10, 0x11, 0x12, 0x21, 0xF0]


def _gray_prog(w, h, qt_zigzag, scans):
    """Hand-assembled single-component SOF2 file; ``scans`` is a list of
    (Ss, Se, Ah, Al, entropy_bytes)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_zigzag))
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS)
                + bytes(DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_ACT_BITS) + bytes(_ACT_VALS))
    for ss, se, ah, al, data in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def _put_sym(bw, table, sym):
    code, length = table.encode[sym]
    bw.write(code, length)


def test_progressive_ac_refinement_hand_vector():
    # DC-first scan (Al=0, dc=16), AC-first band at Al=1 placing k1=3
    # (stored 6), then an AC REFINEMENT scan at Al=0 that corrects k1
    # (6 -> 7) and makes k3 newly significant (+1) — the refinement
    # path the production encoder never emits.
    dc_t = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    ac_t = _HuffTable(_ACT_BITS, _ACT_VALS)
    qt_zig = [1] * 64
    qt_nat = [[1] * 8 for _ in range(8)]

    bw = _BitWriter()  # scan 1: DC first, Al=0, diff=16 (cat 5)
    _put_sym(bw, dc_t, 5)
    bw.write(16, 5)
    bw.flush()
    dc_scan = bytes(bw.out)

    bw = _BitWriter()  # scan 2: AC first 1..63 at Al=1: k1 = +3, EOB
    _put_sym(bw, ac_t, 0x02)  # r=0, s=2
    bw.write(3, 2)
    _put_sym(bw, ac_t, 0x00)  # EOB
    bw.flush()
    ac_first = bytes(bw.out)

    bw = _BitWriter()  # scan 3: AC refine 1..63 Ah=1 Al=0
    _put_sym(bw, ac_t, 0x11)  # r=1 zero-history coeff passed, s=1
    bw.write(1, 1)            # sign: +1
    bw.write(1, 1)            # correction bit for k1 (6 -> 7)
    _put_sym(bw, ac_t, 0x00)  # EOB (no remaining nonzeros -> no bits)
    bw.flush()
    ac_ref = bytes(bw.out)

    payload = _gray_prog(8, 8, qt_zig, [
        (0, 0, 0, 0, dc_scan),
        (1, 63, 0, 1, ac_first),
        (1, 63, 1, 0, ac_ref),
    ])
    got = decode_jpeg_pixels(payload)
    assert got is not None
    block = [[0] * 8 for _ in range(8)]
    block[0][0] = 16
    r1, c1 = ZIGZAG[1]
    r3, c3 = ZIGZAG[3]
    block[r1][c1] = 7
    block[r3][c3] = 1
    ref = _reference_decode(qt_nat, block)
    n = sum(sum(row) for row in ref)
    assert got[2] == n / 64
    assert got[5] == (ref[2][1],) * 3


def test_progressive_eobrun_skip_and_corrections():
    # Two blocks. AC-first at Al=1: block1 sets k2=+2 (stored 4) and
    # ends with plain EOB; block2 sets k1=-1 (stored -2) + EOB. The
    # refinement scan opens with EOB r=1 (run of 2 blocks INCLUDING the
    # current): block1's k2 takes a correction bit (4 -> 5) and
    # block2's k1 takes one inside the run (-2 -> -3, toward its sign).
    dc_t = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    ac_t = _HuffTable(_ACT_BITS, _ACT_VALS)
    qt_zig = [1] * 64
    qt_nat = [[1] * 8 for _ in range(8)]

    bw = _BitWriter()  # DC first: block1 diff=8 (cat 4), block2 diff=-16
    _put_sym(bw, dc_t, 4)
    bw.write(8, 4)
    _put_sym(bw, dc_t, 5)
    bw.write(-16 + 31, 5)
    bw.flush()
    dc_scan = bytes(bw.out)

    bw = _BitWriter()  # AC first at Al=1
    _put_sym(bw, ac_t, 0x12)  # block1: r=1 (skip k1), s=2
    bw.write(2, 2)            # +2 at k2 -> stored 4
    _put_sym(bw, ac_t, 0x00)  # EOB
    _put_sym(bw, ac_t, 0x01)  # block2: r=0, s=1
    bw.write(0, 1)            # -1 at k1 -> stored -2
    _put_sym(bw, ac_t, 0x00)  # EOB
    bw.flush()
    ac_first = bytes(bw.out)

    bw = _BitWriter()  # AC refine at Al=0: EOB run of 2 blocks
    _put_sym(bw, ac_t, 0x10)  # EOBn r=1
    bw.write(0, 1)            # extra bits: run = (1<<1)+0 = 2
    bw.write(1, 1)            # correction bit, block1 k2: 4 -> 5
    bw.write(1, 1)            # correction bit, block2 k1: -2 -> -3
    bw.flush()
    ac_ref = bytes(bw.out)

    payload = _gray_prog(16, 8, qt_zig, [
        (0, 0, 0, 0, dc_scan),
        (1, 63, 0, 1, ac_first),
        (1, 63, 1, 0, ac_ref),
    ])
    got = decode_jpeg_pixels(payload)
    assert got is not None
    b1 = [[0] * 8 for _ in range(8)]
    b1[0][0] = 8
    r2, c2 = ZIGZAG[2]
    b1[r2][c2] = 5
    b2 = [[0] * 8 for _ in range(8)]
    b2[0][0] = -8
    r1, c1 = ZIGZAG[1]
    b2[r1][c1] = -3
    ref1 = _reference_decode(qt_nat, b1)
    ref2 = _reference_decode(qt_nat, b2)
    n = sum(sum(row) for row in ref1) + sum(sum(row) for row in ref2)
    assert got[2] == n / 128
    assert got[5] == (ref1[2][1],) * 3


def test_progressive_dc_successive_approximation_negative():
    # Odd NEGATIVE DC reconstructed across two scans: first scan codes
    # dc>>1 (arithmetic shift), refinement ORs in the low bit — the
    # two's-complement subtlety (-5 = ((-5>>1)<<1) | 1).
    dc_t = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    qt_zig = [1] * 64
    qt_nat = [[1] * 8 for _ in range(8)]
    dc = -5

    bw = _BitWriter()  # DC first at Al=1: diff = dc>>1 = -3 (cat 2)
    _put_sym(bw, dc_t, 2)
    bw.write(-3 + 3, 2)
    bw.flush()
    scan1 = bytes(bw.out)

    bw = _BitWriter()  # DC refinement: low bit of -5 is 1
    bw.write(dc & 1, 1)
    bw.flush()
    scan2 = bytes(bw.out)

    bw = _BitWriter()  # AC first: all zero, plain EOB
    ac_t = _HuffTable(_ACT_BITS, _ACT_VALS)
    _put_sym(bw, ac_t, 0x00)
    bw.flush()
    scan3 = bytes(bw.out)

    payload = _gray_prog(8, 8, qt_zig, [
        (0, 0, 0, 1, scan1),
        (0, 0, 1, 0, scan2),
        (1, 63, 0, 0, scan3),
    ])
    got = decode_jpeg_pixels(payload)
    assert got is not None
    block = [[0] * 8 for _ in range(8)]
    block[0][0] = dc
    ref = _reference_decode(qt_nat, block)
    assert got[2] == sum(sum(row) for row in ref) / 64


def test_zigzag_is_spec_order_and_orientation():
    # T.81 Figure 5: the zigzag's first step is RIGHT — k=1 is the
    # horizontal frequency (0,1), k=2 is (1,0) — and a lone k=1
    # coefficient must therefore produce an image that varies along x
    # and is constant along y. (Regression: the transposed order
    # round-trips cleanly through our own encoder and only a
    # spec-anchored probe like this catches it.)
    assert ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert len(ZIGZAG) == 64 and len(set(ZIGZAG)) == 64

    dc_t = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    ac_t = _HuffTable(AC_LUM_BITS, AC_LUM_VALS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS)
                + bytes(DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS)
                + bytes(AC_LUM_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    c, l = dc_t.encode[0]
    bw.write(c, l)  # DC diff 0
    c, l = ac_t.encode[0x06]
    bw.write(c, l)
    bw.write(40, 6)  # k1 = +40 (u=1: horizontal cosine)
    c, l = ac_t.encode[0x00]
    bw.write(c, l)  # EOB
    bw.flush()
    out += bw.out + b"\xff\xd9"
    got = decode_jpeg_pixels(bytes(out))
    assert got is not None
    # spec closed form at (x=1, y=2): 128 + 40*(sqrt(.5)/4)*cos(3*pi/16)
    exp = math.floor(128 + 40 * (math.sqrt(0.5) / 4)
                     * math.cos(3 * math.pi / 16) + 0.5)
    assert got[5] == (exp,) * 3
    # horizontal cosine integrates to zero across the row -> mean 128
    assert got[2] == 128.0


def test_missing_dht_returns_none_not_raise():
    # A scan referencing an undefined Huffman table must return None
    # (and keep extract_pdf_images' "never raises" contract), not leak
    # AttributeError from decoding with a missing table (r5 review
    # finding, reproduced on DHT-stripped files).
    base = make_jpeg_pixels(16, 16, 118, 138)
    out = bytearray()
    i = 0
    while i < len(base) - 1:
        if base[i] == 0xFF and base[i + 1] == 0xC4:  # strip DHT segments
            seglen = struct.unpack(">H", base[i + 2:i + 4])[0]
            i += 2 + seglen
            continue
        out.append(base[i])
        i += 1
    out.append(base[-1])
    stripped = bytes(out)
    assert decode_jpeg_pixels(stripped) is None
    from crawspark.oracle.pdfparse import (
        extract_pdf_images,
        make_pdf_with_images,
    )
    pdf = make_pdf_with_images(stripped, 16, 16, 24, 12)
    imgs = extract_pdf_images(pdf.decode("latin-1"))
    assert imgs[0]["decoded"] is False and imgs[1]["decoded"] is True
