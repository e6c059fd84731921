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
    §A.3.3, no numpy, no shared code with the decoder."""
    def c(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    pix = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (c(u) * c(v) / 4.0 * block[u][v] * qt_natural[u][v]
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
    # progressive: flip SOF0 -> SOF2
    idx = base.find(b"\xff\xc0")
    prog = base[:idx] + b"\xff\xc2" + base[idx + 2:]
    assert decode_jpeg_pixels(prog) is None
    # 12-bit precision: patch the SOF precision byte
    deep = bytearray(base)
    deep[idx + 4] = 12
    assert decode_jpeg_pixels(bytes(deep)) is None


def test_decoder_vs_header_parser_agree_on_dims():
    from crawspark.oracle.imagemeta import parse_image_dims

    payload = make_jpeg_pixels(96, 48, 128, 128, "420", 2)
    assert parse_image_dims(payload) == ("jpeg", 96, 48)
    got = decode_jpeg_pixels(payload)
    assert (got[0], got[1]) == (96, 48)
