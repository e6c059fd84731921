"""TIFF pixel codec + PNG Adam7 + GIF interlace/local-palette tests.

Spec-anchored hand vectors first (the r4/r5 lesson: encoder+decoder
pairs can share a spec error; worked examples typed from the published
spec cannot), then exhaustive roundtrips across the variant grid.
"""
import random
import struct


# ---------------------------------------------------------------------------
# PackBits — TIFF 6.0 §9
# ---------------------------------------------------------------------------


def test_packbits_spec_worked_example():
    # The exact worked example from TIFF 6.0 Section 9 ("PackBits
    # Compression"): 24 unpacked bytes <-> 15 packed bytes.
    from crawspark.oracle.imagemeta import packbits_decode, packbits_encode

    raw = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(enc, len(raw)) == raw
    assert packbits_encode(raw) == enc


def test_packbits_noop_and_bounds():
    from crawspark.oracle.imagemeta import packbits_decode

    # -128 (0x80) is a no-op byte per spec; decoder must skip it
    assert packbits_decode(b"\x80\x00A\x80\xffB", 3) == b"ABB"
    # truncated literal run and truncated repeat are rejected
    assert packbits_decode(b"\x05AB", 6) is None
    assert packbits_decode(b"\xfe", 3) is None
    # short output (stream ends early) is rejected
    assert packbits_decode(b"\x00A", 2) is None


def test_packbits_random_roundtrip():
    from crawspark.oracle.imagemeta import packbits_decode, packbits_encode

    rng = random.Random(23)
    for n in (0, 1, 2, 127, 128, 129, 300, 1000):
        # mix of runs and noise so both coding modes appear
        data = bytes(rng.choice((rng.randrange(256), 7, 7))
                     for _ in range(n))
        assert packbits_decode(packbits_encode(data), n) == data, n
        # long constant run crosses the 128-byte repeat limit
        run = bytes([rng.randrange(256)]) * n
        assert packbits_decode(packbits_encode(run), n) == run, n


# ---------------------------------------------------------------------------
# TIFF LZW — TIFF 6.0 §13 (same MSB-first EarlyChange=1 stream PDF
# /LZWDecode inherited; the decoder side lives in oracle/pdfparse and is
# pinned there by the PDF 32000-1 §7.4.4.2 worked example)
# ---------------------------------------------------------------------------


def test_tiff_lzw_encoder_matches_spec_vector():
    # "-----A---B" -> codes 256 45 258 258 65 259 66 257 at 9 bits
    # (PDF 32000-1 §7.4.4.2 / TIFF 6.0 §13 share the format). The
    # encoder must produce the exact published byte stream.
    from crawspark.oracle.imagemeta import tiff_lzw_encode

    assert tiff_lzw_encode(b"-----A---B") == bytes(
        [0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])


def test_tiff_lzw_roundtrip_through_pinned_decoder():
    # Random high-entropy streams force width growth 9->12 and the
    # 4094-entry table reset; decode via the independently spec-pinned
    # pdfparse._lzw_decode.
    from crawspark.oracle.imagemeta import tiff_lzw_encode
    from crawspark.oracle.pdfparse import _lzw_decode

    rng = random.Random(31)
    for n in (0, 1, 260, 5000, 12000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decode(tiff_lzw_encode(data)) == data, n
    # compressible stream (gradient rows) exercises multi-byte phrases
    grad = bytes(((x + 2 * y) % 256)
                 for y in range(40) for x in range(30))
    assert _lzw_decode(tiff_lzw_encode(grad)) == grad


# ---------------------------------------------------------------------------
# TIFF container decode — strips, compressions, predictor, endianness
# ---------------------------------------------------------------------------


def _exp_rgb(w, h):
    return ((w - 1) / 2 + (h - 1), (h - 1) / 2, (w - 1) / 2)


def test_tiff_pixel_roundtrip_grid():
    from crawspark.oracle.imagemeta import (
        decode_tiff_pixels,
        make_tiff_pixels,
    )

    for comp in (1, 5, 32773):
        for gray in (False, True):
            for pred in (1, 2):
                for be in (False, True):
                    w, h = 21, 13
                    got = decode_tiff_pixels(make_tiff_pixels(
                        w, h, compression=comp, gray=gray,
                        predictor=pred, big_endian=be))
                    assert got is not None, (comp, gray, pred, be)
                    gw, gh, mr, mg, mb, sample = got
                    assert (gw, gh) == (w, h)
                    if gray:
                        exp = (w - 1) / 2 + 3 * (h - 1) / 2
                        assert abs(mr - exp) < 1e-9 and mr == mg == mb
                        v = (1 + 3 * 2) % 256
                        assert sample == (v, v, v)
                    else:
                        er, eg, eb = _exp_rgb(w, h)
                        assert abs(mr - er) < 1e-9
                        assert abs(mg - eg) < 1e-9
                        assert abs(mb - eb) < 1e-9
                        assert sample == (5, 2, 1)


def test_tiff_single_and_ragged_strips():
    # rows_per_strip > h (single strip) and h % rows_per_strip != 0
    # (short last strip) both decode identically.
    from crawspark.oracle.imagemeta import (
        decode_tiff_pixels,
        make_tiff_pixels,
    )

    base = decode_tiff_pixels(make_tiff_pixels(10, 7, rows_per_strip=7))
    for rps in (1, 2, 3, 100):
        assert decode_tiff_pixels(
            make_tiff_pixels(10, 7, rows_per_strip=rps)) == base, rps


def test_tiff_fax_compressions():
    # Bilevel fax strips: white page with a black rectangle; means are
    # the exact closed-form area fraction. MH (comp 2), T.4 1D/2D with
    # and without fill bits (comp 3 + T4Options), T.6 (comp 4).
    from crawspark.oracle.imagemeta import decode_tiff_pixels, make_tiff_fax

    w, h, x0, bw, y0, bh = 24, 18, 5, 9, 4, 7
    exp_mean = 255 * (1 - bw * bh / (w * h))
    for comp, t4_2d, fill in ((2, False, False), (3, False, False),
                              (3, True, False), (3, True, True),
                              (4, False, False)):
        got = decode_tiff_pixels(make_tiff_fax(
            w, h, x0, bw, y0, bh, compression=comp, t4_2d=t4_2d,
            fill_align=fill))
        assert got is not None, (comp, t4_2d, fill)
        gw, gh, mr, mg, mb, sample = got
        assert (gw, gh) == (w, h)
        assert abs(mr - exp_mean) < 1e-9 and mr == mg == mb
        # pixel (1,2) is outside the rectangle -> white -> 255
        assert sample == (255, 255, 255)


def test_tiff_decode_rejections():
    from crawspark.oracle.imagemeta import (
        decode_tiff_pixels,
        make_png_pixels,
        make_tiff_pixels,
    )

    assert decode_tiff_pixels(b"not a tiff") is None
    assert decode_tiff_pixels(make_png_pixels(8, 8)) is None
    # truncated strip data
    good = make_tiff_pixels(16, 9)
    assert decode_tiff_pixels(good[:len(good) - 10]) is None
    # unsupported bit depth: patch BitsPerSample inline (tag 258 short
    # values live in the IFD entry field for gray images)
    g = bytearray(make_tiff_pixels(8, 8, gray=True))
    i = g.find(struct.pack("<HHI", 258, 3, 1))
    assert i > 0
    g[i + 8] = 16
    assert decode_tiff_pixels(bytes(g)) is None


# ---------------------------------------------------------------------------
# PNG Adam7 — RFC 2083 §2.6
# ---------------------------------------------------------------------------


def test_adam7_pass_grid_matches_spec():
    # The canonical 8x8 pass-number diagram from RFC 2083 §2.6, typed
    # from the spec (1-indexed pass that owns each pixel).
    from crawspark.oracle.imagemeta import ADAM7

    spec = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    got = [[0] * 8 for _ in range(8)]
    for p, (x0, y0, dx, dy) in enumerate(ADAM7, start=1):
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                assert got[y][x] == 0, "pass overlap"
        # fill after the overlap check so double-assign is caught
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                got[y][x] = p
    assert got == spec


def test_png_adam7_decodes_identically_to_sequential():
    from crawspark.oracle.imagemeta import (
        decode_png_pixels,
        make_png_pixels,
        parse_image_dims,
    )

    for w, h in ((64, 32), (7, 5), (33, 17), (8, 8)):
        seq = decode_png_pixels(make_png_pixels(w, h, interlace=False))
        il = decode_png_pixels(make_png_pixels(w, h, interlace=True))
        assert seq is not None and seq == il, (w, h)
    # dims parser still reads the interlaced header
    assert parse_image_dims(make_png_pixels(20, 10, interlace=True)) \
        == ("png", 20, 10)


def test_png_adam7_degenerate_sizes_skip_empty_passes():
    # For w or h < the pass grid origin, some Adam7 passes contain zero
    # pixels and contribute no bytes at all (not even a filter byte).
    from crawspark.oracle.imagemeta import decode_png_pixels, make_png_pixels

    for w, h in ((1, 1), (1, 8), (8, 1), (2, 3), (3, 2), (4, 4)):
        seq = decode_png_pixels(make_png_pixels(w, h, interlace=False))
        il = decode_png_pixels(make_png_pixels(w, h, interlace=True))
        assert seq is not None and seq == il, (w, h)


# ---------------------------------------------------------------------------
# GIF interlace + local color tables — GIF89a §20-21, Appendix E
# ---------------------------------------------------------------------------


def test_gif_interlace_row_order_spec_vector():
    # Appendix E four-pass order: every 8th from 0, every 8th from 4,
    # every 4th from 2, every 2nd from 1.
    from crawspark.oracle.imagemeta import gif_interlace_rows

    assert gif_interlace_rows(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert gif_interlace_rows(16) == [
        0, 8, 4, 12, 2, 6, 10, 14, 1, 3, 5, 7, 9, 11, 13, 15]
    assert gif_interlace_rows(1) == [0]
    # permutation property at arbitrary heights
    for h in (2, 3, 7, 37):
        assert sorted(gif_interlace_rows(h)) == list(range(h))


def test_gif_interlace_and_local_palette_variants():
    from crawspark.oracle.imagemeta import decode_gif_pixels, make_gif_pixels

    for w, h in ((64, 32), (7, 5), (40, 20), (2, 3)):
        base = decode_gif_pixels(make_gif_pixels(w, h))
        assert base is not None
        for il in (False, True):
            for lp in (False, True):
                got = decode_gif_pixels(
                    make_gif_pixels(w, h, interlace=il, local_palette=lp))
                assert got == base, (w, h, il, lp)


def test_gif_local_palette_overrides_global():
    # Build a GIF that carries BOTH tables: global entries scrambled,
    # local correct. Per GIF89a §21 the local table must win — a decoder
    # using the global one shifts every channel value by 1.
    from crawspark.oracle.imagemeta import decode_gif_pixels, make_gif_pixels

    local = make_gif_pixels(10, 6, local_palette=True)
    assert local[13] == 0x2c  # sanity: no global table -> descriptor at 13
    # splice a wrong global table in: set the global-color-table flag
    # and insert 256 entries of (i+1, i, i)
    wrong = bytearray()
    for i in range(256):
        wrong += bytes(((i + 1) % 256, i, i))
    patched = (local[:10] + b"\xf7" + local[11:13] + bytes(wrong)
               + local[13:])
    got = decode_gif_pixels(bytes(patched))
    assert got == decode_gif_pixels(local)


def test_gif_paletteless_rejected():
    # neither global nor local color table -> undecodable
    from crawspark.oracle.imagemeta import decode_gif_pixels, make_gif_pixels

    g = make_gif_pixels(8, 8, local_palette=True)
    # clear the local-color-table flag without removing the table bytes:
    # the decoder then sees palette bytes as LZW garbage or no palette
    desc = g.find(b"\x2c")
    patched = bytearray(g)
    patched[desc + 9] &= 0x40  # drop LCT flag (keep interlace bit only)
    assert decode_gif_pixels(bytes(patched)) is None


def test_tiff_lzw_eoi_width_at_widen_boundary():
    # EarlyChange boundary regression (r5 review): the final pending
    # phrase catches the decoder's table up to the encoder's next_code,
    # so when that lands exactly on 2^w - 1 the decoder widens BEFORE
    # reading the EOI and the encoder must emit it one bit wider. The
    # seed-7 blob prefixes below land the final append on 511/1023/2047
    # (appends 253/765/1789); the pre-fix encoder emitted a 10/11-bit
    # read as garbage at lengths 772 and 1814.
    import random

    from crawspark.oracle.imagemeta import tiff_lzw_encode
    from crawspark.oracle.pdfparse import _lzw_decode

    rng = random.Random(7)
    blob = bytes(rng.randrange(256) for _ in range(2000))
    for boundary_len in (254, 772, 1814):
        data = blob[:boundary_len]
        assert _lzw_decode(tiff_lzw_encode(data)) == data, boundary_len
