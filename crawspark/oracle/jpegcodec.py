"""Baseline JPEG (ITU-T T.81) codec, from the spec, zero codec deps.

Decoder: a GENERAL baseline sequential-DCT decoder — marker walk
(DQT/SOF0/DHT/DRI/SOS), canonical Huffman decode per T.81 §F.2.2.3,
EXTEND sign recovery (§F.2.2.1), run/size AC with ZRL and EOB, byte
destuffing (FF 00) and RSTn restart intervals with DC-predictor reset,
dequantization, inverse zigzag, separable float IDCT (§A.3.3) done as
one vectorized numpy tensor contraction over all blocks of a component,
sampling-factor chroma upsampling (box replication), JFIF/CCIR-601
YCbCr→RGB with round-half-up and clamping, and edge-block cropping for
dimensions that are not MCU multiples.

Encoder (`make_jpeg_pixels`): synthesizes block-constant images as
DC-only coefficient streams (the DCT of a constant 8x8 block is a lone
DC term, and quant tables of all ones keep it exact), so the decoded
pixels are closed-form predictable by a SQL oracle while still driving
the full entropy/marker path of the decoder: Huffman DC categories,
byte stuffing, optional restart intervals, and 4:4:4 or 4:2:0 MCU
interleave. The Huffman tables embedded via DHT are the T.81 Annex K
typical tables; correctness does not depend on them being the published
constants (the file carries its own tables — internal consistency is
what the round-trip pins), but using them keeps the bytes realistic.

Design notes for the oracle path: with integer Y and constant per-doc
(Cb, Cr), the color transform collapses to integer offsets
K = floor(coef*(C-128) + 0.5) applied uniformly — both numpy and DuckDB
evaluate the identical double expression, and the generator only uses
(Cb, Cr) values whose rounding margin is wide, so the per-pixel RGB is
bit-exactly reproducible in SQL. AC decoding, ZRL, EOB, restart
markers and cropping are pinned by hand-packed entropy-stream vectors
and a differential IDCT test in tests/test_jpegcodec.py.

Progressive (SOF2) decode is supported (r5): multi-scan spectral
selection + successive approximation per T.81 Annex G — shifted DC
first pass, raw-bit DC refinement, AC band scans with EOBn run-length
codes, and the AC refinement algorithm (newly-significant ±2^Al values
plus per-nonzero correction bits). Remaining honest seam:
arithmetic-coded, lossless, hierarchical and 12-bit frames are
rejected (return None).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# T.81 Annex K typical Huffman tables: (BITS[1..16], HUFFVAL).
# --------------------------------------------------------------------------

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient (T.81
# Figure 5), generated rather than typed to avoid transcription bugs.


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) with row = vertical frequency v, col = horizontal
    frequency u (libjpeg's natural order). T.81 Figure 5: the sequence
    steps RIGHT first — k=1 is (0,1), k=2 is (1,0) — so odd
    anti-diagonals run top-right→bottom-left and even ones
    bottom-left→top-right. (r5 fix: the first cut generated the
    transpose, which round-trips hid and a hand-packed refinement
    vector caught.)"""
    order = []
    for s in range(15):
        if s % 2:  # odd: from (0, s) down-left
            diag = [(j, s - j) for j in range(s + 1) if j < 8 and s - j < 8]
        else:      # even: from (s, 0) up-right
            diag = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        order.extend(diag)
    return order


ZIGZAG = _zigzag_order()

# IDCT basis M[u, x] = c(u)/2 * cos((2x+1)u*pi/16); f = M.T @ F @ M.
_IDCT_M = np.array(
    [[(math.sqrt(0.5) if u == 0 else 1.0) / 2.0
      * math.cos((2 * x + 1) * u * math.pi / 16)
      for x in range(8)] for u in range(8)])


# --------------------------------------------------------------------------
# Canonical Huffman (T.81 §C.2 code assignment, §F.2.2.3 DECODE).
# --------------------------------------------------------------------------


class _HuffTable:
    __slots__ = ("mincode", "maxcode", "valptr", "vals", "encode")

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals):
            raise ValueError("inconsistent Huffman spec")
        self.vals = list(vals)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        self.encode = {}
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            for _ in range(bits[length - 1]):
                self.encode[vals[k]] = (code, length)
                code += 1
                k += 1
            self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise ValueError("bad Huffman code")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.vals[table.valptr[length] + code - table.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 §F.2.2.1 EXTEND: map t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def _destuff_segments(data: bytes, start: int):
    """Split the entropy-coded data at RSTn markers, destuffing FF 00.
    Returns (segments, index_of_terminating_marker)."""
    segments, cur = [], bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg_pixels(payload: bytes):
    """(w, h, mean_r, mean_g, mean_b, (r, g, b) at pixel (x=1, y=2)) from
    a baseline or progressive JFIF/JPEG, or None for anything this
    decoder does not support (arithmetic, lossless, hierarchical,
    12-bit, >2x sampling factors)."""
    try:
        return _decode(payload)
    except (ValueError, EOFError, IndexError, KeyError, StopIteration,
            ZeroDivisionError, struct.error):
        return None


def _decode(payload: bytes):
    """Multi-scan marker loop: DQT/DHT/DRI accumulate, SOF0/SOF1 set a
    sequential frame, SOF2 a progressive one, and every SOS decodes its
    scan into the shared per-component coefficient stores (progressive
    scans refine them across spectral bands / bit positions per T.81
    Annex G). EOI finalizes: dequant + IDCT + upsample + color."""
    if payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) comps: list of (cid, hs, vs, tq)
    stores = None
    saw_scan = False
    i = 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 §B.1.1.2)
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
        body = payload[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq == 0:
                    tab = np.frombuffer(body[j:j + 64],
                                        dtype=np.uint8).astype(np.int32)
                    j += 64
                elif pq == 1:
                    tab = np.frombuffer(body[j:j + 128],
                                        dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    return None
                dq = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    dq[r, c] = tab[k]
                qt[tq] = dq
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / hierarchical / arithmetic modes
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            w, h, comps = frame
            if not (0 < w <= 4096 and 0 < h <= 4096):
                return None
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                return None
            if stores is None:
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                stores = [np.zeros((mcuy * vs, mcux * hs, 8, 8),
                                   dtype=np.int32)
                          for cid, hs, vs, tq in comps]
            ns = body[0]
            scan_comps = []  # (frame index, dc table id, ac table id)
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(j for j, cc in enumerate(comps) if cc[0] == cs)
                scan_comps.append((ci, tt >> 4, tt & 0x0F))
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            i = _decode_scan(payload, i + 2 + seglen, frame, scan_comps,
                             ss, se, ah, al, huff_dc, huff_ac,
                             restart_interval, stores)
            saw_scan = True
            continue
        i += 2 + seglen
    if frame is None or stores is None or not saw_scan:
        return None
    return _finalize(frame, stores, qt)


def _scan_units(frame, scan_comps):
    """Decode order for one scan: a list of MCUs, each a list of
    (component index, block_y, block_x). Interleaved scans walk the MCU
    grid with each component's vs x hs sub-blocks; a single-component
    scan is non-interleaved — its MCU is ONE block and only the
    component's real blocks (ceil(comp_dim/8)) are coded, not the dummy
    blocks the interleaved grid would pad to (T.81 §A.2.2/§A.2.3)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if len(scan_comps) == 1:
        ci = scan_comps[0][0]
        cid, hs, vs, tq = comps[ci]
        bw = -(-(-(-w * hs // hmax)) // 8)
        bh = -(-(-(-h * vs // vmax)) // 8)
        return [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]
    units = []
    for my in range(mcuy):
        for mx in range(mcux):
            unit = []
            for ci, _dc, _ac in scan_comps:
                cid, hs, vs, tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        unit.append((ci, my * vs + by, mx * hs + bx))
            units.append(unit)
    return units


def _decode_scan(payload, start, frame, scan_comps, ss, se, ah, al,
                 huff_dc, huff_ac, restart_interval, stores):
    """Decode one scan's entropy data into the coefficient stores and
    return the payload offset just past it. Handles all four
    progressive scan kinds plus sequential (ss=0, se=63, ah=al=0, where
    the DC and AC paths run back-to-back per block and the EOB-run
    arithmetic degenerates to plain per-block EOB)."""
    segments, end = _destuff_segments(payload, start)
    units = _scan_units(frame, scan_comps)
    tabs = {ci: (huff_dc.get(dc_id), huff_ac.get(ac_id))
            for ci, dc_id, ac_id in scan_comps}
    # a scan referencing an undefined Huffman table must fail cleanly
    # (return-None contract), not leak AttributeError from decode(None);
    # DC refinement reads raw bits and needs no table at all
    need_dc = ss == 0 and ah == 0
    need_ac = se > 0
    for ci, (dct, act) in tabs.items():
        if (need_dc and dct is None) or (need_ac and act is None):
            raise ValueError("scan references undefined Huffman table")
    pred = {ci: 0 for ci, _dc, _ac in scan_comps}
    eobrun = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    for ui, unit in enumerate(units):
        if restart_interval and ui and ui % restart_interval == 0:
            reader = _BitReader(next(seg_iter))
            pred = {ci: 0 for ci in pred}
            eobrun = 0
        for ci, by, bx in unit:
            block = stores[ci][by, bx]
            dct, act = tabs[ci]
            if ss == 0:
                if ah == 0:
                    t = reader.decode(dct)
                    diff = _extend(reader.read_bits(t), t)
                    pred[ci] += diff
                    block[0, 0] = pred[ci] << al
                    if se > 0:  # sequential: AC rides in the same pass
                        eobrun = _ac_first(reader, act, block, 1, se, al,
                                           eobrun)
                elif reader.read_bit():  # DC refinement: one bit/block
                    block[0, 0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(reader, act, block, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, act, block, ss, se, al, eobrun)
    return end


def _ac_first(reader, act, block, ss, se, al, eobrun):
    """First-pass AC band decode (T.81 §G.2.2): sequential run/size with
    ZRL, values scaled by 2^al, and EOBn run-length codes (s=0, r<15 →
    skip (1<<r)-1+extra FURTHER blocks; r=0 is the plain sequential
    EOB). Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        zr, zc = ZIGZAG[k]
        block[zr, zc] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, act, block, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 §G.2.3 — the
    libjpeg-structured algorithm): newly-significant coefficients
    arrive as ±2^al with s=1; every already-nonzero coefficient crossed
    (including inside EOB runs and ZRL skips) carries one correction
    bit that may add 2^al toward its sign. Returns the remaining EOB
    run."""
    p1 = 1 << al

    def correct(pos):
        v = block[pos]
        if v != 0 and reader.read_bit() and not (v & p1):
            block[pos] = v + p1 if v > 0 else v - p1

    if eobrun > 0:
        for k in range(ss, se + 1):
            correct(ZIGZAG[k])
        return eobrun - 1
    k = ss
    hit_eob = False
    while k <= se:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                hit_eob = True
                break
            # r == 15: ZRL — skip 16 zero-HISTORY coefficients
        else:
            if s != 1:
                raise ValueError("refinement size must be 1")
            newval = p1 if reader.read_bit() else -p1
        while k <= se:
            pos = ZIGZAG[k]
            v = block[pos]
            if v != 0:
                if reader.read_bit() and not (v & p1):
                    block[pos] = v + p1 if v > 0 else v - p1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            block[ZIGZAG[k]] = newval
        k += 1
    if not hit_eob:
        return 0
    # the EOB run includes THIS block: its remaining coefficients get
    # correction bits before the run starts counting further blocks
    for k2 in range(k, se + 1):
        correct(ZIGZAG[k2])
    return eobrun - 1


def _finalize(frame, stores, qt):
    """Dequant + vectorized IDCT per component, chroma upsampling,
    YCbCr→RGB, crop, channel means + sample pixel."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        coef = (stores[ci] * qt[tq][None, None]).astype(np.float64)
        # f = M.T @ F @ M over every block at once
        pix = np.einsum("ux,yvuw,wz->yvxz", _IDCT_M, coef, _IDCT_M) + 128.0
        by, bx = coef.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
    elif len(comps) == 1:
        r = g = b = planes[0]
    else:
        return None
    rgb = [np.clip(np.floor(ch + 0.5), 0, 255).astype(np.int64)
           for ch in (r, g, b)]
    npx = w * h
    means = [float(ch.sum()) / npx for ch in rgb]
    sample = (int(rgb[0][2, 1]), int(rgb[1][2, 1]), int(rgb[2][2, 1]))
    return (w, h, means[0], means[1], means[2], sample)


# --------------------------------------------------------------------------
# Encoder (DC-only block-constant images; general enough to carry the
# decoder's whole entropy/marker path).
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _dc_category(v: int) -> int:
    t = 0
    a = abs(v)
    while a:
        a >>= 1
        t += 1
    return t


def _write_dc(bw: _BitWriter, table: _HuffTable, diff: int) -> None:
    t = _dc_category(diff)
    code, length = table.encode[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def block_y(bx: int, by: int) -> int:
    """The generator's luma ramp: constant per 8x8 block, closed-form
    for the SQL oracle. Range stays well inside [0, 255] after the
    chroma offsets (|offsets| <= 36 for the (cb, cr) sets used)."""
    return 40 + 2 * (bx % 56) + 3 * (by % 24)


def make_jpeg_pixels(w: int, h: int, cb: int = 128, cr: int = 128,
                     subsample: str = "444",
                     restart_interval: int = 0) -> bytes:
    """Baseline JFIF whose 8x8 blocks are constant: luma follows
    ``block_y``, chroma is the constant (cb, cr). Quant tables are all
    ones so every coefficient survives exactly; blocks are DC-only, so
    decoded pixels equal the inputs bit-for-bit. ``subsample`` is
    '444' (Y,Cb,Cr all full-res) or '420' (chroma halved both ways,
    which box-replication upsampling reproduces exactly for constant
    chroma). ``restart_interval`` > 0 emits DRI + RSTn markers."""
    if subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
    elif subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_l = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    dc_c = _HuffTable(DC_CHR_BITS, DC_CHR_VALS)
    ac_l = _HuffTable(AC_LUM_BITS, AC_LUM_VALS)
    ac_c = _HuffTable(AC_CHR_BITS, AC_CHR_VALS)
    eob_l = ac_l.encode[0x00]
    eob_c = ac_c.encode[0x00]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))        # Tq 0, Pq 0
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))        # Tq 1
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUM_BITS, DC_LUM_VALS))
    out += _seg(0xC4, _dht_body(0, 1, DC_CHR_BITS, DC_CHR_VALS))
    out += _seg(0xC4, _dht_body(1, 0, AC_LUM_BITS, AC_LUM_VALS))
    out += _seg(0xC4, _dht_body(1, 1, AC_CHR_BITS, AC_CHR_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0, 0, 0]
    chroma_dc = [8 * (cb - 128), 8 * (cr - 128)]
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pred = [0, 0, 0]
            hs, vs = samp[0]
            for by in range(vs):
                for bx in range(hs):
                    dc = 8 * (block_y(mx * hs + bx, my * vs + by) - 128)
                    _write_dc(bw, dc_l, dc - pred[0])
                    pred[0] = dc
                    bw.write(*eob_l)
            for ci in (1, 2):
                dc = chroma_dc[ci - 1]
                _write_dc(bw, dc_c, dc - pred[ci])
                pred[ci] = dc
                bw.write(*eob_c)
            mcu_index += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# EOBn run-length symbols for progressive AC scans (s=0, r=0..14) —
# absent from the Annex K sequential tables, so progressive files carry
# this canonical table (15 symbols, all code length 4; code 1111 unused).
AC_PROG_BITS = [0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = [r << 4 for r in range(15)]


def make_progressive_jpeg_pixels(w: int, h: int, cb: int = 128,
                                 cr: int = 128,
                                 subsample: str = "444") -> bytes:
    """Progressive (SOF2) twin of ``make_jpeg_pixels``: the same
    block-constant image transmitted as EIGHT scans — interleaved DC at
    Al=1, a raw-bit DC refinement to Al=0, then two AC band scans per
    component (1–5, then 6–63) that are pure EOB runs (all AC zero). The
    decoded pixels are bit-identical to the baseline twin, so the same
    closed-form oracle pins the whole multi-scan path: successive
    approximation DC, non-interleaved AC block geometry, and EOBRUN
    accounting."""
    if subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
    elif subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_l = _HuffTable(DC_LUM_BITS, DC_LUM_VALS)
    dc_c = _HuffTable(DC_CHR_BITS, DC_CHR_VALS)
    ac_p = _HuffTable(AC_PROG_BITS, AC_PROG_VALS)
    chroma_dc = [8 * (cb - 128), 8 * (cr - 128)]

    def dc_of(ci, gby, gbx):
        if ci == 0:
            return 8 * (block_y(gbx, gby) - 128)
        return chroma_dc[ci - 1]

    def blocks_interleaved():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(samp):
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, my * vs + by, mx * hs + bx

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    out += _seg(0xC4, _dht_body(0, 0, DC_LUM_BITS, DC_LUM_VALS))
    out += _seg(0xC4, _dht_body(0, 1, DC_CHR_BITS, DC_CHR_VALS))
    out += _seg(0xC4, _dht_body(1, 0, AC_PROG_BITS, AC_PROG_VALS))

    # scan 1: interleaved DC first pass, Al=1 — codes diff of (DC >> 1)
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, (0x00 if ci == 0 else 0x10)])
    out += _seg(0xDA, sos + bytes([0, 0, 0x01]))  # Ss=0 Se=0 Ah=0 Al=1
    bw = _BitWriter()
    pred = [0, 0, 0]
    for ci, gby, gbx in blocks_interleaved():
        v = dc_of(ci, gby, gbx) >> 1  # arithmetic shift = point transform
        _write_dc(bw, dc_l if ci == 0 else dc_c, v - pred[ci])
        pred[ci] = v
    bw.flush()
    out += bw.out

    # scan 2: DC refinement to Al=0 — one raw bit per block (no Huffman)
    out += _seg(0xDA, sos + bytes([0, 0, 0x10]))  # Ss=0 Se=0 Ah=1 Al=0
    bw = _BitWriter()
    for ci, gby, gbx in blocks_interleaved():
        bw.write(dc_of(ci, gby, gbx) & 1, 1)
    bw.flush()
    out += bw.out

    # scans 3..8: per-component AC bands 1–5 and 6–63, all zero —
    # one maximal-EOBn run per scan (chunked at 32767 blocks)
    for ci, (hs, vs) in enumerate(samp):
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        nblocks = (-(-cw // 8)) * (-(-ch // 8))
        for ss, se in ((1, 5), (6, 63)):
            out += _seg(0xDA, bytes([1, ci + 1, 0x00, ss, se, 0x00]))
            bw = _BitWriter()
            left = nblocks
            while left > 0:
                run = min(left, 32767)
                r = run.bit_length() - 1
                extra = run - (1 << r)
                code, length = ac_p.encode[r << 4]
                bw.write(code, length)
                if r:
                    bw.write(extra, r)
                left -= run
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def rgb_offsets(cb: int, cr: int) -> tuple[int, int, int]:
    """The integer channel offsets the constant chroma adds to every
    pixel: K_r, K_g, K_b with K = floor(coef*(C-128) + 0.5). The SQL
    oracle evaluates the identical double expressions."""
    kr = math.floor(1.402 * (cr - 128) + 0.5)
    kg = math.floor(-0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
    kb = math.floor(1.772 * (cb - 128) + 0.5)
    return kr, kg, kb
