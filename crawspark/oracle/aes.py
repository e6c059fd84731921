"""AES (FIPS-197) from scratch — the block cipher the AESV2/AESV3 PDF
security handlers need and the environment doesn't ship.

Everything here is derived from the public spec: the S-box is computed
from GF(2^8) arithmetic (§5.1.1: multiplicative inverse in GF(2^8)
followed by the affine transform), the round function uses the
standard T-table formulation (each T[i] fuses SubBytes+ShiftRows+
MixColumns for one byte position), and the key schedule is §5.2.
Correctness is pinned against the FIPS-197 Appendix C known-answer
vectors and the NIST SP 800-38A CBC vectors in tests/test_pdfcrypt.py.

Scope: AES-128/192/256 block encrypt/decrypt, CBC with PKCS#7 padding
(what PDF §7.6.2 specifies for AESV2/AESV3 stream content), CBC with
no padding (the R6 hash and the /UE//OE key wraps are exact-multiple
payloads), and single-block ECB (the /Perms entry).

Pure Python is fast enough here: encrypted-PDF payloads are ~1 KB and
the revision-6 hash's CBC chains are a few hundred blocks; the T-table
round costs ~5 µs/block in CPython.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# GF(2^8) groundwork → S-box → T-tables (computed once at import)
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B  # the AES reduction polynomial x^8+x^4+x^3+x+1
    return a & 0xFF


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses via exp/log tables over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    exp[255] = exp[0]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = [0] * 256
    for a in range(256):
        b = inv(a)
        # affine transform (§5.1.1): b ^= rotl(b,1..4) ^ 0x63
        r = b
        for k in range(1, 5):
            r ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[a] = r ^ 0x63
    inv_sbox = [0] * 256
    for a, s in enumerate(sbox):
        inv_sbox[s] = a
    return sbox, inv_sbox


SBOX, INV_SBOX = _build_sbox()

# Encrypt T-tables: T0[x] = (2s, s, s, 3s) packed big-endian per §5.1's
# MixColumns matrix column; T1..T3 are byte rotations.
_T0 = []
for _s in SBOX:
    _w = (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    _T0.append(_w)
_T1 = [((w >> 8) | ((w & 0xFF) << 24)) & 0xFFFFFFFF for w in _T0]
_T2 = [((w >> 16) | ((w & 0xFFFF) << 16)) & 0xFFFFFFFF for w in _T0]
_T3 = [((w >> 24) | ((w & 0xFFFFFF) << 8)) & 0xFFFFFFFF for w in _T0]

# Decrypt T-tables over InvSbox with the InvMixColumns matrix (14,9,13,11)
_D0 = []
for _a in range(256):
    _s = INV_SBOX[_a]
    _w = ((_gmul(_s, 14) << 24) | (_gmul(_s, 9) << 16)
          | (_gmul(_s, 13) << 8) | _gmul(_s, 11))
    _D0.append(_w)
_D1 = [((w >> 8) | ((w & 0xFF) << 24)) & 0xFFFFFFFF for w in _D0]
_D2 = [((w >> 16) | ((w & 0xFFFF) << 16)) & 0xFFFFFFFF for w in _D0]
_D3 = [((w >> 24) | ((w & 0xFFFFFF) << 8)) & 0xFFFFFFFF for w in _D0]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[int]:
    """§5.2 key expansion → list of 4(Nr+1) big-endian 32-bit words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = ((SBOX[(t >> 24) & 0xFF] << 24) | (SBOX[(t >> 16) & 0xFF] << 16)
                 | (SBOX[(t >> 8) & 0xFF] << 8) | SBOX[t & 0xFF])
            t ^= _RCON[i // nk - 1] << 24
        elif nk == 8 and i % nk == 4:
            t = ((SBOX[(t >> 24) & 0xFF] << 24) | (SBOX[(t >> 16) & 0xFF] << 16)
                 | (SBOX[(t >> 8) & 0xFF] << 8) | SBOX[t & 0xFF])  # SubWord
        w.append(w[i - nk] ^ t)
    return w


class AES:
    """One expanded key, reusable across blocks (CBC chains reuse it)."""

    def __init__(self, key: bytes):
        self._ek = _expand_key(key)
        self._nr = len(self._ek) // 4 - 1
        # decrypt key schedule: reversed rounds with InvMixColumns
        # applied to the inner round keys (equivalent inverse cipher,
        # FIPS-197 §5.3.5)
        ek = self._ek
        nr = self._nr
        dk = list(ek)
        for rnd in range(1, nr):
            for c in range(4):
                w = ek[4 * rnd + c]
                b0, b1, b2, b3 = (w >> 24) & 0xFF, (w >> 16) & 0xFF, \
                    (w >> 8) & 0xFF, w & 0xFF
                dk[4 * (nr - rnd) + c] = (
                    (_gmul(b0, 14) ^ _gmul(b1, 11) ^ _gmul(b2, 13)
                     ^ _gmul(b3, 9)) << 24
                    | (_gmul(b0, 9) ^ _gmul(b1, 14) ^ _gmul(b2, 11)
                       ^ _gmul(b3, 13)) << 16
                    | (_gmul(b0, 13) ^ _gmul(b1, 9) ^ _gmul(b2, 14)
                       ^ _gmul(b3, 11)) << 8
                    | (_gmul(b0, 11) ^ _gmul(b1, 13) ^ _gmul(b2, 9)
                       ^ _gmul(b3, 14)))
        for c in range(4):  # outer round keys swap untouched
            dk[c] = ek[4 * nr + c]
            dk[4 * nr + c] = ek[c]
        self._dk = dk

    def encrypt_block(self, block: bytes) -> bytes:
        ek, nr = self._ek, self._nr
        s0 = int.from_bytes(block[0:4], "big") ^ ek[0]
        s1 = int.from_bytes(block[4:8], "big") ^ ek[1]
        s2 = int.from_bytes(block[8:12], "big") ^ ek[2]
        s3 = int.from_bytes(block[12:16], "big") ^ ek[3]
        t0, t1, t2, t3 = _T0, _T1, _T2, _T3
        for rnd in range(1, nr):
            k = 4 * rnd
            n0 = (t0[(s0 >> 24) & 0xFF] ^ t1[(s1 >> 16) & 0xFF]
                  ^ t2[(s2 >> 8) & 0xFF] ^ t3[s3 & 0xFF] ^ ek[k])
            n1 = (t0[(s1 >> 24) & 0xFF] ^ t1[(s2 >> 16) & 0xFF]
                  ^ t2[(s3 >> 8) & 0xFF] ^ t3[s0 & 0xFF] ^ ek[k + 1])
            n2 = (t0[(s2 >> 24) & 0xFF] ^ t1[(s3 >> 16) & 0xFF]
                  ^ t2[(s0 >> 8) & 0xFF] ^ t3[s1 & 0xFF] ^ ek[k + 2])
            n3 = (t0[(s3 >> 24) & 0xFF] ^ t1[(s0 >> 16) & 0xFF]
                  ^ t2[(s1 >> 8) & 0xFF] ^ t3[s2 & 0xFF] ^ ek[k + 3])
            s0, s1, s2, s3 = n0, n1, n2, n3
        k = 4 * nr
        sb = SBOX
        o0 = ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
              | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ ek[k]
        o1 = ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
              | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ ek[k + 1]
        o2 = ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
              | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ ek[k + 2]
        o3 = ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
              | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ ek[k + 3]
        return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
                + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))

    def decrypt_block(self, block: bytes) -> bytes:
        dk, nr = self._dk, self._nr
        s0 = int.from_bytes(block[0:4], "big") ^ dk[0]
        s1 = int.from_bytes(block[4:8], "big") ^ dk[1]
        s2 = int.from_bytes(block[8:12], "big") ^ dk[2]
        s3 = int.from_bytes(block[12:16], "big") ^ dk[3]
        d0, d1, d2, d3 = _D0, _D1, _D2, _D3
        for rnd in range(1, nr):
            k = 4 * rnd
            # inverse cipher rotates the OTHER way: row i shifts right
            n0 = (d0[(s0 >> 24) & 0xFF] ^ d1[(s3 >> 16) & 0xFF]
                  ^ d2[(s2 >> 8) & 0xFF] ^ d3[s1 & 0xFF] ^ dk[k])
            n1 = (d0[(s1 >> 24) & 0xFF] ^ d1[(s0 >> 16) & 0xFF]
                  ^ d2[(s3 >> 8) & 0xFF] ^ d3[s2 & 0xFF] ^ dk[k + 1])
            n2 = (d0[(s2 >> 24) & 0xFF] ^ d1[(s1 >> 16) & 0xFF]
                  ^ d2[(s0 >> 8) & 0xFF] ^ d3[s3 & 0xFF] ^ dk[k + 2])
            n3 = (d0[(s3 >> 24) & 0xFF] ^ d1[(s2 >> 16) & 0xFF]
                  ^ d2[(s1 >> 8) & 0xFF] ^ d3[s0 & 0xFF] ^ dk[k + 3])
            s0, s1, s2, s3 = n0, n1, n2, n3
        k = 4 * nr
        ib = INV_SBOX
        o0 = ((ib[(s0 >> 24) & 0xFF] << 24) | (ib[(s3 >> 16) & 0xFF] << 16)
              | (ib[(s2 >> 8) & 0xFF] << 8) | ib[s1 & 0xFF]) ^ dk[k]
        o1 = ((ib[(s1 >> 24) & 0xFF] << 24) | (ib[(s0 >> 16) & 0xFF] << 16)
              | (ib[(s3 >> 8) & 0xFF] << 8) | ib[s2 & 0xFF]) ^ dk[k + 1]
        o2 = ((ib[(s2 >> 24) & 0xFF] << 24) | (ib[(s1 >> 16) & 0xFF] << 16)
              | (ib[(s0 >> 8) & 0xFF] << 8) | ib[s3 & 0xFF]) ^ dk[k + 2]
        o3 = ((ib[(s3 >> 24) & 0xFF] << 24) | (ib[(s2 >> 16) & 0xFF] << 16)
              | (ib[(s1 >> 8) & 0xFF] << 8) | ib[s0 & 0xFF]) ^ dk[k + 3]
        return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
                + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))


# ---------------------------------------------------------------------------
# modes
# ---------------------------------------------------------------------------


def _xor16(a: bytes, b: bytes) -> bytes:
    return (int.from_bytes(a, "big") ^ int.from_bytes(b, "big")).to_bytes(
        16, "big")


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, *,
                pad: bool = True) -> bytes:
    """AES-CBC. With pad=True, PKCS#7 (§7.6.2's RFC 2898 padding: 1–16
    bytes, each the pad length). With pad=False, data must be a block
    multiple (the R6 hash / key-wrap cases)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs a 16-byte multiple")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = aes.encrypt_block(_xor16(data[i:i + 16], prev))
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, *,
                unpad: bool = True) -> bytes | None:
    """Inverse of cbc_encrypt. Returns None on malformed input (length
    not a block multiple, or invalid padding when unpad=True) — the
    parser's never-raises contract turns garbage into a reject."""
    if len(data) % 16 or (unpad and not data):
        return None
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += _xor16(aes.decrypt_block(blk), prev)
        prev = blk
    if not unpad:
        return bytes(out)
    n = out[-1] if out else 0
    if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
        return None
    return bytes(out[:-n])


def ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    return AES(key).encrypt_block(block)


def ecb_decrypt_block(key: bytes, block: bytes) -> bytes:
    return AES(key).decrypt_block(block)
