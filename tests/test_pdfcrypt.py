"""PDF standard security handler (oracle/pdfcrypt.py).

Public hand vectors first (RFC 6229 keystream + the well-known RC4
plaintext/ciphertext triples — bytes from published sources, NOT from
our builder), then the spec-algorithm structure, then end-to-end
encrypt→extract parity and the reject paths.
"""

from __future__ import annotations

import random

from crawspark.oracle.pdfcrypt import (
    PAD,
    compute_key,
    compute_o,
    compute_u,
    decrypt_objects,
    encrypt_pdf,
    make_plain_pdf,
    object_key,
    rc4,
)
from crawspark.oracle.pdfparse import _scan_objects, extract_pdf_text


def test_rc4_public_vectors():
    # RFC 6229 §2: 40-bit key 0x0102030405, keystream offset 0.
    assert rc4(bytes([1, 2, 3, 4, 5]), bytes(16)) == bytes.fromhex(
        "b2396305f03dc027ccc3524a0a1118a8")
    # The widely-published plaintext/ciphertext triples.
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("BBF316E8D940AF0AD3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021BF0420")
    assert rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45A01F645FC35B383552544B9BF5")
    # symmetry
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_algorithm_structure():
    # Algorithm 3/5 self-consistency: the key derived from the empty
    # user password must validate the /U entry built from it.
    ident = b"\x11\x22" * 8
    for rev, key_len in ((2, 5), (3, 16)):
        o = compute_o(b"owner", b"", rev, key_len)
        key = compute_key(b"", o, -44, ident, rev, key_len)
        assert len(key) == key_len
        u = compute_u(key, ident, rev)
        # a WRONG user password derives a different key → different /U
        key2 = compute_key(b"wrong", o, -44, ident, rev, key_len)
        assert compute_u(key2, ident, rev)[:16] != u[:16]
    # Algorithm 1: the object key varies with the object number and is
    # capped at 16 bytes even for 128-bit file keys
    fk = bytes(range(16))
    assert object_key(fk, 1, 0) != object_key(fk, 2, 0)
    assert len(object_key(fk, 1, 0)) == 16
    assert len(object_key(bytes(5), 1, 0)) == 10  # 40-bit: 5 + 5
    # the PAD constant is the spec's 32 bytes (spot anchor points)
    assert len(PAD) == 32 and PAD[0] == 0x28 and PAD[-1] == 0x7A


def test_encrypted_pdf_extracts_identically():
    # Both revisions, both framings, strings with escapes — the
    # encrypted twin must extract EXACTLY the plaintext's pages.
    for seed in range(12):
        d = seed
        pages = [[f"doc {d} page {p} (line) \\{j}"
                  for j in range(2 + (d + p) % 3)]
                 for p in range(1 + d % 3)]
        raw = make_plain_pdf(pages, flate=d % 2 == 0)
        want = extract_pdf_text(raw.decode("latin-1"))
        assert want == ["\n".join(ls) for ls in pages]
        enc = encrypt_pdf(raw, rev=2 if d % 3 == 0 else 3)
        assert enc != raw
        # ciphertext really is opaque: the plaintext words are gone
        assert b"page" not in enc.split(b"stream\n", 1)[1].split(
            b"\nendstream")[0]
        assert extract_pdf_text(enc.decode("latin-1")) == want


def test_corpus_pdfs_survive_encryption():
    # The rng-driven corpus builder (flate / ASCIIHex / ASCII85 chains)
    # through the same transform.
    from crawspark.corpus import make_pdf

    for seed in range(9):
        rng = random.Random(seed)
        plain = make_pdf(rng, "en", ascii_filter=("", "hex", "a85")[seed % 3])
        want = extract_pdf_text(plain)
        enc = encrypt_pdf(plain.encode("latin-1"), rev=2 + seed % 2)
        assert extract_pdf_text(enc.decode("latin-1")) == want


def test_unopenable_and_unsupported_reject_not_mush():
    pages = [["only line"]]
    raw = make_plain_pdf(pages)
    enc = bytearray(encrypt_pdf(raw, rev=3))
    # corrupt /U: a real (non-empty) user password we do not have
    i = enc.find(b"/U <")
    enc[i + 4:i + 6] = b"00" if enc[i + 4:i + 6] != b"00" else b"11"
    assert extract_pdf_text(bytes(enc).decode("latin-1")) == []
    # /V 4 without any /CF crypt-filter dictionary: reject, never
    # emit ciphertext (the data is RC4 but claims a V4 handler with
    # no /CFM to say which cipher)
    aes = encrypt_pdf(raw, rev=3).replace(b"/V 2 /R 3", b"/V 4 /R 4")
    assert extract_pdf_text(aes.decode("latin-1")) == []
    # decrypt_objects reports whether it ran
    data = encrypt_pdf(raw, rev=3)
    objs = _scan_objects(data)
    assert decrypt_objects(data, objs) is True
    objs2 = _scan_objects(raw)
    assert decrypt_objects(raw, objs2) is False


def test_string_escape_symmetry_under_cr_ciphertext():
    # r5 review: the escape side wrote CR as '\r' but the unescape side
    # did not reverse it — keystream alignment shifted and the string
    # tail garbled whenever RC4 ciphertext contained 0x0D. Round-trip
    # dict strings under many object keys so CR/LF escapes are
    # genuinely exercised.
    from crawspark.oracle.pdfcrypt import (
        _encrypt_strings,
        _unescape_literal,
        object_key,
    )

    hits = 0
    for seed in range(60):
        key = object_key(bytes(range(16)), seed, 0)
        fn = lambda d, _k=key: rc4(_k, d)  # noqa: E731
        body = b"<< /Title (The quick brown fox jumps over 0123456789) >>"
        enc = _encrypt_strings(body, fn)
        hits += b"\\r" in enc or b"\\n" in enc
        assert _encrypt_strings(enc, fn) == body, seed
    assert hits > 5  # the escape path really ran
    # escaped control/octal sequences in the PLAIN input survive as
    # raw bytes (canonical re-escape may differ in form, not value)
    key = object_key(bytes(range(16)), 3, 0)
    fn = lambda d: rc4(key, d)  # noqa: E731
    body = b"(a\\r b\\n c\\t d\\101 e\\\\ f\\( g)"
    twice = _encrypt_strings(_encrypt_strings(body, fn), fn)
    assert _unescape_literal(twice[1:-1]) == _unescape_literal(body[1:-1])


def test_encrypt_pdf_refuses_trailerless_input():
    import pytest

    from crawspark.oracle.pdfcrypt import encrypt_pdf, make_plain_pdf

    raw = make_plain_pdf([["x"]])
    no_trailer = raw[:raw.index(b"trailer")]
    with pytest.raises(ValueError):
        encrypt_pdf(no_trailer, rev=3)


# ---------------------------------------------------------------------------
# AES (oracle/aes.py) — FIPS-197 / SP 800-38A public vectors first
# ---------------------------------------------------------------------------


def test_aes_fips197_appendix_c_vectors():
    from crawspark.oracle.aes import AES

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, ct_hex in cases:
        aes = AES(bytes.fromhex(key_hex))
        ct = aes.encrypt_block(pt)
        assert ct.hex() == ct_hex
        assert aes.decrypt_block(ct) == pt


def test_aes_cbc_sp800_38a_and_padding():
    import pytest

    from crawspark.oracle.aes import cbc_decrypt, cbc_encrypt

    # SP 800-38A F.2.1/F.2.2 (CBC-AES128), all four blocks
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    data = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710")
    ct = cbc_encrypt(key, iv, data, pad=False)
    assert ct.hex() == (
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
        "73bed6b8e3c1743b7116e69e22229516"
        "3ff1caa1681fac09120eca307586e1a7")
    assert cbc_decrypt(key, iv, ct, unpad=False) == data
    # PKCS#7 round-trip at every remainder incl. the full extra block
    for n in range(0, 33):
        d = bytes(range(n))
        assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, d)) == d
    # malformed inputs reject as None, never raise
    assert cbc_decrypt(key, iv, b"short") is None
    assert cbc_decrypt(key, iv, b"") is None
    bad = bytearray(cbc_encrypt(key, iv, b"x"))
    bad[-1] ^= 0xFF  # breaks the padding byte
    assert cbc_decrypt(key, iv, bytes(bad)) is None
    with pytest.raises(ValueError):
        cbc_encrypt(key, iv, b"odd length!", pad=False)
    with pytest.raises(ValueError):
        cbc_encrypt(b"bad key len", iv, b"")


def test_hash_r6_structure():
    from crawspark.oracle.pdfcrypt import hash_r6

    h = hash_r6(b"", b"salt8byt", b"")
    assert len(h) == 32
    assert h == hash_r6(b"", b"salt8byt", b"")  # deterministic
    assert h != hash_r6(b"", b"other8by", b"")
    assert h != hash_r6(b"pw", b"salt8byt", b"")
    assert h != hash_r6(b"", b"salt8byt", b"u" * 48)


def test_r6_material_roundtrip_and_rejects():
    import hashlib

    from crawspark.oracle.pdfcrypt import r6_file_key, r6_material

    fk = hashlib.sha256(b"some file key").digest()
    mat = r6_material(fk, p=-44, seed=b"\x07")
    got = r6_file_key(mat["U"], mat["UE"], mat["Perms"], -44)
    assert got == fk
    # wrong (non-empty) user password
    assert r6_file_key(mat["U"], mat["UE"], mat["Perms"], -44,
                       user_pw=b"nope") is None
    # tampered validation hash
    bad_u = bytes(32) + mat["U"][32:]
    assert r6_file_key(bad_u, mat["UE"], mat["Perms"], -44) is None
    # tampered /Perms (integrity block) and mismatched /P
    assert r6_file_key(mat["U"], mat["UE"], bytes(16), -44) is None
    assert r6_file_key(mat["U"], mat["UE"], mat["Perms"], -99) is None
    # absent /Perms is tolerated (validation is /U + /UE only)
    assert r6_file_key(mat["U"], mat["UE"], None, -44) == fk


def test_aesv2_and_aesv3_extract_identically():
    import struct

    for d in range(8):
        pages = [[f"doc {d} page {p} (line) \\{j}"
                  for j in range(2 + (d + p) % 3)]
                 for p in range(1 + d % 3)]
        raw = make_plain_pdf(pages, flate=d % 2 == 0)
        want = ["\n".join(ls) for ls in pages]
        for rev in (4, 6):
            enc = encrypt_pdf(raw, rev=rev,
                              doc_id=struct.pack("<Q", d) * 2,
                              r6_seed=bytes([d % 2]))
            assert enc != raw
            # ciphertext really is opaque
            assert b"page" not in enc.split(b"stream\n", 1)[1].split(
                b"\nendstream")[0]
            assert extract_pdf_text(enc.decode("latin-1")) == want, (d, rev)


def test_aes_corpus_pdfs_survive_encryption():
    from crawspark.corpus import make_pdf

    for seed in range(6):
        rng = random.Random(seed)
        plain = make_pdf(rng, "en", ascii_filter=("", "hex", "a85")[seed % 3])
        want = extract_pdf_text(plain)
        enc = encrypt_pdf(plain.encode("latin-1"), rev=4 if seed % 2 else 6,
                          r6_seed=b"\x01")
        assert extract_pdf_text(enc.decode("latin-1")) == want


def test_r5_interim_and_tampered_r6_reject_not_mush():
    raw = make_plain_pdf([["secret text"]])
    enc = encrypt_pdf(raw, rev=6, r6_seed=b"\x03")
    # the withdrawn /R 5 interim scheme: reject
    r5 = enc.replace(b"/V 5 /R 6", b"/V 5 /R 5")
    assert extract_pdf_text(r5.decode("latin-1")) == []
    # tampered /U validation hash: a real user password we don't have
    i = enc.find(b"/U <")
    bad = bytearray(enc)
    bad[i + 4:i + 6] = b"00" if bad[i + 4:i + 6] != b"00" else b"11"
    assert extract_pdf_text(bytes(bad).decode("latin-1")) == []
    # the happy path still opens
    assert extract_pdf_text(enc.decode("latin-1")) == ["secret text"]
