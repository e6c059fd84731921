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
    # unsupported AES handler (/V 4): reject, never emit ciphertext
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
        body = b"<< /Title (The quick brown fox jumps over 0123456789) >>"
        enc = _encrypt_strings(body, key)
        hits += b"\\r" in enc or b"\\n" in enc
        assert _encrypt_strings(enc, key) == body, seed
    assert hits > 5  # the escape path really ran
    # escaped control/octal sequences in the PLAIN input survive as
    # raw bytes (canonical re-escape may differ in form, not value)
    key = object_key(bytes(range(16)), 3, 0)
    body = b"(a\\r b\\n c\\t d\\101 e\\\\ f\\( g)"
    twice = _encrypt_strings(_encrypt_strings(body, key), key)
    assert _unescape_literal(twice[1:-1]) == _unescape_literal(body[1:-1])


def test_encrypt_pdf_refuses_trailerless_input():
    import pytest

    from crawspark.oracle.pdfcrypt import encrypt_pdf, make_plain_pdf

    raw = make_plain_pdf([["x"]])
    no_trailer = raw[:raw.index(b"trailer")]
    with pytest.raises(ValueError):
        encrypt_pdf(no_trailer, rev=3)
