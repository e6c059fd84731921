"""PDF standard security handler (PDF 32000-1 §7.6.3) — RC4 variants.

Encrypted-with-empty-user-password PDFs are everywhere in a real crawl
(the "you can read it but not edit it" mode): the document is openable
by anyone, but every string and stream is RC4-enciphered with a key
derived from the /Encrypt dictionary, so a text extractor that ignores
/Encrypt sees ciphertext mush. This module implements, from the spec
and from scratch:

- RC4 (the bare stream cipher; keystream pinned against the public
  RFC 6229 test vectors in tests/test_pdfcrypt.py),
- Algorithm 2 (file encryption key from the padded user password,
  /O, /P and /ID, with the 50-fold MD5 strengthening of revision 3),
- Algorithm 3 (/O entry), Algorithms 4/5 (/U entry, rev 2 and 3),
- Algorithm 1 (per-object key: MD5(key + objnum[3 LE] + gennum[2 LE])),
- ``encrypt_pdf``: transform a plaintext synthetic PDF into its
  encrypted twin (streams + literal strings enciphered, /Encrypt and
  /ID appended to the trailer),
- ``decrypt_objects``: the parser-side hook — given the scanned object
  map and trailer, derive the key and decipher every stream/string in
  place (used by pdfparse.extract_pdf_text).

Scope: /Filter /Standard, /V 1 (40-bit) and /V 2 (128-bit), /R 2 and
3 — the RC4 family — plus, with the from-scratch FIPS-197 block
cipher in oracle/aes.py, the AES handlers:

- /V 4 /R 4 with /CFM /AESV2 (AES-128-CBC, 16-byte IV prefix,
  RFC 2898 padding; per-object key = MD5(key + objnum + gennum +
  "sAlT") per §7.6.2 Algorithm 1 step b) and /CFM /V2 (RC4 under
  crypt filters — same Algorithm 1 keys as /V 2),
- /V 5 /R 6 (PDF 2.0 / Adobe Extension Level 3): AES-256-CBC with
  the SHA-2 family hardened hash (Algorithm 2.B), /U//UE validation
  and key unwrap (Algorithms 8/11), /O//OE (Algorithm 9), and the
  /Perms integrity block (Algorithm 10) — the file key is used
  directly for every object (no per-object derivation in V5).

Unsupported revisions (/R 5 — the withdrawn interim AES-256 scheme)
are still honestly rejected (extractor returns [] rather than mush).
"""

from __future__ import annotations

import functools
import hashlib
import re
import struct

from crawspark.oracle.aes import (
    cbc_decrypt,
    cbc_encrypt,
    ecb_decrypt_block,
    ecb_encrypt_block,
)

# §7.6.3.3: the 32-byte padding string (values from the spec, Table 21
# context) appended/truncating passwords to exactly 32 bytes.
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4: KSA + PRGA. Symmetric (encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out[n] = byte ^ s[(s[i] + s[j]) % 256]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_o(owner_pw: bytes, user_pw: bytes, rev: int,
              key_len: int) -> bytes:
    """Algorithm 3: the /O entry (owner password validation bytes)."""
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_len]
    o = rc4(key, _pad_pw(user_pw))
    if rev >= 3:
        # 19 further RC4 passes with the key XORed by the round number
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_key(user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
                rev: int, key_len: int) -> bytes:
    """Algorithm 2: the file encryption key."""
    m = hashlib.md5()
    m.update(_pad_pw(user_pw))
    m.update(o_entry)
    m.update(struct.pack("<i", p))  # /P as SIGNED 32-bit little-endian
    m.update(id0)
    h = m.digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_len]).digest()
    return h[:key_len]


def compute_u(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (rev 2) / Algorithm 5 (rev 3): the /U entry."""
    if rev == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding


def object_key(file_key: bytes, num: int, gen: int,
               aes: bool = False) -> bytes:
    """Algorithm 1: per-object key. For AESV2 the extra 4 bytes
    0x73 41 6C 54 ("sAlT") enter the MD5 (§7.6.2 step b)."""
    ext = struct.pack("<I", num)[:3] + struct.pack("<H", gen)
    if aes:
        ext += b"sAlT"
    h = hashlib.md5(file_key + ext).digest()
    return h[:min(len(file_key) + 5, 16)]


# ---------------------------------------------------------------------------
# revision 6 (AES-256) key machinery — ISO 32000-2 §7.6.4.3.3/4
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def hash_r6(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B: the SHA-2 family hardened hash. Start from
    SHA-256(pw+salt+udata); each round AES-128-CBC-encrypts 64 copies
    of (pw+K+udata) under K's first 16 bytes (IV = next 16) and picks
    SHA-256/384/512 by the first 16 ciphertext bytes mod 3; stop after
    round 64 once E's last byte <= round - 32. Cached — the per-batch
    generator + validator hit the same (pw, salt, udata) triples."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    e_last = 0
    while i < 64 or e_last > i - 32:
        k1 = (pw + k[:32] + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        e_last = e[-1]
        i += 1
    return k[:32]


def r6_material(file_key: bytes, *, user_pw: bytes = b"",
                owner_pw: bytes = b"owner", p: int = -44,
                seed: bytes = b"") -> dict[str, bytes]:
    """Writer side: /U //UE (Algorithm 8), /O //OE (Algorithm 9) and
    /Perms (Algorithm 10) for a chosen 32-byte file key. Salts are
    derived deterministically from ``seed`` (the spec says random;
    determinism keeps the synthetic corpus reproducible and the
    validator never assumes otherwise)."""
    if len(file_key) != 32:
        raise ValueError("revision 6 file keys are 32 bytes")
    vs = hashlib.md5(b"vs" + seed).digest()[:8]
    ks = hashlib.md5(b"ks" + seed).digest()[:8]
    u = hash_r6(user_pw, vs, b"") + vs + ks
    ue = cbc_encrypt(hash_r6(user_pw, ks, b""), bytes(16), file_key,
                     pad=False)
    ovs = hashlib.md5(b"ovs" + seed).digest()[:8]
    oks = hashlib.md5(b"oks" + seed).digest()[:8]
    o = hash_r6(owner_pw, ovs, u) + ovs + oks
    oe = cbc_encrypt(hash_r6(owner_pw, oks, u), bytes(16), file_key,
                     pad=False)
    perms_blk = (struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"Tadb"
                 + hashlib.md5(b"rnd" + seed).digest()[:4])
    perms = ecb_encrypt_block(file_key, perms_blk)
    return {"U": u, "UE": ue, "O": o, "OE": oe, "Perms": perms}


def r6_file_key(u: bytes, ue: bytes, perms: bytes | None, p: int,
                user_pw: bytes = b"") -> bytes | None:
    """Reader side (Algorithms 11 + 2.A user-password path): validate
    the password against /U, unwrap the file key from /UE, and check
    the /Perms integrity block. None on any mismatch."""
    if u is None or ue is None or len(u) < 48 or len(ue) != 32:
        return None
    vs, ks = u[32:40], u[40:48]
    if hash_r6(user_pw, vs, b"") != u[:32]:
        return None
    fk = cbc_decrypt(hash_r6(user_pw, ks, b""), bytes(16), ue,
                     unpad=False)
    if fk is None:
        return None
    if perms is not None and len(perms) == 16:
        blk = ecb_decrypt_block(fk, perms)
        if blk[9:12] != b"adb" or blk[:4] != struct.pack("<i", p):
            return None
    return fk


# ---------------------------------------------------------------------------
# generator side — encrypt a plaintext synthetic PDF
# ---------------------------------------------------------------------------

_RE_TRAILER = re.compile(rb"trailer\s*<<")



# PDF 32000-1 §7.3.4.2 literal-string escapes. The two halves MUST be
# exact inverses (r5 review: the escape side wrote CR as '\\r' but the
# unescape side did not reverse it, shifting the RC4 keystream and
# garbling the string tail whenever ciphertext contained 0x0D); this
# mirrors pdfparse._unescape_b exactly so every reader agrees.
_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
            b"b": b"\x08", b"f": b"\x0c",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESC_MAP:
                out += _ESC_MAP[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def _escape_literal(data: bytes) -> bytes:
    # backslash first, then delimiters, then the EOL bytes a reader
    # would normalize (§7.3.4.2: raw CR/CRLF in a literal reads as LF)
    return (data.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(").replace(b")", b"\\)")
            .replace(b"\r", b"\\r").replace(b"\n", b"\\n"))


def _encrypt_strings(body: bytes, fn) -> bytes:
    """Transform literal strings in a dictionary region through the
    cipher callable ``fn`` (not used inside stream payloads — those
    are enciphered whole)."""
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == 0x28:  # '(' — scan the literal respecting escapes/nesting
            depth, j = 1, i + 1
            while j < len(body) and depth:
                if body[j] == 0x5C:
                    j += 2
                    continue
                if body[j] == 0x28:
                    depth += 1
                elif body[j] == 0x29:
                    depth -= 1
                j += 1
            plain = _unescape_literal(body[i + 1:j - 1])
            enc = fn(plain)
            out += b"(" + _escape_literal(enc) + b")"
            i = j
        else:
            out.append(c)
            i += 1
    return bytes(out)


_RE_LENGTH_DIRECT = re.compile(rb"(/Length\s+)(\d+)(?![0-9])(?!\s+0\s+R)")


def _rewrite_length(head: bytes, n: int) -> bytes:
    """AES changes the payload size (IV prefix + block padding), so the
    stream dict's direct /Length must track it — both pdfparse and any
    conforming reader frame the stream by /Length first."""
    return _RE_LENGTH_DIRECT.sub(b"\\g<1>" + str(n).encode("ascii"),
                                 head, count=1)


def _recipher_body(body: bytes, fn) -> bytes:
    """Recipher an object body through ``fn``: the stream payload
    (framed exactly as pdfparse._stream_bytes frames it — /Length
    first, textual endstream fallback) plus the dictionary's literal
    strings; /Length is rewritten when the cipher changes the size.
    The generator and the parser share this one function (RC4 passes a
    symmetric fn; AES passes encrypt or decrypt closures)."""
    from crawspark.oracle.pdfparse import _RE_STREAM_KW, _stream_bytes

    km = _RE_STREAM_KW.search(body)
    if km is None:
        return _encrypt_strings(body, fn)
    payload = _stream_bytes(body)
    if payload is None:
        return body
    new = fn(payload)
    head = _rewrite_length(_encrypt_strings(body[:km.start()], fn),
                           len(new))
    return head + b"stream\n" + new + b"\nendstream\n"


def _aes_enc_fn(okey: bytes, iv: bytes):
    return lambda d: iv + cbc_encrypt(okey, iv, d)


def _aes_dec_fn(okey: bytes):
    def fn(d: bytes) -> bytes:
        if len(d) < 16:
            return b""
        pt = cbc_decrypt(okey, d[:16], d[16:])
        return pt if pt is not None else b""
    return fn


def encrypt_pdf(data: bytes, *, rev: int = 3, key_len: int = 16,
                owner_pw: bytes = b"owner", p: int = -44,
                doc_id: bytes = b"\xde\xad\xbe\xef" * 4,
                r6_seed: bytes = b"") -> bytes:
    """Encrypted twin of a plaintext PDF: every object's stream payload
    and dictionary literal strings are enciphered under the handler's
    per-object key; /Encrypt + /ID are appended to the trailer. The
    user password is EMPTY (the ubiquitous crawl case). rev=2 implies
    the 40-bit /V 1 handler; rev=3 the 128-bit /V 2 one; rev=4 the
    /V 4 crypt-filter handler with /CFM /AESV2 (AES-128-CBC); rev=6
    the /V 5 AES-256 handler (file key derived from doc_id; salt
    families from ``r6_seed`` so the hardened hash caches across a
    corpus batch)."""
    if rev == 2:
        key_len = 5
    if rev == 6:
        key_len = 32
        key = hashlib.sha256(b"filekey" + doc_id).digest()
        mat = r6_material(key, owner_pw=owner_pw, p=p, seed=r6_seed)
        o, u = mat["O"], mat["U"]
    else:
        o = compute_o(owner_pw, b"", rev, key_len)
        key = compute_key(b"", o, p, doc_id, rev, key_len)
        u = compute_u(key, doc_id, rev)

    # walk objects with the /Length-aware scan (raw flate payloads can
    # legitimately contain "N G obj"/"endobj" byte sequences — the same
    # trap pdfparse._scan_objects closes)
    from crawspark.oracle.pdfparse import _RE_OBJ_HDR, _object_body_at

    out = bytearray()
    pos = 0
    max_num = 0
    while True:
        m = _RE_OBJ_HDR.search(data, pos)
        if m is None:
            break
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        body = _object_body_at(data, m.end())
        if rev in (2, 3):
            okey = object_key(key, num, gen)
            fn = (lambda d, _k=okey: rc4(_k, d))
        else:
            okey = (key if rev == 6
                    else object_key(key, num, gen, aes=True))
            # deterministic per-object IV (the spec says random; any
            # value decrypts — the reader takes the 16-byte prefix)
            iv = hashlib.md5(b"iv %d %d " % (num, gen) + doc_id).digest()
            fn = _aes_enc_fn(okey, iv)
        out += data[pos:m.end()] + _recipher_body(body, fn)
        pos = m.end() + len(body)
        if data[pos:pos + 6] == b"endobj":
            out += b"endobj"
            pos += 6
    out += data[pos:]

    enc_num = max_num + 1
    if rev == 4:
        extra = (" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                 "/Length 16 >> >> /StmF /StdCF /StrF /StdCF")
        v = 4
    elif rev == 6:
        extra = (f" /O <{mat['O'].hex()}> /U <{mat['U'].hex()}>"
                 f" /OE <{mat['OE'].hex()}> /UE <{mat['UE'].hex()}>"
                 f" /Perms <{mat['Perms'].hex()}>"
                 " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                 "/Length 32 >> >> /StmF /StdCF /StrF /StdCF")
        v = 5
    else:
        extra = ""
        v = 1 if rev == 2 else 2
    ou_part = ("" if rev == 6
               else f"/O <{o.hex()}> /U <{u.hex()}> ")
    enc_obj = (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V {v} /R {rev} "
        f"/Length {key_len * 8} /P {p} {ou_part}{extra.lstrip()} "
        ">>\nendobj\n").encode("latin-1")
    idhex = doc_id.hex().encode("ascii")
    enc_trailer = (b" /Encrypt %d 0 R /ID [<%s> <%s>] "
                   % (enc_num, idhex, idhex))
    tm = _RE_TRAILER.search(out)
    if tm is None:
        # no textual trailer (xref-stream layout): without the /Encrypt
        # insert point the output would be undetectable ciphertext —
        # refuse rather than emit mush (r5 review finding)
        raise ValueError("encrypt_pdf requires a textual trailer "
                         "dictionary to carry /Encrypt")
    out[tm.end():tm.end()] = enc_trailer
    out[tm.start():tm.start()] = enc_obj
    return bytes(out)


# ---------------------------------------------------------------------------
# parser side — decrypt the scanned object map in place
# ---------------------------------------------------------------------------

_RE_ENC_REF = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_RE_ID = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")


def _field_int(body: bytes, name: bytes, default: int) -> int:
    m = re.search(rb"/" + name + rb"\s+(-?\d+)", body)
    return int(m.group(1)) if m else default


def _field_hex(body: bytes, name: bytes) -> bytes | None:
    m = re.search(rb"/" + name + rb"\s*<([0-9A-Fa-f]+)>", body)
    if m:
        return bytes.fromhex(m.group(1).decode("ascii"))
    m = re.search(rb"/" + name + rb"\s*\(", body)
    if m:  # literal-string form of /O//U
        i = m.end()
        depth, j = 1, i
        out = bytearray()
        while j < len(body) and depth:
            c = body[j]
            if c == 0x5C and j + 1 < len(body):
                nxt = body[j + 1]
                out.append({0x6E: 10, 0x72: 13, 0x74: 9}.get(nxt, nxt))
                j += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if not depth:
                    break
            out.append(c)
            j += 1
        return bytes(out)
    return None


_RE_CFM = re.compile(rb"/CFM\s*/(\w+)")


def file_key_from_encrypt(data: bytes, objs: dict[int, bytes]):
    """(file_key, enc_obj_num, mode) when the trailer names a SUPPORTED
    /Standard /Encrypt dictionary and the empty user password opens it
    (checked against /U); None otherwise. mode is 'rc4' (Algorithm 1
    RC4 keys — /V 1/2 and /V 4 with /CFM /V2), 'aesv2' (/V 4 AES-128
    with the sAlT key extension) or 'aes256' (/V 5 /R 6 — the file
    key is used directly per object)."""
    em = _RE_ENC_REF.search(data)
    if not em:
        return None
    enc_num = int(em.group(1))
    body = objs.get(enc_num)
    if body is None or b"/Standard" not in body:
        return None
    v = _field_int(body, b"V", 0)
    rev = _field_int(body, b"R", 0)
    p = _field_int(body, b"P", -1)

    if v == 5:
        if rev != 6:
            return None  # /R 5 is the withdrawn interim scheme: reject
        key = r6_file_key(_field_hex(body, b"U"), _field_hex(body, b"UE"),
                          _field_hex(body, b"Perms"), p)
        if key is None:
            return None  # real user password, or tampered /Perms
        return key, enc_num, "aes256"

    if v == 4:
        cm = _RE_CFM.search(body)
        if cm is None:
            return None
        cfm = cm.group(1)
        if cfm == b"AESV2":
            mode = "aesv2"
        elif cfm == b"V2":
            mode = "rc4"  # crypt-filter RC4: same Algorithm 1 keys
        else:
            return None
        if rev not in (3, 4):
            return None
        key_len = max(5, min(16, _field_int(body, b"Length", 128) // 8))
    elif v in (1, 2) and rev in (2, 3):
        mode = "rc4"
        bits = _field_int(body, b"Length", 40)
        key_len = 5 if v == 1 else max(5, min(16, bits // 8))
    else:
        return None  # unknown handler: reject, never emit mush

    o = _field_hex(body, b"O")
    u = _field_hex(body, b"U")
    im = _RE_ID.search(data)
    id0 = bytes.fromhex(im.group(1).decode("ascii")) if im else b""
    if o is None or u is None:
        return None
    key = compute_key(b"", o, p, id0, rev, key_len)
    expect_u = compute_u(key, id0, rev)
    got, want = (u[:16], expect_u[:16]) if rev >= 3 else (u, expect_u)
    if got != want:
        return None  # a real (non-empty) user password — cannot open
    return key, enc_num, mode


def decrypt_objects(data: bytes, objs: dict[int, bytes]) -> bool:
    """If the document is encrypted with a supported handler, decipher
    every object's stream payload and dictionary strings in place
    (gen 0 — the scan keys objects by number alone). XRef streams are
    never encrypted (§7.5.8.2) and the /Encrypt dict itself is skipped.
    Returns True when decryption ran."""
    got = file_key_from_encrypt(data, objs)
    if got is None:
        return False
    key, enc_num, mode = got
    for num, body in list(objs.items()):
        if num == enc_num or (b"/Type" in body and b"/XRef" in body):
            continue
        if mode == "rc4":
            fn = (lambda d, _k=object_key(key, num, 0): rc4(_k, d))
        elif mode == "aesv2":
            fn = _aes_dec_fn(object_key(key, num, 0, aes=True))
        else:  # aes256: file key directly, no per-object derivation
            fn = _aes_dec_fn(key)
        objs[num] = _recipher_body(body, fn)
    return True


def make_plain_pdf(pages: list[list[str]], flate: bool = False) -> bytes:
    """Deterministic plaintext text PDF (corpus.make_pdf's object
    layout without the rng): one content stream per page, one Tj line
    per entry — extract_pdf_text returns exactly
    ["\\n".join(lines) for lines in pages]. The closed-form twin the
    encrypted-PDF oracle recomputes in SQL."""
    import zlib

    objs: list[bytes] = []
    page_ids = [3 + 2 * p for p in range(len(pages))]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>"
        "\nendobj\n".encode("latin-1"))
    for lines, pid in zip(pages, page_ids):
        cid = pid + 1
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            esc = (line.replace("\\", r"\\").replace("(", r"\(")
                   .replace(")", r"\)"))
            ops.append(f"({esc}) Tj" if j == 0 else f"0 -14 TD ({esc}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        filt = b""
        if flate:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"{pid} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            ">>\nendobj\n".encode("latin-1"))
        objs.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (cid, filt, len(stream))
            + stream + b"\nendstream\nendobj\n")
    return (b"%PDF-1.4\n" + b"".join(objs)
            + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
