"""tar / tar.gz archive member scan — POSIX ustar + GNU longname,
hand-parsed from the public format definitions (no ``tarfile``
module, matching the repo's from-scratch byte-layer style).

Dataset dumps and site mirrors arrive as tarballs. The walk needs the
real mechanics:

- 512-byte header blocks: NUL-terminated ``name`` (100 B), ``size``
  as octal ASCII (12 B), ``typeflag``, ``magic='ustar'`` at offset
  257, and the ``prefix`` field (155 B) that ustar splits long paths
  into (``prefix + '/' + name``).
- Content follows the header padded to the next 512 boundary; the
  archive ends with two zero blocks.
- GNU long names: a ``typeflag='L'`` pseudo-member whose CONTENT is
  the next member's real name (paths > 255 or unsplittable).
- Header checksum: sum of header bytes with the chksum field read as
  spaces — verified, corrupt headers stop the walk.
- gzip wrapper (RFC 1952) via stdlib zlib, mtime pinned to 0 for
  byte-determinism.

``parse_tar`` returns [(member name, bytes)] for regular files.
``make_targz`` builds a deterministic archive exercising every
mechanic above (short names, a prefix-split path, a GNU-L name, and
directory entries that must be skipped).
"""

from __future__ import annotations

import gzip
import io
import zlib

_BLK = 512


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def _checksum_ok(hdr: bytes) -> bool:
    want = _octal(hdr[148:156])
    got = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
    return want == got


def ungzip(payload: bytes) -> bytes:
    """Outer-compression unwrap: gzip (RFC 1952), bzip2, xz/LZMA —
    the three stdlib codecs tarballs ship with — plus bare zlib/raw
    deflate; returns the input unchanged when it is not compressed."""
    if payload[:2] == b"\x1f\x8b":
        return gzip.decompress(payload)
    if payload[:3] == b"BZh":
        import bz2
        return bz2.decompress(payload)
    if payload[:6] == b"\xfd7zXZ\x00":
        import lzma
        return lzma.decompress(payload)
    try:
        return zlib.decompress(payload)
    except zlib.error:
        return payload


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """Regular-file members in archive order. Never raises; non-tar
    bytes yield []. Accepts a gzip-wrapped archive transparently."""
    try:
        data = ungzip(payload)
    except Exception:
        return []
    out: list[tuple[str, bytes]] = []
    pos = 0
    pending_longname: str | None = None
    while pos + _BLK <= len(data):
        hdr = data[pos:pos + _BLK]
        if hdr == b"\x00" * _BLK:
            break  # end-of-archive zero block
        if hdr[257:262] != b"ustar" or not _checksum_ok(hdr):
            return out if out else []
        size = _octal(hdr[124:136])
        typeflag = hdr[156:157]
        body = data[pos + _BLK:pos + _BLK + size]
        pos += _BLK + (size + _BLK - 1) // _BLK * _BLK
        if typeflag == b"L":  # GNU longname: body names the NEXT member
            pending_longname = body.rstrip(b"\x00").decode(
                "utf-8", "replace")
            continue
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        if pending_longname is not None:
            name = pending_longname
            pending_longname = None
        if typeflag in (b"0", b"\x00"):  # regular file
            out.append((name, body))
    return out


def _header(name: str, size: int, typeflag: bytes) -> bytes:
    nb = name.encode()
    prefix = b""
    if len(nb) > 100:
        # ustar split at a '/' so both halves fit
        cut = nb.rfind(b"/", 0, 156)
        if cut > 0 and len(nb) - cut - 1 <= 100:
            prefix, nb = nb[:cut], nb[cut + 1:]
    hdr = bytearray(_BLK)
    hdr[0:len(nb)] = nb
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}".encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"  # mtime pinned
    hdr[148:156] = b" " * 8
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[345:345 + len(prefix)] = prefix
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(hdr)


def _member(name: str, body: bytes, typeflag: bytes = b"0") -> bytes:
    pad = (-len(body)) % _BLK
    blocks = _header(name, len(body), typeflag) + body + b"\x00" * pad
    return blocks


def _gnu_long(name: str, body: bytes) -> bytes:
    nb = name.encode() + b"\x00"
    return _member("././@LongLink", nb, b"L") + _member(name[:100], body)


def tar_members_expected(doc_id: int) -> list[tuple[str, str]]:
    """Closed form of make_targz's regular-file members (name, text)."""
    d = doc_id
    out = []
    for m in range(2 + d % 3):
        text = "\n".join(f"doc {d} member {m} line {k}"
                         for k in range(1 + (d + m) % 3))
        if m == 0:
            name = f"data/shard{d}/member{m}.txt"
        elif m == 1:
            # > 100 chars total, splittable at a '/' inside 155 — the
            # ustar prefix-field path
            name = ("deep/" + "/".join(f"directory{j:02d}"
                                       for j in range(10))
                    + f"/prefix-split-{d}.txt")
        else:
            name = ("gnu-" + "x" * 140 + f"-{d}-{m}.txt")
        out.append((name, text))
    return out


def make_targz(doc_id: int) -> bytes:
    """Deterministic .tar.gz: a directory entry (skipped), a short-name
    member, a prefix-split long path, and a GNU-L longname member;
    gzip mtime pinned to 0."""
    d = doc_id
    blocks = [_member(f"data/shard{d}/", b"", b"5")]  # directory
    for name, text in tar_members_expected(d):
        body = text.encode()
        if name.startswith("gnu-"):
            blocks.append(_gnu_long(name, body))
        else:
            blocks.append(_member(name, body))
    raw = b"".join(blocks) + b"\x00" * (2 * _BLK)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# ZIP (APPNOTE.TXT) — the other dataset-dump container next to tar
# ---------------------------------------------------------------------------
# Hand-built and hand-parsed from the PKWARE APPNOTE layout (no
# ``zipfile`` module here, matching the from-scratch byte-layer style;
# the sniffer's bounded member probe is the only zipfile user). The
# walk is the CORRECT one — central directory, not local-header scan:
#
# - End Of Central Directory record (PK\x05\x06) located by scanning
#   backwards over a possible trailing comment (<= 64 KiB + 22 B).
# - Central directory entries (PK\x01\x02): compression method (0 =
#   stored, 8 = raw deflate), CRC-32, sizes, name/extra/comment field
#   lengths, and the local-header offset.
# - Each member's bytes start after its LOCAL header (PK\x03\x04),
#   whose own name/extra lengths differ from the CD's in real archives
#   (data-descriptor writers) — so both are parsed.
# - CRC-32 of the decompressed bytes is verified; mismatches and bad
#   signatures stop the walk. Directory entries (name ends '/') skip.
# - Out of scope (honestly): ZIP64, encryption, methods other than
#   0/8 — entries with an unknown method are skipped, not mis-read.

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"


def parse_zip(payload: bytes) -> list[tuple[str, bytes]]:
    """File members in central-directory order. Never raises; non-zip
    or corrupt bytes yield [] (or the members proven good so far)."""
    import struct

    tail = payload[-(0xFFFF + 22):]
    at = tail.rfind(_EOCD_SIG)
    if at < 0 or len(tail) - at < 22:
        return []
    n_entries, cd_size, cd_off = struct.unpack(
        "<HII", tail[at + 10:at + 20])
    cd = payload[cd_off:cd_off + cd_size]
    out: list[tuple[str, bytes]] = []
    pos = 0
    for _ in range(n_entries):
        if cd[pos:pos + 4] != _CD_SIG or pos + 46 > len(cd):
            return out if out else []
        (method, crc, csize, usize, nlen, xlen, clen) = struct.unpack(
            "<H4xIIIHHH", cd[pos + 10:pos + 34])
        (lfh_off,) = struct.unpack("<I", cd[pos + 42:pos + 46])
        name = cd[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + xlen + clen
        if name.endswith("/"):
            continue  # directory entry
        lfh = payload[lfh_off:lfh_off + 30]
        if len(lfh) < 30 or lfh[:4] != _LFH_SIG:
            return out if out else []
        lf_nlen, lf_xlen = struct.unpack("<HH", lfh[26:30])
        start = lfh_off + 30 + lf_nlen + lf_xlen
        raw = payload[start:start + csize]
        if len(raw) != csize:
            return out if out else []
        if method == 0:
            body = raw
        elif method == 8:
            try:
                body = zlib.decompressobj(-15).decompress(raw)
            except zlib.error:
                return out if out else []
        else:
            continue  # unknown method: skip, never mis-read
        if len(body) != usize or zlib.crc32(body) != crc:
            return out if out else []
        out.append((name, body))
    return out


def make_zip(doc_id: int, comment: bytes = b"") -> bytes:
    """Deterministic ZIP for doc ``doc_id`` exercising every mechanic
    parse_zip handles: a stored member, deflated members, a nested
    path, a directory entry to skip, and (optionally) a trailing
    archive comment that pushes the EOCD off the file tail."""
    import struct

    d = int(doc_id)
    # one source of truth for the member grammar: the closed-form helper
    # (member 0 is stored, the rest deflated)
    members: list[tuple[str, bytes, int]] = [
        (name, text.encode(), 0 if m == 0 else 8)
        for m, (name, text) in enumerate(zip_members_expected(d))]

    blob = bytearray()
    cd = bytearray()
    n_cd = 0

    def add(name: str, body: bytes, method: int,
            is_dir: bool = False) -> None:
        nonlocal n_cd
        nb = name.encode()
        data = b"" if is_dir else body
        if method == 8:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        crc = 0 if is_dir else zlib.crc32(body)
        usize = 0 if is_dir else len(body)
        off = len(blob)
        # local header: version 20, flags 0, dos time/date pinned 0
        blob.extend(_LFH_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, 0, 0, crc, len(data), usize,
            len(nb), 0) + nb + data)
        cd.extend(_CD_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, method, 0, 0, crc,
            len(data), usize, len(nb), 0, 0, 0, 0,
            0x10 if is_dir else 0, off) + nb)
        n_cd += 1

    add(f"shard{d}/", b"", 0, is_dir=True)
    for name, body, method in members:
        add(name, body, method)
    cd_off = len(blob)
    blob.extend(cd)
    blob.extend(_EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, n_cd, n_cd, len(cd), cd_off, len(comment))
        + comment)
    return bytes(blob)


def zip_members_expected(doc_id: int) -> list[tuple[str, str]]:
    """Closed form of make_zip's file members (name, text)."""
    d = int(doc_id)
    out = []
    for m in range(2 + d % 3):
        text = "\n".join(f"doc {d} member {m} line {k}"
                         for k in range(1 + (d + m) % 3))
        if m == 0:
            name = f"shard{d}/stored-member0.txt"
        elif m == 1:
            name = f"deep/nested/path/deflate-{d}.txt"
        else:
            name = f"member-{d}-{m}.txt"
        out.append((name, text))
    return out
