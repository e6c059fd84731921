"""WARC (ISO 28500) and HTTP/1.1 message parsing.

Hand-authored spec vectors first (the r4/r5 lesson: a builder+parser
pair can share a spec error that round-trips hide), then round-trip
and malformed-input behavior, then the Spark file source.
"""

from __future__ import annotations

import zlib

import pytest

from crawspark.oracle import httpmsg, warc

# ---------------------------------------------------------------------------
# hand vectors — bytes written from the spec, not from our builder
# ---------------------------------------------------------------------------

# RFC 9112 §7.1.3's canonical chunked example (Wikipedia body split into
# 3 chunks, sizes in hex including a 0xE chunk), written out by hand.
CHUNKED_VECTOR = (b"HTTP/1.1 200 OK\r\n"
                  b"Content-Type: text/plain\r\n"
                  b"Transfer-Encoding: chunked\r\n"
                  b"\r\n"
                  b"4\r\nWiki\r\n"
                  b"5\r\npedia\r\n"
                  b"E\r\n in\r\n\r\nchunks.\r\n"
                  b"0\r\n"
                  b"\r\n")


def test_chunked_hand_vector():
    resp = httpmsg.parse_response(CHUNKED_VECTOR)
    assert resp is not None
    assert resp["status"] == 200
    assert resp["body"] == b"Wikipedia in\r\n\r\nchunks."


def test_chunk_extension_and_trailer_hand_vector():
    raw = (b"HTTP/1.1 200 OK\r\n"
           b"Transfer-Encoding: chunked\r\n"
           b"\r\n"
           b"5;name=val\r\nhello\r\n"   # chunk-ext must be ignored
           b"0\r\n"
           b"X-Digest: abc\r\n"          # trailer merges into headers
           b"\r\n")
    resp = httpmsg.parse_response(raw)
    assert resp["body"] == b"hello"
    assert resp["headers"]["x-digest"] == "abc"


def test_warc_record_hand_vector():
    # A minimal WARC 1.1 §4 record written by hand: the block contains a
    # CRLFCRLF ("trap\r\n\r\ntrap") so a parser that scans for
    # separators instead of honoring Content-Length splits early.
    block = b"trap\r\n\r\ntrapX"
    raw = (b"WARC/1.1\r\n"
           b"WARC-Type: resource\r\n"
           b"WARC-Record-ID: <urn:uuid:handvec>\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: https://example.com/a\r\n"
           b"Content-Type: text/plain\r\n"
           b"Content-Length: " + str(len(block)).encode() + b"\r\n"
           b"\r\n" + block + b"\r\n\r\n"
           b"WARC/1.1\r\n"
           b"WARC-Type: metadata\r\n"
           b"Content-Length: 2\r\n"
           b"\r\nok\r\n\r\n")
    recs = warc.parse_warc(raw)
    assert len(recs) == 2
    assert recs[0]["warc_type"] == "resource"
    assert recs[0]["block"] == block
    assert recs[0]["target_uri"] == "https://example.com/a"
    assert recs[1]["block"] == b"ok"


def test_gzip_member_stream_is_multi_member():
    # two independently-gzipped records concatenated (Annex C): a reader
    # that stops after the first member loses the second record.
    r1 = warc.build_record("resource", b"one", content_type="text/plain")
    r2 = warc.build_record("resource", b"two", content_type="text/plain")
    data = warc.build_warc([r1], gzip_members=True) + \
        warc.build_warc([r2], gzip_members=True)
    assert data.count(warc.GZIP_MAGIC[:2]) >= 2
    recs = warc.parse_warc(data)
    assert [r["block"] for r in recs] == [b"one", b"two"]


# ---------------------------------------------------------------------------
# round-trip + malformed behavior
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("d", [0, 1, 2, 3, 11, 42, 499])
def test_synth_roundtrip_full_chain(d):
    recs = warc.parse_warc(warc.make_warc_file(d))
    assert recs[0]["warc_type"] == "warcinfo"
    resp_recs = [r for r in recs if r["warc_type"] == "response"]
    assert len(resp_recs) == warc.n_responses(d)
    for j, rec in enumerate(resp_recs):
        resp = httpmsg.parse_response(rec["block"])
        assert resp["body"].decode() == httpmsg.body_text(d, j)
        assert resp["status"] == httpmsg.STATUS_GRID[(d + j) % 5]
        assert rec["date"] == warc.warc_date(d, j)


def test_http_content_length_truncated_and_bad():
    assert httpmsg.parse_response(
        b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort") is None
    assert httpmsg.parse_response(
        b"HTTP/1.1 200 OK\r\nContent-Length: zz\r\n\r\nx") is None
    assert httpmsg.parse_response(b"\x00\x01\x02") is None
    assert httpmsg.parse_response(b"ICY 200 OK\r\n\r\nx") is None


def test_http_lone_lf_and_repeated_headers():
    raw = b"HTTP/1.1 200 OK\nVia: a\nVia: b\nContent-Length: 2\n\nhi"
    resp = httpmsg.parse_response(raw)
    assert resp["body"] == b"hi"
    assert resp["headers"]["via"] == "a, b"


def test_http_deflate_both_flavors():
    body = b"deflate me " * 10
    for wbits in (15, -15):  # zlib-wrapped and raw — both seen in the wild
        co = zlib.compressobj(6, zlib.DEFLATED, wbits)
        wire = co.compress(body) + co.flush()
        raw = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
               b"Content-Length: " + str(len(wire)).encode() +
               b"\r\n\r\n" + wire)
        assert httpmsg.parse_response(raw)["body"] == body


def test_http_unknown_coding_is_unparseable():
    raw = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
           b"Content-Length: 2\r\n\r\nxx")
    assert httpmsg.parse_response(raw) is None


def test_warc_truncated_and_garbage():
    good = warc.build_record("resource", b"abc")
    assert warc.parse_warc(b"") == []
    assert warc.parse_warc(b"not a warc") == []
    # truncated block: record dropped, no raise
    assert warc.parse_warc(good[:-8]) == []
    # good record then garbage: keeps the good one
    recs = warc.parse_warc(good + b"garbage tail")
    assert len(recs) == 1 and recs[0]["block"] == b"abc"
    # truncated gzip member: best-effort empty
    gz = warc.build_warc([good], gzip_members=True)
    assert warc.parse_warc(gz[:10]) == []


# ---------------------------------------------------------------------------
# interleaved-doc ↔ segment codec (the extract_from_warc transport)
# ---------------------------------------------------------------------------

def test_build_response_grid_hand_expectations():
    body = "héllo wörld ✓ " .encode("utf-8") * 200  # > one wire chunk
    for variant in range(4):
        raw = httpmsg.build_response(body, variant,
                                     extra_headers=(("X-K", "v"),))
        resp = httpmsg.parse_response(raw)
        assert resp["body"] == body
        assert resp["headers"]["x-k"] == "v"
        # framing actually varies: the grid is exercised, not collapsed
        assert ("chunked" in resp["headers"].get("transfer-encoding", "")) \
            == (variant % 2 == 1)
        assert ("gzip" in resp["headers"].get("content-encoding", "")) \
            == (variant >= 2)


def test_segment_roundtrip_synthetic_corpus():
    from crawspark.corpus import make_doc
    for i in range(40):  # multi-span docs with media refs + captions
        d = make_doc(42, i)
        assert warc.interleaved_from_segment(
            warc.segment_from_interleaved(d)) == d


def test_segment_roundtrip_adversarial_spans():
    # null text, unicode media_ref and doc_id, framing-trap bytes in a
    # text body (CRLFCRLF, NULs, the 0x1f/0x1e canon separators), spans
    # arriving out of offset order.
    d = {"doc_id": "weird/док 1", "spans": [
        {"kind": "media", "text": None,
         "media_ref": "img://päth/ü?x=1&y=2", "offset": 1},
        {"kind": "html", "text": "", "media_ref": None, "offset": 0},
        {"kind": "text", "text": "trap\r\n\r\ntrap\x1f\x1e\x00",
         "media_ref": None, "offset": 2},
    ]}
    rt = warc.interleaved_from_segment(warc.segment_from_interleaved(d))
    assert rt["doc_id"] == d["doc_id"]
    assert rt["spans"] == sorted(d["spans"], key=lambda s: s["offset"])


def test_extract_from_warc_matches_direct_extraction(spark):
    # Archive replay must equal the direct pipeline span for span: the
    # registry query's oracle pins it against the frozen parquet at the
    # driver SF; this pins Spark-vs-Spark at sf0.001 as well.
    from crawspark.registry import load_all
    reg = load_all()
    sf = "/root/testdata/sf0.001"
    via_warc = {r.doc_id: r.span_hash
                for r in reg["extract_from_warc"].spark(spark, sf).collect()}
    direct = {r.doc_id: r.span_hash
              for r in reg["extract_span_hashes"].spark(spark, sf).collect()}
    assert via_warc == direct and len(via_warc) == 500


# ---------------------------------------------------------------------------
# Spark file source
# ---------------------------------------------------------------------------

def test_read_warc_source(spark, tmp_path):
    from crawspark.sources.warc import http_responses, read_warc
    for d in (2, 3, 5):  # mixes plain (even) and gzip-member (odd) files
        ext = ".warc.gz" if d % 2 else ".warc"
        (tmp_path / f"seg-{d}{ext}").write_bytes(warc.make_warc_file(d))
    recs = read_warc(spark, str(tmp_path))
    rows = recs.collect()
    assert len(rows) == sum(1 + warc.n_responses(d) for d in (2, 3, 5))
    bodies = http_responses(recs).collect()
    by_key = {(r.path.rsplit("seg-", 1)[1].split(".")[0], r.rec_idx): r
              for r in bodies}
    for d in (2, 3, 5):
        for j in range(warc.n_responses(d)):
            row = by_key[(str(d), j + 1)]  # rec 0 is warcinfo
            assert bytes(row.body).decode() == httpmsg.body_text(d, j)
            assert row.status == httpmsg.STATUS_GRID[(d + j) % 5]
    # metadata-only projection drops the payload column
    assert "block" not in read_warc(spark, str(tmp_path),
                                    with_block=False).columns


def test_lf_framed_head_with_crlfcrlf_in_body():
    # r5 review: an LF-framed head whose body contains CRLFCRLF must
    # split at the FIRST blank line — the old separator-priority scan
    # tried \r\n\r\n first and extended the head into the body.
    raw = (b"HTTP/1.1 200 OK\n"
           b"Content-Length: 14\n"
           b"\n"
           b"body\r\n\r\nmore..")
    resp = httpmsg.parse_response(raw)
    assert resp is not None
    assert resp["status"] == 200
    assert resp["body"] == b"body\r\n\r\nmore.."
    # and the reverse order: CRLF head, body with a lone \n\n stays body
    raw2 = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Length: 8\r\n"
            b"\r\n"
            b"ab\n\ncdef")
    assert httpmsg.parse_response(raw2)["body"] == b"ab\n\ncdef"


def test_make_response_is_build_response_wrapper():
    # r5 review DRY fix: make_response no longer keeps its own framing
    # copy. Pin the visible contract: the 2x2 grid varies, variant 3
    # (and only variant 3) carries the X-Crawl-Doc trailer, and every
    # response parses back to the synthetic body.
    for d in range(8):
        for j in range(4):
            raw = httpmsg.make_response(d, j)
            resp = httpmsg.parse_response(raw)
            assert resp["body"] == httpmsg.body_text(d, j).encode("ascii")
            assert resp["headers"]["server"] == f"synth/{d % 3}"
            variant = (d + j) % 4
            assert (b"Transfer-Encoding: chunked" in raw) == \
                (variant % 2 == 1)
            assert (b"Content-Encoding: gzip" in raw) == (variant >= 2)
            assert (resp["headers"].get("x-crawl-doc") == str(d)) == \
                (variant == 3)
