"""Crash-safety and truncation properties for the r5 format parsers.

At 10^12 documents the payload column WILL contain every possible byte
sequence — truncated downloads, bit flips, adversarial containers. The
extraction contract is: parsers never raise, they degrade to fewer (or
zero) units. These properties fuzz each parser three ways:

1. arbitrary bytes (never raise),
2. valid containers TRUNCATED at every interesting boundary,
3. valid containers with single-byte corruptions.

The sniffer gets the same treatment plus a routing-consistency
property: whatever it detects, extract_any must honor without raising.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawspark.oracle.cfbdoc import extract_doc_text, make_legacy_doc
from crawspark.oracle.epub import extract_epub_text, make_epub
from crawspark.oracle.mailmsg import extract_eml, make_eml
from crawspark.oracle.markdown import extract_markdown
from crawspark.oracle.officedoc import (
    extract_docx_text,
    extract_pptx_text,
    extract_xlsx_rows,
    make_docx,
    make_pptx,
    make_xlsx,
)
from crawspark.oracle.rtf import extract_rtf_text, make_rtf
from crawspark.oracle.sniff import extract_any, sniff_format
from crawspark.oracle.tarzip import make_targz, make_zip, parse_tar, parse_zip

_PARSERS = [
    extract_docx_text, extract_xlsx_rows, extract_pptx_text,
    extract_rtf_text, extract_doc_text, extract_epub_text,
    parse_tar, lambda b: extract_eml(b)[1], parse_zip,
]

_BUILDERS = [
    make_docx, make_xlsx, make_pptx, make_rtf, make_legacy_doc,
    make_epub, make_targz, make_eml, make_zip,
]


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_parsers_never_raise_on_garbage(payload):
    for parse in _PARSERS:
        out = parse(payload)
        assert isinstance(out, list)
    fmt, units = extract_any(payload)
    assert isinstance(fmt, str) and isinstance(units, list)
    extract_markdown(payload.decode("latin-1"))


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=4000),
       st.integers(min_value=0, max_value=120))
def test_parsers_never_raise_on_truncation(cut, d):
    for build, parse in zip(_BUILDERS, _PARSERS):
        payload = build(d)
        out = parse(payload[:cut % max(len(payload), 1)])
        assert isinstance(out, list)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=255),
       st.integers(min_value=0, max_value=120))
def test_parsers_never_raise_on_bitflips(pos, val, d):
    for build, parse in zip(_BUILDERS, _PARSERS):
        payload = bytearray(build(d))
        payload[pos % len(payload)] = val
        out = parse(bytes(payload))
        assert isinstance(out, list)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=1024))
def test_sniff_total_and_consistent(payload):
    fmt = sniff_format(payload)
    assert isinstance(fmt, str) and fmt
    fmt2, units = extract_any(payload)
    assert fmt2 == fmt
    assert isinstance(units, list)


def test_bitflip_detection_never_misroutes_to_crash():
    # dense sweep over one container per format: every single-byte
    # corruption of the first 2 KB must keep the ROUTER total
    for d in (3, 10):
        for build in _BUILDERS:
            payload = bytearray(build(d))
            for pos in range(0, min(len(payload), 2048), 37):
                corrupted = bytearray(payload)
                corrupted[pos] ^= 0xFF
                fmt, units = extract_any(bytes(corrupted))
                assert isinstance(units, list)
