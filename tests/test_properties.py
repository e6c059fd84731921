"""Property-based robustness: the extractor is total (never raises),
deterministic, and structurally sound on ARBITRARY byte-soup payloads —
the closest thing to crawling the real web this sandbox allows."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawspark.oracle import extract_document
from crawspark.oracle.dom import parse_html
from crawspark.oracle.pdfparse import extract_pdf_text

payload = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF), max_size=400)

tagged = st.lists(
    st.one_of(
        payload,
        st.sampled_from(["<p>", "</p>", "<div>", "</div>", "<a href='/x'>",
                         "</a>", "<img src='a.jpg'>", "<title>", "</title>",
                         "<em>", "</em>", "<!-- c -->", "<script>", "</script>",
                         "<", ">", "</", "<p", "='"]),
    ), max_size=60).map("".join)

span_kind = st.sampled_from(["html", "pdf", "text", "media", "junk", ""])


@settings(max_examples=200, deadline=None)
@given(tagged)
def test_parse_html_total(html: str) -> None:
    root = parse_html(html)
    assert root.tag == "#root"
    for n in root.iter():
        n.text()  # never raises


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "kind": span_kind,
        "text": st.one_of(st.none(), tagged),
        "media_ref": st.one_of(st.none(), payload),
        "offset": st.one_of(st.none(), st.integers(-5, 50)),
    }), max_size=5))
def test_extract_document_total_and_sound(spans: list[dict]) -> None:
    a = extract_document("prop-doc", spans)
    b = extract_document("prop-doc", spans)
    # deterministic
    assert a == b
    # structural invariants (FIXTURES.md §1.2)
    assert [s["offset"] for s in a["spans"]] == list(range(a["n_spans"]))
    for s in a["spans"]:
        assert s["kind"] in ("title", "text", "image", "video")
        assert isinstance(s["text"], str)
    if a["spans"] and a["spans"][0]["kind"] == "title":
        assert a["title"] == a["spans"][0]["text"]
    from crawspark.rules import VOTE_LANGS
    assert a["lang"] in VOTE_LANGS


@settings(max_examples=150, deadline=None)
@given(payload)
def test_pdf_parse_total(data: str) -> None:
    pages = extract_pdf_text(data)
    assert all(isinstance(p, str) for p in pages)


# r4: multilingual script soup — CJK + cyrillic codepoints through the
# full extractor (the original payload alphabet stops at 0x2FF, so the
# zh per-character tokenizer and ru tables were never fuzzed).
ml_payload = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
        st.characters(min_codepoint=0x400, max_codepoint=0x4FF),   # cyrillic
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),  # CJK
        st.characters(min_codepoint=0x3000, max_codepoint=0x303F),  # CJK punct
    ), max_size=300)

ml_tagged = st.lists(
    st.one_of(
        ml_payload,
        st.sampled_from(["<p>", "</p>", "<div>", "</div>",
                         "<html lang='zh'>", "<html lang='ru'>",
                         "<a href='/x'>", "</a>", "<title>", "</title>"]),
    ), max_size=40).map("".join)


@settings(max_examples=150, deadline=None)
@given(ml_tagged)
def test_extract_multilingual_soup_total(html: str) -> None:
    from crawspark.rules import VOTE_LANGS
    spans = [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
    a = extract_document("ml-doc", spans)
    b = extract_document("ml-doc", spans)
    assert a == b
    assert a["lang"] in VOTE_LANGS
    assert [s["offset"] for s in a["spans"]] == list(range(a["n_spans"]))
