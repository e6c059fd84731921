"""Differential tests: the regex-scanner tokenizer must build the SAME
tree the stdlib-html.parser path builds — on every fixture input, the
synthetic corpus, and hypothesis byte-soup."""

from __future__ import annotations

import json
import pathlib

import pytest
from hypothesis import given, settings, strategies as st

from crawspark.corpus import make_doc
from crawspark.oracle.dom import Node, parse_html
from crawspark.oracle.fastparse import parse_html_fast

FIXDIR = pathlib.Path(__file__).resolve().parent / "fixtures"


def _shape(node: Node):
    return (node.tag, sorted(node.attrs.items()),
            [(c if isinstance(c, str) else _shape(c)) for c in node.children])


def _assert_same(payload: str) -> None:
    assert _shape(parse_html_fast(payload)) == _shape(parse_html(payload))


@pytest.mark.parametrize("case", sorted(
    p.name for p in FIXDIR.iterdir() if (p / "input.json").exists()))
def test_fixture_inputs_identical(case: str) -> None:
    spans = json.loads((FIXDIR / case / "input.json").read_text())
    html = "".join(s.get("text") or "" for s in spans
                   if s.get("kind") == "html")
    if html:
        _assert_same(html)


def test_corpus_identical() -> None:
    for i in range(150):
        d = make_doc(7, i)
        html = "".join(s["text"] or "" for s in d["spans"]
                       if s["kind"] == "html")
        if html:
            _assert_same(html)


_tagged = st.lists(
    st.one_of(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
                max_size=30),
        st.sampled_from([
            "<p>", "</p>", "<div class='a b'>", "</div>", "<a href='/x'>",
            "</a>", "<img src='a.jpg'/>", "<br>", "<title>", "</title>",
            "<em>", "</em>", "<!-- c -->", "<!doctype html>", "<script>",
            "var x='<p>';", "</script>", "<style>", "p{}", "</style>",
            "&amp;", "&lt;", "&#65;", "&nosuch;", "<", ">", "</", "<p",
            "='", "<p a=1 b=\"2\" c='3'>", "<td>", "</td>", "<input value='v'>",
        ]),
    ), max_size=40).map("".join)


@settings(max_examples=300, deadline=None)
@given(_tagged)
def test_hypothesis_identical(payload: str) -> None:
    _assert_same(payload)


def test_whitespace_prefixed_end_tags() -> None:
    # endtagfind accepts '</ name >' (r3 review finding: the fast scanner
    # dropped these as bogus, silently nesting what stdlib makes siblings);
    # '</ name junk>' is parse_bogus_comment → dropped on BOTH paths.
    for p in ["<div><p>intro</ p><p>body", "<p>a</ p>x", "<p>a</ p attr>x",
              "<p>a</\np>x", "<p>a</ p >x", "</ 1>x", "</>x",
              "<p>a</p junk>b", "</ TD>", "</ p.x>"]:
        _assert_same(p)
