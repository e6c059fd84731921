"""Span-sequence equality vs frozen golden fixtures — THE invariant
(BASELINE.json:L14-L15): per document, the full ordered sequence of
(kind, text, media_ref) tuples must match exactly."""

from __future__ import annotations

import json
import pathlib

import pytest

from crawspark.oracle import extract_document

FIXDIR = pathlib.Path(__file__).resolve().parent / "fixtures"
CASES = sorted(p.name for p in FIXDIR.iterdir() if (p / "input.json").exists())


def _seq(spans: list[dict]) -> list[tuple]:
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


@pytest.mark.parametrize("case", CASES)
def test_span_sequence_equality(case: str) -> None:
    spans = json.loads((FIXDIR / case / "input.json").read_text())
    expected = json.loads((FIXDIR / case / "expected.json").read_text())
    result = extract_document(case, spans)
    assert _seq(result["spans"]) == _seq(expected["spans"])
    assert [s["offset"] for s in result["spans"]] == list(range(len(result["spans"])))
    assert result["lang"] == expected["lang"]
    assert result["n_spans"] == expected["n_spans"]
    assert result["title"] == expected["title"]
    assert result["outlinks"] == expected["outlinks"]


def test_fixture_count() -> None:
    # 18 handcrafted + 32 generated (FIXTURES.md §1.2 asks for >=40).
    assert len(CASES) >= 40


def test_determinism_repeat_runs() -> None:
    for case in CASES[:10]:
        spans = json.loads((FIXDIR / case / "input.json").read_text())
        a = extract_document(case, spans)
        b = extract_document(case, spans)
        assert _seq(a["spans"]) == _seq(b["spans"])
