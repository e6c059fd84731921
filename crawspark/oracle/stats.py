"""Word/stopword statistics + link density.

Reference loci (reconstructed): [R: goose/text.py::StopWords.get_stopword_count,
::WordStats], [R: goose/extractors.py::ContentExtractor.is_highlink_density].
"""

from __future__ import annotations

import re

from crawspark.rules import STOPWORDS, STOPWORDS_EN

_RE_PUNCT = re.compile(r"[^\w\s]|_", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Lowercase, strip punctuation, split on whitespace. Deterministic."""
    return _RE_PUNCT.sub(" ", text.lower()).split()


def word_stats(text: str, lang: str = "en") -> tuple[int, int]:
    """(word_count, stopword_count) for ``text`` under ``lang`` stopwords."""
    words = tokenize(text)
    sw = STOPWORDS.get(lang, STOPWORDS_EN)
    return len(words), sum(map(sw.__contains__, words))


def link_density_high(node, lang: str = "en") -> bool:
    """True when (link_words / words) * n_links >= 1.0 — the reference's
    high-link-density rejection [R: goose/extractors.py::is_highlink_density].
    """
    words = node.text().split()
    if not words:
        return True
    links = node.find_all("a")
    if not links:
        return False
    link_words = sum(len(a.text().split()) for a in links)
    score = (float(link_words) / len(words)) * len(links)
    return score >= 1.0
