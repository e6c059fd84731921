"""Word/stopword statistics + link density.

Reference loci (reconstructed): [R: goose/text.py::StopWords.get_stopword_count,
::WordStats], [R: goose/extractors.py::ContentExtractor.is_highlink_density].
"""

from __future__ import annotations

import re

from crawspark.rules import STOPWORDS, STOPWORDS_EN

# \w excludes combining marks (categories Mn/Mc are not isalnum), which
# shatters Devanagari words on their vowel signs (matras) — "में" would
# tokenize as "म" + "." The Devanagari block (U+0900–U+097F, rules_v5)
# is therefore kept as word characters — EXCEPT its punctuation: danda
# U+0964 / double danda U+0965 (the Hindi full stop; sentence-final
# auxiliaries like है।/था। must still tokenize bare) and the
# abbreviation sign U+0970. Other scripts are unaffected (Arabic
# tables are undiacritized, so stripping Arabic Mn diacritics stays
# correct).
_RE_PUNCT = re.compile(
    r"[^\w\sऀ-ॣ०-९ॱ-ॿ]|_", re.UNICODE)

# ASCII fast path: translate table built FROM the regex (equivalent by
# construction — a char maps to space iff the regex would replace it).
_ASCII_TBL = str.maketrans({
    chr(c): " " for c in range(128) if _RE_PUNCT.fullmatch(chr(c))
})


def tokenize(text: str) -> list[str]:
    """Lowercase, strip punctuation, split on whitespace. Deterministic;
    the ASCII path is table-driven (byte-identical to the regex there)."""
    low = text.lower()
    if low.isascii():
        return low.translate(_ASCII_TBL).split()
    return _RE_PUNCT.sub(" ", low).split()


# CJK has no whitespace word boundaries: zh tokens are single Han
# characters plus latin word/number runs
# [R: goose/text.py::StopWordsChinese — per-character candidate words].
_RE_ZH_TOKEN = re.compile(r"[一-鿿]|[a-z0-9]+")

# Japanese (rules_v4): zh-style per-character handling extended to the
# kana blocks — hiragana U+3040–309F, katakana U+30A0–30FF (includes the
# prolonged-sound mark) — plus Han characters and latin/number runs
# [R: goose/text.py::StopWordsKorean/Arabic siblings — per-script
# candidate-word rules].
_RE_JA_TOKEN = re.compile(r"[一-鿿぀-ゟ゠-ヿ]|[a-z0-9]+")


def tokenize_zh(text: str) -> list[str]:
    return _RE_ZH_TOKEN.findall(text.lower())


def tokenize_ja(text: str) -> list[str]:
    return _RE_JA_TOKEN.findall(text.lower())


def tokenize_for_lang(text: str, lang: str) -> list[str]:
    if lang == "zh":
        return tokenize_zh(text)
    if lang == "ja":
        return tokenize_ja(text)
    return tokenize(text)


def word_stats(text: str, lang: str = "en") -> tuple[int, int]:
    """(word_count, stopword_count) for ``text`` under ``lang`` stopwords.
    Unknown langs fall back to the English table (goose behavior:
    StopWords defaults to english when no per-language list ships)."""
    words = tokenize_for_lang(text, lang)
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


class NodeStats:
    """Per-document memo for node text / word stats / link density.

    Valid while the DOM is structurally frozen (i.e. AFTER clean_document;
    the scorer only writes Node.score). Pure caching — byte-identical
    results, shared across scorer, sibling merge, and formatter so the
    same node is never re-tokenized per stage."""

    __slots__ = ("lang", "_text", "_stats", "_dense")

    def __init__(self, lang: str):
        self.lang = lang
        self._text: dict[int, str] = {}
        self._stats: dict[int, tuple[int, int]] = {}
        self._dense: dict[int, bool] = {}

    def text(self, node) -> str:
        k = id(node)
        t = self._text.get(k)
        if t is None:
            t = self._text[k] = node.text()
        return t

    def word_stats(self, node) -> tuple[int, int]:
        k = id(node)
        s = self._stats.get(k)
        if s is None:
            s = self._stats[k] = word_stats(self.text(node), self.lang)
        return s

    def link_density_high(self, node) -> bool:
        k = id(node)
        d = self._dense.get(k)
        if d is None:
            words = self.text(node).split()
            if not words:
                d = True
            else:
                links = node.find_all("a")
                if not links:
                    d = False
                else:
                    link_words = sum(len(self.text(a).split()) for a in links)
                    d = (float(link_words) / len(words)) * len(links) >= 1.0
            self._dense[k] = d
        return d
