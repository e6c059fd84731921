"""schema.org JSON-LD extraction from HTML — the structured-metadata
channel every modern article page ships (newspaper/trafilatura read it
before falling back to meta tags).

``extract_jsonld_articles`` walks the REAL DOM (oracle/dom.parse_html,
whose tokenizer treats script content as CDATA — the reason a naive
regex scan is wrong: JSON strings legally contain ``<\\/script>``
escapes and markup), collects every ``<script
type="application/ld+json">`` block, JSON-parses it, flattens
``@graph`` arrays and top-level lists, and returns one record per
schema.org Article/NewsArticle/BlogPosting node: (headline,
date_published, author_name, word_count). Author may be a string, an
object with name, or a list (first entry wins). Malformed JSON blocks
are skipped, never fatal.
"""

from __future__ import annotations

import json

_ARTICLE_TYPES = {"Article", "NewsArticle", "BlogPosting"}


def _nodes(doc) -> list[dict]:
    """Top-level JSON-LD value → candidate node dicts (@graph and
    top-level arrays flattened one level, the spec's common shapes)."""
    if isinstance(doc, list):
        out: list[dict] = []
        for d in doc:
            out.extend(_nodes(d))
        return out
    if isinstance(doc, dict):
        if isinstance(doc.get("@graph"), list):
            return [n for n in doc["@graph"] if isinstance(n, dict)]
        return [doc]
    return []


def _author_name(author) -> str:
    if isinstance(author, list):
        author = author[0] if author else ""
    if isinstance(author, dict):
        return str(author.get("name", ""))
    return str(author) if author else ""


def extract_jsonld_articles(html: str) -> list[dict]:
    """One record per Article-typed JSON-LD node, document order.
    Never raises; pages without JSON-LD yield []."""
    from crawspark.oracle.dom import parse_html

    try:
        root = parse_html(html)
    except Exception:
        return []
    out: list[dict] = []
    for script in root.find_all("script"):
        if script.attr("type").strip().lower() != "application/ld+json":
            continue
        # RAW child text, not Node.text(): text() whitespace-normalizes,
        # which rewrites JSON string values containing runs of spaces or
        # tabs before json.loads ever sees them (r5 review finding)
        raw = "".join(c for c in script.children if isinstance(c, str))
        try:
            doc = json.loads(raw)
        except (ValueError, TypeError):
            continue
        for node in _nodes(doc):
            if node.get("@type") not in _ARTICLE_TYPES:
                continue
            out.append({
                "headline": str(node.get("headline", "")),
                "date_published": str(node.get("datePublished", "")),
                "author_name": _author_name(node.get("author")),
                "word_count": int(node["wordCount"])
                if isinstance(node.get("wordCount"), int) else -1,
            })
    return out


def make_jsonld_page(doc_id: int) -> str:
    """Deterministic article page for doc d. Shapes cycle so every
    parser path is exercised:

    - d % 3 == 0: ``@graph`` wrapper holding a WebPage decoy + the
      Article;
    - d % 3 == 1: bare Article object whose headline contains the
      ``<\\/script>`` escape (the regex-scanner killer) — author as an
      object;
    - d % 3 == 2: top-level ARRAY of [BlogPosting, Organization
      decoy] — author as a list.

    Every page also carries a text/javascript decoy script containing
    JSON-looking text that must NOT be parsed."""
    d = doc_id
    day = f"2025-03-{1 + d % 28:02d}"
    wc = 120 + d % 400
    if d % 3 == 0:
        block = json.dumps({
            "@context": "https://schema.org",
            "@graph": [
                {"@type": "WebPage", "name": f"page {d}"},
                {"@type": "Article", "headline": f"headline {d}",
                 "datePublished": day, "author": f"author {d % 17}",
                 "wordCount": wc},
            ],
        })
    elif d % 3 == 1:
        block = json.dumps({
            "@context": "https://schema.org", "@type": "NewsArticle",
            "headline": f"breaking {d} <\\/script> trap",
            "datePublished": day,
            "author": {"@type": "Person", "name": f"author {d % 17}"},
            "wordCount": wc,
        }).replace("<\\\\/script>", "<\\/script>")
    else:
        block = json.dumps([
            {"@type": "BlogPosting", "headline": f"post {d}",
             "datePublished": day,
             "author": [{"@type": "Person", "name": f"author {d % 17}"}],
             "wordCount": wc},
            {"@type": "Organization", "name": f"org {d}"},
        ])
    return (
        "<html><head>"
        f"<title>doc {d}</title>"
        '<script type="text/javascript">var fake = {"@type": "Article",'
        ' "headline": "decoy"};</script>'
        f'<script type="application/ld+json">{block}</script>'
        f"</head><body><p>body {d}</p></body></html>")


def jsonld_expected(doc_id: int) -> list[dict]:
    """Closed-form statement of what extraction must return — the
    pure-Python twin the SQL oracle mirrors."""
    d = doc_id
    day = f"2025-03-{1 + d % 28:02d}"
    wc = 120 + d % 400
    if d % 3 == 0:
        headline = f"headline {d}"
    elif d % 3 == 1:
        headline = f"breaking {d} </script> trap"
    else:
        headline = f"post {d}"
    return [{"headline": headline, "date_published": day,
             "author_name": f"author {d % 17}", "word_count": wc}]
