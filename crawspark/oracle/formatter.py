"""Output formatting: post-clean the chosen content tree and emit the final
span sequence (text / image / video) in document order.

Reference loci (reconstructed): [R: goose/outputformatters.py::
OutputFormatter.get_formatted_text, ::links_to_text, ::remove_negativescores,
::remove_fewwords_paragraphs; goose/extractors.py::post_cleanup].

Output rules (fixed, fixture-pinned):
- blocks are leaf block elements (p/pre/td/h1..h6) traversed in document
  order across the merged sibling list then the top node;
- a block survives when its stopword count >= MIN_BLOCK_STOPWORDS, or it
  contains qualifying media, or it is <pre>;
- within a block: its text span is emitted first, then its media spans in
  DOM order; media between blocks emit at encounter position;
- scored descendants with negative score are dropped
  [R: remove_negativescores]; non-p containers with high link density are
  dropped [R: post_cleanup];
- links collapse to their text (``Node.text`` flattens) [R: links_to_text].
"""

from __future__ import annotations

from crawspark.oracle.dom import Node
from crawspark.oracle.media import absolutize, image_ok, video_src
from crawspark.oracle.stats import NodeStats

LEAF_BLOCK_TAGS = frozenset({"p", "pre", "td", "h2", "h3", "h4", "h5", "h6"})
MIN_BLOCK_STOPWORDS = 3  # [R: remove_fewwords_paragraphs]

Span = tuple[str, str, str]  # (kind, text, media_ref)


def format_content(roots: list[Node], lang: str, base_url: str,
                   memo: NodeStats | None = None) -> list[Span]:
    memo = memo or NodeStats(lang)
    spans: list[Span] = []
    seen: set[int] = set()
    for root in roots:
        _walk(root, memo, base_url, spans, seen, is_root=True)
    return spans


def _walk(node: Node, memo: NodeStats, base_url: str, out: list[Span],
          seen: set[int], is_root: bool = False) -> None:
    if id(node) in seen:
        return
    seen.add(id(node))

    if node.tag == "img":
        if image_ok(node):
            out.append(("image", node.attr("alt").strip(),
                        absolutize(node.attr("src"), base_url)))
        return
    if node.tag in ("iframe", "embed", "object", "video"):
        src = video_src(node)
        if src:
            out.append(("video", node.attr("title").strip(),
                        absolutize(src, base_url)))
        return
    if node.tag in LEAF_BLOCK_TAGS:
        _emit_block(node, memo, base_url, out, seen)
        return

    # Container: apply post-cleanup rules, then recurse in document order.
    if not is_root:
        if node.score < 0:
            return
        if node.tag != "p" and memo.link_density_high(node):
            return
    for child in node.children:
        if isinstance(child, Node):
            _walk(child, memo, base_url, out, seen)


def _emit_block(node: Node, memo: NodeStats, base_url: str, out: list[Span],
                seen: set[int]) -> None:
    descendants = list(node.iter())  # one traversal: seen-marking + media
    for d in descendants:
        seen.add(id(d))
    if node.score < 0:
        return
    media: list[Span] = []
    for d in descendants:
        if d is node:
            continue
        if d.tag == "img" and image_ok(d):
            media.append(("image", d.attr("alt").strip(),
                          absolutize(d.attr("src"), base_url)))
        elif d.tag in ("iframe", "embed", "object", "video"):
            src = video_src(d)
            if src:
                media.append(("video", d.attr("title").strip(),
                              absolutize(src, base_url)))
    text = memo.text(node)
    stop_count = memo.word_stats(node)[1]
    keep_text = bool(text) and (
        stop_count >= MIN_BLOCK_STOPWORDS or node.tag == "pre" or bool(media)
    )
    if keep_text and not memo.link_density_high(node):
        out.append(("text", text, ""))
    out.extend(media)


def extract_outlinks(roots: list[Node], base_url: str) -> list[str]:
    """a[href] within the content sequence, absolutized, first-seen order
    dedup [R: page.py outlinks; goose/extractors.py::extract_tags]."""
    seen: set[str] = set()
    links: list[str] = []
    for root in roots:
        for a in root.find_all("a"):
            href = a.attr("href").strip()
            if not href or href.startswith(("#", "javascript:", "mailto:")):
                continue
            url = absolutize(href, base_url)
            if url not in seen:
                seen.add(url)
                links.append(url)
    return links
