"""Stopword-weighted DOM node scoring — the heart of the extractor.

Replicates (reconstructed) [R: goose/extractors.py::ContentExtractor
.calculate_best_node, ::update_score, ::update_node_count, ::is_boostable,
::nodes_to_check, ::get_siblings_content, ::get_siblings_score_threshold].

Determinism contract (SURVEY.md §7 hard part #1): candidate iteration is
strict document order; the top node is the FIRST maximal-score node in
document order; sibling merge prepends previous siblings nearest-last so
final output remains in document order.

All text/stat lookups go through a shared per-document ``NodeStats`` memo
(pure caching — identical results, no re-tokenization across stages).
"""

from __future__ import annotations

from crawspark.oracle.dom import Node
from crawspark.oracle.stats import NodeStats

CANDIDATE_TAGS = ("p", "pre", "td")
MIN_STOPWORDS = 2          # candidate threshold [R: calculate_best_node]
BOOST_STOPWORDS = 5        # sibling boost threshold [R: is_boostable]
BOOST_MAX_STEPS = 3        # how far back is_boostable looks
BOOST_SCORE = 50.0
NEG_SCORE_PORTION = 0.25   # bottom 25% of a long candidate list get negative
NEG_SCORE_MIN_NODES = 15


def score_nodes(root: Node, lang: str = "en",
                memo: NodeStats | None = None) -> Node | None:
    """Score parents/grandparents of stopword-rich candidates; return the
    top node (None when the page has no scorable content)."""
    memo = memo or NodeStats(lang)

    candidates = [
        n for n in root.find_all(*CANDIDATE_TAGS)
        if memo.word_stats(n)[1] > MIN_STOPWORDS
        and not memo.link_density_high(n)
    ]
    n_cand = len(candidates)
    bottom_neg = n_cand * NEG_SCORE_PORTION
    starting_boost = 1.0
    scored_parents: list[Node] = []

    for i, node in enumerate(candidates):
        boost = 0.0
        if _is_boostable(node, memo):
            boost = (1.0 / starting_boost) * BOOST_SCORE
            starting_boost += 1.0
        if n_cand > NEG_SCORE_MIN_NODES and (n_cand - i) <= bottom_neg:
            booster = bottom_neg - float(n_cand - i)
            boost = -(booster * booster)
            if abs(boost) > 40.0:
                boost = 5.0
        upscore = float(memo.word_stats(node)[1]) + boost

        parent = node.parent
        if parent is not None:
            parent.score += upscore
            parent.gravity_nodes += 1
            if parent not in scored_parents:
                scored_parents.append(parent)
            grand = parent.parent
            if grand is not None:
                grand.score += upscore / 2.0
                grand.gravity_nodes += 1
                if grand not in scored_parents:
                    scored_parents.append(grand)

    top: Node | None = None
    top_score = -1.0
    for node in scored_parents:  # insertion order == document order of first hit
        if node.score > top_score:
            top = node
            top_score = node.score
    return top


def _is_boostable(node: Node, memo: NodeStats) -> bool:
    """A paragraph whose nearby previous sibling paragraphs are stopword-rich
    gets boosted (leading-paragraph pattern) [R: is_boostable]."""
    steps = 0
    for sib in node.prev_siblings():
        if sib.tag != "p":
            continue
        if steps >= BOOST_MAX_STEPS:
            return False
        if memo.word_stats(sib)[1] > BOOST_STOPWORDS:
            return True
        steps += 1
    return False


def merge_siblings(top: Node, lang: str = "en",
                   memo: NodeStats | None = None) -> list[Node]:
    """Qualifying previous siblings of the top node, in document order,
    followed by the top node itself [R: get_siblings_content]. Returned as a
    list (the content sequence root set); the DOM is not mutated."""
    memo = memo or NodeStats(lang)
    threshold = _sibling_threshold(top, memo)
    keep: list[Node] = []
    for sib in reversed(top.prev_siblings()):  # document order
        if sib.tag == "p":
            if _sibling_para_ok(sib, threshold, memo):
                keep.append(sib)
        else:
            for p in sib.find_all("p"):
                if _sibling_para_ok(p, threshold, memo):
                    keep.append(p)
    keep.append(top)
    return keep


def _sibling_threshold(top: Node, memo: NodeStats) -> float:
    """max(10, 30% of the mean candidate-para score inside the top node)
    [R: get_siblings_score_threshold]."""
    base = 100000.0
    paras = 0
    total = 0.0
    for p in top.find_all("p"):
        total += float(memo.word_stats(p)[1])
        paras += 1
    if paras:
        base = total / paras
    return max(10.0, base * 0.30)


def _sibling_para_ok(p: Node, threshold: float, memo: NodeStats) -> bool:
    if memo.link_density_high(p):
        return False
    return float(memo.word_stats(p)[1]) >= threshold
