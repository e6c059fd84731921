"""Markdown → text block extraction (CommonMark core constructs,
regex/state implementation — no external parser).

READMEs, documentation mirrors and forum exports surface Markdown
constantly. For corpus building the requirement is the TEXT, block
structure preserved:

- ATX headings ``# .. ######`` (closing hashes stripped) and setext
  underlines (``===``/``---`` promote the previous line).
- Emphasis/strong/inline-code markers stripped (``*``, ``_``,
  ``**``, `` ` ``), links ``[text](url)`` and images ``![alt](url)``
  collapse to their text/alt, reference links ``[text][id]`` collapse
  to text with ``[id]: url`` definition lines dropped.
- Fenced code blocks (``` or ~~~) pass through VERBATIM as one block
  (no marker stripping inside — stripping emphasis from code is the
  classic extraction bug).
- Blockquote ``>`` prefixes and list markers (``-``/``*``/``+``/
  ``1.``) strip per line; lazy continuation lines join their
  paragraph; blank lines split blocks; horizontal rules drop.

``extract_markdown`` returns the block texts in document order.
``make_markdown`` builds a deterministic document exercising each
construct, stated closed-form by ``markdown_blocks_expected``.
"""

from __future__ import annotations

import re

_RE_REFDEF = re.compile(r"^\s{0,3}\[[^\]]+\]:\s+\S+.*$")
_RE_HR = re.compile(r"^\s{0,3}([-*_])(\s*\1){2,}\s*$")
_RE_ATX = re.compile(r"^\s{0,3}(#{1,6})\s+(.*?)(?:\s+#+\s*)?$")
_RE_SETEXT = re.compile(r"^\s{0,3}(=+|-+)\s*$")
_RE_LIST = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_RE_QUOTE = re.compile(r"^\s{0,3}>\s?(.*)$")
_RE_FENCE = re.compile(r"^\s{0,3}(```+|~~~+)\s*\S*\s*$")
_RE_IMG = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_RE_LINK = re.compile(r"\[([^\]]*)\]\(\s*[^)]*\)")
_RE_REFLINK = re.compile(r"\[([^\]]*)\]\[[^\]]*\]")
_RE_CODE = re.compile(r"`([^`]*)`")
_RE_STRONG = re.compile(r"(\*\*|__)(?=\S)(.+?)(?<=\S)\1")
_RE_EM = re.compile(r"(\*|_)(?=\S)(.+?)(?<=\S)\1")


def _inline(text: str) -> str:
    text = _RE_IMG.sub(r"\1", text)
    text = _RE_LINK.sub(r"\1", text)
    text = _RE_REFLINK.sub(r"\1", text)
    text = _RE_CODE.sub(r"\1", text)
    text = _RE_STRONG.sub(r"\2", text)
    text = _RE_EM.sub(r"\2", text)
    return text.strip()


def extract_markdown(text: str) -> list[str]:
    """Block texts in document order. Never raises."""
    blocks: list[str] = []
    para: list[str] = []
    fence: str | None = None
    code: list[str] = []

    def flush() -> None:
        if para:
            blocks.append(_inline(" ".join(para)))
            para.clear()

    for line in text.split("\n"):
        if fence is not None:
            if _RE_FENCE.match(line) and line.strip().startswith(fence):
                blocks.append("\n".join(code))
                code.clear()
                fence = None
            else:
                code.append(line)
            continue
        m = _RE_FENCE.match(line)
        if m:
            flush()
            fence = m.group(1)[:3]
            continue
        if not line.strip():
            flush()
            continue
        if _RE_REFDEF.match(line) or _RE_HR.match(line):
            flush()
            continue
        m = _RE_ATX.match(line)
        if m:
            flush()
            blocks.append(_inline(m.group(2)))
            continue
        if para and _RE_SETEXT.match(line):
            # setext: the underline promotes the pending paragraph to
            # a heading — same text either way
            flush()
            continue
        m = _RE_QUOTE.match(line)
        if m:
            para.append(m.group(1))
            continue
        m = _RE_LIST.match(line)
        if m:
            flush()  # each list item is its own block
            para.append(m.group(1))
            continue
        para.append(line.strip())
    if fence is not None and code:
        while code and code[-1] == "":
            code.pop()  # EOF-truncated fence: drop split()'s tail
        blocks.append("\n".join(code))
    flush()
    return [b for b in blocks if b]


def markdown_blocks_expected(doc_id: int) -> list[str]:
    """Closed form of make_markdown's blocks."""
    d = doc_id
    out = [f"doc {d} heading {d % 6}"]
    for p in range(1 + d % 3):
        out.append(f"doc {d} para {p} with link{p} and bold{p} "
                   f"joined line {p}")
        out.append(f"item {d} {p} first")
        out.append(f"item {d} {p} second code{p}")
    out.append(f"verbatim **not stripped** {d}\n  indent kept {d % 4}")
    out.append(f"quoted {d} tail")
    return out


def make_markdown(doc_id: int) -> str:
    """Deterministic Markdown exercising every construct the extractor
    claims: ATX heading with closing hashes, emphasis/links/images/
    code spans, reference definitions, lazy continuation, list items,
    a fenced block whose markers must NOT strip, hr, and a blockquote."""
    d = doc_id
    lines = [f"# doc {d} heading {d % 6} #", ""]
    for p in range(1 + d % 3):
        lines += [
            f"doc {d} *para {p}* with [link{p}](http://x/{p}) and "
            f"**bold{p}**",
            f"joined line {p}",
            "",
            f"- item {d} {p} first",
            f"{p + 1}. item {d} {p} second `code{p}`",
            "",
            f"[ref{p}]: http://example.test/{d}/{p}",
        ]
    lines += ["---", "```python",
              f"verbatim **not stripped** {d}",
              f"  indent kept {d % 4}",
              "```", "",
              f"> quoted {d}", "> tail", ""]
    return "\n".join(lines)
