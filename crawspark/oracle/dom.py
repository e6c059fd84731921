"""From-scratch tolerant HTML tokenizer + DOM on stdlib ``html.parser``.

Replaces the reference's lxml/libxml2 parse [R: goose/parsers.py::
Parser.fromstring] with a pure-Python tree builder (no lxml in this
environment — SURVEY.md §0.2). Recovery behavior is intentionally simple
and deterministic: unmatched end tags are ignored; block-level start tags
implicitly close an open ``<p>``; void elements never take children.

This runs once per document INSIDE a vectorized Arrow batch — it is the
per-row work the pandas/Arrow UDF amortizes (SURVEY.md §3.2).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# Start of any of these closes an open <p> (browsers' implied end tag).
_P_CLOSERS = frozenset(
    {"p", "div", "table", "ul", "ol", "dl", "blockquote", "pre", "article",
     "section", "aside", "nav", "header", "footer", "h1", "h2", "h3", "h4",
     "h5", "h6", "figure", "form"}
)


class Node:
    """One element. ``children`` holds Node and str (text chunk) items."""

    __slots__ = ("tag", "attrs", "children", "parent", "score", "gravity_nodes")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent
        self.score = 0.0
        self.gravity_nodes = 0

    # -- tree ops ----------------------------------------------------------

    def append(self, child: "Node | str") -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def remove_child(self, child: "Node") -> None:
        self.children = [c for c in self.children if c is not child]

    def unwrap(self) -> None:
        """Replace this node by its children in the parent (inline unwrap)."""
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        for c in self.children:
            if isinstance(c, Node):
                c.parent = self.parent
        self.parent.children[idx:idx + 1] = self.children

    # -- queries -----------------------------------------------------------

    def iter(self):
        """Yield self + all descendant Nodes in document order (explicit
        stack; the reversed-index loop beats a genexpr+extend per visit —
        measured +31% end-to-end). MUST stay a lazy generator: the
        cleaner removes nodes mid-iteration and relies on pruned subtrees
        not being visited (a prebuilt list would walk them)."""
        stack = [self]
        pop = stack.pop
        push = stack.append
        node_t = Node
        while stack:
            n = pop()
            yield n
            children = n.children
            for i in range(len(children) - 1, -1, -1):
                c = children[i]
                if type(c) is node_t:
                    push(c)

    def find_all(self, *tags: str) -> list["Node"]:
        # Same document-order walk as iter(), inlined: the per-node
        # generator resume cost dominates find_all's profile (6% of
        # whole-document extraction) and a plain loop halves it.
        want1 = tags[0] if len(tags) == 1 else None
        want = None if want1 is not None else set(tags)
        out: list[Node] = []
        stack = [self]
        pop = stack.pop
        push = stack.append
        node_t = Node
        while stack:
            n = pop()
            if (n.tag == want1) if want1 is not None else (n.tag in want):
                out.append(n)
            children = n.children
            for i in range(len(children) - 1, -1, -1):
                c = children[i]
                if type(c) is node_t:
                    push(c)
        return out

    def find_first(self, *tags: str) -> "Node | None":
        want = set(tags)
        stack = [self]
        pop = stack.pop
        push = stack.append
        node_t = Node
        while stack:
            n = pop()
            if n.tag in want:
                return n
            children = n.children
            for i in range(len(children) - 1, -1, -1):
                c = children[i]
                if type(c) is node_t:
                    push(c)
        return None

    def text(self) -> str:
        """Concatenated descendant text, whitespace-normalized.

        Single flat collect + one normalize pass — equivalent to joining
        per-level (whitespace collapses either way) without the
        intermediate per-node strings."""
        parts: list[str] = []
        self._collect_text(parts)
        return " ".join(" ".join(parts).split())

    def _collect_text(self, parts: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                c._collect_text(parts)

    def own_text(self) -> str:
        return " ".join(
            " ".join(c for c in self.children if isinstance(c, str)).split()
        )

    def attr(self, name: str) -> str:
        return self.attrs.get(name, "")

    def id_class(self) -> str:
        attrs = self.attrs
        if not attrs:  # most nodes are attribute-less — skip the concat
            return ""
        get = attrs.get
        return (get("id", "") + " " + get("class", "") + " "
                + get("name", "")).strip()

    def prev_siblings(self) -> list["Node"]:
        """Element siblings BEFORE this node, nearest first."""
        if self.parent is None:
            return []
        out: list[Node] = []
        for c in self.parent.children:
            if c is self:
                break
            if isinstance(c, Node):
                out.append(c)
        out.reverse()
        return out

    def __repr__(self) -> str:  # debug aid only
        return f"<Node {self.tag} id={self.attr('id')!r} class={self.attr('class')!r}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    # html.parser lowercases tag names already.
    def handle_starttag(self, tag: str, attrs) -> None:
        cur = self.stack[-1]
        if cur.tag == "p" and tag in _P_CLOSERS:
            self.stack.pop()
            cur = self.stack[-1]
        attrd: dict[str, str] = {}
        for k, v in attrs:
            if k not in attrd:
                attrd[k] = v if v is not None else ""
        node = Node(tag, attrd)
        cur.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        attrd: dict[str, str] = {}
        for k, v in attrs:
            if k not in attrd:
                attrd[k] = v if v is not None else ""
        self.stack[-1].append(Node(tag, attrd))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # Pop to the nearest matching open tag; ignore if none.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            # Merge adjacent text chunks: chunk boundaries are a parser
            # artifact (html.parser splits at '<' and charrefs), not
            # document structure — and Node.text() joins chunks with a
            # space, so unmerged chunks would leak phantom whitespace.
            ch = self.stack[-1].children
            if ch and isinstance(ch[-1], str):
                ch[-1] += data
            else:
                ch.append(data)

    # Comments, PIs, declarations are dropped at parse time — observably the
    # same as the reference cleaner's remove-comments step
    # [R: goose/cleaners.py::DocumentCleaner remove comments].
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


def parse_html(payload: str) -> Node:
    """Parse an HTML payload into a DOM tree; never raises on bad markup."""
    builder = _TreeBuilder()
    try:
        builder.feed(payload)
        builder.close()
    except Exception:
        # Tolerant by contract: salvage whatever tree was built.
        pass
    return builder.root
