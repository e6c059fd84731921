"""Boolean text-query compiler [R: query.py::Query — whoosh-backed boolean
queries over article text].

The reference evaluates a project's boolean query ("(climate AND policy)
OR \"carbon tax\" NOT spam") per document in Python; here the query
compiles ONCE into a Spark Column of JVM-side predicates (word-boundary
regexp for terms, literal contains for quoted phrases), so relevance
filtering is a pushdown-friendly whole-stage-codegen expression — no
Python in the hot path at any scale.

Grammar (case-insensitive keywords):
  expr   := or
  or     := and (OR and)*
  and    := not (AND? not)*        # juxtaposition = AND, like whoosh
  not    := NOT not | atom
  atom   := '(' expr ')' | '"' phrase '"' | term
Terms match on word boundaries, case-insensitive; phrases match as
literal substrings, case-insensitive.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_TOKEN_RE = re.compile(r'\(|\)|"[^"]*"|[^\s()"]+')


class QueryParseError(ValueError):
    pass


def _tokens(query: str) -> list[str]:
    return _TOKEN_RE.findall(query)


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return tok

    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            raise QueryParseError(f"trailing token: {self.peek()!r}")
        return node

    def parse_or(self):
        node = self.parse_and()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            node = ("or", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_not()
        while True:
            tok = self.peek()
            if tok is None or tok == ")" or tok.upper() == "OR":
                return node
            if tok.upper() == "AND":
                self.next()
                tok = self.peek()
                if tok is None:
                    raise QueryParseError("AND at end of query")
            node = ("and", node, self.parse_not())

    def parse_not(self):
        tok = self.peek()
        if tok is not None and tok.upper() == "NOT":
            self.next()
            return ("not", self.parse_not())
        return self.parse_atom()

    def parse_atom(self):
        tok = self.next()
        if tok == "(":
            node = self.parse_or()
            if self.next() != ")":
                raise QueryParseError("missing )")
            return node
        if tok == ")":
            raise QueryParseError("unexpected )")
        if tok.startswith('"'):
            return ("phrase", tok.strip('"').lower())
        if tok.upper() in ("AND", "OR", "NOT"):
            raise QueryParseError(f"operator {tok!r} where term expected")
        return ("term", tok.lower())


def parse_query(query: str):
    """Query string → AST of ('and'|'or'|'not'|'term'|'phrase', ...)."""
    toks = _tokens(query)
    if not toks:
        raise QueryParseError("empty query")
    return _Parser(toks).parse()


def _term_regex(term: str) -> str:
    return r"\b" + re.escape(term) + r"\b"


def compile_query(query: str, text_col: str | Column = "text") -> Column:
    """Boolean query → Spark Column predicate (JVM-side)."""
    col = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)

    def build(node) -> Column:
        op = node[0]
        if op == "and":
            return build(node[1]) & build(node[2])
        if op == "or":
            return build(node[1]) | build(node[2])
        if op == "not":
            return ~build(node[1])
        if op == "phrase":
            return col.contains(node[1])
        return col.rlike(_term_regex(node[1]))

    return build(parse_query(query))


def query_to_duckdb_sql(query: str, text_expr: str = "text") -> str:
    """Same query → DuckDB WHERE-clause SQL (oracle parity)."""
    low = f"lower({text_expr})"

    def build(node) -> str:
        op = node[0]
        if op == "and":
            return f"({build(node[1])} AND {build(node[2])})"
        if op == "or":
            return f"({build(node[1])} OR {build(node[2])})"
        if op == "not":
            return f"(NOT {build(node[1])})"
        if op == "phrase":
            esc = node[1].replace("'", "''")
            return f"contains({low}, '{esc}')"
        # DuckDB single-quoted literals keep backslashes verbatim — only
        # quotes need doubling.
        esc = _term_regex(node[1]).replace("'", "''")
        return f"regexp_matches({low}, '{esc}')"

    return build(parse_query(query))


def match_text(query: str, text: str) -> bool:
    """Pure-Python evaluator (oracle/tests; same semantics)."""
    low = text.lower()

    def ev(node) -> bool:
        op = node[0]
        if op == "and":
            return ev(node[1]) and ev(node[2])
        if op == "or":
            return ev(node[1]) or ev(node[2])
        if op == "not":
            return not ev(node[1])
        if op == "phrase":
            return node[1] in low
        return re.search(_term_regex(node[1]), low) is not None

    return ev(parse_query(query))
