"""Lucene-ish query-string → Column predicate compiler.

The reference's interactive surface is Kibana's search box
(/root/reference/README.md:26-42: `key: "1"`, `key: "1" and topic:
"bar"`, `message.bar: 1234` are the canonical screenshots). This module
compiles that query language to Spark Column predicates, the same way
Kibana compiles it to ES query DSL — so the whole expression
participates in Catalyst pushdown/pruning like any hand-written filter.

Supported grammar (the subset the screenshots + standard Kibana usage
exercise):

    expr    := or
    or      := and (OR and)*
    and     := unary ((AND)? unary)*        # adjacency = AND
    unary   := NOT unary | primary
    primary := '(' expr ')' | clause
    clause  := field ':' value              # equality (number | string)
             | field cmp number             # cmp ∈ {>, >=, <, <=}
             | field ':' value '*'          # prefix match
             | '_exists_' ':' field         # non-null check
             | value                        # full-text contains on the
                                            # default field
    value   := "quoted string" | bare-token

Keywords are case-insensitive. Field paths may be dotted
(``message.bar``). Bare numeric values compare numerically; quoted
values always compare as strings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"""
    \s*(
        \(|\)|:|>=|<=|>|<
      | "(?:[^"\\]|\\.)*"
      | [^\s():<>"]+
    )""", re.VERBOSE)


class QueryStringError(ValueError):
    pass


def _tokenize(qs: str) -> list[str]:
    out, pos = [], 0
    while pos < len(qs):
        m = _TOKEN_RE.match(qs, pos)
        if not m:
            raise QueryStringError(f"bad query syntax at: {qs[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _is_keyword(tok: str, kw: str) -> bool:
    return tok.upper() == kw


def _literal(raw: str):
    """Quoted → string; bare numeric → int/float; else string."""
    if raw.startswith('"'):
        return re.sub(r"\\(.)", r"\1", raw[1:-1]), True
    try:
        return int(raw), False
    except ValueError:
        pass
    try:
        return float(raw), False
    except ValueError:
        return raw, False


class _Parser:
    def __init__(self, tokens: list[str], default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        tok = self.peek()
        if tok is None:
            raise QueryStringError("unexpected end of query")
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise QueryStringError(f"trailing tokens: {self.toks[self.i:]}")
        return col

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.peek() is not None and _is_keyword(self.peek(), "OR"):
            self.take()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.unary()
        while True:
            tok = self.peek()
            if tok is None or tok == ")" or _is_keyword(tok, "OR"):
                return left
            if _is_keyword(tok, "AND"):
                self.take()
            left = left & self.unary()

    def unary(self) -> Column:
        if self.peek() is not None and _is_keyword(self.peek(), "NOT"):
            self.take()
            return ~self.unary()
        return self.primary()

    def primary(self) -> Column:
        tok = self.take()
        if tok == "(":
            inner = self.or_expr()
            if self.take() != ")":
                raise QueryStringError("missing closing paren")
            return inner
        return self.clause(tok)

    def clause(self, head: str) -> Column:
        nxt = self.peek()
        if nxt == ":":
            self.take()
            if head == "_exists_":
                return F.col(self.take()).isNotNull()
            raw = self.take()
            if not raw.startswith('"') and raw.endswith("*"):
                return F.col(head).startswith(raw[:-1])
            val, _quoted = _literal(raw)
            return F.col(head) == F.lit(val)
        if nxt in (">", ">=", "<", "<="):
            op = self.take()
            val, _ = _literal(self.take())
            col = F.col(head)
            return {"<": col < val, "<=": col <= val,
                    ">": col > val, ">=": col >= val}[op]
        # bare term → full-text contains on the default field
        val, _ = _literal(head)
        return F.col(self.default_field).contains(str(val))


def compile_query_string(qs: str,
                         default_field: str = "message.value") -> Column:
    """Compile a Kibana-style query string to a Column predicate."""
    tokens = _tokenize(qs)
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, default_field).parse()
