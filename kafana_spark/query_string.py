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
             | field ':' value '*'          # prefix match (sargable)
             | field ':' wildcard           # '*' any run / '?' one char
             | field ':' '/' regex '/'      # regex (partial match, RE2-
                                            # portable subset recommended)
             | field ':' value '~' [n]      # fuzzy: edit distance ≤ n
                                            # (Lucene default n=2)
             | '_exists_' ':' field         # non-null check
             | value                        # full-text contains on the
                                            # default field
             | value '~' [n]                # fuzzy full-text: some token
                                            # of the default field within
                                            # edit distance n
    value   := "quoted string" | bare-token

Keywords are case-insensitive. Field paths may be dotted
(``message.bar``). Bare numeric values compare numerically; quoted
values always compare as strings (and never as wildcards/fuzzy).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"""
    \s*(
        \(|\)|:|>=|<=|>|<
      | "(?:[^"\\]|\\.)*"
      | /(?:[^/\\]|\\.)*/
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


#: Lucene's default fuzziness
_FUZZY_DEFAULT = 2
_FUZZY_RE = re.compile(r"(.+?)~(\d*)$")


def _wildcard_to_like(pat: str) -> str:
    """Lucene wildcard → SQL LIKE: `*` → `%`, `?` → `_` (LIKE's own
    metachars escaped)."""
    return (pat.replace("\\", "\\\\").replace("%", "\\%")
            .replace("_", "\\_").replace("*", "%").replace("?", "_"))


def _special_clause(col: Column, raw: str) -> Column | None:
    """Regex / wildcard / fuzzy value forms of `field:value`; None when
    `raw` is a plain literal.

    The single-trailing-`*` prefix form stays `startswith` — it compiles
    to a sargable StringStartsWith that reaches parquet min/max stats;
    general wildcards/regex/fuzzy are scan-time predicates (same as ES,
    where leading-wildcard and fuzzy terms can't use the term index).
    """
    if raw.startswith("/") and raw.endswith("/") and len(raw) > 1:
        return col.rlike(re.sub(r"\\(.)", r"\1", raw[1:-1]))
    fz = _FUZZY_RE.fullmatch(raw)
    if fz:
        n = int(fz.group(2)) if fz.group(2) else _FUZZY_DEFAULT
        return F.levenshtein(col, F.lit(fz.group(1))) <= n
    if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw:
        return col.startswith(raw[:-1])
    if "*" in raw or "?" in raw:
        return col.like(_wildcard_to_like(raw))
    return None


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
            if not raw.startswith('"'):
                special = _special_clause(F.col(head), raw)
                if special is not None:
                    return special
            val, _quoted = _literal(raw)
            return F.col(head) == F.lit(val)
        if nxt in (">", ">=", "<", "<="):
            op = self.take()
            val, _ = _literal(self.take())
            col = F.col(head)
            return {"<": col < val, "<=": col <= val,
                    ">": col > val, ">=": col >= val}[op]
        # bare term → full-text contains on the default field; `term~n`
        # → fuzzy: some whitespace token within edit distance n
        fz = _FUZZY_RE.fullmatch(head) if not head.startswith('"') else None
        if fz:
            n = int(fz.group(2)) if fz.group(2) else _FUZZY_DEFAULT
            return F.exists(
                F.split(F.col(self.default_field), r"\s+"),
                lambda t: F.levenshtein(t, F.lit(fz.group(1))) <= n)
        val, _ = _literal(head)
        return F.col(self.default_field).contains(str(val))


def compile_query_string(qs: str,
                         default_field: str = "message.value") -> Column:
    """Compile a Kibana-style query string to a Column predicate."""
    tokens = _tokenize(qs)
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, default_field).parse()
