"""Lucene query-syntax subset for TEXT_MATCH.

Pinot evaluates TEXT_MATCH('col', '<lucene query>') with Lucene's classic
QueryParser over a StandardAnalyzer index
(pinot-core/.../operator/filter/TextMatchFilterOperator.java; index types
StandardIndexes.java:69-141). This module implements the subset that
covers Pinot's documented TEXT_MATCH usage:

- terms:            ``java``
- phrases:          ``"machine learning"`` (consecutive tokens)
- boolean:          ``a AND b``, ``a OR b``, ``NOT a``, ``-a``, ``+a``
- grouping:         ``(a OR b) AND c``
- prefix wildcard:  ``quer*``
- fuzzy:            ``spark~`` / ``spark~1`` (Levenshtein edit distance,
                    default 2 like Lucene)

Bare juxtaposition (``a b``) is OR, matching Lucene's default
``OR``-operator config used by Pinot.

Two compilation targets:

- :func:`compile_predicate` — a pure Column predicate over the raw text
  (tokenize → array ops / rlike), whole-stage-codegen'd scan path; this
  is the fallback Pinot itself uses when no text index exists.
- :func:`search_index` — plan against a postings table built by
  operators.text_index.build_text_index: term/prefix/fuzzy nodes become
  partition-prunable semi joins, AND = postings intersect, OR = union,
  NOT = anti join against the doc universe. At 100 TB the postings for
  one term are a tiny pruned fraction of the corpus — the inverted-index
  advantage — while the scan path reads everything.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pinot_spark.operators.text_index import tokenize

# --- AST -------------------------------------------------------------------


@dataclass
class Term:
    text: str


@dataclass
class Prefix:
    text: str


@dataclass
class Fuzzy:
    text: str
    max_edits: int = 2


@dataclass
class Phrase:
    tokens: list[str]


@dataclass
class And:
    parts: list


@dataclass
class Or:
    parts: list


@dataclass
class Not:
    part: object


# --- parser ----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<phrase>"(?P<phrase_body>[^"]*)") |
        (?P<op>AND\b|OR\b|NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-) |
        (?P<word>[^\s()"+-]+)
    )""",
    re.X,
)


def _lex(q: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"bad TEXT_MATCH query at {q[pos:]!r}")
            break
        pos = m.end()
        for kind in ("lparen", "rparen", "op", "plus", "minus", "word"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
        else:
            out.append(("phrase", m.group("phrase_body")))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek()[0] is not None:
            raise ValueError(f"trailing tokens in TEXT_MATCH query: {self.toks[self.i:]}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while True:
            kind, val = self.peek()
            if kind == "op" and val == "OR":
                self.next()
                parts.append(self.and_expr())
            elif kind in ("lparen", "phrase", "word", "plus", "minus") or (
                kind == "op" and val == "NOT"
            ):
                # bare juxtaposition = OR (Lucene default operator)
                parts.append(self.and_expr())
            else:
                break
        return parts[0] if len(parts) == 1 else Or(parts)

    def and_expr(self):
        parts = [self.unary()]
        while True:
            kind, val = self.peek()
            if kind == "op" and val == "AND":
                self.next()
                parts.append(self.unary())
            else:
                break
        return parts[0] if len(parts) == 1 else And(parts)

    def unary(self):
        kind, val = self.peek()
        if kind == "op" and val == "NOT":
            self.next()
            return Not(self.unary())
        if kind == "minus":
            self.next()
            return Not(self.unary())
        if kind == "plus":  # MUST → plain operand (we have no scoring)
            self.next()
            return self.unary()
        return self.atom()

    def atom(self):
        kind, val = self.next()
        if kind == "lparen":
            node = self.or_expr()
            k, _ = self.next()
            if k != "rparen":
                raise ValueError("unbalanced parentheses in TEXT_MATCH query")
            return node
        if kind == "phrase":
            toks = [t for t in re.split(r"[^a-z0-9]+", val.lower()) if t]
            if len(toks) == 1:
                return Term(toks[0])
            return Phrase(toks)
        if kind == "word":
            m = re.fullmatch(r"(.*?)~(\d*)", val)
            if m and m.group(1):
                return Fuzzy(m.group(1).lower(), int(m.group(2)) if m.group(2) else 2)
            if val.endswith("*") and len(val) > 1:
                return Prefix(val[:-1].lower())
            return Term(val.lower())
        raise ValueError(f"unexpected token {val!r} in TEXT_MATCH query")


def parse_lucene(query: str):
    """Parse a TEXT_MATCH query string into an AST."""
    return _Parser(_lex(query)).parse()


# --- scan-path compilation -------------------------------------------------


def compile_predicate(text_col, query: str) -> Column:
    """Compile a Lucene query to a Column predicate over the raw text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c)
    return _compile(parse_lucene(query), c, toks)


def _compile(node, c: Column, toks: Column) -> Column:
    if isinstance(node, Term):
        return F.array_contains(toks, node.text)
    if isinstance(node, Prefix):
        return F.exists(toks, lambda t: t.startswith(node.text))
    if isinstance(node, Fuzzy):
        return F.exists(toks, lambda t: F.levenshtein(t, F.lit(node.text)) <= node.max_edits)
    if isinstance(node, Phrase):
        # consecutive tokens: regex over the lowercased text with
        # non-alphanumeric separators and token boundaries
        pat = (
            "(^|[^a-z0-9])"
            + "[^a-z0-9]+".join(re.escape(t) for t in node.tokens)
            + "($|[^a-z0-9])"
        )
        return F.lower(c).rlike(pat)
    if isinstance(node, And):
        out = _compile(node.parts[0], c, toks)
        for p in node.parts[1:]:
            out = out & _compile(p, c, toks)
        return out
    if isinstance(node, Or):
        out = _compile(node.parts[0], c, toks)
        for p in node.parts[1:]:
            out = out | _compile(p, c, toks)
        return out
    if isinstance(node, Not):
        return ~_compile(node.part, c, toks)
    raise AssertionError(node)


# --- SQL-string compilation (dialect rewrite target) -----------------------

_TOKS_SQL = "filter(split(lower({c}), '[^a-z0-9]+'), t -> length(t) > 0)"


def compile_sql(col_sql: str, query: str) -> str:
    """Compile a Lucene query to a Spark SQL boolean expression string —
    the TEXT_MATCH rewrite target for dialect.rewrite_functions."""
    toks = _TOKS_SQL.format(c=col_sql)
    return _compile_sql(parse_lucene(query), col_sql, toks)


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _compile_sql(node, col_sql: str, toks: str) -> str:
    if isinstance(node, Term):
        return f"array_contains({toks}, {_sq(node.text)})"
    if isinstance(node, Prefix):
        return f"exists({toks}, t -> startswith(t, {_sq(node.text)}))"
    if isinstance(node, Fuzzy):
        return f"exists({toks}, t -> levenshtein(t, {_sq(node.text)}) <= {node.max_edits})"
    if isinstance(node, Phrase):
        pat = (
            "(^|[^a-z0-9])"
            + "[^a-z0-9]+".join(re.escape(t) for t in node.tokens)
            + "($|[^a-z0-9])"
        )
        return f"(lower({col_sql}) RLIKE {_sq(pat)})"
    if isinstance(node, And):
        return "(" + " AND ".join(_compile_sql(p, col_sql, toks) for p in node.parts) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(_compile_sql(p, col_sql, toks) for p in node.parts) + ")"
    if isinstance(node, Not):
        return f"(NOT {_compile_sql(node.part, col_sql, toks)})"
    raise AssertionError(node)


# --- postings-path compilation ---------------------------------------------


def search_index(
    index: DataFrame,
    docs: DataFrame,
    id_col: str,
    query: str,
    text_col: str | None = None,
) -> DataFrame:
    """Evaluate a Lucene query against a postings table; returns the
    matching doc ids (one column, ``id_col``).

    Term/prefix/fuzzy nodes resolve on the postings (partition-prunable
    by term); AND intersects id sets, OR unions, NOT anti-joins against
    the document universe. Phrase nodes need positions the postings
    don't carry — they fall back to the scan predicate over ``docs``
    (requires ``text_col``), exactly like Pinot's no-index fallback.
    """
    node = parse_lucene(query)
    universe = docs.select(id_col)
    return _plan(node, index, docs, universe, id_col, text_col)


def _plan(node, index, docs, universe, id_col, text_col) -> DataFrame:
    if isinstance(node, Term):
        return index.filter(F.col("term") == node.text).select(id_col).distinct()
    if isinstance(node, Prefix):
        return index.filter(F.col("term").startswith(node.text)).select(id_col).distinct()
    if isinstance(node, Fuzzy):
        return (
            index.filter(F.levenshtein(F.col("term"), F.lit(node.text)) <= node.max_edits)
            .select(id_col)
            .distinct()
        )
    if isinstance(node, Phrase):
        if text_col is None:
            raise ValueError("phrase query needs text_col for the scan fallback")
        return docs.filter(compile_predicate(text_col, '"' + " ".join(node.tokens) + '"')).select(
            id_col
        )
    if isinstance(node, And):
        out = _plan(node.parts[0], index, docs, universe, id_col, text_col)
        for p in node.parts[1:]:
            out = out.join(
                _plan(p, index, docs, universe, id_col, text_col), id_col, "left_semi"
            )
        return out
    if isinstance(node, Or):
        out = _plan(node.parts[0], index, docs, universe, id_col, text_col)
        for p in node.parts[1:]:
            out = out.unionByName(_plan(p, index, docs, universe, id_col, text_col))
        return out.distinct()
    if isinstance(node, Not):
        inner = _plan(node.part, index, docs, universe, id_col, text_col)
        return universe.join(inner, id_col, "left_anti")
    raise AssertionError(node)
