"""Lucene query-syntax subset for TEXT_MATCH.

Pinot evaluates TEXT_MATCH('col', '<lucene query>') with Lucene's classic
QueryParser over a StandardAnalyzer index
(pinot-core/.../operator/filter/TextMatchFilterOperator.java; index types
StandardIndexes.java:69-141). This module implements the subset that
covers Pinot's documented TEXT_MATCH usage:

- terms:            ``java``
- phrases:          ``"machine learning"`` (consecutive tokens)
- proximity:        ``"big data"~3`` (sloppy phrase; 2-term slop exact —
                    |p2 - p1 - 1| <= slop, covering reversal at slop>=2
                    like Lucene; >2 terms approximated as consecutive
                    pairs each within the slop budget)
- ranges:           ``[a TO b]`` inclusive / ``{a TO b}`` exclusive over
                    indexed terms; ``*`` endpoints open the bound
- boolean:          ``a AND b``, ``a OR b``, ``NOT a``, ``-a``, ``+a``
- boost:            ``term^2`` parsed and ignored (no scoring)
- grouping:         ``(a OR b) AND c``
- prefix wildcard:  ``quer*``
- fuzzy:            ``spark~`` / ``spark~1`` (Levenshtein edit distance,
                    default 2 like Lucene)

Bare juxtaposition (``a b``) is OR, matching Lucene's default
``OR``-operator config used by Pinot.  When a juxtaposed/OR clause list
mixes NOT/``-`` operands with positive clauses, the negations are
MUST_NOT over the whole clause list (``a NOT b`` = a AND NOT b), and a
pure-negative query matches nothing — Lucene classic-QueryParser
behavior (TextMatchFilterOperator's parser), NOT de-Morgan OR.

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
class Near:
    """Sloppy phrase ``"a b"~slop``."""

    tokens: list[str]
    slop: int


@dataclass
class TermRange:
    """``[lo TO hi]`` / ``{lo TO hi}``; ``None`` endpoint = open bound."""

    lo: str | None
    hi: str | None
    inc_lo: bool = True
    inc_hi: bool = True


@dataclass
class MatchNone:
    """Pure-negative boolean clause list — matches no documents."""


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
        (?P<phrase>"(?P<phrase_body>[^"]*)"
            (?:~(?P<slop>\d+))?(?:\^\d+(?:\.\d+)?)?) |
        (?P<range>[\[{]\s*(?P<range_lo>[^\s\]}]+)\s+TO\s+(?P<range_hi>[^\s\]}]+)\s*[\]}]) |
        (?P<op>AND\b|OR\b|NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-) |
        (?P<word>[^\s()"+\-\[\]{}]+)
    )""",
    re.X,
)


def _lex(q: str) -> list[tuple[str, object]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"bad TEXT_MATCH query at {q[pos:]!r}")
            break
        pos = m.end()
        if m.group("phrase"):
            slop = int(m.group("slop")) if m.group("slop") else 0
            out.append(("phrase", (m.group("phrase_body"), slop)))
            continue
        if m.group("range"):
            raw = m.group("range")
            out.append(
                ("range", (m.group("range_lo"), m.group("range_hi"), raw[0] == "[", raw[-1] == "]"))
            )
            continue
        for kind in ("lparen", "rparen", "op", "plus", "minus", "word"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
    return out


class _Parser:
    def __init__(
        self,
        tokens: list[tuple[str, str]],
        case_sensitive: bool = False,
        default_and: bool = False,
    ):
        self.toks = tokens
        self.i = 0
        # analyzer/parser knobs (FieldConfig text index properties:
        # a case-sensitive Lucene analyzer keeps original case;
        # defaultOperator=AND makes bare juxtaposition conjunctive)
        self.cs = case_sensitive
        self.default_and = default_and

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
        if isinstance(node, Not):
            # Lucene classic parser: a query that is ONLY a MUST_NOT
            # clause matches nothing (there is no positive clause to
            # subtract from).
            return MatchNone()
        return node

    def or_expr(self):
        # groups: explicit OR starts a new group; juxtaposed clauses
        # stay in the current group.  With Lucene's default operator OR
        # the distinction is irrelevant (all clauses pool into one
        # SHOULD/MUST_NOT list); with defaultOperator=AND juxtaposed
        # clauses are MUST within their group and only explicit ORs
        # disjoin groups.
        groups = [[self.and_expr()]]
        while True:
            kind, val = self.peek()
            if kind == "op" and val == "OR":
                self.next()
                groups.append([self.and_expr()])
            elif kind in ("lparen", "phrase", "range", "word", "plus", "minus") or (
                kind == "op" and val == "NOT"
            ):
                groups[-1].append(self.and_expr())
            else:
                break
        parts = [p for g in groups for p in g]
        if len(parts) == 1:
            return parts[0]

        def clause_list(ps):
            # Lucene clause-list semantics: NOT/- operands in an OR /
            # juxtaposition list are MUST_NOT over the SHOULD clauses
            # ('a NOT b' = a AND NOT b), not OR'd negations; a list of
            # only negations matches nothing.
            neg = [p for p in ps if isinstance(p, Not)]
            if not neg:
                return Or(ps) if len(ps) > 1 else ps[0]
            pos = [p for p in ps if not isinstance(p, Not)]
            if not pos:
                return MatchNone()
            return And([pos[0] if len(pos) == 1 else Or(pos), *neg])

        if not self.default_and:
            return clause_list(parts)
        done = []
        for g in groups:
            if len(g) == 1:
                done.append(g[0])
                continue
            if all(isinstance(p, Not) for p in g):
                done.append(MatchNone())
                continue
            done.append(And(g))  # MUST + MUST_NOT conjunction
        if len(done) == 1:
            return done[0]
        return clause_list(done)

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
            body, slop = val
            if not self.cs:
                body = body.lower()
            toks = [t for t in re.split(r"[^a-zA-Z0-9]+", body) if t]
            if len(toks) == 1:
                return Term(toks[0])
            if slop > 0:
                return Near(toks, slop)
            return Phrase(toks)
        if kind == "range":
            lo, hi, inc_lo, inc_hi = val
            return TermRange(
                None if lo == "*" else (lo if self.cs else lo.lower()),
                None if hi == "*" else (hi if self.cs else hi.lower()),
                inc_lo,
                inc_hi,
            )
        if kind == "word":
            val = re.sub(r"\^\d+(\.\d+)?$", "", val)  # boost: parse & ignore
            m = re.fullmatch(r"(.*?)~(\d*)", val)
            fold = (lambda s: s) if self.cs else str.lower
            if m and m.group(1):
                return Fuzzy(fold(m.group(1)), int(m.group(2)) if m.group(2) else 2)
            if val.endswith("*") and len(val) > 1:
                return Prefix(fold(val[:-1]))
            return Term(fold(val))
        raise ValueError(f"unexpected token {val!r} in TEXT_MATCH query")


def parse_lucene(
    query: str, case_sensitive: bool = False, default_and: bool = False
):
    """Parse a TEXT_MATCH query string into an AST.  ``case_sensitive``
    mirrors a case-preserving Lucene analyzer config on the column;
    ``default_and`` mirrors the CLASSIC parser's defaultOperator=AND
    option (TEXT_MATCH third argument)."""
    return _Parser(_lex(query), case_sensitive, default_and).parse()


# --- scan-path compilation -------------------------------------------------


def compile_predicate(
    text_col,
    query: str,
    case_sensitive: bool = False,
    default_and: bool = False,
) -> Column:
    """Compile a Lucene query to a Column predicate over the raw text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c) if not case_sensitive else F.filter(
        F.split(c, "[^A-Za-z0-9]+"), lambda t: F.length(t) > 0
    )
    return _compile(
        parse_lucene(query, case_sensitive, default_and), c, toks,
        case_sensitive,
    )


def _token_positions(toks: Column, term: str) -> Column:
    """0-based positions of ``term`` in the token array."""
    return F.filter(
        F.transform(toks, lambda t, i: F.when(t == F.lit(term), i).otherwise(F.lit(-1))),
        lambda x: x >= 0,
    )


def _near_pair(toks: Column, t1: str, t2: str, slop: int) -> Column:
    """Lucene 2-term sloppy phrase: some positions p1 of t1, p2 of t2
    with |p2 - p1 - 1| <= slop (reversal costs 2 moves, like Lucene)."""
    p1, p2 = _token_positions(toks, t1), _token_positions(toks, t2)
    return F.exists(p1, lambda p: F.exists(p2, lambda q: F.abs(q - p - 1) <= F.lit(slop)))


def _compile(node, c: Column, toks: Column, cs: bool = False) -> Column:
    if isinstance(node, MatchNone):
        return F.lit(False)
    if isinstance(node, Near):
        out = _near_pair(toks, node.tokens[0], node.tokens[1], node.slop)
        for a, b in zip(node.tokens[1:], node.tokens[2:]):
            out = out & _near_pair(toks, a, b, node.slop)
        return out
    if isinstance(node, TermRange):
        def in_range(t):
            cond = F.lit(True)
            if node.lo is not None:
                cond = cond & (t >= node.lo if node.inc_lo else t > node.lo)
            if node.hi is not None:
                cond = cond & (t <= node.hi if node.inc_hi else t < node.hi)
            return cond

        return F.exists(toks, in_range)
    if isinstance(node, Term):
        return F.array_contains(toks, node.text)
    if isinstance(node, Prefix):
        return F.exists(toks, lambda t: t.startswith(node.text))
    if isinstance(node, Fuzzy):
        return F.exists(toks, lambda t: F.levenshtein(t, F.lit(node.text)) <= node.max_edits)
    if isinstance(node, Phrase):
        # consecutive tokens: regex over the (analyzer-folded) text with
        # non-alphanumeric separators and token boundaries
        sep = "[^a-zA-Z0-9]" if cs else "[^a-z0-9]"
        pat = (
            f"(^|{sep})"
            + f"{sep}+".join(re.escape(t) for t in node.tokens)
            + f"($|{sep})"
        )
        return (c if cs else F.lower(c)).rlike(pat)
    if isinstance(node, And):
        out = _compile(node.parts[0], c, toks, cs)
        for p in node.parts[1:]:
            out = out & _compile(p, c, toks, cs)
        return out
    if isinstance(node, Or):
        out = _compile(node.parts[0], c, toks, cs)
        for p in node.parts[1:]:
            out = out | _compile(p, c, toks, cs)
        return out
    if isinstance(node, Not):
        return ~_compile(node.part, c, toks, cs)
    raise AssertionError(node)


# --- SQL-string compilation (dialect rewrite target) -----------------------

_TOKS_SQL = "filter(split(lower({c}), '[^a-z0-9]+'), t -> length(t) > 0)"
_TOKS_SQL_CS = "filter(split({c}, '[^A-Za-z0-9]+'), t -> length(t) > 0)"


def compile_sql(
    col_sql: str,
    query: str,
    case_sensitive: bool = False,
    default_and: bool = False,
) -> str:
    """Compile a Lucene query to a Spark SQL boolean expression string —
    the TEXT_MATCH rewrite target for dialect.rewrite_functions.
    ``case_sensitive``/``default_and`` mirror the reference's per-column
    analyzer config and TEXT_MATCH options argument."""
    toks = (_TOKS_SQL_CS if case_sensitive else _TOKS_SQL).format(c=col_sql)
    return _compile_sql(
        parse_lucene(query, case_sensitive, default_and), col_sql, toks,
        case_sensitive,
    )


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _positions_sql(toks: str, term: str) -> str:
    return (
        f"filter(transform({toks}, (t, i) -> IF(t = {_sq(term)}, i, -1)), x -> x >= 0)"
    )


def _near_pair_sql(toks: str, t1: str, t2: str, slop: int) -> str:
    return (
        f"exists({_positions_sql(toks, t1)}, p -> "
        f"exists({_positions_sql(toks, t2)}, q -> abs(q - p - 1) <= {slop}))"
    )


def _compile_sql(node, col_sql: str, toks: str, cs: bool = False) -> str:
    if isinstance(node, MatchNone):
        return "false"
    if isinstance(node, Near):
        pairs = [
            _near_pair_sql(toks, a, b, node.slop)
            for a, b in zip(node.tokens, node.tokens[1:])
        ]
        return "(" + " AND ".join(pairs) + ")"
    if isinstance(node, TermRange):
        conds = []
        if node.lo is not None:
            conds.append(f"t {'>=' if node.inc_lo else '>'} {_sq(node.lo)}")
        if node.hi is not None:
            conds.append(f"t {'<=' if node.inc_hi else '<'} {_sq(node.hi)}")
        return f"exists({toks}, t -> {' AND '.join(conds) or 'true'})"
    if isinstance(node, Term):
        return f"array_contains({toks}, {_sq(node.text)})"
    if isinstance(node, Prefix):
        return f"exists({toks}, t -> startswith(t, {_sq(node.text)}))"
    if isinstance(node, Fuzzy):
        return f"exists({toks}, t -> levenshtein(t, {_sq(node.text)}) <= {node.max_edits})"
    if isinstance(node, Phrase):
        sep = "[^a-zA-Z0-9]" if cs else "[^a-z0-9]"
        pat = (
            f"(^|{sep})"
            + f"{sep}+".join(re.escape(t) for t in node.tokens)
            + f"($|{sep})"
        )
        carrier = col_sql if cs else f"lower({col_sql})"
        return f"({carrier} RLIKE {_sq(pat)})"
    if isinstance(node, And):
        return "(" + " AND ".join(_compile_sql(p, col_sql, toks, cs) for p in node.parts) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(_compile_sql(p, col_sql, toks, cs) for p in node.parts) + ")"
    if isinstance(node, Not):
        return f"(NOT {_compile_sql(node.part, col_sql, toks, cs)})"
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
    if isinstance(node, MatchNone):
        return universe.limit(0)
    if isinstance(node, Near):
        if text_col is None:
            raise ValueError("proximity query needs text_col for the scan fallback")
        c = F.col(text_col)
        return docs.filter(_compile(node, c, tokenize(c))).select(id_col)
    if isinstance(node, TermRange):
        out = index
        if node.lo is not None:
            out = out.filter(
                F.col("term") >= node.lo if node.inc_lo else F.col("term") > node.lo
            )
        if node.hi is not None:
            out = out.filter(
                F.col("term") <= node.hi if node.inc_hi else F.col("term") < node.hi
            )
        return out.select(id_col).distinct()
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
