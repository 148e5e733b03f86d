"""Lucene TEXT_MATCH subset: parser, scan-path vs postings-path
equivalence, and the dialect SQL compilation target."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pinot_spark.operators.lucene import (
    And, Fuzzy, MatchNone, Near, Not, Or, Phrase, Prefix, Term, TermRange,
    compile_predicate, compile_sql, parse_lucene, search_index,
)


def test_parser_shapes():
    assert parse_lucene("java") == Term("java")
    assert parse_lucene('"machine learning"') == Phrase(["machine", "learning"])
    assert parse_lucene("quer*") == Prefix("quer")
    assert parse_lucene("spark~1") == Fuzzy("spark", 1)
    assert parse_lucene("spark~") == Fuzzy("spark", 2)
    n = parse_lucene("(a OR b) AND NOT c")
    assert isinstance(n, And) and isinstance(n.parts[0], Or) and isinstance(n.parts[1], Not)
    # bare juxtaposition = OR (Lucene default operator)
    assert isinstance(parse_lucene("a b"), Or)
    # +term == term; boost parsed and dropped
    assert parse_lucene("+java") == Term("java")
    assert parse_lucene("java^2") == Term("java")


def test_parser_must_not_semantics():
    """Classic-QueryParser NOT: juxtaposed negations are MUST_NOT over
    the SHOULD clauses; pure-negative queries match nothing
    (TextMatchFilterOperator → Lucene QueryParser)."""
    # 'a NOT b' = a AND NOT b — not Or([a, Not(b)])
    assert parse_lucene("a NOT b") == And([Term("a"), Not(Term("b"))])
    assert parse_lucene("a b -c") == And([Or([Term("a"), Term("b")]), Not(Term("c"))])
    # pure negative — matches nothing
    assert parse_lucene("-java") == MatchNone()
    assert parse_lucene("NOT java") == MatchNone()
    assert parse_lucene("-a -b") == MatchNone()
    # explicit AND NOT still plain negation inside the conjunction
    assert parse_lucene("a AND NOT b") == And([Term("a"), Not(Term("b"))])


def test_parser_proximity_and_range():
    assert parse_lucene('"big data"~3') == Near(["big", "data"], 3)
    assert parse_lucene('"a b"') == Phrase(["a", "b"])
    assert parse_lucene("[aa TO bb]") == TermRange("aa", "bb", True, True)
    assert parse_lucene("{aa TO bb}") == TermRange("aa", "bb", False, False)
    assert parse_lucene("[aa TO *]") == TermRange("aa", None, True, True)


def test_parser_rejects_garbage():
    with pytest.raises(ValueError):
        parse_lucene("(a OR b")


def test_compile_sql_shape():
    sql = compile_sql("text", '"a b" AND NOT c*')
    assert "RLIKE" in sql and "startswith" in sql and "NOT" in sql


def test_proximity_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "big shiny data lake"),       # big..data gap 1
            (2, "big data lake"),             # adjacent
            (3, "data is big"),               # reversed, gap 1
            (4, "big lake"),                  # missing term
        ],
        "id int, text string",
    )
    def ids(q):
        return sorted(r.id for r in df.filter(compile_predicate("text", q)).collect())

    assert ids('"big data"') == [2]
    assert ids('"big data"~1') == [1, 2]
    # reversal: 'data ... big' at distance 2 costs |p2-p1-1| = 3 here
    assert ids('"big data"~3') == [1, 2, 3]
    assert ids("[cat TO dog]") == [1, 2, 3]   # 'data' in range
    assert ids("{data TO data}") == []        # exclusive empty range
    assert ids("-big") == []                  # pure negative matches nothing
    assert ids("lake NOT shiny") == [2, 4]    # MUST_NOT over SHOULD


def test_scan_vs_postings_equivalence(spark, sf_dir):
    """Both evaluation paths must select the same documents."""
    from pinot_spark.catalog import load_tables
    from pinot_spark.operators.text_index import build_text_index

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    index = build_text_index(docs, "doc_id", "text")
    for q in [
        "vector AND filter",
        "vector OR spark~1",
        '"table scan" AND NOT join',
        "filt* AND vector",
        '"vector filter"~4',
        "[vecto TO vectz]",
    ]:
        scan_ids = sorted(
            r.doc_id for r in docs.filter(compile_predicate("text", q)).select("doc_id").collect()
        )
        idx_ids = sorted(
            r.doc_id
            for r in search_index(index, docs, "doc_id", q, text_col="text").collect()
        )
        assert scan_ids == idx_ids, f"path divergence for {q!r}"
        assert scan_ids, f"query {q!r} selected nothing — weak test"


def test_dialect_text_match_rewrite(spark, sf_dir):
    """PinotEngine-style SQL with TEXT_MATCH evaluates through the
    compiled rewrite and matches the Column path."""
    from pinot_spark.catalog import load_tables
    from pinot_spark.dialect import rewrite_functions

    load_tables(spark, sf_dir)
    sql = rewrite_functions(
        "SELECT count(*) AS n FROM documents WHERE TEXT_MATCH(text, 'vector AND filter')"
    )
    n_sql = spark.sql(sql).collect()[0].n
    docs = load_tables(spark, sf_dir)["documents"]
    n_col = docs.filter(compile_predicate("text", "vector AND filter")).count()
    assert n_sql == n_col and n_sql > 0
