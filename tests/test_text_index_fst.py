"""FST-index analog: regex over dictionary + semi join == row-wise rlike."""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.text_index import regex_match_dictionary


def test_dictionary_regex_equals_rowwise(spark, sf_dir):
    part = load_tables(spark, sf_dir)["part"]
    pattern = "^Brand#[1-3]$"
    via_dict = regex_match_dictionary(part, "p_brand", pattern)
    via_rows = part.filter(F.col("p_brand").rlike(pattern))
    assert via_dict.count() == via_rows.count() > 0
    a = sorted(r.p_partkey for r in via_dict.select("p_partkey").collect())
    b = sorted(r.p_partkey for r in via_rows.select("p_partkey").collect())
    assert a == b
    # the dictionary side must broadcast (no shuffle of the fact table)
    plan = via_dict._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_term_pruned_postings_equal_unpruned(spark, sf_dir):
    """Round-17: build_text_index(terms=...) must produce exactly the
    unpruned postings restricted to those terms (the partition-pruned
    posting-list read of a persisted index)."""
    from pinot_spark.operators.text_index import build_text_index

    docs = load_tables(spark, sf_dir)["documents"]
    terms = ["hash", "merge"]
    full = build_text_index(docs, "doc_id", "text").filter(
        F.col("term").isin(terms)
    )
    pruned = build_text_index(docs, "doc_id", "text", terms=terms)
    a = sorted((r.term, r.doc_id) for r in full.collect())
    b = sorted((r.term, r.doc_id) for r in pruned.collect())
    assert a == b and len(a) > 0


def test_payload_postings_search_equals_join_back(spark, sf_dir):
    """Round-17: payload-carrying postings + grouped search_all must
    equal the two-scan join-back reference (one corpus scan instead of
    two)."""
    from pinot_spark.operators.text_index import build_text_index, search_all

    docs = load_tables(spark, sf_dir)["documents"]
    terms = ["hash", "merge"]
    # reference: id-only postings, semi join back for lang
    hits_ref = search_all(
        build_text_index(docs, "doc_id", "text"), "doc_id", terms
    )
    ref = sorted(
        (r.doc_id, r.lang)
        for r in docs.join(hits_ref, "doc_id", "left_semi")
        .select("doc_id", "lang")
        .collect()
    )
    # payload path: lang rides the posting rows
    got = sorted(
        (r.doc_id, r.lang)
        for r in search_all(
            build_text_index(
                docs, "doc_id", "text", terms=terms, payload_cols=["lang"]
            ),
            ["doc_id", "lang"],
            terms,
        ).collect()
    )
    assert ref == got and len(got) > 0


def test_term_pruned_rawsplit_fastpath_edge_cases(spark, sf_dir):
    """Round-17 closing: with terms given, the raw split feeds
    array_intersect directly (no array_distinct, no length>0 lambda).
    Intersect must absorb both passes: duplicates collapse, empty tokens
    and out-of-set tokens drop, NULL text yields no postings — identical
    to the safe tokenize+distinct path on pathological inputs."""
    from pinot_spark.operators.text_index import build_text_index, tokenize

    docs = spark.createDataFrame(
        [
            (1, "hash hash merge"),           # duplicates
            (2, "  ,,hash!! "),               # empty boundary tokens
            (3, None),                        # NULL text
            (4, ""),                          # empty text
            (5, "HASH Merge hAsH"),           # case folding
            (6, "smash hashing"),             # substrings must NOT match
            (7, "a-b_c hash,merge.hash"),     # punctuation splits
        ],
        ["doc_id", "text"],
    )
    terms = ["Hash", "merge"]  # caller-side case handled by .lower()
    safe = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_intersect(
                    F.array_distinct(tokenize("text")),
                    F.array(*[F.lit(t.lower()) for t in terms]),
                )
            ).alias("term"),
        )
        .select("term", "doc_id")
    )
    fast = build_text_index(docs, "doc_id", "text", terms=terms)
    a = sorted((r.term, r.doc_id) for r in safe.collect())
    b = sorted((r.term, r.doc_id) for r in fast.collect())
    assert a == b
    assert b == [
        ("hash", 1), ("hash", 2), ("hash", 5), ("hash", 7),
        ("merge", 1), ("merge", 5), ("merge", 7),
    ]
    # degenerate empty term routes to the safe path and still prunes
    with_empty = build_text_index(docs, "doc_id", "text", terms=["hash", ""])
    c = sorted((r.term, r.doc_id) for r in with_empty.collect())
    assert c == [("hash", 1), ("hash", 2), ("hash", 5), ("hash", 7)]


def test_search_all_count_star_equals_distinct_reference(spark, sf_dir):
    """Round-17 closing: search_all counts postings with count(*) (the
    index is distinct on (term, id) by construction). Must equal the
    count_distinct reference on the real corpus, and the physical plan
    must NOT contain the two-phase distinct-aggregate shape (an extra
    Exchange per search)."""
    from pinot_spark.operators.text_index import build_text_index, search_all

    docs = load_tables(spark, sf_dir)["documents"]
    terms = ["hash", "merge"]
    index = build_text_index(docs, "doc_id", "text", terms=terms)
    got = search_all(index, "doc_id", terms)
    # reference: explicit distinct-count intersect over the same index
    ref = (
        index.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("__nt"))
        .filter(F.col("__nt") == len(terms))
        .select("doc_id")
    )
    # capture the plan BEFORE collect: the post-AQE explain repeats the
    # plan (Final + Initial sections) and would double the exchange count
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "simple"
    )
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(r.doc_id for r in ref.collect())
    assert a == b and len(a) > 0
    assert "count(distinct" not in plan.lower()
    # exactly the one partial/final aggregation exchange — the two-phase
    # distinct rewrite would add a second
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_search_all_distinct_postings_false_duplicate_safe(spark):
    """ADVICE r17: an externally-built postings table with duplicate
    (term, id) rows must not false-positive through the count(*)
    intersection — distinct_postings=False routes to the duplicate-safe
    count_distinct(term) shape."""
    from pinot_spark.operators.text_index import search_all

    postings = spark.createDataFrame(
        # doc 1 has 'hash' twice and no 'merge' → must NOT match
        [("hash", 1), ("hash", 1), ("hash", 2), ("merge", 2)],
        "term string, id int",
    )
    fast = {r["id"] for r in search_all(postings, "id", ["hash", "merge"]).collect()}
    safe = {
        r["id"]
        for r in search_all(
            postings, "id", ["hash", "merge"], distinct_postings=False
        ).collect()
    }
    assert safe == {2}
    assert fast == {1, 2}  # documents the precondition violation mode
