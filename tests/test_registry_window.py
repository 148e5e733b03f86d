"""Driver-window registry invariants (queries/__init__.py): the driver
evaluates the FIRST 50 registered entries each round, so ordering bugs
silently cost a whole round of verification (rounds 3-4 lesson).
"""

from __future__ import annotations

import pinot_spark.queries as Q


def test_window_priority_all_registered():
    missing = [n for n in Q._WINDOW_PRIORITY if n not in Q.QUERIES]
    assert not missing, f"window names not in registry: {missing}"


def test_window_is_exactly_the_front():
    front = list(Q.QUERIES)[: len(Q._WINDOW_PRIORITY)]
    assert front == [n for n in Q._WINDOW_PRIORITY if n in Q.QUERIES]


def test_window_has_50_slots():
    assert len(Q._WINDOW_PRIORITY) == 50


def test_verified_set_disjoint_from_window():
    overlap = set(Q._WINDOW_PRIORITY) & set(Q._VERIFIED_PRIOR_ROUNDS)
    assert not overlap, f"window re-proves already-verified queries: {overlap}"


def test_verified_names_all_registered():
    missing = [n for n in Q._VERIFIED_PRIOR_ROUNDS if n not in Q.QUERIES]
    assert not missing


def test_verified_parked_at_back():
    back = list(Q.QUERIES)[-len(Q._VERIFIED_PRIOR_ROUNDS) :]
    assert set(back) == set(Q._VERIFIED_PRIOR_ROUNDS)


def test_every_query_has_callable_and_most_have_oracles():
    for name in Q.ORACLE:
        assert name in Q.QUERIES
    rows_only = [n for n in Q.QUERIES if n not in Q.ORACLE]
    # rows-only is reserved for genuinely non-SQL-expressible operators;
    # growth here needs a justification in the query's docstring
    assert len(rows_only) <= 10, rows_only
