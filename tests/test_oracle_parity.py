"""Driver-gate mirror: every registered query with an oracle must match
DuckDB on the same parquet (unordered multiset, float-tolerant).
"""

from __future__ import annotations

import pytest

from pinot_spark import queries as Q
from tests.conftest import assert_same_rows


def _pairs():
    return sorted(Q.ORACLE.keys())


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    rel = duck.sql(Q.ORACLE[name])
    assert_same_rows(df, rel)


def test_all_queries_have_callables():
    for name in Q.ORACLE:
        assert name in Q.QUERIES
