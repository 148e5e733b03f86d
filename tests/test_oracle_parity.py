"""Driver-gate mirror: every registered query with an oracle must match
DuckDB on the same parquet (unordered multiset, float-tolerant).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType

from pinot_spark import queries as Q
from tests.conftest import assert_same_rows

# Round-18 fast-tier split: this suite is a long-running sweep; the
# default tier (pytest.ini addopts) skips it — run with -m "" for all.
pytestmark = pytest.mark.slow


def _pairs():
    return sorted(Q.ORACLE.keys())


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    rel = duck.sql(Q.ORACLE[name])
    assert_same_rows(df, rel)


@pytest.mark.parametrize("name", sorted(Q.QUERIES.keys()))
def test_no_unhashable_output_columns(spark, sf_dir, name):
    # driver-compat gate over EVERY registered query, oracle-backed or
    # not: the driver's pandas canonicalizer sort/hashes every output
    # cell — numpy arrays (ArrayType/MapType columns) are unhashable and
    # crash the whole row (CORRECTNESS_r03 fn_surface_ext, r4 funnels,
    # r5 agg_percentile_approx — which slipped through because this scan
    # only covered Q.ORACLE). Stringify via array_join/to_json instead.
    # simpleString() catches arrays/maps nested inside structs too —
    # those are equally unhashable after toPandas.
    df = Q.QUERIES[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
        or "array<" in f.dataType.simpleString()
        or "map<" in f.dataType.simpleString()
    ]
    assert not bad, (
        f"{name}: query emits array/map columns {bad}; "
        "the driver canonicalizer cannot hash these — stringify them"
    )


def test_all_queries_have_callables():
    for name in Q.ORACLE:
        assert name in Q.QUERIES


def test_every_query_has_oracle():
    # Round-5 lesson: the driver marks any windowed query without an
    # oracle entry err:no_oracle (red) — there is NO rows-only fallback.
    # Every registered query must therefore carry a DuckDB oracle twin;
    # non-SQL-expressible ops emit deterministic validated outputs
    # (exact value + within-tolerance boolean, verified pairs, or a
    # full SQL mirror of the approximate pipeline) instead.
    missing = [n for n in Q.QUERIES if n not in Q.ORACLE]
    assert not missing, f"queries without oracle twins: {missing}"
