"""RAW-sketch aggregates in window position (dialect.py
_route_raw_sketch_windows): ``RAWNAME(args) OVER (PARTITION BY keys)``
computes the per-partition sketch via the bounded grouped routes in a
materialized subquery null-safe-joined back on the partition keys —
matching the reference's one-aggregation-state-per-partition window
semantics (pinot-query-runtime WindowAggregateOperator) — while
ORDER BY / framed windows (running raw sketches) raise loudly by name.

Before round 10 this statement class died with Spark's misleading
MISSING_GROUP_BY (OVER cannot attach to the scalar-wrapped collect_set
the per-value fallbacks emit).
"""

from __future__ import annotations

import pytest

from pinot_spark.catalog import load_tables
from pinot_spark.dialect import PinotEngine


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def eng(spark, sf_dir):
    load_tables(spark, sf_dir)
    return PinotEngine(spark)


def test_raw_theta_partition_window_matches_grouped(spark, eng):
    """Every row carries its partition's sketch; estimates equal the
    grouped-route values joined back per row."""
    df = eng.sql(
        "SELECT n_name, n_regionkey, GET_THETA_SKETCH_ESTIMATE("
        "DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
        "OVER (PARTITION BY n_regionkey)) AS dc "
        "FROM nation ORDER BY n_name LIMIT 100"
    )
    got = {(r.n_name, r.n_regionkey): r.dc for r in df.collect()}
    expect = {
        (r.n_name, r.n_regionkey): float(r.dc)
        for r in spark.sql(
            "SELECT n.n_name, n.n_regionkey, g.dc FROM nation n JOIN ("
            "  SELECT n_regionkey, COUNT(DISTINCT n_nationkey) AS dc"
            "  FROM nation GROUP BY n_regionkey) g"
            " ON n.n_regionkey = g.n_regionkey"
        ).collect()
    }
    assert got == expect and len(got) == 25


def test_raw_theta_window_takes_zero_shuffle_subquery(spark, eng):
    """The materialized partition subquery rides the zero-shuffle
    grouped route: no collect_set of hashes, no pmod bucket column,
    MapInPandas partials present."""
    df = eng.sql(
        "SELECT n_name, GET_THETA_SKETCH_ESTIMATE("
        "DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
        "OVER (PARTITION BY n_regionkey)) AS dc "
        "FROM nation LIMIT 100"
    )
    plan = _plan(df)
    assert "collect_set" not in plan, plan
    assert "pmod" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_raw_hll_window_plain_and_global(spark, eng):
    rows = eng.sql(
        "SELECT n_name, GETHLLESTIMATE(DISTINCTCOUNTRAWHLL(n_nationkey, 12) "
        "OVER (PARTITION BY n_regionkey)) AS e, "
        "GETHLLESTIMATE(DISTINCTCOUNTRAWHLL(n_nationkey, 12) OVER ()) AS g "
        "FROM nation ORDER BY n_name LIMIT 100"
    ).collect()
    assert len(rows) == 25
    assert all(r.e == 5 for r in rows)  # 5 nations per region
    assert all(r.g == 25 for r in rows)  # global frame sees all keys


def test_raw_tdigest_window_where_and_tail(spark, eng):
    """WHERE applies to both the window population and the outer rows;
    ORDER BY / LIMIT tails survive the rewrite."""
    rows = eng.sql(
        "SELECT o_orderkey, o_orderstatus, GETTDIGESTQUANTILE("
        "PERCENTILERAWTDIGEST(o_totalprice, 50) "
        "OVER (PARTITION BY o_orderstatus), 50) AS p50 "
        "FROM orders WHERE o_orderkey <= 1000 "
        "ORDER BY o_orderkey LIMIT 7"
    ).collect()
    assert len(rows) == 7
    assert all(r.o_orderkey <= 1000 for r in rows)
    exact = {
        r.o_orderstatus: r.m
        for r in spark.sql(
            "SELECT o_orderstatus, percentile(o_totalprice, 0.5) AS m "
            "FROM orders WHERE o_orderkey <= 1000 GROUP BY o_orderstatus"
        ).collect()
    }
    for r in rows:
        ref = exact[r.o_orderstatus]
        assert abs(r.p50 - ref) <= 0.1 * abs(ref) + 1e-9, (r, ref)


def test_raw_window_order_by_frame_raises_loudly(eng):
    with pytest.raises(NotImplementedError, match="ORDER BY / framed window"):
        eng.sql(
            "SELECT DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
            "OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS s "
            "FROM nation"
        )
    with pytest.raises(NotImplementedError, match="ORDER BY / framed window"):
        eng.sql(
            "SELECT DISTINCTCOUNTRAWHLL(n_nationkey) "
            "OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS s FROM nation"
        )


def test_raw_window_non_canonical_raises_loudly(eng):
    with pytest.raises(NotImplementedError, match="canonical single-SELECT"):
        eng.sql(
            "SELECT n_regionkey, COUNT(*) AS n, "
            "DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) OVER () AS s "
            "FROM nation GROUP BY n_regionkey"
        )


def test_raw_call_without_over_unaffected(spark, eng):
    """A statement with a window fn elsewhere and a plain grouped raw
    call keeps the grouped routes (the window route must not fire)."""
    rows = eng.sql(
        "SELECT n_regionkey, GET_THETA_SKETCH_ESTIMATE("
        "DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey)) AS dc "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey LIMIT 10"
    ).collect()
    assert [(r.n_regionkey, r.dc) for r in rows] == [
        (i, 5.0) for i in range(5)
    ]


def test_raw_window_multiline_leading_whitespace(spark, eng):
    """Triple-quoted / multiline SQL (leading whitespace + newlines)
    must rewrite cleanly: hit offsets are computed on the SAME string
    the replacements splice into.  Regression: offsets were computed
    on the unstripped text but spliced into ``.strip()``-ed text,
    desyncing every span and corrupting the statement."""
    rows = eng.sql(
        """
        SELECT n_name,
               GET_THETA_SKETCH_ESTIMATE(
                 DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey)
                 OVER (PARTITION BY n_regionkey)) AS dc
        FROM nation
        ORDER BY n_name
        LIMIT 100;
        """
    ).collect()
    assert len(rows) == 25
    assert all(r.dc == 5.0 for r in rows)


def test_raw_window_identical_over_bodies_share_one_subquery(spark, eng):
    """Two raw-window calls with the same (call, OVER body) share ONE
    materialized grouped subquery — one source scan, one LEFT JOIN —
    while a distinct OVER body still gets its own."""
    def _rswin_views():
        return {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__rswin_")
        }

    before = _rswin_views()
    rows = eng.sql(
        "SELECT n_name, "
        "GET_THETA_SKETCH_ESTIMATE(DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
        "OVER (PARTITION BY n_regionkey)) AS a, "
        "GET_THETA_SKETCH_ESTIMATE(DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
        "OVER (PARTITION BY n_regionkey)) AS b, "
        "GET_THETA_SKETCH_ESTIMATE(DISTINCT_COUNT_RAW_THETA_SKETCH(n_nationkey) "
        "OVER ()) AS g "
        "FROM nation ORDER BY n_name LIMIT 100"
    ).collect()
    made = _rswin_views() - before
    assert len(made) == 2, f"expected 2 shared subqueries, created {sorted(made)}"
    assert len(rows) == 25
    assert all(r.a == 5.0 and r.b == 5.0 and r.g == 25.0 for r in rows)
