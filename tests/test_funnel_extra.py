"""FUNNELCOUNT + FUNNELEVENTSFUNCTIONEVAL: deterministic fixtures locking
the reference semantics (SetMergeStrategy retainAll cascade; default-mode
sliding-window match with event consumption)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from pinot_spark.operators.funnel import funnel_count, funnel_events_eval


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_count_progressive_intersection(spark):
    rows = [
        # u1: view+click+purchase (counts in all three)
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase only — NOT in step1 set, so never counted
        (2, _ts(0), "purchase"),
        # u3: view only
        (3, _ts(0), "view"),
        # u4: click+view but NO purchase (order irrelevant for FUNNELCOUNT)
        (4, _ts(5), "click"), (4, _ts(9), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    [row] = funnel_count(df, "user_id", steps).collect()
    # S1={1,3,4}, S1∩S2={1,4}, S1∩S2∩S3={1}
    assert row.step_counts == [3, 2, 1]


def test_funnel_events_eval_window_and_consumption(spark):
    rows = [
        # u1: complete funnel within window
        (1, _ts(0), "view", "a"), (1, _ts(1), "click", "b"), (1, _ts(2), "purchase", "c"),
        # u2: purchase outside the 5-minute window -> no match
        (2, _ts(0), "view", "d"), (2, _ts(1), "click", "e"), (2, _ts(30), "purchase", "f"),
        # u3: two complete funnels; events of the first must not be reused
        (3, _ts(0), "view", "g"), (3, _ts(1), "click", "h"), (3, _ts(2), "purchase", "i"),
        (3, _ts(3), "view", "j"), (3, _ts(4), "click", "k"), (3, _ts(5), "purchase", "l"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string, tag string")
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    out = {
        r.user_id: r.matched_events
        for r in funnel_events_eval(df, "user_id", "ts", 5 * 60 * 1000, steps, ["tag"]).collect()
    }
    assert out[1] == ["a", "b", "c"]
    assert out[2] == []
    assert out[3] == ["g", "h", "i", "j", "k", "l"]


def test_funnel_max_step_window_modes(spark):
    from pinot_spark.operators.funnel import funnel_max_step_window

    steps3 = [F.col("e") == s for s in ("A", "B", "C")]
    W = 60 * 60 * 1000  # 1h window

    def run(rows, modes=None):
        df = spark.createDataFrame(rows, "user_id int, ts timestamp, e string")
        out = funnel_max_step_window(df, "user_id", "ts", W, steps3, modes)
        return {r.user_id: r.max_step for r in out.collect()}

    # default mode: interleaved foreign steps don't reset (A, C, B, C → 3)
    rows = [(1, _ts(0), "A"), (1, _ts(1), "C"), (1, _ts(2), "B"), (1, _ts(3), "C")]
    assert run(rows)[1] == 3
    # strict_order: the out-of-sequence C at minute 1 ends the attempt at 1
    assert run(rows, {"strict_order"})[1] == 1
    # strict_deduplication: A, B, B, C → the repeated B ends the attempt
    # at 2 (and no later window has a fresh A anchor), while default
    # mode ignores the repeat and completes all 3 steps
    rows = [(2, _ts(0), "A"), (2, _ts(1), "B"), (2, _ts(2), "B"), (2, _ts(3), "C")]
    assert run(rows, {"strict_deduplication"})[2] == 2
    assert run(rows)[2] == 3
    # strict_increase: same-timestamp B doesn't advance past A's match
    rows = [(3, _ts(0), "A"), (3, _ts(0), "B"), (3, _ts(2), "C")]
    assert run(rows, {"strict_increase"})[3] == 1
    assert run(rows)[3] == 3
    # window: B outside the 1h window never matches
    rows = [(4, _ts(0), "A"), (4, dt.datetime(2024, 1, 1, 2, 0), "B")]
    assert run(rows)[4] == 1


def test_step_duration_stats_strict_increase_non_advancing_repeat(spark):
    """Reference FunnelStepDurationStatsAggregationFunction.java:243-250
    sets previousTimestamp only when the step ADVANCES — so a
    non-advancing repeat (A@t0, A@t1) must not poison the strict_increase
    check for a matching B sharing t1: the funnel still completes."""
    from pinot_spark.operators.funnel import funnel_step_duration_stats_window

    steps2 = [F.col("e") == s for s in ("A", "B")]
    W = 60 * 60 * 1000
    rows = [(1, _ts(0), "A"), (1, _ts(1), "A"), (1, _ts(1), "B")]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, e string")
    out = {
        r.user_id: r.duration_stats
        for r in funnel_step_duration_stats_window(
            df, "user_id", "ts", W, steps2, ["COUNT"], {"strict_increase"}
        ).collect()
    }
    # both steps reached: A@t0 advances (prev_ts=t0), the repeat A@t1
    # does not advance and must NOT update prev_ts, so B@t1 matches.
    assert out[1] == [1.0, 1.0]


def test_partial_upsert_all_strategies(spark):
    """UpsertConfig.Strategy full set (UpsertConfig.java:40-42)."""
    from pinot_spark.operators.upsert import partial_upsert_view

    rows = [
        # key, seq, a,    b,    c,  d
        (1, 1, "x", 10, 1.0, "p"),
        (1, 2, None, 20, 2.0, "q"),
        (1, 3, "z", 5, None, "p"),
    ]
    df = spark.createDataFrame(rows, "k int, seq int, a string, b int, c double, d string")
    [r] = partial_upsert_view(
        df, ["k"], "seq",
        {"a": "OVERWRITE", "b": "INCREMENT", "c": "FORCE_OVERWRITE", "d": "UNION"},
    ).collect()
    assert r.a == "z"        # latest NON-NULL (skips seq=2's null)
    assert r.b == 35         # increment = sum
    assert r.c is None       # force overwrite takes latest even if null
    assert r.d == ["p", "q"]

    [r2] = partial_upsert_view(df, ["k"], "seq", {"a": "IGNORE", "b": "APPEND"}).collect()
    assert r2.a == "x"             # first value kept
    assert r2.b == [10, 20, 5]     # arrival order by comparison
