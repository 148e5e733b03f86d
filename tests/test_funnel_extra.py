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
