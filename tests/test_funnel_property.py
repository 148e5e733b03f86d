"""Property test: the single-shuffle higher-order funnel fold and the
applyInPandas implementation are independent codepaths — they must agree
on arbitrary event sequences (hypothesis-generated).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pinot_spark.operators.funnel import funnel_max_step, funnel_max_step_pandas

_EVENTS = ["view", "click", "purchase", "other"]


@st.composite
def event_log(draw):
    n_users = draw(st.integers(1, 4))
    rows = []
    for u in range(n_users):
        n_ev = draw(st.integers(0, 8))
        # offsets may repeat → equal timestamps exercise tie semantics
        offsets = draw(st.lists(st.integers(0, 20), min_size=n_ev, max_size=n_ev))
        kinds = draw(st.lists(st.sampled_from(_EVENTS), min_size=n_ev, max_size=n_ev))
        for off, kind in zip(offsets, kinds):
            rows.append((u, datetime(2024, 1, 1) + timedelta(minutes=off), kind))
    return rows


@settings(max_examples=12, deadline=None)
@given(event_log())
def test_fold_matches_pandas(spark_global, rows):
    spark = spark_global
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    fold = {
        r["user_id"]: r["max_step"]
        for r in funnel_max_step(df, "user_id", "ts", steps).collect()
    }
    pandas_ = {
        r["user_id"]: r["max_step"]
        for r in funnel_max_step_pandas(df, "user_id", "ts", steps).collect()
    }
    assert fold == pandas_


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
