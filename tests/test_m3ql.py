"""M3QL pipeline-language tests (plans/m3ql.py): parse → range-query
pipeline parity with the direct API (M3TimeSeriesPlanner.java semantics).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.plans.m3ql import M3qlError, execute
from pinot_spark.plans.timeseries import range_query
from tests.conftest import SF_DIR


def test_m3ql_matches_direct_api(spark):
    events = load_tables(spark, SF_DIR)["events"]
    got = execute(
        events,
        "fetch event_type=purchase | summarize 4h sum | transformNull 0",
        time_col="ts", value_col="value",
        start="2024-01-08", end="2024-01-09",
    ).collect()
    exp = range_query(
        events.filter(F.col("event_type") == "purchase"),
        time_col="ts", value_col="value",
        start="2024-01-08", end="2024-01-09",
        step="4 hour", agg="sum", transform_null=0.0,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_m3ql_by_tags_keep_last(spark):
    events = load_tables(spark, SF_DIR)["events"]
    out = execute(
        events,
        "fetch | summarize 6h max by event_type | keepLastValue",
        time_col="ts", value_col="value",
        start="2024-01-08", end="2024-01-09",
    )
    rows = out.collect()
    assert {"event_type", "bucket", "val"} == set(out.columns)
    assert len(rows) == 4 * events.select("event_type").distinct().count()


def test_m3ql_errors(spark):
    events = load_tables(spark, SF_DIR)["events"]
    with pytest.raises(M3qlError):
        execute(events, "summarize 1h sum", "ts", "value", "2024-01-08", "2024-01-09")
    with pytest.raises(M3qlError):
        execute(events, "fetch | summarize 1fortnight sum", "ts", "value",
                "2024-01-08", "2024-01-09")
    with pytest.raises(M3qlError):
        execute(events, "fetch | frobnicate", "ts", "value", "2024-01-08", "2024-01-09")
