"""Randomized query generation — the analog of the reference's
TPC-H query skeleton generator
(pinot-integration-tests/.../tpch/generator/QuerySkeleton.java):
hypothesis draws a (filters, group-keys, aggregates) spec; the same spec
compiles to a Spark DataFrame plan AND DuckDB SQL; results must match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pinot_spark.catalog import load_tables
from tests.conftest import SF_DIR, assert_same_rows

_DIMS = ["l_returnflag", "l_linestatus", "l_linenumber"]
_MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]

_FILTERS = {
    # name → (spark Column builder, duckdb predicate) — lazy: Columns
    # need an active session
    "qty_lo": (lambda: F.col("l_quantity") >= 25, "l_quantity >= 25"),
    "qty_hi": (lambda: F.col("l_quantity") < 40, "l_quantity < 40"),
    "flag_a": (lambda: F.col("l_returnflag") == "A", "l_returnflag = 'A'"),
    "disc": (lambda: F.col("l_discount").between(0.02, 0.08), "l_discount BETWEEN 0.02 AND 0.08"),
    "date": (
        lambda: F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"),
        "l_shipdate >= TIMESTAMP '1997-01-01'",
    ),
    "ln_in": (lambda: F.col("l_linenumber").isin(1, 2, 3), "l_linenumber IN (1, 2, 3)"),
}

_AGGS = {
    # name → (spark agg builder, duckdb expr)  — all exact/deterministic
    "cnt": (lambda: F.count("*").alias("cnt"), "count(*) AS cnt"),
    "sum_qty": (
        lambda: F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("sum_qty"),
        "round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2)::DOUBLE AS sum_qty",
    ),
    "min_p": (lambda: F.min("l_extendedprice").alias("min_p"), "min(l_extendedprice) AS min_p"),
    "max_p": (lambda: F.max("l_extendedprice").alias("max_p"), "max(l_extendedprice) AS max_p"),
    "dc_supp": (
        lambda: F.count_distinct("l_suppkey").alias("dc_supp"),
        "count(DISTINCT l_suppkey) AS dc_supp",
    ),
}

spec_strategy = st.fixed_dictionaries(
    {
        "filters": st.lists(st.sampled_from(sorted(_FILTERS)), unique=True, max_size=3),
        "dims": st.lists(st.sampled_from(_DIMS), unique=True, min_size=1, max_size=2),
        "aggs": st.lists(st.sampled_from(sorted(_AGGS)), unique=True, min_size=1, max_size=3),
    }
)


@pytest.fixture(scope="module")
def li(spark):
    return load_tables(spark, SF_DIR)["lineitem"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=spec_strategy)
def test_random_group_by_matches_duckdb(spark, duck, li, spec):
    sdf = li
    preds = []
    for fname in spec["filters"]:
        col_fn, pred = _FILTERS[fname]
        sdf = sdf.filter(col_fn())
        preds.append(pred)
    sdf = sdf.groupBy(*spec["dims"]).agg(*[_AGGS[a][0]() for a in spec["aggs"]])

    where = f"WHERE {' AND '.join(preds)}" if preds else ""
    sql = (
        f"SELECT {', '.join(spec['dims'])}, "
        f"{', '.join(_AGGS[a][1] for a in spec['aggs'])} "
        f"FROM lineitem {where} GROUP BY {', '.join(spec['dims'])}"
    )
    assert_same_rows(sdf, duck.sql(sql))
