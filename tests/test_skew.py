"""Skew-helper tests (operators/skew.py): salted results must be
identical to the plain-plan results.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.skew import salted_join, two_phase_count_distinct
from tests.conftest import SF_DIR


def test_two_phase_count_distinct(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    got = {
        (r["l_returnflag"], r["dc"])
        for r in two_phase_count_distinct(li, ["l_returnflag"], "l_suppkey").collect()
    }
    exp = {
        (r["l_returnflag"], r["dc"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_suppkey").alias("dc"))
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain(spark):
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_quantity")
    supp = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    got = (
        salted_join(li, supp, on="l_suppkey", num_salts=4)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    exp = (
        li.join(supp, on="l_suppkey")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}


def test_salted_join_spreads_constant_payload_hot_key(spark):
    # A hot key whose rows carry IDENTICAL payloads must still spread
    # across salts (round-5 finding: hashing only non-key columns put
    # every duplicate row on one salt, defeating the whole point).
    n, num_salts = 4096, 8
    big = spark.range(n).select(
        F.lit(1).alias("k"), F.lit("same-payload").alias("v")
    )
    small = spark.range(1).select(F.lit(1).alias("k"), F.lit("dim").alias("d"))
    from pinot_spark.operators.skew import _SALT

    salted = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64("v", F.monotonically_increasing_id()), F.lit(num_salts)
        ),
    )
    n_salts = salted.select(_SALT).distinct().count()
    assert n_salts == num_salts
    # and the join result is still exactly the plain join
    joined = salted_join(big, small, on="k", num_salts=num_salts)
    assert joined.count() == n
    assert joined.select("d").distinct().collect()[0][0] == "dim"
