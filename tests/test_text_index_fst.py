"""FST-index analog: regex over dictionary + semi join == row-wise rlike."""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.text_index import regex_match_dictionary


def test_dictionary_regex_equals_rowwise(spark, sf_dir):
    part = load_tables(spark, sf_dir)["part"]
    pattern = "^Brand#[1-3]$"
    via_dict = regex_match_dictionary(part, "p_brand", pattern)
    via_rows = part.filter(F.col("p_brand").rlike(pattern))
    assert via_dict.count() == via_rows.count() > 0
    a = sorted(r.p_partkey for r in via_dict.select("p_partkey").collect())
    b = sorted(r.p_partkey for r in via_rows.select("p_partkey").collect())
    assert a == b
    # the dictionary side must broadcast (no shuffle of the fact table)
    plan = via_dict._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
