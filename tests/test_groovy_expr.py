"""Groovy inline-transform expression subset (functions/groovy_expr.py
← GroovyFunctionEvaluator.java): compiler semantics, Spark UDF surface,
and the loud subset boundary."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pinot_spark.functions.groovy_expr import compile_groovy
from pinot_spark.functions.scalar import call


@pytest.mark.parametrize(
    "script,args,expected",
    [
        ("arg0 * 2 + arg1", (3, 4), 10),
        ("arg0 % 3 == 0 ? 'fizz' : arg0.toString()", (9,), "fizz"),
        ("arg0 % 3 == 0 ? 'fizz' : arg0.toString()", (7,), "7"),
        ("Math.max(arg0, arg1) - Math.min(arg0, arg1)", (3, 11), 8),
        ("arg0.toUpperCase().substring(0, 3)", ("hello",), "HEL"),
        ("arg0.contains('ell') && !arg0.startsWith('x')", ("hello",), True),
        ("arg0 + '-' + arg1", ("a", 5), "a-5"),  # Groovy string concat
        ("arg0.replace('a', 'b').length()", ("banana",), 6),
        ("(arg0 + arg1) / 2.0", (3, 4), 3.5),
        ("arg0.indexOf('ss')", ("mississippi",), 2),
        ("-arg0 < 0", (5,), True),
        ("arg0.trim().split(',').size()", (" a,b,c ",), 3),
        ("Math.pow(arg0, 2) + Math.sqrt(arg1)", (3, 16), 13.0),
        ("null == null", (1,), True),
    ],
)
def test_compile_semantics(script, args, expected):
    assert compile_groovy(script)(args) == expected


def test_subset_boundary_is_loud():
    for bad in ("for(i in 1..3) i", "def x = 1", "[1,2,3].collect{it}", "arg0.weird()"):
        with pytest.raises(NotImplementedError):
            compile_groovy(bad)


def test_spark_udf_surface(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (None, 5.0)], "a int, v double")
    out = df.select(
        call(
            "groovy",
            '{"returnType":"DOUBLE","isSingleValue":true}',
            "arg0 % 2 == 0 ? arg1 * 2 : arg1 / 2",
            F.col("a"),
            F.col("v"),
        ).alias("g")
    ).collect()
    assert [r.g for r in out] == [5.0, 40.0, None]  # null arg → null, like Pinot
    s = df.select(
        call(
            "groovy",
            '{"returnType":"STRING","isSingleValue":true}',
            "'row-' + arg0",
            F.col("a"),
        ).alias("g")
    ).collect()
    assert [r.g for r in s] == ["row-1", "row-2", None]
