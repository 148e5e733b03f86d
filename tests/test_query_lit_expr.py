"""_query_lit builds the query-vector literal via ONE F.expr round trip
(round-17 builder-side optimization). These tests pin bit-identity with
the reference element-wise lit build across pathological doubles, and
the non-finite fallback."""

from __future__ import annotations

import math
import struct

import pyspark.sql.functions as F

from pinot_spark.operators.similarity import _query_lit, topk_cosine


def _bits(x: float) -> str:
    return struct.pack("<d", x).hex()


TRICKY = [
    0.1,
    -0.1,
    1.0 / 3.0,
    0.0,
    -0.0,
    1.0,
    -1.0,
    64.0,
    1e-07,
    -1e-07,
    2.5e300,
    -2.5e300,
    5e-324,  # min subnormal
    1.7976931348623157e308,  # max double
    123456789.123456789,
    0.30000000000000004,
]


def test_query_lit_expr_bit_identical(spark):
    ref = F.array(*[F.lit(float(v)) for v in TRICKY])
    fast = _query_lit(TRICKY)
    row = spark.range(1).select(ref.alias("a"), fast.alias("b")).first()
    got_ref = [_bits(v) for v in row["a"]]
    got_fast = [_bits(v) for v in row["b"]]
    assert got_fast == got_ref  # bit-for-bit, including -0.0 sign


def test_query_lit_nonfinite_falls_back(spark):
    vec = [1.0, float("nan"), float("inf"), float("-inf")]
    row = spark.range(1).select(_query_lit(vec).alias("a")).first()
    assert row["a"][0] == 1.0
    assert math.isnan(row["a"][1])
    assert row["a"][2] == float("inf")
    assert row["a"][3] == float("-inf")


def test_topk_cosine_same_result_as_lit_build(spark, sf_dir):
    from pinot_spark.catalog import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    fast = topk_cosine(emb, "embedding", "vec_id", qvec, k=10).collect()
    # reference: same operator with the element-wise literal forced
    import pinot_spark.operators.similarity as S

    orig = S._query_lit
    try:
        S._query_lit = lambda v: F.array(*[F.lit(float(x)) for x in v])
        ref = topk_cosine(emb, "embedding", "vec_id", qvec, k=10).collect()
    finally:
        S._query_lit = orig
    assert fast == ref
