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
    # reference: the Column-built sim expression (the pre-r18 shape),
    # element-wise lit literal and all
    import pinot_spark.operators.similarity as S

    q = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = math.sqrt(sum(float(v) * float(v) for v in qvec))
    sim = S.dot_product("embedding", q) / (S.vector_norm("embedding") * F.lit(qnorm))
    ref = (
        emb.select(F.col("vec_id"), F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    assert fast == ref


def test_topk_cosine_sql_path(spark, sf_dir):
    """Round-18: the single-F.expr cosine-sim rendering must be
    bit-identical to the Column-built expression on EVERY corpus row
    (not just the top-k), including the unrounded sim."""
    from pinot_spark.catalog import load_tables
    import pinot_spark.operators.similarity as S

    emb = load_tables(spark, sf_dir)["embeddings"]
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    qnorm = math.sqrt(sum(v * v for v in qvec))
    fast = F.expr(S._cosine_sim_sql("embedding", qvec, qnorm))
    q = F.array(*[F.lit(float(x)) for x in qvec])
    ref = S.dot_product("embedding", q) / (S.vector_norm("embedding") * F.lit(qnorm))
    bad = emb.select(
        fast.alias("f"), ref.alias("r")
    ).filter(
        # bit-level: NaN==NaN and -0.0 != 0.0 both handled by <=> on
        # doubles? <=> treats NaN equal and -0.0 == 0.0 — add a sign
        # check via 1/x to distinguish the zero signs
        ~(F.expr("f <=> r") & F.expr("(1.0D / f) <=> (1.0D / r)"))
    ).count()
    assert bad == 0
