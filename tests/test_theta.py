"""KMV theta sketch: exactness below K, accuracy above K, set-operation
algebra, serialization, and merge correctness."""

from __future__ import annotations

import numpy as np
import pytest

from pinot_spark.operators.theta import ThetaSketch, theta_sketch


def _sketch_of(values, k=256):
    import pandas as pd

    # hash exactly like the operator: xxhash64 is JVM-side, so for unit
    # tests build from raw uniform hashes directly
    rng = np.random.default_rng(42)
    return values


def test_exact_below_k(spark):
    df = spark.range(0, 1000).selectExpr("id % 300 AS v")
    sk = theta_sketch(df, "v", k=4096)
    assert sk.estimate() == 300.0  # exact regime


def test_accuracy_above_k(spark):
    n = 50_000
    df = spark.range(0, n).selectExpr("id AS v")
    sk = theta_sketch(df, "v", k=1024)
    est = sk.estimate()
    assert abs(est - n) / n < 0.10, est  # ~3 std devs of 1/sqrt(1024)


def test_set_ops_exact_regime(spark):
    a = spark.range(0, 400).selectExpr("id AS v")          # {0..399}
    b = spark.range(200, 700).selectExpr("id AS v")        # {200..699}
    sa, sb = theta_sketch(a, "v", k=4096), theta_sketch(b, "v", k=4096)
    assert sa.union(sb).estimate() == 700.0
    assert sa.intersect(sb).estimate() == 200.0
    assert sa.a_not_b(sb).estimate() == 200.0
    assert sb.a_not_b(sa).estimate() == 300.0


def test_serialization_roundtrip(spark):
    df = spark.range(0, 500).selectExpr("id AS v")
    sk = theta_sketch(df, "v", k=128)
    back = ThetaSketch.from_bytes(sk.to_bytes())
    assert back.k == sk.k and back.theta_u64 == sk.theta_u64
    assert np.array_equal(back.hashes, sk.hashes)
    assert back.estimate() == sk.estimate()


def test_union_matches_combined_build(spark):
    """Merge of two sketches ≈ sketch of the union (mergeability — the
    property that makes sketches work across segments/filters)."""
    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(2000, 6000).selectExpr("id AS v")
    both = spark.range(0, 6000).selectExpr("id AS v")
    k = 512
    merged = theta_sketch(a, "v", k=k).union(theta_sketch(b, "v", k=k))
    direct = theta_sketch(both, "v", k=k)
    assert abs(merged.estimate() - direct.estimate()) / direct.estimate() < 0.10
    assert abs(merged.estimate() - 6000) / 6000 < 0.15


def test_tree_merge_partition_independence(spark):
    """The two-level tree merge (inserted above 64 input partitions) must
    give the identical sketch as the flat single-level merge — candidate
    top-K truncation is associative."""
    df = spark.range(0, 20_000).selectExpr("CAST(id % 7919 AS STRING) AS v")
    flat = theta_sketch(df.repartition(8), "v", k=1024)
    tree = theta_sketch(df.repartition(97), "v", k=1024)   # > fanout: tree level
    assert flat.theta_u64 == tree.theta_u64
    assert (flat.hashes == tree.hashes).all()
    assert abs(flat.estimate() - tree.estimate()) < 1e-9
