"""Merging t-digest: quantile accuracy, mergeability, RAW serialization."""

from __future__ import annotations

import numpy as np

from pinot_spark.operators.tdigest import TDigest, tdigest_sketch


def test_quantile_accuracy_uniform():
    rng = np.random.default_rng(7)
    data = rng.uniform(0, 1000, 100_000)
    td = TDigest(100.0)
    td.add(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(data, q)
        est = td.quantile(q)
        assert abs(est - exact) <= 0.02 * 1000 + 1e-9, (q, est, exact)


def test_merge_matches_combined():
    rng = np.random.default_rng(8)
    a, b = rng.normal(0, 1, 50_000), rng.normal(5, 2, 50_000)
    ta, tb = TDigest(100.0), TDigest(100.0)
    ta.add(a)
    tb.add(b)
    merged = ta.merge(tb)
    both = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - np.quantile(both, q)) < 0.15, q


def test_bytes_roundtrip():
    td = TDigest(64.0)
    td.add(np.arange(10_000, dtype=float))
    back = TDigest.from_bytes(td.to_bytes())
    assert back.compression == 64.0
    for q in (0.05, 0.5, 0.95):
        assert abs(back.quantile(q) - td.quantile(q)) < 1e-9


def test_distributed_build(spark):
    df = spark.range(0, 100_000).repartition(8).selectExpr("CAST(id AS DOUBLE) AS v")
    td = tdigest_sketch(df, "v", compression=100.0)
    for q, expect in ((0.5, 50_000), (0.9, 90_000), (0.99, 99_000)):
        assert abs(td.quantile(q) - expect) / 100_000 < 0.01, (q, td.quantile(q))


def test_tree_merge_partition_count_stability(spark):
    """Quantiles from the tree-merged build (>64 partitions) stay within
    the digest's error bounds of the flat build — merge is associative up
    to centroid regrouping."""
    df = spark.range(0, 50_000).selectExpr("CAST(id AS DOUBLE) AS v")
    flat = tdigest_sketch(df.repartition(8), "v", compression=100.0)
    tree = tdigest_sketch(df.repartition(97), "v", compression=100.0)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = q * 49_999
        assert abs(flat.quantile(q) - exact) / 50_000 < 0.01
        assert abs(tree.quantile(q) - exact) / 50_000 < 0.01
