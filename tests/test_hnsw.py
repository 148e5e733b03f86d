"""operators/hnsw.py: engine-own HNSW — recall vs exact, determinism,
graph invariants, and the per-partition Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from pinot_spark.operators.hnsw import HnswIndex, hnsw_topk


def _corpus(n=2000, d=16, seed=5):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _exact_topk(vecs, q, k, metric="cosine"):
    if metric == "cosine":
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        d = 1.0 - vn @ qn
    else:
        d = np.linalg.norm(vecs - q, axis=1)
    return set(np.argsort(d, kind="stable")[:k].tolist())


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_recall_against_exact(metric):
    vecs = _corpus()
    idx = HnswIndex(metric=metric).build(vecs)
    rng = np.random.RandomState(11)
    recalls = []
    for _ in range(20):
        q = rng.standard_normal(16).astype(np.float32)
        got = {i for i, _ in idx.search(q, 10, ef=100)}
        recalls.append(len(got & _exact_topk(vecs, q, 10, metric)) / 10)
    assert float(np.mean(recalls)) >= 0.9, recalls


def test_deterministic_build_and_search():
    vecs = _corpus(500)
    a = HnswIndex().build(vecs)
    b = HnswIndex().build(vecs)
    assert a.levels == b.levels and a.entry == b.entry
    q = _corpus(1, seed=9)[0]
    assert a.search(q, 5) == b.search(q, 5)


def test_graph_degree_invariants():
    idx = HnswIndex(m=8).build(_corpus(800))
    for node, per_level in enumerate(idx.links):
        assert len(per_level) == idx.levels[node] + 1
        for lv, neigh in enumerate(per_level):
            cap = idx.m0 if lv == 0 else idx.m
            assert len(neigh) <= cap
            assert node not in neigh  # no self links
    # hash-derived levels follow the expected geometric-ish decay
    assert sum(1 for x in idx.levels if x > 0) < len(idx.levels) // 2


def test_small_and_empty_corpora():
    assert HnswIndex().build(np.empty((0, 4), np.float32)).search(np.ones(4), 3) == []
    one = HnswIndex().build(np.ones((1, 4), np.float32))
    assert [i for i, _ in one.search(np.ones(4), 3)] == [0]


def test_spark_partitioned_topk(spark):
    vecs = _corpus(1200, d=8, seed=3)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "doc_id bigint, emb array<float>").repartition(6)
    q = _corpus(1, d=8, seed=21)[0]
    got = hnsw_topk(df, "doc_id", "emb", q, k=10, ef_search=120).collect()
    assert len(got) == 10
    assert [r.distance for r in got] == sorted(r.distance for r in got)
    exact = _exact_topk(vecs, q, 10)
    # per-partition graphs each search exhaustively within their slice,
    # so the merged answer should recover most of the exact top-k
    assert len({r.doc_id for r in got} & exact) >= 8
    # the plan merges local candidates with a global top-k, not a sort
    plan = hnsw_topk(df, "doc_id", "emb", q, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
