"""IVF-PQ vector index (IvfPqVectorIndexCreator/Reader semantics):
training/encoding shape, ADC table math vs explicit reconstruction,
full-probe + exact-rerank parity with brute force (the IvfPqVectorTest
assertion), and partition pruning on the persisted index."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pinot_spark.catalog import load_tables
from pinot_spark.operators.ivfpq import (
    IvfPqModel,
    _adc_tables,
    _encode_block,
    _score_codes,
    _transform,
    build_ivfpq_index,
    ivfpq_encode,
    subvector_lengths,
    topk_ivfpq,
    topk_ivfpq_indexed,
    train_ivfpq,
)
from pinot_spark.operators.similarity import topk_cosine


def test_subvector_lengths_remainder_spread():
    # VectorQuantizationUtils.computeSubvectorLengths: base + the
    # remainder spread over the FIRST subvectors
    assert subvector_lengths(64, 8) == [8] * 8
    assert subvector_lengths(10, 4) == [3, 3, 2, 2]
    assert subvector_lengths(7, 7) == [1] * 7
    with pytest.raises(ValueError):
        subvector_lengths(4, 5)


def test_train_validates_nbits():
    with pytest.raises(ValueError):
        train_ivfpq(np.random.default_rng(0).normal(size=(32, 8)), 4, 2, pq_nbits=5)


def _rng_sample(n=200, dim=16, seed=0):
    return np.random.default_rng(seed).normal(size=(n, dim))


def test_encode_deterministic_and_sized():
    x = _rng_sample()
    model = train_ivfpq(x, nlist=4, pq_m=4, pq_nbits=8, seed=7)
    b1, c1 = _encode_block(x, model)
    b2, c2 = _encode_block(x, model)
    assert (b1 == b2).all() and (c1 == c2).all()
    assert c1.shape == (len(x), 4) and c1.dtype == np.uint8
    assert set(b1) <= set(range(4))
    # pq_nbits=4 -> 16-entry codebooks, codes < 16
    m4 = train_ivfpq(x, nlist=4, pq_m=4, pq_nbits=4, seed=7)
    assert all(len(b) == 16 for b in m4.codebooks)
    _, c4 = _encode_block(x, m4)
    assert c4.max() < 16


def test_reconstruction_beats_centroid_only():
    """The PQ residual codes must capture variance beyond the coarse
    centroid: reconstruction error with codes < centroid-only error."""
    x = _rng_sample(400, 32, 1)
    model = train_ivfpq(x, nlist=4, pq_m=8, pq_nbits=8, seed=7)
    cents, books, offs = model._np()
    b, codes = _encode_block(x, model)
    recon = cents[b].copy()
    for m in range(model.pq_m):
        recon[:, offs[m] : offs[m + 1]] += np.asarray(books[m])[codes[:, m]]
    err_pq = ((x - recon) ** 2).sum()
    err_coarse = ((x - cents[b]) ** 2).sum()
    assert err_pq < 0.5 * err_coarse


@pytest.mark.parametrize("distance", ["l2", "dot", "cosine"])
def test_adc_tables_match_reconstruction(distance):
    """ADC table-lookup distance == the distance computed against the
    explicitly reconstructed vector (the asymmetric-distance contract,
    ProductQuantizer.buildL2DistanceTables)."""
    x = _rng_sample(300, 24, 2)
    q = list(np.random.default_rng(9).normal(size=24))
    model = train_ivfpq(x, nlist=4, pq_m=6, pq_nbits=8, seed=7, distance=distance)
    cents, books, offs = model._np()
    b, codes = _encode_block(x, model)
    probes = sorted(set(int(v) for v in b))
    tables = _adc_tables(model, q, probes)
    qt = _transform(np.asarray([q], dtype=np.float64), distance)[0]
    recon = cents[b].copy()
    for m in range(model.pq_m):
        recon[:, offs[m] : offs[m + 1]] += np.asarray(books[m])[codes[:, m]]
    for p in probes:
        mask = b == p
        got = _score_codes(codes[mask], tables[p])
        r = recon[mask]
        if distance == "l2":
            want = ((r - qt) ** 2).sum(axis=1)
        elif distance == "dot":
            want = -(r @ qt)
        else:
            want = 1.0 - (r @ qt) / np.linalg.norm(r, axis=1)
        assert np.allclose(got, want, atol=1e-9), distance


def test_model_json_roundtrip():
    model = train_ivfpq(_rng_sample(64, 8, 3), nlist=3, pq_m=2, seed=5)
    back = IvfPqModel.from_json(model.to_json())
    assert back == model


def test_full_probe_rerank_matches_exact(spark, sf_dir):
    """IvfPqVectorTest.testVectorSimilarityMatchesExactSearch: with
    nprobe = nlist and exact rerank, the ANN result must equal the
    brute-force top-k exactly."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sample = np.array(
        [np.asarray(r[0], float) for r in emb.orderBy("vec_id").select("embedding").limit(500).collect()]
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    model = train_ivfpq(sample, nlist=8, pq_m=16, pq_nbits=8, seed=7, distance="cosine")
    enc = ivfpq_encode(emb, "embedding", model)
    ann = topk_ivfpq(
        enc, model, qvec, "vec_id", k=5, nprobe=model.nlist,
        exact_rerank=True, max_candidates=1_000_000, vec_col="embedding",
    ).collect()
    exact = topk_cosine(emb, "embedding", "vec_id", qvec, k=5).collect()
    assert [r.vec_id for r in ann] == [r.vec_id for r in exact]
    for a, e in zip(ann, exact):
        # topk_cosine emits similarity rounded to 4dp; rerank emits the
        # unrounded cosine distance
        assert a.distance == pytest.approx(1.0 - e.sim, abs=1e-4)


def test_indexed_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted index is bucket-partitioned parquet: a probe's
    bucket filter must land in PartitionFilters (inverted-list pruning
    at the file listing, IvfPqVectorIndexReader's probe loop)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = str(tmp_path / "ivfpq")
    model = build_ivfpq_index(
        emb, "embedding", path, nlist=4, pq_m=8, seed=7, distance="cosine"
    )
    assert model.nlist == 4
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    res = topk_ivfpq_indexed(spark, path, qvec, "vec_id", k=5, nprobe=2)
    got = res.collect()
    assert len(got) == 5
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]
    # the query vector's own bucket is always probed -> vec 0 found
    assert got[0].vec_id == 0


def test_consolidated_index_file_scheme_roundtrip(spark, sf_dir, tmp_path):
    """IvfFlatConsolidatedVectorTest analog (storeInSegmentFile=true —
    the index payload lives WITH the segment data and the read path
    resolves it from there): the model sidecar is written through the
    Hadoop FS API under an explicit file: scheme URI, the probe reads
    it back from the same URI, and the ANN result is distance-ascending
    and non-negative — the suite's consolidated-reader assertions."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = "file:" + str(tmp_path / "ivf_consolidated")
    build_ivfpq_index(
        emb, "embedding", path, nlist=4, pq_m=8, seed=7, distance="l2"
    )
    # the sidecar carries the underscore prefix (Spark's listing skips it)
    assert (tmp_path / "ivf_consolidated" / "_ivfpq_model.json").exists()
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 1).select("embedding").first()[0]]
    got = topk_ivfpq_indexed(spark, path, qvec, "vec_id", k=5, nprobe=4).collect()
    assert len(got) == 5
    dists = [r.distance for r in got]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)
    assert got[0].vec_id == 1  # the query's own vector is the nearest


def test_legacy_bare_sidecar_still_reads(spark, sf_dir, tmp_path):
    """Indexes built before the underscore rename carried
    'ivfpq_model.json'; the reader must fall back to the bare name."""
    import os

    emb = load_tables(spark, sf_dir)["embeddings"]
    path = str(tmp_path / "ivf_legacy")
    build_ivfpq_index(
        emb, "embedding", path, nlist=4, pq_m=8, seed=7, distance="l2"
    )
    os.rename(
        os.path.join(path, "_ivfpq_model.json"),
        os.path.join(path, "ivfpq_model.json"),
    )
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 2).select("embedding").first()[0]]
    got = topk_ivfpq_indexed(spark, path, qvec, "vec_id", k=3, nprobe=4).collect()
    assert got[0].vec_id == 2
