"""Write-time IVF index: recall against brute force + partition pruning
(probes must not read non-probed bucket partitions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.similarity import (
    build_ivf_index,
    topk_cosine,
    topk_cosine_ivf_indexed,
)


def test_indexed_probe_prunes_partitions(spark, sf_dir, tmp_path):
    emb = load_tables(spark, sf_dir)["embeddings"]
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, "embedding", "vec_id", path, n_centroids=8)
    assert len(cents) == 8
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]

    res = topk_cosine_ivf_indexed(spark, path, "embedding", "vec_id", qvec, k=5, nprobe=2)
    got = [r.vec_id for r in res.collect()]
    assert len(got) == 5

    # partition pruning: bucket is a PARTITION column, so the probe's
    # filter must appear as PartitionFilters in the parquet scan (pruned
    # before file listing, not evaluated per row)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]

    # recall sanity: nearest neighbor of the query (itself) must be found —
    # the query vector's own bucket is always the closest centroid
    exact = [r.vec_id for r in topk_cosine(emb, "embedding", "vec_id", qvec, k=1).collect()]
    assert exact[0] in got
