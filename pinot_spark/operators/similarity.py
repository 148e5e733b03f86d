"""Similarity search over embedding columns (array<float>).

Reference semantics: VECTOR_SIMILARITY predicate + HNSW vector index
(pinot-core/.../operator/filter/VectorSimilarityFilterOperator.java,
StandardIndexes.java:141 vector index) and the VectorFunctions scalar
family (pinot-common/.../function/scalar/VectorFunctions.java).

Spark-first design:
- Distance math is higher-order ``zip_with``/``aggregate`` expressions —
  JVM-side, codegen-friendly, no Python per row.
- Brute-force top-k is the exact baseline: one scan + TakeOrderedAndProject
  (no shuffle of the full table).
- The scale path is IVF-style bucketing: assign each vector to its nearest
  of C centroids once at write time (or on the fly), then probe only the
  closest buckets — candidate set shrinks ~C/probes ×.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _vec(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: str | Column, b: str | Column) -> Column:
    """innerProduct(v1, v2) — VectorFunctions.java innerProduct."""
    prods = F.zip_with(_vec(a), _vec(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def vector_norm(a: str | Column) -> Column:
    """vectorNorm(v) — L2 norm."""
    sq = F.transform(_vec(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot_product(a, b) / (vector_norm(a) * vector_norm(b))


def cosine_distance(a: str | Column, b: str | Column) -> Column:
    """cosineDistance(v1, v2) — VectorFunctions.java cosineDistance."""
    return 1 - cosine_similarity(a, b)


def l2_distance(a: str | Column, b: str | Column) -> Column:
    d = F.zip_with(_vec(a), _vec(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))


def l1_distance(a: str | Column, b: str | Column) -> Column:
    d = F.zip_with(_vec(a), _vec(b), lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def topk_cosine(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``.

    Returns (id_col, sim) ordered by sim desc (ties → id asc). The scan is
    a single pass; TakeOrderedAndProject keeps only k rows per partition
    before the final merge, so no full sort/shuffle of the table.
    """
    q = _query_lit(query_vec)
    qnorm = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    sim = (dot_product(vec_col, q) / (vector_norm(vec_col) * F.lit(qnorm))).alias("sim")
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).
    Adds a ``bucket`` int column; at scale this is the write-time partition
    key so probes read only matching buckets."""
    dists = F.array(
        *[l2_distance(vec_col, _query_lit(c)) for c in centroids]
    )
    return df.withColumn("bucket", F.array_position(dists, F.array_min(dists)).cast("int") - 1)


def topk_cosine_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the ``nprobe`` centroids
    closest to the query. With bucket as a storage partition key the
    non-probed buckets are pruned at the parquet scan."""
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(centroids[i], query_vec)),
    )
    probe = order[:nprobe]
    assigned = ivf_assign(df, vec_col, centroids)
    return topk_cosine(assigned.filter(F.col("bucket").isin(probe)), vec_col, id_col, query_vec, k)
