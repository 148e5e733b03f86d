"""Engine-own HNSW approximate nearest neighbor (cosine / L2).

Reference: the VECTOR_SIMILARITY HNSW index
(pinot-segment-local/.../index/vector/HnswVectorIndexCreator.java wraps
Lucene's HNSW writer; per-SEGMENT graphs merged at the broker). This is
the PUBLIC Malkov & Yashunin algorithm ("Efficient and robust
approximate nearest neighbor search using Hierarchical Navigable Small
World graphs", IEEE TPAMI 2018) implemented from scratch in numpy —
level assignment, greedy descent, ef beam search, bidirectional links
with degree pruning.

Spark-first shape (mirrors the reference's per-segment design): each
PARTITION builds its own small graph inside one Arrow-batched
``mapInPandas`` pass and emits its local top-k for the broadcast query
vector; the global answer is the k-smallest of ≤ partitions×k local
candidates (TakeOrderedAndProject — the broker merge). No driver-side
collection of vectors, no cross-partition shuffle of the corpus; at
100 TB each partition's graph is bounded by
``spark.sql.files.maxPartitionBytes``. The scale path for massive
corpora remains the write-time-partitioned IVF index
(operators/similarity.py — the reference ships IVF readers too); HNSW
serves the high-recall per-segment regime.

Determinism: insertion levels derive from a hash of the row id (no
RNG), so for a FIXED partitioning of the input the graphs — and
therefore the approximate result — are stable across runs and
executors. Repartitioning the corpus (or changing
``spark.sql.files.maxPartitionBytes``) regroups rows into different
per-partition graphs and can change which local top-k candidates reach
the merge, exactly as re-segmenting changes the reference's per-segment
Lucene-HNSW answers.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class HnswIndex:
    """In-memory HNSW graph over a (n, d) float32 matrix."""

    def __init__(self, m: int = 16, ef_construction: int = 100, metric: str = "cosine"):
        if metric not in ("cosine", "l2"):
            raise ValueError(f"unsupported metric {metric!r}")
        self.m = m
        self.m0 = 2 * m
        self.ef_c = ef_construction
        self.metric = metric
        self.ml = 1.0 / math.log(m)
        self.vectors: np.ndarray | None = None
        self.levels: list[int] = []
        self.links: list[list[list[int]]] = []  # node -> level -> neighbor ids
        self.entry = -1
        self.max_level = -1

    # -- distances ---------------------------------------------------------

    def _dist(self, q: np.ndarray, ids) -> np.ndarray:
        vecs = self.vectors[ids]
        if self.metric == "cosine":
            qn = q / (np.linalg.norm(q) + 1e-12)
            vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-12)
            return 1.0 - vn @ qn
        d = vecs - q
        return np.sqrt((d * d).sum(axis=1))

    @staticmethod
    def _level_for(node_id: int, ml: float) -> int:
        # deterministic "uniform": splitmix-style hash of the id → (0, 1)
        h = (node_id + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 29
        h = h * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 32
        u = (h % (2**53)) / float(2**53) or 0.5
        return int(-math.log(u) * ml)

    # -- build -------------------------------------------------------------

    def build(self, vectors: np.ndarray) -> "HnswIndex":
        self.vectors = np.asarray(vectors, dtype=np.float32)
        n = len(self.vectors)
        for i in range(n):
            self._insert(i)
        return self

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int) -> list[tuple[float, int]]:
        """Beam search one layer: returns up to ef (dist, id) ascending."""
        d0 = float(self._dist(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]  # min-heap by dist (kept sorted, small)
        result = [(d0, entry)]
        import heapq

        heapq.heapify(cand)
        while cand:
            d, c = heapq.heappop(cand)
            worst = max(result)[0]
            if d > worst and len(result) >= ef:
                break
            neigh = [x for x in self.links[c][level] if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            dists = self._dist(q, neigh)
            for nd, nid in zip(dists, neigh):
                nd = float(nd)
                if len(result) < ef or nd < max(result)[0]:
                    heapq.heappush(cand, (nd, nid))
                    result.append((nd, nid))
                    if len(result) > ef:
                        result.remove(max(result))
        return sorted(result)

    def _insert(self, i: int) -> None:
        level = self._level_for(i, self.ml)
        self.levels.append(level)
        self.links.append([[] for _ in range(level + 1)])
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.vectors[i]
        ep = self.entry
        # greedy descent above the insertion level
        for lv in range(self.max_level, level, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        # beam + link at each level ≤ insertion level
        for lv in range(min(level, self.max_level), -1, -1):
            found = self._search_layer(q, ep, self.ef_c, lv)
            ep = found[0][1]
            cap = self.m0 if lv == 0 else self.m
            chosen = [nid for _, nid in found[:cap]]
            self.links[i][lv] = chosen
            for nid in chosen:
                lk = self.links[nid][lv]
                lk.append(i)
                if len(lk) > cap:
                    # prune to the cap closest neighbors of nid
                    d = self._dist(self.vectors[nid], lk)
                    keep = np.argsort(d, kind="stable")[:cap]
                    self.links[nid][lv] = [lk[j] for j in keep]
        if level > self.max_level:
            self.max_level = level
            self.entry = i

    # -- query -------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int | None = None) -> list[tuple[int, float]]:
        """Top-k (id, distance) for the query vector."""
        if self.entry < 0:
            return []
        q = np.asarray(q, dtype=np.float32)
        ef = max(ef or 4 * k, k)
        ep = self.entry
        for lv in range(self.max_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        found = self._search_layer(q, ep, ef, 0)
        return [(nid, d) for d, nid in found[:k]]


def hnsw_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int,
    metric: str = "cosine",
    m: int = 16,
    ef_construction: int = 100,
    ef_search: int | None = None,
) -> DataFrame:
    """Approximate top-k nearest rows to ``query_vec`` — per-partition
    HNSW graphs + broker-style global merge (module docstring). Returns
    (id_col, distance) ascending, exactly k rows (fewer if the corpus
    is smaller)."""
    qv = np.asarray(list(query_vec), dtype=np.float32)
    slim = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))

    def _partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list = []
        vecs: list[np.ndarray] = []
        for pdf in batches:
            ids.extend(pdf["__id"].tolist())
            vecs.extend(np.asarray(v, dtype=np.float32) for v in pdf["__vec"])
        if not ids:
            return
        index = HnswIndex(m=m, ef_construction=ef_construction, metric=metric)
        index.build(np.stack(vecs))
        hits = index.search(qv, k, ef_search)
        yield pd.DataFrame(
            {"__id": [ids[i] for i, _ in hits], "distance": [d for _, d in hits]}
        )

    local = slim.mapInPandas(_partition, schema=f"__id {slim.schema['__id'].dataType.simpleString()}, distance double")
    return (
        local.orderBy("distance")
        .limit(k)
        .select(F.col("__id").alias(id_col), F.round("distance", 6).alias("distance"))
    )
