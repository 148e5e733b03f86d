"""Theta sketches: mergeable approximate distinct counts with set
operations (union / intersection / difference).

Reference: DISTINCTCOUNTTHETASKETCH / DISTINCTCOUNTRAWTHETASKETCH
(pinot-segment-spi/.../AggregationFunctionType.java:107-120; Pinot wraps
the Apache DataSketches theta sketch). The point of theta over HLL is
set ALGEBRA: |A ∩ B| and |A \\ B| across different filter predicates
without re-scanning — Pinot evaluates these per segment and merges at
the broker.

This is the standard KMV ("K minimum values") theta sketch — a public
algorithm: hash every value to uniform 64-bit, keep the K smallest
distinct hashes; theta = the K-th smallest hash mapped to (0,1];
estimate = (K-1)/theta. Set operations work on the retained hash sets
below min(theta_a, theta_b).

Spark-first build shape (mirrors Pinot's segment→broker merge):

1. hash JVM-side (``xxhash64`` — stays in whole-stage codegen),
2. per-partition top-K retention via ``mapInPandas`` (no shuffle, Arrow
   batches, constant memory),
3. merge the ≤ num_partitions × K candidate hashes — a single
   small-data pass instead of a full-cardinality distinct shuffle.

At small cardinalities (n_distinct < K) the sketch is EXACT — the
oracle-parity query runs in that regime; the error bound ~1/sqrt(K)
applies beyond it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_TWO64 = float(2**64)


def _below(arr: np.ndarray, theta_u64: int) -> np.ndarray:
    """Hashes strictly below theta; theta == 2^64 (exact regime) keeps all
    (np.uint64(2**64) would overflow)."""
    if theta_u64 >= 2**64:
        return arr
    return arr[arr < np.uint64(theta_u64)]


@dataclass
class ThetaSketch:
    """Retained-hash sketch: sorted unsigned-64 hashes, all < theta_u64."""

    k: int
    theta_u64: int  # exclusive upper bound on retained hashes; 2^64 = "all"
    hashes: np.ndarray  # sorted uint64, distinct, < theta_u64

    @classmethod
    def from_hashes(cls, k: int, raw: np.ndarray) -> "ThetaSketch":
        h = np.unique(raw.astype(np.uint64))
        if len(h) <= k:
            return cls(k, 2**64, h)
        # keep the k smallest; theta = the (k+1)-th value (exclusive bound)
        h.sort()
        return cls(k, int(h[k]), h[:k])

    @property
    def theta(self) -> float:
        return self.theta_u64 / _TWO64

    def estimate(self) -> float:
        if self.theta_u64 == 2**64:
            return float(len(self.hashes))  # exact regime
        return len(self.hashes) / self.theta

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        th = min(self.theta_u64, other.theta_u64)
        merged = np.unique(np.concatenate([self.hashes, other.hashes]))
        merged = _below(merged, th)
        if len(merged) > self.k:
            merged.sort()
            th = int(merged[self.k])
            merged = merged[: self.k]
        return ThetaSketch(self.k, th, merged)

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        th = min(self.theta_u64, other.theta_u64)
        common = np.intersect1d(self.hashes, other.hashes)
        return ThetaSketch(self.k, th, _below(common, th))

    def a_not_b(self, other: "ThetaSketch") -> "ThetaSketch":
        th = min(self.theta_u64, other.theta_u64)
        mine = _below(self.hashes, th)
        return ThetaSketch(self.k, th, np.setdiff1d(mine, other.hashes))

    def to_bytes(self) -> bytes:
        """RAW sketch serialization: k (4B) + theta (8B) + hashes LE."""
        import struct

        return struct.pack("<iQ", self.k, self.theta_u64 % 2**64 if self.theta_u64 < 2**64 else 0) + (
            self.hashes.astype("<u8").tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "ThetaSketch":
        import struct

        k, th = struct.unpack("<iQ", b[:12])
        hashes = np.frombuffer(b[12:], dtype="<u8").copy()
        return cls(k, th if th != 0 else 2**64, hashes)


# above this partition count an intermediate executor-side merge level is
# inserted so the driver never folds more than ~fanout blobs serially
_TREE_FANOUT = 64


def theta_sketch(df: DataFrame, col: str, k: int = 4096) -> ThetaSketch:
    """Build a theta sketch of ``col``'s distinct values.

    Two-level tree merge (the segment → server → broker shape): hashes
    stay partition-local; each partition emits its ≤K candidate blob;
    when the partition count exceeds the fanout, blobs are repartitioned
    to √N groups and merged executor-side FIRST, so the driver folds at
    most ~√N small blobs instead of N — at 10⁵ partitions the old
    single-level collect would push GBs through a serial driver loop.
    Candidate truncation is associative (every global top-K hash survives
    each level), so the result is identical to the flat merge."""
    hashed = df.select(F.xxhash64(F.col(col)).alias("h"))

    def _topk(cand: np.ndarray) -> np.ndarray:
        cand = np.unique(cand)
        if len(cand) > k:
            cand.sort()
            cand = cand[:k]
        return cand

    def _partition_topk(batches):
        best: np.ndarray | None = None
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            h += np.uint64(2**63)  # signed → unsigned order-preserving shift
            best = _topk(h if best is None else np.concatenate([best, h]))
        if best is not None and len(best):
            yield pd.DataFrame({"hs": [best.astype("<u8").tobytes()]})

    def _merge_blobs(batches):
        best: np.ndarray | None = None
        for pdf in batches:
            for bs in pdf["hs"]:
                h = np.frombuffer(bs, dtype="<u8")
                best = _topk(h if best is None else np.concatenate([best, h]))
        if best is not None and len(best):
            yield pd.DataFrame({"hs": [best.astype("<u8").tobytes()]})

    blobs = hashed.mapInPandas(_partition_topk, schema="hs binary")
    n_parts = hashed.rdd.getNumPartitions()
    if n_parts > _TREE_FANOUT:
        import math

        blobs = blobs.repartition(max(1, math.isqrt(n_parts))).mapInPandas(
            _merge_blobs, schema="hs binary"
        )
    rows = blobs.collect()
    if not rows:
        return ThetaSketch(k, 2**64, np.array([], dtype=np.uint64))
    allh = np.concatenate([np.frombuffer(r.hs, dtype="<u8") for r in rows])
    return ThetaSketch.from_hashes(k, allh)
