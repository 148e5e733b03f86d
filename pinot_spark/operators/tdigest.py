"""Merging t-digest: mergeable quantile sketch with serialized (RAW)
output.

Reference: PERCENTILETDIGEST / PERCENTILERAWTDIGEST
(pinot-segment-spi/.../AggregationFunctionType.java:122-140; Pinot wraps
com.tdunning's t-digest). The t-digest is a public algorithm (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests"): values
compress into centroids whose maximum weight shrinks near the tails
(scale function k1), giving ~relative-error quantiles that merge
associatively — the property Pinot needs for segment→broker rollup.

Build shape mirrors operators/theta.py: per-partition digests via
``mapInPandas`` (no shuffle), merged on the driver — the segment→broker
merge. ``percentile_approx`` remains the oracle-parity path; this class
supplies the RAW mergeable-bytes surface.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F


@dataclass
class TDigest:
    """Centroid-list t-digest with the k1 (asin) scale function."""

    compression: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.array([], dtype=np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.array([], dtype=np.float64))
    _buffer: list = field(default_factory=list)

    # -- build -------------------------------------------------------------

    def add(self, values) -> None:
        self._buffer.extend(np.asarray(values, dtype=np.float64))
        if len(self._buffer) > 10 * self.compression:
            self._compress()

    def _k(self, q: float) -> float:
        # k1 scale function: delta/(2*pi) * asin(2q - 1)
        return self.compression / (2 * math.pi) * math.asin(2 * q - 1)

    def _compress(self) -> None:
        if self._buffer:
            means = np.concatenate([self.means, np.array(self._buffer)])
            weights = np.concatenate([self.weights, np.ones(len(self._buffer))])
            self._buffer = []
        else:
            means, weights = self.means, self.weights
        if len(means) == 0:
            return
        order = np.argsort(means)
        means, weights = means[order], weights[order]
        total = weights.sum()
        new_m: list[float] = []
        new_w: list[float] = []
        q0 = 0.0
        q_limit = self._q_limit(q0)
        acc_m, acc_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = q0 + (acc_w + w) / total
            if q <= q_limit:
                acc_m = (acc_m * acc_w + m * w) / (acc_w + w)
                acc_w += w
            else:
                new_m.append(acc_m)
                new_w.append(acc_w)
                q0 += acc_w / total
                q_limit = self._q_limit(q0)
                acc_m, acc_w = m, w
        new_m.append(acc_m)
        new_w.append(acc_w)
        self.means = np.array(new_m)
        self.weights = np.array(new_w)

    def _q_limit(self, q0: float) -> float:
        k = self._k(max(min(q0, 1.0), 0.0)) + 1.0
        # invert k1: q = (sin(2*pi*k/delta) + 1) / 2
        x = 2 * math.pi * k / self.compression
        if x >= math.pi / 2:
            return 1.0
        return (math.sin(x) + 1) / 2

    # -- query -------------------------------------------------------------

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target)
        # linear interpolation between adjacent centroid centers
        c0, c1 = cum[i - 1], cum[i]
        m0, m1 = self.means[i - 1], self.means[i]
        return float(m0 + (m1 - m0) * (target - c0) / (c1 - c0))

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        self._compress()
        other._compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compress()
        return out

    # -- RAW bytes ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        n = len(self.means)
        return (
            struct.pack("<di", self.compression, n)
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        compression, n = struct.unpack("<di", b[:12])
        means = np.frombuffer(b[12 : 12 + 8 * n], dtype="<f8").copy()
        weights = np.frombuffer(b[12 + 8 * n : 12 + 16 * n], dtype="<f8").copy()
        return cls(compression, means, weights)


# see operators/theta.py: same two-level merge rationale
_TREE_FANOUT = 64


def tdigest_sketch(df: DataFrame, col: str, compression: float = 100.0) -> TDigest:
    """Distributed build with a two-level tree merge (segment → server →
    broker shape): per-partition digests via mapInPandas (no shuffle of
    raw values); beyond the fanout the per-partition digest blobs are
    repartitioned to √N groups and merged executor-side, so the driver
    folds ~√N digests instead of one per input partition — t-digest merge
    is associative, only centroid grouping (not quantile correctness
    bounds) depends on merge order."""
    vals = df.select(F.col(col).cast("double").alias("v")).filter(F.col("v").isNotNull())

    def _partition_digest(batches):
        td = TDigest(compression)
        seen = False
        for pdf in batches:
            arr = pdf["v"].to_numpy(dtype=np.float64)
            if len(arr):
                td.add(arr)
                seen = True
        if seen:
            yield pd.DataFrame({"d": [td.to_bytes()]})

    def _merge_digests(batches):
        out = TDigest(compression)
        seen = False
        for pdf in batches:
            for bs in pdf["d"]:
                out = out.merge(TDigest.from_bytes(bs))
                seen = True
        if seen:
            yield pd.DataFrame({"d": [out.to_bytes()]})

    blobs = vals.mapInPandas(_partition_digest, schema="d binary")
    n_parts = vals.rdd.getNumPartitions()
    if n_parts > _TREE_FANOUT:
        import math

        blobs = blobs.repartition(max(1, math.isqrt(n_parts))).mapInPandas(
            _merge_digests, schema="d binary"
        )
    rows = blobs.collect()
    out = TDigest(compression)
    for r in rows:
        out = out.merge(TDigest.from_bytes(r.d))
    return out
