"""Engine-own UltraLogLog: dense one-byte-register sketch for mergeable
approximate distinct counts with the paper's packed register layout.

Reference: DISTINCTCOUNTULL / DISTINCTCOUNTRAWULL / toULL
(pinot-core/.../DistinctCountULLAggregationFunction.java and
SketchFunctions.java:472-498 — the reference serializes
com.dynatrace.hash4j UltraLogLog). This implements the PUBLIC
UltraLogLog register structure (Ertl, "UltraLogLog: A Practical and More
Space-Efficient Alternative to HyperLogLog for Approximate Distinct
Counting", VLDB 2024): each register packs ``4*u + flags`` where ``u``
is the largest HLL-style update value observed for the register and the
two flag bits record whether ``u-1`` / ``u-2`` were also observed —
the extra state that lets ULL beat HLL's space-accuracy trade-off.
ENGINE-OWN wire format (magic 'U' + p + raw registers), mergeable and
self-consistent across this engine, NOT hash4j binary-compatible
(COVERAGE.md Known gaps). The estimator served here is the harmonic
(HLL-style) estimate over the max-update components with linear-counting
small-range correction — the paper's ML/FGRA estimators that squeeze
extra accuracy out of the flag bits are not implemented, so the error
envelope is HLL's ~1.04/sqrt(m); the flag bits are faithfully built,
merged and serialized.

Hash domain matches operators/hll.py: unsigned-64 via the
order-preserving +2^63 shift; top ``p`` bits pick the register, the
remaining bits feed the update value.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_P = 12  # reference default (CommonConstants.DEFAULT_ULTRALOGLOG_P=12)

_MAGIC = 0x55  # 'U' — distinguishes ULL bytes from HLL's log2m-first layout


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _update_values(hashes_u64: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, update value k) per hash — k is the HLL rho:
    leading zeros of the left-aligned remaining bits + 1, capped."""
    h = hashes_u64.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    k = np.full(len(h), 64 - p + 1, dtype=np.int64)
    nz = rest != 0
    cur = rest[nz].copy()
    nlz = np.zeros(len(cur), dtype=np.int64)
    for s_bits in (32, 16, 8, 4, 2, 1):
        mask = cur >> np.uint64(64 - s_bits) == 0
        nlz[mask] += s_bits
        cur[mask] = cur[mask] << np.uint64(s_bits)
    k[nz] = np.minimum(nlz + 1, 64 - p + 1)
    return idx, k


def _pack(idx: np.ndarray, k: np.ndarray, p: int) -> np.ndarray:
    """Registers from the (idx, k) multiset: u = max k per register,
    flag bits = presence of u-1 / u-2 among the k values."""
    m = 1 << p
    u = np.zeros(m, dtype=np.int64)
    np.maximum.at(u, idx, k)
    b1 = np.zeros(m, dtype=bool)  # u-1 seen
    b2 = np.zeros(m, dtype=bool)  # u-2 seen
    np.logical_or.at(b1, idx[k == u[idx] - 1], True)
    np.logical_or.at(b2, idx[k == u[idx] - 2], True)
    regs = np.where(u > 0, 4 * u + 2 * b1.astype(np.int64) + b2.astype(np.int64), 0)
    return regs.astype(np.uint8)


def _contains(u: np.ndarray, b: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Does register state (u, flags) assert presence of value v?"""
    return (v > 0) & (
        (v == u) | ((v == u - 1) & (b & 2 > 0)) | ((v == u - 2) & (b & 1 > 0))
    )


@dataclass
class UllSketch:
    p: int
    registers: np.ndarray  # uint8, size 2^p, each 4*u + flags

    @classmethod
    def empty(cls, p: int = DEFAULT_P) -> "UllSketch":
        return cls(p, np.zeros(1 << p, dtype=np.uint8))

    @classmethod
    def from_hashes(cls, hashes_u64: np.ndarray, p: int = DEFAULT_P) -> "UllSketch":
        if len(hashes_u64) == 0:
            return cls.empty(p)
        idx, k = _update_values(np.asarray(hashes_u64, dtype=np.uint64), p)
        return cls(p, _pack(idx, k, p))

    @classmethod
    def from_pairs(cls, pairs: np.ndarray, p: int) -> "UllSketch":
        """Build from pre-reduced ``idx * 64 + k`` pairs (the bounded-
        domain SQL aggregation path — dialect._hll_pair_expr)."""
        if len(pairs) == 0:
            return cls.empty(p)
        pr = np.asarray(pairs, dtype=np.int64)
        return cls(p, _pack(pr >> 6, pr & 63, p))

    def merge(self, other: "UllSketch") -> "UllSketch":
        if other.p != self.p:
            raise ValueError("ULL merge requires equal p")
        u1, b1 = self.registers.astype(np.int64) >> 2, self.registers.astype(np.int64) & 3
        u2, b2 = other.registers.astype(np.int64) >> 2, other.registers.astype(np.int64) & 3
        u = np.maximum(u1, u2)
        f1 = _contains(u1, b1, u - 1) | _contains(u2, b2, u - 1)
        f2 = _contains(u1, b1, u - 2) | _contains(u2, b2, u - 2)
        regs = np.where(u > 0, 4 * u + 2 * f1.astype(np.int64) + f2.astype(np.int64), 0)
        return UllSketch(self.p, regs.astype(np.uint8))

    def estimate(self) -> float:
        m = 1 << self.p
        u = self.registers.astype(np.int64) >> 2
        inv = float(np.sum(np.exp2(-u.astype(np.float64))))
        e = _alpha(m) * m * m / inv
        zeros = int(np.count_nonzero(u == 0))
        if e <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))  # linear counting
        return e

    def to_bytes(self) -> bytes:
        return bytes([_MAGIC, self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "UllSketch":
        if b[0] != _MAGIC:
            raise ValueError("not an engine-own UltraLogLog (bad magic byte)")
        p = b[1]
        return cls(p, np.frombuffer(b[2 : 2 + (1 << p)], dtype=np.uint8).copy())
