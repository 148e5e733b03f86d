"""Engine-own HyperLogLog: dense register-array sketch for mergeable
approximate distinct counts.

Reference: DISTINCTCOUNTHLL / DISTINCTCOUNTRAWHLL / toHLL
(pinot-core/.../DistinctCountHLLAggregationFunction.java and
SketchFunctions.java:139-162 — the reference serializes
com.clearspring HyperLogLog). This is the PUBLIC Flajolet et al.
HyperLogLog algorithm with linear-counting small-range correction —
engine-own wire format (log2m byte + raw registers), mergeable
(register-wise max) and self-consistent with functions/sketches.py —
NOT clearspring-binary itself; the byte-compatible clearspring
HLL/HLL++ interop (what a real cluster exchanges) is
operators/cs_hll.py, and readers auto-detect the two formats.

Hash domain: unsigned-64 mapped from signed xxhash64 by the same
order-preserving +2^63 shift the theta/tuple sketches use — the top
``log2m`` bits pick the register, the remaining bits feed rho.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_LOG2M = 8  # reference default (CommonConstants.DEFAULT_HYPERLOGLOG_LOG2M=8, ~6.5% err)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@dataclass
class HllSketch:
    log2m: int
    registers: np.ndarray  # uint8, size 2^log2m

    @classmethod
    def empty(cls, log2m: int = DEFAULT_LOG2M) -> "HllSketch":
        return cls(log2m, np.zeros(1 << log2m, dtype=np.uint8))

    @classmethod
    def from_hashes(cls, hashes_u64: np.ndarray, log2m: int = DEFAULT_LOG2M) -> "HllSketch":
        s = cls.empty(log2m)
        if len(hashes_u64) == 0:
            return s
        h = hashes_u64.astype(np.uint64)
        idx = (h >> np.uint64(64 - log2m)).astype(np.int64)
        rest = h << np.uint64(log2m)  # remaining 64-log2m bits, left-aligned
        # rho = leading zeros of rest + 1, capped: all-zero rest -> max
        rho = np.full(len(h), 64 - log2m + 1, dtype=np.uint8)
        nz = rest != 0
        # exact vectorized count-leading-zeros: binary-search shift loop
        # (a float64 log2 would be lossy near exact powers of two)
        cur = rest[nz].copy()
        nlz = np.zeros(len(cur), dtype=np.uint8)
        for s_bits in (32, 16, 8, 4, 2, 1):
            mask = cur >> np.uint64(64 - s_bits) == 0
            nlz[mask] += np.uint8(s_bits)
            cur[mask] = cur[mask] << np.uint64(s_bits)
        rho[nz] = np.minimum(nlz + 1, 64 - log2m + 1).astype(np.uint8)
        np.maximum.at(s.registers, idx, rho)
        return s

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.log2m != self.log2m:
            raise ValueError("HLL merge requires equal log2m")
        return HllSketch(self.log2m, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = 1 << self.log2m
        inv = float(np.sum(np.exp2(-self.registers.astype(np.float64))))
        e = _alpha(m) * m * m / inv
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))  # linear counting
        return e

    def to_bytes(self) -> bytes:
        return bytes([self.log2m]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HllSketch":
        log2m = b[0]
        return cls(log2m, np.frombuffer(b[1 : 1 + (1 << log2m)], dtype=np.uint8).copy())
