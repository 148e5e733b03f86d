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
(COVERAGE.md Known gaps).

Estimator: MAXIMUM LIKELIHOOD over the full register state — the
flag-bit information is extracted the same way the paper's ML estimator
does (the FGRA closed form approximates this ML solution). Under the
standard Poissonization each register receives Poisson(n/m) items whose
update values are geometric (P(k=j) = 2^-j), so a register state
(u, b1, b0) factorizes into independent events: no item above u
(e^(-y 2^-u)), level u hit (1 - e^(-y 2^-u)), level u-1 hit iff b1,
level u-2 hit iff b0 — levels below u-2 are marginalized out exactly
because Poisson thinning makes them independent. The log-likelihood is
concave in y = n/m with a unique root of its derivative, found by
safeguarded Newton over a ≤256-state histogram. Using the flag bits
this way is what lets ULL beat HLL's ~1.04/sqrt(m) error at equal
register bytes (property-tested in tests/test_ull.py); the HLL-style
harmonic estimate remains as ``estimate_harmonic`` for comparison.

Hash domain matches operators/hll.py: unsigned-64 via the
order-preserving +2^63 shift; top ``p`` bits pick the register, the
remaining bits feed the update value.
"""

from __future__ import annotations

import math
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

    def estimate_harmonic(self) -> float:
        """HLL-style harmonic estimate (ignores the flag bits); kept for
        the ULL-beats-HLL property comparison."""
        m = 1 << self.p
        u = self.registers.astype(np.int64) >> 2
        inv = float(np.sum(np.exp2(-u.astype(np.float64))))
        e = _alpha(m) * m * m / inv
        zeros = int(np.count_nonzero(u == 0))
        if e <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))  # linear counting
        return e

    def _state_terms(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Histogram the ≤256 distinct register states into the ML
        likelihood's per-state (count, miss-weight, hit-weights) terms.

        Per state (u, b1, b0), independent Poisson-thinned events:
        miss weight  W = 2^-u (nothing above u) + each unobserved
        neighbor level; hit weights = level u (2^-u) + each observed
        neighbor level (2^-(u-1) if b1, 2^-(u-2) if b0). Empty registers
        are all-miss with W = 1 (no item at any level). The saturation
        level kmax = 64-p+1 folds the geometric tail: its hit weight is
        2^-(kmax-1) and nothing exists above it."""
        kmax = 64 - self.p + 1
        states, counts = np.unique(self.registers, return_counts=True)
        u = states.astype(np.int64) >> 2
        b1 = (states.astype(np.int64) & 2) > 0
        b2 = (states.astype(np.int64) & 1) > 0
        miss = np.where(
            u == 0, 1.0, np.where(u < kmax, np.exp2(-u.astype(np.float64)), 0.0)
        )
        # neighbor levels u-1 / u-2 (only levels ≥ 1 exist)
        w1 = np.where(u >= 2, np.exp2(-(u - 1).astype(np.float64)), 0.0)
        w2 = np.where(u >= 3, np.exp2(-(u - 2).astype(np.float64)), 0.0)
        miss = miss + np.where(~b1, w1, 0.0) + np.where(~b2, w2, 0.0)
        hit_u = np.where(
            u == 0,
            0.0,
            np.where(u < kmax, np.exp2(-u.astype(np.float64)), 2.0 ** -(kmax - 1)),
        )
        hits = np.stack(
            [hit_u, np.where(b1, w1, 0.0), np.where(b2, w2, 0.0)], axis=1
        )
        return counts.astype(np.float64), miss, hits

    def estimate(self) -> float:
        """Maximum-likelihood distinct estimate over the full register
        state (update values AND flag bits) — see the module docstring
        for the model. Safeguarded Newton on the concave log-likelihood's
        derivative in y = n/m; seeded from the harmonic estimate."""
        m = 1 << self.p
        if not np.any(self.registers):
            return 0.0
        counts, miss, hits = self._state_terms()
        hmask = hits > 0

        def dllh(y: float) -> float:
            # f(y) = -Σ c·W + Σ c·Σ_hits w / (e^{yw} - 1); monotone ↓
            with np.errstate(over="ignore"):
                t = np.where(hmask, hits * y, 1.0)
                contrib = np.where(hmask, hits / np.expm1(np.minimum(t, 700.0)), 0.0)
            return float(np.sum(counts * (contrib.sum(axis=1) - miss)))

        y = max(self.estimate_harmonic() / m, 1e-9)
        # bracket the root (f is decreasing: f(lo) > 0 > f(hi))
        lo, hi = y, y
        while dllh(lo) < 0 and lo > 1e-12:
            lo /= 2
        while dllh(hi) > 0 and hi < 1e12:
            hi *= 2
        for _ in range(80):
            mid = math.sqrt(lo * hi)  # geometric bisection: y spans decades
            if dllh(mid) > 0:
                lo = mid
            else:
                hi = mid
            if hi / lo < 1 + 1e-12:
                break
        return m * math.sqrt(lo * hi)

    def to_bytes(self) -> bytes:
        return bytes([_MAGIC, self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "UllSketch":
        if b[0] != _MAGIC:
            raise ValueError("not an engine-own UltraLogLog (bad magic byte)")
        p = b[1]
        return cls(p, np.frombuffer(b[2 : 2 + (1 << p)], dtype=np.uint8).copy())
