"""Apache DataSketches CPC sketch FOREIGN-READ interop: parse the
serialized preamble and serve Java-identical estimates.

The reference's DISTINCTCOUNTCPCSKETCH family wraps
``org.apache.datasketches.cpc.CpcSketch`` and its scalar reader is
``getCpcSketchEstimate(bytes) = Math.round(sketch.getEstimate())``
(pinot-core/.../function/scalar/SketchFunctions.java:378-392).  The
key observation making a read path small: ``CpcSketch.getEstimate``
needs ONLY preamble fields — the HIP accumulator for never-merged
sketches, or the ICON estimator over (lgK, numCoupons) for merged
ones — so the compressed coupon-surprise/window streams can stay
opaque.  Full decompression (required for UNIONS of foreign CPC
bytes) remains a loud named boundary: the CPC compressed body uses
the paper's length-limited-unary/high-entropy coding tables, and
re-implementing those is not needed to ESTIMATE.

Layout facts (pinned by reflective probes of the library's
PreambleUtil and 22 byte dumps, tests/data/ds_cpc_vectors.json):

  byte 0  preamble ints (per format: [2,2,4,8,4,8,6,10])
  byte 1  serVer = 1;  byte 2  family id = 16 (CPC)
  byte 3  lgK;  byte 4  fiCol
  byte 5  flags: 1=bigEndian 2=compressed 4=HIP 8=SV(has surprise
          values) 16=WINDOW;  format ordinal = window<<2 | sv<<1 | hip
  bytes 6-7  seed hash (LE u16; 37836 for the default update seed
          9001 — the same domain the theta family uses)
  [non-empty] numCoupons (LE u32) at offset 8; when HIP: kxp (LE f64)
  at 16 and hipAccum (LE f64) at 24 (after the format's length
  fields); compressed streams follow at the format's stream offsets.

The ICON estimator is reconstructed from the library's (public)
implementation: for c < 2 return c; above the c > (5.7|5.6)·k
threshold use 0.7940236163830469·k·2^(c/k); otherwise evaluate the
20-term Horner polynomial for lgK (rows 4..26 of the public
iconPolynomialCoefficents table, pinot_spark/data/cpc_icon.json — the
CPC paper's characterization data) at x = c/(2k), times
c·(1 + (c/k)³/66.774757), floored at c.  Exact against 27 reflective
probes and every golden sketch estimate, including a CpcUnion result
(the merged / ICON path).
"""

from __future__ import annotations

import json
import os
import struct

DEFAULT_LGK = 12  # CommonConstants.DEFAULT_CPC_SKETCH_LGK
_FAMILY_CPC = 16
_SEED_HASH = 0xCC93  # LE bytes of 37836, ThetaUtil.computeSeedHash(9001)
_F_HIP, _F_SV, _F_WINDOW = 4, 8, 16
_PRE_INTS = [2, 2, 4, 8, 4, 8, 6, 10]

_ICON_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "cpc_icon.json"
)
_ICON_CACHE: list | None = None


def _icon_coeffs() -> list:
    global _ICON_CACHE
    if _ICON_CACHE is None:
        _ICON_CACHE = json.load(open(_ICON_PATH))["iconPolynomialCoefficents"]
    return _ICON_CACHE


def icon_estimate(lg_k: int, c: int) -> float:
    """IconEstimator.getIconEstimate — bit-faithful reconstruction."""
    if not 4 <= lg_k <= 26:
        raise ValueError("CPC lgK out of the supported 4..26 range")
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = 1 << lg_k
    thresh = 5.7 if lg_k < 14 else 5.6
    if c > thresh * k:
        return 0.7940236163830469 * k * 2.0 ** (c / k)
    coeffs = _icon_coeffs()
    start = 20 * (lg_k - 4)
    x = c / (2.0 * k)
    # Horner from the highest coefficient down
    acc = coeffs[start + 20 - 1]
    for i in range(start + 18, start - 1, -1):
        acc = acc * x + coeffs[i]
    ratio = c / k
    result = c * acc * (1.0 + (ratio * ratio * ratio) / 66.774757)
    return result if result >= c else float(c)


class DsCpcView:
    """A parsed-preamble view of a serialized CpcSketch — enough state
    to estimate; the compressed streams stay opaque."""

    def __init__(self, lg_k: int, num_coupons: int, has_hip: bool, hip_accum: float):
        self.lg_k = lg_k
        self.num_coupons = num_coupons
        self.has_hip = has_hip
        self.hip_accum = hip_accum

    @classmethod
    def parse(cls, b: bytes) -> "DsCpcView":
        if len(b) < 8:
            raise ValueError("not a DataSketches CPC byte array")
        pre_ints, ser_ver, family, lg_k, _fi_col, flags, seed_hash = struct.unpack_from(
            "<BBBBBBH", b, 0
        )
        if family != _FAMILY_CPC or ser_ver != 1:
            raise ValueError("not a DataSketches CPC byte array")
        fmt = (
            (4 if flags & _F_WINDOW else 0)
            | (2 if flags & _F_SV else 0)
            | (1 if flags & _F_HIP else 0)
        )
        if pre_ints != _PRE_INTS[fmt]:
            raise ValueError("CPC preamble length does not match its format")
        if seed_hash != (_SEED_HASH & 0xFFFF) and seed_hash != 0x93CC:
            # the engine only exchanges default-seed (9001) sketches,
            # like its theta family — a foreign seed estimates wrong
            raise ValueError(
                "CPC sketch uses a non-default update seed — only the "
                "DataSketches default seed 9001 is exchangeable here"
            )
        if fmt in (0, 1):  # EMPTY_MERGED / EMPTY_HIP
            return cls(lg_k, 0, bool(flags & _F_HIP), 0.0)
        num_coupons = struct.unpack_from("<I", b, 8)[0]
        hip = bool(flags & _F_HIP)
        hip_accum = struct.unpack_from("<d", b, 24)[0] if hip else 0.0
        return cls(lg_k, num_coupons, hip, hip_accum)

    def estimate(self) -> float:
        """CpcSketch.getEstimate: the HIP accumulator when the sketch
        was never merged, else the ICON estimator."""
        if self.num_coupons == 0:
            return 0.0
        if self.has_hip:
            return self.hip_accum
        return icon_estimate(self.lg_k, self.num_coupons)


def is_ds_cpc_bytes(b: bytes) -> bool:
    if len(b) < 8 or b[2] != _FAMILY_CPC or b[1] != 1:
        return False
    flags = b[5]
    fmt = (
        (4 if flags & _F_WINDOW else 0)
        | (2 if flags & _F_SV else 0)
        | (1 if flags & _F_HIP else 0)
    )
    return b[0] == _PRE_INTS[fmt]
