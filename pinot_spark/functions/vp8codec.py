"""Lossy WebP (VP8 keyframe) decoder — RFC 6386 implemented in full.

Decodes the intra-only (keyframe) VP8 bitstream that every lossy WebP
file carries: boolean-arithmetic header parse, per-macroblock intra
mode decoding, token/coefficient decoding against the RFC 6386 default
probability tables (vp8_tables.py), dequantization, inverse WHT/DCT,
all twelve intra predictors, the normal/simple in-loop deblocking
filter, and libwebp's "fancy" chroma upsampler + fixed-point YUV→RGB
conversion so the output is BYTE-EXACT against libwebp's own decode of
the same file (pinned in tests/test_vp8codec.py on real
libwebp-encoded fixtures).

Reference parity: the reference analytics engine ships no image
codecs at all (adjudicated in round 15); this backs the multimodal
feature-extraction operators' decode path.  Only the parts of the
format a lossy *WebP* can contain are implemented: keyframes, intra
prediction, up to eight token partitions.  Interframe features
(motion vectors, golden/altref buffers) cannot occur in a WebP file
and raise NotImplementedError by name.

Scale note: this is the per-document Python path executed inside
mapInPandas batches of the multimodal operators — per-row work, no
driver involvement; throughput scales with executors.
"""

from __future__ import annotations

import struct

import numpy as np

from pinot_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    PCAT1,
    PCAT2,
    PCAT3,
    PCAT4,
    PCAT5,
    PCAT6,
    ZIGZAG,
)
from pinot_spark.functions.webpcodec import _BoolDecoder

# 17th entry so the "band of n+1" lookup at n=15 stays in range
# (RFC 6386 13.3: the value is never used, the loop ends at 16).
_BANDS17 = list(COEFF_BANDS) + [0]
_CAT3456 = [PCAT3, PCAT4, PCAT5, PCAT6]

# Intra modes (RFC 6386 section 11.2 semantics).  The SUBBLOCK mode
# numbering follows libwebp's enum (RD/VR before LD) rather than the
# RFC enum ordering, because KF_BMODE_PROBS is laid out in that order
# — the tree below carries the same SEMANTIC structure as the RFC's
# bmode_tree, so the decoded bitstream is identical; only the integer
# labels differ, and they must agree with the [above][left] table
# indexing (a mismatch mis-contexts every mode whose neighbor is one
# of RD/VR/LD).
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# 16x16 mode → equivalent subblock mode for bmode contexts (11.3).
_YMODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

_KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
_UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
_BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]


def _tree_read(bd: _BoolDecoder, tree: list[int], probs) -> int:
    """RFC 6386 section 8.2 generic tree decoder: probs[i >> 1] gates
    the branch at tree position i; negative entries are leaves."""
    i = tree[0 + bd.bool_(probs[0])]
    while i > 0:
        i = tree[i + bd.bool_(probs[i >> 1])]
    return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


class _FrameHeader:
    """Decoded first-partition state for one keyframe."""

    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "segmentation", "update_map", "seg_abs",
        "seg_quant", "seg_lf", "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "partitions", "quant", "probs",
        "mb_no_skip", "prob_skip",
    )


def _parse_quant(bd: _BoolDecoder) -> dict[str, int]:
    return {
        "y_ac_qi": bd.literal(7),
        "y_dc_delta": bd.flagged_signed(4),
        "y2_dc_delta": bd.flagged_signed(4),
        "y2_ac_delta": bd.flagged_signed(4),
        "uv_dc_delta": bd.flagged_signed(4),
        "uv_ac_delta": bd.flagged_signed(4),
    }


def _dequant_factors(h: "_FrameHeader", segment: int):
    """RFC 6386 section 14.1: per-plane (dc, ac) step sizes from the
    frame quantizer index plus segment and per-plane deltas."""
    q = h.quant["y_ac_qi"]
    if h.segmentation:
        q = h.seg_quant[segment] if h.seg_abs else q + h.seg_quant[segment]
    q = _clamp_q(q)
    y1dc = DC_QLOOKUP[_clamp_q(q + h.quant["y_dc_delta"])]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[_clamp_q(q + h.quant["y2_dc_delta"])] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q + h.quant["y2_ac_delta"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q + h.quant["uv_dc_delta"])]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q + h.quant["uv_ac_delta"])]
    return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)


def _parse_frame_header(payload: bytes):
    """Parse the uncompressed frame tag + the boolean-coded first
    partition of a keyframe (RFC 6386 section 9), returning the header
    state, the per-MB-info bool decoder (positioned at the first MB),
    and the token-partition bool decoders."""
    tag = payload[0] | payload[1] << 8 | payload[2] << 16
    keyframe = not (tag & 1)
    version = (tag >> 1) & 7
    show = (tag >> 4) & 1
    first_len = tag >> 5
    if not keyframe:
        raise NotImplementedError(
            "VP8 interframe (not possible in a WebP file)"
        )
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    width = (payload[6] | payload[7] << 8) & 0x3FFF
    height = (payload[8] | payload[9] << 8) & 0x3FFF
    if version > 3:
        raise ValueError(f"bad VP8 version {version}")
    del show

    bd = _BoolDecoder(payload[10 : 10 + first_len])
    h = _FrameHeader()
    h.width, h.height = width, height
    h.mb_w, h.mb_h = (width + 15) >> 4, (height + 15) >> 4

    bd.literal(1)  # color space (must be 0 for WebP)
    bd.literal(1)  # clamping type

    # --- segmentation (9.3) ---
    h.segmentation = bool(bd.literal(1))
    h.update_map = False
    h.seg_abs = False
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_map = bool(bd.literal(1))
        update_data = bd.literal(1)
        if update_data:
            h.seg_abs = bool(bd.literal(1))
            h.seg_quant = [bd.flagged_signed(7) for _ in range(4)]
            h.seg_lf = [bd.flagged_signed(6) for _ in range(4)]
        if h.update_map:
            h.seg_tree_probs = [
                bd.literal(8) if bd.bool_(128) else 255 for _ in range(3)
            ]

    # --- loop filter (9.4) ---
    h.filter_type = "simple" if bd.literal(1) else "normal"
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bool(bd.literal(1))
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.literal(1):  # deltas updated this frame
            h.ref_lf_deltas = [bd.flagged_signed(6) for _ in range(4)]
            h.mode_lf_deltas = [bd.flagged_signed(6) for _ in range(4)]

    # --- token partitions (9.5) ---
    n_parts = 1 << bd.literal(2)
    part_start = 10 + first_len + 3 * (n_parts - 1)
    sizes = []
    p = 10 + first_len
    for _ in range(n_parts - 1):
        sizes.append(payload[p] | payload[p + 1] << 8 | payload[p + 2] << 16)
        p += 3
    sizes.append(len(payload) - part_start - sum(sizes))
    h.partitions = []
    off = part_start
    for s in sizes:
        h.partitions.append(_BoolDecoder(payload[off : off + s]))
        off += s

    # --- quantizer indices (9.6) ---
    h.quant = _parse_quant(bd)

    # --- refresh + token probability updates (9.7/13.4) ---
    bd.literal(1)  # refresh_entropy_probs (no cross-frame state here)
    probs = [
        [[list(DEFAULT_COEFF_PROBS[i][j][k]) for k in range(3)]
         for j in range(8)]
        for i in range(4)
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                row = probs[i][j][k]
                upd = COEFF_UPDATE_PROBS[i][j][k]
                for ll in range(11):
                    if bd.bool_(upd[ll]):
                        row[ll] = bd.literal(8)
    h.probs = probs

    # --- per-MB skip flag probability (9.10) ---
    h.mb_no_skip = bool(bd.literal(1))
    h.prob_skip = bd.literal(8) if h.mb_no_skip else 0
    return h, bd


def _get_large_value(bd: _BoolDecoder, p) -> int:
    """RFC 6386 section 13.2 token values above 4 (category decoding)."""
    if not bd.bool_(p[3]):
        if not bd.bool_(p[4]):
            return 2
        return 3 + bd.bool_(p[5])
    if not bd.bool_(p[6]):
        if not bd.bool_(p[7]):
            return 5 + bd.bool_(PCAT1[0])
        v = 7 + 2 * bd.bool_(PCAT2[0])
        return v + bd.bool_(PCAT2[1])
    bit1 = bd.bool_(p[8])
    bit0 = bd.bool_(p[9 + bit1])
    cat = 2 * bit1 + bit0
    v = 0
    for prob in _CAT3456[cat]:
        v += v + bd.bool_(prob)
    return v + 3 + (8 << cat)


def _get_coeffs(bd: _BoolDecoder, plane_probs, ctx: int, dq, first: int,
                out: list[int]) -> int:
    """Decode one 4x4 coefficient block (RFC 6386 section 13.3),
    writing DEQUANTIZED values in raster order into ``out``.  Returns
    the position after the last decoded coefficient (0 if none)."""
    n = first
    p = plane_probs[_BANDS17[n]][ctx]
    while n < 16:
        if not bd.bool_(p[0]):
            return n  # end of block
        while not bd.bool_(p[1]):  # zero run: EOB cannot follow a zero
            n += 1
            if n == 16:
                return 16
            p = plane_probs[_BANDS17[n]][0]
        if not bd.bool_(p[2]):
            v = 1
            next_ctx = 1
        else:
            v = _get_large_value(bd, p)
            next_ctx = 2
        if bd.bool_(128):
            v = -v
        out[ZIGZAG[n]] = v * dq[1 if n > 0 else 0]
        n += 1
        if n == 16:
            return 16
        p = plane_probs[_BANDS17[n]][next_ctx]
    return 16


# --- inverse transforms (RFC 6386 sections 14.3 / 14.4) ---------------

_C1, _C2 = 20091, 35468  # cospi8sqrt2minus1, sinpi8sqrt2 (Q16)


def _iwht4x4(coeffs: list[int]) -> list[int]:
    """Inverse Walsh-Hadamard for the Y2 (DC) block, RFC 14.3."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(coeffs: list[int]) -> list[int]:
    """Exact integer inverse DCT, RFC 14.4 (20091/35468 Q16 rotation)."""
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4 = coeffs[i], coeffs[4 + i]
        ip8, ip12 = coeffs[8 + i], coeffs[12 + i]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        c1 = ((ip4 * _C2) >> 16) - (ip12 + ((ip12 * _C1) >> 16))
        d1 = (ip4 + ((ip4 * _C1) >> 16)) + ((ip12 * _C2) >> 16)
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        ip0, ip1, ip2, ip3 = tmp[r], tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        c1 = ((ip1 * _C2) >> 16) - (ip3 + ((ip3 * _C1) >> 16))
        d1 = (ip1 + ((ip1 * _C1) >> 16)) + ((ip3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# --- intra prediction (RFC 6386 section 12) ---------------------------


def _pred16_or_8(M: np.ndarray, n: int, mode: int, has_above: bool,
                 has_left: bool) -> None:
    """Whole-block DC/V/H/TM prediction into M[1:n+1, 1:n+1], where
    M row 0 / col 0 hold the (already defaulted) above/left borders."""
    a = M[0, 1 : n + 1].astype(np.int32)
    le = M[1 : n + 1, 0].astype(np.int32)
    if mode == DC_PRED:
        if has_above and has_left:
            dc = (int(a.sum()) + int(le.sum()) + n) >> _dc_shift(n, 2)
        elif has_above:
            dc = (int(a.sum()) + n // 2) >> _dc_shift(n, 1)
        elif has_left:
            dc = (int(le.sum()) + n // 2) >> _dc_shift(n, 1)
        else:
            dc = 128
        M[1 : n + 1, 1 : n + 1] = dc
    elif mode == V_PRED:
        M[1 : n + 1, 1 : n + 1] = a[None, :]
    elif mode == H_PRED:
        M[1 : n + 1, 1 : n + 1] = le[:, None]
    else:  # TM_PRED
        p = int(M[0, 0])
        M[1 : n + 1, 1 : n + 1] = np.clip(
            le[:, None] + a[None, :] - p, 0, 255
        )


def _dc_shift(n: int, sides: int) -> int:
    # n=16: both sides -> >>5, one side -> >>4; n=8: >>4 / >>3
    base = 4 if n == 16 else 3
    return base + (1 if sides == 2 else 0)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(M: np.ndarray, r0: int, c0: int, mode: int) -> np.ndarray:
    """One 4x4 subblock predictor (RFC 6386 section 12.3).  ``M`` is the
    21x21 working buffer with borders; (r0, c0) index the subblock's
    top-left PIXEL inside M (so the above row is M[r0-1]).  Above-right
    pixels beyond the MB use the stored row (the VP8 convention: all
    right-edge subblocks reuse the MB's top-right row)."""
    A = M[r0 - 1, c0 : c0 + 8].astype(np.int64)
    L = M[r0 : r0 + 4, c0 - 1].astype(np.int64)
    P = int(M[r0 - 1, c0 - 1])
    b = np.empty((4, 4), np.int64)
    if mode == B_DC:
        b[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        b[:] = np.clip(L[:, None] + A[None, :4] - P, 0, 255)
    elif mode == B_VE:
        e = [P, A[0], A[1], A[2], A[3], A[4]]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        b[:] = np.array(row)[None, :]
    elif mode == B_HE:
        e = [P, L[0], L[1], L[2], L[3], L[3]]
        col = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        b[:] = np.array(col)[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    b[r, c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    b[r, c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD:
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 3 - r + c
                b[r, c] = _avg3(E[i], E[i + 1], E[i + 2])
    elif mode == B_VR:
        b[0, 0] = _avg2(P, A[0])
        b[0, 1] = _avg2(A[0], A[1])
        b[0, 2] = _avg2(A[1], A[2])
        b[0, 3] = _avg2(A[2], A[3])
        b[1, 0] = _avg3(L[0], P, A[0])
        b[1, 1] = _avg3(P, A[0], A[1])
        b[1, 2] = _avg3(A[0], A[1], A[2])
        b[1, 3] = _avg3(A[1], A[2], A[3])
        b[2, 0] = _avg3(P, L[0], L[1])
        b[2, 1:4] = b[0, 0:3]
        b[3, 0] = _avg3(L[0], L[1], L[2])
        b[3, 1:4] = b[1, 0:3]
    elif mode == B_VL:
        b[0, 0] = _avg2(A[0], A[1])
        b[0, 1] = _avg2(A[1], A[2])
        b[0, 2] = _avg2(A[2], A[3])
        b[0, 3] = _avg2(A[3], A[4])
        b[1, 0] = _avg3(A[0], A[1], A[2])
        b[1, 1] = _avg3(A[1], A[2], A[3])
        b[1, 2] = _avg3(A[2], A[3], A[4])
        b[1, 3] = _avg3(A[3], A[4], A[5])
        b[2, 0:3] = b[0, 1:4]
        b[2, 3] = _avg3(A[4], A[5], A[6])
        b[3, 0:3] = b[1, 1:4]
        b[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        b[0, 0] = _avg2(P, L[0])
        b[0, 1] = _avg3(L[0], P, A[0])
        b[0, 2] = _avg3(P, A[0], A[1])
        b[0, 3] = _avg3(A[0], A[1], A[2])
        b[1, 0] = _avg2(L[0], L[1])
        b[1, 1] = _avg3(P, L[0], L[1])
        b[1, 2:4] = b[0, 0:2]
        b[2, 0] = _avg2(L[1], L[2])
        b[2, 1] = _avg3(L[0], L[1], L[2])
        b[2, 2:4] = b[1, 0:2]
        b[3, 0] = _avg2(L[2], L[3])
        b[3, 1] = _avg3(L[1], L[2], L[3])
        b[3, 2:4] = b[2, 0:2]
    elif mode == B_HU:
        b[0, 0] = _avg2(L[0], L[1])
        b[0, 1] = _avg3(L[0], L[1], L[2])
        b[0, 2] = _avg2(L[1], L[2])
        b[0, 3] = _avg3(L[1], L[2], L[3])
        b[1, 0:2] = b[0, 2:4]
        b[1, 2] = _avg2(L[2], L[3])
        b[1, 3] = _avg3(L[2], L[3], L[3])
        b[2, 0:2] = b[1, 2:4]
        b[2, 2] = b[2, 3] = L[3]
        b[3, :] = L[3]
    else:  # pragma: no cover - tree cannot emit other values
        raise ValueError(f"bad b mode {mode}")
    return b


def _add_residue(M: np.ndarray, r0: int, c0: int,
                 coeffs: list[int]) -> None:
    """Inverse-transform the block's dequantized coefficients and add
    them to the prediction in place, clamping to pixel range."""
    block = M[r0 : r0 + 4, c0 : c0 + 4].astype(np.int32)
    block += np.asarray(_idct4x4(coeffs), np.int32).reshape(4, 4)
    M[r0 : r0 + 4, c0 : c0 + 4] = np.clip(block, 0, 255)


class _MBInfo:
    __slots__ = ("ymode", "uvmode", "bmodes", "segment",
                 "coeffs", "has_coeffs")


def _decode_mb_modes(bd: _BoolDecoder, h: "_FrameHeader", mb_x: int,
                     above_bmodes: list[list[int]],
                     left_bmodes: list[int],
                     above_seg: list[int]) -> "_MBInfo":
    """Per-MB mode decoding from the first partition (RFC 6386
    sections 10/11, keyframe variant)."""
    mb = _MBInfo()
    mb.segment = above_seg[mb_x]  # carried when the map is not updated
    if h.segmentation and h.update_map:
        mb.segment = _tree_read(bd, _SEGMENT_TREE, h.seg_tree_probs)
    skip = bd.bool_(h.prob_skip) if h.mb_no_skip else 0
    ymode = _tree_read(bd, _KF_YMODE_TREE, KF_YMODE_PROBS)
    mb.ymode = ymode
    if ymode == B_PRED:
        bmodes = [0] * 16
        for sb in range(16):
            r, c = sb >> 2, sb & 3
            above = (
                bmodes[sb - 4] if r > 0 else above_bmodes[mb_x][c]
            )
            left = bmodes[sb - 1] if c > 0 else left_bmodes[r]
            bmodes[sb] = _tree_read(
                bd, _BMODE_TREE, KF_BMODE_PROBS[above][left]
            )
        mb.bmodes = bmodes
    else:
        mb.bmodes = [_YMODE_TO_B[ymode]] * 16
    mb.uvmode = _tree_read(bd, _UV_MODE_TREE, KF_UV_MODE_PROBS)
    # neighbor bookkeeping for the NEXT MBs
    above_bmodes[mb_x] = mb.bmodes[12:16]
    left_bmodes[:] = [mb.bmodes[3], mb.bmodes[7], mb.bmodes[11],
                      mb.bmodes[15]]
    above_seg[mb_x] = mb.segment
    return mb, skip


def _decode_mb_residuals(tok: _BoolDecoder, h: "_FrameHeader",
                         mb: "_MBInfo", skip: int, mb_x: int,
                         above_nz: list[list[int]],
                         left_nz: list[int]) -> None:
    """Token decoding for one MB (RFC 6386 section 13): 24 or 25
    blocks, with left/above nonzero-context bookkeeping.  Context slot
    layout per MB column: 0-3 Y, 4-5 U, 6-7 V, 8 Y2."""
    dq_y1, dq_y2, dq_uv = _dequant_factors(h, mb.segment)
    coeffs = [[0] * 16 for _ in range(25)]
    mb.coeffs = coeffs
    has_y2 = mb.ymode != B_PRED
    if skip:
        left_nz[0:8] = [0] * 8
        above_nz[mb_x][0:8] = [0] * 8
        if has_y2:
            # the Y2 context slot is only touched by MBs that HAVE a
            # Y2 block; a skipped B_PRED MB leaves it untouched
            left_nz[8] = above_nz[mb_x][8] = 0
        mb.has_coeffs = False
        return
    total_nz = 0
    if has_y2:
        ctx = left_nz[8] + above_nz[mb_x][8]
        nz = _get_coeffs(tok, h.probs[1], ctx, dq_y2, 0, coeffs[24])
        left_nz[8] = above_nz[mb_x][8] = 1 if nz > 0 else 0
        total_nz += nz
        first, ytype = 1, 0
    else:
        first, ytype = 0, 3
    for sb in range(16):
        r, c = sb >> 2, sb & 3
        ctx = left_nz[r] + above_nz[mb_x][c]
        nz = _get_coeffs(tok, h.probs[ytype], ctx, dq_y1, first, coeffs[sb])
        flag = 1 if nz > first else 0
        left_nz[r] = above_nz[mb_x][c] = flag
        total_nz += flag
    for ch in range(2):  # 0 = U, 1 = V
        for sb in range(4):
            r, c = sb >> 1, sb & 1
            slot = 4 + 2 * ch + r
            actx = 4 + 2 * ch + c
            # chroma context slots: left indexed by subblock row,
            # above indexed by subblock column
            ctx = left_nz[slot] + above_nz[mb_x][actx]
            nz = _get_coeffs(
                tok, h.probs[2], ctx, dq_uv, 0, coeffs[16 + 4 * ch + sb]
            )
            flag = 1 if nz > 0 else 0
            left_nz[slot] = above_nz[mb_x][actx] = flag
            total_nz += nz
    mb.has_coeffs = total_nz > 0


def _reconstruct_mb(h: "_FrameHeader", mb: "_MBInfo", mb_x: int, mb_y: int,
                    Y: np.ndarray, U: np.ndarray, V: np.ndarray) -> None:
    """Predict + inverse-transform one MB into the padded planes.
    ``Y``/``U``/``V`` carry a 1-px top/left border at index 0 and an
    8-px right extension so above-right reads never go out of range."""
    has_above, has_left = mb_y > 0, mb_x > 0
    coeffs = mb.coeffs
    if mb.ymode != B_PRED:
        # Y2: inverse WHT feeds each subblock's DC (RFC 14.3)
        dcs = _iwht4x4(coeffs[24])
        for sb in range(16):
            coeffs[sb][0] = dcs[sb]
    # --- luma ---
    M = Y  # operate in-place on the padded plane
    py, px = 1 + 16 * mb_y, 1 + 16 * mb_x
    if mb.ymode == B_PRED:
        # fix up the above-right pixels for the MB's top row: beyond
        # the frame's right edge (or beyond the reconstructed above
        # row) VP8 replicates; inside, the pixels are already there.
        for sb in range(16):
            r, c = sb >> 2, sb & 3
            r0, c0 = py + 4 * r, px + 4 * c
            if c == 3:
                # right-edge subblocks read above-right from the MB's
                # above row (the stored top-right), not from pixels to
                # the right of the current subblock row
                ar = Y[py - 1, px + 16 : px + 20].copy()
                save = Y[r0 - 1, c0 + 4 : c0 + 8].copy()
                Y[r0 - 1, c0 + 4 : c0 + 8] = ar
            b = _pred_b(M, r0, c0, mb.bmodes[sb])
            Y[r0 : r0 + 4, c0 : c0 + 4] = b
            _add_residue(Y, r0, c0, coeffs[sb])
            if c == 3:
                Y[r0 - 1, c0 + 4 : c0 + 8] = save
    else:
        sub = Y[py - 1 : py + 16, px - 1 : px + 16]
        _pred16_or_8(sub, 16, mb.ymode, has_above, has_left)
        for sb in range(16):
            r, c = sb >> 2, sb & 3
            _add_residue(Y, py + 4 * r, px + 4 * c, coeffs[sb])
    # --- chroma ---
    puy, pux = 1 + 8 * mb_y, 1 + 8 * mb_x
    for ch, plane in ((0, U), (1, V)):
        sub = plane[puy - 1 : puy + 8, pux - 1 : pux + 8]
        _pred16_or_8(sub, 8, mb.uvmode, has_above, has_left)
        for sb in range(4):
            r, c = sb >> 1, sb & 1
            _add_residue(
                plane, puy + 4 * r, pux + 4 * c, coeffs[16 + 4 * ch + sb]
            )


def decode_vp8_yuv(payload: bytes):
    """Decode a 'VP8 ' chunk payload (keyframe) to exact (Y, U, V)
    uint8 planes per RFC 6386, including the in-loop deblocking
    filter.  Y is (height, width); U/V are the 4:2:0 chroma planes
    ((height+1)//2, (width+1)//2)."""
    h, bd = _parse_frame_header(payload)
    mb_w, mb_h = h.mb_w, h.mb_h
    # padded planes: +1 top/left border, +8 right extension for
    # above-right reads, +1 bottom padding (never read)
    Y = np.empty((16 * mb_h + 2, 16 * mb_w + 9), np.uint8)
    U = np.empty((8 * mb_h + 2, 8 * mb_w + 9), np.uint8)
    V = np.empty_like(U)
    for plane in (Y, U, V):
        plane[0, :] = 127   # above border (incl. corner at mb_y == 0)
        plane[:, 0] = 129   # left border
        plane[0, 0] = 127   # top-left corner of the frame
    # beyond the frame's right edge on the above row the VP8
    # convention is 127 for the top MB row (the border init covers it;
    # rows below replicate, handled after each MB row completes)

    above_bmodes = [[B_DC] * 4 for _ in range(mb_w)]
    above_seg = [0] * mb_w
    above_nz = [[0] * 9 for _ in range(mb_w)]
    mbs: list[list[_MBInfo]] = []
    for mb_y in range(mb_h):
        left_bmodes = [B_DC] * 4
        left_nz = [0] * 9
        tok = h.partitions[mb_y % len(h.partitions)]
        row: list[_MBInfo] = []
        for mb_x in range(mb_w):
            mb, skip = _decode_mb_modes(
                bd, h, mb_x, above_bmodes, left_bmodes, above_seg
            )
            _decode_mb_residuals(tok, h, mb, skip, mb_x, above_nz, left_nz)
            _reconstruct_mb(h, mb, mb_x, mb_y, Y, U, V)
            row.append(mb)
        mbs.append(row)
        # replicate the rightmost reconstructed pixel into the right
        # extension so the NEXT MB row's above-right reads see the
        # VP8 replication convention at the frame's right edge
        r0, r1 = 1 + 16 * mb_y, 1 + 16 * (mb_y + 1)
        Y[r0:r1, 16 * mb_w + 1 :] = Y[r0:r1, 16 * mb_w : 16 * mb_w + 1]

    if h.filter_level > 0:
        _loop_filter_frame(h, mbs, Y, U, V)

    Yp = Y[1 : 1 + 16 * mb_h, 1 : 1 + 16 * mb_w][: h.height, : h.width]
    cw, chh = (h.width + 1) >> 1, (h.height + 1) >> 1
    Up = U[1 : 1 + 8 * mb_h, 1 : 1 + 8 * mb_w][:chh, :cw]
    Vp = V[1 : 1 + 8 * mb_h, 1 : 1 + 8 * mb_w][:chh, :cw]
    return Yp.copy(), Up.copy(), Vp.copy()


# --- in-loop deblocking filter (RFC 6386 section 15) -------------------


def _mb_filter_level(h: "_FrameHeader", mb: "_MBInfo") -> int:
    lvl = h.filter_level
    if h.segmentation:
        lvl = h.seg_lf[mb.segment] if h.seg_abs else lvl + h.seg_lf[mb.segment]
        lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
    if h.lf_delta_enabled:
        lvl += h.ref_lf_deltas[0]  # keyframe MBs reference INTRA_FRAME
        if mb.ymode == B_PRED:
            lvl += h.mode_lf_deltas[0]
        lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
    return lvl


def _filter_limits(h: "_FrameHeader", lvl: int):
    interior = lvl
    if h.sharpness > 0:
        interior >>= 2 if h.sharpness > 4 else 1
        cap = 9 - h.sharpness
        if interior > cap:
            interior = cap
    if interior < 1:
        interior = 1
    hev = 0
    if lvl >= 40:
        hev = 2
    elif lvl >= 15:
        hev = 1
    mb_edge = ((lvl + 2) * 2) + interior
    sub_edge = (lvl * 2) + interior
    return interior, hev, mb_edge, sub_edge


def _c127(v: int) -> int:
    return -128 if v < -128 else 127 if v > 127 else v


def _u(v: int) -> int:
    v += 128
    return 0 if v < 0 else 255 if v > 255 else v


def _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, I, E) -> bool:
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E
        and abs(p3 - p2) <= I and abs(p2 - p1) <= I and abs(p1 - p0) <= I
        and abs(q3 - q2) <= I and abs(q2 - q1) <= I and abs(q1 - q0) <= I
    )


def _hev(p1, p0, q0, q1, T) -> bool:
    return abs(p1 - p0) > T or abs(q1 - q0) > T


def _common_adjust(use_outer: bool, px: list[int]) -> int:
    """RFC 15.2 common_adjust on signed pixel values px = [p1,p0,q0,q1]
    (modified in place); returns the F value."""
    p1, p0, q0, q1 = px
    a = _c127((_c127(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    F = _c127(a + 4) >> 3
    E = _c127(a + 3) >> 3
    px[2] = q0 - F
    px[1] = p0 + E
    return F


def _npc127(v: np.ndarray) -> np.ndarray:
    return np.clip(v, -128, 127)


def _edge_pixels(plane: np.ndarray, ys, xs, horiz: bool, half: int):
    """Vectorized read of the 2*half perpendicular neighbor rows for
    every position along an edge: returns (list of int32 arrays,
    index function for write-back)."""
    ys = np.asarray(tuple(ys), np.intp)
    xs = np.asarray(tuple(xs), np.intp)
    if horiz:
        rows = [plane[ys - half + k, xs].astype(np.int32)
                for k in range(2 * half)]

        def write(k, vals):
            plane[ys - half + k, xs] = vals
    else:
        rows = [plane[ys, xs - half + k].astype(np.int32)
                for k in range(2 * half)]

        def write(k, vals):
            plane[ys, xs - half + k] = vals
    return rows, write


def _filter_edge(plane: np.ndarray, ys, xs, horiz: bool, mb_edge: bool,
                 I: int, E: int, T: int) -> None:
    """Apply the normal loop filter along one edge (RFC 6386 15.2/15.3),
    vectorized across the edge: every position's 8-pixel perpendicular
    neighborhood is independent of its neighbors along the edge, so the
    whole 16-row (or 8-row chroma) edge filters as one numpy pass —
    the per-pixel Python loop this replaces dominated decode time on
    large frames."""
    (p3, p2, p1, p0, q0, q1, q2, q3), write = _edge_pixels(
        plane, ys, xs, horiz, 4
    )
    mask = (
        (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E)
        & (np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I)
        & (np.abs(p1 - p0) <= I) & (np.abs(q3 - q2) <= I)
        & (np.abs(q2 - q1) <= I) & (np.abs(q1 - q0) <= I)
    )
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > T) | (np.abs(q1 - q0) > T)
    sp2, sp1, sp0 = p2 - 128, p1 - 128, p0 - 128
    sq0, sq1, sq2 = q0 - 128, q1 - 128, q2 - 128
    if not mb_edge:
        # subblock filter: common_adjust with outer taps only when hev;
        # the (F+1)>>1 tap spreads to p1/q1 only when NOT hev
        a = _npc127(np.where(hev, _npc127(sp1 - sq1), 0) + 3 * (sq0 - sp0))
        F = _npc127(a + 4) >> 3
        Ea = _npc127(a + 3) >> 3
        nq0, np0 = sq0 - F, sp0 + Ea
        a2 = np.where(hev, 0, (F + 1) >> 1)
        nq1, np1 = sq1 - a2, sp1 + a2
        upd = {3: np0, 4: nq0, 2: np1, 5: nq1}
    else:
        # MB-edge filter: hev positions take the 2-tap common_adjust,
        # non-hev take the 27/18/9 wide taps over p2..q2
        a = _npc127(_npc127(sp1 - sq1) + 3 * (sq0 - sp0))
        F = _npc127(a + 4) >> 3
        Ea = _npc127(a + 3) >> 3
        w = _npc127(_npc127(sp1 - sq1) + 3 * (sq0 - sp0))
        a27 = _npc127((27 * w + 63) >> 7)
        a18 = _npc127((18 * w + 63) >> 7)
        a9 = _npc127((9 * w + 63) >> 7)
        upd = {
            3: np.where(hev, sp0 + Ea, sp0 + a27),
            4: np.where(hev, sq0 - F, sq0 - a27),
            2: np.where(hev, sp1, sp1 + a18),
            5: np.where(hev, sq1, sq1 - a18),
            1: np.where(hev, sp2, sp2 + a9),
            6: np.where(hev, sq2, sq2 - a9),
        }
    orig = {1: p2, 2: p1, 3: p0, 4: q0, 5: q1, 6: q2}
    for k, sval in upd.items():
        uval = np.clip(sval + 128, 0, 255)
        write(k, np.where(mask, uval, orig[k]).astype(plane.dtype))


def _filter_edge_simple(plane: np.ndarray, ys, xs, horiz: bool,
                        E: int) -> None:
    """RFC 15.4 simple filter, vectorized along the edge: common_adjust
    with outer taps, gated only by the edge-difference mask."""
    (p1, p0, q0, q1), write = _edge_pixels(plane, ys, xs, horiz, 2)
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E
    if not mask.any():
        return
    sp1, sp0, sq0, sq1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _npc127(_npc127(sp1 - sq1) + 3 * (sq0 - sp0))
    F = _npc127(a + 4) >> 3
    Ea = _npc127(a + 3) >> 3
    np0 = np.clip(sp0 + Ea + 128, 0, 255)
    nq0 = np.clip(sq0 - F + 128, 0, 255)
    write(1, np.where(mask, np0, p0).astype(plane.dtype))
    write(2, np.where(mask, nq0, q0).astype(plane.dtype))


def _loop_filter_frame(h: "_FrameHeader", mbs, Y, U, V) -> None:
    """Frame-level deblocking (RFC 6386 section 15.1): MBs in raster
    order; per MB, left edge, interior vertical edges, top edge,
    interior horizontal edges — chroma alongside for the normal
    filter."""
    simple = h.filter_type == "simple"
    for mb_y, row in enumerate(mbs):
        for mb_x, mb in enumerate(row):
            lvl = _mb_filter_level(h, mb)
            if lvl == 0:
                continue
            I, T, mbe, sbe = _filter_limits(h, lvl)
            inner = mb.has_coeffs or mb.ymode == B_PRED
            py, px = 1 + 16 * mb_y, 1 + 16 * mb_x
            pu, pux = 1 + 8 * mb_y, 1 + 8 * mb_x
            yrows = range(py, py + 16)
            crows = range(pu, pu + 8)
            if simple:
                if mb_x > 0:
                    _filter_edge_simple(Y, yrows, [px] * 16, False, mbe)
                if inner:
                    for off in (4, 8, 12):
                        _filter_edge_simple(
                            Y, yrows, [px + off] * 16, False, sbe
                        )
                if mb_y > 0:
                    _filter_edge_simple(Y, [py] * 16, range(px, px + 16),
                                        True, mbe)
                if inner:
                    for off in (4, 8, 12):
                        _filter_edge_simple(
                            Y, [py + off] * 16, range(px, px + 16), True, sbe
                        )
                continue
            if mb_x > 0:
                _filter_edge(Y, yrows, [px] * 16, False, True, I, mbe, T)
                for pl in (U, V):
                    _filter_edge(pl, crows, [pux] * 8, False, True, I, mbe, T)
            if inner:
                for off in (4, 8, 12):
                    _filter_edge(Y, yrows, [px + off] * 16, False, False,
                                 I, sbe, T)
                for pl in (U, V):
                    _filter_edge(pl, crows, [pux + 4] * 8, False, False,
                                 I, sbe, T)
            if mb_y > 0:
                _filter_edge(Y, [py] * 16, range(px, px + 16), True, True,
                             I, mbe, T)
                for pl in (U, V):
                    _filter_edge(pl, [pu] * 8, range(pux, pux + 8), True,
                                 True, I, mbe, T)
            if inner:
                for off in (4, 8, 12):
                    _filter_edge(Y, [py + off] * 16, range(px, px + 16),
                                 True, False, I, sbe, T)
                for pl in (U, V):
                    _filter_edge(pl, [pu + 4] * 8, range(pux, pux + 8),
                                 True, False, I, sbe, T)


# --- YUV 4:2:0 → RGB, byte-exact against libwebp ------------------------
#
# libwebp's default output path: the "fancy" 2x chroma upsampler
# (upsampling.c) followed by the Q6 fixed-point YUV→RGB matrix
# (yuv.h).  Both are deterministic integer pipelines, replicated here
# step for step so RGB bytes match libwebp's exactly.


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    yv = y.astype(np.int32)
    uv = u.astype(np.int32)
    vv = v.astype(np.int32)
    mh = lambda a, c: (a * c) >> 8  # noqa: E731 - MultHi, yuv.h
    r = mh(yv, 19077) + mh(vv, 26149) - 14234
    g = mh(yv, 19077) - mh(uv, 6419) - mh(vv, 13320) + 8708
    b = mh(yv, 19077) + mh(uv, 33050) - 17685
    out = np.stack([r, g, b], axis=-1)
    # VP8Clip8: values land in Q6; valid range [0, (256<<6)-1] shifts
    # down, anything outside clamps to 0/255
    return (np.clip(out, 0, (256 << 6) - 1) >> 6).astype(np.uint8)


def _upsample_pair(top_u, cur_u, top_v, cur_v, width: int):
    """One Upsample call (upsampling.c UPSAMPLE_FUNC) for a (top,
    bottom) output-row pair: returns full-width (u, v) rows for both,
    replicating the exact two-step integer rounding."""
    out = np.empty((2, 2, width), np.int32)  # [row(top/bot)][chan][x]
    for chan, (tr, cr) in enumerate(((top_u, cur_u), (top_v, cur_v))):
        t = tr.astype(np.int32)
        c = cr.astype(np.int32)
        tl, l = t[:-1], c[:-1]          # left neighbors for x=1..
        tt, cc = t[1:], c[1:]
        avg = tl + tt + l + cc + 8
        diag12 = (avg + 2 * (tt + l)) >> 3
        diag03 = (avg + 2 * (tl + cc)) >> 3
        top_row = out[0, chan]
        bot_row = out[1, chan]
        top_row[0] = (3 * t[0] + c[0] + 2) >> 2
        bot_row[0] = (3 * c[0] + t[0] + 2) >> 2
        n = len(t) - 1  # number of interior pixel pairs
        top_row[1 : 2 * n : 2] = (diag12 + tl) >> 1
        top_row[2 : 2 * n + 1 : 2] = (diag03 + tt) >> 1
        bot_row[1 : 2 * n : 2] = (diag03 + l) >> 1
        bot_row[2 : 2 * n + 1 : 2] = (diag12 + cc) >> 1
        if width % 2 == 0:
            top_row[width - 1] = (3 * t[-1] + c[-1] + 2) >> 2
            bot_row[width - 1] = (3 * c[-1] + t[-1] + 2) >> 2
    return out


def _fancy_upsample(u: np.ndarray, v: np.ndarray, w: int, hgt: int):
    """Full-frame fancy chroma upsampling (io.c EmitFancyRGB call
    pattern): row 0 and the last row pair with themselves."""
    uf = np.empty((hgt, w), np.int32)
    vf = np.empty((hgt, w), np.int32)

    def emit(rows, j_top, j_cur):
        pair = _upsample_pair(u[j_top], u[j_cur], v[j_top], v[j_cur], w)
        for k, y in enumerate(rows):
            if y is not None:
                uf[y] = pair[k, 0]
                vf[y] = pair[k, 1]

    emit((0, None), 0, 0)
    ch = u.shape[0]
    for j in range(1, ch):
        emit((2 * j - 1, 2 * j), j - 1, j)
    if hgt % 2 == 0:
        emit((None, hgt - 1), ch - 1, ch - 1)
    return uf, vf


def decode_webp_lossy(
    data: bytes, with_alpha: bool = False, prefer_native: bool = True
) -> np.ndarray:
    """Full lossy-WebP decode: (H, W, 3) uint8 RGB (or (H, W, 4) RGBA
    when ``with_alpha``), byte-exact against libwebp's WebPDecodeRGB/
    RGBA for keyframe files.

    Hot path = the system libwebp via ctypes (webp_native.py) with a
    deterministic sampled cross-check against this module's pure-
    Python RFC 6386 reconstruction (the conformance oracle, ~1000×
    slower — measured 11 s/megapixel round 16); the pure path runs
    when the library is absent or rejects the bytes, so corrupt input
    still raises the contract's classified error types.  Chroma
    upsampling + color conversion per libwebp's default (fancy)
    output path in both implementations."""
    if prefer_native:
        from pinot_spark.functions import webp_native

        native = (
            webp_native.decode_rgba(data)
            if with_alpha
            else webp_native.decode_rgb(data)
        )
        if native is not None:
            if webp_native.should_crosscheck():
                pure = _decode_webp_lossy_pure(data, with_alpha)
                if not np.array_equal(pure, native):
                    raise ValueError(
                        "libwebp/pure-Python VP8 decoder disagreement "
                        "(conformance cross-check failed)"
                    )
            return native
    return _decode_webp_lossy_pure(data, with_alpha)


def _decode_webp_lossy_pure(
    data: bytes, with_alpha: bool = False
) -> np.ndarray:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    payload = None
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            payload = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP has no lossy 'VP8 ' chunk")
    Y, U, V = decode_vp8_yuv(payload)
    hgt, w = Y.shape
    uf, vf = _fancy_upsample(U, V, w, hgt)
    rgb = _yuv_to_rgb(Y, uf, vf)
    if not with_alpha:
        return rgb
    from pinot_spark.functions.webpcodec import decode_webp_alpha

    a = decode_webp_alpha(data)
    if a is None:
        a = np.full((hgt, w), 255, np.uint8)
    return np.dstack([rgb, a])
