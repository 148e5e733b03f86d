"""Minimal VP8 keyframe BITSTREAM WRITER — test infrastructure only.

Fabricates small, fully-controlled keyframe streams (RFC 6386) so the
decoder branches the libwebp *encoder* never emits through its simple
API can still be conformance-tested against libwebp's *decoder*:
multiple token partitions, the simple loop filter, coded per-MB skip
flags, loop-filter deltas, and per-segment quantizers.  Fixture
generation (tests/test_vp8codec.py) decodes each fabricated stream
with the system libwebp once and pins the output digest; the repo
decoder must match byte-for-byte forever after.

This is NOT a general encoder: no probability updates, no B_PRED, and
only DC coefficients per block — just enough structure to drive every
header/filter path.
"""

from __future__ import annotations

from pinot_spark.functions.vp8_tables import (
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DEFAULT_COEFF_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
)


class BoolEncoder:
    """RFC 6386 section 8.3 boolean arithmetic encoder."""

    def __init__(self) -> None:
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bool_(self, prob: int, val: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bool_(128, (v >> i) & 1)

    def flagged_signed(self, v: int, n: int) -> None:
        """flag + sign-magnitude, matching _BoolDecoder.flagged_signed."""
        if v == 0:
            self.bool_(128, 0)
            return
        self.bool_(128, 1)
        self.literal(abs(v), n)
        self.bool_(128, 1 if v < 0 else 0)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << c) & 0xFFFFFFFF  # align: c = (c & 7) + 8 * (c >> 3)
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _tree_write(be: BoolEncoder, tree, probs, leaf: int) -> None:
    """Encode the bit path that makes the RFC tree decoder return
    ``leaf``."""
    # find the path by depth-first search
    def path_from(i):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == leaf:
                    return [(i >> 1, b)]
            else:
                rest = path_from(t)
                if rest is not None:
                    return [(i >> 1, b)] + rest
        return None

    for prob_idx, bit in path_from(0):
        be.bool_(probs[prob_idx], bit)


_KF_YMODE_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]  # B_PRED=4, DC/V/H/TM=0..3
_UV_MODE_TREE = [-0, 2, -1, 4, -2, -3]
_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]


class MBSpec:
    """One macroblock: a 16x16 mode (0..3, never B_PRED), a chroma
    mode, optional skip, per-block DC token values, and a segment."""

    def __init__(self, ymode=0, uvmode=0, skip=False, y2_dc=0,
                 y_dc=None, uv_dc=0, segment=0):
        self.ymode = ymode
        self.uvmode = uvmode
        self.skip = skip
        self.y2_dc = y2_dc            # token value for the Y2 DC
        self.y_dc = y_dc or [0] * 16  # per-Y-block coeff at position 1
        self.uv_dc = uv_dc            # token value for every chroma DC
        self.segment = segment


def _encode_coeff_block(be: BoolEncoder, plane: int, ctx: int,
                        first: int, values: list[int]) -> int:
    """Encode a block whose only tokens are ``values`` at consecutive
    positions starting at ``first`` (values in -4..4, 0 allowed
    mid-run), then EOB.  Returns the block nonzero flag."""
    probs = DEFAULT_COEFF_PROBS[plane]
    n = first
    p = probs[COEFF_BANDS[n] if n < 16 else 0][ctx]
    nz = False
    for v in values:
        assert v != 0, "zero runs unused in these fabricated streams"
        be.bool_(p[0], 1)  # not EOB
        be.bool_(p[1], 1)  # nonzero
        a = abs(v)
        if a == 1:
            be.bool_(p[2], 0)
            nxt_ctx = 1
        else:
            be.bool_(p[2], 1)
            be.bool_(p[3], 0)  # value in {2,3,4}
            if a == 2:
                be.bool_(p[4], 0)
            else:
                be.bool_(p[4], 1)
                be.bool_(p[5], 1 if a == 4 else 0)
            nxt_ctx = 2
        be.bool_(128, 1 if v < 0 else 0)  # sign
        nz = True
        n += 1
        if n == 16:
            return 1
        p = probs[COEFF_BANDS[n]][nxt_ctx]
    be.bool_(p[0], 0)  # EOB
    return 1 if nz else 0


def encode_frame(width: int, height: int, mbs: list[list[MBSpec]],
                 *, q_index: int = 40, filter_type: int = 0,
                 filter_level: int = 20, sharpness: int = 0,
                 n_partitions: int = 1, lf_deltas=None,
                 seg_quant=None) -> bytes:
    """Build a complete 'VP8 ' chunk payload.  ``mbs[r][c]`` is the
    MBSpec grid ((height+15)//16 rows).  ``lf_deltas`` = (ref[4],
    mode[4]) enables loop-filter deltas; ``seg_quant`` = 4 per-segment
    quantizer DELTAS enables segmentation with a coded map."""
    mb_h, mb_w = len(mbs), len(mbs[0])
    assert mb_h == (height + 15) >> 4 and mb_w == (width + 15) >> 4

    # ---- first partition ----
    be = BoolEncoder()
    be.literal(0, 1)  # color space
    be.literal(0, 1)  # clamping
    if seg_quant is not None:
        be.literal(1, 1)   # segmentation enabled
        be.literal(1, 1)   # update map
        be.literal(1, 1)   # update feature data
        be.literal(0, 1)   # delta mode (not absolute)
        for d in seg_quant:
            be.flagged_signed(d, 7)
        for _ in range(4):  # segment lf deltas: none
            be.bool_(128, 0)
        for _ in range(3):  # segment tree probs: keep 255 defaults
            be.bool_(128, 0)
    else:
        be.literal(0, 1)
    be.literal(filter_type, 1)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    if lf_deltas is not None:
        be.literal(1, 1)  # lf delta enabled
        be.literal(1, 1)  # update this frame
        ref, mode = lf_deltas
        for d in ref:
            be.flagged_signed(d, 6)
        for d in mode:
            be.flagged_signed(d, 6)
    else:
        be.literal(0, 1)
    assert n_partitions in (1, 2, 4, 8)
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    be.literal(q_index, 7)   # y_ac_qi
    for _ in range(5):       # all quantizer deltas zero
        be.bool_(128, 0)
    be.literal(0, 1)         # refresh entropy probs
    for i in range(4):       # no token prob updates
        for j in range(8):
            for k in range(3):
                for ll in range(11):
                    be.bool_(COEFF_UPDATE_PROBS[i][j][k][ll], 0)
    prob_skip = 128
    be.literal(1, 1)             # mb_no_coeff_skip: coded skip flags
    be.literal(prob_skip, 8)

    # per-MB modes
    for row in mbs:
        for mb in row:
            if seg_quant is not None:
                _tree_write(be, _SEGMENT_TREE, [255, 255, 255], mb.segment)
            be.bool_(prob_skip, 1 if mb.skip else 0)
            _tree_write(be, _KF_YMODE_TREE, KF_YMODE_PROBS, mb.ymode)
            _tree_write(be, _UV_MODE_TREE, KF_UV_MODE_PROBS, mb.uvmode)
    part1 = be.flush()

    # ---- token partitions (MB row r -> partition r % n) ----
    encs = [BoolEncoder() for _ in range(n_partitions)]
    above_nz = [[0] * 9 for _ in range(mb_w)]
    for r, row in enumerate(mbs):
        te = encs[r % n_partitions]
        left_nz = [0] * 9
        for c, mb in enumerate(row):
            if mb.skip:
                left_nz[0:9] = [0] * 9
                above_nz[c][0:9] = [0] * 9
                continue
            # Y2 (plane 1, first 0)
            ctx = left_nz[8] + above_nz[c][8]
            vals = [mb.y2_dc] if mb.y2_dc else []
            f = _encode_coeff_block(te, 1, ctx, 0, vals)
            left_nz[8] = above_nz[c][8] = f
            # Y blocks (plane 0, first 1)
            for sb in range(16):
                rr, cc = sb >> 2, sb & 3
                ctx = left_nz[rr] + above_nz[c][cc]
                v = mb.y_dc[sb]
                f = _encode_coeff_block(te, 0, ctx, 1, [v] if v else [])
                flag = 1 if v else 0
                left_nz[rr] = above_nz[c][cc] = flag
            # chroma (plane 2, first 0)
            for ch in range(2):
                for sb in range(4):
                    rr, cc = sb >> 1, sb & 1
                    slot, aslot = 4 + 2 * ch + rr, 4 + 2 * ch + cc
                    ctx = left_nz[slot] + above_nz[c][aslot]
                    v = mb.uv_dc
                    _encode_coeff_block(te, 2, ctx, 0, [v] if v else [])
                    flag = 1 if v else 0
                    left_nz[slot] = above_nz[c][aslot] = flag
    parts = [e.flush() for e in encs]

    # ---- assemble ----
    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([width & 0xFF, (width >> 8) & 0x3F])
    head += bytes([height & 0xFF, (height >> 8) & 0x3F])
    body = head + part1
    for p in parts[:-1]:
        n = len(p)
        body += bytes([n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF])
    # sizes precede ALL partition data
    payload = body + b"".join(parts)
    return payload


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw 'VP8 ' chunk payload."""
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
