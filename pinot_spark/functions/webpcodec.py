"""Pure-stdlib WebP **lossless** (VP8L) codec — RFC 9649 §3-5.

Closes the round-8 "WebP raises by name" boundary for the lossless
half of the format:

- **decode_webp**: full VP8L feature set — LSB-first bitstream, simple
  and normal (code-length-coded) prefix codes, color cache, meta prefix
  groups (entropy image), LZ77 with both the 120-entry 2D distance map
  and plain scan-line distances, and all four transforms (predictor's
  14 modes, color transform, subtract-green, color indexing including
  sub-byte pixel packing). Lossy VP8 ('VP8 ' chunk) RGB decodes
  through vp8codec.py (full RFC 6386 keyframe reconstruction,
  byte-exact against libwebp — the round-15 boundary is closed); the
  literal-coded keyframe header parses here (webp_lossy_info) and the
  ALPH alpha plane — a headerless VP8L stream — decodes EXACTLY
  (decode_webp_alpha). Reference: Pinot has no image codecs at all;
  this backs the LLM-pipeline multimodal operators like the other
  pure-stdlib codecs.
- **encode_webp**: valid VP8L streams using literal coding plus a color
  cache and distance-1 LZ77 runs (scan-line distance codes), complete
  canonical prefix codes transmitted through the normal code-length
  path. decode(encode(img)) == img exactly — the lossless contract the
  tests assert, exercising simple codes, normal codes, the cache and
  the backref copy loop in one roundtrip.

The prefix-code machinery is canonical-Huffman exactly as in DEFLATE
(codes assigned in (length, symbol) order, read MSB-of-code-first from
the LSB-first byte stream).
"""

from __future__ import annotations

import struct

import numpy as np

# RFC 9649 §4.2.1.1 — order in which code-length code lengths are read
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# RFC 9649 §4.2.2 — the 120 closest (dx, dy) neighbors for short
# distance codes; code i (1-based) maps to entry i-1
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (-6, 7), (6, 7), (8, 4), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7),
]


class _BitReader:
    """LSB-first bit reader (RFC 9649 §4: values are packed starting at
    the least significant bit of each byte)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.out + bytearray([self.acc & 0xFF]))
        return bytes(self.out)


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """symbol → code for canonical prefix codes: codes assigned in
    (length, symbol) order, exactly as DEFLATE §3.2.2."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _PrefixDecoder:
    """Bit-by-bit canonical prefix decoder (walks from the code MSB —
    the first bit read)."""

    def __init__(self, lengths: list[int]):
        nz = [ln for ln in lengths if ln]
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits per symbol
            self.single = lengths.index(max(lengths))
            self.table = None
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {
            (lengths[sym], code): sym for sym, code in codes.items()
        }
        self.max_len = max(ln for ln in lengths)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    """One prefix code: simple (1-2 symbols) or normal (code-length
    coded) — RFC 9649 §4.2.1."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            dec = _PrefixDecoder(lengths)
            dec.single = sym0  # zero-bit
            return dec
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixDecoder(lengths)
    # normal: code-length code
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixDecoder(clc_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = [prev_nz] * rep
            i += rep
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixDecoder(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding — RFC 9649 §4.2.2: codes
    0-3 mean 1-4; above that, (2 + code%2) << extra, plus extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_code_of(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value → (code, extra_bits_value, n)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    n = v.bit_length() - 2
    hi = v >> n  # 2 or 3
    return 2 + (hi & 1) + 2 * n, v - (hi << n), n


_ALPHABET_EXTRA = 24  # length codes appended to the green alphabet


def _read_entropy_image(br, w, h, allow_meta):
    """Decode one spatially-coded VP8L image (RFC 9649 §4.3), returning
    an (h, w) uint32 ARGB array. ``allow_meta`` is True only for the
    main image."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _read_entropy_image(br, mw, mh, False)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    groups = []
    green_alpha = 256 + _ALPHABET_EXTRA + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mv = int(meta[y >> meta_bits, x >> meta_bits])
            g = groups[(mv >> 8) & 0xFFFF]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < 256:  # literal
            red = red_c.read(br)
            blue = blue_c.read(br)
            alpha = alpha_c.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = argb
            if cache is not None:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < 256 + _ALPHABET_EXTRA:  # LZ77 backref
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dist_c.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backref out of range")
            for k in range(length):
                argb = int(px[pos - dist + k])
                px[pos + k] = argb
                if cache is not None:
                    cache[
                        (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without color cache")
            px[pos] = cache[s - 256 - _ALPHABET_EXTRA]
            pos += 1
    return px.reshape(h, w)


def _avg2(a, b):
    # RFC 9649 Average2 per channel: (a + b) / 2, packed SWAR form.
    # (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b) — idempotent (_avg2(x, x) == x).
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _ch(v, sh):
    return (v >> sh) & 0xFF


def _clamp_add_sub_full(a, b, c):
    out = 0
    for sh in (24, 16, 8, 0):
        val = _ch(a, sh) + _ch(b, sh) - _ch(c, sh)
        out |= max(0, min(255, val)) << sh
    return out


def _clamp_add_sub_half(a, b):
    # a is already the per-channel Average2(L, T); per spec (libwebp
    # AddSubtractComponentHalf): clamp(ave + (ave - b) / 2) with C
    # truncation-toward-zero division (matters for odd negative deltas).
    out = 0
    for sh in (24, 16, 8, 0):
        ave = _ch(a, sh)
        d = ave - _ch(b, sh)
        half = d // 2 if d >= 0 else -((-d) // 2)
        val = ave + half
        out |= max(0, min(255, val)) << sh
    return out


def _apply_predictor(px: np.ndarray, modes: np.ndarray, bits: int) -> np.ndarray:
    """Inverse predictor transform (RFC 9649 §4.4.1, 14 modes) —
    per-pixel scalar loop over python ints (codec correctness over
    speed; this backs tests and mapInPandas feature extraction)."""
    h, w = px.shape
    out = px.astype(np.uint32).copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # L
            elif x == 0:
                pred = int(out[y - 1, 0])  # T
            else:
                mode = int(modes[y >> bits, x >> bits] >> 8) & 0xFF
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # rightmost column: linear-buffer addressing (pos - w + 1)
                # wraps to the leftmost pixel of the CURRENT row
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    p = (
                        abs(_ch(T, 24) - _ch(TL, 24)) + abs(_ch(T, 16) - _ch(TL, 16))
                        + abs(_ch(T, 8) - _ch(TL, 8)) + abs(_ch(T, 0) - _ch(TL, 0))
                    )
                    q = (
                        abs(_ch(L, 24) - _ch(TL, 24)) + abs(_ch(L, 16) - _ch(TL, 16))
                        + abs(_ch(L, 8) - _ch(TL, 8)) + abs(_ch(L, 0) - _ch(TL, 0))
                    )
                    pred = L if p < q else T
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            # per-channel modular add of residual + prediction
            v = int(px[y, x])
            res = 0
            for sh in (24, 16, 8, 0):
                res |= ((_ch(v, sh) + _ch(pred, sh)) & 0xFF) << sh
            out[y, x] = res
    return out


def _apply_color_transform(px: np.ndarray, cti: np.ndarray, bits: int) -> np.ndarray:
    """Inverse color transform (RFC 9649 §4.4.2)."""
    h, w = px.shape
    out = px.astype(np.uint32).copy()

    def delta(t, c):
        # ColorTransformDelta: both operands SIGNED 8-bit; python's >>
        # on negatives is the arithmetic shift the spec wants
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return ((ts * cs) >> 5) & 0xFF

    for y in range(h):
        for x in range(w):
            ct = int(cti[y >> bits, x >> bits])
            g2r = _ch(ct, 0)
            g2b = _ch(ct, 8)
            r2b = _ch(ct, 16)
            v = int(out[y, x])
            a, r, g, b = _ch(v, 24), _ch(v, 16), _ch(v, 8), _ch(v, 0)
            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def decode_webp(data: bytes, prefer_native: bool = True) -> np.ndarray:
    """WebP bytes → (H, W, 3) uint8 RGB.

    Hot path: the system libwebp via ctypes (functions/webp_native.py)
    — the pure-Python decoders below are byte-exact but interpreter-
    bound (~11 s/megapixel for VP8), which at 100 TB image scale is
    the difference between a scan and a compute catastrophe.  The
    pure-Python RFC 9649/6386 decoders remain the CONFORMANCE ORACLE:
    a deterministic sample of native decodes (first + every 64th) is
    re-decoded in pure Python and compared byte-for-byte; when the
    library is absent or rejects the bytes, the pure path runs and
    raises the contract's classified error types."""
    if prefer_native:
        from pinot_spark.functions import webp_native

        rgb = webp_native.decode_rgb(data)
        if rgb is not None:
            if webp_native.should_crosscheck():
                pure = _decode_webp_pure(data)
                if not np.array_equal(pure, rgb):
                    raise ValueError(
                        "libwebp/pure-Python WebP decoder disagreement "
                        "(conformance cross-check failed)"
                    )
            return rgb
    return _decode_webp_pure(data)


def _decode_webp_pure(data: bytes) -> np.ndarray:
    """Pure-Python decode (the conformance oracle): lossless (VP8L)
    decodes here; the lossy 'VP8 ' codec decodes through vp8codec
    (full RFC 6386 keyframe reconstruction, byte-exact against
    libwebp)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(payload)
        if tag == b"VP8 ":
            from pinot_spark.functions.vp8codec import decode_webp_lossy

            return decode_webp_lossy(data, prefer_native=False)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP has no VP8L chunk")


def _decode_vp8l(payload: bytes) -> np.ndarray:
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    px = _decode_vp8l_body(br, w, h)
    rgb = np.dstack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF]
    ).astype(np.uint8)
    return rgb


def _decode_vp8l_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Transform loop + entropy image + inverse transforms — the VP8L
    image stream AFTER the signature/dimension header.  Shared by the
    main lossless image and the ALPH chunk's headerless alpha stream
    (RFC 9649: the alpha image is a level-0 lossless stream of implicit
    width x height).  Returns the (h, w) uint32 ARGB plane."""
    transforms = []
    palette = None
    packed_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            tw = (packed_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            timg = _read_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, timg))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            pal_size = br.read(8) + 1
            pal_img = _read_entropy_image(br, pal_size, 1, False)
            # palette entries are delta-coded against the previous
            pal = np.zeros(pal_size, dtype=np.uint32)
            prev = 0
            for i in range(pal_size):
                v = int(pal_img[0, i])
                cur = 0
                for sh in (24, 16, 8, 0):
                    cur |= ((_ch(v, sh) + _ch(prev, sh)) & 0xFF) << sh
                pal[i] = cur
                prev = cur
            palette = pal
            if pal_size <= 2:
                pbits = 3
            elif pal_size <= 4:
                pbits = 2
            elif pal_size <= 16:
                pbits = 1
            else:
                pbits = 0
            packed_w = (w + (1 << pbits) - 1) >> pbits if pbits else w
            transforms.append((3, pbits, None))
    px = _read_entropy_image(br, packed_w, h, True)
    # inverse transforms in reverse order of reading
    for ttype, bits, timg in reversed(transforms):
        if ttype == 3:
            pbits = bits
            if pbits:
                ibits = 8 >> pbits  # pbits 3 → 1-bit, 2 → 2, 1 → 4
                unpacked = np.zeros((h, w), dtype=np.uint32)
                mask = (1 << ibits) - 1
                for y in range(h):
                    for x in range(w):
                        packed = int(px[y, x >> pbits])
                        green = (packed >> 8) & 0xFF
                        idx = (green >> ((x & ((1 << pbits) - 1)) * ibits)) & mask
                        unpacked[y, x] = idx
                idxs = unpacked
            else:
                idxs = (px >> 8) & 0xFF
            oob = idxs >= len(palette)
            idxs = np.minimum(idxs, len(palette) - 1)
            px = palette[idxs.astype(np.int64)]
            px[oob] = 0  # spec: out-of-range palette index → transparent
        elif ttype == 2:
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) + g) & 0xFF
            b = ((px & 0xFF) + g) & 0xFF
            px = (px & 0xFF00FF00) | (r << 16) | b
        elif ttype == 1:
            px = _apply_color_transform(px, timg, bits)
        else:
            px = _apply_predictor(px, timg, bits)
    return px


# ---------------------------------------------------------------------------
# Encoder: literal + color-cache + distance-1 runs, no transforms.
# ---------------------------------------------------------------------------


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Transmit a complete code via the normal code-length path with a
    trivial (3-bit literal) code-length code: every code-length symbol
    0..15 gets CLC length 5 except we emit a flat complete CLC. To keep
    the writer simple we use a flat 5-bit CLC over 19 symbols — but a
    complete canonical prefix code over 19 symbols cannot be flat.
    Instead: CLC lengths of {used symbols} built as a flat complete
    code over a power-of-two superset."""
    used = sorted({ln for ln in lengths})
    # build a CLC: assign each used code-length symbol an equal length L
    # with 2^L >= n_used, then pad to completeness with dummy symbols
    n = len(used)
    L = max(1, (n - 1).bit_length())
    # pad with the smallest unused symbols to fill 2^L leaves
    all_syms = used + [s for s in range(19) if s not in used]
    chosen = all_syms[: 1 << L]
    clc_lengths = [0] * 19
    for s in chosen:
        clc_lengths[s] = L
    # num_code_lengths must cover every nonzero position in CLC order
    maxpos = max(_CLC_ORDER.index(s) for s in chosen)
    num_clc = max(4, maxpos + 1)
    bw.write(0, 1)  # normal (not simple) prefix code
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes(clc_lengths)
    for ln in lengths:
        _emit_code(bw, codes[ln], L)


def _emit_code(bw: _BitWriter, code: int, ln: int) -> None:
    """Emit a canonical prefix code MSB-first into the LSB-first
    stream."""
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _flat_complete_lengths(alphabet: int) -> list[int]:
    """Complete canonical code lengths covering ``alphabet`` symbols
    with exact Kraft sum 1: ``2^L - n`` symbols at L-1 bits, the rest
    at L bits (L = ceil(log2 n)); flat L-bit when n is a power of two.
    Kraft: (2*(2^L - n) + (n - (2^L - n))) / 2^L = 1."""
    n = alphabet
    L = (n - 1).bit_length()
    if (1 << L) == n:
        return [L] * n
    n_short = (1 << L) - n
    return [L - 1] * n_short + [L] * (n - n_short)


def _write_spatial_literal(
    bw: _BitWriter, argb: "np.ndarray", cache_bits: int
) -> None:
    """Write one spatially-coded image (flat uint32 ARGB, scan order):
    literal coding + optional color cache + distance-1 runs, complete
    flat canonical prefix codes. Used for the main image AND for
    sub-images (palette); sub-images pass cache_bits=0."""
    use_cache = 1 if cache_bits else 0
    bw.write(use_cache, 1)
    if use_cache:
        bw.write(cache_bits, 4)
    cache_size = (1 << cache_bits) if use_cache else 0
    green_alphabet = 256 + _ALPHABET_EXTRA + cache_size

    tokens = []  # (kind, payload): g=literal argb / c=cache idx / r=run len
    cache = [None] * cache_size
    i, n = 0, len(argb)
    while i < n:
        run = 0
        if i > 0 and argb[i] == argb[i - 1]:
            j = i
            while j < n and argb[j] == argb[i - 1]:
                j += 1
            run = j - i
        if run >= 3:
            tokens.append(("r", min(run, 4096)))
            if use_cache:  # the copied pixels pass through the cache too
                v = int(argb[i - 1])
                cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v
            i += min(run, 4096)
            continue
        v = int(argb[i])
        if use_cache:
            idx = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == v:
                tokens.append(("c", idx))
                i += 1
                continue
            cache[idx] = v
        tokens.append(("g", v))
        i += 1

    green_lengths = _flat_complete_lengths(green_alphabet)
    _write_code_lengths(bw, green_lengths)
    green_codes = _canonical_codes(green_lengths)
    chan_lengths = [8] * 256
    _write_code_lengths(bw, chan_lengths)  # red
    chan_codes = _canonical_codes(chan_lengths)
    _write_code_lengths(bw, chan_lengths)  # blue
    _write_code_lengths(bw, chan_lengths)  # alpha (flat; alpha varies
    # only via transforms here, but a complete code keeps this general)
    dist_lengths = _flat_complete_lengths(40)
    _write_code_lengths(bw, dist_lengths)
    dist_codes = _canonical_codes(dist_lengths)

    for kind, payload in tokens:
        if kind == "g":
            v = payload
            g = (v >> 8) & 0xFF
            _emit_code(bw, green_codes[g], green_lengths[g])
            _emit_code(bw, chan_codes[(v >> 16) & 0xFF], 8)
            _emit_code(bw, chan_codes[v & 0xFF], 8)
            _emit_code(bw, chan_codes[(v >> 24) & 0xFF], 8)
        elif kind == "c":
            s = 256 + _ALPHABET_EXTRA + payload
            _emit_code(bw, green_codes[s], green_lengths[s])
        else:  # run of length payload at distance 1 (scan-line code 121)
            lcode, lextra, lnb = _prefix_code_of(payload)
            s = 256 + lcode
            _emit_code(bw, green_codes[s], green_lengths[s])
            if lnb:
                bw.write(lextra, lnb)
            dcode, dextra, dnb = _prefix_code_of(121)
            _emit_code(bw, dist_codes[dcode], dist_lengths[dcode])
            if dnb:
                bw.write(dextra, dnb)


def _forward_predictor(argb2d: "np.ndarray", mode: int) -> "np.ndarray":
    """Forward (encoder-side) uniform predictor transform: residuals
    against the prediction from ORIGINAL neighbors — exactly what the
    progressive decoder reconstructs, so decode inverts it exactly."""
    h, w = argb2d.shape
    res = np.zeros_like(argb2d)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb2d[0, x - 1])
            elif x == 0:
                pred = int(argb2d[y - 1, 0])
            else:
                L = int(argb2d[y, x - 1])
                T = int(argb2d[y - 1, x])
                TL = int(argb2d[y - 1, x - 1])
                # rightmost column wraps to current row's leftmost (decoded
                # before x == w-1, so the decoder sees the same value)
                TR = int(argb2d[y - 1, x + 1]) if x + 1 < w else int(argb2d[y, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = (
                        abs(_ch(T, 24) - _ch(TL, 24)) + abs(_ch(T, 16) - _ch(TL, 16))
                        + abs(_ch(T, 8) - _ch(TL, 8)) + abs(_ch(T, 0) - _ch(TL, 0))
                    )
                    q = (
                        abs(_ch(L, 24) - _ch(TL, 24)) + abs(_ch(L, 16) - _ch(TL, 16))
                        + abs(_ch(L, 8) - _ch(TL, 8)) + abs(_ch(L, 0) - _ch(TL, 0))
                    )
                    pred = L if p < q else T
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            v = int(argb2d[y, x])
            r = 0
            for sh in (24, 16, 8, 0):
                r |= ((_ch(v, sh) - _ch(pred, sh)) & 0xFF) << sh
            res[y, x] = r
    return res


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return ((ts * cs) >> 5) & 0xFF


def encode_webp(
    arr: "np.ndarray",
    cache_bits: int = 8,
    subtract_green: bool = False,
    predictor: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → lossless WebP (VP8L).

    Literal coding + color cache + distance-1 runs by default; optional
    transforms exercise every decoder inverse path losslessly:

    - ``subtract_green``: green subtracted from red/blue (RFC §4.4.3)
    - ``predictor``: one uniform predictor mode 0-13 (RFC §4.4.1)
    - ``color_transform``: one uniform (g2r, g2b, r2b) byte triple (§4.4.2)
    - ``palette``: color-indexing with delta-coded palette and sub-byte
      index packing for ≤16 colors (§4.4.4); needs ≤256 distinct colors

    Transforms are applied encoder-side in the order written, so the
    decoder's reverse-order inversion reconstructs exactly."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.dstack([arr, arr, arr])
    h, w = arr.shape[:2]
    if not (1 <= h <= 16384 and 1 <= w <= 16384):
        raise ValueError("VP8L dimensions out of range")
    flat = arr.reshape(-1, 3).astype(np.uint32)
    argb = (
        np.uint32(0xFF000000)
        | (flat[:, 0] << np.uint32(16))
        | (flat[:, 1] << np.uint32(8))
        | flat[:, 2]
    )
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    out_w = w  # width of the (possibly packed) coded image

    if palette:
        colors = list(dict.fromkeys(int(v) for v in argb))
        if len(colors) > 256:
            raise ValueError("palette encoding needs <=256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        # delta-coded palette as a 1xN literal image (no cache)
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((_ch(c, sh) - _ch(prev, sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _write_spatial_literal(bw, np.array(deltas, dtype=np.uint32), 0)
        lut = {c: i for i, c in enumerate(colors)}
        idxs = np.array([lut[int(v)] for v in argb], dtype=np.uint32).reshape(h, w)
        n_pal = len(colors)
        pbits = 3 if n_pal <= 2 else 2 if n_pal <= 4 else 1 if n_pal <= 16 else 0
        if pbits:
            ibits = 8 >> pbits
            out_w = (w + (1 << pbits) - 1) >> pbits
            packed = np.zeros((h, out_w), dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    packed[y, x >> pbits] |= idxs[y, x] << (
                        (x & ((1 << pbits) - 1)) * ibits
                    )
            green = packed
        else:
            green = idxs
        argb = (np.uint32(0xFF000000) | (green << np.uint32(8))).reshape(-1)

    if subtract_green and not palette:
        bw.write(1, 1)
        bw.write(2, 2)  # subtract green
        g = (argb >> np.uint32(8)) & np.uint32(0xFF)
        r = (((argb >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        b = ((argb & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        argb = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b

    if color_transform is not None and not palette:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bits = 2  # smallest block size code (blocks of 16)
        bw.write(bits - 2, 3)
        tw = (out_w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        ct = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _write_spatial_literal(
            bw, np.full(tw * th, ct, dtype=np.uint32), 0
        )
        res = argb.copy()
        for i in range(len(res)):
            v = int(res[i])
            a, r, g, b = _ch(v, 24), _ch(v, 16), _ch(v, 8), _ch(v, 0)
            # inverse of decode: r_res = r - d(g2r,g); b_res = b - d(g2b,g) - d(r2b,r)
            r_res = (r - _ct_delta(g2r, g)) & 0xFF
            b_res = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            res[i] = (a << 24) | (r_res << 16) | (g << 8) | b_res
        argb = res

    if predictor is not None and not palette:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode must be 0..13")
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        bits = 2
        bw.write(bits - 2, 3)
        tw = (out_w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        mode_px = 0xFF000000 | (predictor << 8)
        _write_spatial_literal(
            bw, np.full(tw * th, mode_px, dtype=np.uint32), 0
        )
        argb = _forward_predictor(argb.reshape(h, out_w), predictor).reshape(-1)

    bw.write(0, 1)  # end of transforms
    _write_main_image(bw, argb, cache_bits)

    payload = b"\x2f" + bw.bytes()
    chunks = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _write_main_image(bw: _BitWriter, argb: "np.ndarray", cache_bits: int) -> None:
    """Main image = cache header + meta-prefix bit + codes + pixels.
    Reuses _write_spatial_literal by writing its cache header, the meta
    bit, then the body with the header bits stripped."""
    inner = _BitWriter()
    _write_spatial_literal(inner, argb, cache_bits)
    # replay inner verbatim, inserting the meta bit after the cache header
    hdr_bits = 1 + (4 if cache_bits else 0)
    rd = _BitReader(inner.bytes())
    bw.write(rd.read(hdr_bits), hdr_bits)
    bw.write(0, 1)  # no meta prefix codes
    total = len(inner.out) * 8 + inner.nbits
    remaining = total - hdr_bits
    while remaining > 0:
        take = min(16, remaining)
        bw.write(rd.read(take), take)
        remaining -= take


# ---------------------------------------------------------------------------
# Lossy 'VP8 ' surface (RFC 6386): the metadata parse below reads the
# uncompressed frame tag + dimensions and the boolean-coded
# first-partition header through the quantizer block (segmentation,
# loop filter, partition layout, quant indices).  Full keyframe
# reconstruction lives in vp8codec.py (round 16: the probability-table
# boundary closed — byte-exact against libwebp).  The ALPH chunk is a
# different codec entirely — a headerless VP8L lossless stream — and
# decodes EXACTLY through _decode_vp8l_body.
# ---------------------------------------------------------------------------


class _BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder (decode side only)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else 0
        self.range = 255
        self.bit_count = 0

    def bool_(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool_(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool_(128) else v

    def flagged_signed(self, n: int) -> int:
        return self.signed(n) if self.bool_(128) else 0


def webp_lossy_info(data: bytes) -> dict:
    """Parse a lossy WebP's 'VP8 ' keyframe header (RFC 6386 §9):
    dimensions + scaling, the reconstruction filter config, the token
    partition layout, and the six quantizer indices — the metadata a
    multimodal pipeline routes/filters on without pixel decoding.
    Raises by name on interframes (a WebP 'VP8 ' chunk is always a
    keyframe, so this only triggers on corrupt data)."""
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
        raise ValueError("WebP has no 'VP8 ' (lossy) chunk")
    tag0 = payload[0] | payload[1] << 8 | payload[2] << 16
    keyframe = not (tag0 & 1)
    if not keyframe:
        raise NotImplementedError("VP8 interframe header (corrupt WebP?)")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    first_part_len = tag0 >> 5
    wraw = payload[6] | payload[7] << 8
    hraw = payload[8] | payload[9] << 8
    info = {
        "keyframe": True,
        "version": (tag0 >> 1) & 7,
        "show_frame": bool((tag0 >> 4) & 1),
        "width": wraw & 0x3FFF,
        "height": hraw & 0x3FFF,
        "horizontal_scale": wraw >> 14,
        "vertical_scale": hraw >> 14,
    }
    bd = _BoolDecoder(payload[10 : 10 + first_part_len])
    info["color_space"] = bd.literal(1)
    info["clamping_type"] = bd.literal(1)
    seg = bd.literal(1)
    info["segmentation_enabled"] = bool(seg)
    if seg:  # §9.3 — field order matters, values themselves unused here
        update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            bd.literal(1)  # abs vs delta
            info["segment_quant_deltas"] = [bd.flagged_signed(7) for _ in range(4)]
            info["segment_filter_deltas"] = [bd.flagged_signed(6) for _ in range(4)]
        if update_map:
            for _ in range(3):
                if bd.bool_(128):
                    bd.literal(8)
    info["filter_type"] = "simple" if bd.literal(1) else "normal"
    info["filter_level"] = bd.literal(6)
    info["sharpness_level"] = bd.literal(3)
    if bd.literal(1):  # loop-filter adjustments enabled
        if bd.literal(1):  # deltas updated this frame
            info["ref_lf_deltas"] = [bd.flagged_signed(6) for _ in range(4)]
            info["mode_lf_deltas"] = [bd.flagged_signed(6) for _ in range(4)]
    n_parts = 1 << bd.literal(2)
    info["token_partitions"] = n_parts
    info["y_ac_qi"] = bd.literal(7)
    info["y_dc_delta"] = bd.flagged_signed(4)
    info["y2_dc_delta"] = bd.flagged_signed(4)
    info["y2_ac_delta"] = bd.flagged_signed(4)
    info["uv_dc_delta"] = bd.flagged_signed(4)
    info["uv_ac_delta"] = bd.flagged_signed(4)
    info["refresh_entropy_probs"] = bool(bd.literal(1))
    # token-partition byte sizes trail the first partition (§9.5)
    sizes = []
    p = 10 + first_part_len
    for i in range(n_parts - 1):
        sizes.append(
            payload[p] | payload[p + 1] << 8 | payload[p + 2] << 16
        )
        p += 3
    if n_parts >= 1:
        sizes.append(len(payload) - p - sum(sizes))
    info["partition_sizes"] = sizes
    info["first_partition_size"] = first_part_len
    return info


def _alpha_unfilter(a: np.ndarray, method: int) -> np.ndarray:
    """Invert the WebP alpha pre-filter (RFC 9649 Alpha chunk F field):
    1=horizontal, 2=vertical, 3=gradient; deltas add to the predictor
    mod 256, row by row."""
    if method == 0:
        return a
    h, w = a.shape
    if method == 1:
        # horizontal: out[y,x] = (out[y,x-1] + a[y,x]) mod 256 with the
        # first column chaining vertically — i.e. a 2-D prefix sum
        # (cumsum down column 0, then cumsum along each row), mod 256
        # once at the end since mod distributes over addition.  Values
        # are <=255 so int64 cannot overflow below ~3.6e16 pixels.
        b = a.astype(np.int64)
        b[:, 0] = np.cumsum(b[:, 0])
        return (np.cumsum(b, axis=1) & 0xFF).astype(np.uint8)
    if method == 2:
        # vertical is the transpose of horizontal: first row chains
        # left-to-right, then cumsum down each column
        b = a.astype(np.int64)
        b[0, :] = np.cumsum(b[0, :])
        return (np.cumsum(b, axis=0) & 0xFF).astype(np.uint8)
    # gradient: the clamped predictor is order-dependent, not a prefix
    # sum — row-at-a-time with a vectorized first row/column, the
    # per-pixel clamp loop only over the interior
    out = a.astype(np.int32).copy()
    out[0, :] = np.cumsum(out[0, :]) & 0xFF
    out[:, 0] = np.cumsum(out[:, 0]) & 0xFF
    for y in range(1, h):
        row = out[y]
        above = out[y - 1]
        for x in range(1, w):
            g = int(row[x - 1]) + int(above[x]) - int(above[x - 1])
            row[x] = (int(a[y, x]) + min(255, max(0, g))) & 0xFF
    return out.astype(np.uint8)


def decode_webp_alpha(data: bytes) -> np.ndarray | None:
    """Exact alpha plane of an extended (VP8X + ALPH) lossy WebP, or
    None when the file carries no ALPH chunk.  Compression method 1 is
    a HEADERLESS VP8L stream of implicit canvas dimensions — decoded by
    the same engine as lossless images, so the result is bit-exact;
    method 0 is raw bytes.  The pre-filter (horizontal/vertical/
    gradient) inverts after decoding."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    alph = None
    w = h = None
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8X":
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
        elif tag == b"ALPH":
            alph = payload
        elif tag == b"VP8 " and w is None:
            w = (payload[6] | payload[7] << 8) & 0x3FFF
            h = (payload[8] | payload[9] << 8) & 0x3FFF
        pos += 8 + size + (size & 1)
    if alph is None:
        return None
    if w is None:
        raise ValueError("ALPH without canvas dimensions")
    hdr = alph[0]
    compression = hdr & 0x03
    filtering = (hdr >> 2) & 0x03
    if compression == 0:
        a = np.frombuffer(alph[1 : 1 + w * h], dtype=np.uint8).reshape(h, w)
    elif compression == 1:
        br = _BitReader(alph[1:])
        argb = _decode_vp8l_body(br, w, h)
        a = ((argb >> 8) & 0xFF).astype(np.uint8)  # alpha rides green
    else:
        raise ValueError(f"unknown ALPH compression method {compression}")
    return _alpha_unfilter(a, filtering)
