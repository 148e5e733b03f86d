"""WebP lossless (VP8L) codec tests — RFC 9649. The encoder emits the
transform whose inverse each test targets, so every decoder path
(prefix codes simple+normal, color cache, LZ77 runs, all 14 predictor
modes, color transform, subtract-green, palette indexing at every
packing width) is validated by exact roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pinot_spark.functions.webpcodec import decode_webp, encode_webp


def _grad(h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.dstack(
        [xx * 7 % 256, yy * 11 % 256, (xx + yy) * 3 % 256]
    ).astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(h=st.integers(1, 20), w=st.integers(1, 20), seed=st.integers(0, 10**6))
def test_webp_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6),
    cache=st.sampled_from([0, 4, 8, 11]),
)
def test_webp_cache_sizes_property(h, w, seed, cache):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp(img, cache_bits=cache)), img
    )


def test_webp_runs_exercise_lz77():
    """Constant stretches emit distance-1 backrefs (scan-line distance
    code 121) — the copy loop must reproduce them exactly, including a
    run crossing row boundaries."""
    img = np.zeros((16, 40, 3), np.uint8)
    img[:, 20:] = 200
    img[3, 7] = (1, 2, 3)
    assert np.array_equal(decode_webp(encode_webp(img)), img)
    # full-constant image = one long run
    flat = np.full((9, 33, 3), 77, np.uint8)
    assert np.array_equal(decode_webp(encode_webp(flat)), flat)


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_predictor_modes(mode):
    img = _grad(18, 25)
    assert np.array_equal(
        decode_webp(encode_webp(img, predictor=mode)), img
    )


def test_webp_subtract_green_and_color_transform():
    img = _grad(15, 22)
    assert np.array_equal(
        decode_webp(encode_webp(img, subtract_green=True)), img
    )
    for triple in [(0, 0, 0), (13, 250, 7), (255, 1, 128)]:
        assert np.array_equal(
            decode_webp(encode_webp(img, color_transform=triple)), img
        )
    # stacked transforms invert in reverse order
    assert np.array_equal(
        decode_webp(encode_webp(img, subtract_green=True, predictor=7)), img
    )
    assert np.array_equal(
        decode_webp(encode_webp(img, color_transform=(5, 6, 7), predictor=12)),
        img,
    )


@pytest.mark.parametrize("npal", [1, 2, 3, 4, 9, 16, 17, 200, 256])
def test_webp_palette_packing_widths(npal):
    """Color indexing at every index-packing width (1/2/4/8 bits) plus
    the delta-coded palette itself."""
    rng = np.random.default_rng(npal)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    img = pal[rng.integers(0, npal, (11, 23))]
    assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img)


def test_webp_gray_and_container():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (9, 9)).astype(np.uint8)
    data = encode_webp(g)
    assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
    assert np.array_equal(decode_webp(data), np.dstack([g, g, g]))


def test_webp_errors_raise_loudly():
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + b"\x00" * 20)
    # corrupt lossy VP8 chunk (bad keyframe start code) → ValueError;
    # real lossy files now DECODE (tests/test_vp8codec.py)
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        decode_webp(lossy)
    good = encode_webp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:20])  # truncated bitstream


def test_webp_palette_too_many_colors_raises():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (30, 30, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_webp(img, palette=True)


def test_webp_imagecodec_dispatch():
    from pinot_spark.functions import imagecodec as ic

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (10, 14, 3)).astype(np.uint8)
    data = encode_webp(img)
    assert ic.sniff(data) == "webp"
    assert np.array_equal(ic.decode(data), img)


# ---------------------------------------------------------------------------
# Foreign-decode conformance: the encoder and decoder share predictor
# helpers, so a shared formula bug self-validates through roundtrips
# (the round-9 _avg2 bug class). These tests pin the helpers and the
# full inverse-predictor pass against an INDEPENDENT per-channel
# reference written directly from RFC 9649 §4.4.1 / libwebp
# lossless_common.h semantics — different code shape, no shared helpers.


def _chans(v):
    return [(v >> s) & 0xFF for s in (24, 16, 8, 0)]


def _pack(cs):
    return (cs[0] << 24) | (cs[1] << 16) | (cs[2] << 8) | cs[3]


def _ref_avg2(a, b):
    return _pack([(ca + cb) >> 1 for ca, cb in zip(_chans(a), _chans(b))])


def _ref_select(L, T, TL):
    p = sum(abs(ct - ctl) for ct, ctl in zip(_chans(T), _chans(TL)))
    q = sum(abs(cl - ctl) for cl, ctl in zip(_chans(L), _chans(TL)))
    return L if p < q else T


def _ref_casf(L, T, TL):
    return _pack([
        max(0, min(255, cl + ct - ctl))
        for cl, ct, ctl in zip(_chans(L), _chans(T), _chans(TL))
    ])


def _ref_cash(L, T, TL):
    out = []
    for cl, ct, ctl in zip(_chans(L), _chans(T), _chans(TL)):
        ave = (cl + ct) >> 1
        d = ave - ctl
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
        out.append(max(0, min(255, ave + half)))
    return _pack(out)


def _ref_predict(mode, L, T, TL, TR):
    a2 = _ref_avg2
    return [
        lambda: 0xFF000000,
        lambda: L,
        lambda: T,
        lambda: TR,
        lambda: TL,
        lambda: a2(a2(L, TR), T),
        lambda: a2(L, TL),
        lambda: a2(L, T),
        lambda: a2(TL, T),
        lambda: a2(T, TR),
        lambda: a2(a2(L, TL), a2(T, TR)),
        lambda: _ref_select(L, T, TL),
        lambda: _ref_casf(L, T, TL),
        lambda: _ref_cash(L, T, TL),
    ][mode]()


def _ref_inverse_predictor(residuals, mode):
    """Independent uniform inverse-predictor pass. Rightmost-column TR
    uses linear-buffer addressing pos - w + 1 = leftmost pixel of the
    CURRENT row (already decoded)."""
    h, w = residuals.shape
    out = np.zeros((h, w), np.uint32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                pred = _ref_predict(
                    mode,
                    int(out[y, x - 1]),
                    int(out[y - 1, x]),
                    int(out[y - 1, x - 1]),
                    int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0]),
                )
            out[y, x] = _pack([
                (cr + cp) & 0xFF
                for cr, cp in zip(_chans(int(residuals[y, x])), _chans(pred))
            ])
    return out


def test_webp_avg2_matches_spec():
    from pinot_spark.functions.webpcodec import _avg2

    rng = np.random.default_rng(42)
    for a, b in rng.integers(0, 2**32, (500, 2), dtype=np.uint64):
        assert _avg2(int(a), int(b)) == _ref_avg2(int(a), int(b))
    # idempotence — the exact failure of the pre-fix formula
    for v in (0xFF00FF00, 0x01020304, 0xDEADBEEF, 0xFFFFFFFF):
        assert _avg2(v, v) == v


def test_webp_clamp_add_sub_half_trunc_toward_zero():
    from pinot_spark.functions.webpcodec import _avg2, _clamp_add_sub_half

    # ave=10, b=13 → d=-3 → C trunc -1 → 9 (floor shift gave 8)
    L, T, TL = 0x0A0A0A0A, 0x0A0A0A0A, 0x0D0D0D0D
    assert _clamp_add_sub_half(_avg2(L, T), TL) == 0x09090909
    rng = np.random.default_rng(7)
    for L, T, TL in rng.integers(0, 2**32, (500, 3), dtype=np.uint64):
        L, T, TL = int(L), int(T), int(TL)
        assert _clamp_add_sub_half(_avg2(L, T), TL) == _ref_cash(L, T, TL)


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_inverse_predictor_matches_independent_reference(mode):
    """Foreign-stream semantics: feed the SAME residuals to the codec's
    _apply_predictor and the independent reference — they must decode to
    identical pixels (catches TR addressing and helper-formula drift the
    encoder/decoder roundtrip can't see)."""
    from pinot_spark.functions.webpcodec import _apply_predictor

    rng = np.random.default_rng(mode * 31 + 5)
    res = rng.integers(0, 2**32, (13, 17), dtype=np.uint64).astype(np.uint32)
    modes_img = np.full((1, 1), 0xFF000000 | (mode << 8), np.uint32)
    got = _apply_predictor(res, modes_img, bits=10)
    want = _ref_inverse_predictor(res, mode)
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# Lossy 'VP8 ' surface (round 15): header parse + EXACT alpha decode,
# verified against a REAL libwebp-produced file (tests/data/
# python_lossy.webp — the CPython test-suite image python.webp, a
# VP8X+ALPH+VP8 16x16 logo; PSF test data).  Full RGB reconstruction
# stays the loud NotImplementedError boundary.
# ---------------------------------------------------------------------------

import os as _os

_LOSSY = _os.path.join(_os.path.dirname(__file__), "data", "python_lossy.webp")


def test_lossy_header_fields_match_libwebp_encoder():
    """Every literal-coded first-partition field parses to the values
    the libwebp encoder wrote, and the partition byte accounting is
    exact: 10 (uncompressed) + 20 (first partition) + 160 (token
    partition) == the 190-byte 'VP8 ' chunk."""
    from pinot_spark.functions.webpcodec import webp_lossy_info

    info = webp_lossy_info(open(_LOSSY, "rb").read())
    assert (info["width"], info["height"]) == (16, 16)
    assert info["keyframe"] and info["show_frame"] and info["version"] == 0
    assert info["filter_type"] == "normal"
    assert info["filter_level"] == 12 and info["sharpness_level"] == 0
    assert info["y_ac_qi"] == 26
    assert (info["uv_dc_delta"], info["uv_ac_delta"]) == (-2, 6)
    assert info["token_partitions"] == 1
    assert info["first_partition_size"] == 20
    assert info["partition_sizes"] == [160]
    assert not info["segmentation_enabled"]


def test_lossy_alpha_plane_decodes_exactly():
    """The ALPH chunk is a headerless VP8L stream — our lossless engine
    must decode libwebp's real output into the Python-logo silhouette:
    fully transparent corners, opaque snake body, anti-aliased edges."""
    import numpy as np

    from pinot_spark.functions.webpcodec import decode_webp_alpha

    a = decode_webp_alpha(open(_LOSSY, "rb").read())
    assert a.shape == (16, 16) and a.dtype == np.uint8
    # corners transparent, body opaque (ground truth: the logo mask)
    for y, x in ((0, 0), (0, 15), (15, 0), (15, 15)):
        assert a[y, x] == 0
    assert a[5, 5] == 255 and a[9, 9] == 255
    # pin exact cells and a digest as the regression contract
    assert a[0, 4] == 175 and a[4, 0] == 189 and a[11, 1] == 33
    import hashlib

    assert hashlib.sha256(a.tobytes()).hexdigest() == (
        "00d64fd72159f0e240eac94eb2a256366dad5e267b45a1920aa72771a8e6ff8c"
    )
    assert int(a.sum()) == 38971


def test_lossy_rgb_decodes_exactly():
    """Round 16: the lossy boundary is CLOSED — decode_webp routes
    'VP8 ' chunks through the RFC 6386 decoder and the logo's RGB
    matches libwebp's bytes (full RGBA parity incl. the alpha plane is
    pinned in tests/test_vp8codec.py)."""
    import hashlib

    from pinot_spark.functions.webpcodec import decode_webp

    rgb = decode_webp(open(_LOSSY, "rb").read())
    assert rgb.shape == (16, 16, 3)
    # libwebp WebPDecodeRGBA's RGB channels for this file
    expected_corner = (14, 0, 0)
    assert tuple(rgb[0, 0]) == expected_corner
    assert hashlib.sha256(rgb.tobytes()).hexdigest() == (
        "de1a3cfed46fb46b8269ff0ff1cbe28269a634ea53322c197813583d6b677a53"
    )


def test_alpha_unfilter_inverts_forward_filters():
    """Horizontal / vertical / gradient pre-filters: apply the forward
    filter by hand, then _alpha_unfilter must reproduce the original."""
    import numpy as np

    from pinot_spark.functions.webpcodec import _alpha_unfilter

    rng = np.random.default_rng(7)
    orig = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)

    def forward(a, method):
        h, w = a.shape
        out = np.zeros_like(a)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif method == 1:
                    pred = a[y, x - 1] if x > 0 else a[y - 1, x]
                elif method == 2:
                    pred = a[y - 1, x] if y > 0 else a[y, x - 1]
                else:
                    if y == 0:
                        pred = a[y, x - 1]
                    elif x == 0:
                        pred = a[y - 1, x]
                    else:
                        g = int(a[y, x - 1]) + int(a[y - 1, x]) - int(
                            a[y - 1, x - 1]
                        )
                        pred = min(255, max(0, g))
                out[y, x] = (int(a[y, x]) - int(pred)) & 0xFF
        return out

    for m in (1, 2, 3):
        assert (_alpha_unfilter(forward(orig, m), m) == orig).all(), m
    assert (_alpha_unfilter(orig, 0) == orig).all()


def test_alpha_raw_compression_method():
    """ALPH compression method 0 is raw bytes — build a minimal VP8X +
    ALPH + VP8 container around the real file's VP8 chunk."""
    import numpy as np

    from pinot_spark.functions.webpcodec import decode_webp_alpha

    real = open(_LOSSY, "rb").read()
    # lift the real VP8 chunk
    i = 12
    vp8 = None
    while i < len(real) - 8:
        tag = real[i : i + 4]
        sz = int.from_bytes(real[i + 4 : i + 8], "little")
        if tag == b"VP8 ":
            vp8 = real[i : i + 8 + sz + (sz & 1)]
        i += 8 + sz + (sz & 1)
    w = h = 16
    alpha = bytes(range(w * h))[: w * h]
    alph = b"ALPH" + (1 + w * h).to_bytes(4, "little") + b"\x00" + alpha
    if (1 + w * h) & 1:
        alph += b"\x00"
    vp8x_payload = bytes([0x10, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    vp8x = b"VP8X" + len(vp8x_payload).to_bytes(4, "little") + vp8x_payload
    body = b"WEBP" + vp8x + alph + vp8
    data = b"RIFF" + len(body).to_bytes(4, "little") + body
    a = decode_webp_alpha(data)
    assert (a.reshape(-1) == np.frombuffer(alpha, dtype=np.uint8)).all()


def test_lossy_webp_metadata_operator(spark):
    """The pipeline operator: lossy payloads yield routing metadata +
    exact alpha stats; junk yields a loud parse status."""
    from pinot_spark.operators.multimodal import lossy_webp_metadata

    real = open(_LOSSY, "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(real)), (2, bytearray(b"not a webp at all"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in lossy_webp_metadata(df).collect()}
    r1 = got[1]
    assert (r1.width, r1.height, r1.y_ac_qi, r1.filter_level) == (16, 16, 26, 12)
    assert r1.has_alpha and abs(r1.alpha_mean - 38971 / 256) < 1e-9
    assert r1.parse_ok == "ok"
    assert got[2].parse_ok == "corrupt_or_unsupported"
