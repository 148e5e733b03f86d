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
    # lossy VP8 chunk → NotImplementedError naming the boundary
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError):
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
