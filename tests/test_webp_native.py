"""Native libwebp fast path (functions/webp_native.py): dispatch,
fallback, conformance cross-check, and the throughput guard that keeps
the 100 TB-scale decode path from silently regressing to
interpreter-bound speeds."""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pytest

from pinot_spark.functions import webp_native
from pinot_spark.functions.vp8codec import decode_webp_lossy
from pinot_spark.functions.webpcodec import decode_webp, encode_webp

_DATA = os.path.join(os.path.dirname(__file__), "data")

_FIXTURES = sorted(
    f for f in os.listdir(_DATA) if f.endswith(".webp")
)

_HAVE_LIB = webp_native.load_libwebp() is not None
needs_lib = pytest.mark.skipif(not _HAVE_LIB, reason="libwebp not present")


@needs_lib
@pytest.mark.parametrize("name", _FIXTURES)
def test_native_equals_pure_on_every_fixture(name):
    """The dispatch path (native) and the pure-Python conformance
    oracle produce byte-identical RGB for every lossy fixture."""
    data = open(os.path.join(_DATA, name), "rb").read()
    nat = decode_webp_lossy(data)
    pure = decode_webp_lossy(data, prefer_native=False)
    assert nat.shape == pure.shape
    assert np.array_equal(nat, pure), name


@needs_lib
def test_native_rgba_equals_pure():
    data = open(os.path.join(_DATA, "python_lossy.webp"), "rb").read()
    nat = decode_webp_lossy(data, with_alpha=True)
    pure = decode_webp_lossy(data, with_alpha=True, prefer_native=False)
    assert np.array_equal(nat, pure)


@needs_lib
def test_native_decodes_our_lossless_streams():
    """libwebp decoding OUR VP8L encoder's bytes is an external
    conformance check on the encoder, per variant."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
    few = (rng.integers(0, 5, (16, 16, 3)) * 50).astype(np.uint8)
    for data in (
        encode_webp(img),
        encode_webp(img, predictor=7),
        encode_webp(img, subtract_green=True),
        encode_webp(img, color_transform=(5, 6, 7)),
        encode_webp(few, palette=True),
    ):
        nat = webp_native.decode_rgb(data)
        assert nat is not None
        pure = decode_webp(data, prefer_native=False)
        assert np.array_equal(nat, pure)


def test_fallback_when_library_absent(monkeypatch):
    """With the library 'absent' the pure oracle serves the decode —
    identical bytes, classified errors for corrupt input."""
    monkeypatch.setattr(webp_native, "load_libwebp", lambda: None)
    name = "fx_gradient_64x48_q75.webp"
    data = open(os.path.join(_DATA, name), "rb").read()
    out = decode_webp_lossy(data)
    pure = decode_webp_lossy(data, prefer_native=False)
    assert np.array_equal(out, pure)
    with pytest.raises(ValueError):
        decode_webp_lossy(b"RIFF\x00\x00\x00\x00WEBP")


@needs_lib
def test_crosscheck_detects_disagreement(monkeypatch):
    """If native output ever diverged from the RFC 6386 oracle, the
    sampled cross-check raises instead of silently returning wrong
    pixels."""
    name = "fx_gradient_64x48_q75.webp"
    data = open(os.path.join(_DATA, name), "rb").read()
    good = webp_native.decode_rgb(data)
    bad = good.copy()
    bad[0, 0, 0] ^= 0xFF
    monkeypatch.setattr(webp_native, "decode_rgb", lambda d: bad.copy())
    monkeypatch.setattr(webp_native, "should_crosscheck", lambda: True)
    with pytest.raises(ValueError, match="disagreement"):
        decode_webp_lossy(data)
    # and with sampling off, the (stubbed) native result passes through
    monkeypatch.setattr(webp_native, "should_crosscheck", lambda: False)
    assert np.array_equal(decode_webp_lossy(data), bad)


def test_crosscheck_sampling_is_deterministic():
    import importlib

    importlib.reload(webp_native)
    hits = [webp_native.should_crosscheck() for _ in range(130)]
    assert hits[0] is True
    assert sum(hits) == 3  # calls 0, 64, 128
    importlib.reload(webp_native)


@needs_lib
def test_throughput_guard_realistic_frame(monkeypatch):
    """Per-decode wall-time bound at a realistic 640×360 frame so
    future codec work can't silently regress the hot path (round-16
    measured: pure Python ≈ 2.6 s/frame, native ≈ ms).  Bounds are
    generous for loaded CI machines but still catch an
    order-of-magnitude regression."""
    lib = webp_native.load_libwebp()
    import ctypes

    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    rng = np.random.default_rng(17)
    # smooth content (noise encodes slowly and decodes slowly in pure
    # Python far beyond the measured typical frame)
    x = np.linspace(0, 4 * np.pi, 640)
    y = np.linspace(0, 3 * np.pi, 360)
    img = np.stack(
        [
            (127 + 120 * np.outer(np.sin(y + p), np.cos(x))).astype(np.uint8)
            for p in (0.0, 1.0, 2.0)
        ],
        axis=2,
    )
    img = np.ascontiguousarray(img + rng.integers(0, 3, img.shape).astype(np.uint8))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        img.tobytes(), 640, 360, 640 * 3, ctypes.c_float(75.0),
        ctypes.byref(out),
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))

    # time the hot path alone — the sampled oracle cross-check (1 in
    # 64 decodes) is timed separately as the pure bound below
    monkeypatch.setattr(webp_native, "should_crosscheck", lambda: False)
    t0 = time.monotonic()
    nat = decode_webp_lossy(data)
    t_native = time.monotonic() - t0
    assert nat.shape == (360, 640, 3)
    assert t_native < 1.5, f"native path took {t_native:.2f}s"

    t0 = time.monotonic()
    pure = decode_webp_lossy(data, prefer_native=False)
    t_pure = time.monotonic() - t0
    assert np.array_equal(nat, pure)
    assert t_pure < 30.0, f"pure oracle took {t_pure:.2f}s"
