"""Native libwebp fast path for WebP decode (ctypes, no pip deps).

Scale rationale: the pure-Python decoders in vp8codec.py/webpcodec.py
are the CONFORMANCE ORACLE — byte-exact against libwebp (RFC 6386 /
RFC 9649) but interpreter-bound (~11 s/megapixel for VP8, measured
round 16).  A 100 TB image scan at that throughput is a compute
catastrophe, so the hot path dispatches to the system ``libwebp``
(present in this container, loaded lazily via ctypes) and falls back
to pure Python when the library is absent or the native call fails.
``webpcodec.decode_webp`` keeps the oracle honest with a deterministic
sampled cross-check (first call + every Nth) asserting native and
pure-Python outputs are byte-identical.

The native buffer is copied into numpy and released with ``WebPFree``
immediately — no malloc'd memory outlives the call (executors decode
millions of images per task at scale; leaking per-decode buffers
would OOM the worker).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB: ctypes.CDLL | None = None
_LIB_TRIED = False


def load_libwebp() -> ctypes.CDLL | None:
    """Locate + configure the system libwebp once; None if absent."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = ctypes.util.find_library("webp")
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        for fn in (lib.WebPDecodeRGB, lib.WebPDecodeRGBA):
            fn.restype = ctypes.POINTER(ctypes.c_uint8)
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        return None
    _LIB = lib
    return _LIB


# Deterministic cross-check sampling: call #0 and every Nth native
# decode re-runs the pure-Python oracle and compares byte-for-byte
# (shared by decode_webp and decode_webp_lossy so a mixed workload
# still samples both).  No randomness — reruns reproduce exactly.
CROSSCHECK_EVERY = 64
_calls = 0


def should_crosscheck() -> bool:
    global _calls
    n = _calls
    _calls = (_calls + 1) % CROSSCHECK_EVERY
    return n == 0


def _decode(data: bytes, channels: int) -> np.ndarray | None:
    lib = load_libwebp()
    if lib is None:
        return None
    data = bytes(data)  # c_char_p requires bytes, payloads may be bytearray
    fn = lib.WebPDecodeRGB if channels == 3 else lib.WebPDecodeRGBA
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    p = fn(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None  # native rejected it; pure path classifies the error
    try:
        arr = np.ctypeslib.as_array(
            p, shape=(h.value, w.value, channels)
        ).copy()
    finally:
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


def decode_rgb(data: bytes) -> np.ndarray | None:
    """WebP (lossy VP8 or lossless VP8L) → (H, W, 3) uint8 RGB via the
    system libwebp; None when the library is absent or rejects the
    bytes (caller falls back to the pure-Python oracle, which raises
    the contract's classified error types)."""
    return _decode(data, 3)


def decode_rgba(data: bytes) -> np.ndarray | None:
    """Same, with the alpha plane: (H, W, 4) uint8 RGBA."""
    return _decode(data, 4)
