"""Pure-stdlib image codec tests (functions/imagecodec.py): PNG/BMP/PPM
decode correctness via encode→decode roundtrips and hand-built streams,
plus the integer-luma feature contract that makes the multimodal decode
path oracle-checkable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pinot_spark.functions import imagecodec as ic


def _img(h=8, w=6, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip():
    arr = _img()
    assert np.array_equal(ic.decode_png(ic.encode_png(arr)), arr)
    assert ic.sniff(ic.encode_png(arr)) == "png"


def _png_with_filter(arr: np.ndarray, filt: int) -> bytes:
    """Hand-build a PNG whose every scanline uses the given filter type,
    computing the filtered residuals per the spec — exercises the
    decoder's Sub/Up/Average/Paeth reconstruction."""
    h, w, _ = arr.shape
    stride = w * 3
    prev = np.zeros(stride, dtype=np.int32)
    raw = b""
    for y in range(h):
        cur = arr[y].reshape(stride).astype(np.int32)
        res = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = cur[i - 3] if i >= 3 else 0
            ul = prev[i - 3] if i >= 3 else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = left
            elif filt == 2:
                pred = prev[i]
            elif filt == 3:
                pred = (left + prev[i]) >> 1
            else:
                pred = ic._paeth(int(left), int(prev[i]), int(ul))
            res[i] = (cur[i] - pred) & 0xFF
        raw += bytes([filt]) + res.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters(filt):
    arr = _img(5, 4, seed=filt + 1)
    assert np.array_equal(ic.decode_png(_png_with_filter(arr, filt)), arr)


def test_png_gray_and_rgba():
    gray = np.random.default_rng(1).integers(0, 256, (4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(4))

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)

    rgba = np.random.default_rng(2).integers(0, 256, (3, 5, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(ic.decode_png(png), rgba[:, :, :3])


def _bmp24(arr: np.ndarray, top_down=False) -> bytes:
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    pix = b""
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = arr[y][:, [2, 1, 0]].tobytes()  # RGB → BGR
        pix += row + b"\x00" * (row_bytes - len(row))
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return file_hdr + info + pix


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    arr = _img(5, 3, seed=9)
    data = _bmp24(arr, top_down=top_down)
    assert ic.sniff(data) == "bmp"
    assert np.array_equal(ic.decode_bmp(data), arr)


def test_ppm_roundtrip_and_comments():
    arr = _img(4, 7, seed=3)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(arr)), arr)
    with_comment = b"P6\n# a comment\n7 4\n255\n" + arr.tobytes()
    assert np.array_equal(ic.decode_ppm(with_comment), arr)


def _lossy_webp() -> bytes:
    """A real libwebp-encoded lossy WebP (round 16: the lossy codec is
    implemented, so the dispatch path must DECODE it, not gap it)."""
    import os

    p = os.path.join(os.path.dirname(__file__), "data",
                     "fx_odd_33x21_q60.webp")
    return open(p, "rb").read()


def test_unsupported_formats_raise_with_name():
    # lossless VP8L decodes since round 9, lossy 'VP8 ' since round 16;
    # a CORRUPT lossy chunk (bad keyframe start code) raises ValueError
    import struct

    corrupt = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        ic.decode(corrupt)
    # and a real lossy file decodes through the dispatcher
    assert ic.decode(_lossy_webp()).shape == (21, 33, 3)
    # a RIFF/WEBP container with no image chunk at all is corrupt
    with pytest.raises(ValueError):
        ic.decode(b"RIFF\x00\x00\x00\x00WEBPrest")


def test_gif_tiff_roundtrip_through_dispatch():
    """GIF and TIFF are full codecs since round 8 — lossless, so the
    dispatch roundtrip must be exact."""
    from pinot_spark.functions.gifcodec import encode_gif
    from pinot_spark.functions.tiffcodec import encode_tiff

    img = (_img(13, 21, seed=4) // 64) * 64  # ≤64 colors for the GIF palette
    for blob, fmt in (
        (encode_gif(img, interlace=True), "gif"),
        (encode_tiff(img, packbits=True), "tiff"),
    ):
        assert ic.sniff(blob) == fmt
        assert np.array_equal(ic.decode(blob), img)


def test_resize_nearest():
    arr = _img(8, 8)
    up = ic.resize_nearest(arr, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], arr)  # exact 2x nearest mapping
    down = ic.resize_nearest(arr, 4, 4)
    assert np.array_equal(down, arr[::2, ::2])


def test_luma_features_integer_valued():
    arr = _img(16, 16)
    feats = ic.luma_thumbnail_features(arr, grid=4)
    assert feats.shape == (16,) and feats.dtype == np.float32
    assert np.array_equal(feats, np.floor(feats))  # integers, float32-exact
    # 4x4 source: each feature is exactly one pixel's integer luma
    small = _img(4, 4, seed=5)
    f = ic.luma_thumbnail_features(small, grid=4)
    expect = (
        77 * small[:, :, 0].astype(int)
        + 150 * small[:, :, 1].astype(int)
        + 29 * small[:, :, 2].astype(int)
    ) >> 8
    assert np.array_equal(f.reshape(4, 4), expect.astype(np.float32))


def test_extract_features_real_decode(spark):
    """End-to-end: genuine PPM/PNG/JPEG payloads through the Arrow
    mapInPandas path decode for real — including a real lossy WebP —
    and truncated JPEG bytes report corruption."""
    from pinot_spark.functions.jpegcodec import encode_jpeg
    from pinot_spark.operators.multimodal import extract_features

    arr = _img(4, 4, seed=11)
    rows = [
        ("m1", bytearray(ic.encode_ppm(arr)), "image/x-portable-pixmap", 4, 4, None),
        ("m2", bytearray(ic.encode_png(arr)), "image/png", 4, 4, None),
        ("m3", bytearray(_lossy_webp()), "image/webp", None, None, None),
        ("m4", bytearray(encode_jpeg(arr, 95)), "image/jpeg", 4, 4, None),
        ("m5", bytearray(b"\xff\xd8\xff\xe0trunc"), "image/jpeg", None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, payload binary, mime string, width int, height int, duration_ms int",
    )
    out = {r.media_id: r for r in extract_features(df).collect()}
    expect = (
        77 * arr[:, :, 0].astype(int)
        + 150 * arr[:, :, 1].astype(int)
        + 29 * arr[:, :, 2].astype(int)
    ) >> 8
    assert out["m1"].decode_ok == "ok" and out["m2"].decode_ok == "ok"
    assert out["m1"].features == [float(x) for x in expect.flatten()]
    assert out["m1"].features == out["m2"].features  # same pixels, two containers
    assert out["m3"].decode_ok == "ok"  # lossy WebP decodes (round 16)
    # real JPEG decode: lossy, so features land near (not exactly on) the
    # lossless containers' values
    assert out["m4"].decode_ok == "ok"
    jerr = max(abs(a - b) for a, b in zip(out["m4"].features, out["m1"].features))
    assert jerr <= 16.0
    assert out["m5"].decode_ok == "corrupt"


def test_resize_images_real_roundtrip(spark):
    from pinot_spark.operators.multimodal import resize_images

    arr = _img(8, 8, seed=13)
    df = spark.createDataFrame(
        [("m1", bytearray(ic.encode_png(arr)), "image/png", 8, 8, None)],
        "media_id string, payload binary, mime string, width int, height int, duration_ms int",
    )
    row = resize_images(df, 4, 4).collect()[0]
    assert row.resize_ok == "ok"
    back = ic.decode_png(bytes(row.payload))
    assert np.array_equal(back, arr[::2, ::2])


def test_dispatch_corrupt_input_exception_contract():
    """Round 16 fuzz finding: corrupt PNGs surfaced zlib.error, corrupt
    JPEGs struct.error/KeyError/StopIteration, and corrupt TIFFs could
    allocation-bomb via 4-billion IFD counts or bogus dimensions.  The
    decode boundary must classify ALL malformed payloads as ValueError/
    IndexError (or NotImplementedError for named format gaps) and stay
    fast — crawled-media pipelines mark rows corrupt, they don't fail
    executor tasks."""
    import random
    import time

    from pinot_spark.functions.gifcodec import encode_gif
    from pinot_spark.functions.jpegcodec import encode_jpeg
    from pinot_spark.functions.tiffcodec import encode_tiff
    from pinot_spark.functions.webpcodec import encode_webp

    rng_np = np.random.default_rng(3)
    img = rng_np.integers(0, 256, (12, 14, 3)).astype(np.uint8)
    pal = (rng_np.integers(0, 4, (12, 14, 3)) * 60).astype(np.uint8)
    payloads = {
        "png": ic.encode_png(img),
        "ppm": ic.encode_ppm(img),
        "jpeg": encode_jpeg(img, 90),
        "tiff": encode_tiff(img, packbits=True),
        "webp": encode_webp(pal),
        "gif": encode_gif(pal),
    }
    rng = random.Random(11)
    for name, base in payloads.items():
        for _ in range(60):
            b = bytearray(base)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(2, len(b))] = rng.randrange(256)
            t0 = time.time()
            try:
                ic.decode(bytes(b))
            except (ValueError, IndexError, NotImplementedError):
                pass
            assert time.time() - t0 < 5.0, (name, "slow decode path")
        for cut in range(0, len(base), max(1, len(base) // 20)):
            try:
                ic.decode(base[:cut])
            except (ValueError, IndexError, NotImplementedError):
                pass


def test_png_paletted_decode():
    """Color-type-3 (paletted) PNG — ubiquitous in crawled web imagery
    — decodes through PLTE mapping; out-of-range indices clamp instead
    of crashing, and a missing PLTE raises ValueError."""
    import struct
    import zlib

    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    def build(with_plte=True, indices=None):
        body = chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        )
        if with_plte:
            body += chunk(b"PLTE", pal.tobytes())
        use = indices if indices is not None else raw
        return (
            b"\x89PNG\r\n\x1a\n" + body
            + chunk(b"IDAT", zlib.compress(use)) + chunk(b"IEND", b"")
        )

    assert np.array_equal(ic.decode(build()), pal[idx])
    # index beyond the palette clamps to the last entry
    oob = b"".join(
        b"\x00" + bytes([200] * w) for _ in range(h)
    )
    got = ic.decode(build(indices=oob))
    assert (got == pal[-1]).all()
    with pytest.raises(ValueError, match="PLTE"):
        ic.decode(build(with_plte=False))
