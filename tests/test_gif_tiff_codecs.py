"""functions/gifcodec.py + tiffcodec.py: lossless roundtrips (the
validation both formats admit — unlike JPEG there is no transcoding
tolerance to hide behind), LZW table-reset and interlace paths,
PackBits primitives, byte-order and boundary handling."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinot_spark.functions.gifcodec import _lzw_decode, _lzw_encode, decode_gif, encode_gif
from pinot_spark.functions.tiffcodec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_gif_roundtrip_shapes_and_interlace():
    rng = np.random.default_rng(5)
    cases = [
        np.where(rng.random((20, 30)) > 0.5, 200, 40).astype(np.uint8),
        (rng.integers(0, 16, (33, 17)) * 16).astype(np.uint8),
        np.full((5, 9, 3), 123, np.uint8),
        np.tile(np.arange(256, dtype=np.uint8), (4, 1)),  # full 256-palette
        np.stack([rng.integers(0, 4, (25, 25)) * 60] * 3, axis=-1).astype(np.uint8),
    ]
    for img in cases:
        want = np.dstack([img] * 3) if img.ndim == 2 else img
        for interlace in (False, True):
            assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), want)


def test_gif_lzw_table_reset_path():
    """A large noisy 256-color image drives the LZW dictionary to 4096
    and through CLEAR-code resets on both sides."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (200, 300)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), np.dstack([img] * 3))


def test_gif_lzw_kwkwk_case():
    """The code==next_code (KwKwK) decoder special case: aaa... streams
    hit it immediately."""
    data = bytes([1] * 50 + [2] + [1] * 50)
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_gif_palette_overflow_raises():
    rng = np.random.default_rng(1)
    with pytest.raises(NotImplementedError, match="palette"):
        encode_gif(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))


def test_gif_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(20))


def test_packbits_primitives():
    rng = np.random.default_rng(9)
    for _ in range(30):
        n = int(rng.integers(0, 600))
        data = bytes(rng.choice([0, 0, 0, 7, 255], size=n).astype(np.uint8))
        assert packbits_decode(packbits_encode(data), len(data)) == data
    # long literal (>128) and long run (>128) boundaries
    lit = bytes(range(200)) + bytes(range(200))
    assert packbits_decode(packbits_encode(lit), len(lit)) == lit
    run = bytes([9]) * 400
    enc = packbits_encode(run)
    assert len(enc) < 10
    assert packbits_decode(enc, 400) == run


def test_tiff_roundtrip_strips_and_compression():
    rng = np.random.default_rng(9)
    cases = [
        rng.integers(0, 256, (37, 23, 3)).astype(np.uint8),
        rng.integers(0, 256, (16, 40)).astype(np.uint8),
        np.full((50, 50, 3), 9, np.uint8),
        rng.integers(0, 256, (1, 1, 3)).astype(np.uint8),
    ]
    for img in cases:
        want = np.dstack([img] * 3) if img.ndim == 2 else img
        for packbits in (False, True):
            for rps in (5, 16, 1000):
                got = decode_tiff(encode_tiff(img, packbits=packbits, rows_per_strip=rps))
                assert np.array_equal(got, want)


def test_tiff_big_endian_decode():
    """Hand-build a minimal MM (big-endian) gray TIFF: the decoder must
    honor the declared byte order."""
    w, h = 3, 2
    pixels = bytes(range(6))
    ifd_off = 8
    n = 8
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", n)
    data_off = ifd_off + 2 + 12 * n + 4

    def entry(tag, ftype, count, value):
        if ftype == 3:
            payload = struct.pack(">HH", value, 0)
        else:
            payload = struct.pack(">I", value)
        return struct.pack(">HHI", tag, ftype, count) + payload

    out += entry(256, 3, 1, w)
    out += entry(257, 3, 1, h)
    out += entry(258, 3, 1, 8)
    out += entry(259, 3, 1, 1)
    out += entry(262, 3, 1, 1)  # black-is-zero gray
    out += entry(273, 4, 1, data_off)
    out += entry(277, 3, 1, 1)
    out += entry(279, 4, 1, len(pixels))
    out += struct.pack(">I", 0)
    out += pixels
    got = decode_tiff(bytes(out))
    assert got.shape == (2, 3, 3)
    assert got[:, :, 0].tobytes() == pixels


def test_tiff_white_is_zero_inverts():
    w, h = 2, 1
    pixels = bytes([0, 255])
    base = encode_tiff(np.frombuffer(pixels, np.uint8).reshape(h, w))
    # flip the photometric tag (262) from 1 to 0 in place
    flipped = bytearray(base)
    i = flipped.find(struct.pack("<HHI", 262, 3, 1))
    flipped[i + 8] = 0
    got = decode_tiff(bytes(flipped))
    assert got[0, 0, 0] == 255 and got[0, 1, 0] == 0


def test_tiff_unsupported_raise_loudly():
    img = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(encode_tiff(img))
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8] = 5  # compression 5 = LZW
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x00\x00" + bytes(16))


# ---------------------------------------------------------------------------
# Animated GIF (GIF89a animation model) — round 16: the REAL video
# decode path for the multimodal operators.
# ---------------------------------------------------------------------------


def test_gif_animation_roundtrip_lossless():
    """encode_gif_animation → decode_gif_frames reproduces every frame
    and delay exactly; the still decoder reads frame 0."""
    from pinot_spark.functions.gifcodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = [
        np.full((12, 16, 3), (10 * f + 5, 20 * f + 3, 30 * f + 7), np.uint8)
        for f in range(5)
    ]
    delays = [40 * (f + 1) for f in range(5)]
    data = encode_gif_animation(frames, delays)
    back = decode_gif_frames(data)
    assert len(back) == 5
    for i, (d, c) in enumerate(back):
        assert d == delays[i]
        assert np.array_equal(c, frames[i])
    assert np.array_equal(decode_gif(data), frames[0])


def test_gif_animation_composition_semantics():
    """Hand-built animation pinning the GIF89a composition model:
    transparency leaves canvas pixels untouched; disposal 3 restores
    the PREVIOUS canvas before the next frame draws; disposal 2
    restores background (black) in the frame's region."""
    import struct

    from pinot_spark.functions.gifcodec import (
        _lzw_encode,
        decode_gif_frames,
    )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0) + pal

    def frame(indices, left, top, w, h, delay_cs, disposal, trans=None):
        packed = (disposal << 2) | (1 if trans is not None else 0)
        out.extend(
            b"\x21\xf9\x04" + bytes([packed])
            + struct.pack("<H", delay_cs)
            + bytes([trans if trans is not None else 0]) + b"\x00"
        )
        out.extend(b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0))
        out.append(2)
        lzw = _lzw_encode(bytes(indices), 2)
        out.append(len(lzw))
        out.extend(lzw)
        out.append(0)

    frame([0] * 16, 0, 0, 4, 4, 5, 1)               # full red, keep
    frame([1] * 4, 1, 1, 2, 2, 7, 3)                # green patch, restore-prev
    frame([2, 3, 2, 3], 0, 0, 2, 2, 9, 2, trans=3)  # blue w/ transparency
    frame([1] * 16, 0, 0, 4, 4, 11, 0)              # full green
    out.extend(b"\x3b")

    fr = decode_gif_frames(bytes(out))
    assert [d for d, _ in fr] == [50, 70, 90, 110]
    f0, f1, f2, f3 = (c for _, c in fr)
    assert (f0 == [255, 0, 0]).all()
    assert (f1[1:3, 1:3] == [0, 255, 0]).all()
    assert (f1[0, 0] == [255, 0, 0]).all()
    # disposal 3 restored full red before f2; index 3 is transparent
    assert (f2[0, 0] == [0, 0, 255]).all()
    assert (f2[0, 1] == [255, 0, 0]).all()
    assert (f2[1, 0] == [0, 0, 255]).all()
    assert (f2[1, 1] == [255, 0, 0]).all()
    assert (f3 == [0, 255, 0]).all()


def test_gif_animation_palette_boundary():
    from pinot_spark.functions.gifcodec import encode_gif_animation

    rng = np.random.default_rng(5)
    many = rng.integers(0, 256, (2, 24, 24, 3)).astype(np.uint8)
    with pytest.raises(NotImplementedError, match="palette"):
        encode_gif_animation([many[0], many[1]], [10, 10])


def test_gif_corrupt_input_exception_contract():
    """Byte-flipped/truncated GIFs must decode or raise only
    ValueError/IndexError (the operator layer's 'corrupt' types) —
    struct.error from short descriptor reads normalizes to ValueError."""
    import random

    from pinot_spark.functions.gifcodec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = [np.full((8, 8, 3), (f * 40, 5, 9), np.uint8) for f in range(3)]
    base = encode_gif_animation(frames, [20, 20, 20])
    rng = random.Random(7)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(6, len(b))] = rng.randrange(256)
        try:
            decode_gif_frames(bytes(b))
        except (ValueError, IndexError):
            pass
    for cut in range(0, len(base), 3):
        try:
            decode_gif_frames(base[:cut])
        except (ValueError, IndexError):
            pass


def test_gif_oversized_frame_descriptor_clips_both_paths():
    """A frame whose descriptor extends past the logical screen is
    CLIPPED (what mainstream decoders render) on both the transparent
    and opaque paths — the transparent path used to raise a
    shape-mismatch IndexError (r16 ADVICE)."""
    import struct

    from pinot_spark.functions.gifcodec import (
        _lzw_encode,
        decode_gif_frames,
    )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])

    def build(trans):
        out = bytearray(b"GIF89a")
        # 3x3 logical screen, but the frame claims 4x4 at offset (1,1)
        out += struct.pack("<HHBBB", 3, 3, 0x80 | 0x01, 0, 0) + pal
        packed = 1 if trans is not None else 0
        out.extend(
            b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", 5)
            + bytes([trans if trans is not None else 0]) + b"\x00"
        )
        out.extend(b"\x2c" + struct.pack("<HHHHB", 1, 1, 4, 4, 0))
        out.append(2)
        lzw = _lzw_encode(bytes([1, 3] * 8), 2)  # green/transparent mix
        out.append(len(lzw))
        out.extend(lzw)
        out.append(0)
        out.extend(b"\x3b")
        return bytes(out)

    # opaque path: clipped write
    fr = decode_gif_frames(build(None))
    canvas = fr[0][1]
    assert canvas.shape == (3, 3, 3)
    assert (canvas[1, 1] == [0, 255, 0]).all()
    # transparent path: same clipping, transparent indices keep canvas
    fr_t = decode_gif_frames(build(3))
    canvas_t = fr_t[0][1]
    assert canvas_t.shape == (3, 3, 3)
    assert (canvas_t[1, 1] == [0, 255, 0]).all()   # index 1 drawn
    assert (canvas_t[1, 2] == [0, 0, 0]).all()     # index 3 transparent
