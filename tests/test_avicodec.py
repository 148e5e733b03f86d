"""MJPEG-in-AVI container codec: structural hand-parse of the writer's
bytes, decode roundtrips, operator dispatch, and the corrupt-input
exception contract (no system AVI library exists in this image, so the
reader is validated against an independent in-test RIFF walk + the
JPEG payload decoder's own fixed-vector conformance suite)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pinot_spark.functions.avicodec import decode_avi_frames, encode_avi_mjpeg


def _frames(n=5, h=24, w=32):
    # grays ≥68 roundtrip exactly through baseline JPEG q100 (the
    # float-DCT -1 drift below 68 is asserted separately)
    return [np.full((h, w, 3), 68 + 17 * f, np.uint8) for f in range(n)]


def test_avi_structural_hand_parse():
    """Independent RIFF walk over the writer's bytes: chunk layout,
    list kinds, idx1 offsets/sizes pointing at real 00dc chunks, even
    padding — pinned without using the reader under test."""
    frames = _frames(3)
    data = encode_avi_mjpeg(frames, fps_num=25, quality=100)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert 8 + riff_size == len(data)

    kinds, chunks = [], []
    def walk(pos, end, depth=0):
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            assert pos + 8 + size <= end
            if tag == b"LIST":
                kinds.append(data[pos + 8 : pos + 12])
                walk(pos + 12, pos + 8 + size, depth + 1)
            else:
                chunks.append((tag, pos + 8, size))
            pos += 8 + size + (size & 1)
            assert pos % 2 == 0  # even alignment maintained
    walk(12, len(data))
    assert kinds == [b"hdrl", b"strl", b"movi"]
    tags = [t for t, _, _ in chunks]
    assert tags == [b"avih", b"strh", b"strf", b"00dc", b"00dc",
                    b"00dc", b"idx1"]
    # every 00dc payload is a complete JPEG (SOI..EOI)
    dc = [(o, s) for t, o, s in chunks if t == b"00dc"]
    for off, size in dc:
        assert data[off : off + 2] == b"\xff\xd8"
        assert data[off + size - 2 : off + size] == b"\xff\xd9"
    # idx1 entries reference the movi-relative offsets of those chunks
    idx_off, idx_size = next((o, s) for t, o, s in chunks if t == b"idx1")
    movi_fourcc = data.find(b"movi")
    for i in range(3):
        e = data[idx_off + 16 * i : idx_off + 16 * (i + 1)]
        ctag, flags, off, size = struct.unpack("<4sIII", e)
        assert ctag == b"00dc" and flags == 0x10
        assert data[movi_fourcc + off : movi_fourcc + off + 4] == b"00dc"
        (csize,) = struct.unpack(
            "<I", data[movi_fourcc + off + 4 : movi_fourcc + off + 8]
        )
        assert csize == size == dc[i][1]
    # strh carries the fps as dwScale/dwRate
    strh_off = next(o for t, o, s in chunks if t == b"strh")
    assert data[strh_off : strh_off + 8] == b"vidsMJPG"
    scale, rate = struct.unpack("<II", data[strh_off + 20 : strh_off + 28])
    assert (scale, rate) == (1, 25)


def test_avi_roundtrip_exact_gray():
    frames = _frames(6)
    back = decode_avi_frames(encode_avi_mjpeg(frames, fps_num=10, quality=100))
    assert len(back) == 6
    for f, (d, c) in zip(frames, back):
        assert d == 100
        assert np.array_equal(c, f)


def test_avi_roundtrip_photometric_tolerance():
    """Arbitrary content: MJPEG is lossy — bound the per-pixel error
    at high quality instead of requiring equality."""
    rng = np.random.default_rng(11)
    base = rng.integers(60, 196, (16, 16, 3)).astype(np.uint8)
    smooth = np.repeat(np.repeat(base[::4, ::4], 4, 0), 4, 1)
    back = decode_avi_frames(encode_avi_mjpeg([smooth], quality=95))
    err = np.abs(back[0][1].astype(int) - smooth.astype(int))
    assert err.max() <= 24 and err.mean() < 4


def test_avi_fps_to_duration():
    frames = _frames(2)
    assert decode_avi_frames(encode_avi_mjpeg(frames, fps_num=30))[0][0] == 33
    assert decode_avi_frames(
        encode_avi_mjpeg(frames, fps_num=30000, fps_den=1001)
    )[0][0] == 33
    assert decode_avi_frames(encode_avi_mjpeg(frames, fps_num=5))[0][0] == 200


def test_avi_unsupported_codec_raises_by_name():
    data = bytearray(encode_avi_mjpeg(_frames(1)))
    i = data.find(b"vidsMJPG")
    data[i + 4 : i + 8] = b"cvid"
    with pytest.raises(NotImplementedError, match="cvid"):
        decode_avi_frames(bytes(data))


def test_avi_errors_raise_loudly():
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # movi frames but no strh
    with pytest.raises(ValueError):
        good = encode_avi_mjpeg(_frames(1))
        i = good.find(b"strh")
        decode_avi_frames(good[:i] + b"strX" + good[i + 4 :])


def test_avi_corrupt_input_exception_contract():
    """Byte-flipped/truncated AVIs decode or raise only ValueError/
    IndexError/NotImplementedError — the operator-classified types."""
    import random

    base = encode_avi_mjpeg(_frames(3), quality=100)
    rng = random.Random(13)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(12, len(b))] = rng.randrange(256)
        try:
            decode_avi_frames(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 97):
        try:
            decode_avi_frames(base[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass


def test_video_operator_dispatches_avi_and_gif():
    from pinot_spark.functions.gifcodec import encode_gif_animation
    from pinot_spark.operators.multimodal import decode_video_frames

    gif = encode_gif_animation(
        [np.full((8, 8, 3), 30 * f, np.uint8) for f in range(3)], [20] * 3
    )
    avi = encode_avi_mjpeg(_frames(3), fps_num=10, quality=100)
    assert len(decode_video_frames(gif)) == 3
    assert len(decode_video_frames(avi)) == 3
    with pytest.raises(NotImplementedError, match="MP4"):
        decode_video_frames(b"\x00\x00\x00\x18ftypisom" + bytes(32))
    with pytest.raises(ValueError):
        decode_video_frames(b"not a video at all")


# ---------------------------------------------------------------------------
# A/V mux: audio track ('auds' PCM16 stream, 01wb chunks)
# ---------------------------------------------------------------------------


def test_avi_audio_track_roundtrip():
    """PCM16 audio muxed per-frame into the AVI demuxes back
    sample-exact through the shared WAVEFORMATEX dispatch."""
    from pinot_spark.functions.avicodec import decode_avi_audio

    rng = np.random.default_rng(21)
    aud = rng.integers(-32768, 32768, (4410, 2), dtype=np.int64).astype(
        np.int16
    )
    data = encode_avi_mjpeg(
        _frames(5), fps_num=10, quality=100, audio=aud, audio_rate=44100
    )
    out, rate = decode_avi_audio(data)
    assert rate == 44100
    assert np.array_equal(out, aud)
    # the video stream still decodes unchanged
    back = decode_avi_frames(data)
    assert len(back) == 5 and np.array_equal(back[0][1], _frames(5)[0])


def test_avi_audio_structural_interleave():
    """01wb chunks interleave per video frame and appear in idx1."""
    aud = np.arange(1000, dtype=np.int16)
    data = encode_avi_mjpeg(
        _frames(4), fps_num=10, quality=100, audio=aud, audio_rate=8000
    )
    # count interleaved chunk tags in movi order
    order = []
    pos = 0
    while True:
        i1 = data.find(b"00dc", pos)
        i2 = data.find(b"01wb", pos)
        nxt = min(x for x in (i1, i2) if x != -1) if (i1 != -1 or i2 != -1) else -1
        if nxt == -1 or data[nxt - 8 : nxt - 4] == b"idx1":
            break
        order.append(data[nxt : nxt + 4])
        pos = nxt + 4
    # movi section: alternating dc/wb (idx1 repeats the tags afterwards)
    assert order[:8] == [b"00dc", b"01wb"] * 4


def test_avi_audio_missing_raises():
    from pinot_spark.functions.avicodec import decode_avi_audio

    with pytest.raises(ValueError, match="no audio stream"):
        decode_avi_audio(encode_avi_mjpeg(_frames(2)))


def test_audio_operator_dispatches_avi_track():
    from pinot_spark.operators.multimodal import decode_audio

    aud = (1000 * np.sin(np.arange(4000) / 7)).astype(np.int16)
    data = encode_avi_mjpeg(
        _frames(4), fps_num=10, quality=100, audio=aud, audio_rate=8000
    )
    out, rate = decode_audio(data)
    assert rate == 8000 and out.shape == (4000, 1)
    assert np.array_equal(out[:, 0], aud)
    with pytest.raises(NotImplementedError, match="ISO-BMFF"):
        decode_audio(b"\x00\x00\x00\x18ftypM4A " + bytes(16))


def test_avi_audio_corrupt_input_exception_contract():
    """Byte-flipped/truncated AVIs through the AUDIO demuxer decode or
    raise only the operator-classified types."""
    import random

    from pinot_spark.functions.avicodec import decode_avi_audio

    aud = (900 * np.sin(np.arange(2000) / 11)).astype(np.int16)
    base = encode_avi_mjpeg(
        _frames(3), fps_num=10, quality=100, audio=aud, audio_rate=8000
    )
    rng = random.Random(29)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(12, len(b))] = rng.randrange(256)
        try:
            decode_avi_audio(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 101):
        try:
            decode_avi_audio(base[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass
