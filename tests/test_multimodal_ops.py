"""Operator-level multimodal contract tests (r16 ADVICE regressions):
every classification outcome leaves a trace row, and crafted-corrupt
payloads mark the ROW instead of failing the executor task."""

from __future__ import annotations

import struct

import numpy as np

from pinot_spark.functions.wavcodec import encode_wav
from pinot_spark.operators.multimodal import audio_features


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_audio_features_empty_wav_leaves_marker_row(spark):
    """A structurally valid WAV with an empty data chunk emits ONE
    'empty' marker row — the media id must not silently disappear."""
    empty = encode_wav(np.empty((0, 2), np.int16), 8000)
    ok = encode_wav(np.arange(-100, 100, dtype=np.int16), 8000)
    out = audio_features(
        _media_df(spark, [("e", bytearray(empty)), ("k", bytearray(ok))]),
        window_ms=125,
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["e"]) == 1
    m = by_id["e"][0]
    assert (m.channel, m.window_idx, m.decode_ok) == (-1, -1, "empty")
    assert all(r.decode_ok == "ok" for r in by_id["k"])


def test_audio_features_zero_channel_g711_marks_corrupt(spark):
    """Zero-channel G.711 WAV (used to raise ZeroDivisionError inside
    the executor) classifies the row 'corrupt' like other malformed
    WAVs."""
    fmt = struct.pack("<HHIIHH", 7, 0, 8000, 8000, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    )
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    out = audio_features(
        _media_df(spark, [("z", bytearray(bad))])
    ).collect()
    assert len(out) == 1
    assert out[0].decode_ok == "corrupt"
