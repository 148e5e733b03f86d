"""Pure-stdlib WAV (RIFF/WAVE) PCM codec — the audio half of the
multimodal column mandate, real instead of stubbed.

Scope: integer PCM, the format every large crawled-audio corpus
normalizes to before feature extraction — 8-bit unsigned and 16-bit
signed little-endian, any channel count and sample rate.  Compressed
or float formats (IEEE float, A-law/mu-law, ADPCM, WAVE_FORMAT_
EXTENSIBLE) raise NotImplementedError NAMING the format tag, the same
loud-boundary convention as the image codecs.

Cross-validated against CPython's stdlib ``wave`` module in both
directions (tests/test_wavcodec.py): our writer's bytes parse back
through ``wave`` with identical params and frames, and ``wave``-written
files decode here sample-exact.

Reference parity: the reference engine has no media codecs (round-15
adjudication); this backs operators/multimodal.audio_features.
"""

from __future__ import annotations

import struct

import numpy as np


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """ITU-T G.711 expansion tables (the published CCITT reference
    algorithm, the same math as CPython's audioop — cross-validated
    byte-for-byte in tests/test_wavcodec.py): 256-entry uint8 →
    int16 lookup for mu-law and A-law."""
    ulaw = np.empty(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        ulaw[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    alaw = np.empty(256, np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        alaw[b] = t if (a & 0x80) else -t
    return alaw, ulaw


_ALAW_TABLE, _ULAW_TABLE = _g711_tables()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) or (n_frames,) int16 array → WAV bytes
    (PCM16 LE, interleaved)."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {arr.ndim}-D")
    n_frames, n_ch = arr.shape
    data = arr.astype("<i2").tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, n_channels) int16 array, sample_rate).
    8-bit unsigned PCM is widened to int16 by centering (s - 128) << 8,
    the lossless embedding into the 16-bit domain."""
    try:
        return _decode_wav_body(data)
    except struct.error as e:  # truncated chunk bytes
        raise ValueError(f"truncated WAV: {e}") from e


def _decode_wav_body(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            frames = payload
        pos += 8 + size + (size & 1)
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    format_tag, n_ch, rate, _byte_rate, _block, bits = fmt
    if n_ch < 1:  # before any branch divides by n_ch (r16 ADVICE)
        raise ValueError("WAV with zero channels")
    if format_tag in (6, 7):  # G.711 A-law / mu-law telephony audio
        if bits != 8:
            raise ValueError(f"G.711 WAV with {bits}-bit samples")
        table = _ALAW_TABLE if format_tag == 6 else _ULAW_TABLE
        arr = table[
            np.frombuffer(
                frames[: (len(frames) // n_ch) * n_ch], np.uint8
            )
        ].reshape(-1, n_ch)
        return arr, rate
    if format_tag != 1:
        names = {3: "IEEE_FLOAT", 2: "ADPCM", 0xFFFE: "EXTENSIBLE"}
        raise NotImplementedError(
            f"WAV format tag {format_tag} "
            f"({names.get(format_tag, 'unknown')}) not supported; "
            "integer PCM and G.711 only"
        )
    if bits == 16:
        arr = np.frombuffer(
            frames[: (len(frames) // (2 * n_ch)) * 2 * n_ch], "<i2"
        ).reshape(-1, n_ch)
        return arr.astype(np.int16), rate
    if bits == 8:
        arr = np.frombuffer(
            frames[: (len(frames) // n_ch) * n_ch], np.uint8
        ).reshape(-1, n_ch)
        return (
            (arr.astype(np.int16) - 128) << 8
        ).astype(np.int16), rate
    raise NotImplementedError(f"{bits}-bit PCM not supported (8/16 only)")
