"""Pure-stdlib WAV (RIFF/WAVE) PCM codec — the audio half of the
multimodal column mandate, real instead of stubbed.

Scope: integer PCM (8-bit unsigned; 16/24/32-bit signed LE — 24/32
narrow to the int16 analysis domain by taking the top 16 bits), IEEE
float 32/64 (format tag 3, [-1,1] scaled by 32767 round-half-even),
G.711 mu-law/A-law (format tags 7/6), IMA/DVI ADPCM (format tag 0x11)
and MS-ADPCM (format tag 2) — both ADPCM decoders vectorized across
blocks — plus WAVE_FORMAT_EXTENSIBLE unwrapping (the SubFormat GUID
names the real codec).  Remaining formats (MP3/AC3/WMA-in-WAV) raise
NotImplementedError NAMING the format tag, the same loud-boundary
convention as the image codecs.

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

# IMA/DVI ADPCM tables (the published IMA reference algorithm — the
# same math as CPython's audioop adpcm2lin, cross-validated in
# tests/test_wavcodec.py against its pinned output)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32
)


def _ima_decode_nibbles(
    nibbles: np.ndarray, predictor: np.ndarray, index: np.ndarray
) -> np.ndarray:
    """Vectorized-across-blocks IMA expansion: ``nibbles`` is
    (n_blocks, n_samples) uint8; ``predictor``/``index`` are the
    per-block initial states (mutated in place).  Returns
    (n_blocks, n_samples) int16.  The sample loop is sequential (each
    step's state feeds the next — inherent to ADPCM) but every block
    decodes in lockstep, so throughput scales with block count, not
    interpreter speed per sample."""
    n_blocks, n_samples = nibbles.shape
    out = np.empty((n_blocks, n_samples), np.int16)
    np.clip(index, 0, 88, out=index)
    for i in range(n_samples):
        n = nibbles[:, i].astype(np.int32)
        step = _IMA_STEPS[index]
        diff = step >> 3
        diff += np.where(n & 4, step, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 1, step >> 2, 0)
        predictor += np.where(n & 8, -diff, diff)
        np.clip(predictor, -32768, 32767, out=predictor)
        out[:, i] = predictor
        index += _IMA_INDEX[n]
        np.clip(index, 0, 88, out=index)
    return out


def _decode_ima_adpcm(
    frames: bytes, n_ch: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """IMA-ADPCM WAV data chunk → (n_frames, n_ch) int16.  Block
    layout per the IMA WAV mapping: per channel a 4-byte header
    (int16 initial sample, uint8 step index, reserved), then nibble
    data interleaved in 4-byte groups per channel, LOW nibble first."""
    if block_align < 4 * n_ch or block_align % 4:
        raise ValueError(f"bad IMA-ADPCM block align {block_align}")
    n_blocks = len(frames) // block_align
    if n_blocks == 0:
        return np.empty((0, n_ch), np.int16)
    blk = np.frombuffer(
        frames[: n_blocks * block_align], np.uint8
    ).reshape(n_blocks, block_align)
    hdr = blk[:, : 4 * n_ch].reshape(n_blocks, n_ch, 4)
    predictor = (
        hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)
    )
    predictor = ((predictor + 32768) & 0xFFFF) - 32768  # sign-extend i16
    index = hdr[:, :, 2].astype(np.int32)
    if np.any(index > 88):
        raise ValueError("IMA-ADPCM step index out of range")
    data = blk[:, 4 * n_ch :]
    # channel of data byte j: (j // 4) % n_ch
    ch_of = (np.arange(data.shape[1]) // 4) % n_ch
    spb = 1 + 2 * data.shape[1] // n_ch  # samples per block per channel
    out = np.empty((n_blocks, spb, n_ch), np.int16)
    for c in range(n_ch):
        byts = data[:, ch_of == c]
        nibs = np.empty((n_blocks, byts.shape[1] * 2), np.uint8)
        nibs[:, 0::2] = byts & 0x0F
        nibs[:, 1::2] = byts >> 4
        pred_c = predictor[:, c].copy()
        out[:, 0, c] = pred_c.astype(np.int16)
        out[:, 1:, c] = _ima_decode_nibbles(
            nibs, pred_c, index[:, c].copy()
        )
    samples = out.reshape(n_blocks * spb, n_ch)
    if n_frames is not None and 0 <= n_frames < samples.shape[0]:
        samples = samples[:n_frames]
    return samples


# MS-ADPCM (WAV format tag 2) — the published Microsoft spec tables
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], np.int64
)
_MS_COEFFS = np.array(
    [(256, 0), (512, -256), (0, 0), (192, 64),
     (240, 0), (460, -208), (392, -232)], np.int64
)


def _decode_ms_adpcm(
    frames: bytes, n_ch: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """MS-ADPCM data chunk → (n_frames, n_ch) int16, vectorized across
    blocks (same shape as the IMA decoder: the per-sample loop is
    inherent, every block steps in numpy lockstep).  Block layout per
    the Microsoft spec: per-channel predictor byte, then per-channel
    int16 idelta, sample1, sample2; then nibbles HIGH-first, channels
    alternating."""
    hdr_len = 7 * n_ch
    if block_align <= hdr_len:
        raise ValueError(f"bad MS-ADPCM block align {block_align}")
    n_blocks = len(frames) // block_align
    if n_blocks == 0:
        return np.empty((0, n_ch), np.int16)
    blk = np.frombuffer(
        frames[: n_blocks * block_align], np.uint8
    ).reshape(n_blocks, block_align)

    def i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return ((v + 32768) & 0xFFFF) - 32768

    pred_idx = blk[:, :n_ch].astype(np.int64)
    if np.any(pred_idx > 6):
        raise ValueError("MS-ADPCM predictor index out of range")
    o = n_ch
    idelta = i16(blk[:, o : o + 2 * n_ch : 2], blk[:, o + 1 : o + 2 * n_ch : 2])
    o += 2 * n_ch
    samp1 = i16(blk[:, o : o + 2 * n_ch : 2], blk[:, o + 1 : o + 2 * n_ch : 2])
    o += 2 * n_ch
    samp2 = i16(blk[:, o : o + 2 * n_ch : 2], blk[:, o + 1 : o + 2 * n_ch : 2])
    data = blk[:, hdr_len:]
    nibs = np.empty((n_blocks, data.shape[1] * 2), np.uint8)
    nibs[:, 0::2] = data >> 4  # HIGH nibble first (unlike IMA)
    nibs[:, 1::2] = data & 0x0F
    n_nib_ch = nibs.shape[1] // n_ch
    spb = 2 + n_nib_ch
    out = np.empty((n_blocks, spb, n_ch), np.int16)
    c1 = _MS_COEFFS[pred_idx, 0]
    c2 = _MS_COEFFS[pred_idx, 1]
    out[:, 0, :] = samp2.astype(np.int16)  # sample2 is the EARLIER sample
    out[:, 1, :] = samp1.astype(np.int16)
    s1 = samp1.copy()
    s2 = samp2.copy()
    delta = idelta.copy()
    for i in range(n_nib_ch):
        for c in range(n_ch):
            n = nibs[:, i * n_ch + c].astype(np.int64)
            signed = n - ((n & 8) << 1)  # two's-complement 4-bit
            pred = ((s1[:, c] * c1[:, c] + s2[:, c] * c2[:, c]) >> 8) \
                + signed * delta[:, c]
            np.clip(pred, -32768, 32767, out=pred)
            out[:, 2 + i, c] = pred.astype(np.int16)
            s2[:, c] = s1[:, c]
            s1[:, c] = pred
            delta[:, c] = np.maximum(16, (_MS_ADAPT[n] * delta[:, c]) >> 8)
    samples = out.reshape(n_blocks * spb, n_ch)
    if n_frames is not None and 0 <= n_frames < samples.shape[0]:
        samples = samples[:n_frames]
    return samples


def encode_wav_ms_adpcm(
    samples: np.ndarray, sample_rate: int, block_frames: int = 500
) -> bytes:
    """(n_frames, n_channels) int16 → MS-ADPCM WAV bytes (format tag
    2).  Encoder uses coefficient pair 0 (256, 0) for every block —
    a valid choice the spec leaves to the encoder; the decoder honors
    whatever the header says — with the standard adaptive idelta."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    if n_frames < 2:
        raise ValueError("MS-ADPCM encode needs at least two frames")
    if block_frames % 2:
        raise ValueError("block_frames must be even")
    n_nib_ch = block_frames - 2
    block_align = 7 * n_ch + n_nib_ch * n_ch // 2
    blocks = []
    for start in range(0, n_frames, block_frames):
        seg = arr[start : start + block_frames].astype(np.int64)
        if seg.shape[0] < block_frames:
            pad = np.repeat(seg[-1:], block_frames - seg.shape[0], axis=0)
            seg = np.vstack([seg, pad])
        hdr = bytearray(bytes([0]) * n_ch)  # predictor 0 per channel
        deltas, s1s, s2s = [], [], []
        for c in range(n_ch):
            d0 = max(16, int(np.abs(np.diff(seg[:16, c])).mean() // 4))
            deltas.append(d0)
            s2s.append(int(seg[0, c]))
            s1s.append(int(seg[1, c]))
        for d in deltas:
            hdr += struct.pack("<h", d)
        for s in s1s:
            hdr += struct.pack("<h", s)
        for s in s2s:
            hdr += struct.pack("<h", s)
        nibbles = []
        state = [
            {"s1": s1s[c], "s2": s2s[c], "delta": deltas[c]}
            for c in range(n_ch)
        ]
        for i in range(2, block_frames):
            for c in range(n_ch):
                st = state[c]
                pred = (st["s1"] * 256 + st["s2"] * 0) >> 8
                err = int(seg[i, c]) - pred
                code = max(-8, min(7, int(round(err / st["delta"]))))
                recon = pred + code * st["delta"]
                recon = max(-32768, min(32767, recon))
                nibbles.append(code & 0xF)
                st["s2"] = st["s1"]
                st["s1"] = recon
                st["delta"] = max(
                    16, (int(_MS_ADAPT[code & 0xF]) * st["delta"]) >> 8
                )
        body = bytearray(hdr)
        for i in range(0, len(nibbles), 2):
            body.append((nibbles[i] << 4) | nibbles[i + 1])
        assert len(body) == block_align
        blocks.append(bytes(body))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 2, n_ch, sample_rate,
        sample_rate * block_align // block_frames, block_align, 4,
        2, block_frames,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, block_frames: int = 505
) -> bytes:
    """(n_frames, n_channels) int16 → IMA-ADPCM WAV bytes (format tag
    0x11, the standard block layout + a 'fact' chunk with the exact
    frame count).  Encoder state (step index) carries across blocks
    per channel, like reference encoders; each block header snapshots
    it so blocks stay independently decodable."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    if n_frames == 0:
        raise ValueError("IMA-ADPCM encode needs at least one frame")
    if (block_frames - 1) % 8:
        raise ValueError("block_frames must be 1 + multiple of 8")
    block_align = 4 * n_ch + (block_frames - 1) // 2 * n_ch
    idx = [0] * n_ch
    blocks = []
    for start in range(0, n_frames, block_frames):
        seg = arr[start : start + block_frames]
        if seg.shape[0] < block_frames:  # pad final block by repetition
            pad = np.repeat(seg[-1:], block_frames - seg.shape[0], axis=0)
            seg = np.vstack([seg, pad])
        hdr = bytearray()
        chunks = [bytearray() for _ in range(n_ch)]
        for c in range(n_ch):
            pred = int(seg[0, c])
            hdr += struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            for s in seg[1:, c]:
                step = int(_IMA_STEPS[idx[c]])
                delta = int(s) - pred
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                diff = step >> 3
                if delta >= step:
                    nib |= 4
                    delta -= step
                    diff += step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                    diff += step >> 1
                if delta >= step >> 2:
                    nib |= 1
                    diff += step >> 2
                pred += -diff if nib & 8 else diff
                pred = max(-32768, min(32767, pred))
                idx[c] = max(0, min(88, idx[c] + int(_IMA_INDEX[nib])))
                nibs.append(nib)
            for i in range(0, len(nibs), 2):
                chunks[c].append(nibs[i] | (nibs[i + 1] << 4))
        body = bytearray(hdr)
        for off in range(0, len(chunks[0]), 4):
            for c in range(n_ch):
                body += chunks[c][off : off + 4]
        assert len(body) == block_align
        blocks.append(bytes(body))
    data = b"".join(blocks)
    spb = block_frames
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


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
    fmt_extra = b""
    frames = None
    fact_frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
            fmt_extra = payload[16:]
        elif tag == b"data":
            frames = payload
        elif tag == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack("<I", payload[:4])
        pos += 8 + size + (size & 1)
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    return decode_wave_samples(fmt, fmt_extra, frames, fact_frames)


def decode_wave_samples(
    fmt: tuple,
    fmt_extra: bytes,
    frames: bytes,
    fact_frames: int | None,
) -> tuple[np.ndarray, int]:
    """Decode a WAVEFORMATEX-described sample stream — shared by the
    WAV container above and the AVI 'auds' stream demuxer
    (functions/avicodec.decode_avi_audio), which carry the identical
    fmt structure."""
    format_tag, n_ch, rate, _byte_rate, _block, bits = fmt
    if n_ch < 1:  # before any branch divides by n_ch (r16 ADVICE)
        raise ValueError("WAV with zero channels")
    if format_tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE wraps the real format in the
        # SubFormat GUID (first two bytes, LE) — how >16-bit and
        # multichannel PCM usually ships
        if len(fmt_extra) < 24:
            raise ValueError("truncated EXTENSIBLE fmt extension")
        (format_tag,) = struct.unpack("<H", fmt_extra[8:10])
        if format_tag == 0xFFFE:
            raise ValueError("EXTENSIBLE WAV wrapping itself")
    if format_tag == 0x11:  # IMA/DVI ADPCM
        if bits != 4:
            raise ValueError(f"IMA-ADPCM WAV with {bits}-bit samples")
        return _decode_ima_adpcm(frames, n_ch, _block, fact_frames), rate
    if format_tag == 2:  # MS-ADPCM
        if bits != 4:
            raise ValueError(f"MS-ADPCM WAV with {bits}-bit samples")
        return _decode_ms_adpcm(frames, n_ch, _block, fact_frames), rate
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
    if format_tag == 3:  # IEEE float
        if bits not in (32, 64):
            raise ValueError(f"IEEE-float WAV with {bits}-bit samples")
        width = bits // 8
        arr = np.frombuffer(
            frames[: (len(frames) // (width * n_ch)) * width * n_ch],
            "<f4" if bits == 32 else "<f8",
        ).reshape(-1, n_ch)
        # [-1, 1] normalized float -> int16 analysis domain: clip then
        # symmetric scale by 32767 with round-half-even (np.rint) —
        # deterministic on every platform.  NaN/Inf (possible in
        # crafted or corrupt files) map to 0/±32767 rather than hitting
        # the undefined NaN->int cast
        clipped = np.clip(
            np.nan_to_num(
                arr.astype(np.float64), nan=0.0, posinf=1.0, neginf=-1.0
            ),
            -1.0, 1.0,
        )
        return np.rint(clipped * 32767.0).astype(np.int16), rate
    if format_tag != 1:
        names = {0x55: "MP3", 0x2000: "AC3", 0x161: "WMA"}
        raise NotImplementedError(
            f"WAV format tag {format_tag} "
            f"({names.get(format_tag, 'unknown')}) not supported; "
            "integer PCM, IEEE float, G.711, IMA-ADPCM and MS-ADPCM only"
        )
    if bits == 16:
        arr = np.frombuffer(
            frames[: (len(frames) // (2 * n_ch)) * 2 * n_ch], "<i2"
        ).reshape(-1, n_ch)
        return arr.astype(np.int16), rate
    if bits == 24:
        # top 16 bits: the standard analysis-domain narrowing (PCM24's
        # extra precision is below the int16 feature domain)
        raw = np.frombuffer(
            frames[: (len(frames) // (3 * n_ch)) * 3 * n_ch], np.uint8
        ).reshape(-1, 3)
        return (
            (raw[:, 1].astype(np.int32)
             | (raw[:, 2].astype(np.int32) << 8))
            .astype(np.int16)
            .reshape(-1, n_ch)
        ), rate
    if bits == 32:
        arr = np.frombuffer(
            frames[: (len(frames) // (4 * n_ch)) * 4 * n_ch], "<i4"
        ).reshape(-1, n_ch)
        return (arr >> 16).astype(np.int16), rate
    if bits == 8:
        arr = np.frombuffer(
            frames[: (len(frames) // n_ch) * n_ch], np.uint8
        ).reshape(-1, n_ch)
        return (
            (arr.astype(np.int16) - 128) << 8
        ).astype(np.int16), rate
    raise NotImplementedError(f"{bits}-bit PCM not supported (8/16 only)")
