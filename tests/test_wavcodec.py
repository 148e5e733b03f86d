"""WAV codec — roundtrips + cross-validation against CPython's stdlib
``wave`` module (an independent, always-present implementation of the
same RIFF/WAVE spec)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from pinot_spark.functions.wavcodec import decode_wav, encode_wav


def _sig(n, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, (n, ch), dtype=np.int64).astype(
        np.int16
    )


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_roundtrip_pcm16(ch):
    s = _sig(997, ch, seed=ch)
    out, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_mono_1d_input():
    s = _sig(100, 1).ravel()
    out, _ = decode_wav(encode_wav(s, 16000))
    assert np.array_equal(out[:, 0], s)


def test_stdlib_wave_reads_our_bytes():
    s = _sig(500, 2, seed=7)
    data = encode_wav(s, 44100)
    w = wave.open(io.BytesIO(data))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
        2, 2, 44100,
    )
    assert w.getnframes() == 500
    frames = np.frombuffer(w.readframes(500), "<i2").reshape(-1, 2)
    assert np.array_equal(frames, s)


def test_our_decoder_reads_stdlib_wave_bytes():
    s = _sig(300, 1, seed=9)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(22050)
    w.writeframes(s.astype("<i2").tobytes())
    w.close()
    out, rate = decode_wav(buf.getvalue())
    assert rate == 22050
    assert np.array_equal(out, s)


def test_pcm8_widens_losslessly():
    raw = np.arange(256, dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 256) + raw.tobytes()
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(data)
    assert np.array_equal(out[:, 0], (raw.astype(np.int16) - 128) << 8)


def test_unsupported_formats_raise_by_name():
    s = _sig(10, 1)
    data = bytearray(encode_wav(s, 8000))
    data[20] = 0x55  # format tag -> MP3
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_wav(bytes(data))
    data[20] = 3  # IEEE float DECODES now — but not at 16 bits
    with pytest.raises(ValueError, match="IEEE-float"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + bytes(40))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_roundtrip_property():
    """Hypothesis: ANY int16 sample array (any length, 1-4 channels,
    any common rate) roundtrips sample-exact through encode/decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(0, 2000),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        seed=st.integers(0, 2**31),
    )
    def prop(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, (n, ch), dtype=np.int64).astype(
            np.int16
        )
        out, got_rate = decode_wav(encode_wav(s, rate))
        assert got_rate == rate
        assert out.shape == (n, ch)
        assert np.array_equal(out, s)

    prop()


def test_wav_corrupt_input_exception_contract():
    """Byte-flipped/truncated WAVs decode or raise only ValueError/
    IndexError/NotImplementedError (operator-classified types);
    struct.error normalizes to ValueError."""
    import random

    base = encode_wav(np.arange(-400, 400, dtype=np.int16), 8000)
    rng = random.Random(7)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(4, len(b))] = rng.randrange(256)
        try:
            decode_wav(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 7):
        try:
            decode_wav(base[:cut])
        except (ValueError, IndexError):
            pass


# ALL 256 expansion values for each G.711 law, generated once from
# CPython's audioop C implementation (audioop.ulaw2lin/alaw2lin of
# bytes(range(256)), int16 LE) and pinned inline — audioop is removed
# in Python 3.13, so the independent ground truth lives here now.
_AUDIOOP_ULAW_B64 = (
    "hIKEhoSKhI6EkoSWhJqEnoSihKaEqoSuhLKEtoS6hL6EwYTDhMWEx4TJhMuEzYTPhN"
    "GE04TVhNeE2YTbhN2E3wThBOIE4wTkBOUE5gTnBOgE6QTqBOsE7ATtBO4E7wTwxPBE"
    "8cTxRPLE8kTzxPNE9MT0RPXE9UT2xPZE98T3RPik+OT4JPlk+aT55Pkk+mT6pPrk+i"
    "T7ZPuk++T7JPxk/JT8tPzU/PT8FP00/VT9dP2U/bT91P30/RT+NP5U/nT+jP6c/qz+"
    "vP7M/tz+7P78/gz/HP8s/zz/TP9c/2z/fP+I/5D/mP+g/6j/sP+4/8D/yP/Q/9j/4P"
    "/o//D/+P8AAHx9fHl8dXxxfG18aXxlfGF8XXxZfFV8UXxNfEl8RXxBfD58PHw6fDh8"
    "Nnw0fDJ8MHwufCx8KnwofCZ8JHwifCD8Hvwd/Bz8G/wa/Bn8GPwX/Bb8FfwU/BP8Ev"
    "wR/BD8DzwPvA48DrwNPA28DDwMvAs8C7wKPAq8CTwJvAg8CLwHXAccB9wGnAZcBhwG"
    "3AWcBVwFHAXcBJwEXAQcBNwDnANsA0wDLAMMA+wCzAKsAowCbAJMAiwCDALsAcwBrA"
    "GMAXQBZAFUAUQBNAEkARQBBAH0AOQA1ADEALQApACUAIQAeABwAGgAYABYAFAASABA"
    "ADgAMAAoACAAGAAQAAgAAAA="
)
_AUDIOOP_ALAW_B64 = (
    "gOqA64DogOmA7oDvgOyA7YDigOOA4IDhgOaA54DkgOVA9cD1QPTA9ED3wPdA9sD2QP"
    "HA8UDwwPBA88DzQPLA8gCqAK4AogCmALoAvgCyALYAigCOAIIAhgCaAJ4AkgCWANUA"
    "1wDRANMA3QDfANkA2wDFAMcAwQDDAM0AzwDJAMuo/rj+iP6Y/uj++P7I/tj+KP44/g"
    "j+GP5o/nj+SP5Y/qj/uP+I/5j/6P/4/8j/2P8o/zj/CP8Y/2j/eP9I/1j/oPrg+iD6"
    "YPqg++D7IPtg+6D44Pgg+GD4oPng+SD5YPlQ/XD9EP0w/dD98P2Q/bD9UPxw/BD8MP"
    "zQ/PD8kPyw/IAVgBSAF4AWgBGAEIATgBKAHYAcgB+AHoAZgBiAG4AawApACsALQAvA"
    "CEAIwAlACcAOQA7AD0APwAxADMANQA0AVgBSAF4AWgBGAEIATgBKAHYAcgB+AHoAZg"
    "BiAG4AagArACkALwAtACMAIQAnACUAOwA5AD8APQAzADEANwA1WAFIAXgBaAEYAQgB"
    "OAEoAdgByAH4AegBmAGIAbgBqAFYAEgAeABoABgACAA4ACgA2ADIAPgA6ACYAIgAuA"
    "CoAGAFIAXgBaAFYAQgBOAEoARgByAH4AegB2AGIAbgBqAGsAKQAvAC0AIwAhACcAJQ"
    "ArADkAPwA9ADMAMQA3ADUAM="
)


def test_g711_decode_matches_audioop():
    """mu-law and A-law expansion cross-validated against the PINNED
    output of CPython's audioop (an independent C implementation of the
    same ITU-T G.711 reference algorithm; removed in Python 3.13, so
    its 256-code outputs are frozen inline above) over ALL 256 code
    bytes, then through a real WAV container with the G.711 tags."""
    import base64

    raw = bytes(range(256))
    want_u = np.frombuffer(base64.b64decode(_AUDIOOP_ULAW_B64), "<i2")
    want_a = np.frombuffer(base64.b64decode(_AUDIOOP_ALAW_B64), "<i2")
    assert len(want_u) == len(want_a) == 256
    try:  # if the interpreter still ships audioop, re-verify the pins
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        assert audioop.ulaw2lin(raw, 2) == want_u.tobytes()
        assert audioop.alaw2lin(raw, 2) == want_a.tobytes()
    except ImportError:
        pass

    def g711_wav(tag, payload, ch=1, rate=8000):
        fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch, ch, 8)
        body = (
            b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        if len(payload) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    out_u, rate = decode_wav(g711_wav(7, raw))
    assert rate == 8000
    assert np.array_equal(out_u[:, 0], want_u)
    out_a, _ = decode_wav(g711_wav(6, raw))
    assert np.array_equal(out_a[:, 0], want_a)
    # stereo de-interleave on a G.711 stream
    out2, _ = decode_wav(g711_wav(7, raw, ch=2))
    assert out2.shape == (128, 2)
    assert np.array_equal(out2.ravel(), want_u)
    # 8-bit "float" is malformed, not a boundary (float decodes now)
    with pytest.raises(ValueError, match="IEEE-float"):
        decode_wav(g711_wav(3, raw))


def test_g711_zero_channel_raises_valueerror():
    """A crafted zero-channel G.711 WAV raises ValueError (the
    operator-classified 'corrupt' type), not ZeroDivisionError — the
    n_ch check now runs before any branch divides by n_ch (r16
    ADVICE)."""
    for tag in (1, 6, 7):
        fmt = struct.pack("<HHIIHH", tag, 0, 8000, 8000, 1, 8)
        body = (
            b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
        )
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="zero channels"):
            decode_wav(data)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — round 17: the first COMPRESSED
# real-world audio format, per the round-16 verdict's reachable-formats
# item.
# ---------------------------------------------------------------------------


def test_ima_adpcm_nibble_math_matches_audioop():
    """The core IMA expansion (step/index tables + the >>3 diff
    reconstruction) cross-validated against CPython's audioop
    adpcm2lin — an independent C implementation of the same published
    IMA algorithm — over a seeded 4096-nibble stream.  audioop is
    removed in Python 3.13, so its output digest is pinned; when the
    module still exists the comparison also runs live, whole-array."""
    import hashlib

    from pinot_spark.functions.wavcodec import _ima_decode_nibbles

    rng = np.random.default_rng(42)
    codes = rng.integers(0, 16, 4096).astype(np.uint8)
    pred = np.zeros(1, np.int32)
    idx = np.zeros(1, np.int32)
    got = _ima_decode_nibbles(codes[None, :], pred, idx)[0]
    assert hashlib.sha256(
        got.astype("<i2").tobytes()
    ).hexdigest() == (
        "174cef9492915186013761c27ca2b588f191e95cc156fd35459400040d7c4a2a"
    )
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        # audioop packs HIGH nibble first; repack the same code stream
        packed = bytes(
            (int(codes[i]) << 4) | int(codes[i + 1])
            for i in range(0, 4096, 2)
        )
        want = np.frombuffer(audioop.adpcm2lin(packed, 2, (0, 0))[0], "<i2")
        assert np.array_equal(got, want)
    except ImportError:
        pass


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_adpcm_wav_roundtrip_snr(ch):
    """ADPCM is lossy: the WAV container roundtrip preserves shape,
    rate and the signal to >30 dB SNR on band-limited content."""
    from pinot_spark.functions.wavcodec import encode_wav_ima_adpcm

    t = np.arange(5000)
    sig = np.stack(
        [
            (3000 * np.sin(2 * np.pi * t / (50 + c * 13))).astype(np.int16)
            for c in range(ch)
        ],
        axis=1,
    )
    out, rate = decode_wav(encode_wav_ima_adpcm(sig, 8000))
    assert rate == 8000 and out.shape == sig.shape
    err = out.astype(np.int64) - sig.astype(np.int64)
    snr = 10 * np.log10(
        (sig.astype(np.int64) ** 2).mean() / max((err**2).mean(), 1e-9)
    )
    assert snr > 30, f"SNR {snr:.1f} dB"


def test_ima_adpcm_fact_chunk_trims_padding():
    """A final partial block is padded on encode; the fact chunk's
    exact frame count trims it back on decode."""
    from pinot_spark.functions.wavcodec import encode_wav_ima_adpcm

    sig = (200 * np.sin(np.arange(777) / 5)).astype(np.int16)[:, None]
    out, _ = decode_wav(encode_wav_ima_adpcm(sig, 16000))
    assert out.shape == (777, 1)


def test_ima_adpcm_first_sample_is_header_predictor():
    """Block headers carry the first sample verbatim (int16 LE) — so
    sample 0 of every block decodes exactly."""
    from pinot_spark.functions.wavcodec import encode_wav_ima_adpcm

    sig = np.full((505 * 3, 1), -12345, np.int16)
    sig[505] = 31000
    sig[1010] = -31000
    out, _ = decode_wav(encode_wav_ima_adpcm(sig, 8000, block_frames=505))
    assert out[0, 0] == -12345
    assert out[505, 0] == 31000
    assert out[1010, 0] == -31000


def test_ima_adpcm_corrupt_input_exception_contract():
    import random

    from pinot_spark.functions.wavcodec import encode_wav_ima_adpcm

    sig = (1000 * np.sin(np.arange(2000) / 9)).astype(np.int16)
    base = encode_wav_ima_adpcm(np.stack([sig, sig], axis=1), 8000)
    rng = random.Random(3)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(4, len(b))] = rng.randrange(256)
        try:
            decode_wav(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 61):
        try:
            decode_wav(base[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# Round 17 format widening: IEEE float, PCM 24/32, EXTENSIBLE, MS-ADPCM
# ---------------------------------------------------------------------------


def _wav(tag, n_ch, rate, bits, payload, extra=b""):
    fmt = struct.pack(
        "<HHIIHH", tag, n_ch, rate, rate * n_ch * max(bits, 8) // 8,
        n_ch * max(bits, 8) // 8, bits,
    ) + extra
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float32_wav_decodes_scaled():
    """IEEE-float WAV (format 3): [-1,1] scales to int16 by 32767 with
    round-half-even; out-of-range values clip."""
    vals = np.array([0.0, 1.0, -1.0, 0.5, -0.25, 2.0, -7.5], np.float32)
    out, rate = decode_wav(_wav(3, 1, 48000, 32, vals.astype("<f4").tobytes()))
    assert rate == 48000
    want = [0, 32767, -32767, 16384, -8192, 32767, -32767]
    assert out[:, 0].tolist() == want
    # float64 too
    out64, _ = decode_wav(_wav(3, 1, 48000, 64, vals.astype("<f8").tobytes()))
    assert np.array_equal(out64, out)


def test_pcm24_and_pcm32_narrow_to_top16():
    s24 = b"".join(
        struct.pack("<i", v << 8)[:3] for v in (-32768, -1, 0, 1, 32767)
    )
    out, _ = decode_wav(_wav(1, 1, 44100, 24, s24))
    assert out[:, 0].tolist() == [-32768, -1, 0, 1, 32767]
    s32 = np.array(
        [-32768 << 16, -65536, 0, 65536, 32767 << 16], "<i4"
    ).tobytes()
    out32, _ = decode_wav(_wav(1, 1, 44100, 32, s32))
    assert out32[:, 0].tolist() == [-32768, -1, 0, 1, 32767]


def test_extensible_wav_unwraps_subformat():
    """WAVE_FORMAT_EXTENSIBLE: the SubFormat GUID's first two bytes
    name the real codec — PCM16 and float32 both unwrap."""
    s = _sig(64, 2, seed=5)
    ext_pcm = struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + bytes(14)
    data = _wav(0xFFFE, 2, 8000, 16, s.astype("<i2").tobytes(), ext_pcm)
    out, _ = decode_wav(data)
    assert np.array_equal(out, s)
    f = (s[:, :1].astype(np.float64) / 32767.0).astype("<f4")
    ext_f = struct.pack("<HHI", 22, 32, 3) + struct.pack("<H", 3) + bytes(14)
    outf, _ = decode_wav(_wav(0xFFFE, 1, 8000, 32, f.tobytes(), ext_f))
    assert np.abs(outf.astype(int) - s[:, :1].astype(int)).max() <= 1
    # truncated extension is malformed
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        decode_wav(_wav(0xFFFE, 1, 8000, 16, s[:, 0].tobytes(), b"\x16\x00"))


def test_ms_adpcm_hand_vector():
    """Hand-computed MS-ADPCM block against the published spec math:
    predictor pair 0 (256,0), idelta 16, samples (1000, 2000) then
    nibbles +1 and -1: pred=s1=2000 -> 2016; delta=max(16,230*16>>8)=14->16;
    next pred=2016 + (-1)*16 = 2000."""
    from pinot_spark.functions.wavcodec import _decode_ms_adpcm

    blk = (
        bytes([0])                      # predictor idx
        + struct.pack("<h", 16)         # idelta
        + struct.pack("<h", 2000)       # sample1
        + struct.pack("<h", 1000)       # sample2
        + bytes([(1 << 4) | 0xF])       # nibbles +1, -1 (high first)
    )
    out = _decode_ms_adpcm(blk, 1, len(blk), None)
    assert out[:, 0].tolist() == [1000, 2000, 2016, 2000]


def test_ms_adpcm_wav_roundtrip_snr():
    from pinot_spark.functions.wavcodec import encode_wav_ms_adpcm

    t = np.arange(4000)
    for ch in (1, 2):
        sig = np.stack(
            [
                (3000 * np.sin(2 * np.pi * t / (60 + 17 * c))).astype(np.int16)
                for c in range(ch)
            ],
            axis=1,
        )
        out, rate = decode_wav(encode_wav_ms_adpcm(sig, 8000))
        assert rate == 8000 and out.shape == sig.shape
        err = out.astype(np.int64) - sig.astype(np.int64)
        snr = 10 * np.log10(
            (sig.astype(np.int64) ** 2).mean() / max((err**2).mean(), 1e-9)
        )
        assert snr > 25, f"ch={ch} SNR {snr:.1f} dB"


def test_ms_adpcm_corrupt_input_exception_contract():
    import random

    from pinot_spark.functions.wavcodec import encode_wav_ms_adpcm

    sig = (1000 * np.sin(np.arange(2000) / 9)).astype(np.int16)
    base = encode_wav_ms_adpcm(np.stack([sig, sig], axis=1), 8000)
    rng = random.Random(5)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(4, len(b))] = rng.randrange(256)
        try:
            decode_wav(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 83):
        try:
            decode_wav(base[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass


def test_float_wav_nan_inf_deterministic():
    """NaN/±Inf in crafted float WAVs map to 0/±32767 — never the
    undefined NaN→int cast (crawl-scale corrupt-input hardening)."""
    vals = np.array(
        [float("nan"), float("inf"), float("-inf"), 0.5], np.float32
    )
    out, _ = decode_wav(_wav(3, 1, 8000, 32, vals.astype("<f4").tobytes()))
    assert out[:, 0].tolist() == [0, 32767, -32767, 16384]


def test_float_wav_corrupt_input_exception_contract():
    import random

    vals = (np.sin(np.arange(500) / 9).astype(np.float32) * 0.8)
    base = _wav(3, 2, 8000, 32, vals.astype("<f4").tobytes())
    rng = random.Random(17)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(4, len(b))] = rng.randrange(256)
        try:
            decode_wav(bytes(b))
        except (ValueError, IndexError, NotImplementedError):
            pass
    for cut in range(0, len(base), 53):
        try:
            decode_wav(base[:cut])
        except (ValueError, IndexError, NotImplementedError):
            pass
