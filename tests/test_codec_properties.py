"""Property-based roundtrip tests for the pure-stdlib codecs added in
round 5 (imagecodec, avrocodec, bsoncodec, thriftcodec): encode→decode
must be identity over generated inputs, not just the fixture cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from pinot_spark.functions import imagecodec as ic
from pinot_spark.sources import avrocodec, bsoncodec, thriftcodec


@settings(max_examples=100, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_roundtrip_property(h, w, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(arr)), arr)


_scalar = st.one_of(
    st.integers(-(2**62), 2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
    st.booleans(),
    st.none(),
    st.binary(max_size=20),
)
_bson_doc = st.dictionaries(
    st.text(
        # BSON e_names are cstrings: no NUL, and must be encodable UTF-8
        # (lone surrogates U+D800-DFFF are not valid BSON keys)
        alphabet=st.characters(
            min_codepoint=1,
            blacklist_characters="\x00",
            blacklist_categories=("Cs",),
        ),
        min_size=1,
        max_size=10,
    ),
    st.one_of(_scalar, st.lists(st.integers(-100, 100), max_size=5)),
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(doc=_bson_doc)
def test_bson_roundtrip_property(doc):
    back = bsoncodec.decode_document(bsoncodec.encode_document(doc))
    assert back == doc


@settings(max_examples=50, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "i": st.integers(-(2**62), 2**62),
                "s": st.one_of(st.none(), st.text(max_size=15)),
                "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
                "a": st.lists(st.text(max_size=5), max_size=4),
            }
        ),
        max_size=8,
    ),
    codec=st.sampled_from(["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]),
)
def test_avro_ocf_roundtrip_property(recs, codec):
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "a", "type": {"type": "array", "items": "string"}},
        ],
    }
    buf = avrocodec.write_ocf(schema, recs, codec=codec)
    assert list(avrocodec.iter_records(buf)) == recs


@settings(max_examples=50, deadline=None)
@given(
    fields=st.lists(
        st.tuples(
            st.integers(1, 200),
            st.one_of(
                st.integers(-(2**62), 2**62),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.text(max_size=15),
                st.booleans(),
                st.lists(st.integers(-100, 100), min_size=1, max_size=4),
                st.dictionaries(
                    st.text(min_size=1, max_size=5),
                    st.integers(-100, 100),
                    min_size=1,
                    max_size=3,
                ),
            ),
        ),
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_thrift_roundtrip_property(fields):
    spec = {fid: f"f{fid}" for fid, _ in fields}
    out = thriftcodec.decode_struct(thriftcodec.encode_struct(fields), spec)
    assert out == {f"f{fid}": v for fid, v in fields}


@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    ncolors=st.integers(1, 256), seed=st.integers(0, 10**6),
    interlace=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_gif_roundtrip_property(h, w, ncolors, seed, interlace):
    from pinot_spark.functions.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    img = palette[rng.integers(0, ncolors, (h, w))]
    assert np.array_equal(
        decode_gif(encode_gif(img, interlace=interlace)), img
    )


@given(
    h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 10**6),
    packbits=st.booleans(), rps=st.sampled_from([1, 3, 16, 999]),
)
@settings(max_examples=200, deadline=None)
@example(h=9, w=15, seed=187841, packbits=True, rps=16)  # r8 falsifier
def test_tiff_roundtrip_property(h, w, seed, packbits, rps):
    from pinot_spark.functions.tiffcodec import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    got = decode_tiff(encode_tiff(img, packbits=packbits, rows_per_strip=rps))
    assert np.array_equal(got, img)


def test_packbits_129_literal_regression():
    """Pinned r8 bug: a 129-byte literal stretch (127 non-run bytes then a
    2-byte mini-run) must not emit count byte 128 — the PackBits NO-OP."""
    from pinot_spark.functions.tiffcodec import packbits_decode, packbits_encode

    data = bytes((b * 7 + 3) % 251 for b in range(127)) + b"\xff\xff"
    enc = packbits_encode(data)
    assert packbits_decode(enc, len(data)) == data
    # walk the record stream: no record may start with the no-op byte
    i = 0
    while i < len(enc):
        c = enc[i]
        assert c != 128, "encoder emitted the PackBits no-op count byte"
        i += 2 if c > 128 else c + 2
    assert i == len(enc)


@given(data=st.binary(max_size=800))
@settings(max_examples=300, deadline=None)
def test_packbits_roundtrip_property(data):
    from pinot_spark.functions.tiffcodec import packbits_decode, packbits_encode

    enc = packbits_encode(data)
    assert packbits_decode(enc, len(data)) == data
    # structural invariant: the record stream never contains a no-op count
    # byte and is exactly consumed by spec-compliant record walking
    i = 0
    while i < len(enc):
        c = enc[i]
        assert c != 128
        i += 2 if c > 128 else c + 2
    assert i == len(enc)


@given(
    n=st.integers(0, 600), alphabet=st.integers(2, 256),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=300, deadline=None)
def test_gif_lzw_roundtrip_property(n, alphabet, seed):
    from pinot_spark.functions.gifcodec import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, alphabet, n).astype(np.uint8))
    mcs = max(2, int(np.ceil(np.log2(max(alphabet, 2)))))
    assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data


def test_gif_lzw_table_reset_and_width12_boundaries():
    """The ≤600-byte LZW property never reaches the 4096-entry table
    reset or the 12-bit code width — the exact greedy-boundary class
    the round-8 PackBits bug lived in. Force both: long random streams
    (every alphabet shape), and a full-frame noise GIF through both
    interlace modes."""
    from pinot_spark.functions.gifcodec import (
        _lzw_decode, _lzw_encode, decode_gif, encode_gif,
    )

    rng = np.random.default_rng(7)
    for alphabet, n in [(256, 30000), (2, 60000), (16, 40000), (251, 12289)]:
        data = bytes(rng.integers(0, alphabet, n).astype(np.uint8))
        mcs = max(2, int(np.ceil(np.log2(max(alphabet, 2)))))
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data, (alphabet, n)
    palette = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = palette[rng.integers(0, 256, (128, 128))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_theta_partial_truncation_keeps_theta():
    """Round-9 regression: a partition accumulator that truncates its
    candidate set to k (not k+1) silently flips the merged sketch into
    the 'exact' regime — estimate == k — when the true cardinality
    exceeds k. Both top-k accumulators must preserve the (k+1)-th value
    that becomes theta."""
    import numpy as np

    from pinot_spark.operators.theta import ThetaSketch

    k = 64
    n = 50 * k  # uniform 64-bit hashes, as xxhash64 produces
    raw = np.random.default_rng(42).integers(
        0, 2**64, n, dtype=np.uint64
    )
    sk = ThetaSketch.from_hashes(k, np.unique(raw))
    assert sk.theta_u64 < 2**64  # approximate regime, not "exact"
    est = sk.estimate()
    assert abs(est - n) / n < 0.5  # ~1/sqrt(k) error envelope, 4 sigma


def test_gif_median_cut_quantization():
    """encode_gif(quantize=True) median-cuts >256-color images to a
    256-entry palette: bounded reconstruction error on smooth content,
    lossless passthrough at ≤256 colors, quantized output re-encodes
    losslessly, and the default path still raises the loud boundary."""
    import pytest

    from pinot_spark.functions.gifcodec import decode_gif, encode_gif

    h, w = 60, 80
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.dstack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (w + h))]
    ).astype(np.uint8)
    with pytest.raises(NotImplementedError):
        encode_gif(img)
    dec = decode_gif(encode_gif(img, quantize=True))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 48
    assert len(np.unique(dec.reshape(-1, 3), axis=0)) <= 256
    assert np.array_equal(decode_gif(encode_gif(dec)), dec)
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    exact = pal[rng.integers(0, 256, (40, 40))]
    assert np.array_equal(decode_gif(encode_gif(exact, quantize=True)), exact)


def test_adpcm_roundtrip_properties():
    """Hypothesis over both ADPCM codecs: ANY int16 signal (any
    length/channel count) encodes to a valid WAV that decodes
    deterministically with the exact input shape; block headers make
    sample 0 of every block exact (IMA) / samples 0-1 exact (MS)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pinot_spark.functions.wavcodec import (
        decode_wav,
        encode_wav_ima_adpcm,
        encode_wav_ms_adpcm,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(2, 3000),
        ch=st.integers(1, 3),
        seed=st.integers(0, 2**31),
        codec=st.sampled_from(["ima", "ms"]),
    )
    def prop(n, ch, seed, codec):
        rng = np.random.default_rng(seed)
        # band-limited-ish: cumulative small steps (ADPCM's domain)
        steps = rng.integers(-500, 501, (n, ch))
        sig = np.clip(np.cumsum(steps, axis=0), -32768, 32767).astype(
            np.int16
        )
        enc = encode_wav_ima_adpcm if codec == "ima" else encode_wav_ms_adpcm
        data = enc(sig, 8000)
        out1, rate = decode_wav(data)
        out2, _ = decode_wav(data)
        assert rate == 8000
        assert out1.shape == sig.shape
        assert np.array_equal(out1, out2)  # decode is deterministic
        if codec == "ima":
            assert np.array_equal(out1[0], sig[0])  # header sample exact
        else:
            assert np.array_equal(out1[:2], sig[:2])

    prop()


def test_ima_adpcm_blocks_decode_independently():
    """Each IMA block re-seeds predictor+index in its header: decoding
    a block's bytes alone equals its slice of the full decode (the
    property that makes a 100 TB audio scan splittable mid-file)."""
    import struct

    from pinot_spark.functions.wavcodec import (
        decode_wav,
        encode_wav_ima_adpcm,
    )

    rng = np.random.default_rng(7)
    sig = np.clip(
        np.cumsum(rng.integers(-300, 301, (505 * 3, 2)), axis=0),
        -32768, 32767,
    ).astype(np.int16)
    data = encode_wav_ima_adpcm(sig, 8000, block_frames=505)
    full, _ = decode_wav(data)
    # locate the data chunk and re-wrap each block as its own WAV
    i = data.find(b"data")
    (dsize,) = struct.unpack("<I", data[i + 4 : i + 8])
    payload = data[i + 8 : i + 8 + dsize]
    block_align = (505 - 1) // 2 * 2 + 4 * 2  # per encode layout
    hdr = data[: i]
    for b in range(3):
        blk = payload[b * block_align : (b + 1) * block_align]
        solo = (
            hdr[: hdr.find(b"fact")]  # drop fact so no trim applies
            + b"data" + struct.pack("<I", len(blk)) + blk
        )
        solo = b"RIFF" + struct.pack("<I", len(solo) - 8 + 4) + solo[8:]
        out, _ = decode_wav(solo)
        assert np.array_equal(out, full[b * 505 : (b + 1) * 505])
