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
    codec=st.sampled_from(["null", "deflate"]),
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
