"""Property tests for the extended scalar surface: round-trips and
invariants that hold for arbitrary inputs (hypothesis-driven, evaluated
in one Spark pass per property)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pinot_spark.functions.scalar import call


def _eval(spark, cols: dict):
    row = spark.range(1).select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    return row


@settings(max_examples=20, deadline=None)
@given(ms=st.integers(min_value=0, max_value=4_102_444_800_000))  # 1970..2100
def test_iso8601_roundtrip(spark, ms):
    row = _eval(spark, {"back": call("fromIso8601", call("toIso8601", F.lit(ms)))})
    assert row.back == ms


@settings(max_examples=20, deadline=None)
@given(
    ms=st.integers(min_value=0, max_value=4_102_444_800_000),
    bucket=st.integers(min_value=1, max_value=10),
)
def test_epoch_bucket_floor_invariant(spark, ms, bucket):
    row = _eval(
        spark,
        {
            "b": call("toEpochDaysBucket", F.lit(ms), F.lit(bucket)),
            "d": call("toEpochDays", F.timestamp_millis(F.lit(ms))),
        },
    )
    assert row.b == row.d // bucket


@settings(max_examples=20, deadline=None)
@given(s=st.text(alphabet="abcxyz", min_size=0, max_size=12),
       sub=st.text(alphabet="abc", min_size=1, max_size=3))
def test_strpos_strrpos_match_python(spark, s, sub):
    row = _eval(
        spark,
        {"first": call("strpos", F.lit(s), F.lit(sub)),
         "last": call("strrpos", F.lit(s), F.lit(sub))},
    )
    assert row.first == s.find(sub)
    assert row.last == s.rfind(sub)


@settings(max_examples=15, deadline=None)
@given(v=st.text(min_size=0, max_size=30))
def test_hash_determinism_and_width(spark, v):
    from pinot_spark.functions.scalar_ext import (
        _crc32c, _fnv, _murmur2_64a, _murmur3_x86_32, _murmur3_x64_128,
    )

    b = v.encode("utf-8")
    assert 0 <= _murmur3_x86_32(b) < 2**32
    assert 0 <= _crc32c(b) < 2**32
    assert 0 <= _fnv(b, 64, "1a") < 2**64
    assert 0 <= _murmur2_64a(b) < 2**64
    h1, h2 = _murmur3_x64_128(b)
    assert 0 <= h1 < 2**64 and 0 <= h2 < 2**64
    # determinism
    assert _murmur3_x64_128(b) == (h1, h2)


@settings(max_examples=15, deadline=None)
@given(vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=8),
       v=st.integers(min_value=-100, max_value=100))
def test_array_pushback_elementat_0based(spark, vals, v):
    arr = F.array(*[F.lit(x) for x in vals])
    row = _eval(
        spark,
        {"pushed": call("arrayPushBackInt", arr, F.lit(v)),
         "first": call("arrayElementAtInt", arr, F.lit(0)),
         "idx": call("arrayIndexOfInt", arr, F.lit(vals[0]))},
    )
    assert row.pushed == vals + [v]
    assert row.first == vals[0]
    assert row.idx == 0  # first occurrence, 0-based
