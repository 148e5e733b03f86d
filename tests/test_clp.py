"""CLP-style log codec (operators/clp.py): lossless encode/decode
roundtrip on arbitrary messages, template sharing across rows."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pinot_spark.operators.clp import clp_decode, clp_encode_df


def _roundtrip(spark, messages):
    df = spark.createDataFrame([(i, m) for i, m in enumerate(messages)], "id int, message string")
    enc = clp_encode_df(df, "message")
    out = enc.select(
        "id", "message",
        clp_decode("message_logtype", "message_dictionaryVars", "message_encodedVars").alias("back"),
    ).collect()
    return {(r.message, r.back) for r in out}


def test_roundtrip_log_shapes(spark):
    msgs = [
        "Task task_1234 failed after 3 retries on host10.dc1.example.com with code 137",
        "Took 2.5 seconds to scan 60000 rows",
        "GET /api/v2/users/42?limit=10 -> 200 in 12ms",
        "no variables here",
        "",
        "edge -3.5e2 and 0x notahex but id-77 yes",
    ]
    for orig, back in _roundtrip(spark, msgs):
        assert back == orig, (orig, back)


def test_template_sharing(spark):
    """Messages differing only in variables share one logtype — the
    compression premise of the format."""
    msgs = [f"worker {i} finished batch {i * 10} in {i}.5 seconds" for i in range(5)]
    df = spark.createDataFrame([(i, m) for i, m in enumerate(msgs)], "id int, message string")
    enc = clp_encode_df(df, "message")
    assert enc.select("message_logtype").distinct().count() == 1


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                                   whitelist_characters=".-/:_"), max_size=40),
    min_size=1, max_size=4))
def test_roundtrip_property(spark, msgs):
    for orig, back in _roundtrip(spark, msgs):
        assert back == orig, (orig, back)
