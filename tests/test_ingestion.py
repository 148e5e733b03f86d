"""Ingestion pipeline + format readers + segment writer tests
(SURVEY.md §1.4, §2.1)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pinot_spark.catalog import load_tables
from pinot_spark.sources import IngestionPipeline, read_table, write_segments
from tests.conftest import SF_DIR
from pinot_spark.sources.ingestion import conform_to_schema


def test_ingestion_pipeline_full(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "good row", 10.0, None, "2024-01-05 00:00:00"),
            (2, "drop me", 5.0, 7.0, "2024-01-06 00:00:00"),
            (3, "late row", 2.0, 1.0, "2030-01-01 00:00:00"),  # time-invalid
            (4, "x" * 50, 8.0, 2.0, "2024-01-07 00:00:00"),
        ],
        ["id", "txt", "val", "maybe", "ts_str"],
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))

    pipe = IngestionPipeline(
        filter_expr="txt = 'drop me'",
        transforms={
            "val2": ("mult", "val", F.lit(2.0)),   # Pinot-fn transform
            "day": "date_trunc('day', ts)",        # SQL-expr transform
        },
        null_defaults={"maybe": -1.0},
        max_string_length=10,
        time_validation=("ts", "2024-01-01", "2024-12-31"),
    )
    out = pipe.apply(df).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 4]
    assert out[0]["maybe"] == -1.0          # defaultNullValue materialized
    assert out[0]["val2"] == 20.0
    assert len(out[1]["txt"]) == 10         # sanitized
    assert str(out[0]["day"]).startswith("2024-01-05")


def test_ingestion_unnest_and_rollup(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 2]), ("b", [3])], ["k", "vals"]
    )
    pipe = IngestionPipeline(unnest=["vals"])
    flat = pipe.apply(df)
    assert flat.count() == 4  # ComplexTypeTransformer-style unnest

    rollup = IngestionPipeline(
        unnest=["vals"],
        rollup=(["k"], {"total": ("sum", "vals"), "n": ("count", "vals")}),
    )
    rows = {r["k"]: (r["total"], r["n"]) for r in rollup.apply(df).collect()}
    assert rows == {"a": (5.0, 3), "b": (3.0, 1)}


def test_schema_conforming_overflow(spark):
    df = spark.createDataFrame([(1, "x", 9.5)], ["id", "name", "extra_metric"])
    out = conform_to_schema(df, "id BIGINT, name STRING, missing_col INT").collect()[0]
    assert out["id"] == 1 and out["name"] == "x" and out["missing_col"] is None
    assert "extra_metric" in out["__overflow"]  # undeclared → JSON overflow


def test_format_readers(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "tag"])
    for fmt in ["parquet", "orc", "csv", "json"]:
        p = str(tmp_path / fmt)
        df.write.format(fmt if fmt != "csv" else "csv").option("header", "true").save(p)
        back = read_table(spark, p, fmt)
        assert back.count() == 2
        assert {r["id"] for r in back.collect()} == {1, 2}


def test_arrow_reader(spark, tmp_path):
    """Arrow IPC input format: file + stream variants decode distributed
    (binaryFile → pyarrow in mapInPandas) with schema from one footer."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from pinot_spark.sources.readers import read_table

    tbl = pa.table({"id": pa.array([1, 2, 3], pa.int64()), "tag": ["a", "b", "c"]})
    fpath = tmp_path / "part0.arrow"
    with ipc.new_file(str(fpath), tbl.schema) as w:
        w.write_table(tbl)
    spath = tmp_path / "part1.arrow"
    with open(spath, "wb") as f, ipc.new_stream(f, tbl.schema) as w:
        w.write_table(tbl)
    back = read_table(spark, str(tmp_path), "arrow")
    assert back.count() == 6
    assert sorted(r["id"] for r in back.collect()) == [1, 1, 2, 2, 3, 3]
    assert back.schema.simpleString() == "struct<id:bigint,tag:string>"


def test_avro_reader_pure(spark, tmp_path):
    """Avro OCF through the pure-stdlib decoder (the spark-avro jar is
    absent here, so read_table('avro') exercises the fallback): all six
    spec codecs — null, deflate, snappy (pyarrow), bzip2/xz (stdlib),
    zstandard (pyarrow + frame-header size parse) — nullable unions,
    arrays, enums."""
    from pinot_spark.sources.avrocodec import iter_records, write_ocf
    from pinot_spark.sources.readers import read_table

    schema = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
        ],
    }
    records = [
        {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"], "kind": "A",
         "attrs": {"k1": 7, "k2": -3}},
        {"id": 2, "name": None, "score": -2.25, "tags": [], "kind": "B",
         "attrs": {}},
    ]
    for codec in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        buf = write_ocf(schema, records, codec=codec)
        assert list(iter_records(buf)) == records  # codec roundtrip
    p = tmp_path / "part0.avro"
    p.write_bytes(write_ocf(schema, records))
    back = read_table(spark, str(p), "avro")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["tags"] == ["x", "y"] and rows[1]["kind"] == "A"
    assert rows[2]["name"] is None and rows[2]["score"] == -2.25
    assert back.schema["name"].dataType.simpleString() == "string"


def test_clp_log_reader(spark, tmp_path):
    """clp-log input format: JSON events land CLP-encoded; clpDecode
    reassembles the exact original message (lossless contract)."""
    import json as _json

    from pinot_spark.operators.clp import clp_decode
    from pinot_spark.sources.readers import read_clp_log

    msgs = [
        "Task task-1234 finished in 3.5 s on host web-07.prod",
        "GET /api/v2/users/9981 took 12 ms status 200",
    ]
    p = tmp_path / "events.json"
    p.write_text("\n".join(_json.dumps({"level": "INFO", "message": m}) for m in msgs))
    df = read_clp_log(spark, str(p))
    assert "message" not in df.columns and "message_logtype" in df.columns
    back = df.select(
        clp_decode("message_logtype", "message_dictionaryVars", "message_encodedVars").alias("m")
    ).collect()
    assert sorted(r.m for r in back) == sorted(msgs)


def test_thrift_decode(spark):
    """Thrift TBinaryProtocol structs decoded against a field-id spec;
    unknown fields skipped by wire type, containers recurse."""
    from pinot_spark.sources.readers import decode_thrift
    from pinot_spark.sources.thriftcodec import decode_struct, encode_struct

    rec = encode_struct(
        [(1, 42), (2, "hello"), (3, 2.5), (4, ["a", "b"]),
         (5, {"k": 7}), (9, True)]  # 9 not in spec → skipped
    )
    assert decode_struct(rec, {1: "id", 2: "msg", 4: "tags", 5: "attrs"}) == {
        "id": 42, "msg": "hello", "tags": ["a", "b"], "attrs": {"k": 7}
    }
    df = spark.createDataFrame([(bytearray(rec),)], "value binary")
    out = decode_thrift(
        df, "value", {1: "id", 2: "msg", 4: "tags"},
        "id bigint, msg string, tags array<string>",
    ).collect()[0]
    assert out.id == 42 and out.msg == "hello" and out.tags == ["a", "b"]


def test_confluent_avro_decode(spark):
    """Confluent wire format: magic 0 + BE schema id + avro body, decoded
    against a locally-supplied id→schema map (kafka-value shape)."""
    import io

    from pinot_spark.sources.avrocodec import _encode_value
    from pinot_spark.sources.readers import decode_confluent_avro

    schema = {
        "type": "record", "name": "E",
        "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": "long"},
        ],
    }

    def wire(rec, sid=7):
        w = io.BytesIO()
        _encode_value(w, schema, rec)
        return b"\x00" + sid.to_bytes(4, "big") + w.getvalue()

    df = spark.createDataFrame(
        [(bytearray(wire({"k": "a", "v": 1})),), (bytearray(wire({"k": "b", "v": -9})),)],
        "value binary",
    )
    out = {r.k: r.v for r in decode_confluent_avro(df, "value", {7: schema}).collect()}
    assert out == {"a": 1, "b": -9}


def test_bson_reader(spark, tmp_path):
    """BSON input format: encode→decode roundtrip through the distributed
    reader, schema-conformed (extra keys dropped, missing null)."""
    from pinot_spark.sources.bsoncodec import decode_document, encode_document
    from pinot_spark.sources.readers import read_table

    docs = [
        {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"], "extra": 9},
        {"id": 2**40, "name": "b", "score": None},
    ]
    raw = b"".join(encode_document(d) for d in docs)
    # codec roundtrip incl. nested list
    assert decode_document(encode_document(docs[0]))["tags"] == ["x", "y"]
    p = tmp_path / "dump.bson"
    p.write_bytes(raw)
    back = read_table(
        spark, str(p), "bson",
        schema="id bigint, name string, score double, tags array<string>",
    )
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "a" and rows[1]["tags"] == ["x", "y"]
    assert rows[2**40]["score"] is None and rows[2**40]["tags"] is None
    assert "extra" not in back.columns


def test_protobuf_reader(spark, tmp_path):
    """Protobuf input format (pinot-plugins/pinot-input-format/
    pinot-protobuf): decode via spark-protobuf's from_protobuf. The
    artifact is not bundled in this container, so the roundtrip is
    skipped when absent — the surface contract (clear error, not a
    mid-query failure) is asserted either way."""
    import pytest

    from pinot_spark.sources.readers import decode_protobuf

    payload = spark.createDataFrame([(bytearray(b"\x08\x01"),)], "content binary")
    desc = tmp_path / "msg.desc"
    desc.write_bytes(b"")  # placeholder descriptor set
    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="spark-protobuf"):
            decode_protobuf(payload, "content", "M", str(desc))
        pytest.skip("spark-protobuf artifact not on classpath")
    try:
        out = decode_protobuf(payload, "content", "M", str(desc))
        out.collect()
    except RuntimeError as e:
        assert "spark-protobuf" in str(e)
        pytest.skip("spark-protobuf artifact not on classpath")


def test_write_segments_layout_and_pruning(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pinot_spark.catalog import _normalize_nanos

    events = _normalize_nanos(events)
    path = str(tmp_path / "seg")
    write_segments(events, path, time_col="ts", time_bucket="day", sort_cols=["user_id"])
    # partition dirs exist (TimeSegmentPruner analog)
    assert any(d.startswith("__seg_time=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # time-range query only reads matching partitions: check partition filter in plan
    plan = back.filter(F.col("__seg_time") == "2024-01-05")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__seg_time" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_colocated_join(spark):
    """Join of two tables bucketed on the same key runs with no shuffle
    exchange (the SegmentPartitionConfig / colocated-join analog)."""
    import shutil

    from pinot_spark.sources.segments import write_bucketed_table

    for tbl in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    t = load_tables(spark, SF_DIR)
    write_bucketed_table(
        t["orders"], "orders_bkt", bucket_cols=["o_orderkey"], num_buckets=4
    )
    write_bucketed_table(
        t["lineitem"], "lineitem_bkt", bucket_cols=["l_orderkey"], num_buckets=4
    )
    joined = (
        spark.table("orders_bkt")
        .hint("merge")  # force sort-merge path so bucketing is load-bearing
        .join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the only exchange allowed is the group-by's; neither join side
    # re-shuffles on the join key (bucketing satisfies the requirement)
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:2000]
    assert joined.count() > 0


def test_ingestion_enrichment(spark):
    """EnrichmentConfig analog: broadcast-dim lookup enrich in the
    ingestion pipeline (recordtransformer/enricher/)."""
    t = load_tables(spark, SF_DIR)
    pipe = IngestionPipeline(
        enrichments=[(t["nation"], ["n_nationkey"], ["n_name"])],
    )
    out = pipe.apply(
        t["customer"].withColumnRenamed("c_nationkey", "n_nationkey")
    )
    assert "n_name" in out.columns
    row = out.filter(F.col("c_custkey") == 1).collect()[0]
    assert row["n_name"].startswith("NATION_")
    assert out.count() == t["customer"].count()  # left enrich keeps all rows
