"""Batch input formats (reference: pinot-plugins/pinot-input-format/* —
avro, csv, json, parquet, orc, protobuf, thrift, arrow record readers).

Spark-first: every format is a `spark.read.format(...)` — the record-
reader plugin SPI collapses to the DataSource V2 API. Formats whose
connector jar is not on the classpath (avro, protobuf in this container)
raise a clear error instead of failing mid-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# format name → (spark format, default options)
FORMATS = {
    "parquet": ("parquet", {}),
    "orc": ("orc", {}),
    "csv": ("csv", {"header": "true", "inferSchema": "true"}),
    "json": ("json", {}),
    "text": ("text", {}),
    # needs the spark-avro artifact on the classpath:
    "avro": ("avro", {}),
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read a batch table in any supported input format.

    Schema may be a StructType or DDL string (Pinot requires a declared
    schema per table — pass it for schema-strict ingestion; omit for
    inference where the format supports it).
    """
    fmt = fmt.lower()
    if fmt == "arrow":
        return read_arrow(spark, path, **options)
    if fmt == "bson":
        return read_bson(spark, path, schema, **options)
    if fmt not in FORMATS:
        raise ValueError(
            f"unsupported format {fmt!r}; supported: "
            f"{sorted(FORMATS) + ['arrow', 'bson']}"
        )
    spark_fmt, defaults = FORMATS[fmt]
    reader = spark.read.format(spark_fmt)
    for k, v in {**defaults, **options}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:
        if fmt == "avro" and "Failed to find" in str(e):
            # spark-avro artifact absent → pure-stdlib OCF decoder
            # (sources/avrocodec.py): functional fallback, JVM source
            # preferred at scale
            return read_avro_pure(spark, path)
        raise


def read_arrow(spark: SparkSession, path: str, **_options) -> DataFrame:
    """Arrow IPC files (.arrow / Feather V2 — reference:
    pinot-plugins/pinot-input-format arrow record reader).

    Distributed shape: ``binaryFile`` lists the files and ships each
    file's bytes to an executor; pyarrow decodes there inside
    ``mapInPandas`` (Arrow stays Arrow across the Python boundary — no
    row-at-a-time work). The driver only opens ONE file footer to learn
    the schema; executors never funnel data through the driver, so the
    reader scales with the file count, not total bytes. Very large
    single files belong in parquet/orc (splittable); Arrow IPC is a
    file-at-a-time exchange format.
    """
    import glob
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from pyspark.sql.pandas.types import from_arrow_schema

    matches = sorted(
        glob.glob(os.path.join(path, "*.arrow"))
        + glob.glob(os.path.join(path, "*.feather"))
    ) or ([path] if os.path.isfile(path) else [])
    if not matches:
        raise FileNotFoundError(f"no .arrow/.feather files under {path!r}")

    def _open(buf: bytes):
        try:
            return ipc.open_file(pa.BufferReader(buf))
        except pa.ArrowInvalid:  # stream format (no footer)
            return ipc.open_stream(pa.BufferReader(buf))

    with open(matches[0], "rb") as f:
        sample = _open(f.read())
    spark_schema = from_arrow_schema(sample.schema)

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                reader = _open(bytes(content))
                if hasattr(reader, "num_record_batches"):
                    it = (
                        reader.get_batch(i)
                        for i in range(reader.num_record_batches)
                    )
                else:
                    it = iter(reader)
                for rb in it:
                    yield rb.to_pandas()

    raw = spark.read.format("binaryFile").load(
        [os.path.abspath(m) for m in matches]
    )
    return raw.select("content").mapInPandas(_decode, schema=spark_schema)


def read_avro_pure(spark: SparkSession, path: str) -> DataFrame:
    """Avro Object Container Files via the pure-stdlib decoder
    (sources/avrocodec.py — null/deflate codecs). Distributed shape
    mirrors read_arrow: binaryFile ships file bytes, executors decode in
    mapInPandas; the driver reads ONE header for the schema."""
    import glob
    import os

    import pandas as pd

    from pinot_spark.sources.avrocodec import (
        iter_records,
        read_header,
        schema_to_spark_ddl,
    )

    matches = sorted(glob.glob(os.path.join(path, "*.avro"))) or (
        [path] if os.path.isfile(path) else []
    )
    if not matches:
        raise FileNotFoundError(f"no .avro files under {path!r}")
    with open(matches[0], "rb") as f:
        schema_json, _sync, _pos = read_header(f.read())
    schema_json.pop("__codec__", None)
    ddl = schema_to_spark_ddl(schema_json)
    names = [f.split(" ")[0] for f in ddl.split(", ")]

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                recs = list(iter_records(bytes(content)))
                yield pd.DataFrame({n: [r.get(n) for r in recs] for n in names})

    raw = spark.read.format("binaryFile").load([os.path.abspath(m) for m in matches])
    return raw.select("content").mapInPandas(_decode, schema=ddl)


def read_clp_log(
    spark: SparkSession,
    path: str,
    message_fields: tuple[str, ...] = ("message",),
    keep_original: bool = False,
    **options,
) -> DataFrame:
    """CLP log input format (reference: pinot-plugins/pinot-input-format/
    pinot-clp-log CLPLogRecordExtractor): JSON log events whose message
    fields are CLP-encoded at ingest — each named field becomes
    ``<f>_logtype`` / ``<f>_dictionaryVars`` / ``<f>_encodedVars``
    columns (operators/clp.py), the storage shape Pinot's clp-log tables
    query with clpDecode/clpMatch."""
    from pinot_spark.operators.clp import clp_encode_df

    df = read_table(spark, path, "json", **options)
    for f_ in message_fields:
        df = clp_encode_df(df, f_)
    return df if keep_original else df.drop(*message_fields)


def decode_confluent_avro(
    df: DataFrame,
    col: str,
    schemas_by_id: dict[int, dict],
    out_prefix: str = "",
) -> DataFrame:
    """Confluent Schema-Registry wire format (reference:
    pinot-plugins/pinot-input-format confluent-avro stream decoder):
    each message is ``0x00 + int32(BE schema id) + avro binary body``.

    ``schemas_by_id`` maps registry ids to Avro record schemas (JSON
    dicts) — supplied locally, since this engine does not call a
    registry service over the network. All mapped schemas must share the
    top-level field set (standard compatible-evolution situation);
    decode happens executor-side in mapInPandas via the pure-stdlib
    avro codec."""
    import pandas as pd

    from pinot_spark.sources.avrocodec import _Reader, _decode_value
    from pinot_spark.sources.avrocodec import schema_to_spark_ddl

    first = next(iter(schemas_by_id.values()))
    ddl = schema_to_spark_ddl(first)
    names = [f.split(" ")[0] for f in ddl.split(", ")]

    def _decode(batches):
        for pdf in batches:
            recs = []
            for payload in pdf[col]:
                b = bytes(payload)
                if not b or b[0] != 0:
                    raise ValueError("not Confluent wire format (magic != 0)")
                sid = int.from_bytes(b[1:5], "big")
                schema = schemas_by_id.get(sid)
                if schema is None:
                    raise KeyError(f"schema id {sid} not in supplied registry map")
                r = _Reader(b)
                r.pos = 5
                recs.append(_decode_value(r, schema))
            yield pd.DataFrame({n: [rec.get(n) for rec in recs] for n in names})

    return df.select(col).mapInPandas(_decode, schema=ddl)


def decode_thrift(
    df: DataFrame,
    col: str,
    field_spec: dict[int, str],
    schema: StructType | str,
) -> DataFrame:
    """Decode a binary column of Thrift TBinaryProtocol structs
    (reference: pinot-plugins/pinot-input-format/pinot-thrift
    ThriftRecordReader — its generated-TBase class collapses to a
    ``{field_id: name}`` spec here). Unknown field ids are skipped by
    wire type; decoded records are conformed to the declared schema.
    Executor-side via mapInPandas, like the other binary decoders."""
    import pandas as pd

    from pinot_spark.sources.thriftcodec import decode_struct

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    names = [f.name for f in schema.fields]

    def _decode(batches):
        for pdf in batches:
            recs = [decode_struct(bytes(p), field_spec) for p in pdf[col]]
            yield pd.DataFrame({n: [r.get(n) for r in recs] for n in names})

    return df.select(col).mapInPandas(_decode, schema=schema)


def read_bson(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    **_options,
) -> DataFrame:
    """BSON files (mongodump layout: concatenated documents — reference:
    pinot-plugins/pinot-input-format BSON record reader), decoded by the
    pure-stdlib codec in sources/bsoncodec.py.

    BSON is schemaless, so a declared schema is REQUIRED (Pinot requires
    one per table anyway); decoded documents are conformed to it — extra
    keys dropped, missing keys null. Distributed shape mirrors
    read_arrow: binaryFile ships file bytes, executors decode in
    mapInPandas."""
    import pandas as pd

    if schema is None:
        raise ValueError("bson requires a declared schema (BSON is schemaless)")

    from pinot_spark.sources.bsoncodec import iter_documents

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    names = [f.name for f in schema.fields]

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                docs = list(iter_documents(bytes(content)))
                yield pd.DataFrame(
                    {n: [d.get(n) for d in docs] for n in names}
                )

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("content").mapInPandas(_decode, schema=schema)


def decode_protobuf(
    df: DataFrame,
    col: str,
    message_name: str,
    desc_file_path: str,
    options: dict | None = None,
    out_col: str = "record",
) -> DataFrame:
    """Decode a binary column of serialized protobuf messages into a
    struct column (reference: pinot-plugins/pinot-input-format/
    pinot-protobuf ProtoBufRecordReader + ProtoBufMessageDecoder — the
    stream-decoder shape, where each payload is one message described by
    a compiled FileDescriptorSet).

    Spark-first: ``from_protobuf`` (spark-protobuf module) does the
    decode JVM-side with the descriptor-set file shipped to executors —
    no Python per-row. Requires the org.apache.spark:spark-protobuf
    artifact; raises a clear error when it is absent (this container
    does not bundle it)."""
    import pyspark.sql.functions as F

    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "protobuf decode requires pyspark.sql.protobuf (spark-protobuf "
            "artifact on the session classpath via spark.jars.packages)"
        ) from e
    try:
        return df.withColumn(
            out_col,
            from_protobuf(
                F.col(col), message_name, descFilePath=desc_file_path,
                options=options or {},
            ),
        )
    except Exception as e:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "protobuf decode requires the org.apache.spark:spark-protobuf "
            "artifact on the session classpath (spark.jars.packages); "
            f"underlying error: {e}"
        ) from e


def read_protobuf(
    spark: SparkSession,
    path: str,
    message_name: str,
    desc_file_path: str,
    **options,
) -> DataFrame:
    """Read files of serialized protobuf messages (one message per file,
    the ``binaryFile`` source) and decode them via :func:`decode_protobuf`.
    For message-per-record streams (kafka value column), call
    :func:`decode_protobuf` on the binary column directly."""
    raw = spark.read.format("binaryFile").load(path)
    return decode_protobuf(
        raw, "content", message_name, desc_file_path, options or None
    ).select("path", "record.*")
