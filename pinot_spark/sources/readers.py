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
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {sorted(FORMATS)}")
    spark_fmt, defaults = FORMATS[fmt]
    reader = spark.read.format(spark_fmt)
    for k, v in {**defaults, **options}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:  # pragma: no cover - depends on classpath
        if fmt == "avro" and "Failed to find" in str(e):
            raise RuntimeError(
                "avro requires the org.apache.spark:spark-avro artifact on the "
                "session classpath (spark.jars.packages)"
            ) from e
        raise


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
