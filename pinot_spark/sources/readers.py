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
