"""Realtime ingestion on Structured Streaming.

Reference semantics:
- Stream consumption into queryable segments:
  pinot-core/.../data/manager/realtime/RealtimeSegmentDataManager.java:129
  (per-partition consumers, immediately-queryable mutable segments).
  Spark: micro-batch sink to parquet/Delta; freshness = trigger interval.
- Stream sources: pinot-plugins/pinot-stream-ingestion/{kafka,kinesis,
  pulsar} → `spark.readStream.format("kafka")` etc. Tests use file
  streams (deterministic, no broker in this container).
- Upsert at ingest (UpsertConfig.java:36): latest row per PK queryable.
  Spark: foreachBatch merge keeping max-comparison row per key.
- Dedup at ingest (dedup/ConcurrentMapPartitionDedupMetadataManager.java):
  `dropDuplicates` within the watermark.
- Ingestion-time aggregation (AggregationConfig): watermarked windowed
  aggregation — Pinot has no query-time watermarks, so this surface is
  strictly richer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pinot_spark.operators.upsert import upsert_view


def stream_source(
    spark: SparkSession,
    stream_type: str,
    decoder: str | None = None,
    decoder_args: dict | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Pinot streamConfigs → readStream mapping (reference:
    pinot-spi/.../stream/StreamConfig.java `streamType` +
    `stream.<type>.decoder.class.name`):

    - ``kafka`` → ``format("kafka")`` (kafka-3.0/4.0 plugins);
      ``kinesis``/``pulsar`` → their connector formats (clear error if
      the connector jar is absent);
    - ``file``/``rate`` → built-in test/dev sources;
    - ``decoder`` applies a message decoder to the ``value`` column the
      way Pinot's StreamMessageDecoder does: ``json`` (from_json with
      declared schema), ``confluent_avro``, ``thrift``, ``protobuf``
      (sources/readers.py decoders — batch twins of the stream shape).

    Decoders that need per-record Python (confluent/thrift) are applied
    by the caller on the micro-batch inside foreachBatch — this factory
    returns the raw stream plus attaches ``.decode`` metadata via
    closure-free convention: use ``decode_stream_batch`` in the sink.
    """
    fmt = {"kafka": "kafka", "kinesis": "kinesis", "pulsar": "pulsar",
           "file": options.pop("file_format", "json"), "rate": "rate"}.get(
        stream_type.lower()
    )
    if fmt is None:
        raise ValueError(f"unknown stream type {stream_type!r}")
    path = options.pop("path", None)
    reader = spark.readStream.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None and stream_type.lower() == "file":
        reader = reader.schema(schema)
    try:
        df = reader.load(path) if path is not None else reader.load()
    except Exception as e:
        if fmt in ("kinesis", "pulsar"):
            raise RuntimeError(
                f"{fmt} requires its Spark connector on the classpath "
                "(reference plugin: pinot-stream-ingestion/pinot-" + fmt + ")"
            ) from e
        raise
    if decoder == "json" and schema is not None and stream_type.lower() != "file":
        df = df.select(
            F.from_json(F.col("value").cast("string"), schema).alias("r")
        ).select("r.*")
    return df


def decode_stream_batch(
    batch: DataFrame, decoder: str, **args
) -> DataFrame:
    """Apply a Pinot stream-message decoder to a micro-batch's binary
    ``value`` column inside foreachBatch (confluent_avro / thrift /
    protobuf — the batch decoders in sources/readers.py)."""
    from pinot_spark.sources import readers as R

    if decoder == "confluent_avro":
        return R.decode_confluent_avro(batch, "value", args["schemas_by_id"])
    if decoder == "thrift":
        return R.decode_thrift(batch, "value", args["field_spec"], args["schema"])
    if decoder == "protobuf":
        return R.decode_protobuf(
            batch, "value", args["message_name"], args["desc_file_path"]
        )
    raise ValueError(f"unknown stream decoder {decoder!r}")


def start_realtime_ingest(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str] | None = None,
    comparison: list[str] | None = None,
    trigger_seconds: float | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Consume a stream into a queryable parquet table.

    Without keys: plain append (the OFFLINE-segment-commit analog).
    With keys+comparison: upsert semantics — each micro-batch is reduced
    to latest-per-key before append; readers apply the same upsert_view
    for cross-batch resolution (batch-boundary consistency; Pinot's
    consistent-view delta documented in SURVEY.md §7 risks).
    """

    def _write_batch(batch: DataFrame, batch_id: int) -> None:
        out = batch
        if keys:
            out = upsert_view(batch, keys=keys, comparison=comparison or keys)
        out.write.mode("append").parquet(path)

    writer = stream.writeStream.foreachBatch(_write_batch).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def realtime_table(spark: SparkSession, path: str, keys=None, comparison=None) -> DataFrame:
    """Queryable view over the realtime sink; applies upsert resolution
    across micro-batches when keys are given."""
    df = spark.read.parquet(path)
    if keys:
        df = upsert_view(df, keys=keys, comparison=comparison or keys)
    return df


def streaming_dedup(
    stream: DataFrame, keys: list[str], event_time: str, watermark: str = "1 hour"
) -> DataFrame:
    """Ingestion dedup: drop repeated PKs within the watermark horizon
    (state is bounded by the watermark — the streaming analog of Pinot's
    metadataTTL dedup)."""
    return stream.withWatermark(event_time, watermark).dropDuplicates(keys)


def streaming_window_agg(
    stream: DataFrame,
    event_time: str,
    window: str,
    aggs: dict[str, tuple[str, str]],
    by: list[str] | None = None,
    watermark: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (ingestion-time
    AggregationConfig analog, plus true event-time late-data handling
    which Pinot lacks at query time).

    aggs: out_name → (agg_fn_name, column)."""
    from pinot_spark.functions.aggregate import agg_call

    w = F.window(event_time, window, slide) if slide else F.window(event_time, window)
    return (
        stream.withWatermark(event_time, watermark)
        .groupBy(*(by or []), w.alias("win"))
        .agg(*[agg_call(name, col).alias(out) for out, (name, col) in aggs.items()])
        .select(*(by or []), F.col("win.start").alias("window_start"), *aggs.keys())
    )


def hybrid_view(
    offline: DataFrame, realtime: DataFrame, time_col: str, boundary
) -> DataFrame:
    """Hybrid OFFLINE/REALTIME table: offline rows ≤ boundary UNION ALL
    realtime rows > boundary (TimeBoundaryConfig / broker
    TimeBoundaryManager)."""
    b = F.lit(boundary).cast("timestamp")
    return offline.filter(F.col(time_col) <= b).unionByName(
        realtime.filter(F.col(time_col) > b)
    )
