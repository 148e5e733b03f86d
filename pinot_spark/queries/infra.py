"""Infrastructure-surface queries: driver-gate evidence for the SURVEY
§2.1 rows that previously had repo-only tests — input-format roundtrips,
batch segment build + time pruning, skew-safe operators, result cursors,
and the ingestion transform pipeline. Registered behind the round-5
window; prime candidates for the round-6 rotation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.queries import dsum2, query

# per-process scratch dir: a fixed path would let two concurrent driver
# runs cross-contaminate each other's roundtrip artifacts; removed at
# interpreter exit so repeated runs don't accrete /tmp litter
_TMP = tempfile.mkdtemp(prefix="pinot_spark_infra_")
atexit.register(shutil.rmtree, _TMP, ignore_errors=True)


@query(
    "scan_format_roundtrip",
    oracle="""
    SELECT fmt, n_rows, key_sum FROM
      (SELECT count(*) AS n_rows, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation)
    CROSS JOIN (VALUES ('csv'), ('json'), ('orc'), ('parquet')) AS t(fmt)
    ORDER BY fmt
    """,
)
def scan_format_roundtrip(spark, sf_dir):
    """Input formats (§2.1, pinot-plugins/pinot-input-format): nation is
    written and read back through each batch format via
    sources/readers.read_table; every roundtrip must preserve row count
    and key checksum. avro/arrow/bson have their own codec paths tested
    in tests/test_ingestion.py (avro's JVM jar is absent here)."""
    from pinot_spark.sources.readers import read_table

    t = load_tables(spark, sf_dir)
    outs = []
    for fmt in ("csv", "json", "orc", "parquet"):
        path = os.path.join(_TMP, f"roundtrip_{fmt}")
        w = t["nation"].write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        back = read_table(spark, path, fmt)
        outs.append(
            back.agg(
                F.count("*").alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            ).select(F.lit(fmt).alias("fmt"), "n_rows", "key_sum")
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionAll(o)
    return df.orderBy("fmt")


@query(
    "segment_build_time_pruning",
    oracle="""
    SELECT count(*) AS n,
           round(sum(CAST(coalesce(value, 0.0) AS DECIMAL(38,6))), 2)::DOUBLE AS val_sum
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
    """,
)
def segment_build_time_pruning(spark, sf_dir):
    """Batch segment build + time pruning (§2.1,
    sources/segments.write_segments — the SegmentTimePruner analog):
    events land day-partitioned; a one-day read touches one partition
    (PartitionFilters, asserted in tests/test_ingestion.py) and must
    return exactly the source rows for that day."""
    from pinot_spark.sources.segments import write_segments

    t = load_tables(spark, sf_dir)
    path = os.path.join(_TMP, "seg_events")
    write_segments(t["events"], path, time_col="ts", time_bucket="day")
    back = spark.read.parquet(path).filter(F.col("__seg_time") == "2024-01-05")
    return back.agg(
        F.count("*").alias("n"),
        dsum2(F.coalesce(F.col("value"), F.lit(0.0))).alias("val_sum"),
    )


@query(
    "skew_safe_operators",
    oracle="""
    SELECT 'salted_join' AS op, c_mktsegment AS k, count(*) AS v
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'two_phase_dc' AS op, l_returnflag AS k, count(DISTINCT l_suppkey) AS v
    FROM lineitem GROUP BY l_returnflag
    ORDER BY op, k
    """,
)
def skew_safe_operators(spark, sf_dir):
    """Skew handling (§2.1, operators/skew.py): salting spreads a hot
    join key across num_salts replicas; two-phase distinct spreads a hot
    group across the (group, value) pair space. Both must be
    result-identical to the plain operators."""
    from pinot_spark.operators.skew import salted_join, two_phase_count_distinct

    t = load_tables(spark, sf_dir)
    dim = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = (
        salted_join(t["orders"], dim, on="o_custkey", num_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("v"))
        .select(F.lit("salted_join").alias("op"), F.col("c_mktsegment").alias("k"), "v")
    )
    dc = two_phase_count_distinct(
        t["lineitem"], ["l_returnflag"], "l_suppkey", out_col="v"
    ).select(F.lit("two_phase_dc").alias("op"), F.col("l_returnflag").alias("k"), "v")
    return joined.unionAll(dc).orderBy("op", "k")


@query(
    "cursor_result_table_pages",
    oracle="""
    SELECT 0 AS page, o_orderkey, o_totalprice FROM
      (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
       ORDER BY o_orderkey LIMIT 5)
    UNION ALL
    SELECT 1 AS page, o_orderkey, o_totalprice FROM
      (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
       ORDER BY o_orderkey LIMIT 5 OFFSET 5)
    ORDER BY page, o_orderkey
    """,
)
def cursor_result_table_pages(spark, sf_dir):
    """Result cursors (§2.1, pinot-spi/.../cursors/ — paginated broker
    results): two consecutive pages through PinotEngine.result_table
    must tile the ordered result with no gaps or overlaps. The pages are
    driver-side by nature (a cursor IS a driver surface); page size is
    bounded."""
    from pinot_spark.dialect import PinotEngine

    load_tables(spark, sf_dir)
    eng = PinotEngine(spark)
    sql = (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 10"
    )
    rows = []
    for page in (0, 1):
        rt = eng.result_table(sql, offset=page * 5, num_rows=5)
        for r in rt["resultTable"]["rows"]:
            rows.append((page, int(r[0]), float(r[1])))
    return spark.createDataFrame(
        rows, "page int, o_orderkey bigint, o_totalprice double"
    ).orderBy("page", "o_orderkey")


@query(
    "ingestion_pipeline_conform",
    oracle="""
    SELECT n_nationkey, substr(upper(n_name), 1, 12) AS name_u,
           substr(concat(n_name, '-', n_name), 1, 12) AS tagged, r_name
    FROM nation JOIN region ON r_regionkey = n_regionkey
    WHERE NOT (n_regionkey = 0)
    ORDER BY n_nationkey
    """,
)
def ingestion_pipeline_conform(spark, sf_dir):
    """Ingestion transform pipeline (§2.1/§1.4, sources/ingestion.py —
    IngestionConfig order: filter → transform → sanitize → enrich):
    FilterConfig DROPS matching rows, transforms add columns, the
    sanitizer truncates strings, and a broadcast enrichment joins the
    region dimension in."""
    from pinot_spark.sources.ingestion import IngestionPipeline

    t = load_tables(spark, sf_dir)
    pipe = IngestionPipeline(
        filter_expr="n_regionkey = 0",  # Pinot filterFunction: drop these
        transforms={
            "name_u": "upper(n_name)",
            "tagged": "concat(n_name, '-', n_name)",
            "r_regionkey": "n_regionkey",
        },
        max_string_length=12,  # sanitizer truncates every string column
        enrichments=[(t["region"], ["r_regionkey"], ["r_name"])],
    )
    out = pipe.apply(t["nation"])
    return out.select(
        "n_nationkey", "name_u", "tagged", "r_name"
    ).orderBy("n_nationkey")


@query(
    "stream_kafka_batch_decode",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_msgs,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def stream_kafka_batch_decode(spark, sf_dir):
    """Stream-source decode path without a broker (§2.1,
    pinot-spi/.../stream/StreamConfig.java decoder wiring +
    pinot-plugins confluent-avro stream decoder): nation rows are framed
    executor-side into Confluent wire-format messages (magic 0x00 +
    BE schema id + avro binary body) inside a kafka-shaped micro-batch
    (key/value/topic/partition/offset columns exactly as
    spark-sql-kafka emits them), then decoded back through the SAME
    decode_stream_batch used by the foreachBatch realtime sink, and
    aggregated. Encode and decode both run Arrow-batched in
    mapInPandas — no driver-side row loop, so the plan scales with
    partitions like a real consumer group."""
    import pandas as pd

    from pinot_spark.sources.avrocodec import _encode_value
    from pinot_spark.streaming.ingest import decode_stream_batch

    schema = {
        "type": "record",
        "name": "nation",
        "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long"},
        ],
    }
    schema_id = 7

    t = load_tables(spark, sf_dir)
    src = t["nation"].select("n_nationkey", "n_name", "n_regionkey")

    def _encode(batches):
        import io

        for pdf in batches:
            values = []
            for rec in pdf.to_dict("records"):
                w = io.BytesIO()
                _encode_value(w, schema, rec)
                values.append(
                    b"\x00" + schema_id.to_bytes(4, "big") + w.getvalue()
                )
            yield pd.DataFrame(
                {
                    "key": [str(k).encode() for k in pdf["n_nationkey"]],
                    "value": values,
                    "topic": ["nation"] * len(pdf),
                    "partition": (pdf["n_regionkey"] % 4).astype("int32"),
                    "offset": pdf["n_nationkey"].astype("int64"),
                }
            )

    kafka_shaped = src.mapInPandas(
        _encode,
        schema="key binary, value binary, topic string, partition int, offset long",
    )
    decoded = decode_stream_batch(
        kafka_shaped, "confluent_avro", schemas_by_id={schema_id: schema}
    )
    return (
        decoded.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


def _await_sink_rows(spark, q, sink: str, want: int, timeout_s: float) -> int:
    """Poll a foreachBatch parquet sink until ``want`` rows have landed.

    Fail-fast contract (VERDICT r7 #6): only the sink-not-yet-created
    race is tolerated (AnalysisException from the first read before the
    first batch commits); a terminated streaming query surfaces its own
    exception immediately instead of timing out, and an unmet deadline
    raises rather than letting the caller query a short table and
    mis-report the mismatch 60s later."""
    import time

    from pyspark.errors import AnalysisException

    landed = 0
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            landed = spark.read.parquet(sink).count()
        except AnalysisException:
            landed = 0  # sink directory not yet created by the first batch
        if landed >= want:
            return landed
        if not q.isActive:
            exc = q.exception()
            raise RuntimeError(
                f"streaming ingestion terminated after landing {landed} "
                f"of {want} rows: {exc if exc else 'stopped externally'}"
            )
        time.sleep(0.25)
    raise RuntimeError(
        f"streaming ingestion landed only {landed} of {want} rows "
        f"within {timeout_s:.0f}s"
    )



@query(
    "stream_rate_upsert_loop",
    # the landed table is fully determined by the value-derived rows
    # (value < 500, key = value % 50), independent of micro-batch
    # boundaries — the oracle regenerates it arithmetically
    oracle="""
    SELECT CAST(k AS BIGINT) AS key,
           CAST(k + 450 AS BIGINT) AS latest_val,
           CAST(10 AS BIGINT) AS n_versions
    FROM range(0, 50) t(k) ORDER BY key
    """,
)
def stream_rate_upsert_loop(spark, sf_dir):
    """LIVE realtime consumption loop (§2.7, reference
    pinot-core/.../realtime/RealtimeSegmentDataManager.java:129 —
    consume, commit, queryable): a real Structured Streaming query over
    the built-in rate source (no broker needed) runs micro-batches
    through foreachBatch, each batch committing its rows to the segment
    store (append, the consuming→committed segment lifecycle), until 500
    messages have landed; the stream is then stopped and the landed
    table is queried through the FULL-upsert view (latest value per
    key), proving ingestion → commit → queryable end-to-end.

    Determinism: every row derives from the rate source's monotonic
    ``value`` (key = value % 50, seq = value, value < 500), so the final
    upsert state is independent of wall clock, batch sizes and batch
    count; seq is the upsert comparison column exactly like a Kafka
    offset. Scale shape: foreachBatch appends columnar files per batch
    (the segment-commit analog), the upsert view is one shuffle on key.
    """
    import time

    from pinot_spark.catalog import ensure_runtime_confs
    from pinot_spark.operators.upsert import upsert_view

    # the only registered query that never reads the test tables — apply
    # the runtime confs itself so a vanilla driver session behaves the
    # same whether or not another query ran first
    ensure_runtime_confs(spark)
    sink = tempfile.mkdtemp(prefix="pinot_spark_rate_sink_")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 5000)
        .load()
        .where(F.col("value") < 500)
        .select(
            (F.col("value") % 50).alias("key"),
            F.col("value").alias("seq"),
        )
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _await_sink_rows(spark, q, sink, want=500, timeout_s=60)
    finally:
        q.stop()
    # localCheckpoint materializes the landed rows into Spark block
    # storage (eager), severing the plan's file dependency so the
    # mkdtemp sink can be deleted instead of leaking per run
    try:
        landed = (
            spark.read.parquet(sink)
            .where(F.col("seq") < 500)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    latest = upsert_view(landed, keys=["key"], comparison=["seq"])
    versions = landed.groupBy("key").agg(
        F.count_distinct("seq").alias("n_versions")
    )
    return (
        latest.join(versions, "key")
        .select(
            F.col("key").cast("long").alias("key"),
            F.col("seq").cast("long").alias("latest_val"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
        .orderBy("key")
    )


@query(
    "open_struct_dense_sparse",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_region0,
           CAST(sum(CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_not_region0,
           CAST(sum(event_id % 100) AS BIGINT) AS sum_latency,
           CAST(sum(event_id) AS BIGINT) AS sum_views,
           round(avg(event_id * 0.5), 4) AS avg_cpu,
           CAST(0 AS BIGINT) AS n_nonexistent
    FROM events
    """,
)
def open_struct_dense_sparse(spark, sf_dir):
    """OPEN_STRUCT type surface (SURVEY §1.2; pinot-spi
    OpenStructNaming.java / OpenStructTypeInference.java /
    OpenStructIndexConfig.java, OpenStructIngestionCommitTestBase
    query residue): an ingested map column splits into typed DENSE
    child columns (``metrics$views``...) under the maxDenseKeys budget
    and a shared SPARSE JSON column for the rest; ``metrics['key']``
    resolves dense -> materialized column, sparse -> JSON extraction,
    unknown -> manifest short-circuit (constant-folds to zero rows).

    The fixture mirrors the reference suite shape built
    deterministically from events columns (views=event_id,
    cpu=event_id*0.5, host/region/latencyMs modular), so the DuckDB
    oracle recomputes every answer from the base columns — the split +
    JSON round-trip must be value-transparent."""
    from pinot_spark.operators.open_struct import materialize_open_struct

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_id",
        F.create_map(
            F.lit("views"), F.col("event_id").cast("string"),
            F.lit("cpu"), (F.col("event_id") * 0.5).cast("string"),
            F.lit("host"), F.concat(F.lit("host-"), (F.col("event_id") % 5).cast("string")),
            F.lit("region"), F.concat(F.lit("region-"), (F.col("event_id") % 4).cast("string")),
            F.lit("latencyMs"), (F.col("event_id") % 100).cast("string"),
        ).alias("metrics"),
    )
    out, layout = materialize_open_struct(
        ev, "metrics",
        children={
            "views": "long", "cpu": "double", "host": "string",
            "region": "string", "latencyMs": "long",
        },
        dense_keys={"views", "cpu", "host"},
        max_dense_keys=3,
    )
    region = layout.key_column(None, "region")
    return out.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(region == "region-0", 1).otherwise(0)).alias("n_region0"),
        F.sum(F.when(region != "region-0", 1).otherwise(0)).alias("n_not_region0"),
        F.sum(layout.key_column(None, "latencyMs")).alias("sum_latency"),
        F.sum(layout.key_column(None, "views")).alias("sum_views"),
        F.round(F.avg(layout.key_column(None, "cpu")), 4).alias("avg_cpu"),
        F.sum(
            F.when(layout.key_column(None, "nonexistent_key") == "x", 1).otherwise(0)
        ).alias("n_nonexistent"),
    )


@query(
    "ingest_aggregate_metrics",
    oracle="""
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           round(sum(coalesce(value, 0.0)), 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY event_type, user_bucket
    ORDER BY event_type, user_bucket
    """,
)
def ingest_aggregate_metrics(spark, sf_dir):
    """aggregateMetrics ingest rollup (TableConfig indexingConfig
    aggregateMetrics / MutableSegmentImpl metric aggregation;
    AggregateMetricsTest.java): rows sharing the dimension tuple merge
    at ingest with pre-summed metrics, and every downstream aggregate
    answers identically to the raw table — the DuckDB oracle computes
    straight from the base rows."""
    from pinot_spark.sources.ingestion import aggregate_metrics

    t = load_tables(spark, sf_dir)
    base = t["events"].select(
        "event_type",
        (F.col("user_id") % 10).cast("bigint").alias("user_bucket"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    rolled = aggregate_metrics(
        base, ["event_type", "user_bucket"], {"value": "sum", "n_rows": "count"}
    )
    return rolled.select(
        "event_type",
        "user_bucket",
        F.round("value", 2).alias("sum_value"),
        "n_rows",
    ).orderBy("event_type", "user_bucket")


@query(
    "scan_segment_sampler",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events
    WHERE date_trunc('day', ts) = (SELECT min(date_trunc('day', ts)) FROM events)
    """,
)
def scan_segment_sampler(spark, sf_dir):
    """firstN table sampler (pinot-broker/.../tablesampler/
    FirstNSegmentsTableSampler.java; TableSamplerIntegrationTest): the
    events table written as day-partitioned segments (one file per day
    via a day-hash repartition), then the lexicographically FIRST
    segment — the earliest day — is the 1-segment sample.  The DuckDB
    oracle recomputes the same day's rows from the base table, so the
    sampler's routing must be exactly the first segment, no more, no
    less."""
    import os
    import tempfile

    from pinot_spark.sources.segments import sample_segments, write_segments

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "ts", "event_type")
    path = os.path.join(
        _TMP, f"sampler_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    write_segments(
        ev.repartition(F.date_trunc("day", F.col("ts"))),
        path,
        time_col="ts",
        time_bucket="day",
    )
    sampled = sample_segments(spark, path, 1)
    return sampled.agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("n_view"),
    )


@query(
    "stream_dedup_exact",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
           TRUE AS dedup_effective
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_exact(spark, sf_dir):
    """Streaming exact deduplication (§2.7 realtime + the LLM-pipeline
    dedup family: reference DedupConfig / ConcurrentMapPartitionDedup
    MetadataManager.java — drop records whose primary key was already
    seen): a Structured Streaming query over the events file source
    runs ``withWatermark + dropDuplicatesWithinWatermark`` on
    (event_type, user_id) — the state-bounded streaming dedup operator,
    where the watermark delay is the dedup horizon the reference's
    metadata-TTL plays — lands the survivors via foreachBatch, and the
    committed table is aggregated batch-side.

    Determinism: the horizon (60 days) covers the whole events time
    range, so exactly one survivor per key lands regardless of batch
    boundaries; the oracle recomputes distinct keys from the base
    table.  ``dedup_effective`` asserts the streaming state really
    dropped every duplicate (sink rows == distinct pairs)."""
    import time

    from pinot_spark.catalog import ensure_runtime_confs, load_tables

    ensure_runtime_confs(spark)
    t = load_tables(spark, sf_dir)  # registers views; also schema source
    schema = t["events"].schema
    sink = tempfile.mkdtemp(prefix="pinot_spark_dedup_sink_")
    # the file-stream source wants a DIRECTORY: expose the single
    # events.parquet through a symlinked landing dir (the Kafka-topic
    # directory analog)
    src_dir = tempfile.mkdtemp(prefix="pinot_spark_dedup_src_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        # the parquet carries TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["event_type", "user_id"])
    )
    # the dedup state shuffle picks up spark.sql.shuffle.partitions at
    # the first micro-batch of a fresh checkpoint — 200 default state
    # tasks for a small table is pure scheduler overhead; pin a bounded
    # count for this stream and restore the session conf afterwards
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
            )
            .trigger(availableNow=True)
            .start()
        )
        # a False return means the availableNow stream has NOT drained
        # within the timeout — fail loudly instead of aggregating a
        # partially-written sink into a silently-wrong answer
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "stream_dedup_exact: availableNow stream did not finish "
                "within 120s; sink is partial"
            )
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    try:
        landed = spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
    n_landed = landed.count()
    n_distinct = (
        t["events"].select("event_type", "user_id").distinct().count()
    )
    return (
        landed.groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("uniq_users"))
        .withColumn("dedup_effective", F.lit(n_landed == n_distinct))
        .orderBy("event_type")
    )


@query(
    "stream_text_match_realtime",
    oracle="""
    WITH toks AS (
        SELECT lang,
               list_contains(string_split_regex(lower(text), '[^a-z0-9]+'),
                             'vector') AS term_hit,
               list_contains(string_split_regex(lower(text), '[^a-z0-9]+'),
                             'spark') AS spark_hit
        FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_match,
           TRUE AS ingest_complete
    FROM toks
    WHERE term_hit AND NOT spark_hit
    GROUP BY lang ORDER BY lang
    """,
)
def stream_text_match_realtime(spark, sf_dir):
    """TEXT_MATCH answered through the REALTIME ingest path
    (TextIndicesRealtimeTest.java — the reference builds Lucene text
    indexes on consuming segments and the query results must equal the
    committed-segment answers): the documents table streams through a
    Structured Streaming file source, lands via foreachBatch (the
    consuming->committed segment handoff), and the same tokenized
    predicate (operators/lucene.compile_predicate — 'vector AND NOT
    spark') is evaluated over the landed table.  ``ingest_complete``
    pins that the stream delivered every row, so the counts are the
    batch answers exactly — the reference's realtime-equals-offline
    invariant."""
    from pinot_spark.catalog import ensure_runtime_confs
    from pinot_spark.operators.lucene import compile_predicate

    ensure_runtime_confs(spark)
    t = load_tables(spark, sf_dir)
    schema = t["documents"].schema
    sink = tempfile.mkdtemp(prefix="pinot_spark_tm_sink_")
    src_dir = tempfile.mkdtemp(prefix="pinot_spark_tm_src_")
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src_dir, "documents.parquet"),
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "stream_text_match_realtime: stream did not finish in 120s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    try:
        landed = spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
    complete = landed.count() == t["documents"].count()
    pred = compile_predicate("text", "vector AND NOT spark")
    return (
        landed.filter(pred)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_match"))
        .withColumn("ingest_complete", F.lit(complete))
        .orderBy("lang")
    )


@query(
    "scan_compression_stats",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_cols,
           TRUE AS some_column_compresses,
           TRUE AS none_ratio_is_1,
           TRUE AS snappy_beats_none,
           (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows
    """,
)
def scan_compression_stats(spark, sf_dir):
    """Per-column compression statistics from segment footers
    (CompressionStats{Offline,Realtime}IngestionIntegrationTest — the
    controller table-size API's compressionStats object): the events
    table written once with snappy and once uncompressed; footer-derived
    per-column compressed/uncompressed byte totals must show a real
    compression win on at least one column (snappy may legitimately
    EXPAND tiny dictionary-encoded pages by its framing overhead),
    ratio EXACTLY 1 for the uncompressed codec, and a strictly smaller
    total on-disk footprint for snappy — while the data reads back
    complete (n_rows pins no row was lost to either codec)."""
    from pinot_spark.sources.segments import (
        segment_compression_stats,
        write_segments,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type", "props")
    # a PER-CALL unique dir (not a fixed path keyed by sf tag): two
    # concurrent invocations — the driver gate and a pytest run share
    # this machine — must never write/read the same segment dir
    root = tempfile.mkdtemp(prefix="pinot_spark_cstats_")
    p_snappy = os.path.join(root, "snappy")
    p_none = os.path.join(root, "none")
    try:
        write_segments(ev, p_snappy, compression="snappy")
        write_segments(ev, p_none, compression="none")
        s = segment_compression_stats(p_snappy)
        n = segment_compression_stats(p_none)
        ratios_ok = (
            max(c["ratio"] for c in s["columns"].values()) > 1.2
            and len(s["columns"]) == 3
        )
        none_ok = all(
            c["compressed"] == c["uncompressed"]
            for c in n["columns"].values()
        )
        snappy_total = sum(c["compressed"] for c in s["columns"].values())
        none_total = sum(c["compressed"] for c in n["columns"].values())
        n_rows = spark.read.parquet(p_snappy).count()
        n_rows_none = spark.read.parquet(p_none).count()
    finally:
        # everything above is EAGER (footer reads + counts), so the
        # returned literal DataFrame has no file dependency left
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            len(s["columns"]), ratios_ok, none_ok,
            snappy_total < none_total,
            n_rows if n_rows == n_rows_none else -1,
        )],
        "n_cols bigint, some_column_compresses boolean, none_ratio_is_1 boolean, "
        "snappy_beats_none boolean, n_rows bigint",
    )


@query(
    "scan_encoding_independence",
    oracle="""
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
           TRUE AS footer_proves_encodings,
           TRUE AS encodings_agree,
           (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM events)
               AS n_types,
           (SELECT CAST(sum(event_id) AS BIGINT) FROM events) AS seg_sum_id,
           TRUE AS segments_packed,
           (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE event_id % 2 = 0) AS n_topic_a,
           (SELECT CAST(count(*) AS BIGINT) FROM events
             WHERE event_id % 2 = 1) AS n_topic_b,
           TRUE AS topics_isolated
    """,
)
def scan_encoding_independence(spark, sf_dir):
    """Umbrella for three reference storage-layer invariants (the r15
    suite-level residue, promoted to driver evidence):

    * RawForwardIndexWithDictionaryTest.java — the SAME query answers
      across a dictionary-encoded, a raw (PLAIN-page), and a raw+sorted
      parquet layout of the events table, with parquet-footer proof the
      layouts really differ (``footer_proves_encodings``): encoding is
      an access-path choice, never a semantics choice.
    * BigNumberOfSegmentsTest.java — the table fragmented into 200
      tiny single-row-group files still aggregates exactly
      (``seg_sum_id`` recomputed closed-form by the oracle) and the
      scan PACKS the small files instead of scheduling a task per file
      (``segments_packed``: read partitions < half the file count —
      the 100 TB small-file answer, files.maxPartitionBytes).
    * MultiTopicRealtimeClusterIntegrationTest.java — two disjoint
      "topics" (event_id parity slices) landed in separate dirs and
      read back as ONE union table keep per-source counts isolated
      (``n_topic_a``/``n_topic_b`` recomputed by the oracle from the
      base table) while the union total equals their sum.

    Everything is computed EAGERLY into one literal row, so the
    per-call scratch dir is deleted before returning."""
    import glob

    import pyarrow.parquet as pq

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type", "user_id")
    root = tempfile.mkdtemp(prefix="pinot_spark_encind_")
    try:
        p_dict = os.path.join(root, "dict")
        p_raw = os.path.join(root, "raw")
        p_sorted = os.path.join(root, "rawsorted")
        ev.coalesce(1).write.mode("overwrite").parquet(p_dict)
        (
            ev.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .parquet(p_raw)
        )
        (
            ev.coalesce(1)
            .sortWithinPartitions("event_type", "event_id")
            .write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .parquet(p_sorted)
        )

        def col_encodings(path: str, col: str) -> set[str]:
            f = sorted(glob.glob(path + "/*.parquet"))[0]
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            return set(md.row_group(0).column(idx).encodings)

        footer_ok = any(
            "DICTIONARY" in e for e in col_encodings(p_dict, "event_type")
        ) and not any(
            "DICTIONARY" in e for e in col_encodings(p_raw, "event_type")
        )

        def answers(path: str):
            d = spark.read.parquet(path)
            per_type = sorted(
                (r["event_type"], r["cnt"], r["s"])
                for r in d.groupBy("event_type")
                .agg(
                    F.count("*").alias("cnt"),
                    F.sum("event_id").alias("s"),
                )
                .collect()
            )
            filt = d.where(
                F.col("event_type").rlike("^[a-z_]+$")
                & (F.col("event_id") % 7 == 0)
            ).count()
            n_types = (
                d.select("event_type").distinct().count()
            )
            return (per_type, filt, n_types)

        a_dict, a_raw, a_sorted = (
            answers(p_dict), answers(p_raw), answers(p_sorted)
        )
        encodings_agree = a_dict == a_raw == a_sorted
        n_rows = spark.read.parquet(p_dict).count()
        n_types = a_dict[2]

        # BigNumberOfSegments: 200 tiny files, exact closed-form agg +
        # small-file packing
        p_segs = os.path.join(root, "segs")
        ev.repartition(200).write.mode("overwrite").parquet(p_segs)
        n_files = len(glob.glob(p_segs + "/*.parquet"))
        segs = spark.read.parquet(p_segs)
        seg_sum_id = segs.agg(F.sum("event_id")).first()[0]
        segments_packed = (
            n_files >= 150
            and segs.rdd.getNumPartitions() < n_files / 2
            and segs.count() == n_rows
        )

        # MultiTopic union isolation: two disjoint parity slices land
        # in separate dirs; the union table keeps per-source counts
        p_a = os.path.join(root, "topic_a")
        p_b = os.path.join(root, "topic_b")
        ev.where(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(p_a)
        ev.where(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(p_b)
        union = (
            spark.read.parquet(p_a).withColumn("source", F.lit("a"))
        ).unionByName(
            spark.read.parquet(p_b).withColumn("source", F.lit("b"))
        )
        per_src = {
            r["source"]: r["cnt"]
            for r in union.groupBy("source")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        n_a, n_b = per_src.get("a", 0), per_src.get("b", 0)
        topics_isolated = (
            n_a + n_b == n_rows
            and union.where(
                (F.col("source") == "a") & (F.col("event_id") % 2 == 1)
            ).count()
            == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(
            n_rows, footer_ok, encodings_agree, n_types, seg_sum_id,
            segments_packed, n_a, n_b, topics_isolated,
        )],
        "n_rows bigint, footer_proves_encodings boolean, "
        "encodings_agree boolean, n_types bigint, seg_sum_id bigint, "
        "segments_packed boolean, n_topic_a bigint, n_topic_b bigint, "
        "topics_isolated boolean",
    )


@query(
    "codec_surface_umbrella",
    oracle="""
    WITH codes AS (SELECT CAST(range AS INT) AS b FROM range(256)),
    mu AS (
        SELECT b, 255 - b AS u,
               (((255 - b) & 15) * 8 + 132)
                   * CAST(pow(2, ((255 - b) & 112) >> 4) AS INT) AS t
        FROM codes
    ),
    muval AS (
        SELECT b, CASE WHEN (u & 128) != 0 THEN 132 - t
                       ELSE t - 132 END AS v
        FROM mu
    ),
    al AS (
        SELECT b, xor(b, 85) AS a,
               (xor(b, 85) & 112) >> 4 AS seg,
               (xor(b, 85) & 15) * 16 AS base
        FROM codes
    ),
    alval AS (
        SELECT b, CASE WHEN (a & 128) != 0 THEN t ELSE -t END AS v
        FROM (
            SELECT b, a,
                   CASE WHEN seg = 0 THEN base + 8
                        WHEN seg = 1 THEN base + 264
                        ELSE (base + 264)
                             * CAST(pow(2, seg - 1) AS INT)
                   END AS t
            FROM al
        )
    ),
    px AS (
        SELECT (x * 5 + y * 11) % 64 AS i
        FROM range(16) t1(x) CROSS JOIN range(16) t2(y)
    )
    SELECT (SELECT CAST(sum(v) AS BIGINT) FROM muval) AS g711_mu_sum,
           (SELECT CAST(max(abs(v)) AS INT) FROM muval) AS g711_mu_peak,
           (SELECT CAST(sum(v) AS BIGINT) FROM alval) AS g711_a_sum,
           (SELECT CAST(max(abs(v)) AS INT) FROM alval) AS g711_a_peak,
           (SELECT CAST(sum((i * 7) % 256) AS BIGINT) FROM px) AS png_sum_r,
           (SELECT CAST(sum((i * 13) % 256) AS BIGINT) FROM px) AS png_sum_g,
           (SELECT CAST(sum((i * 29) % 256) AS BIGINT) FROM px) AS png_sum_b,
           TRUE AS gzip_compresses, TRUE AS lz4_compresses,
           (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows
    """,
)
def codec_surface_umbrella(spark, sf_dir):
    """Umbrella driver row for the post-freeze round-16 surface (r16
    verdict item #3): (1) G.711 mu-law AND A-law expansion — WAVs
    carrying all 256 code bytes decode through functions/wavcodec.py
    and the oracle recomputes the ITU-T expansion CLOSED-FORM in SQL
    (sum + peak over the full code space pins every table entry);
    (2) paletted PNG (color type 3) — a hand-built PLTE file from an
    integer formula decodes through functions/imagecodec.py and the
    oracle recomputes the channel sums from the palette formula;
    (3) the gzip/lz4 segment codec matrix — the events table written
    with gzip, lz4 and uncompressed must show a real footprint win for
    BOTH codecs with zero row loss (footer-derived totals, same
    methodology as scan_compression_stats).

    Scale shape: the umbrella pattern — eager single-machine proof
    emits one literal row; the codecs under proof run executor-side in
    the multimodal rows, and the segment writers are ordinary
    distributed parquet writes."""
    import struct
    import zlib

    import numpy as np

    from pinot_spark.functions.imagecodec import decode as img_decode
    from pinot_spark.functions.wavcodec import decode_wav
    from pinot_spark.sources.segments import (
        segment_compression_stats,
        write_segments,
    )

    # --- G.711: all 256 codes through real WAV containers ---
    raw = bytes(range(256))

    def g711_wav(tag: int) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 256) + raw
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    mu, _ = decode_wav(g711_wav(7))
    alaw, _ = decode_wav(g711_wav(6))
    mu64 = mu[:, 0].astype(np.int64)
    a64 = alaw[:, 0].astype(np.int64)

    # --- paletted PNG: hand-built color-type-3 file ---
    pal = bytes(
        v for i in range(64)
        for v in ((i * 7) % 256, (i * 13) % 256, (i * 29) % 256)
    )
    idx = np.fromfunction(
        lambda y, x: (x * 5 + y * 11) % 64, (16, 16)
    ).astype(np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(16))

    def chunk(tag: bytes, body: bytes) -> bytes:
        c = tag + body
        return (
            struct.pack(">I", len(body)) + c
            + struct.pack(">I", zlib.crc32(c))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    rgb = img_decode(png).astype(np.int64)

    # --- gzip/lz4 codec matrix on real segments ---
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type", "props")
    root = tempfile.mkdtemp(prefix="pinot_spark_codecmx_")
    try:
        totals, counts = {}, {}
        for codec in ("gzip", "lz4", "none"):
            p = os.path.join(root, codec)
            write_segments(ev, p, compression=codec)
            st = segment_compression_stats(p)
            totals[codec] = sum(
                c["compressed"] for c in st["columns"].values()
            )
            counts[codec] = spark.read.parquet(p).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    n_rows = counts["none"] if len(set(counts.values())) == 1 else -1
    return spark.createDataFrame(
        [(
            int(mu64.sum()), int(np.abs(mu64).max()),
            int(a64.sum()), int(np.abs(a64).max()),
            int(rgb[:, :, 0].sum()), int(rgb[:, :, 1].sum()),
            int(rgb[:, :, 2].sum()),
            totals["gzip"] < totals["none"],
            totals["lz4"] < totals["none"],
            n_rows,
        )],
        "g711_mu_sum bigint, g711_mu_peak int, g711_a_sum bigint, "
        "g711_a_peak int, png_sum_r bigint, png_sum_g bigint, "
        "png_sum_b bigint, gzip_compresses boolean, "
        "lz4_compresses boolean, n_rows bigint",
    )
