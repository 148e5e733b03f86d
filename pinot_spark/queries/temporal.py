"""Temporal/streaming-semantics coverage: time-bucket aggregation, AS-OF
join, gapfill, funnel, upsert/dedup views, time-series range queries.

Reference: SURVEY.md §2.5 (AsofJoinOperator.java:37), §2.7
(GapfillProcessor.java:48, UpsertConfig.java:36, dedup/, timeseries SPI),
§2.4 funnel family (AggregationFunctionType.java:193-203).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.asof import asof_join
from pinot_spark.operators.funnel import funnel_max_step
from pinot_spark.operators.gapfill import gapfill, time_bucket
from pinot_spark.operators.upsert import dedup_view, partial_upsert_view, upsert_view
from pinot_spark.queries import query, _r2, _r4, dsum2


@query(
    "events_time_bucket_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS n, round(sum(CAST(value AS DECIMAL(38,6))), 2)::DOUBLE AS total_value
    FROM events WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
    GROUP BY bucket, event_type ORDER BY bucket, event_type
    """,
)
def events_time_bucket_agg(spark, sf_dir):
    """Time-bucketed aggregation (TimeSeriesAggregation leaf /
    dateTrunc group-by — the realtime-analytics staple)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
        )
        .groupBy(time_bucket("ts", "hour").alias("bucket"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum2("value").alias("total_value"))
        .orderBy("bucket", "event_type")
    )


@query(
    "asof_join_backward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts < p.ts
    ORDER BY p.event_id
    """,
)
def asof_join_backward(spark, sf_dir):
    """AS-OF join, strict backward match (AsofJoinOperator.java:37,
    match conditions :59-64): per purchase, the latest strictly-earlier
    view by the same user. Implemented via the union+window builder
    (operators/asof.py) — one shuffle, no range explosion."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="view_ts",
        direction="backward",
        strict=True,
    ).select("event_id", "user_id", "ts", "view_ts", "view_value").orderBy("event_id")


@query(
    "gapfill_fill_previous",
    oracle="""
    WITH spine AS (
      SELECT t.bucket, s.event_type
      FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-06' - INTERVAL 1 HOUR,
                                          INTERVAL 1 HOUR)) AS bucket) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events WHERE event_type IN ('signup', 'error')) s),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, round(avg(value), 4) AS avg_value
      FROM events WHERE event_type IN ('signup', 'error') GROUP BY bucket, event_type)
    SELECT s.event_type, s.bucket,
           last_value(a.avg_value IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
    FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket AND s.event_type = a.event_type
    ORDER BY s.event_type, s.bucket
    """,
)
def gapfill_fill_previous(spark, sf_dir):
    """Gapfill with FILL_PREVIOUS_VALUE (GapfillProcessor.java:136-173):
    hourly per-type average with missing buckets carried forward."""
    t = load_tables(spark, sf_dir)
    bucketed = (
        t["events"]
        .filter(F.col("event_type").isin("signup", "error"))
        .groupBy(F.col("event_type"), time_bucket("ts", "hour").alias("bucket"))
        .agg(_r4(F.avg("value")).alias("avg_value"))
    )
    return gapfill(
        bucketed,
        series_cols=["event_type"],
        time_col="bucket",
        start="2024-01-05",
        end="2024-01-06",
        step="1 hour",
        fill="previous",
        fill_cols=["avg_value"],
    ).orderBy("event_type", "bucket")


@query(
    "gapfill_fill_default",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-06' - INTERVAL 1 HOUR,
                                    INTERVAL 1 HOUR)) AS bucket),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, count(*) AS n
      FROM events WHERE event_type = 'signup' GROUP BY bucket)
    SELECT s.bucket, coalesce(a.n, 0) AS n
    FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket
    ORDER BY s.bucket
    """,
)
def gapfill_fill_default(spark, sf_dir):
    """Gapfill COUNT with default 0 (CountGapfillProcessor)."""
    t = load_tables(spark, sf_dir)
    bucketed = (
        t["events"]
        .filter(F.col("event_type") == "signup")
        .groupBy(time_bucket("ts", "hour").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .withColumn("__series", F.lit(1))
    )
    return (
        gapfill(
            bucketed,
            series_cols=["__series"],
            time_col="bucket",
            start="2024-01-05",
            end="2024-01-06",
            step="1 hour",
            fill="default",
            fill_cols=["n"],
            default=0,
        )
        .drop("__series")
        .orderBy("bucket")
    )


@query(
    "funnel_max_step",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS max_step
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type IN ('view','click','purchase')) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    ORDER BY u.user_id
    """,
)
def funnel_max_step_q(spark, sf_dir):
    """FUNNELMAXSTEP (AggregationFunctionType.java:193): deepest ordered
    view→click→purchase step per user, each match strictly after the
    previous. applyInPandas funnel operator (operators/funnel.py)."""
    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    return funnel_max_step(t["events"], "user_id", "ts", steps).orderBy("user_id")


@query(
    "funnel_max_step_pandas",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS max_step
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type IN ('view','click','purchase')) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    ORDER BY u.user_id
    """,
)
def funnel_max_step_pandas_q(spark, sf_dir):
    """FUNNELMAXSTEP via the applyInPandas variant (Arrow-batched
    per-group logic — the extension point for FUNNELMATCHSTEP /
    FUNNELSTEPDURATIONSTATS shapes)."""
    from pinot_spark.operators.funnel import funnel_max_step_pandas

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    return funnel_max_step_pandas(t["events"], "user_id", "ts", steps).orderBy("user_id")


@query(
    "funnel_complete_count",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT count(*) AS complete_count FROM s3
    """,
)
def funnel_complete_count_q(spark, sf_dir):
    """FUNNELCOMPLETECOUNT (AggregationFunctionType.java:195)."""
    from pinot_spark.operators.funnel import funnel_complete_count

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    return funnel_complete_count(t["events"], "user_id", "ts", steps)


@query(
    "upsert_latest_per_key",
    oracle="""
    SELECT user_id, event_type AS last_event, value AS last_value, ts AS last_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
)
def upsert_latest_per_key(spark, sf_dir):
    """Upsert FULL-mode view (UpsertConfig.java:36): queries see only the
    latest row per primary key by comparison column."""
    t = load_tables(spark, sf_dir)
    return (
        upsert_view(t["events"], keys=["user_id"], comparison=["ts", "event_id"])
        .select(
            "user_id",
            F.col("event_type").alias("last_event"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "dedup_first_per_key",
    oracle="""
    SELECT user_id, event_id AS first_event_id, ts AS first_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
)
def dedup_first_per_key(spark, sf_dir):
    """Ingestion dedup view (dedup/ConcurrentMapPartitionDedupMetadataManager):
    first row per primary key wins."""
    t = load_tables(spark, sf_dir)
    return (
        dedup_view(t["events"], keys=["user_id"], comparison=["ts", "event_id"])
        .select("user_id", F.col("event_id").alias("first_event_id"), F.col("ts").alias("first_ts"))
        .orderBy("user_id")
    )


@query(
    "partial_upsert_merge",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ts) AS event_type,
           round(sum(CAST(value AS DECIMAL(38,6))), 2)::DOUBLE AS value,
           max(ts) AS ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def partial_upsert_merge(spark, sf_dir):
    """Partial upsert (UpsertConfig Mode PARTIAL + merger/PartialUpsertMerger):
    OVERWRITE for event_type, SUM for value."""
    t = load_tables(spark, sf_dir)
    merged = partial_upsert_view(
        t["events"].select("user_id", "event_type", "value", "ts"),
        keys=["user_id"],
        comparison="ts",
        mergers={"event_type": "OVERWRITE", "value": "SUM"},
    )
    return merged.select(
        "user_id", "event_type", _r2(F.col("value")).alias("value"), "ts"
    ).orderBy("user_id")


@query(
    "hybrid_table_time_boundary",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(CAST(value AS DECIMAL(38,6))), 2)::DOUBLE AS total
    FROM (
      SELECT * FROM events WHERE ts <= TIMESTAMP '2024-01-15'
      UNION ALL
      SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-15')
    GROUP BY event_type ORDER BY event_type
    """,
)
def hybrid_table_time_boundary(spark, sf_dir):
    """Hybrid OFFLINE/REALTIME table: one logical table = offline part
    ≤ time boundary UNION ALL realtime part > boundary
    (TimeBoundaryConfig, broker TimeBoundaryManager). Here both halves
    come from the same store; the boundary view is the operator."""
    t = load_tables(spark, sf_dir)
    boundary = F.lit("2024-01-15").cast("timestamp")
    offline = t["events"].filter(F.col("ts") <= boundary)
    realtime = t["events"].filter(F.col("ts") > boundary)
    return (
        offline.unionByName(realtime)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum2("value").alias("total"))
        .orderBy("event_type")
    )


@query(
    "timeseries_range_query",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-09' - INTERVAL 4 HOUR,
                                    INTERVAL 4 HOUR)) AS bucket),
    agg AS (
      SELECT date_trunc('hour', ts) - INTERVAL (CAST(extract(hour FROM ts) AS INT) % 4) HOUR AS bucket,
             round(sum(value), 2) AS val
      FROM events WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-09'
      GROUP BY bucket)
    SELECT s.bucket, coalesce(a.val, 0.0) AS val
    FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket ORDER BY s.bucket
    """,
)
def timeseries_range_query(spark, sf_dir):
    """Time-series engine range query (TimeSeriesRequestHandler.java:88,
    TimeBuckets.java): PromQL-style fetch → 4h-bucket → SUM → transformNull(0)
    via the plans.timeseries range API."""
    from pinot_spark.plans.timeseries import range_query

    t = load_tables(spark, sf_dir)
    return range_query(
        t["events"].filter(F.col("event_type") == "purchase"),
        time_col="ts",
        value_col="value",
        start="2024-01-08",
        end="2024-01-09",
        step="4 hour",
        agg="sum",
        transform_null=0.0,
    ).orderBy("bucket")


@query(
    "timeseries_keep_last_value",
    oracle="""
    WITH spine AS (
      SELECT t.bucket, s.event_type
      FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-09' - INTERVAL 2 HOUR,
                                          INTERVAL 2 HOUR)) AS bucket) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events
                  WHERE event_type IN ('signup', 'purchase')) s),
    agg AS (
      SELECT event_type,
             date_trunc('hour', ts) - INTERVAL (CAST(extract(hour FROM ts) AS INT) % 2) HOUR AS bucket,
             round(max(value), 2) AS val
      FROM events WHERE event_type IN ('signup', 'purchase')
        AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-09'
      GROUP BY event_type, bucket)
    SELECT s.event_type, s.bucket,
           last_value(a.val IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
    FROM spine s LEFT JOIN agg a
      ON s.bucket = a.bucket AND s.event_type = a.event_type
    ORDER BY s.event_type, s.bucket
    """,
)
def timeseries_keep_last_value(spark, sf_dir):
    """M3QL keepLastValue pipeline transform
    (pinot-timeseries-m3ql KeepLastValueOperator.java): per-series 2h MAX
    with empty buckets carried forward."""
    from pinot_spark.plans.timeseries import range_query

    t = load_tables(spark, sf_dir)
    return range_query(
        t["events"].filter(F.col("event_type").isin("signup", "purchase")),
        time_col="ts",
        value_col="value",
        start="2024-01-08",
        end="2024-01-09",
        step="2 hour",
        agg="max",
        tags=["event_type"],
        keep_last_value=True,
    ).orderBy("event_type", "bucket")


@query(
    "funnel_match_step",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT u.user_id,
           array_to_string(
             [CASE WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END,
              CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END,
              CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END], ',') AS matched
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type IN ('view','click','purchase')) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    ORDER BY u.user_id
    """,
)
def funnel_match_step(spark, sf_dir):
    """FUNNELMATCHSTEP (AggregationFunctionType.java:199): per-user 0/1
    array of ordered steps matched, derived from the same max_step
    operator (matched[i] = max_step > i)."""
    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    ms = funnel_max_step(t["events"], "user_id", "ts", steps)
    # driver contract: stringify the ArrayType output — the driver's
    # pandas canonicalizer cannot sort/hash numpy arrays
    return ms.select(
        "user_id",
        F.array_join(
            F.array(
                *[
                    F.when(F.col("max_step") > i, 1).otherwise(0)
                    for i in range(len(steps))
                ]
            ).cast("array<string>"),
            ",",
        ).alias("matched"),
    ).orderBy("user_id")


@query(
    "funnel_step_duration_stats",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
         durs AS (
           SELECT 1 AS step_pair,
                  date_diff('microsecond', s1.t1, s2.t2) / 1000000.0 AS dur_s
           FROM s1 JOIN s2 ON s1.user_id = s2.user_id
           UNION ALL
           SELECT 2 AS step_pair,
                  date_diff('microsecond', s2.t2, s3.t3) / 1000000.0 AS dur_s
           FROM s2 JOIN s3 ON s2.user_id = s3.user_id)
    SELECT step_pair, count(*) AS n_users,
           round(avg(dur_s), 2) AS avg_s,
           round(min(dur_s), 2) AS min_s,
           round(max(dur_s), 2) AS max_s
    FROM durs GROUP BY step_pair ORDER BY step_pair
    """,
)
def funnel_step_duration_stats(spark, sf_dir):
    """FUNNELSTEPDURATIONSTATS (AggregationFunctionType.java:197):
    avg/min/max seconds between consecutive matched funnel steps.
    Durations are integer seconds so avg is order-independent."""
    from pinot_spark.operators.funnel import funnel_step_times

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    times = funnel_step_times(t["events"], "user_id", "ts", steps)
    pairs = [
        times.filter(F.col(f"t{i + 1}").isNotNull()).select(
            F.lit(i).alias("step_pair"),
            (
                (F.unix_micros(F.col(f"t{i + 1}")) - F.unix_micros(F.col(f"t{i}")))
                / 1000000.0
            ).alias("dur_s"),
        )
        for i in (1, 2)
    ]
    durs = pairs[0].unionAll(pairs[1])
    return (
        durs.groupBy("step_pair")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("dur_s"), 2).alias("avg_s"),
            F.round(F.min("dur_s"), 2).alias("min_s"),
            F.round(F.max("dur_s"), 2).alias("max_s"),
        )
        .orderBy("step_pair")
    )


@query(
    "timeseries_m3ql_pipeline",
    oracle="""
    WITH spine AS (
      SELECT t.bucket, s.event_type
      FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-09' - INTERVAL 6 HOUR,
                                          INTERVAL 6 HOUR)) AS bucket) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events WHERE event_type IN ('view', 'click')) s),
    agg AS (
      SELECT event_type,
             date_trunc('hour', ts) - INTERVAL (CAST(extract(hour FROM ts) AS INT) % 6) HOUR AS bucket,
             round(count(value), 2) AS val
      FROM events WHERE event_type IN ('view', 'click')
        AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-09'
      GROUP BY event_type, bucket)
    SELECT s.event_type, s.bucket, coalesce(a.val, 0.0) AS val
    FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket AND s.event_type = a.event_type
    ORDER BY s.event_type, s.bucket
    """,
)
def timeseries_m3ql_pipeline(spark, sf_dir):
    """M3QL pipeline language end-to-end (M3TimeSeriesPlanner.java):
    'fetch | summarize 6h count by event_type | transformNull 0' compiled
    to the range-query DataFrame pipeline."""
    from pinot_spark.plans.m3ql import execute

    t = load_tables(spark, sf_dir)
    return execute(
        t["events"].filter(F.col("event_type").isin("view", "click")),
        "fetch | summarize 6h count by event_type | transformNull 0",
        time_col="ts",
        value_col="value",
        start="2024-01-08",
        end="2024-01-09",
    ).orderBy("event_type", "bucket")


@query(
    "agg_funnel_count",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS m1,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS m2,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS m3
        FROM events GROUP BY user_id)
    SELECT array_to_string(
             [CAST(sum(m1) AS BIGINT), CAST(sum(m1 * m2) AS BIGINT),
              CAST(sum(m1 * m2 * m3) AS BIGINT)], ',') AS step_counts FROM per_user
    """,
)
def agg_funnel_count(spark, sf_dir):
    """FUNNELCOUNT(STEPS(view, click, purchase), CORRELATE_BY(user_id))
    (AggregationFunctionType.java:201, funnel/SetMergeStrategy.java):
    per-step conversion counts as progressive set intersections — no
    time-ordering, unlike FUNNELMAXSTEP."""
    from pinot_spark.operators.funnel import funnel_count

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    # driver contract: stringify the ArrayType output — the driver's
    # pandas canonicalizer cannot sort/hash numpy arrays
    return funnel_count(t["events"], "user_id", steps).select(
        F.array_join(F.col("step_counts").cast("array<string>"), ",").alias(
            "step_counts"
        )
    )


@query(
    "agg_funnel_events_eval",
    # The sliding-window match with event consumption IS SQL-expressible:
    # precompute each anchor's greedy (first-click, first-purchase) match
    # indices with correlated mins, then replay the consumption rule
    # (next match = first completed anchor past the previous match's
    # purchase) with a recursive CTE — iterations = completed funnels per
    # user. Exact semantics also locked by tests/test_funnel_extra.py.
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, ts, epoch_ms(ts) AS tms,
             CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS s,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts, CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END
             ) - 1 AS rn
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    a1 AS (
      SELECT a.user_id, a.rn AS i, a.tms AS t0,
             (SELECT min(b.rn) FROM ev b
              WHERE b.user_id = a.user_id AND b.rn > a.rn AND b.s = 1
                AND b.tms < a.tms + 604800000) AS j1
      FROM ev a WHERE a.s = 0
    ),
    m2 AS (
      SELECT a1.user_id, a1.i, a1.t0, a1.j1,
             (SELECT min(c.rn) FROM ev c
              WHERE c.user_id = a1.user_id AND c.rn > a1.j1 AND c.s = 2
                AND c.tms < a1.t0 + 604800000) AS j2
      FROM a1 WHERE a1.j1 IS NOT NULL
    ),
    mm AS (SELECT user_id, i, j1, j2 FROM m2 WHERE j2 IS NOT NULL),
    seq AS (
      SELECT user_id, i, j1, j2, 1 AS ord
      FROM mm x WHERE i = (SELECT min(y.i) FROM mm y WHERE y.user_id = x.user_id)
      UNION ALL
      SELECT z.user_id, z.i, z.j1, z.j2, s.ord + 1
      FROM seq s JOIN mm z
        ON z.user_id = s.user_id
       AND z.i = (SELECT min(w.i) FROM mm w
                  WHERE w.user_id = s.user_id AND w.i > s.j2)
    ),
    vals AS (
      SELECT q.user_id, q.ord,
             'view,' || e0.tms || ',click,' || e1.tms || ',purchase,' || e2.tms AS grp
      FROM seq q
      JOIN ev e0 ON e0.user_id = q.user_id AND e0.rn = q.i
      JOIN ev e1 ON e1.user_id = q.user_id AND e1.rn = q.j1
      JOIN ev e2 ON e2.user_id = q.user_id AND e2.rn = q.j2
    )
    SELECT user_id, CAST(6 * count(*) AS INT) AS n_vals,
           string_agg(grp, ',' ORDER BY ord) AS matched_events
    FROM vals GROUP BY user_id ORDER BY user_id
    """,
)
def agg_funnel_events_eval(spark, sf_dir):
    """FUNNELEVENTSFUNCTIONEVAL (AggregationFunctionType.java:199,
    funnel/window/FunnelEventsFunctionEvalAggregationFunction.java):
    per user, the extra-field values (event_type, epoch-ms) of each
    completed view→click→purchase funnel inside a 7-day window."""
    from pinot_spark.operators.funnel import funnel_events_eval

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    # cast: parquet may load ts as TIMESTAMP_NTZ under a vanilla session
    # (driver conditions) and unix_millis rejects NTZ input
    ev = t["events"].withColumn(
        "ts_ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    out = funnel_events_eval(
        ev, "user_id", "ts", 7 * 86400000, steps, ["event_type", "ts_ms"]
    )
    # driver contract: stringify the ArrayType output — the driver's
    # pandas canonicalizer cannot sort/hash numpy arrays
    return (
        out.filter(F.size("matched_events") > 0)
        .select(
            "user_id",
            F.size("matched_events").alias("n_vals"),
            F.array_join("matched_events", ",").alias("matched_events"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_funnel_max_step_window",
    # STRICT_ORDER collapses the windowed sliding-match to a pure
    # window-function shape: any out-of-sequence event ends the attempt,
    # so an anchor's depth is decided by the next two step-tagged events
    # alone (lead(1)/lead(2) over event order) — no recursion needed.
    # Full mode semantics locked by
    # tests/test_funnel_extra.py::test_funnel_max_step_window_modes.
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, epoch_ms(ts) AS tms,
             CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS s
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    w AS (
      SELECT user_id, s, tms,
             lead(s, 1) OVER win AS s1, lead(tms, 1) OVER win AS t1,
             lead(s, 2) OVER win AS s2, lead(tms, 2) OVER win AS t2
      FROM ev WINDOW win AS (PARTITION BY user_id ORDER BY ts, s)
    ),
    per_anchor AS (
      SELECT user_id,
             CASE WHEN s = 0 THEN
               CASE WHEN s1 = 1 AND t1 < tms + 604800000 THEN
                 CASE WHEN s2 = 2 AND t2 < tms + 604800000 THEN 3 ELSE 2 END
               ELSE 1 END
             ELSE 0 END AS reached
      FROM w
    )
    SELECT user_id, CAST(max(reached) AS INT) AS max_step
    FROM per_anchor GROUP BY user_id
    HAVING max(reached) > 0 ORDER BY user_id
    """,
)
def agg_funnel_max_step_window(spark, sf_dir):
    """Windowed FUNNELMAXSTEP with STRICT_ORDER mode
    (funnel/window/FunnelMaxStepAggregationFunction.java + FunnelModes):
    deepest view→click→purchase run per user where every attempt stays
    inside a 7-day window and out-of-sequence events end the attempt."""
    from pinot_spark.operators.funnel import funnel_max_step_window

    t = load_tables(spark, sf_dir)
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = funnel_max_step_window(
        t["events"], "user_id", "ts", 7 * 86400000, steps, {"strict_order"}
    )
    return out.filter(F.col("max_step") > 0).orderBy("user_id")
