"""Driver-gate queries for the last SURVEY §2 rows with repo-only
evidence: Python UDTF (§2.9), colocated bucketed join / exchange (§2.6),
and gap sessionization (§2.7 — deterministic batch twin of the
applyInPandasWithState operator). Registered behind the round-6 window;
prime candidates for the round-7 rotation.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from pinot_spark.catalog import load_tables
from pinot_spark.queries import dsum2, query


@query(
    "udtf_sequence_explode",
    oracle="""
    SELECT n_nationkey, i, i * i AS i_sq FROM
      (SELECT n_nationkey, unnest(range(n_regionkey + 1)) AS i FROM nation)
    ORDER BY n_nationkey, i
    """,
)
def udtf_sequence_explode(spark, sf_dir):
    """Python UDTF (§2.9; reference UDTF surface is
    pinot-core/.../function — Pinot models table functions as
    transform+explode): a registered @udtf class lateral-joined in SQL,
    emitting a row per generated element plus a computed column."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int, i_sq int")
    class Seq0:
        def eval(self, n: int):
            for i in range(n if n is not None else 0):
                yield i, i * i

    spark.udtf.register("pinot_seq0", Seq0)
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT n_nationkey, s.i, s.i_sq FROM nation, "
        "LATERAL pinot_seq0(n_regionkey + 1) s ORDER BY n_nationkey, i"
    )


@query(
    "colocated_bucketed_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_items,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE
             AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def colocated_bucketed_join(spark, sf_dir):
    """Exchange / colocated bucketed join (§2.6,
    sources/segments.write_bucketed_table — the SegmentPartitionConfig +
    PinotImplicitTableHintRule analog): both sides bucketed on the join
    key with equal bucket counts, sort-merge joined with NO shuffle
    exchange (plan asserted in tests/test_ingestion.py
    test_bucketed_colocated_join); results must equal the plain join.
    Table names are pid-scoped so concurrent driver runs can't collide,
    and the data lands at explicit tempdir paths (external tables) so
    the query never depends on the driver process's cwd being a
    writable spark-warehouse."""
    import tempfile

    from pinot_spark.sources.segments import write_bucketed_table

    t = load_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pinot_spark_colo_")
    o_name = f"colo_orders_{os.getpid()}"
    l_name = f"colo_lineitem_{os.getpid()}"
    write_bucketed_table(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        o_name, bucket_cols=["o_orderkey"], num_buckets=8,
        sort_cols=["o_orderkey"], path=os.path.join(base, o_name),
    )
    write_bucketed_table(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        l_name, bucket_cols=["l_orderkey"], num_buckets=8,
        sort_cols=["l_orderkey"], path=os.path.join(base, l_name),
    )
    joined = (
        spark.table(o_name)
        .hint("merge")  # sort-merge path: bucketing carries co-location
        .join(spark.table(l_name), F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sessionize_gap_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      -- ORDER BY (ts, event_id) matches the marked window exactly, so
      -- events sharing a ts across a session boundary number identically
      -- in both engines
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ), per_session AS (
      SELECT user_id, session_id, count(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def sessionize_gap_sessions(spark, sf_dir):
    """Gap sessionization (§2.7): the deterministic batch twin of
    streaming/stateful.sessionize (applyInPandasWithState, gap-closed
    sessions — repo-tested in tests/test_streaming.py). Same semantics
    expressed as window functions: a session breaks when the inter-event
    gap exceeds 6h; per-user session stats come back ordered.

    Scale shape: one shuffle on user_id for the window, partial/final
    aggregation above it — no collect, no UDF."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = load_tables(spark, sf_dir)
    # events.ts is TIMESTAMP_NTZ (nano-parquet ingest) — not castable to
    # long; compare in the microsecond epoch domain on both engines
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(t_us).over(w)
    is_new = F.when(prev_us.isNull() | (t_us - prev_us > 21_600_000_000), 1).otherwise(0)
    sess = t["events"].select(
        "user_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
        )
        .orderBy("user_id")
    )
