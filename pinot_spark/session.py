"""SparkSession builder with scale-oriented defaults.

Pinot's broker/server runtime config collapses onto Spark session confs
(SURVEY.md §3).  The defaults below are what we would ship on a real
cluster; locally they are sized for local[32].

Scale notes (100 TB design intent):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace Pinot's hand-placed exchange
  rules (PinotQueryRuleSets — SURVEY.md §4.2).
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a 1000-executor cluster this would be set to ~2-3× total
  cores and AQE left to shrink it.
- Arrow enabled for every pandas interchange (vector/funnel/dedup UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # Adaptive execution: replaces Pinot's exchange-placement rules.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast dims (region/nation/supplier-scale tables) aggressively:
    # Pinot's dimension/lookup tables are fully replicated (SURVEY.md §1.1).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for all pandas UDF paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet pushdown (defaults on, pinned here as part of the contract).
    "spark.sql.parquet.filterPushdown": "true",
    # Read INT64 TIMESTAMP(NANOS) columns as longs; catalog.load_tables
    # converts them to micro-precision timestamps (matches DuckDB, which
    # also truncates nanos to its micro-precision TIMESTAMP).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # PySpark 4's per-API-call error-context capture wraps EVERY
    # DataFrame/Column call with a stack walk plus extra py4j round
    # trips (conf read + PySparkCurrentOrigin set/clear) — measured
    # ~30% of every query-BUILD (q1: 156→109 ms, asof: 218→114 ms,
    # ~0.5 s per bench run summed). Pure driver-side Python overhead at
    # any scale and any core count; a production broker runs with
    # debug-context capture off (round-17 optimization, guide §1.2
    # per-task work applied to the driver).
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(app_name: str = "pinot-spark", extra_confs: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Locally honours ``SPARK_GRAFT_CPUS`` (default: all cores); on a real
    cluster the master/resource confs come from spark-submit and only the
    SQL confs here apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    confs = dict(DEFAULT_CONFS)
    confs.setdefault("spark.sql.shuffle.partitions", cpus if cpus != "*" else "32")
    confs.setdefault("spark.driver.memory", "8g")
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
