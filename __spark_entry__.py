"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pinot_spark.queries`` — the registry holds one entry per
implemented operator/capability from SURVEY.md §2, each with a DuckDB
oracle twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pinot_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _q.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Every registered query has
    one — the driver marks oracle-less entries err:no_oracle (red);
    there is no rows-only fallback. Approximate/hash-specific operators
    emit deterministic validated outputs (exact value + within-tolerance
    boolean, verified pairs, or a full SQL mirror of the approximate
    pipeline) so an exact oracle twin always exists."""
    return dict(_q.ORACLE)
