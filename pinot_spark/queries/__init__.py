"""Query inventory registry: one named query per operator/capability from
SURVEY.md §2, each with a DuckDB oracle SQL twin where SQL-expressible.

Conventions (driver contract):
- every query fn takes (spark, sf_dir) → DataFrame, lazy;
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded (2dp money sums, 4dp ratios) so partial/
  final aggregation order cannot flip the driver's value hash;
- queries without an oracle entry get the driver's rows-only check
  (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _r2(c):  # money-sum rounding
    return F.round(c, 2)


def _r4(c):  # ratio/avg rounding
    return F.round(c, 4)


def dsum2(c):
    """Order-independent money sum: sum in exact DECIMAL domain, round 2,
    emit double. Raw-double sums are order-dependent at the 1e-9 level and
    Spark/DuckDB accumulate in different orders — a sum landing on a .xx5
    boundary would otherwise round differently per engine. Oracle twin:
    ``round(sum(CAST(expr AS DECIMAL(38,6))), 2)::DOUBLE``."""
    if isinstance(c, str):
        c = F.col(c)
    return F.round(F.sum(c.cast("decimal(38,6)")), 2).cast("double")


# populate the registry
from pinot_spark.queries import tpch  # noqa: E402,F401
from pinot_spark.queries import relational  # noqa: E402,F401
from pinot_spark.queries import windows  # noqa: E402,F401
from pinot_spark.queries import aggregates  # noqa: E402,F401
from pinot_spark.queries import scalar_fns  # noqa: E402,F401
from pinot_spark.queries import temporal  # noqa: E402,F401
from pinot_spark.queries import pipeline  # noqa: E402,F401
from pinot_spark.queries import dialect_queries  # noqa: E402,F401
