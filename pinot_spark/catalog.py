"""Catalog: table loading + registration.

Pinot's table/segment catalog (TableConfig, segment assignment —
SURVEY.md §1.1) collapses onto the Spark catalog: a table is a parquet
dataset registered as a (temp) view; OFFLINE/REALTIME hybrid pairs are a
UNION-by-time-boundary view (see operators.hybrid).

Scale notes: at 100 TB each table is a partitioned parquet/Delta dataset;
``spark.read.parquet`` plus partition pruning and row-group min/max stats
replace Pinot's broker/server segment pruners
(reference: pinot-broker/.../routing/segmentpruner/, SURVEY.md §3.1 step 4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small fully-replicated tables: Pinot "dimension tables"
# (pinot-spi/.../config/table/DimensionTableConfig.java) — always broadcast.
DIMENSION_TABLES = ("region", "nation")


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load every parquet table under ``sf_dir`` and register temp views.

    Returns {name: DataFrame}. Missing tables are skipped so the loader
    works on partial fixture dirs.
    """
    key = (id(spark), os.path.abspath(sf_dir))
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        cached = {}
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                continue
            cached[name] = _normalize_nanos(spark.read.parquet(path))
        _TABLE_CACHE[key] = cached
    if register and _REGISTERED.get(id(spark)) != key:
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        _REGISTERED[id(spark)] = key
    return dict(cached)


# One catalog resolution per (session, dataset): a real deployment
# registers tables once in a metastore; re-listing parquet footers per
# query would repeat that work on every request.
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
# which dataset's views are currently registered per session
_REGISTERED: dict[int, tuple[int, str]] = {}


_NANO_TS_COLUMNS = {"ts", "event_ts", "updated_at"}


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Convert INT64-nano timestamp columns (read as long under
    ``spark.sql.legacy.parquet.nanosAsLong``) to micro-precision timestamps.

    Integer division keeps full precision (nanos ~1e18 exceed double's 2^53).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for f in df.schema.fields:
        if f.name in _NANO_TS_COLUMNS and isinstance(f.dataType, LongType):
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single table by name."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
