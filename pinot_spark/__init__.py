"""pinot_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Pinot (reference: /root/reference).

Architecture (SURVEY.md §7): everything is declared through the Spark
DataFrame / SQL API so Catalyst + Tungsten own optimization and execution.
This package supplies the pieces Spark does not have natively:

- ``session``     — tuned SparkSession builder (AQE, partitions, timezone)
- ``catalog``     — table loading / registration for the test star schema
- ``functions``   — Pinot scalar + aggregation function surface mapped onto
                    pyspark.sql.functions (name → Column builders)
- ``operators``   — composite operators: as-of join, gapfill, funnel, upsert
                    views, dedup (exact/minhash/simhash), similarity search,
                    text analysis, multimodal plumbing
- ``plans``       — query-shaping helpers (default LIMIT, MV filter
                    semantics, time-series range API)
- ``streaming``   — Structured Streaming ingestion (upsert/dedup/hybrid)
"""

from pinot_spark.session import get_spark
from pinot_spark.catalog import load_tables, TABLE_NAMES
from pinot_spark.dialect import PinotEngine

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "TABLE_NAMES", "PinotEngine", "__version__"]
