"""Batch sources + ingestion-time processing (SURVEY.md §1.4, §2.1):
format readers, the ingestion transform pipeline, and segment-style
partitioned/sorted parquet writing.
"""

from pinot_spark.sources.readers import read_table
from pinot_spark.sources.ingestion import IngestionPipeline
from pinot_spark.sources.segments import write_segments

__all__ = ["read_table", "IngestionPipeline", "write_segments"]
