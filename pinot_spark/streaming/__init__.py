"""Structured Streaming ingestion: the REALTIME-table surface
(SURVEY.md §2.7) — stream → queryable table with upsert/dedup semantics,
watermark-based late-data handling, hybrid-table views.
"""

from pinot_spark.streaming.ingest import (
    start_realtime_ingest,
    streaming_dedup,
    streaming_window_agg,
    hybrid_view,
)

__all__ = [
    "start_realtime_ingest",
    "streaming_dedup",
    "streaming_window_agg",
    "hybrid_view",
]
