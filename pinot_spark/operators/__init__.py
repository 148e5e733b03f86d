"""Composite operators Spark lacks natively, each built from DataFrame
primitives (SURVEY.md §4.4): as-of join, gapfill, funnel aggregations,
upsert/dedup views, near-duplicate detection, similarity search, text
analysis, multimodal plumbing.
"""
