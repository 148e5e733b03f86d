"""Gapfill: fill missing time buckets per series at query time.

Reference semantics: pinot-core/.../query/reduce/GapfillProcessor.java:48,
136-173 (+ GapfillUtils, Count/SumAvg gapfill processors) — generate the
full bucket spine between start and end, and for each series fill absent
buckets with FILL_PREVIOUS_VALUE, a literal default, or NULL.

Spark-first design: the spine is ``sequence()`` + ``explode`` over the
distinct series keys (tiny: |series| × |buckets| rows), left-joined to the
bucketed aggregate, then FILL_PREVIOUS via ``last(..., ignorenulls=True)``
over the per-series time window. One shuffle on the series key; the spine
side is broadcast-sized relative to the fact table at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def time_bucket(col: str | Column, bucket: str) -> Column:
    """Truncate a timestamp column to a bucket boundary (Pinot dateTrunc /
    the gapfill bucket expression)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc(bucket, c)


def gapfill(
    bucketed: DataFrame,
    series_cols: list[str],
    time_col: str,
    start: str,
    end: str,
    step: str = "1 hour",
    fill: str = "previous",
    fill_cols: list[str] | None = None,
    default=None,
) -> DataFrame:
    """Fill gaps in a pre-bucketed per-series aggregate.

    ``bucketed`` must have one row per (series_cols, time_col) with the
    aggregated value columns. Produces one row for EVERY bucket in
    [start, end) per observed series, with ``fill_cols`` filled per
    ``fill`` ∈ {"previous", "default", "null"}.
    """
    fill_cols = fill_cols or [
        c for c in bucketed.columns if c not in series_cols and c != time_col
    ]
    spine_time = F.explode(
        F.sequence(
            F.lit(start).cast("timestamp"),
            F.lit(end).cast("timestamp") - F.expr(f"INTERVAL {step}"),
            F.expr(f"INTERVAL {step}"),
        )
    ).alias(time_col)
    series = bucketed.select(*series_cols).distinct()
    spine = series.select(*series_cols, spine_time)

    joined = spine.join(bucketed, on=[*series_cols, time_col], how="left")

    if fill == "previous":
        w = (
            Window.partitionBy(*series_cols)
            .orderBy(time_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = [F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols]
    elif fill == "default":
        filled = [F.coalesce(F.col(c), F.lit(default)).alias(c) for c in fill_cols]
    elif fill == "null":
        filled = [F.col(c) for c in fill_cols]
    else:
        raise ValueError(f"fill must be previous|default|null, got {fill}")

    keep = [c for c in bucketed.columns if c not in fill_cols and c != time_col and c not in series_cols]
    return joined.select(*series_cols, time_col, *keep, *filled)
