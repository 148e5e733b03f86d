"""Time-series range-query API: the PromQL-range-style engine
(reference: pinot-timeseries/pinot-timeseries-spi — TimeBuckets.java,
AggInfo.java; M3QL plugin planner M3TimeSeriesPlanner.java; pipeline
operators KeepLastValueOperator.java, TransformNullOperator.java).

Shape: fetch(filter) → bucket(ts, step) → per-series agg → pipeline
transforms (transformNull, keepLastValue). All one DataFrame pipeline:
``window()`` bucketing + group-agg + window-function fills.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
}


def range_query(
    df: DataFrame,
    time_col: str,
    value_col: str,
    start: str,
    end: str,
    step: str = "1 hour",
    agg: str = "sum",
    tags: list[str] | None = None,
    transform_null: float | None = None,
    keep_last_value: bool = False,
    round_to: int = 2,
) -> DataFrame:
    """Execute a range query: per (tags, bucket) aggregate over [start, end)
    with a full bucket spine (empty buckets present, value NULL unless
    ``transform_null``/``keep_last_value``).

    Buckets align to the epoch like Pinot's TimeBuckets (and Spark's
    ``window()``): bucket = floor(ts / step) * step.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    tags = tags or []

    in_range = df.filter(
        (F.col(time_col) >= F.lit(start).cast("timestamp"))
        & (F.col(time_col) < F.lit(end).cast("timestamp"))
    )
    bucketed = (
        in_range.groupBy(
            *tags, F.window(time_col, step).getField("start").alias("bucket")
        )
        .agg(F.round(_AGGS[agg](value_col), round_to).alias("val"))
    )

    # spine: every bucket in [start, end) per tag combination
    spine_time = F.explode(
        F.sequence(
            F.lit(start).cast("timestamp"),
            F.lit(end).cast("timestamp") - F.expr(f"INTERVAL {step}"),
            F.expr(f"INTERVAL {step}"),
        )
    ).alias("bucket")
    if tags:
        spine = bucketed.select(*tags).distinct().select(*tags, spine_time)
    else:
        spine = bucketed.sparkSession.range(1).select(spine_time)

    out = spine.join(bucketed, on=[*tags, "bucket"], how="left")

    if keep_last_value:
        w = Window.partitionBy(*tags).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        out = out.withColumn("val", F.last("val", ignorenulls=True).over(w))
    if transform_null is not None:
        out = out.withColumn("val", F.coalesce(F.col("val"), F.lit(float(transform_null))))
    return out
