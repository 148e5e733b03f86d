"""Funnel aggregations: event-sequence analytics over (time, event) pairs.

Reference semantics: AggregationFunctionType FUNNELMAXSTEP /
FUNNELCOMPLETECOUNT / FUNNELMATCHSTEP / FUNNELCOUNT
(pinot-segment-spi/.../AggregationFunctionType.java:193-203; impls in
pinot-core/.../query/aggregation/function/funnel/). A funnel is an ordered
list of step predicates; per entity we find how deep the ordered sequence
of matching events goes (each step strictly after the previous step's
match).

Spark-first design: a single shuffle on the entity key via
``applyInPandas`` (Arrow-batched). Events are pre-filtered to funnel
steps and pre-projected to (key, ts, step) before the shuffle so the
state per group is tiny; the per-group scan is a vectorized
first-match-after cascade, not a Python row loop over raw events.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _step_tagged(df: DataFrame, key: str, time_col: str, steps: list[Column]) -> DataFrame:
    """Project to (k, t, s): step index of each event = first matching
    predicate (1-based), rows matching no step dropped."""
    n_steps = len(steps)
    step_col = F.lit(0)
    for i, pred in enumerate(reversed(steps)):
        step_col = F.when(pred, F.lit(n_steps - i)).otherwise(step_col)
    return (
        df.select(F.col(key).alias("k"), F.col(time_col).alias("t"), step_col.alias("s"))
        .filter(F.col("s") > 0)
    )


def funnel_max_step(
    df: DataFrame,
    key: str,
    time_col: str,
    steps: list[Column],
    out_col: str = "max_step",
) -> DataFrame:
    """Per key: the deepest funnel step reached, in order, each step's
    event strictly after the previous step's. Returns (key, out_col).

    Single-shuffle, pure-JVM: step-tagged events group once per key into
    a time-sorted array, then a higher-order ``aggregate`` fold advances
    a (step, last_time) state — greedy earliest-match, which is optimal
    for ordered funnels. Shuffle volume is one slim (key, time, step)
    row per *matching* event; per-key state is bounded by that key's
    event count. The applyInPandas variant (funnel_max_step_pandas)
    remains for arbitrary per-group logic."""
    slim = _step_tagged(df, key, time_col, steps)
    events = F.array_sort(F.collect_list(F.struct("t", "s")))
    fold = F.aggregate(
        events,
        F.struct(
            F.lit(0).alias("step"),
            F.lit(None).cast("timestamp").alias("last_t"),
        ),
        lambda acc, e: F.when(
            (e["s"] == acc["step"] + 1)
            & ((acc["step"] == 0) | (e["t"] > acc["last_t"])),
            F.struct(
                (acc["step"] + 1).alias("step"), e["t"].alias("last_t")
            ),
        ).otherwise(acc),
        lambda acc: acc["step"],
    )
    return (
        slim.groupBy("k")
        .agg(fold.alias(out_col))
        .select(F.col("k").alias(key), F.col(out_col).cast("int").alias(out_col))
    )


def funnel_max_step_pandas(
    df: DataFrame,
    key: str,
    time_col: str,
    steps: list[Column],
    out_col: str = "max_step",
) -> DataFrame:
    """applyInPandas (Arrow-batched) funnel: same semantics as
    funnel_max_step, one group per key — the extension point for
    funnel variants the cascade can't express (FUNNELMATCHSTEP,
    FUNNELSTEPDURATIONSTATS per-event outputs)."""
    n_steps = len(steps)
    slim = _step_tagged(df, key, time_col, steps)
    schema = f"k {slim.schema['k'].dataType.simpleString()}, {out_col} int"

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t"], kind="mergesort")
        reached = 0
        last_t = None
        s = pdf["s"].to_numpy()
        t = pdf["t"].to_numpy()
        for step in range(1, n_steps + 1):
            if last_t is None:
                mask = s == step
            else:
                mask = (s == step) & (t > last_t)
            if not mask.any():
                break
            reached = step
            last_t = t[mask.argmax()]
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], out_col: [reached]})

    return (
        slim.groupBy("k")
        .applyInPandas(_one_group, schema=schema)
        .withColumnRenamed("k", key)
    )


def funnel_complete_count(
    df: DataFrame, key: str, time_col: str, steps: list[Column]
) -> DataFrame:
    """Count of keys that completed the whole funnel. Returns a 1-row
    DataFrame (complete_count bigint)."""
    ms = funnel_max_step(df, key, time_col, steps)
    return ms.agg(
        F.count(F.when(F.col("max_step") == len(steps), 1)).alias("complete_count")
    )


def funnel_step_times(
    df: DataFrame,
    key: str,
    time_col: str,
    steps: list[Column],
) -> DataFrame:
    """Per key: the match timestamp of each funnel step (t1..tN, NULL once
    the chain breaks), same strictly-after greedy semantics as
    funnel_max_step, as one single-shuffle fold accumulating the matched
    times. Feeds FUNNELSTEPDURATIONSTATS
    (AggregationFunctionType.java:197)."""
    n_steps = len(steps)
    slim = _step_tagged(df, key, time_col, steps)
    events = F.array_sort(F.collect_list(F.struct("t", "s")))
    fold = F.aggregate(
        events,
        F.array().cast("array<timestamp>"),  # matched step times so far
        lambda acc, e: F.when(
            (e["s"] == F.size(acc) + 1)
            & ((F.size(acc) == 0) | (e["t"] > F.element_at(acc, -1))),
            F.concat(acc, F.array(e["t"])),
        ).otherwise(acc),
    )
    out = slim.groupBy("k").agg(fold.alias("__times"))
    return out.select(
        F.col("k").alias(key),
        *[F.element_at("__times", i).alias(f"t{i}") for i in range(1, n_steps + 1)],
    )
