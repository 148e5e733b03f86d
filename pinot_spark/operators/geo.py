"""Geometry aggregation operators.

Reference: StUnionAggregationFunction.java (AggregationFunctionType
STUNION :164) — Pinot folds JTS geometry unions per segment and merges
at the broker.  The Column-expression fast path for POINT columns lives
in functions/aggregate.py (pure codegen'd set union); this module adds
the general WKT fold for polygon/multipolygon (and mixed point)
columns, powered by the Greiner-Hormann clipping in
functions/polyclip.py via functions.scalar.st_union_wkt.

Build shape mirrors operators/theta.py: per-partition folds via
mapInPandas (no shuffle of raw rows — each partition emits ONE WKT
partial), then tree-reduce rounds (isqrt repartition + re-fold, the
theta.py:162 pattern) until one partition holds the result, so the
driver receives exactly ONE final WKT regardless of partition count —
partials can be large MULTIPOLYGONs, and a serial driver fold over
hundreds of them would be the broker bottleneck at 100 TB. Geometric
union is associative and commutative, so partition boundaries can't
change the result (up to ring ordering, which st_union_wkt keeps
deterministic by construction).
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# above this many partials, merge in distributed tree rounds first
_TREE_FANOUT = 8


def _tree_partials(df: DataFrame, col: str) -> DataFrame:
    """Per-partition WKT union folds, tree-reduced (isqrt repartition
    rounds) down to ≤ ``_TREE_FANOUT`` partitions of ≤1 partial each."""
    from pinot_spark.functions.scalar import st_union_wkt

    def _fold(batches):
        acc = None
        for pdf in batches:
            for w in pdf["g"]:
                if w is None:
                    continue
                acc = w if acc is None else st_union_wkt(acc, w)
        if acc is not None:
            yield pd.DataFrame({"g": [acc]})

    partials = (
        df.select(F.col(col).alias("g"))
        .filter(F.col("g").isNotNull())
        .mapInPandas(_fold, schema="g string")
    )
    n = df.rdd.getNumPartitions()
    while n > _TREE_FANOUT:
        n = max(1, math.isqrt(n))
        partials = partials.repartition(n).mapInPandas(_fold, schema="g string")
    return partials


def st_union_geoms(df: DataFrame, col: str) -> str | None:
    """Aggregate geometric union of a WKT geometry column → WKT string
    (None for an empty/all-null input).  Degenerate member pairs raise
    NotImplementedError (see functions/polyclip.py).

    The driver never folds a long chain: it receives at most
    ``_TREE_FANOUT`` partials (usually one) after the executor-side tree
    reduction."""
    from pinot_spark.functions.scalar import st_union_wkt

    out = None
    for r in _tree_partials(df, col).collect():
        out = r.g if out is None else st_union_wkt(out, r.g)
    return out
