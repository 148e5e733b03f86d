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
partial), then a driver fold over <= num_partitions partials: the
segment → broker merge. Geometric union is associative and commutative,
so partition boundaries can't change the result (up to ring ordering,
which st_union_wkt keeps deterministic by construction).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def st_union_geoms(df: DataFrame, col: str) -> str | None:
    """Aggregate geometric union of a WKT geometry column → WKT string
    (None for an empty/all-null input).  Degenerate member pairs raise
    NotImplementedError (see functions/polyclip.py)."""
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

    parts = (
        df.select(F.col(col).alias("g"))
        .filter(F.col("g").isNotNull())
        .mapInPandas(_fold, schema="g string")
        .collect()
    )
    out = None
    for r in parts:
        out = r.g if out is None else st_union_wkt(out, r.g)
    return out
