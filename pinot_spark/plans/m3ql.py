"""M3QL-style time-series pipeline language.

Pinot's time-series engine is language-pluggable
(pinot-timeseries/pinot-timeseries-spi); the shipped M3QL plugin
(pinot-plugins/pinot-timeseries-lang/pinot-timeseries-m3ql —
M3TimeSeriesPlanner.java) parses a pipe-separated pipeline:

    fetch tag=value tag2=value2
      | summarize <step> <sum|min|max|avg|count> [by tagKey ...]
      | transformNull <default>
      | keepLastValue

Each stage maps onto the range-query DataFrame pipeline
(plans/timeseries.range_query): fetch → filter, summarize → bucket +
per-series agg, transformNull/keepLastValue → post-transforms. The
result is (tags?, bucket, val) — the TimeSeriesBlock shape.
"""

from __future__ import annotations

import re
import shlex

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pinot_spark.plans.timeseries import range_query

_STEP_RE = re.compile(r"^(\d+)(s|m|h|d)$")
_STEP_UNITS = {"s": "second", "m": "minute", "h": "hour", "d": "day"}


class M3qlError(ValueError):
    pass


def _parse_step(tok: str) -> str:
    m = _STEP_RE.match(tok)
    if not m:
        raise M3qlError(f"bad step {tok!r} (expected e.g. 1h, 30m, 10s)")
    n, u = m.groups()
    return f"{n} {_STEP_UNITS[u]}"


def execute(
    df: DataFrame,
    program: str,
    time_col: str,
    value_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Run an M3QL-ish pipeline over ``df`` in [start, end)."""
    stages = [s.strip() for s in program.split("|") if s.strip()]
    if not stages or not stages[0].startswith("fetch"):
        raise M3qlError("pipeline must start with 'fetch'")

    # fetch tag=value ... → equality filters
    fetch_args = shlex.split(stages[0])[1:]
    for cond in fetch_args:
        if "=" not in cond:
            raise M3qlError(f"bad fetch filter {cond!r} (expected tag=value)")
        k, v = cond.split("=", 1)
        df = df.filter(F.col(k) == v)

    step, agg, tags = "1 hour", "sum", []
    transform_null: float | None = None
    keep_last = False
    for stage in stages[1:]:
        toks = shlex.split(stage)
        op = toks[0].lower()
        if op == "summarize":
            step = _parse_step(toks[1])
            agg = toks[2].lower()
            if len(toks) > 3:
                if toks[3].lower() != "by":
                    raise M3qlError(f"expected 'by' in {stage!r}")
                tags = toks[4:]
        elif op == "transformnull":
            transform_null = float(toks[1]) if len(toks) > 1 else 0.0
        elif op == "keeplastvalue":
            keep_last = True
        else:
            raise M3qlError(f"unknown pipeline op {op!r}")

    return range_query(
        df,
        time_col=time_col,
        value_col=value_col,
        start=start,
        end=end,
        step=step,
        agg=agg,
        tags=tags,
        transform_null=transform_null,
        keep_last_value=keep_last,
    )
