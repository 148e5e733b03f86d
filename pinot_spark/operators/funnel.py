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


def _ts_col(df: DataFrame, time_col: str):
    """Time column as TIMESTAMP: integral columns are EPOCH MILLIS in
    the reference's funnel functions (WindowFunnelTest feeds raw LONG
    millis), so they go through timestamp_millis — a bare
    cast("timestamp") would read them as SECONDS."""
    dt = df.schema[time_col].dataType.simpleString()
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return F.timestamp_millis(F.col(time_col))
    return F.col(time_col).cast("timestamp")


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


def funnel_complete_count_window(
    df: DataFrame,
    key: str,
    time_col: str,
    window_ms: int,
    steps: list[Column],
    modes: set[str] | None = None,
) -> DataFrame:
    """Windowed FUNNELCOMPLETECOUNT
    (funnel/window/FunnelCompleteCountAggregationFunction.java): keys
    whose max windowed step reaches the final step, with the same modes
    as funnel_max_step_window."""
    ms = funnel_max_step_window(df, key, time_col, window_ms, steps, modes)
    return ms.agg(
        F.count(F.when(F.col("max_step") == len(steps), 1)).alias("complete_count")
    )


def funnel_count(
    df: DataFrame,
    key: str,
    steps: list[Column],
    out_col: str = "step_counts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """FUNNELCOUNT(STEPS(...), CORRELATE_BY(key)) — per-step conversion
    counts as progressive set intersections: count[i] = |S_1 ∩ … ∩ S_i|
    where S_i is the set of keys with any event matching step i.  NO time
    ordering — exactly SetMergeStrategy.extractFinalResult
    (funnel/SetMergeStrategy.java: retainAll cascade).

    Returns a 1-row DataFrame with ``out_col`` = array<bigint>.

    With ``group_cols`` the counts are computed independently per group
    (the reference's ``GROUP BY dims`` form — each group intersects its
    own correlate-key sets).

    Scale shape: one groupBy(group_cols + key) with per-step MAX flags
    (map-side partial aggregation — the shuffle carries one row per
    (group, key), not per event), then a partial/final sum of cumulative
    ANDs per group.  This is the Spark analog of Pinot's per-segment
    bitmap sets + broker merge.
    """
    n = len(steps)
    g = list(group_cols or [])
    flags = df.groupBy(*g, F.col(key).alias("k")).agg(
        *[F.max(F.when(p, 1).otherwise(0)).alias(f"m{i}") for i, p in enumerate(steps)]
    )
    cum = []
    acc = None
    for i in range(n):
        acc = F.col(f"m{i}") if acc is None else (acc * F.col(f"m{i}"))
        cum.append(F.sum(acc).cast("long").alias(f"c{i}"))
    return (
        flags.groupBy(*g)
        .agg(*cum)
        .select(*g, F.array(*[F.col(f"c{i}") for i in range(n)]).alias(out_col))
    )


def funnel_events_eval(
    df: DataFrame,
    key: str,
    time_col: str,
    window_ms: int,
    steps: list[Column],
    extra_cols: list[str],
    out_col: str = "matched_events",
) -> DataFrame:
    """FUNNELEVENTSFUNCTIONEVAL (AggregationFunctionType.java:199;
    funnel/window/FunnelEventsFunctionEvalAggregationFunction.java):
    per key, run the default-mode sliding-window funnel match and return
    the extra-field values of every matched funnel's step events,
    flattened to array<string> (one group of len(steps)*len(extra_cols)
    strings per completed match; the reference's leading
    assignment-header string is a wire-format detail and omitted).

    Default-mode algorithm mirrored from extractFinalResult: windows
    anchor at a step-1 event; events advance maxStep when their step
    equals the next expected; reaching the last step emits the matched
    window's first per-step events and re-anchors.

    Scale shape: events are pre-filtered to step matches and pre-projected
    to (key, ts, step, extras) before the single applyInPandas shuffle —
    Arrow-batched, state per group bounded by that key's matching events.
    """
    n_steps = len(steps)
    step_col = F.lit(-1)
    for i, pred in enumerate(reversed(steps)):
        step_col = F.when(pred, F.lit(n_steps - 1 - i)).otherwise(step_col)
    slim = df.select(
        F.col(key).alias("k"),
        _ts_col(df, time_col).alias("t"),
        step_col.alias("s"),
        *[F.col(c).cast("string").alias(f"x{i}") for i, c in enumerate(extra_cols)],
    ).filter(F.col("s") >= 0)
    n_extra = len(extra_cols)
    schema = f"k {slim.schema['k'].dataType.simpleString()}, {out_col} array<string>"

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "s"], kind="mergesort")
        ts = (pdf["t"].astype("int64") // 1_000_000).to_numpy()  # epoch millis
        ss = pdf["s"].to_numpy()
        extras = [pdf[f"x{i}"].to_numpy() for i in range(n_extra)]
        out: list[str] = []
        i, n = 0, len(pdf)
        while i < n:
            if ss[i] != 0:
                i += 1
                continue
            window_end = ts[i] + window_ms
            max_step, first_idx = 0, {}
            j = i
            matched = False
            while j < n and ts[j] < window_end:
                if ss[j] == max_step:
                    first_idx[max_step] = j
                    max_step += 1
                    if max_step == n_steps:
                        for st in range(n_steps):
                            for e in range(n_extra):
                                out.append(str(extras[e][first_idx[st]]))
                        matched = True
                        break
                j += 1
            # matched events are consumed (reference pops the sliding
            # window past them); an unmatched anchor just advances
            i = j + 1 if matched else i + 1
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], out_col: [out]})

    return (
        slim.groupBy("k")
        .applyInPandas(_one_group, schema=schema)
        .withColumnRenamed("k", key)
    )


def funnel_max_step_window(
    df: DataFrame,
    key: str,
    time_col: str,
    window_ms: int,
    steps: list[Column],
    modes: set[str] | None = None,
    out_col: str = "max_step",
    max_step_duration: int = 0,
) -> DataFrame:
    """Windowed FUNNELMAXSTEP with modes (reference
    funnel/window/FunnelMaxStepAggregationFunction.java:30-96 +
    FunnelBaseAggregationFunction.FunnelModes):

    - ``strict_order``: any out-of-sequence event ends the attempt,
    - ``strict_increase``: same-timestamp events don't advance steps,
    - ``strict_deduplication``: a repeat of the just-matched step ends
      the attempt,
    - ``keep_all``: NON-matching events also enter the window (step -1
      dummies, FunnelBaseAggregationFunction.java:145), so under
      strict modes they break the attempt.

    ``max_step_duration`` > 0 bounds the gap between CONSECUTIVE
    window events (fillWindow:290-295): the first too-late event stops
    the window fill.

    Per key: every window anchored at a step-1 event is processed with
    the reference's processWindow loop; the answer is the max step over
    all windows.  Same pre-filtered single-shuffle applyInPandas shape
    as funnel_events_eval.
    """
    modes = modes or set()
    strict_dedup = "strict_deduplication" in modes
    strict_order = "strict_order" in modes
    strict_increase = "strict_increase" in modes
    keep_all = "keep_all" in modes
    n_steps = len(steps)
    step_col = F.lit(-1)
    for i, pred in enumerate(reversed(steps)):
        step_col = F.when(pred, F.lit(n_steps - 1 - i)).otherwise(step_col)
    slim = df.select(
        F.col(key).alias("k"),
        _ts_col(df, time_col).alias("t"),
        step_col.alias("s"),
    )
    if not keep_all:
        slim = slim.filter(F.col("s") >= 0)
    schema = f"k {slim.schema['k'].dataType.simpleString()}, {out_col} int"

    def _process_window(ts, ss, start, n):
        window_end = ts[start] + window_ms
        max_step, prev_ts = 0, -1
        j = start
        while j < n and ts[j] < window_end:
            if max_step_duration > 0 and j > start and (
                ts[j] - ts[j - 1] > max_step_duration
            ):
                return max_step
            cur = ss[j]
            if strict_dedup and cur == max_step - 1:
                return max_step
            if strict_order and cur != max_step:
                return max_step
            if strict_increase and prev_ts == ts[j]:
                j += 1
                continue
            if max_step == cur:
                max_step += 1
                prev_ts = ts[j]
            if max_step == n_steps:
                break
            j += 1
        return max_step

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "s"], kind="mergesort")
        ts = (pdf["t"].astype("int64") // 1_000_000).to_numpy()
        ss = pdf["s"].to_numpy()
        n = len(pdf)
        best = 0
        for i in range(n):
            if ss[i] != 0:
                continue
            best = max(best, _process_window(ts, ss, i, n))
            if best == n_steps:
                break
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], out_col: [best]})

    return (
        slim.groupBy("k")
        .applyInPandas(_one_group, schema=schema)
        .withColumnRenamed("k", key)
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


def funnel_completed_rounds_window(
    df: DataFrame,
    key: str,
    time_col: str,
    window_ms: int,
    steps: list[Column],
    modes: set[str] | None = None,
    out_col: str = "complete_rounds",
) -> DataFrame:
    """Per-key FUNNELCOMPLETECOUNT — the number of completed funnel
    rounds, mirroring the reference loop exactly (funnel/window/
    FunnelCompleteCountAggregationFunction.java:48-108 +
    FunnelBaseAggregationFunction.fillWindow:267-300): windows anchor at
    a step-1 event, the whole window is scanned counting rounds (the
    step counter resets after each completion and the window start
    advances past consumed events), then the window slides.

    Same pre-filtered single-shuffle applyInPandas shape as
    funnel_max_step_window; per-group state is bounded by that key's
    matching events.
    """
    from collections import deque

    modes = modes or set()
    strict_dedup = "strict_deduplication" in modes
    strict_order = "strict_order" in modes
    strict_increase = "strict_increase" in modes
    n_steps = len(steps)
    step_col = F.lit(-1)
    for i, pred in enumerate(reversed(steps)):
        step_col = F.when(pred, F.lit(n_steps - 1 - i)).otherwise(step_col)
    slim = df.select(
        F.col(key).alias("k"),
        _ts_col(df, time_col).alias("t"),
        step_col.alias("s"),
    ).filter(F.col("s") >= 0)
    schema = f"k {slim.schema['k'].dataType.simpleString()}, {out_col} int"

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "s"], kind="mergesort")
        ts = (pdf["t"].astype("int64") // 1_000_000).to_numpy()
        ss = pdf["s"].to_numpy()
        n = len(pdf)
        total = 0
        win: deque[int] = deque()
        i = 0
        while i < n:
            # fillWindow: head must be a step-1 event
            while win and ss[win[0]] != 0:
                win.popleft()
            if not win:
                while i < n and ss[i] != 0:
                    i += 1
                if i >= n:
                    break
                win.append(i)
                i += 1
            window_end = ts[win[0]] + window_ms
            while i < n and ts[i] < window_end:
                win.append(i)
                i += 1
            # scan the whole window counting completed rounds
            max_step, prev_ts = 0, -1
            window_start = ts[win[0]]
            for j in win:
                cur = ss[j]
                if strict_dedup and cur == max_step - 1:
                    max_step = 0
                if strict_order and cur != max_step:
                    max_step = 0
                if strict_increase and prev_ts == ts[j]:
                    continue
                prev_ts = ts[j]
                if max_step == cur:
                    max_step += 1
                if max_step == n_steps:
                    total += 1
                    max_step = 0
                    window_start = ts[j]
            if win:
                win.popleft()
            while win and ts[win[0]] < window_start:
                win.popleft()
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], out_col: [total]})

    return (
        slim.groupBy("k")
        .applyInPandas(_one_group, schema=schema)
        .withColumnRenamed("k", key)
    )


def funnel_step_duration_stats_window(
    df: DataFrame,
    key: str,
    time_col: str,
    window_ms: int,
    steps: list[Column],
    duration_functions: list[str],
    modes: set[str] | None = None,
    out_col: str = "duration_stats",
) -> DataFrame:
    """Per-key FUNNELSTEPDURATIONSTATS, mirroring the reference loop
    (funnel/window/FunnelStepDurationStatsAggregationFunction.java:
    95-218): per complete window the first timestamp of each step level
    is collected and the durations between consecutive levels feed
    per-step aggregators; the output is the flat double array
    [fn(step0), .., fn(stepN-1)] per duration function in declaration
    order. COUNT emits the reached-flag (0/1); other functions emit the
    reference's 0.0 null placeholder when no funnel matched or at the
    last step; keys with no matched funnel return an empty array unless
    COUNT was requested (_canSkipNonMatchedFunnel). MEDIAN/MIN/MAX/
    PERCENTILEnn are exact (the reference's QuantileDigest is built with
    maxError=0).

    Same pre-filtered single-shuffle applyInPandas shape as the other
    window funnels.
    """
    import math
    from collections import deque

    fns = [f.strip().upper() for f in duration_functions]
    for f in fns:
        if f in ("AVG", "MEDIAN", "MIN", "MAX", "COUNT"):
            continue
        if f.startswith("PERCENTILE"):
            q = float(f[len("PERCENTILE"):]) / 100.0
            if not 0 <= q <= 1:
                raise ValueError(f"invalid percentile duration function {f}")
            continue
        raise ValueError(f"unsupported duration function {f}")
    can_skip = "COUNT" not in fns
    modes = modes or set()
    strict_dedup = "strict_deduplication" in modes
    strict_order = "strict_order" in modes
    strict_increase = "strict_increase" in modes
    n_steps = len(steps)
    step_col = F.lit(-1)
    for i, pred in enumerate(reversed(steps)):
        step_col = F.when(pred, F.lit(n_steps - 1 - i)).otherwise(step_col)
    slim = df.select(
        F.col(key).alias("k"),
        _ts_col(df, time_col).alias("t"),
        step_col.alias("s"),
    ).filter(F.col("s") >= 0)
    schema = f"k {slim.schema['k'].dataType.simpleString()}, {out_col} array<double>"

    def _process(ts, ss, win):
        max_step, prev_ts = 0, -1
        for j in win:
            cur = ss[j]
            if strict_dedup and cur == max_step - 1:
                return max_step
            if strict_order and cur != max_step:
                return max_step
            if strict_increase and prev_ts == ts[j]:
                continue
            if max_step == cur:
                max_step += 1
                prev_ts = ts[j]
            if max_step == n_steps:
                return max_step
        return max_step

    def _quantile(sorted_d, q):
        if not sorted_d:
            return 0.0
        return sorted_d[max(0, math.ceil(q * len(sorted_d)) - 1)]

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "s"], kind="mergesort")
        ts = (pdf["t"].astype("int64") // 1_000_000).to_numpy()
        ss = pdf["s"].to_numpy()
        n = len(pdf)
        counts = [0] * n_steps
        durs: list[list[float]] = [[] for _ in range(n_steps)]
        matched = False
        win: deque[int] = deque()
        i = 0
        while i < n:
            while win and ss[win[0]] != 0:
                win.popleft()
            if not win:
                while i < n and ss[i] != 0:
                    i += 1
                if i >= n:
                    break
                win.append(i)
                i += 1
            window_end = ts[win[0]] + window_ms
            while i < n and ts[i] < window_end:
                win.append(i)
                i += 1
            max_steps = _process(ts, ss, win)
            if max_steps == n_steps:
                st: list[int] = []
                for j in win:
                    if len(st) <= ss[j]:
                        st.append(int(ts[j]))
                for x in range(len(st) - 1):
                    d = float(st[x + 1] - st[x])
                    counts[x] = 1
                    durs[x].append(d)
                counts[n_steps - 1] = 1
                matched = True
            else:
                for x in range(max_steps):
                    counts[x] = 1
            if win:
                win.popleft()
        if can_skip and not matched:
            out: list[float] = []
        else:
            out = []
            for step in range(n_steps):
                sd = sorted(durs[step])
                for f in fns:
                    if f == "COUNT":
                        out.append(float(counts[step]))
                    elif not matched or step == n_steps - 1:
                        out.append(0.0)  # reference NullValuePlaceHolder.DOUBLE
                    elif f == "AVG":
                        out.append(sum(sd) / len(sd) if sd else float("nan"))
                    elif f == "MEDIAN":
                        out.append(_quantile(sd, 0.5))
                    elif f == "MIN":
                        out.append(_quantile(sd, 0.0))
                    elif f == "MAX":
                        out.append(_quantile(sd, 1.0))
                    else:
                        out.append(_quantile(sd, float(f[len("PERCENTILE"):]) / 100.0))
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], out_col: [out]})

    return (
        slim.groupBy("k")
        .applyInPandas(_one_group, schema=schema)
        .withColumnRenamed("k", key)
    )
