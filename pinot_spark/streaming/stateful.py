"""Custom stateful streaming operators via applyInPandasWithState.

Pinot's realtime engine keeps per-partition mutable state while
consuming (RealtimeSegmentDataManager.java:129 — consuming-segment
row counts, upsert metadata managers); Spark's equivalent surface for
*custom* keyed streaming state is ``applyInPandasWithState``
(Arrow-batched, state store checkpointed). Built-in watermark/window
aggregations cover the declarative cases (streaming/ingest.py); this
module holds the imperative-state escape hatch, demonstrated with
gap-based sessionization (an operator Pinot itself lacks — funnel-like
analytics there run at query time instead).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # only for type hints; no runtime dependency
    pass

_OUT_SCHEMA = "k BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events INT"
_STATE_SCHEMA = "start_us BIGINT, last_us BIGINT, n INT"


def sessionize(
    stream: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Per-key gap sessionization: a session closes when the next event
    is more than ``gap_seconds`` after the previous one; closed sessions
    are emitted (append mode), the trailing open session stays in the
    state store across micro-batches.

    Output: (k, session_start, session_end, n_events).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        closed: list[tuple] = []
        for pdf in pdfs:
            for ts in sorted(pdf[time_col]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is not None and t_us - last_us > gap_us:
                    closed.append((k, start_us, last_us, n))
                    start_us, n = t_us, 0
                if start_us is None:
                    start_us = t_us
                last_us, n = t_us, n + 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    "k": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream.select(stream[key].alias("k"), stream[time_col])
        .groupBy("k")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
