"""AS-OF join: for each left row, the latest right row at-or-before (or
strictly-before / at-or-after / strictly-after) the left row's time, per
join key.

Reference semantics: pinot-query-runtime/.../operator/AsofJoinOperator.java:37
(match-condition types at :59-64) — LEFT_ASOF join with one equi-key set
plus one time inequality.

Spark-first design (scales to 100 TB): instead of a range join (which
explodes) or a per-key collect, we UNION the two sides tagged by origin,
sort within each key partition once, and carry the right-side payload
forward with ``last(..., ignorenulls=True)`` over a running window.
Cost: one shuffle on the join keys + one sort — the same cost as the
underlying window aggregation; no row explosion, skew handled by AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_TAG = "__asof_tag"
_T = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    strict: bool = False,
    suffix: str = "",
) -> DataFrame:
    """LEFT AS-OF join ``left`` with ``right`` on equi-keys ``on`` and the
    time inequality implied by ``direction``/``strict``:

    - backward, strict=False: right_time <= left_time (latest such row)
    - backward, strict=True : right_time <  left_time
    - forward,  strict=False: right_time >= left_time (earliest such row)
    - forward,  strict=True : right_time >  left_time

    Right payload columns (everything except keys + right_time) are
    appended, ``suffix``-renamed, NULL when no match (LEFT semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    # matched right_time is part of the output payload (like DuckDB ASOF)
    payload = [c for c in right.columns if c not in on]
    out_names = [c + suffix for c in payload]

    # Tag ordering decides tie behavior at equal timestamps:
    #   backward inclusive → right row sorts BEFORE left (visible to it)
    #   backward strict    → right row sorts AFTER  left (invisible)
    # forward is the mirror image under a descending scan.
    right_first = not strict
    # a NULL time can never satisfy the match inequality and a NULL key
    # never equi-joins: drop such right rows, and (below) order NULLs
    # FIRST in both scan directions so NULL-time left rows see no right
    # payload (AsOfJoin.json nulls group). NULL-key LEFT rows share a
    # window partition but, with all NULL-key right rows gone, find no
    # payload there — exactly LEFT semantics.
    right = right.filter(F.col(right_time).isNotNull())
    for k in on:
        right = right.filter(F.col(k).isNotNull())

    # Round-18 slim shape (guide §2.3 project before the exchange): when
    # the two time columns share a dtype, the LEFT's own time column
    # doubles as the union's sort column (right_time is renamed into it
    # pre-union) and the matched right_time payload is rebuilt after the
    # shuffle as last(time over right rows) — so neither a separate
    # __asof_t column nor a right-time payload column crosses the
    # exchange, and the final select reuses the tag attribute instead of
    # aliasing a copy of it.  For the benched events asof this cuts the
    # exchanged row from 8 fields to 6 (plans/r18/asof_join_backward_*).
    # Any projection placed after the window would be pushed below the
    # exchange by Catalyst and re-widen the row, which is why the slim
    # shape avoids reconstruction projections entirely; with differing
    # time dtypes the union would coerce the left column's type (and a
    # post-filter cast back could not be placed above the exchange), so
    # that case keeps the proven explicit-__asof_t shape below.
    same_time_type = (
        left.schema[left_time].dataType == right.schema[right_time].dataType
        and left_time not in on
    )
    if same_time_type:
        tcol = left_time
        carry_payload = [c for c in payload if c != right_time]
        carry_out = [c + suffix for c in carry_payload]
        l_tagged = left.select(
            *[F.col(c) for c in left.columns],
            F.lit(1).alias(_TAG),
            *[
                F.lit(None).cast(right.schema[c].dataType).alias(n)
                for c, n in zip(carry_payload, carry_out)
            ],
        )
        r_tagged = right.select(
            *[F.col(c) for c in on],
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in on and c != left_time
            ],
            F.col(right_time).alias(tcol),
            F.lit(0 if right_first else 2).alias(_TAG),
            *[F.col(c).alias(n) for c, n in zip(carry_payload, carry_out)],
        )
    else:
        tcol = _T
        carry_payload = payload
        carry_out = out_names
        l_tagged = left.select(
            *[F.col(c) for c in left.columns],
            F.col(left_time).alias(_T),
            F.lit(1).alias(_TAG),
            *[
                F.lit(None).cast(right.schema[c].dataType).alias(n)
                for c, n in zip(payload, out_names)
            ],
        )
        r_tagged = right.select(
            *[F.col(c) for c in on],
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in on
            ],
            F.col(right_time).alias(_T),
            F.lit(0 if right_first else 2).alias(_TAG),
            *[F.col(c).alias(n) for c, n in zip(payload, out_names)],
        )

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col(tcol).asc_nulls_first(), F.col(_TAG).asc()]
    else:
        order = [F.col(tcol).desc_nulls_first(), F.col(_TAG).asc()]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    outs = []
    for c, n in zip(payload, out_names):
        if c == right_time and same_time_type:
            outs.append(
                F.last(
                    F.when(F.col(_TAG) != 1, F.col(tcol)), ignorenulls=True
                )
                .over(w)
                .alias(n)
            )
        else:
            outs.append(F.last(n, ignorenulls=True).over(w).alias(n))
    filled = unioned.select(*left.columns, F.col(_TAG), *outs)
    return filled.filter(F.col(_TAG) == 1).drop(_TAG)
