"""Skew-aware execution helpers: salting + two-phase aggregation.

Pinot shards per-segment and merges at the broker, so a hot group key
never concentrates on one worker; in Spark a hot key lands on one
shuffle partition. AQE's skew-join splitting (enabled in session.py)
handles sort-merge joins at runtime; the helpers here cover the two
remaining shapes:

- ``two_phase_count_distinct``: COUNT(DISTINCT x) over skewed groups —
  dedupe on (group, x) first (spreads a hot group across partitions by
  x), then count per group. Avoids Spark's expand-based distinct
  aggregate concentrating a hot group's values in one task.
- ``salted_join``: broadcast-averse skewed equi-join — explode the
  small side into N salted copies and salt the big side's key
  deterministically, so one hot key spreads over N tasks
  (the classic salting pattern; SURVEY.md §4.3 scale notes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SALT = "__salt"


def two_phase_count_distinct(
    df: DataFrame, group_cols: list[str], col: str, out_col: str = "dc"
) -> DataFrame:
    """Exact COUNT(DISTINCT col) GROUP BY group_cols, skew-safe: phase 1
    dedupes (group, col) pairs — partitioned by the pair, so a hot group
    spreads; phase 2 counts pairs per group (tiny)."""
    return (
        df.select(*group_cols, col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(col).alias(out_col))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed and ``small``
    is too large to broadcast: replicate ``small`` num_salts times and
    route each big row to one replica by a deterministic hash salt.
    Shuffle of the hot key spreads across num_salts tasks; results are
    identical to a plain join."""
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    # Salt must vary per ROW, not per payload: hashing only the non-key
    # columns would land every identical-payload row of a hot key on one
    # salt, defeating the spread. Mixing monotonically_increasing_id()
    # in keeps the salt rand()-free (re-executable under task retries
    # given stable input partitioning) while spreading duplicates.
    salted_big = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(
                *[c for c in big.columns if c != on],
                F.monotonically_increasing_id(),
            ),
            F.lit(num_salts),
        ),
    )
    return salted_big.join(salted_small, on=[on, _SALT], how=how).drop(_SALT)
