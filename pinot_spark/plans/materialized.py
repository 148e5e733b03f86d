"""Materialized aggregate rollups — the star-tree index analog.

Pinot's star-tree (pinot-spi/.../config/table/StarTreeIndexConfig.java,
pinot-core/.../startree/StarTreeUtils.java:178 ``isFitForStarTree``)
pre-aggregates measures along dimension prefixes and answers a group-by
from the rollup when every queried dimension and aggregate is covered.
Pinot's own newer ``pinot-materialized-view/`` module is the same idea as
explicit tables + broker rewrite.

Spark-first shape: the rollup is a parquet table of partial aggregates
(count / sum / min / max per dimension combination); a query routes to it
when its GROUP BY dims ⊆ rollup dims and its aggregates derive from the
stored measures (COUNT→sum of partial counts, SUM→sum of partial sums,
AVG→sum/sum, MIN/MAX→min/max). At 100 TB the rollup is typically 100-10000×
smaller than the fact table, and re-aggregation of partials is exactly
Spark's partial/final contract, so correctness is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# measure → (partial columns stored, final re-aggregation)
_SUPPORTED = ("count", "sum", "min", "max", "avg")

# One rollup-table resolution per (session, path) — the same contract as
# catalog._TABLE_CACHE: a real broker resolves an MV against the
# metastore once, not by re-listing parquet footers on every routed
# query (round-17 optimization; guide §6 file listing).  Plan-level
# cache only: every query still computes from the parquet files.
_MV_DF_CACHE: dict[tuple[int, str], DataFrame] = {}


def _read_mv(spark: SparkSession, path: str) -> DataFrame:
    key = (id(spark), path)
    df = _MV_DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _MV_DF_CACHE[key] = df
    return df


@dataclass
class AggregateMV:
    """One materialized rollup: ``dims`` group-by columns and per-measure
    partial aggregates over ``measure_cols``."""

    name: str
    path: str
    dims: list[str]
    measure_cols: list[str]

    def partial_name(self, agg: str, col: str) -> str:
        return f"__{agg}_{col}"


def create_aggregate_mv(
    df: DataFrame,
    name: str,
    path: str,
    dims: list[str],
    measure_cols: list[str],
) -> AggregateMV:
    """Build + write the rollup (the star-tree build step —
    startree/v2 builders). Partial aggregates per dimension combination:
    count(*), and sum/min/max per measure (avg derives from sum/count)."""
    mv = AggregateMV(name=name, path=path, dims=dims, measure_cols=measure_cols)
    aggs = [F.count("*").alias("__count")]
    for c in measure_cols:
        aggs += [
            F.sum(c).alias(mv.partial_name("sum", c)),
            F.min(c).alias(mv.partial_name("min", c)),
            F.max(c).alias(mv.partial_name("max", c)),
        ]
    df.groupBy(*dims).agg(*aggs).write.mode("overwrite").parquet(path)
    return mv


def mv_answers(mv: AggregateMV, dims: list[str], aggs: list[tuple[str, str]]) -> bool:
    """Can this rollup answer GROUP BY dims + aggs?  (StarTreeUtils
    ``isFitForStarTree`` predicate: dims ⊆ tree dims, measures stored.)"""
    if not set(dims) <= set(mv.dims):
        return False
    for agg, col in aggs:
        if agg not in _SUPPORTED:
            return False
        if agg != "count" and col not in mv.measure_cols:
            return False
    return True


def query_rollup(
    spark: SparkSession,
    mv: AggregateMV,
    dims: list[str],
    aggs: list[tuple[str, str, str]],
    filter_expr=None,
) -> DataFrame:
    """Answer GROUP BY ``dims`` with ``aggs`` = [(agg, col, alias)] from
    the rollup. Filters may reference rollup dims only (the star-tree
    constraint: predicates must be on tree dimensions)."""
    if not mv_answers(mv, dims, [(a, c) for a, c, _ in aggs]):
        raise ValueError(f"rollup {mv.name} cannot answer dims={dims} aggs={aggs}")
    df = _read_mv(spark, mv.path)
    if filter_expr is not None:
        df = df.filter(filter_expr)
    out = []
    for agg, col, alias in aggs:
        if agg == "count":
            out.append(F.sum("__count").alias(alias))
        elif agg == "sum":
            out.append(F.sum(mv.partial_name("sum", col)).alias(alias))
        elif agg == "min":
            out.append(F.min(mv.partial_name("min", col)).alias(alias))
        elif agg == "max":
            out.append(F.max(mv.partial_name("max", col)).alias(alias))
        elif agg == "avg":
            out.append(
                (F.sum(mv.partial_name("sum", col)) / F.sum("__count")).alias(alias)
            )
    return df.groupBy(*dims).agg(*out)


@dataclass
class MVCatalog:
    """Broker-side MV routing (MaterializedViewDdlHandler.java /
    BaseSingleStageBrokerRequestHandler.java:429-436 marker): pick the
    smallest registered rollup that can answer, else fall back to the
    base table."""

    mvs: list[AggregateMV] = field(default_factory=list)

    def register(self, mv: AggregateMV) -> None:
        self.mvs.append(mv)

    def route(
        self,
        spark: SparkSession,
        base: DataFrame,
        dims: list[str],
        aggs: list[tuple[str, str, str]],
        filter_expr=None,
        filter_cols: list[str] | None = None,
    ) -> DataFrame:
        """Rollup if possible (filters restricted to rollup dims),
        otherwise compute from base."""
        need = [(a, c) for a, c, _ in aggs]
        for mv in sorted(self.mvs, key=lambda m: len(m.dims)):
            if mv_answers(mv, dims, need) and set(filter_cols or []) <= set(mv.dims):
                return query_rollup(spark, mv, dims, aggs, filter_expr)
        df = base.filter(filter_expr) if filter_expr is not None else base
        out = []
        for agg, col, alias in aggs:
            fn = {"count": lambda c: F.count("*"), "sum": F.sum, "min": F.min,
                  "max": F.max, "avg": F.avg}[agg]
            out.append(fn(col).alias(alias))
        return df.groupBy(*dims).agg(*out)


# ---------------------------------------------------------------------------
# Round-13 star-tree parity extensions (StarTreeTest.java surface):
# MINMAXRANGE (derives from stored min/max partials), DISTINCTCOUNTBITMAP
# (per-combination distinct-value set partials, exact final union — the
# star-tree stores serialized RoaringBitmaps, StarTreeV2BuilderHelper),
# and the MV-column measures COUNTMV / SUMMV / AVGMV (star-tree 3 in the
# reference config pre-aggregates the exploded multi-value column).
# ---------------------------------------------------------------------------

_SUPPORTED_EXT = ("minmaxrange", "distinctcountbitmap", "countmv", "summv", "avgmv")


def create_aggregate_mv_ext(
    df: DataFrame,
    name: str,
    path: str,
    dims: list[str],
    measure_cols: list[str],
    set_cols: list[str] | None = None,
    mv_cols: list[str] | None = None,
) -> AggregateMV:
    """create_aggregate_mv plus DISTINCTCOUNTBITMAP set partials for
    ``set_cols`` and COUNTMV/SUMMV partials for array-typed ``mv_cols``.
    Set partials are bounded by each combination's distinct-value count
    (the same state a star-tree bitmap node carries)."""
    mv = AggregateMV(name=name, path=path, dims=dims, measure_cols=measure_cols)
    aggs = [F.count("*").alias("__count")]
    for c in measure_cols:
        aggs += [
            F.sum(c).alias(mv.partial_name("sum", c)),
            F.min(c).alias(mv.partial_name("min", c)),
            F.max(c).alias(mv.partial_name("max", c)),
        ]
    for c in set_cols or []:
        aggs.append(F.collect_set(c).alias(mv.partial_name("set", c)))
    for c in mv_cols or []:
        aggs += [
            F.sum(F.size(c)).alias(mv.partial_name("countmv", c)),
            F.sum(F.aggregate(c, F.lit(0.0), lambda a, x: a + x)).alias(
                mv.partial_name("summv", c)
            ),
        ]
    df.groupBy(*dims).agg(*aggs).write.mode("overwrite").parquet(path)
    mv.set_cols = list(set_cols or [])  # type: ignore[attr-defined]
    mv.mv_cols = list(mv_cols or [])  # type: ignore[attr-defined]
    return mv


def query_rollup_ext(
    spark: SparkSession,
    mv: AggregateMV,
    dims: list[str],
    aggs: list[tuple[str, str, str]],
    filter_expr=None,
) -> DataFrame:
    """query_rollup plus the round-13 aggregate surface.  Final
    re-aggregation per function (all partial/final exact):
    MINMAXRANGE = max(max partials) − min(min partials);
    DISTINCTCOUNTBITMAP = distinct size of the unioned set partials
    (flatten + array_distinct after collect — exact, state bounded by
    the group's distinct count like the reference's bitmap);
    COUNTMV/SUMMV = sums of the stored element counts/sums,
    AVGMV = SUMMV/COUNTMV."""
    df = _read_mv(spark, mv.path)
    if filter_expr is not None:
        df = df.filter(filter_expr)
    out = []
    for agg, col, alias in aggs:
        if agg == "count":
            out.append(F.sum("__count").alias(alias))
        elif agg == "sum":
            out.append(F.sum(mv.partial_name("sum", col)).alias(alias))
        elif agg == "min":
            out.append(F.min(mv.partial_name("min", col)).alias(alias))
        elif agg == "max":
            out.append(F.max(mv.partial_name("max", col)).alias(alias))
        elif agg == "avg":
            out.append(
                (F.sum(mv.partial_name("sum", col)) / F.sum("__count")).alias(alias)
            )
        elif agg == "minmaxrange":
            out.append(
                (F.max(mv.partial_name("max", col)) - F.min(mv.partial_name("min", col))).alias(
                    alias
                )
            )
        elif agg == "distinctcountbitmap":
            out.append(
                F.size(F.array_distinct(F.flatten(F.collect_list(mv.partial_name("set", col)))))
                .cast("bigint")
                .alias(alias)
            )
        elif agg == "countmv":
            out.append(F.sum(mv.partial_name("countmv", col)).cast("bigint").alias(alias))
        elif agg == "summv":
            out.append(F.sum(mv.partial_name("summv", col)).alias(alias))
        elif agg == "avgmv":
            out.append(
                (
                    F.sum(mv.partial_name("summv", col))
                    / F.sum(mv.partial_name("countmv", col))
                ).alias(alias)
            )
        else:
            raise ValueError(f"unsupported rollup aggregate {agg}")
    return df.groupBy(*dims).agg(*out)
