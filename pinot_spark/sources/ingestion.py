"""Ingestion-time transform pipeline — the ETL surface of
IngestionConfig (pinot-spi/.../config/table/ingestion/IngestionConfig.java,
executed by pinot-segment-local/.../recordtransformer/*):

- TransformConfig    → derived columns (ExpressionTransformer.java)
- FilterConfig       → drop matching records (FilterTransformer.java)
- ComplexTypeConfig  → flatten/unnest nested records (ComplexTypeTransformer.java)
- AggregationConfig  → ingestion rollup (SUM/MIN/MAX on the fly)
- NullValueTransformer → per-field defaultNullValue materialization
  (FieldSpec.java:198; the "null handling disabled" storage mode)
- SanitizationTransformer → string length clamp / invalid char strip
- TimeValidationTransformer → drop rows with out-of-range time values
- SchemaConformingTransformer → JSON→schema coercion with overflow field

Spark-first: the whole config compiles to one declarative DataFrame
chain (withColumn/filter/explode/groupBy) executed before the write —
Catalyst fuses it into the scan at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pinot_spark.functions.scalar import call as _scalar_call


@dataclass
class IngestionPipeline:
    """Config-driven ingestion pipeline. Each list mirrors the matching
    IngestionConfig member; ``apply`` compiles them onto a DataFrame in
    Pinot's transformer order (filter → transform → complex-type →
    null-value → sanitize → time-validate → rollup)."""

    # FilterConfig.filterFunction: rows matching are DROPPED (Pinot semantics)
    filter_expr: str | Column | None = None
    # TransformConfig: out_col → SQL expr string | Column |
    # (pinot_fn_name, *args) where string args are COLUMN NAMES — wrap
    # literal strings (e.g. JSON paths) in F.lit or use a Column spec
    # built with functions.call(...) directly.
    transforms: dict = field(default_factory=dict)
    # ComplexTypeConfig.fieldsToUnnest
    unnest: list = field(default_factory=list)
    # per-field default null values (FieldSpec defaultNullValue)
    null_defaults: dict = field(default_factory=dict)
    # SanitizationTransformer: max string length (truncate beyond)
    max_string_length: int | None = None
    # TimeValidationTransformer: (time_col, min_ts, max_ts)
    time_validation: tuple | None = None
    # AggregationConfig: (group_cols, {out: (agg_name, in_col)})
    rollup: tuple | None = None
    # EnrichmentConfig (recordtransformer/enricher/): list of
    # (dim_df, join_keys, wanted_cols) — broadcast lookup enrich
    enrichments: list = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        if self.filter_expr is not None:
            cond = F.expr(self.filter_expr) if isinstance(self.filter_expr, str) else self.filter_expr
            df = df.filter(~cond)  # filterFunction selects rows to DROP

        for out, spec in self.transforms.items():
            if isinstance(spec, Column):
                col = spec
            elif isinstance(spec, str):
                col = F.expr(spec)
            elif isinstance(spec, tuple):
                name, *args = spec
                col = _scalar_call(name, *[F.col(a) if isinstance(a, str) else a for a in args])
            else:
                raise TypeError(f"bad transform spec for {out}: {spec!r}")
            df = df.withColumn(out, col)

        for col in self.unnest:
            others = [c for c in df.columns if c != col]
            df = df.select(*others, F.explode_outer(col).alias(col))

        for col, default in self.null_defaults.items():
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))

        if self.max_string_length is not None:
            from pyspark.sql.types import StringType

            for f_ in df.schema.fields:
                if isinstance(f_.dataType, StringType):
                    df = df.withColumn(f_.name, F.substring(F.col(f_.name), 1, self.max_string_length))

        if self.time_validation is not None:
            tcol, lo, hi = self.time_validation
            df = df.filter(
                (F.col(tcol) >= F.lit(lo).cast("timestamp"))
                & (F.col(tcol) <= F.lit(hi).cast("timestamp"))
            )

        for dim_df, on, cols in self.enrichments:
            slim = dim_df.select(*dict.fromkeys([*on, *cols]))
            df = df.join(F.broadcast(slim), on=on, how="left")

        if self.rollup is not None:
            group_cols, aggs = self.rollup
            from pinot_spark.functions.aggregate import agg_call

            df = df.groupBy(*group_cols).agg(
                *[agg_call(name, incol).alias(out) for out, (name, incol) in aggs.items()]
            )
        return df


def conform_to_schema(df: DataFrame, ddl_schema: str, overflow_col: str = "__overflow") -> DataFrame:
    """SchemaConformingTransformer analog: keep declared columns (cast to
    the declared type), pack everything undeclared into a JSON overflow
    column."""
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(ddl_schema)
    declared = {f.name: f.dataType for f in target.fields}
    extra = [c for c in df.columns if c not in declared]
    cols = [
        (F.col(name).cast(dt) if name in df.columns else F.lit(None).cast(dt)).alias(name)
        for name, dt in declared.items()
    ]
    if extra:
        cols.append(F.to_json(F.struct(*[F.col(c) for c in extra])).alias(overflow_col))
    else:
        cols.append(F.lit(None).cast("string").alias(overflow_col))
    return df.select(*cols)


def aggregate_metrics(
    df: DataFrame, dim_cols: list[str], metric_aggs: dict[str, str]
) -> DataFrame:
    """aggregateMetrics ingest rollup (TableConfig
    indexingConfig.aggregateMetrics / MutableSegmentImpl metric
    aggregation; AggregateMetricsTest): rows sharing the full dimension
    tuple merge at ingest with their metric columns pre-aggregated —
    SUM (the reference's only aggregateMetrics mode) plus MIN/MAX/COUNT
    for the ingestionAggregation config generalization.  Downstream
    SUM/MIN/MAX queries read fewer rows and return identical answers;
    one map-side-combinable shuffle at ingest buys it."""
    allowed = {"sum": F.sum, "min": F.min, "max": F.max}
    aggs = []
    for col, how in metric_aggs.items():
        how_l = how.lower()
        if how_l == "count":
            aggs.append(F.count("*").cast("bigint").alias(col))
        elif how_l in allowed:
            aggs.append(allowed[how_l](col).alias(col))
        else:
            raise ValueError(f"unsupported ingest aggregation {how!r} for {col!r}")
    return df.groupBy(*[F.col(c) for c in dim_cols]).agg(*aggs)


def canonicalize_uuid(col):
    """Canonical stored form of a UUID value: lowercase dash-less hex
    (FieldSpec.DataType.UUID keeps the 128-bit value, so
    '550E8400-E29B-...' and '550e8400e29b...' are the same key —
    UuidBloomFilterTest matches an ingested dashed literal with its hex
    spelling).  Apply at ingest on UUID-typed columns; queries compare
    plain strings afterwards (CAST(x AS UUID) canonicalizes the same
    way in the dialect)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.replace(c, F.lit("-"), F.lit("")))
