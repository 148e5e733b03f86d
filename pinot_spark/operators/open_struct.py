"""OPEN_STRUCT column surface: dense/sparse key materialization.

Reference semantics: pinot-spi/.../data/OpenStructNaming.java (each
dense key materializes as ``<col>$<key>``; the remaining keys share one
synthetic JSON column ``<col>$__sparse__``),
OpenStructTypeInference.java (key type inference: INT-family widens to
INT/LONG, DATE/TIME/UUID fold to STRING, TIMESTAMP survives, null for
unrepresentable values), pinot-spi/.../config/table/
OpenStructIndexConfig.java (maxDenseKeys budget, declared denseKeys,
density threshold) and the OpenStructIngestionCommitTestBase suite
(dense/sparse split + the ``metrics['key']`` query path with a
manifest short-circuit for nonexistent keys).

Spark-first shape: an OPEN_STRUCT ingest column is a
``map<string,string>`` (the Avro map the reference ingests).  Key
discovery + density is ONE aggregation over exploded map keys (state
bounded by the distinct key count, not rows).  Dense children are typed
``element_at`` projections — plain columns afterwards, codegen'd,
prunable, filterable like any scalar; the sparse remainder re-packs as
a JSON string column.  ``key_column`` resolves a queried key against
the layout manifest: dense -> the materialized column, sparse ->
``get_json_object`` on the sparse blob, unknown -> a typed NULL literal
so predicates constant-fold to zero rows WITHOUT scanning (the
manifest short-circuit)."""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SEPARATOR = "$"
SPARSE_SUFFIX = "__sparse__"


def materialized_column_name(open_struct_column: str, key: str) -> str:
    """OpenStructNaming.materializedColumnName."""
    return open_struct_column + SEPARATOR + key


def sparse_column_name(open_struct_column: str) -> str:
    """OpenStructNaming.sparseColumnName."""
    return open_struct_column + SEPARATOR + SPARSE_SUFFIX


def is_materialized_open_struct_column(name: str) -> bool:
    """OpenStructNaming.isMaterializedOpenStructColumn: separator at a
    positive index."""
    return name.find(SEPARATOR) > 0


def is_sparse_column(name: str) -> bool:
    sep = name.find(SEPARATOR)
    return sep > 0 and name[sep + 1 :] == SPARSE_SUFFIX


def parse_parent_column(name: str) -> str:
    sep = name.find(SEPARATOR)
    if sep <= 0:
        raise ValueError(f"Not a materialized OPEN_STRUCT column: {name}")
    return name[:sep]


def parse_key(name: str) -> str:
    sep = name.find(SEPARATOR)
    if sep <= 0:
        raise ValueError(f"Not a materialized OPEN_STRUCT column: {name}")
    key = name[sep + 1 :]
    if key == SPARSE_SUFFIX:
        raise ValueError(f"Sparse column has no key: {name}")
    return key


def infer_data_type(raw) -> str | None:
    """OpenStructTypeInference.inferDataType over Python ingest values:
    int-family -> int/long by magnitude, float -> double, bool ->
    boolean, datetime -> timestamp, date/time/uuid/str -> string,
    bytes -> bytes, None for unrepresentable values."""
    import datetime
    import decimal
    import uuid

    if isinstance(raw, bool):
        return "boolean"
    if isinstance(raw, int):
        return "int" if -(2**31) <= raw < 2**31 else "long"
    if isinstance(raw, float):
        return "double"
    if isinstance(raw, decimal.Decimal):
        return "decimal(38,18)"
    if isinstance(raw, datetime.datetime):
        return "timestamp"
    if isinstance(raw, (datetime.date, datetime.time, uuid.UUID, str)):
        return "string"
    if isinstance(raw, (bytes, bytearray)):
        return "binary"
    return None


def _infer_string_type(values: list[str]) -> str:
    """Infer a stored type for a key whose ingested values are strings
    (the Avro map<string,string> path): the narrowest of long -> double
    -> boolean -> string that parses every sampled value."""
    def all_parse(fn) -> bool:
        for v in values:
            if v is None:
                continue
            try:
                fn(v)
            except (ValueError, TypeError):
                return False
        return True

    if all_parse(int):
        return "long"
    if all_parse(float):
        return "double"
    if all(v in ("true", "false") for v in values if v is not None):
        return "boolean"
    return "string"


@dataclass
class OpenStructLayout:
    """The committed manifest: which keys went dense (with their stored
    types) and which share the sparse JSON column."""

    column: str
    dense: dict[str, str] = field(default_factory=dict)  # key -> spark type
    sparse: list[str] = field(default_factory=list)
    sparse_types: dict[str, str] = field(default_factory=dict)

    def key_column(
        self, df_or_none, key: str, expected_type: str | None = None
    ) -> Column:
        """Resolve ``<column>['key']``: dense -> materialized column;
        sparse -> JSON extraction from the shared blob; unknown key ->
        typed NULL literal (the manifest short-circuit — a predicate on
        it constant-folds to zero rows, no scan of the struct data).
        ``expected_type`` types the unknown-key NULL so numeric
        aggregates over it resolve like the dense/sparse paths would
        have (r14 ADVICE: a bare string NULL makes SUM type-resolve
        differently)."""
        if key in self.dense:
            return F.col(materialized_column_name(self.column, key))
        if key in self.sparse:
            typ = self.sparse_types.get(key, "string")
            return F.get_json_object(
                F.col(sparse_column_name(self.column)), f"$.{key}"
            ).cast(typ)
        return F.lit(None).cast(expected_type or "string")


def materialize_open_struct(
    df: DataFrame,
    column: str,
    children: dict[str, str] | None = None,
    dense_keys: set[str] | None = None,
    max_dense_keys: int = 3,
    density_threshold: float = 0.5,
    type_sample_size: int = 1000,
) -> tuple[DataFrame, OpenStructLayout]:
    """Split an OPEN_STRUCT ``map<string,string>`` column into dense
    typed child columns + one sparse JSON column.

    Key election (OpenStructIndexConfig semantics): declared
    ``dense_keys`` claim budget slots first; remaining slots fill with
    keys whose density (fraction of rows carrying the key) meets
    ``density_threshold``, highest density first (name order on ties,
    deterministic).  ``children`` declares stored types per key
    (ComplexFieldSpec child specs); undeclared keys infer from a
    bounded sample (_infer_string_type)."""
    children = dict(children or {})
    dense_keys = set(dense_keys or ())

    # ONE aggregation for the key manifest: explode keys, count
    # presence — state is O(distinct keys)
    total = df.count()
    stats = (
        df.select(F.explode(F.map_keys(F.col(column))).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    density = {r.k: r.n / max(total, 1) for r in stats}
    all_keys = sorted(density)

    elected: list[str] = [k for k in all_keys if k in dense_keys][:max_dense_keys]
    if len(elected) < max_dense_keys:
        rest = [
            k
            for k in all_keys
            if k not in dense_keys and density[k] >= density_threshold
        ]
        rest.sort(key=lambda k: (-density[k], k))
        elected += rest[: max_dense_keys - len(elected)]
    sparse = [k for k in all_keys if k not in elected]

    # stored types: declared spec, else inference over a bounded sample
    need_inference = [k for k in all_keys if k not in children]
    if need_inference:
        sample = (
            df.select(
                *[F.element_at(F.col(column), k).alias(k) for k in need_inference]
            )
            .limit(type_sample_size)
            .collect()
        )
        for k in need_inference:
            children[k] = _infer_string_type([getattr(r, k) for r in sample])

    out_cols = [F.col(c) for c in df.columns if c != column]
    for k in elected:
        out_cols.append(
            F.element_at(F.col(column), k)
            .cast(children[k])
            .alias(materialized_column_name(column, k))
        )
    # sparse remainder re-packs as JSON; an all-dense row stores NULL
    sparse_map = F.map_filter(
        F.col(column), lambda k, _v: ~k.isin(elected) if elected else F.lit(True)
    )
    out_cols.append(
        F.when(F.size(sparse_map) > 0, F.to_json(sparse_map))
        .alias(sparse_column_name(column))
    )
    layout = OpenStructLayout(
        column=column,
        dense={k: children[k] for k in elected},
        sparse=sparse,
        sparse_types={k: children[k] for k in sparse},
    )
    return df.select(*out_cols), layout
