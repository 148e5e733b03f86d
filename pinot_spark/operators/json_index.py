"""JSON index as a flattened (path, value, doc_id) postings table.

Reference: Pinot's JSON index (StandardIndexes.java json;
pinot-segment-local/.../index/readers/json/ImmutableJsonIndexReader.java)
pre-flattens nested JSON into posting lists keyed by "path=value" so
JSON_MATCH predicates become bitmap lookups instead of per-row parsing.

Spark-first shape (mirrors operators/text_index.py): an explicit table of
(path, value, doc_id) rows built once at ingest with ``variant_explode``
-style flattening (pure JVM: from_json to a map + explode; nested objects
flattened to dotted paths, arrays to ``path[*]``). A JSON_MATCH predicate
becomes a semi join against the postings — at 100 TB the postings for one
(path, value) pair are a partition-prunable fraction of the corpus, which
is exactly what the JSON index buys Pinot.

The scan-path alternative (no index) stays `get_json_object` compiled
into the predicate (queries/scalar_fns.py fn_json_match_rewrite).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_json_index_flat(df: DataFrame, id_col: str, json_col: str) -> DataFrame:
    """Fast path for FLAT (depth-1) JSON objects: pure JVM flattening —
    ``from_json`` to ``map<string,string>`` + ``explode`` — no Python in
    the build. Nested values appear as their JSON text (one posting for
    the whole subtree); use build_json_index for dotted-path flattening.
    """
    m = F.from_json(F.col(json_col), "map<string,string>")
    return (
        df.select(F.col(id_col), F.explode(m).alias("path", "value"))
        .select("path", F.coalesce(F.col("value"), F.lit("null")).alias("value"), id_col)
        .dropDuplicates()
    )


def build_json_index(df: DataFrame, id_col: str, json_col: str) -> DataFrame:
    """Flatten a JSON string column into (path, value, id) postings.

    Nested objects become dotted paths (``a.b.c``), array elements become
    ``path[*]`` postings (Pinot's flattened-array convention — JSON_MATCH
    ``"a[*].b" = 'x'`` semantics). Values are stringified.

    Arrow-batched flattening (mapInPandas): JSON shapes are arbitrary so
    a generic walker needs Python, but it runs once at index build — the
    query path is pure joins. For flat JSON use build_json_index_flat
    (JVM-only, ~10× faster build).
    """
    out_schema = f"path string, value string, {id_col} {df.schema[id_col].dataType.simpleString()}"
    slim = df.select(id_col, json_col)
    id_name, json_name = id_col, json_col  # plain strings for the worker closure

    def _flatten(batches):
        import json

        for pdf in batches:
            paths, values, ids = [], [], []

            def walk(prefix, node, doc_id):
                if isinstance(node, dict):
                    for k, v in node.items():
                        walk(f"{prefix}.{k}" if prefix else k, v, doc_id)
                elif isinstance(node, list):
                    for v in node:
                        walk(f"{prefix}[*]", v, doc_id)
                else:
                    paths.append(prefix)
                    values.append("null" if node is None else str(node))
                    ids.append(doc_id)

            for doc_id, raw in zip(pdf[id_name], pdf[json_name]):
                if raw is None:
                    continue
                try:
                    walk("", json.loads(raw), doc_id)
                except (ValueError, TypeError):
                    continue
            yield pd.DataFrame({"path": paths, "value": values, id_col: ids})

    return slim.mapInPandas(_flatten, schema=out_schema).dropDuplicates()


def json_match_eq(index: DataFrame, id_col: str, path: str, value) -> DataFrame:
    """Ids where JSON_MATCH('col', '"<path>" = <value>') holds — one
    postings lookup."""
    return (
        index.filter((F.col("path") == path) & (F.col("value") == str(value)))
        .select(id_col)
        .distinct()
    )


def json_match_and(index: DataFrame, id_col: str, conds: list[tuple[str, object]]) -> DataFrame:
    """Conjunction of path=value conditions: postings intersect via a
    single groupBy (same shape as text_index.search_all)."""
    f = None
    for p, v in conds:
        c = (F.col("path") == p) & (F.col("value") == str(v))
        f = c if f is None else (f | c)
    hits = index.filter(f).select(id_col, "path", "value").distinct()
    return (
        hits.groupBy(id_col)
        .agg(F.count("*").alias("__nc"))
        .filter(F.col("__nc") == len(conds))
        .select(id_col)
    )
