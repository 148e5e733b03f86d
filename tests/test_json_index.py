"""JSON index postings (operators/json_index.py): flattening, eq/AND
lookups, equivalence with the get_json_object scan path."""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.operators.json_index import build_json_index, json_match_and, json_match_eq


def test_flatten_nested_and_arrays(spark):
    rows = [
        (1, '{"a": {"b": 1}, "tags": ["x", "y"], "n": null}'),
        (2, '{"a": {"b": 2}, "tags": ["x"]}'),
        (3, 'not json'),
    ]
    df = spark.createDataFrame(rows, "doc_id int, js string")
    idx = build_json_index(df, "doc_id", "js")
    got = {(r.path, r.value, r.doc_id) for r in idx.collect()}
    assert ("a.b", "1", 1) in got and ("a.b", "2", 2) in got
    assert ("tags[*]", "x", 1) in got and ("tags[*]", "y", 1) in got and ("tags[*]", "x", 2) in got
    assert ("n", "null", 1) in got
    assert not any(d == 3 for _, _, d in got)  # bad JSON skipped


def test_match_equivalent_to_scan_path(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].select("event_id", "props")
    idx = build_json_index(ev, "event_id", "props")
    # pick a real (path, value) from the data
    sample = idx.groupBy("path", "value").count().orderBy(F.desc("count")).first()
    p, v = sample.path, sample.value
    via_index = sorted(r.event_id for r in json_match_eq(idx, "event_id", p, v).collect())
    via_scan = sorted(
        r.event_id
        for r in ev.filter(F.get_json_object("props", f"$.{p}") == v).collect()
    )
    assert via_index == via_scan and via_index


def test_match_and_conjunction(spark):
    rows = [
        (1, '{"k": 1, "t": "a"}'),
        (2, '{"k": 1, "t": "b"}'),
        (3, '{"k": 2, "t": "a"}'),
    ]
    df = spark.createDataFrame(rows, "doc_id int, js string")
    idx = build_json_index(df, "doc_id", "js")
    got = sorted(r.doc_id for r in json_match_and(idx, "doc_id", [("k", 1), ("t", "a")]).collect())
    assert got == [1]


def test_flat_build_matches_walker_on_flat_json(spark, sf_dir):
    from pinot_spark.operators.json_index import build_json_index_flat

    ev = load_tables(spark, sf_dir)["events"].select("event_id", "props")
    a = build_json_index(ev, "event_id", "props")
    b = build_json_index_flat(ev, "event_id", "props")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
