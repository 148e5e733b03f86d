"""Segment compaction / merge-rollup (sources/segments.py
compact_segments — the minion MergeRollupTask analog)."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from pinot_spark.catalog import load_tables
from pinot_spark.sources.segments import compact_segments, write_segments


def test_compaction_reduces_files_same_rows(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"]
    src = str(tmp_path / "segments")
    # simulate streaming ingest: many tiny files per day partition
    write_segments(ev.repartition(8), src, time_col="ts", time_bucket="day", target_file_rows=5)
    n_small = len(glob.glob(f"{src}/*/*.parquet"))
    out = str(tmp_path / "compacted")
    rows = compact_segments(spark, src, out, target_file_rows=1_000_000)
    n_big = len(glob.glob(f"{out}/*/*.parquet"))
    assert rows == ev.count()
    assert n_big < n_small, (n_big, n_small)
    # content identical (ignoring file layout)
    a = spark.read.parquet(src).drop("__seg_time")
    b = spark.read.parquet(out).drop("__seg_time")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_with_rollup(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"]
    src = str(tmp_path / "segments")
    write_segments(ev, src, time_col="ts", time_bucket="day")
    out = str(tmp_path / "rolled")
    compact_segments(
        spark, src, out,
        rollup={"dims": ["event_type"], "aggs": {"value": "sum", "event_id": "count"}},
        coarser_bucket="month",
    )
    rolled = spark.read.parquet(out)
    # one row per (month, event_type); totals preserved
    assert rolled.count() == rolled.select("__seg_time", "event_type").distinct().count()
    total = rolled.agg(F.sum("event_id")).collect()[0][0]
    assert total == ev.count()
