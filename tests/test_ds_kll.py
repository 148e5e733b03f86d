"""DataSketches KLL doubles-sketch wire-format interop
(operators/ds_kll.py).

Golden vectors in tests/data/ds_kll_vectors.json come from a one-off
harness driving datasketches-java 6.2.0 (the library the reference
wraps, ObjectSerDeUtils.KLL_SKETCH_SER_DE): byte dumps + 6-rank
quantile probes at k in {200, 128}, n from 0 through 10000 (covering
empty / single-item / single-level / library-compacted multi-level
shapes) plus a Java-side merge.  The live round-trip test compiles
against the bundled jar and proves the library heapifies
Python-emitted sketches — including post-compaction ones — with
identical n/min/max and in-tolerance quantiles.
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from pinot_spark.operators.ds_kll import (
    DsKllSketch,
    grouped_ds_kll,
    is_ds_kll_bytes,
    level_capacity,
    total_capacity,
)

_VEC = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "ds_kll_vectors.json"))
)
_JARS = "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/pyspark/jars"
_RANKS = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]


def test_level_capacity_matches_java_probes():
    # reflective probes of KllHelper.levelCapacity (k=200, m=8)
    expected = {
        (1, 0): 200, (2, 0): 133, (2, 1): 200, (3, 0): 89, (3, 1): 133,
        (3, 2): 200, (5, 0): 40, (5, 1): 59, (5, 2): 89, (5, 3): 133,
        (5, 4): 200, (8, 0): 12, (8, 1): 18, (8, 2): 26, (8, 3): 40,
        (8, 4): 59, (8, 5): 89, (8, 6): 133, (8, 7): 200,
    }
    for (nl, h), cap in expected.items():
        assert level_capacity(200, nl, h) == cap, (nl, h)
    for nl, cap in {1: 200, 2: 333, 3: 422, 5: 521, 8: 577}.items():
        assert total_capacity(200, nl) == cap


def test_parse_serialize_roundtrip_all_vectors():
    for v in _VEC["sketches"]:
        want = bytes.fromhex(v["bytes"])
        assert is_ds_kll_bytes(want)
        parsed = DsKllSketch.parse(want)
        assert parsed.serialize() == want, (v["k"], v["n"], v.get("kind"))
        assert parsed.n == v["n"]


def test_quantile_parity_with_java():
    for v in _VEC["sketches"]:
        if v["n"] == 0:
            continue
        parsed = DsKllSketch.parse(bytes.fromhex(v["bytes"]))
        ranks = [0.25, 0.5, 0.75] if v.get("kind") == "merged" else _RANKS
        for r, expect in zip(ranks, v["quantiles"]):
            assert parsed.quantile(r) == expect, (v["k"], v["n"], r)
        assert parsed.min_v == v["minv"] and parsed.max_v == v["maxv"]


def test_build_byte_parity_no_compaction_regime():
    """build_from_values is byte-canonical with the library for every
    golden n <= k (the KLL analog of the theta exact regime)."""
    checked = 0
    for v in _VEC["sketches"]:
        if v.get("kind") == "merged" or v["n"] > v["k"]:
            continue
        s = DsKllSketch.build_from_values(
            [i * 1.5 - 7.0 for i in range(v["n"])], v["k"]
        )
        assert s.serialize() == bytes.fromhex(v["bytes"]), (v["k"], v["n"])
        checked += 1
    assert checked == 13  # k=200: n 0..200 (8 vectors); k=128: n 0..50 (5)


def test_build_insertion_order_independent_within_level0():
    """The serialized form sorts level zero, so any insertion order of
    <= k values yields identical canonical bytes."""
    a = DsKllSketch.build_from_values([5.0, 1.0, 3.0, 2.0, 4.0], 200)
    b = DsKllSketch.build_from_values([1.0, 2.0, 3.0, 4.0, 5.0], 200)
    assert a.serialize() == b.serialize()


def test_big_build_and_merge_valid():
    big = DsKllSketch.build_from_values(range(20000), 200)
    rb = DsKllSketch.parse(big.serialize())
    assert rb.n == 20000
    assert rb.min_v == 0.0 and rb.max_v == 19999.0
    # KLL rank error at k=200 is ~1.7% (99% conf); allow 3%
    assert abs(rb.quantile(0.5) - 10000) <= 0.03 * 20000
    m = DsKllSketch.build_from_values(range(3000), 200).merge(
        DsKllSketch.build_from_values(range(2000, 6000), 200)
    )
    assert m.n == 7000
    assert abs(m.rank_of(m.quantile(0.5)) - 0.5) <= 0.05


def test_format_detection_disjoint_from_tdigest():
    from pinot_spark.operators.tdigest import TDigest

    td = TDigest()
    td.add([1.0, 2.0, 3.0])
    assert not is_ds_kll_bytes(td.to_bytes())
    assert is_ds_kll_bytes(DsKllSketch.build_from_values([1.0]).serialize())


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
def test_java_round_trip(tmp_path):
    """datasketches-java heapifies Python-emitted KLL bytes — canonical
    (no-compaction) AND deterministically-compacted ones — with
    identical n/min/max, exact quantiles for the canonical sketch, and
    in-tolerance quantiles for the compacted one; a Java-side merge of
    a Python sketch parses back."""
    small = DsKllSketch.build_from_values([float(i) for i in range(100)], 200)
    (tmp_path / "py_small.bin").write_bytes(small.serialize())
    big = DsKllSketch.build_from_values([float(i) for i in range(50000)], 200)
    (tmp_path / "py_big.bin").write_bytes(big.serialize())

    src = tmp_path / "RT.java"
    src.write_text(
        """
import org.apache.datasketches.kll.KllDoublesSketch;
import org.apache.datasketches.memory.Memory;
import java.nio.file.*;

public class RT {
  public static void main(String[] args) throws Exception {
    for (String f : args) {
      KllDoublesSketch s = KllDoublesSketch.heapify(
          Memory.wrap(Files.readAllBytes(Paths.get(f))));
      System.out.println(f + " n=" + s.getN() + " min=" + s.getMinItem()
          + " max=" + s.getMaxItem() + " p50=" + s.getQuantile(0.5)
          + " p99=" + s.getQuantile(0.99));
    }
    KllDoublesSketch a = KllDoublesSketch.heapify(
        Memory.wrap(Files.readAllBytes(Paths.get(args[0]))));
    KllDoublesSketch other = KllDoublesSketch.newHeapInstance(200);
    for (int i = 50; i < 150; i++) other.update(i);
    a.merge(other);
    Files.write(Paths.get(args[0] + ".merged"), a.toByteArray());
    System.out.println("merged n=" + a.getN() + " p50=" + a.getQuantile(0.5));
  }
}
"""
    )
    cp = f"{_JARS}/datasketches-java-6.2.0.jar:{_JARS}/datasketches-memory-3.0.2.jar"
    subprocess.run(
        ["javac", "-cp", cp, str(src)], cwd=tmp_path, check=True, capture_output=True
    )
    out = subprocess.run(
        ["java", "-cp", f".:{cp}", "RT", "py_small.bin", "py_big.bin"],
        cwd=tmp_path, check=True, capture_output=True, text=True,
    ).stdout
    lines = dict(
        (ln.split(" ", 1)[0], dict(kv.split("=") for kv in ln.split(" ")[1:]))
        for ln in out.strip().splitlines()
    )
    s = lines["py_small.bin"]
    assert (int(s["n"]), float(s["min"]), float(s["max"])) == (100, 0.0, 99.0)
    assert float(s["p50"]) == small.quantile(0.5)
    assert float(s["p99"]) == small.quantile(0.99)
    b = lines["py_big.bin"]
    assert (int(b["n"]), float(b["min"]), float(b["max"])) == (50000, 0.0, 49999.0)
    assert abs(float(b["p50"]) - 25000) <= 0.03 * 50000
    m = lines["merged"]
    assert int(m["n"]) == 200
    # Java merged bytes parse back and re-serialize stably
    jm = (tmp_path / "py_small.bin.merged").read_bytes()
    parsed = DsKllSketch.parse(jm)
    assert parsed.serialize() == jm
    assert parsed.n == 200


# ---------------------------------------------------------------------------
# SQL surface + grouped export
# ---------------------------------------------------------------------------


def test_sql_kll_surface(spark):
    from pinot_spark.dialect import PinotEngine

    eng = PinotEngine(spark)
    row = eng.sql(
        """
        SELECT KLL_QUANTILE(TO_DATA_SKETCHES_KLL(42), 50) AS q1,
               KLL_QUANTILE(KLL_MERGE(TO_DATA_SKETCHES_KLL(1),
                                      TO_DATA_SKETCHES_KLL(9)), 100) AS q2,
               GETTDIGESTQUANTILE(TO_DATA_SKETCHES_KLL(7), 50) AS q3
        """
    ).collect()[0]
    assert (row.q1, row.q2, row.q3) == (42.0, 9.0, 7.0)


def test_sql_foreign_java_kll_quantiles(spark):
    from pinot_spark.dialect import PinotEngine

    v = next(
        x for x in _VEC["sketches"]
        if x["k"] == 200 and x["n"] == 10000 and "kind" not in x
    )
    eng = PinotEngine(spark)
    row = eng.sql(
        f"SELECT KLL_QUANTILE(X'{v['bytes']}', 50) AS p50, "
        f"GETTDIGESTQUANTILE(X'{v['bytes']}', 99) AS p99"
    ).collect()[0]
    assert row.p50 == v["quantiles"][2]
    assert row.p99 == v["quantiles"][4]


def test_grouped_export_canonical_bytes(spark, sf_dir):
    from pinot_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    out = {
        r.n_regionkey: bytes(r.ds_kll)
        for r in grouped_ds_kll(t["nation"], ["n_regionkey"], "n_nationkey").collect()
    }
    assert len(out) == 5
    rows = t["nation"].select("n_regionkey", "n_nationkey").collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.n_regionkey, []).append(float(r.n_nationkey))
    for rk, blob in out.items():
        want = DsKllSketch.build_from_values(sorted(by_region[rk]), 200)
        assert blob == want.serialize(), rk
