"""DataSketches CPC foreign-READ interop (operators/ds_cpc.py).

Golden vectors in tests/data/ds_cpc_vectors.json come from a one-off
harness driving datasketches-java 6.2.0 (the library the reference
wraps, SketchFunctions.java:378-392): byte dumps + getEstimate values
at lgK 8/11/12, n 0..100000 — covering EMPTY, SPARSE_HYBRID_HIP and
PINNED_SLIDING_HIP formats — plus a CpcUnion result (the merged/ICON
estimator path), and 27 reflective probes of
IconEstimator.getIconEstimate.  Estimation needs only preamble fields,
so the compressed coupon streams stay opaque; WRITING CPC bytes
remains a loud named boundary.
"""

import json
import os

import pytest

from pinot_spark.operators.ds_cpc import DsCpcView, icon_estimate, is_ds_cpc_bytes

_VEC = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "ds_cpc_vectors.json"))
)


def test_icon_estimator_bit_exact_vs_probes():
    for lgk, c, want in _VEC["icon_probes"]:
        assert icon_estimate(lgk, c) == want, (lgk, c)


def test_golden_sketches_estimate_exactly():
    for v in _VEC["sketches"]:
        b = bytes.fromhex(v["bytes"])
        assert is_ds_cpc_bytes(b), (v["lgk"], v.get("n"))
        assert DsCpcView.parse(b).estimate() == v["est"], (v["lgk"], v.get("n"))


def test_merged_sketch_uses_icon_path():
    v = next(x for x in _VEC["sketches"] if x.get("kind") == "merged")
    view = DsCpcView.parse(bytes.fromhex(v["bytes"]))
    assert not view.has_hip
    assert view.estimate() == icon_estimate(view.lg_k, view.num_coupons) == v["est"]


def test_detection_rejects_other_sketches():
    from pinot_spark.operators.ds_theta import DsThetaSketch

    theta = DsThetaSketch.build_from_values(range(10)).serialize()
    assert not is_ds_cpc_bytes(theta)
    with pytest.raises(ValueError, match="not a DataSketches CPC"):
        DsCpcView.parse(theta)


def test_foreign_seed_raises_loudly():
    v = next(x for x in _VEC["sketches"] if x.get("n") == 100)
    b = bytearray(bytes.fromhex(v["bytes"]))
    b[6] ^= 0xFF  # corrupt the seed hash
    with pytest.raises(ValueError, match="non-default update seed"):
        DsCpcView.parse(bytes(b))


def test_sql_get_cpc_sketch_estimate(spark):
    """The reference scalar: Math.round(getEstimate()) over foreign
    bytes — HIP and merged/ICON sketches both."""
    from pinot_spark.dialect import PinotEngine

    eng = PinotEngine(spark)
    hip = next(
        x for x in _VEC["sketches"] if x["lgk"] == 11 and x.get("n") == 100000
    )
    merged = next(x for x in _VEC["sketches"] if x.get("kind") == "merged")
    row = eng.sql(
        f"SELECT GET_CPC_SKETCH_ESTIMATE(X'{hip['bytes']}') AS e1, "
        f"GETCPCSKETCHESTIMATE(X'{merged['bytes']}') AS e2"
    ).collect()[0]
    import math

    assert row.e1 == int(math.floor(hip["est"] + 0.5))
    assert row.e2 == int(math.floor(merged["est"] + 0.5))


# ---------------------------------------------------------------------------
# CPC WRITE path (round 11): build + compress + serialize, byte-canonical
# with datasketches-java toByteArray() over the golden build matrix, with
# a full parse->serialize round trip and CpcUnion-identical unions.
# ---------------------------------------------------------------------------

import shutil
import subprocess

from pinot_spark.operators.ds_cpc import DsCpcSketch, cpc_union, parse_cpc

_JARS = "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/pyspark/jars"


class _JavaRandom:
    """java.util.Random LCG — to replay the golden random streams."""

    def __init__(self, seed: int):
        self.s = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.s = (self.s * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        v = self.s >> (48 - bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def next_long(self) -> int:
        v = ((self._next(32) << 32) + self._next(32)) & ((1 << 64) - 1)
        return v - (1 << 64) if v >= (1 << 63) else v


def _jmod(a: int, b: int) -> int:  # Java % truncates toward zero
    r = abs(a) % abs(b)
    return -r if a < 0 else r


def _build_vector(v) -> DsCpcSketch:
    lgk, n = v["lgk"], v["n"]
    if v["kind"] == "longs":
        return DsCpcSketch.build_from_longs(range(n), lgk)
    if v["kind"] == "rand_longs":
        rr = _JavaRandom(int(v["seed"]))
        s = DsCpcSketch(lgk)
        for _ in range(n):
            s.update_long(_jmod(rr.next_long(), n * 2 + 1))
        return s
    if v["kind"] == "strings":
        s = DsCpcSketch(lgk)
        for i in range(n):
            s.update_str(f"key-{i}")
        return s
    if v["kind"] == "doubles":
        s = DsCpcSketch(lgk)
        for i in range(n):
            s.update_double(i * 0.5)
        s.update_double(-0.0)
        s.update_double(float("nan"))
        return s
    # union of an lgK-11 and an lgK-12 sketch at lgK 11
    s1 = DsCpcSketch.build_from_longs(range(20000), 11)
    s2 = DsCpcSketch.build_from_longs(range(10000, 40000), 12)
    return cpc_union([s1, s2], 11)


def test_build_matrix_byte_parity_with_java():
    """Every golden build — all five flavors across lgK 4..16, long/
    string/double streams, and a mixed-lgK CpcUnion result — serializes
    byte-identically to the library."""
    flavors = set()
    for v in _VEC["builds"]:
        s = _build_vector(v)
        assert s.serialize().hex() == v["bytes"], (v["kind"], v["lgk"], v["n"])
        flavors.add(s.flavor())
        if "est" in v:
            assert abs(s.estimate() - float(v["est"])) <= 1e-9 * max(
                1.0, float(v["est"])
            )
    assert flavors == {"EMPTY", "SPARSE", "HYBRID", "PINNED", "SLIDING"}
    assert len(_VEC["builds"]) >= 120


def test_parse_serialize_round_trip_all_goldens():
    """Full decompression: parse every golden payload into the exact
    sketch state and re-serialize byte-identically."""
    for v in _VEC["builds"]:
        b = bytes.fromhex(v["bytes"])
        assert parse_cpc(b).serialize() == b, (v["kind"], v["lgk"], v["n"])
    for v in _VEC["sketches"]:
        b = bytes.fromhex(v["bytes"])
        assert parse_cpc(b).serialize() == b, v.get("kind", v.get("n"))


def test_union_of_parsed_matches_java_union():
    ju = next(v for v in _VEC["builds"] if v["kind"] == "union")
    s1 = DsCpcSketch.build_from_longs(range(20000), 11)
    s2 = DsCpcSketch.build_from_longs(range(10000, 40000), 12)
    u = cpc_union([parse_cpc(s1.serialize()), parse_cpc(s2.serialize())], 11)
    assert u.serialize().hex() == ju["bytes"]
    # empty union is the EMPTY_MERGED preamble
    e = cpc_union([])
    assert e.serialize()[:2] == bytes([2, 1])


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
def test_live_java_round_trip(tmp_path):
    """Java heapifies Python-emitted CPC bytes with identical estimates,
    unions them with a live Java sketch, and the Java union result
    matches the Python-side prediction byte-for-byte."""
    py = DsCpcSketch.build_from_longs(range(5000), 12)
    (tmp_path / "py.bin").write_bytes(py.serialize())
    src = tmp_path / "CRT.java"
    src.write_text(
        """
import org.apache.datasketches.cpc.CpcSketch;
import org.apache.datasketches.cpc.CpcUnion;
import java.nio.file.*;

public class CRT {
  public static void main(String[] args) throws Exception {
    CpcSketch s = CpcSketch.heapify(Files.readAllBytes(Paths.get(args[0])));
    System.out.println("est=" + Double.toString(s.getEstimate()));
    CpcSketch other = new CpcSketch(12);
    for (long i = 2500; i < 9000; i++) other.update(i);
    CpcUnion u = new CpcUnion(12);
    u.update(s); u.update(other);
    Files.write(Paths.get(args[0] + ".merged"), u.getResult().toByteArray());
  }
}
"""
    )
    cp = f"{_JARS}/datasketches-java-6.2.0.jar:{_JARS}/datasketches-memory-3.0.2.jar"
    subprocess.run(
        ["javac", "-cp", cp, str(src)], cwd=tmp_path, check=True, capture_output=True
    )
    out = subprocess.run(
        ["java", "-cp", f".:{cp}", "CRT", "py.bin"],
        cwd=tmp_path, check=True, capture_output=True, text=True,
    ).stdout
    est = float(out.strip().split("=")[1])
    assert abs(est - py.estimate()) <= 1e-9 * est
    jm = (tmp_path / "py.bin.merged").read_bytes()
    want = cpc_union(
        [py, DsCpcSketch.build_from_longs(range(2500, 9000), 12)], 12
    )
    assert want.serialize() == jm
    assert parse_cpc(jm).serialize() == jm


def test_sql_cpc_write_surface(spark):
    """TOCPCSKETCH / CPCSKETCHUNION / DISTINCTCOUNT[RAW]CPCSKETCH emit
    real DataSketches bytes; the aggregation result equals a CpcUnion
    over the same stream (the distributed broker-merge contract)."""
    from pinot_spark.dialect import PinotEngine

    eng = PinotEngine(spark)
    spark.range(0, 2000).selectExpr(
        "CAST(id % 700 AS BIGINT) AS v",
        "CONCAT('u', CAST(id % 450 AS STRING)) AS s",
    ).createOrReplaceTempView("cpc_sql_t")
    row = eng.sql(
        "SELECT DISTINCTCOUNTRAWCPCSKETCH(v) AS bl, "
        "DISTINCTCOUNTCPCSKETCH(s) AS cs, "
        "GET_CPC_SKETCH_ESTIMATE(DISTINCTCOUNTRAWCPCSKETCH(v, 11)) AS e11 "
        "FROM cpc_sql_t"
    ).collect()[0]
    flat = DsCpcSketch.build_from_longs(range(700), 12)
    assert bytes(row.bl) == cpc_union([flat], 12).serialize()
    # deterministic ICON estimates of the library-identical merged
    # sketches (coupon collisions make CPC approximate even here)
    str_sketch = DsCpcSketch(12)
    for i in range(450):
        str_sketch.update_str(f"u{i}")
    import math

    want_cs = math.floor(cpc_union([str_sketch], 12).estimate() + 0.5)
    assert row.cs == want_cs and abs(row.cs - 450) <= 10
    want_e11 = math.floor(
        cpc_union([DsCpcSketch.build_from_longs(range(700), 11)], 11).estimate()
        + 0.5
    )
    assert row.e11 == want_e11 and abs(row.e11 - 700) <= 25
    # singleton + union scalars against library-identical builds
    r2 = eng.sql(
        "SELECT TOCPCSKETCH(CAST(42 AS BIGINT)) AS b, "
        "GET_CPC_SKETCH_ESTIMATE(CPCSKETCHUNION("
        "TOCPCSKETCH('x'), TOCPCSKETCH('y'))) AS u"
    ).collect()[0]
    want = DsCpcSketch(12)
    want.update_long(42)
    assert bytes(r2.b) == want.serialize()
    assert r2.u == 2


def test_sql_tocpcsketch_null_double_is_empty_sketch(spark):
    """TOCPCSKETCH(NULL) on a nullable DOUBLE column must emit the
    EMPTY sketch (SketchFunctions.toCpcSketch(null)): a SQL NULL
    reaches the pandas UDF as NaN, which the double path would
    otherwise treat as a genuine canonical-NaN update (one coupon).
    A real NaN literal, by contrast, IS one distinct value."""
    from pinot_spark.dialect import PinotEngine
    from pinot_spark.operators.ds_cpc import DsCpcSketch

    eng = PinotEngine(spark)
    spark.sql(
        "SELECT * FROM VALUES (CAST(NULL AS DOUBLE)), (CAST('NaN' AS DOUBLE)) "
        "AS t(d)"
    ).createOrReplaceTempView("cpc_null_d")
    rows = eng.sql(
        "SELECT TOCPCSKETCH(d) AS b, GET_CPC_SKETCH_ESTIMATE(TOCPCSKETCH(d)) "
        "AS e FROM cpc_null_d"
    ).collect()
    empty = DsCpcSketch(12).serialize()
    blobs = sorted((bytes(r.b) for r in rows), key=len)
    assert blobs[0] == empty  # the NULL row: empty sketch, estimate 0
    assert len(blobs[1]) > len(empty)  # the NaN row: one-coupon update
    assert sorted(r.e for r in rows) == [0, 1]
