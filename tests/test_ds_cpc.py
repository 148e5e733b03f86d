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
