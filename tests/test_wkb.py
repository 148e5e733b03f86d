"""WKB / GeoJSON geometry codecs (functions/wkb.py): known-vector
decode, WKT round-trips across all supported types, cross-format
consistency, and the Spark UDF surface (StGeomFromWKBFunction /
StAsBinaryFunction / ConstructFromGeoJsonFunction reference names)."""

from __future__ import annotations

import json
import struct

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from pinot_spark.functions.scalar import call
from pinot_spark.functions.wkb import (
    geojson_to_wkt, wkb_to_wkt, wkt_to_geojson, wkt_to_wkb,
)

_WKTS = [
    "POINT (1 2)",
    "POINT (-71.064544 42.28787)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
    "MULTIPOINT (1 2, 3 4)",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
]


def test_known_wkb_vector():
    """POINT(1 2) little-endian — the canonical textbook WKB bytes."""
    b = bytes.fromhex("0101000000000000000000f03f0000000000000040")
    assert wkb_to_wkt(b) == "POINT (1 2)"
    assert wkt_to_wkb("POINT (1 2)") == b
    # big-endian variant decodes identically
    be = struct.pack(">bI2d", 0, 1, 1.0, 2.0)
    assert wkb_to_wkt(be) == "POINT (1 2)"


@pytest.mark.parametrize("wkt", _WKTS)
def test_wkb_roundtrip(wkt):
    assert wkb_to_wkt(wkt_to_wkb(wkt)) == wkt


@pytest.mark.parametrize("wkt", _WKTS)
def test_geojson_roundtrip(wkt):
    gj = wkt_to_geojson(wkt)
    assert geojson_to_wkt(gj) == wkt
    json.loads(gj)  # valid JSON


def test_geojson_feature_unwrap():
    f = '{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[3,4]}}'
    assert geojson_to_wkt(f) == "POINT (3 4)"


def test_unsupported_rejected():
    with pytest.raises(ValueError):
        wkb_to_wkt(struct.pack("<bI", 1, 7))  # GeometryCollection
    with pytest.raises(ValueError):
        geojson_to_wkt('{"type":"GeometryCollection","geometries":[]}')


@given(
    pts=st.lists(
        st.tuples(
            # + 0.0 folds -0.0 to 0.0: WKT has no negative-zero literal
            st.floats(-1e6, 1e6).map(lambda v: round(v, 6) + 0.0),
            st.floats(-1e6, 1e6).map(lambda v: round(v, 6) + 0.0),
        ),
        min_size=3,
        max_size=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_wkb_roundtrip_property(pts):
    ring = pts + [pts[0]]
    for wkt in (
        f"LINESTRING ({', '.join(f'{x} {y}' for x, y in pts)})",
        "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))",
    ):
        rt = wkb_to_wkt(wkt_to_wkb(wkt))
        assert rt == wkb_to_wkt(wkt_to_wkb(rt))  # stable fixed point
        # numeric equivalence (formatting may canonicalize, values not)
        a, b = wkt_to_wkb(wkt), wkt_to_wkb(rt)
        assert a == b


def test_spark_udf_surface(spark):
    donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    df = spark.createDataFrame([(1, donut)], "id int, wkt string")
    out = df.select(
        call("stGeomFromWKB", call("stAsBinary", F.col("wkt"))).alias("rt"),
        call("stGeomFromGeoJson", call("stAsGeoJson", F.col("wkt"))).alias("rt2"),
        call("stArea", call("stGeomFromWKB", call("stAsBinary", F.col("wkt")))).alias("area"),
    ).collect()[0]
    assert out.rt == donut and out.rt2 == donut
    assert out.area == 96.0  # decoded geometry flows into the polygon math
    # bad bytes → NULL (not a crash), like JTS parse failures surface null
    bad = spark.createDataFrame([(b"\x01\x63",)], "b binary")
    assert bad.select(call("stGeomFromWKB", F.col("b")).alias("g")).collect()[0].g is None
