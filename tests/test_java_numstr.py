"""Java Float.toString / Double.toString parity (operators/cs_hll.py
_java_float_str / _java_double_str / _legacy_dtoa).

stream-lib's HyperLogLogPlus hashes numbers via ``hash64(o.toString())``
(no numeric dispatch branch), so the EXACT Java string — the container
JDK 17's LEGACY FloatingDecimal output, NOT shortest-round-trip (Ryū
landed in JDK 19) — is load-bearing for clearspring HLL++ wire interop.
The legacy algorithm was reconstructed from the JDK 17 bytecode
(javap -c jdk.internal.math.FloatingDecimal$BinaryToASCIIBuffer — the
container ships no src.zip) and validated against 2.0M float and 1.55M
double live-Java vectors with ZERO mismatches; this file pins a 23.5k
golden subset plus a fresh live-Java sweep when a JDK is present.

Known legacy behaviors the implementation reproduces exactly (shortest
repr gets all of these wrong):
- Float.toString(Float.MIN_VALUE) == "1.4E-45"   (power-of-two M hack)
- Float.toString(4.6853484E25f) truncates where exact arithmetic says
  round up (B+M overflows long, silently falsifying the 'high' test)
- integer-valued floats/doubles drop floor(log10(2^(binExp-nSig-1)))
  low digits with half-up rounding ("2.2856919E9", 8 digits, not 7)
"""

import json
import os
import shutil
import struct
import subprocess

import pytest

from pinot_spark.operators.cs_hll import _java_double_str, _java_float_str

_VEC = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "java_numstr_vectors.json"))
)


def _f32(hexbits: str) -> float:
    return struct.unpack("<f", struct.pack("<I", int(hexbits, 16) & 0xFFFFFFFF))[0]


def _f64(hexbits: str) -> float:
    return struct.unpack(
        "<d", struct.pack("<Q", int(hexbits, 16) & 0xFFFFFFFFFFFFFFFF)
    )[0]


def test_float_golden_vectors():
    bad = [
        (hb, js, _java_float_str(_f32(hb)))
        for hb, js in _VEC["float32"]
        if _java_float_str(_f32(hb)) != js
    ]
    assert not bad, bad[:5]
    assert len(_VEC["float32"]) > 15000


def test_double_golden_vectors():
    bad = [
        (hb, js, _java_double_str(_f64(hb)))
        for hb, js in _VEC["float64"]
        if _java_double_str(_f64(hb)) != js
    ]
    assert not bad, bad[:5]
    assert len(_VEC["float64"]) > 4000


def test_legacy_quirks_pinned():
    """The cases where legacy output differs from shortest round-trip —
    if these start failing after a JDK swap, the container's
    Float.toString switched algorithms (Ryū, JDK 19+) and the golden
    vectors must be regenerated."""
    assert _java_float_str(_f32("1")) == "1.4E-45"
    assert _java_float_str(_f32("800000")) == "1.17549435E-38"
    assert _java_float_str(_f32("6a1b0672")) == "4.6853484E25"  # B+M long overflow
    assert _java_float_str(_f32("4f083ce4")) == "2.2856919E9"  # insignificant digits
    assert _java_float_str(_f32("7f7fffff")) == "3.4028235E38"
    assert _java_double_str(_f64("1")) == "4.9E-324"
    assert _java_double_str(_f64("60000000000000")) == "7.1202363472230444E-307"
    assert _java_double_str(0.1) == "0.1"
    assert _java_double_str(-0.0) == "-0.0"
    assert _java_float_str(float("nan")) == "NaN"
    assert _java_double_str(float("-inf")) == "-Infinity"


def test_layout_regimes():
    """Plain decimal for 1e-3 <= |x| < 1e7, scientific otherwise, always
    one fraction digit."""
    assert _java_float_str(1.0) == "1.0"
    assert _java_float_str(-1.5) == "-1.5"
    assert _java_float_str(9999999.0) == "9999999.0"
    assert _java_float_str(1e7) == "1.0E7"
    assert _java_float_str(0.001) == "0.001"
    assert _java_double_str(1234567.0) == "1234567.0"
    assert _java_double_str(12345678.0) == "1.2345678E7"
    assert _java_double_str(0.0001) == "1.0E-4"


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
def test_live_java_sweep(tmp_path):
    """Fresh random vectors from the container JDK at test time — the
    goldens can't rot silently."""
    src = tmp_path / "NS.java"
    src.write_text(
        """
public class NS {
  public static void main(String[] a) {
    java.util.Random r = new java.util.Random(Long.parseLong(a[0]));
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < 20000; i++) {
      int fb = r.nextInt() & 0x7FFFFFFF;
      float f = Float.intBitsToFloat(fb);
      if (!Float.isNaN(f) && !Float.isInfinite(f))
        sb.append("F").append(Integer.toHexString(fb)).append('=').append(f).append('\\n');
      long db = r.nextLong() & 0x7FFFFFFFFFFFFFFFL;
      double d = Double.longBitsToDouble(db);
      if (!Double.isNaN(d) && !Double.isInfinite(d))
        sb.append("D").append(Long.toHexString(db)).append('=').append(d).append('\\n');
    }
    System.out.print(sb);
  }
}
"""
    )
    subprocess.run(["javac", str(src)], cwd=tmp_path, check=True, capture_output=True)
    out = subprocess.run(
        ["java", "NS", str(os.getpid())],
        cwd=tmp_path,
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    n = 0
    for line in out.splitlines():
        kind, rest = line[0], line[1:]
        hexbits, jstr = rest.split("=", 1)
        if kind == "F":
            assert _java_float_str(_f32(hexbits)) == jstr, (hexbits, jstr)
        else:
            assert _java_double_str(_f64(hexbits)) == jstr, (hexbits, jstr)
        n += 1
    assert n > 30000
