"""operators/ull.py: engine-own UltraLogLog (Ertl register layout) —
merge algebra, error bound, wire roundtrip, and the bounded SQL path."""

from __future__ import annotations

import numpy as np
import pytest

from pinot_spark.operators.ull import DEFAULT_P, UllSketch


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64) * np.uint64(2)


def test_default_p_matches_reference():
    # CommonConstants.DEFAULT_ULTRALOGLOG_P = 12
    assert DEFAULT_P == 12


def test_register_packing_and_flags():
    # craft hashes for one register with k = 5, 4, 3 → u=5, both flags
    p = 8
    idx = np.uint64(3) << np.uint64(64 - p)
    def h(k):  # first 1-bit of the remaining word at position k-1
        return idx | (np.uint64(1) << np.uint64(64 - p - k))
    s = UllSketch.from_hashes(np.array([h(5), h(4), h(3)], dtype=np.uint64), p)
    r = int(s.registers[3])
    assert r == 4 * 5 + 2 + 1
    # only u and u-2 → flag bit 1 alone
    s2 = UllSketch.from_hashes(np.array([h(5), h(3)], dtype=np.uint64), p)
    assert int(s2.registers[3]) == 4 * 5 + 1


def test_merge_of_halves_equals_full_build():
    h = _hashes(60_000)
    full = UllSketch.from_hashes(h)
    merged = UllSketch.from_hashes(h[:35_000]).merge(UllSketch.from_hashes(h[25_000:]))
    assert full.to_bytes() == merged.to_bytes()


def test_merge_is_commutative_and_idempotent():
    a = UllSketch.from_hashes(_hashes(5_000, seed=1))
    b = UllSketch.from_hashes(_hashes(5_000, seed=2))
    assert a.merge(b).to_bytes() == b.merge(a).to_bytes()
    assert a.merge(a).to_bytes() == a.to_bytes()


def test_estimate_error_bound():
    for n in (500, 20_000, 200_000):
        h = np.unique(_hashes(n))
        est = UllSketch.from_hashes(h).estimate()
        # served estimator is HLL-style: 3 sigma of 1.04/sqrt(4096)
        assert abs(est - len(h)) <= 3 * 1.04 / (2**12) ** 0.5 * len(h) + 2


def test_bytes_roundtrip_and_magic():
    s = UllSketch.from_hashes(_hashes(1000), p=10)
    back = UllSketch.from_bytes(s.to_bytes())
    assert back.p == 10 and np.array_equal(back.registers, s.registers)
    with pytest.raises(ValueError):
        UllSketch.from_bytes(b"\x0c" + bytes(4096))  # HLL layout, no magic


def test_sql_raw_ull_pipeline(spark):
    """DISTINCTCOUNTRAWULL / TOULL / GETULLESTIMATE through the dialect:
    bounded-domain register pairs, byte-identical to from_hashes."""
    from pinot_spark.dialect import PinotEngine

    df = spark.range(0, 4000).selectExpr(
        "CASE WHEN id % 40 = 0 THEN NULL ELSE CAST((id * 11) % 900 AS STRING) END AS v"
    )
    df.createOrReplaceTempView("ull_sql_t")
    eng = PinotEngine(spark, default_limit=1000)
    row = eng.sql(
        "SELECT GETULLESTIMATE(DISTINCTCOUNTRAWULL(v)) AS dc, "
        "DISTINCTCOUNTRAWULL(v, 10) AS b10, "
        "GETULLESTIMATE(TOULL('x')) AS one FROM ull_sql_t"
    ).collect()[0]
    assert row.one == 1
    assert abs(row.dc - 899) <= 0.10 * 899  # 899 distinct non-null values
    hashes = np.array(
        [r.h for r in df.where("v IS NOT NULL").selectExpr("xxhash64(v) AS h").collect()],
        dtype=np.int64,
    ).astype(np.uint64) + np.uint64(2**63)
    assert bytes(row.b10) == UllSketch.from_hashes(hashes, 10).to_bytes()


def test_sql_raw_ull_plan_is_bounded(spark):
    from pinot_spark.dialect import PinotEngine

    spark.range(10).selectExpr("CAST(id AS STRING) AS v").createOrReplaceTempView(
        "ull_plan_t"
    )
    eng = PinotEngine(spark, default_limit=10)
    q = eng.translate("SELECT DISTINCTCOUNTRAWULL(v) AS b FROM ull_plan_t")[0]
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "collect_set" in plan


def test_ml_estimator_beats_hll_at_equal_bytes():
    """VERDICT r7 #4: the served estimator must extract the flag-bit
    information so DISTINCTCOUNTULL's error envelope beats HLL's at
    equal register bytes (the reason the reference adopted ULL —
    DistinctCountULLAggregationFunction.java). Both sketches here use
    2^p one-byte registers; across deterministic seeds and
    cardinalities the ML estimate's mean |error| must come in clearly
    under both plain HLL and ULL's own harmonic estimate."""
    from pinot_spark.operators.hll import HllSketch

    p = 10
    errs_ml, errs_harm, errs_hll = [], [], []
    for n in (2000, 10000, 50000):
        for seed in (1, 2, 3, 4, 5):
            rng = np.random.default_rng(seed * 1000 + n)
            h = np.unique(rng.integers(0, 2**64, size=n, dtype=np.uint64))
            nn = len(h)
            ull = UllSketch.from_hashes(h, p)
            hll = HllSketch.from_hashes(h, p)
            errs_ml.append(abs(ull.estimate() - nn) / nn)
            errs_harm.append(abs(ull.estimate_harmonic() - nn) / nn)
            errs_hll.append(abs(hll.estimate() - nn) / nn)
    assert np.mean(errs_ml) < 0.85 * np.mean(errs_hll)
    assert np.mean(errs_ml) < 0.85 * np.mean(errs_harm)
    # and the envelope itself stays sane (~1.04/sqrt(1024) = 3.3%)
    assert np.mean(errs_ml) < 0.033


def test_ml_estimator_merge_of_halves_consistent():
    """The ML estimate is a pure function of the registers, so the
    merge-of-halves sketch must estimate exactly like the full build."""
    h = _hashes(30000)
    full = UllSketch.from_hashes(h)
    merged = UllSketch.from_hashes(h[:15000]).merge(UllSketch.from_hashes(h[15000:]))
    assert full.to_bytes() == merged.to_bytes()
    assert full.estimate() == merged.estimate()
    n = len(np.unique(h))
    assert abs(full.estimate() - n) / n < 0.05


def test_ml_estimator_small_and_empty():
    assert UllSketch.empty().estimate() == 0.0
    h = _hashes(5)
    s = UllSketch.from_hashes(h)
    n = len(np.unique(h))
    assert abs(s.estimate() - n) <= max(1.0, 0.2 * n)
