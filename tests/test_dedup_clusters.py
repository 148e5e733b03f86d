"""Connected-components duplicate clustering (operators/dedup.py):
min-label propagation correctness on shapes that need >1 round, and the
duplicate_clusters keep-policy surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from pinot_spark.operators.dedup import connected_components, duplicate_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.comp for r in rows}


def test_chain_converges_across_rounds(spark):
    """A 6-node chain has diameter 5 — forces several propagation rounds
    (each round halves-ish the label distance)."""
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert comp == {i: 1 for i in range(1, 7)}


def test_multiple_components_and_transitivity(spark):
    # A~B, B~C (not A~C): transitivity must merge; 10-11 separate
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_duplicate_clusters_keep_policy(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in (3, 5, 7, 9)], "id long")
    out = {r.id: (r.component, r.is_canonical)
           for r in duplicate_clusters(pairs, all_ids=all_ids).collect()}
    # 5-7-9 collapse to component 5 (min id canonical); 3 is a singleton
    assert out == {3: (3, True), 5: (5, True), 7: (5, False), 9: (5, False)}
