"""Connected components / dedup_groups tests (operators/components.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def test_connected_components_chain_triangle(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # triangle 10-11-12, separate pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a: long, id_b: long",
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_groups_keep_flags(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5)], "doc_id: long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "id_a: long, id_b: long")
    rows = {r.doc_id: (r.group, r.keep) for r in dedup_groups(docs, pairs).collect()}
    assert rows == {
        1: (1, True),
        2: (1, False),
        4: (1, False),
        3: (3, True),   # isolated docs are their own singleton group
        5: (5, True),
    }
