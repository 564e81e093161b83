"""Connected components / dedup_groups tests (operators/components.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.components import (
    connected_components,
    connected_components_star,
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


def test_connected_components_randomized_vs_union_find(spark):
    """Random graphs plus a deliberate chain (namespaced into ONE Spark
    run) must match a driver-side union-find exactly.

    Each propagation round is a full shuffle job, so the test keeps the
    chain short (4 edges still needs rounds beyond the one-hop seed) and
    drops shuffle parallelism — correctness is partition-count-independent
    and tiny-data task overhead dominates at 32 partitions."""
    import random

    def union_find(nodes, edges):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-label per component
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(mem) for mem in comp.values() for n in mem}

    all_edges, expected = [], {}
    rng = random.Random(7)
    for g in range(8):
        base = g * 10_000
        n_nodes = rng.randint(2, 12)
        nodes = [base + i for i in range(n_nodes)]
        n_edges = rng.randint(n_nodes, 3 * n_nodes)
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            edges = [(nodes[0], nodes[1])]
        all_edges += edges
        uf = union_find(nodes, edges)
        # CC only sees nodes with at least one edge
        touched = {a for a, _ in edges} | {b for _, b in edges}
        expected.update({n: uf[n] for n in touched})

    # deliberate chain: exercises propagation rounds beyond one-hop seeding
    chain = [(900_000 + i, 900_000 + i + 1) for i in range(4)]
    all_edges += chain
    expected.update({900_000 + i: 900_000 for i in range(5)})

    df = spark.createDataFrame(all_edges, "id_a: long, id_b: long")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = {r.node: r.comp for r in connected_components(df).collect()}
        got_star = {
            r.node: r.comp for r in connected_components_star(df).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert got == expected
    assert got_star == expected


def test_star_variant_long_chain(spark):
    """The deep-graph case the star variant exists for: a 40-node path has
    diameter 39 — plain propagation needs ~diameter rounds, large-star/
    small-star collapses it in O(log^2 n). Also: reversed/interleaved edge
    ids so min-propagation direction isn't aligned with the chain."""
    n = 40
    # zig-zag ids along the path: 0, 39, 1, 38, ... — worst case for
    # one-directional min flow
    order = []
    lo, hi = 0, n - 1
    while lo <= hi:
        order.append(lo)
        if lo != hi:
            order.append(hi)
        lo, hi = lo + 1, hi - 1
    edges = [(order[i], order[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = {
            r.node: r.comp
            for r in connected_components_star(df, max_iter=12).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert got == {i: 0 for i in range(n)}


def test_connected_components_string_ids_converge(spark):
    """String doc ids (URLs/digests): the old F.sum('comp') probe was
    NULL on strings -> silent one-round false convergence on chains."""
    from ia_hadoop_tools_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(chain, "id_a string, id_b string")
    got = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert got == {n: "a" for n in "abcdef"}
    star = {
        r["node"]: r["comp"]
        for r in connected_components_star(edges).collect()
    }
    assert star == got


def test_star_variant_keeps_self_loop_only_nodes(spark):
    """Drop-in-swap contract: a node whose only edge is a self-loop gets
    its singleton component row in BOTH variants."""
    from ia_hadoop_tools_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame([(5, 5), (1, 2)], "id_a long, id_b long")
    plain = {(r["node"], r["comp"]) for r in connected_components(edges).collect()}
    star = {(r["node"], r["comp"]) for r in connected_components_star(edges).collect()}
    assert star == plain == {(1, 1), (2, 1), (5, 5)}
