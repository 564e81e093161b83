"""Link-graph analytics: Pregel-style iterative PageRank on DataFrames.

A web archive's CDX cluster is one half of the archive's value; the other
half is the link graph extracted from WAT outlinks (the reference's WAT
pipeline, jobs/WATGenerator.java:48-120, exists to feed exactly this kind
of host-graph analysis). This module is the iterative-algorithm pattern
the engine needs for it: rank propagation as a per-iteration
join + aggregate, expressed so every iteration is one shuffle keyed on
the destination node.

Determinism contract: ranks are computed in SCALED INTEGER arithmetic
(bigint, scale = 1e9) with floor division, so the result is bit-exact
regardless of partitioning, accumulation order, or engine — a fixed
iteration count unrolls to plain ANSI SQL (see
``analytics_queries.SQL_PAGERANK``) and hashes identically. Floating
point would make sum order observable; integers make the oracle exact.

Scale shape (100 TB graph): edges are the big table; they are joined
once with out-degrees and persisted partitioned by ``src``, so each
iteration shuffles only the rank vector (one skinny (node, rank) row per
node) to the edge partitioning, then one groupBy(dst) shuffle for the
new ranks — the classic Pregel superstep cost, linear in |E| per
iteration with no driver-side state. ``materialize_every`` optionally
cuts lineage for deep iteration counts; the default keeps construction
fully lazy (no Spark job until the caller acts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: rank 1.0 == 1_000_000_000
PR_SCALE = 1_000_000_000
#: damping factor 0.85 as an exact rational
DAMP_NUM, DAMP_DEN = 85, 100


def symmetric_edges(pairs: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Distinct directed edges both ways from a (src, dst) pair table.

    Symmetrizing guarantees every node has out-degree >= 1, so no rank
    mass dangles (the undirected-PageRank convention).
    """
    fwd = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = PR_SCALE,
    materialize_every: int | None = None,
    cache_edges: bool = True,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list (``src``, ``dst``).

    Update rule (all bigint, ``div`` = floor division)::

        contrib(u)   = rank_i(u) div outdeg(u)
        rank_{i+1}(v) = (15 * scale) div 100
                      + (85 * sum_{u->v} contrib(u)) div 100

    Ranks start at ``scale`` (1.0) per node — the unnormalized
    convention, so ranks are comparable across graph sizes. Nodes with
    no in-edges settle at the teleport floor. Dangling nodes (out-degree
    0, only possible on asymmetric graphs) contribute nothing, matching
    the "leaked mass" PageRank variant.

    Returns (``node`` long, ``rank`` long). Lazy: builds a ``2 *
    iterations``-join plan; pass ``materialize_every=k`` to
    localCheckpoint the rank vector every k iterations (runs jobs
    eagerly — only worth it past ~10 iterations, where plan depth itself
    becomes the cost).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    outdeg = edges.groupBy("src").agg(F.count("*").alias("__od"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Every iteration rescans edges/outdeg/nodes, so persist (LAZY — no
    # job yet; the first action materializes them once instead of
    # `iterations` times).
    if cache_edges:
        edges = edges.persist()
        outdeg = outdeg.persist()
        nodes = nodes.persist()
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for i in range(iterations):
        # per-SOURCE contribution first: a node-sized join (rank vector
        # x out-degrees), so the big edge table is touched exactly once
        # per iteration, joined against the skinny contrib side (AQE
        # broadcasts it when it fits; at web scale both sides shuffle on
        # src — the Pregel superstep cost either way)
        per_src = outdeg.join(ranks, outdeg["src"] == ranks["node"]).select(
            "src", F.expr("rank div __od").alias("__contrib")
        )
        sums = (
            edges.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__c"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({DAMP_NUM} * coalesce(__c, 0L)) div {DAMP_DEN}")
            ).alias("rank"),
        )
        if materialize_every and (i + 1) % materialize_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node (out_degree, in_degree) from a directed edge list."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
