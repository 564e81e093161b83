#!/usr/bin/env python
"""Interleaved A/B/C for the round-11 pagerank shapes, on the registry
row's exact input (part<->supplier symmetric graph, 5 iterations,
all_nodes_have_inedges=True):

  A "old"    round-10 shape: lazy two-join superstep, no cache
  B "fused"  round-11 candidate: adj = edges JOIN outdeg, persisted;
             nodes/r0 still from the raw edge pipeline
  C "window" adj = edges + count(*) OVER (PARTITION BY src), persisted;
             nodes/r0 read back from the SAME cache (zero extra
             edge-pipeline executions)

One session, alternating reps; value identity asserted for all pairs
first.  Usage: python scripts/ab_pagerank_r11.py [pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = 5


def _consts():
    from ia_hadoop_tools_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        PR_SCALE,
        _damp_expr,
    )

    scale = PR_SCALE
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    return scale, base, _damp_expr


def pr_old(edges):
    scale, base, _damp_expr = _consts()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("__od"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    def superstep(ranks):
        per_src = outdeg.join(ranks, outdeg["src"] == ranks["node"]).select(
            "src", F.expr("rank div __od").alias("__contrib")
        )
        return (
            edges.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__c"))
            .select(
                "node",
                (F.lit(base) + F.expr(_damp_expr("__c"))).alias("rank"),
            )
        )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(ITERS):
        ranks = superstep(ranks)
    return ranks, ()


def pr_fused(edges):
    scale, base, _damp_expr = _consts()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("__od"))
    adj = edges.join(outdeg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    def superstep(ranks):
        return (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select("dst", F.expr("rank div __od").alias("__contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__c"))
            .select(
                "node",
                (F.lit(base) + F.expr(_damp_expr("__c"))).alias("rank"),
            )
        )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(ITERS):
        ranks = superstep(ranks)
    return ranks, (adj,)


def pr_window(edges):
    scale, base, _damp_expr = _consts()
    adj = edges.withColumn(
        "__od", F.count("*").over(Window.partitionBy("src"))
    ).persist()
    nodes = (
        adj.select(F.col("src").alias("node"))
        .unionByName(adj.select(F.col("dst").alias("node")))
        .distinct()
    )

    def superstep(ranks):
        return (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select("dst", F.expr("rank div __od").alias("__contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__c"))
            .select(
                "node",
                (F.lit(base) + F.expr(_damp_expr("__c"))).alias("rank"),
            )
        )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(ITERS):
        ranks = superstep(ranks)
    return ranks, (adj,)


VARIANTS = {"old": pr_old, "fused": pr_fused, "window": pr_window}


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from ia_hadoop_tools_spark.analytics_queries import PR_SUPPLIER_OFFSET
    from ia_hadoop_tools_spark.operators.graph import symmetric_edges
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-ab-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    li.limit(5).collect()

    def build(which):
        pairs_df = li.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + PR_SUPPLIER_OFFSET).alias("dst"),
        ).distinct()
        edges = symmetric_edges(pairs_df, "src", "dst")
        return VARIANTS[which](edges)

    # value identity first
    vals = {}
    for which in VARIANTS:
        df, caches = build(which)
        vals[which] = {r["node"]: r["rank"] for r in df.collect()}
        for c in caches:
            c.unpersist()
    ref = vals["old"]
    for which, v in vals.items():
        assert v == ref, f"{which} differs from old: {len(v)} vs {len(ref)}"
    print(f"value identity OK over {len(ref)} nodes", flush=True)

    def run(which) -> float:
        df, caches = build(which)
        spark.sparkContext.setJobDescription(f"ab:pagerank:{which}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        for c in caches:
            c.unpersist()
        return dt

    walls = {k: [] for k in VARIANTS}
    for _ in range(pairs):
        for which in VARIANTS:
            walls[which].append(run(which))
    mo = statistics.median(walls["old"])
    for which, ws in walls.items():
        m = statistics.median(ws)
        print(
            f"pagerank {which:6s} med={m:.3f} min={min(ws):.3f} "
            f"ratio-vs-old {m / mo:0.3f} ({['%.2f' % w for w in ws]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sym":
        pass  # handled at the bottom of the file
    else:
        main()


# ---------------------------------------------------------------------------
# Round-11 second experiment: duplicate-subtree cuts in the LAZY shape
# (explode-based symmetrize and node-list, no persists anywhere).
# Run: python scripts/ab_pagerank_r11.py sym [pairs]

def _sym_union(pairs, s, d):
    fwd = pairs.select(F.col(s).cast("long").alias("src"),
                       F.col(d).cast("long").alias("dst"))
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def _sym_explode(pairs, s, d):
    sc, dc = F.col(s).cast("long"), F.col(d).cast("long")
    return (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(sc.alias("src"), dc.alias("dst")),
                    F.struct(dc.alias("src"), sc.alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )


def _nodes_union(edges):
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def _nodes_explode(edges):
    return edges.select(
        F.explode(F.array("src", "dst")).alias("node")
    ).distinct()


def pr_lazy(edges, nodes):
    scale, base, _damp_expr = _consts()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("__od"))

    def superstep(ranks):
        per_src = outdeg.join(ranks, outdeg["src"] == ranks["node"]).select(
            "src", F.expr("rank div __od").alias("__contrib")
        )
        return (
            edges.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__c"))
            .select(
                "node",
                (F.lit(base) + F.expr(_damp_expr("__c"))).alias("rank"),
            )
        )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(ITERS):
        ranks = superstep(ranks)
    return ranks


def main_sym() -> None:
    import statistics

    pairs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from ia_hadoop_tools_spark.analytics_queries import PR_SUPPLIER_OFFSET
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-ab-pagerank-sym")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    li.limit(5).collect()

    def build(which):
        p = li.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + PR_SUPPLIER_OFFSET).alias("dst"),
        ).distinct()
        sym = _sym_union if which == "A" else _sym_explode
        nds = _nodes_explode if which == "C" else _nodes_union
        edges = sym(p, "src", "dst")
        return pr_lazy(edges, nds(edges))

    vals = {w: {r["node"]: r["rank"] for r in build(w).collect()}
            for w in ("A", "B", "C")}
    assert vals["A"] == vals["B"] == vals["C"], "rank vectors differ"
    print(f"value identity OK over {len(vals['A'])} nodes", flush=True)

    def run(w):
        spark.sparkContext.setJobDescription(f"ab:pagerank-sym:{w}")
        t0 = time.time()
        build(w).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    walls = {w: [] for w in ("A", "B", "C")}
    for _ in range(pairs_n):
        for w in walls:
            walls[w].append(run(w))
    ma = statistics.median(walls["A"])
    for w, ws in walls.items():
        print(
            f"pagerank-sym {w} med={statistics.median(ws):.3f} "
            f"min={min(ws):.3f} ratio {statistics.median(ws)/ma:0.3f} "
            f"({['%.2f' % x for x in ws]})", flush=True,
        )
    spark.stop()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "sym":
    main_sym()
