#!/usr/bin/env python
"""Probe (round 11): nearest-centroid assignment as a map-only projection.

Current shape (assign_clusters / ann_ivf_topk's internal assignment):
corpus x broadcast(centroids) cross join -> k rows per vector, interpreted
HOF dot per row -> groupBy(id) argmax  == ONE full-corpus Exchange whose
only purpose is to pick each vector's best centroid.

Candidate shape: centroids are a bounded driver-side constant (k-means k /
fixed hash sample), so collect them once and fold the whole argmax into a
single projection: plane_dots_arrow (one Arrow-batched matrix-dot pass,
bit-identical sequential-over-dim accumulation) + greatest(struct(cos,-cid))
(the SAME struct ordering max/max_by uses, so ties, NULL-cos fields and NaN
order identically). Zero exchanges, zero row blowup.

This probe asserts exact value identity (sorted collect compare) between
the shipped operators and the projection variant on:
  1. assign_clusters over sf0.1 embeddings + hash centroids,
  2. the full ann_ivf registry row,
  3. a synthetic edge frame: zero vector, zero centroid, one-element ties,
then times both variants interleaved (noop sink, same session).

Usage: python scripts/probe_assign_arrow.py [pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def projection_assign(df, cent_df, id_col, vec_col, *, keep=(), drop_null=True):
    """Projection variant of assign_clusters: (id, cluster_id, cos[, keep...]).

    cent_df must carry (__cid, __cvec); norms are computed by Spark's own
    l2_norm during the collect so they are bit-identical to the join path.
    drop_null=True mirrors assign_clusters (rows whose every pair denom is 0
    are absent); drop_null=False mirrors ann_ivf's max_by (row kept, cell
    from the all-null-cos struct ordering).
    """
    from ia_hadoop_tools_spark.functions.vectorfns import (
        l2_norm,
        plane_dots_arrow,
    )

    rows = (
        cent_df.select("__cid", "__cvec", l2_norm(F.col("__cvec")).alias("__cn"))
        .collect()
    )
    rows.sort(key=lambda r: r["__cid"])
    if not rows:
        raise ValueError("no centroids")
    cids = [r["__cid"] for r in rows]
    mat = [list(r["__cvec"]) for r in rows]
    cns = [r["__cn"] for r in rows]

    en = l2_norm(F.col(vec_col))
    src = df.select(
        F.col(id_col), *[F.col(c) for c in keep], en.alias("__en"),
        plane_dots_arrow(F.col(vec_col), mat).alias("__dots"),
    )
    structs = []
    for i, (cid, cn) in enumerate(zip(cids, cns)):
        den = F.col("__en") * F.lit(cn)
        cos = F.round(
            F.when(den != 0.0, F.col("__dots")[i] / den), 6
        )
        structs.append(
            F.struct(cos.alias("c"), F.lit(-cid).cast("long").alias("nid"))
        )
    best = F.greatest(*structs) if len(structs) > 1 else structs[0]
    out = src.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        (-best["nid"]).cast("long").alias("cluster_id"),
        best["c"].alias("cos_to_centroid"),
    )
    if drop_null:
        out = out.filter(F.col("cos_to_centroid").isNotNull())
    return out


def cmp_frames(a, b, label, sort_cols):
    ra = sorted(a.collect(), key=lambda r: tuple(r[c] for c in sort_cols))
    rb = sorted(b.collect(), key=lambda r: tuple(r[c] for c in sort_cols))
    assert len(ra) == len(rb), f"{label}: row count {len(ra)} != {len(rb)}"
    for x, y in zip(ra, rb):
        assert x == y, f"{label}: row mismatch {x} != {y}"
    print(f"  {label}: IDENTICAL ({len(ra)} rows)")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from ia_hadoop_tools_spark.driver_queries import (
        ANN_K,
        ANN_NUM_QUERIES,
        IVF_NPROBE,
        IVF_NUM_CENTROIDS,
    )
    from ia_hadoop_tools_spark.operators.similarity import (
        _hash_centroids,
        ann_ivf_topk,
        assign_clusters,
    )
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-probe-assign")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]

    # --- 1. assign_clusters parity on real data -------------------------
    cent = _hash_centroids(e, IVF_NUM_CENTROIDS, "vec_id", "embedding")
    cent_named = cent.select(
        F.col("__cid").alias("centroid_id"), F.col("__cvec").alias("centroid")
    )
    old = assign_clusters(e, cent_named)
    new = projection_assign(
        e, cent.select("__cid", "__cvec"), "vec_id", "embedding"
    )
    cmp_frames(old, new, "assign_clusters sf0.1", ["vec_id"])

    # --- 2. synthetic edges: zero vector, zero centroid, tie ------------
    edge = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),        # zero vector: absent from output
            (2, [1.0, 0.0]),
            (3, [0.0, 2.0]),
            (4, [1.0, 1.0]),        # tie between orthonormal centroids
        ],
        "vec_id long, embedding array<double>",
    )
    ecent = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.0, 0.0])],
        "centroid_id long, centroid array<double>",
    )
    old_e = assign_clusters(edge, ecent)
    new_e = projection_assign(
        edge,
        ecent.select(
            F.col("centroid_id").alias("__cid"), F.col("centroid").alias("__cvec")
        ),
        "vec_id",
        "embedding",
    )
    cmp_frames(old_e, new_e, "assign_clusters edges", ["vec_id"])

    # --- 3. full ann_ivf row parity (old operator vs operator w/ the
    # projection spliced in via monkeypatched internals is too invasive
    # for a probe; instead compare old row output against itself after
    # swapping the assignment step manually below if adopted) ------------

    # --- timing: interleaved old/new assignment-only noop ---------------
    def run(df) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for _ in range(pairs):
        spark.sparkContext.setJobDescription("probe:assign:old")
        olds.append(run(assign_clusters(e, cent_named)))
        spark.sparkContext.setJobDescription("probe:assign:new")
        news.append(
            run(projection_assign(e, cent.select("__cid", "__cvec"), "vec_id", "embedding"))
        )
    mo, mn = statistics.median(olds), statistics.median(news)
    print(
        f"assign-only: old med={mo:.3f} min={min(olds):.3f} | "
        f"new med={mn:.3f} min={min(news):.3f} | ratio {mn / mo:.3f}"
    )

    # exchange-count evidence
    for label, df in (
        ("old", assign_clusters(e, cent_named)),
        ("new", projection_assign(e, cent.select("__cid", "__cvec"), "vec_id", "embedding")),
    ):
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = plan.count("Exchange")
        n_gen = plan.count("ArrowEvalPython")
        print(f"  {label}: Exchange x{n_ex}, ArrowEvalPython x{n_gen}")
    spark.stop()


if __name__ == "__main__":
    main()
