#!/usr/bin/env python
"""Probe (round 11): nearest-centroid assignment as a map-only projection.

Current default shape (assign_clusters / ann_ivf_topk's internal
assignment): corpus x broadcast(centroids) cross join -> k rows per vector,
interpreted HOF dot per row -> groupBy(id) argmax == ONE full-corpus
Exchange whose only purpose is to pick each vector's best centroid.

Projection shape (`method="projection"`): collect the bounded centroid
table once, then ONE Arrow pass (plane_dots_arrow with_self_dot — k matrix
dots + the self-dot whose sqrt is the bit-identical l2_norm) + per-centroid
`when(den != 0, struct(round(cos,6), -cid))` folded by greatest (the same
struct ordering max/max_by use; null struct == not a join candidate).
Zero exchanges, zero row blowup, no interpreted HOF dot per (vector,
centroid) pair.

Asserts exact value identity between the two methods on real data at
$SPARK_GRAFT_SF_DIR plus edge frames (zero vector, ragged-dim vector,
zero/NULL centroids, ties), then times both interleaved (noop sink, the
centroid-collect construction INSIDE the timed region, as bench.py would
pay it).

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


def cmp_frames(a, b, label, sort_cols):
    ra = sorted(a.collect(), key=lambda r: tuple(r[c] for c in sort_cols))
    rb = sorted(b.collect(), key=lambda r: tuple(r[c] for c in sort_cols))
    assert len(ra) == len(rb), f"{label}: row count {len(ra)} != {len(rb)}"
    for x, y in zip(ra, rb):
        assert x == y, f"{label}: row mismatch {x} != {y}"
    print(f"  {label}: IDENTICAL ({len(ra)} rows)")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from ia_hadoop_tools_spark.driver_queries import IVF_NUM_CENTROIDS
    from ia_hadoop_tools_spark.operators.similarity import (
        _hash_centroids,
        assign_clusters,
    )
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-probe-assign")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]

    cent = _hash_centroids(e, IVF_NUM_CENTROIDS, "vec_id", "embedding")
    cent_named = cent.select(
        F.col("__cid").alias("centroid_id"), F.col("__cvec").alias("centroid")
    )

    # --- parity on real data --------------------------------------------
    cmp_frames(
        assign_clusters(e, cent_named),
        assign_clusters(e, cent_named, method="projection"),
        f"assign_clusters {os.path.basename(SF_DIR)}",
        ["vec_id"],
    )

    # --- edge semantics: zero vector, RAGGED vector, tie, zero/NULL cent -
    edge = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),         # zero vector: absent from output
            (2, [1.0, 0.0]),
            (3, [0.0, 2.0]),
            (4, [1.0, 1.0]),         # tie between orthonormal centroids
            (5, [1.0, 2.0, 3.0]),    # ragged: kept, null cos, smallest
                                     # NONZERO-den centroid id
        ],
        "vec_id long, embedding array<double>",
    )
    ecent = spark.createDataFrame(
        [(9, [0.0, 0.0]), (10, [1.0, 0.0]), (11, [0.0, 1.0]), (13, None)],
        "centroid_id long, centroid array<double>",
    )
    j = assign_clusters(edge, ecent)
    p = assign_clusters(edge, ecent, method="projection")
    cmp_frames(j, p, "assign_clusters edges", ["vec_id"])

    # --- timing: interleaved, construction (collect) inside the region --
    def run(method) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        assign_clusters(e, cent_named, method=method).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for _ in range(pairs):
        spark.sparkContext.setJobDescription("probe:assign:join")
        olds.append(run("join"))
        spark.sparkContext.setJobDescription("probe:assign:projection")
        news.append(run("projection"))
    mo, mn = statistics.median(olds), statistics.median(news)
    print(
        f"assign-only: join med={mo:.3f} min={min(olds):.3f} | "
        f"projection med={mn:.3f} min={min(news):.3f} | ratio {mn / mo:.3f}"
    )

    # exchange-count evidence
    for label, method in (("join", "join"), ("projection", "projection")):
        df = assign_clusters(e, cent_named, method=method)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = plan.count("Exchange hashpartitioning")
        n_py = plan.count("ArrowEvalPython")
        print(f"  {label}: Exchange-hash x{n_ex}, ArrowEvalPython x{n_py}")
    spark.stop()


if __name__ == "__main__":
    main()
