#!/usr/bin/env python
"""Interleaved A/B for the round-11 Arrow-vectorized vector math: OLD
(zip_with+aggregate HOF, inlined below verbatim from the round-10 shapes)
vs NEW (vectorfns *_arrow) on the 8 embedding-family registry queries, in
ONE Spark session with alternating reps so JVM warmup and load drift hit
both sides equally.

Usage: python scripts/ab_vec_r11.py [pairs] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES_DEFAULT = [
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "embedding_neardup_capped",
    "semdedup",
    "prototype_prune",
]


# --- OLD implementations (verbatim shapes from 1e52e00) ---------------------

def old_dot_product_arrow(a, b):
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def old_l2_norm_arrow(a):
    return F.sqrt(old_dot_product_arrow(a, a))


def old_plane_dots_arrow(vec, planes):
    vec = F.col(vec) if isinstance(vec, str) else vec
    dots = []
    for pl in planes:
        arr = F.array(*[F.lit(x) for x in pl])
        dots.append(
            F.aggregate(
                F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*dots)


def main() -> None:
    args = sys.argv[1:]
    pairs = 4
    names = []
    for a in args:
        if a.isdigit():
            pairs = int(a)
        else:
            names.append(a)
    if not names:
        names = QUERIES_DEFAULT

    import ia_hadoop_tools_spark.functions.vectorfns as vf
    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    new_impls = (vf.dot_product_arrow, vf.l2_norm_arrow, vf.plane_dots_arrow)
    if os.environ.get("AB_VEC_PLANES_ONLY"):
        # isolate the pair-dot choice: BOTH sides keep the new Arrow
        # plane dots; old side reverts only dot_product/l2_norm to HOF
        old_impls = (
            old_dot_product_arrow, old_l2_norm_arrow, vf.plane_dots_arrow
        )
    else:
        old_impls = (
            old_dot_product_arrow, old_l2_norm_arrow, old_plane_dots_arrow
        )

    def set_impls(impls):
        vf.dot_product_arrow, vf.l2_norm_arrow, vf.plane_dots_arrow = impls

    spark = get_spark("r11-ab-vec")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].limit(5).collect()

    def run(name) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    print(f"pairs={pairs} load_start={os.getloadavg()[0]:.2f}", flush=True)
    for name in names:
        olds, news = [], []
        for _ in range(pairs):
            set_impls(old_impls)
            spark.sparkContext.setJobDescription(f"ab:{name}:old")
            try:
                olds.append(run(name))
            finally:
                set_impls(new_impls)
            spark.sparkContext.setJobDescription(f"ab:{name}:new")
            news.append(run(name))
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{name:26s} old med={mo:7.3f} min={min(olds):7.3f} | "
            f"new med={mn:7.3f} min={min(news):7.3f} | med ratio {mn / mo:0.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
