#!/usr/bin/env python
"""Skewed-centroid probe for semdedup's oversized-cluster guard.

The failure mode the guard exists for: boilerplate embeddings collapsing
onto ONE centroid, so the within-cluster self-join's quadratic term is
bounded by ~the whole corpus, not corpus/k. The probe builds N vectors
with 80% landing in a single cell (near-identical boilerplate plus a
spread of in-cell non-dups) and times:

  exact     semdedup(...)                       -- quadratic in the hot cell
  guarded   semdedup(..., max_cluster_size=cap) -- banded LSH sub-buckets,
                                                   hot buckets linear via rep

and reports walls + dup-set agreement (the boilerplate mass must be
marked identically; only cross-band in-cell stragglers may differ).

Usage: python scripts/probe_semdedup_skew.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ia_hadoop_tools_spark.operators.similarity import semdedup  # noqa: E402
from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
DIM = 16


def build(spark):
    # 80% boilerplate: near-identical direction (all pairwise dups) with a
    # deterministic micro-perturbation; 20% spread across 15 other cells
    base = spark.range(N).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 5 < 4).alias("__boiler"),
    )
    vec = F.when(
        F.col("__boiler"),
        F.array(
            *(
                [F.lit(1.0) + F.col("vec_id").cast("double") * 1e-9]
                + [F.lit(1.0)] * (DIM - 1)
            )
        ),
    ).otherwise(
        F.array(
            *[
                F.cos(
                    (F.col("vec_id") * (j + 3) * 2654435761.0)
                    % F.lit(6.283185307)
                )
                for j in range(DIM)
            ]
        )
    )
    df = base.select("vec_id", vec.alias("embedding")).persist()
    df.count()
    cent_rows = [(0, [1.0] * DIM)] + [
        (c, [((c * 31 + j * 7) % 13 - 6.0) for j in range(DIM)])
        for c in range(1, 16)
    ]
    cent = spark.createDataFrame(
        cent_rows, "centroid_id long, centroid array<double>"
    )
    return df, cent


def run(df, cent, cap):
    t0 = time.monotonic()
    out = semdedup(
        df, cent, threshold=0.999, max_cluster_size=cap, dim=DIM
    )
    dups = {r.vec_id for r in out.filter("is_dup").collect()}
    wall = time.monotonic() - t0
    out.assign_cache.unpersist()
    return wall, dups


def main():
    spark = get_spark("probe-semdedup-skew")
    df, cent = build(spark)
    sizes = (
        semdedup(df, cent, threshold=0.999).assign_cache.groupBy("cluster_id")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    print(f"n={N} hot cell={sizes[0]['count']} rows ({sizes[0]['count']/N:.0%})")
    w_exact, d_exact = run(df, cent, cap=None)
    w_guard, d_guard = run(df, cent, cap=2000)
    boiler = {i for i in range(N) if i % 5 < 4}
    agree = (d_exact & boiler) == (d_guard & boiler)
    print(
        f"exact {w_exact:.1f}s ({len(d_exact)} dups) | "
        f"guarded cap=2000 {w_guard:.1f}s ({len(d_guard)} dups) | "
        f"speedup {w_exact / w_guard:.1f}x | boilerplate marks agree: {agree} | "
        f"straggler delta {len(d_exact ^ d_guard)}"
    )


if __name__ == "__main__":
    main()
