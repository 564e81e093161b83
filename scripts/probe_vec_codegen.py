#!/usr/bin/env python
"""Round-11 micro-probe: three implementations of the hot vector math
(LSH plane dots + per-pair cosine dots):

  old  — zip_with + aggregate higher-order functions (CodegenFallback:
         interpreted per element, breaks whole-stage codegen)
  unr  — unrolled fixed-dim expression chain (fails janino compile at
         dim 64 x 16 planes: method > 64KB -> interpreted fallback)
  pd   — Arrow-batched pandas UDF, numpy accumulation SEQUENTIAL OVER DIM
         and vectorized over rows: for i in range(dim): acc += a[:,i]*b[:,i]
         — bit-identical to the JVM's sequential left-to-right double fold

Values are asserted equal (max |delta| == 0) before timing.

Usage: python scripts/probe_vec_codegen.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def old_dot_const(v, w):
    arr = F.array(*[F.lit(x) for x in w])
    return F.aggregate(
        F.zip_with(v, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from ia_hadoop_tools_spark.operators.similarity import hyperplanes
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("r11-vec-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb.limit(5).collect()

    planes = hyperplanes(16, 64)
    P = np.array(planes, dtype=np.float64)  # 16 x 64

    @F.pandas_udf("array<double>")
    def plane_dots_pd(s: pd.Series) -> pd.Series:
        V = np.stack(s.to_numpy()).astype(np.float64)  # n x 64
        acc = np.zeros((V.shape[0], P.shape[0]))
        for i in range(P.shape[1]):
            acc += V[:, i : i + 1] * P[:, i]
        return pd.Series(list(acc))

    @F.pandas_udf("double")
    def pair_dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(A.shape[0])
        for i in range(A.shape[1]):
            acc += A[:, i] * B[:, i]
        return pd.Series(acc)

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def ab(name, builders):
        walls = {k: [] for k in builders}
        for _ in range(reps):
            for k, b in builders.items():
                spark.sparkContext.setJobDescription(f"vec:{name}:{k}")
                walls[k].append(run(b()))
        base = statistics.median(walls["old"])
        for k, ws in walls.items():
            m = statistics.median(ws)
            print(
                f"{name:6s} {k:4s} med={m:7.3f} ratio={m / base:0.3f} "
                f"({['%.2f' % w for w in ws]})",
                flush=True,
            )

    # ---- value identity (old vs pandas-UDF) --------------------------------
    v = F.col("embedding")
    dots_pd = plane_dots_pd(v)
    chk = emb.select(
        *[
            (old_dot_const(v, p) - F.get(dots_pd, i)).alias(f"d{i}")
            for i, p in enumerate(planes[:16])
        ],
        (old_dot(v, v) - pair_dot_pd(v, v)).alias("dself"),
    )
    agg = chk.agg(*[F.max(F.abs(F.col(c))).alias(c) for c in chk.columns]).collect()[0]
    mx = max(agg)
    print("max |old-pd| over 16 planes + self-dot:", mx, flush=True)
    assert mx == 0.0, "NOT bit-identical"

    # ---- case 1: 16-plane dots over the corpus x50 (~100k rows) ------------
    big = emb.crossJoin(spark.range(50)).select("embedding")

    def bits_old():
        return big.select(
            *[
                (old_dot_const(v, p) >= 0).cast("int").alias(f"b{i}")
                for i, p in enumerate(planes)
            ]
        )

    def bits_pd():
        d = plane_dots_pd(v)
        return big.select(
            *[(F.get(d, i) >= 0).cast("int").alias(f"b{i}") for i in range(16)]
        )

    ab("bits", {"old": bits_old, "pd": bits_pd})

    # ---- case 2: per-pair dot over the exact-neardup crossJoin shape -------
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))

    def pairs_old():
        return (
            a.crossJoin(b)
            .filter(F.col("ia") < F.col("ib"))
            .select(old_dot(F.col("ea"), F.col("eb")).alias("d"))
        )

    def pairs_pd():
        return (
            a.crossJoin(b)
            .filter(F.col("ia") < F.col("ib"))
            .select(pair_dot_pd(F.col("ea"), F.col("eb")).alias("d"))
        )

    ab("pairs", {"old": pairs_old, "pd": pairs_pd})
    spark.stop()


if __name__ == "__main__":
    main()
