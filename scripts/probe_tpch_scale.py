#!/usr/bin/env python
"""10x scale probe for the heaviest round-4 TPC-H shapes (q9, q21).

Synthesizes a 10x copy of sf0.1's lineitem/orders (keys shifted per
replica so join cardinalities scale linearly, like a bigger TPC-H run
would) into /tmp, then times q9 (composite-key fact-to-ps join) and q21
(EXISTS/NOT-EXISTS multi-self-join) at 1x and 10x. Records the scaling
exponent the 100 TB story rests on: both should be ~linear (the quadratic
risks — ps blowup, self-join fanout — are bounded by key structure, not
data size).

Usage: python scripts/probe_tpch_scale.py  (writes PROBE lines to stdout;
copy the numbers into BASELINE.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/tpch_scale_probe"
REPLICAS = 10


def build(spark):
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.session import load_tables

    if os.path.exists(os.path.join(OUT, "_BUILT")):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    max_ok = t["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
    (
        t["lineitem"]
        .crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * max_ok)
        .drop("__rep")
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "lineitem.parquet"))
    )
    (
        t["orders"]
        .crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * max_ok)
        .drop("__rep")
        .write.mode("overwrite")
        .parquet(os.path.join(OUT, "orders.parquet"))
    )
    # dims unchanged: same parts/suppliers/nations — fact grows, dims don't,
    # exactly the 100 TB shape
    for name in ("part", "supplier", "nation", "customer"):
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(OUT, f"{name}.parquet")
        shutil.copyfile(src, dst) if os.path.isfile(src) else shutil.copytree(
            src, dst
        )
    open(os.path.join(OUT, "_BUILT"), "w").write("ok")


def timeq(fn, spark, sf_dir, n=3):
    best = float("inf")
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        best = min(best, time.time() - t0)
    return best


def main():
    from ia_hadoop_tools_spark.session import get_spark
    from ia_hadoop_tools_spark.tpch import q_tpch_q9, q_tpch_q21

    spark = get_spark("tpch-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    for name, fn in (("q9", q_tpch_q9), ("q21", q_tpch_q21)):
        t1 = timeq(fn, spark, SF_DIR)
        t10 = timeq(fn, spark, OUT)
        print(
            f"PROBE {name}: 1x={t1:.2f}s {REPLICAS}x={t10:.2f}s "
            f"ratio={t10 / t1:.2f} (linear={REPLICAS}.0)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
