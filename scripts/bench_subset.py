#!/usr/bin/env python
"""Time a subset of registry queries with bench.py's exact methodology
(noop sink, min of reps, extra reps for sub-1.5s queries, shared session,
warmup) and print one JSON line. For A/B comparisons around a working-tree
change: run at the old tree, then the new tree, same box.

Usage: python scripts/bench_subset.py LABEL query [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS (3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("r11-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (bench.py parity)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.session import load_tables

    ev = load_tables(spark, SF_DIR, ("events",))["events"].limit(10000)
    w = Window.partitionBy("user_id").orderBy("event_id")
    warm = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    warm.join(warm.select("user_id").distinct(), "user_id").groupBy(
        "event_type"
    ).count().write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        best = -1.0
        done = 0
        budget = reps
        while done < budget:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}:{name}")
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
            except Exception as e:
                print(f"# error {name}: {type(e).__name__}: {str(e)[:300]}",
                      file=sys.stderr)
                best = -1.0
                break
            best = dt if best < 0 else min(best, dt)
            done += 1
            if best < 1.5:
                budget = max(reps, 5)
        timings[name] = best
    print(json.dumps({
        "label": label,
        "sf_dir": SF_DIR,
        "load_1m": round(os.getloadavg()[0], 2),
        "total": round(sum(t for t in timings.values() if t > 0), 3),
        "queries": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
