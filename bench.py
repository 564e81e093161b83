#!/usr/bin/env python
"""Benchmark harness: run the full query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized through the noop sink (full plan execution, no
driver collect overhead) after a warm-up of the input file listing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("ia-hadoop-tools-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()  # isolate queries (some persist internally)
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # report, keep benching
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "registry_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
