#!/usr/bin/env python
"""Round-11 job-level profiler: run selected registry queries through the
noop sink with the Spark UI enabled, then read the UI REST API to break a
query's wall time into its Spark jobs (description, duration, stages,
task time, shuffle bytes). This answers "WHERE does the wall go" for
multi-job queries (iterative loops, eager probes, persists) that a single
end-to-end wall cannot.

Usage: python scripts/jobprof_r11.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: jobprof_r11.py query [query ...]")

    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("r11-jobprof", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = _api(ui, "/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app}"

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

    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        before_jobs = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"prof:{name}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        jobs = [
            j for j in _api(base, "/jobs") if j["jobId"] not in before_jobs
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        tot = 0.0
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")

            def ts(s):
                from datetime import datetime

                return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

            dur = (ts(comp) - ts(sub)).total_seconds() if sub and comp else -1
            tot += max(dur, 0)
            desc = (j.get("description") or j.get("name", ""))[:90]
            print(
                f"  job {j['jobId']:4d} {dur:7.3f}s tasks={j['numTasks']:4d} "
                f"stages={len(j['stageIds']):2d}  {desc}"
            )
        print(f"  sum(job durations) {tot:.3f}s  (gaps = driver/planning time)")
    spark.stop()


if __name__ == "__main__":
    main()
