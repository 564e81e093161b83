#!/usr/bin/env python
"""Round-11 optimization profiler: time selected registry queries through
the noop sink (bench.py methodology: min of N reps on one session) and
optionally dump .explain("formatted") to plans/r11/<name>_<tag>.txt.

Usage:
  python scripts/profile_r11.py [--reps N] [--plans TAG] query [query ...]
  python scripts/profile_r11.py --all            # whole registry
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
)


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    plan_tag = None
    names: list[str] = []
    run_all = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            i += 1
            reps = int(args[i])
        elif a == "--plans":
            i += 1
            plan_tag = args[i]
        elif a == "--all":
            run_all = True
        else:
            names.append(a)
        i += 1

    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    if run_all:
        names = list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("r11-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py so first-query numbers are comparable
    try:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ia_hadoop_tools_spark.session import load_tables

        ev = load_tables(spark, SF_DIR, ("events",))["events"].limit(10000)
        w = Window.partitionBy("user_id").orderBy("event_id")
        warm = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
        warm.join(warm.select("user_id").distinct(), "user_id").groupBy(
            "event_type"
        ).count().write.format("noop").mode("overwrite").save()
    except Exception as e:  # pragma: no cover
        print(f"# warmup skipped: {e}", file=sys.stderr)

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if plan_tag is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(PLANS_DIR, f"{name}_{plan_tag}.txt"), "w"
            ) as f:
                f.write(plan)
        best = -1.0
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
            except Exception as e:
                print(f"# error {name}: {type(e).__name__}: {e}", file=sys.stderr)
                dt = -1.0
                walls.append(dt)
                best = -1.0
                break
            walls.append(dt)
            best = dt if best < 0 else min(best, dt)
        out[name] = best
        print(f"{name:28s} min={best:7.3f}  walls={walls}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
