#!/usr/bin/env python
"""Dump .explain("formatted") of registry queries to plans/r12/<q>_<suffix>.txt
(the round-11 plan-evidence artifacts: run with suffix=before at the old
tree, suffix=after at the new one).

Usage: python scripts/explain_r11.py SUFFIX query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]

    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("r11-explain")
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(repo, "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
