#!/usr/bin/env python
"""Skewed-group probe: exact vs approx group quantiles on a corpus where
ONE group holds 10M of 10.3M rows.

exact_group_quantiles ranks each group in a window — the hot group sorts
in a single task (the inherent exact-order-statistics funnel). The probe
shows approx_group_quantiles staying flat on the same data because the
sketch is built per-partition and merged (map-side combinable, no
per-group sort), while honoring its rank-error contract
(quantile_bound_check all-true).

Usage: python scripts/probe_quantile_skew.py [hot_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ia_hadoop_tools_spark.operators.analytics import (  # noqa: E402
    approx_group_quantiles,
    exact_group_quantiles,
    quantile_bound_check,
)
from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
COLD_GROUPS, COLD_ROWS = 30, 10_000


def main():
    spark = get_spark("probe-quantile-skew")
    hot = spark.range(HOT).select(
        F.lit("hot").alias("g"),
        (F.col("id") * 2654435761 % 1_000_003).cast("double").alias("v"),
    )
    cold = spark.range(COLD_GROUPS * COLD_ROWS).select(
        F.concat(F.lit("c"), (F.col("id") % COLD_GROUPS)).alias("g"),
        (F.col("id") * 40503 % 999_983).cast("double").alias("v"),
    )
    df = hot.unionByName(cold).repartition(32).persist()
    df.count()

    t0 = time.monotonic()
    exact_group_quantiles(df, ["g"], "v", tiebreak=()).collect()
    w_exact = time.monotonic() - t0

    t0 = time.monotonic()
    approx_group_quantiles(df, ["g"], "v").collect()
    w_approx = time.monotonic() - t0

    t0 = time.monotonic()
    bounds = quantile_bound_check(df, ["g"], "v").collect()
    w_check = time.monotonic() - t0
    ok = all(r["within_bound"] for r in bounds)

    print(
        f"rows={HOT + COLD_GROUPS * COLD_ROWS} hot_group={HOT} | "
        f"exact (window sort, hot group = 1 task) {w_exact:.1f}s | "
        f"approx (merged sketches) {w_approx:.1f}s = "
        f"{w_exact / w_approx:.1f}x | bound_check {w_check:.1f}s "
        f"all_within_bound={ok} ({len(bounds)} rows)"
    )


if __name__ == "__main__":
    main()
