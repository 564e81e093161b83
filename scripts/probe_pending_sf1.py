#!/usr/bin/env python
"""Scale probe: run the round-7 pending queries at sf0.1 and sf1 and
print per-query walls — the same exponent check BASELINE.md records for
the frozen registry (a ~10x-data query should cost ~10x +- noise unless
its output grows faster, which must then be attributable).

Usage: python scripts/probe_pending_sf1.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/iht_sf1"


def main() -> None:
    from ia_hadoop_tools_spark.pending_queries import PENDING_QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("probe-pending-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in sorted(PENDING_QUERIES.items()):
        # untimed warmup against the small-sf dir so the timed walls
        # measure the query, not first-run codegen/classloading
        # (bench.py's protocol)
        spark.catalog.clearCache()
        fn(spark, SF01).count()
        walls = {}
        rows = {}
        for label, d in (("sf0.1", SF01), ("sf1", SF1)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows[label] = fn(spark, d).count()
            walls[label] = time.monotonic() - t0
        ratio = walls["sf1"] / max(walls["sf0.1"], 1e-9)
        rratio = rows["sf1"] / max(rows["sf0.1"], 1)
        print(
            f"{name}: sf0.1 {walls['sf0.1']:.2f}s/{rows['sf0.1']} rows -> "
            f"sf1 {walls['sf1']:.2f}s/{rows['sf1']} rows "
            f"(wall x{ratio:.1f}, rows x{rratio:.1f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
