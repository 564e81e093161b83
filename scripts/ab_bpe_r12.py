#!/usr/bin/env python
"""Round-12 interleaved A/B: bpe_strict_batch with the single-partition
merge-loop vocab (new default) vs the round-11 multi-partition loop
(forced via SPARK_GRAFT_BPE_ONE_PART_VOCAB=0).  One session, alternating
reps, merge equality asserted on every rep, job/stage counts from the
status tracker.

Usage: python scripts/ab_bpe_r12.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from ia_hadoop_tools_spark.analytics_queries import q_bpe_strict_batch
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("r12-ab-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def run(tag: str):
        os.environ.pop("SPARK_GRAFT_BPE_ONE_PART_VOCAB", None)
        if tag == "old":
            os.environ["SPARK_GRAFT_BPE_ONE_PART_VOCAB"] = "0"
        spark.catalog.clearCache()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        rows = sorted(
            map(tuple, q_bpe_strict_batch(spark, SF_DIR).collect())
        )
        dt = time.time() - t0
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        os.environ.pop("SPARK_GRAFT_BPE_ONE_PART_VOCAB", None)
        return dt, rows, j1 - j0

    # warm both once (JIT/session parity), assert identity
    w_new = run("new")
    w_old = run("old")
    assert w_new[1] == w_old[1], "merge contract rows differ!"
    assert all(eq for _, eq in w_new[1]), f"contract violated: {w_new[1]}"

    res = {"new": [], "old": []}
    jobs = {"new": [], "old": []}
    for i in range(reps):
        for tag in ("new", "old") if i % 2 == 0 else ("old", "new"):
            dt, rows, nj = run(tag)
            assert rows == w_new[1]
            res[tag].append(dt)
            jobs[tag].append(nj)
    for tag in ("new", "old"):
        xs = sorted(res[tag])
        med = xs[len(xs) // 2]
        print(
            f"{tag}: med {med:.3f}s min {xs[0]:.3f}s walls "
            f"{[round(x, 3) for x in res[tag]]} jobs {jobs[tag]}"
        )
    print(
        f"ratio new/old (med): "
        f"{sorted(res['new'])[reps // 2] / sorted(res['old'])[reps // 2]:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
