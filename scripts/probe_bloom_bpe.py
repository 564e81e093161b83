#!/usr/bin/env python
"""Scale probes for plans/bloom.py and operators/bpe.py at sf0.1.

Bloom: the 100 TB shape is a build side too big to broadcast, so the
probe disables auto-broadcast and compares the shuffle-side row volume
and wall of the plain SortMergeJoin semi-join vs the Bloom-pruned one,
at 1x and REP x replicated probe size (disjoint orderkeys keep the
semantics identical per replica).

BPE: pair counting collapses the corpus to a vocabulary first; the
probe replicates the corpus REP x (identical text, so the VOCAB word
set is unchanged and counts scale exactly REP x) and checks the wall
grows far slower than the corpus.

Usage: python scripts/probe_bloom_bpe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ia_hadoop_tools_spark.plans.bloom import bloom_build, bloom_prune  # noqa: E402
from ia_hadoop_tools_spark.operators.bpe import bpe_pair_counts  # noqa: E402
from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def best_of(n, fn):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def replicate(df, key, reps, stride):
    # union of shifted copies (not a crossJoin: a range crossJoin pulls
    # downstream UDF filters into the join condition in the optimizer)
    parts = [
        df.withColumn(key, F.col(key) + F.lit(i * stride)) for i in range(reps)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    spark = get_spark(app_name="probe-bloom-bpe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    stride = 1 << 40

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    build0 = orders.filter(F.col("o_orderpriority") == "1-URGENT")

    for tag, reps in (("1x", 1), (f"{REPS}x", REPS)):
        probe = replicate(li, "l_orderkey", reps, stride)
        build = replicate(build0, "o_orderkey", reps, stride)
        keys = build.select(F.col("o_orderkey").alias("l_orderkey"))

        plain = best_of(
            3, lambda: probe.join(keys, "l_orderkey", "left_semi").count()
        )
        mask = bloom_build(build, "o_orderkey")
        t0 = time.monotonic()
        mask = bloom_build(build, "o_orderkey")
        t_build = time.monotonic() - t0
        pruned = bloom_prune(probe, "l_orderkey", mask)
        bloomed = best_of(
            3, lambda: pruned.join(keys, "l_orderkey", "left_semi").count()
        )
        n_total = probe.count()
        n_pruned = pruned.count()
        print(
            f"bloom {tag}: probe_rows={n_total} pruned_to={n_pruned} "
            f"({100.0 * n_pruned / n_total:.1f}% reach the shuffle) "
            f"plain_smj={plain:.2f}s bloom_build={t_build:.2f}s "
            f"bloom_smj={bloomed:.2f}s",
            flush=True,
        )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # merge-loop depth: per-merge cost must stay flat (vocab-bounded,
    # lineage cut + storage released every materialize_every steps)
    from ia_hadoop_tools_spark.operators.bpe import bpe_train

    for n_merges in (10, 30):
        t0 = time.monotonic()
        merges = bpe_train(docs, "text", num_merges=n_merges)
        wall = time.monotonic() - t0
        n_persist = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        print(
            f"bpe_train {n_merges} merges: {wall:.2f}s "
            f"({wall / len(merges):.2f}s/merge), "
            f"persistent RDDs after: {n_persist}",
            flush=True,
        )

    for tag, reps in (("1x", 1), (f"{REPS}x", REPS)):
        rep = docs
        for _ in range(reps - 1):
            rep = rep.unionByName(docs)
        wall = best_of(3, lambda: bpe_pair_counts(rep, "text").count())
        n = rep.count()
        print(f"bpe_pairs {tag}: docs={n} wall={wall:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
