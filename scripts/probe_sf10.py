#!/usr/bin/env python
"""Scale probe: one decade past sf1 for the hot bench family.

The sf0.1 -> sf1 decade found real exponents (triangles, round 5); this
probe runs the top-6 most expensive bench queries one MORE decade up
(sf1 -> sf10, a 100x-the-driver-snapshot synthesis via make_sf1.py
applied to /tmp/iht_sf1) and records per-query wall + output row count
(for the pair/cluster queries the row count IS the candidate/answer
size, so a super-linear wall can be attributed to output growth vs a
plan defect).

Usage:
  python scripts/make_sf1.py /tmp/iht_sf1 /tmp/iht_sf10 10   # once
  python scripts/probe_sf10.py [sf1_dir] [sf10_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iht_sf1"
SF10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/iht_sf10"

#: the 5 most expensive bench queries of the round-9 driver run plus
#: semdedup (the verdict's named hot family).  embedding_neardup_auto
#: replaces the registered embedding_neardup_lsh row here: the row pins
#: the UNCAPPED banded contract for its oracle (quadratic in bucket
#: size by design — it found exactly this at sf10), while the
#: operator's DEFAULTS carry the round-10 auto_planes/max_bucket scale
#: guards — the path a 100 TB deployment actually runs.
DEFAULT_QUERIES = [
    "bpe_strict_batch",
    "neardup_clusters",
    "embedding_neardup_auto",
    "lm_buckets",
    "simhash_pairs",
    "semdedup",
]


#: round-11 extension (VERDICT r10 #2): the iterative/pair family not
#: yet probed one decade past sf1 — the superstep joins (pagerank), the
#: wedge join (triangles, which already needed TRI_MAX_DAY_POP at sf1),
#: the minhash band self-join, the ANN probe join, and the jaccard
#: inverted-index join with the round-11 default max_df bound engaged.
ROUND11_QUERIES = [
    "pagerank",
    "triangles",
    "minhash_pairs",
    "ann_lsh",
    "jaccard_capped",
]


def _q_jaccard_capped(spark, sf_dir):
    # the registered jaccard_pairs row pins max_df=None for its
    # exhaustive oracle; this probes the BOUNDED corpus-scale
    # configuration.  max_df=500, NOT the 5000 default: the first
    # round-11 run of this probe showed the per-key cap alone cannot
    # bound the join (sf10: max df 2,500 — the default cap never
    # engages — yet sum(df^2) = 2.8e10 candidate rows filled the disk),
    # which is why the operator now carries the max_candidates volume
    # guard; at max_df=500 the sf10 volume is 5.8e8 — inside the
    # default budget, so this leg also proves the guard passes quietly
    # when the volume is sane.
    from ia_hadoop_tools_spark.driver_queries import (
        JACCARD_THRESHOLD,
        SHINGLE_WORDS,
    )
    from ia_hadoop_tools_spark.operators.textops import ngram_jaccard_pairs
    from ia_hadoop_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return ngram_jaccard_pairs(
        d, shingle_words=SHINGLE_WORDS, threshold=JACCARD_THRESHOLD,
        max_df=500,
    )


def _q_embedding_neardup_auto(spark, sf_dir):
    from ia_hadoop_tools_spark.driver_queries import NEARDUP_COS_THRESHOLD
    from ia_hadoop_tools_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from ia_hadoop_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return embedding_neardup_pairs(e, threshold=NEARDUP_COS_THRESHOLD)


def main() -> None:
    from ia_hadoop_tools_spark.driver_queries import QUERIES as _REG
    from ia_hadoop_tools_spark.pending_queries import PENDING_QUERIES
    from ia_hadoop_tools_spark.session import get_spark

    QUERIES = {
        **_REG,
        **PENDING_QUERIES,
        "embedding_neardup_auto": _q_embedding_neardup_auto,
        "jaccard_capped": _q_jaccard_capped,
    }
    names = sys.argv[3:] or DEFAULT_QUERIES
    if names == ["round11"]:
        names = ROUND11_QUERIES
    spark = get_spark("probe-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = QUERIES[name]
        # warmup at sf1 (codegen/classloading), then timed sf1, timed sf10
        spark.catalog.clearCache()
        fn(spark, SF1).count()
        rec = {}
        for label, d in (("sf1", SF1), ("sf10", SF10)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n = fn(spark, d).count()
            rec[label] = {"wall": round(time.monotonic() - t0, 2), "rows": n}
        ratio = rec["sf10"]["wall"] / max(rec["sf1"]["wall"], 1e-9)
        rec["ratio"] = round(ratio, 2)
        out[name] = rec
        print(
            f"{name}: sf1 {rec['sf1']['wall']}s/{rec['sf1']['rows']:,} rows"
            f" -> sf10 {rec['sf10']['wall']}s/{rec['sf10']['rows']:,} rows"
            f"  (x{rec['ratio']})",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
