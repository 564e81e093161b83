#!/usr/bin/env python
"""Driver-round probe for bpe_train_batched vs the sequential trainer.

The sequential trainer is one driver round-trip per merge by
construction (a 32k vocab = 32k sequential Spark jobs); the batched
trainer applies a compatible set per round. The probe trains 500+
merges on the sf0.1 documents fixture and reports achieved rounds +
mean batch for strict (provably sequential-equivalent) and loose
(skip-conflicts) modes, plus a wall comparison against the sequential
trainer at a smaller merge count where running it is tolerable.

Usage: python scripts/probe_bpe_batched.py [sf_dir] [num_merges]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ia_hadoop_tools_spark.operators.bpe import (  # noqa: E402
    bpe_train,
    bpe_train_batched,
)
from ia_hadoop_tools_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 500
SEQ_MERGES = 60


def main():
    spark = get_spark("probe-bpe-batched")
    t = load_tables(
        spark, SF_DIR, ("documents", "events", "lineitem", "orders")
    )
    from pyspark.sql import functions as F

    # the documents fixture is ~30-word soup (exhausts below 100 merges);
    # widen the symbol space with JSON props, dates and prices so the
    # trainer can sustain 500+ merges like natural text would
    docs = (
        t["documents"].select("text")
        .unionByName(t["events"].select(F.col("props").alias("text")))
        .unionByName(
            t["lineitem"].select(F.col("l_shipdate").cast("string").alias("text"))
        )
        .unionByName(
            t["orders"].select(F.col("o_totalprice").cast("string").alias("text"))
        )
    )

    for strict in (True, False):
        rounds: list[int] = []
        t0 = time.monotonic()
        merges = bpe_train_batched(
            docs,
            "text",
            num_merges=N_MERGES,
            batch_size=16,
            materialize_every=16,
            strict=strict,
            rounds_out=rounds,
        )
        wall = time.monotonic() - t0
        mode = "strict" if strict else "loose "
        print(
            f"batched {mode}: {len(merges)} merges in {len(rounds)} rounds "
            f"(mean batch {len(merges)/max(1,len(rounds)):.1f} = that many "
            f"x fewer driver rounds than sequential) wall {wall:.1f}s"
        )

    t0 = time.monotonic()
    seq = bpe_train(docs, "text", num_merges=SEQ_MERGES, materialize_every=16)
    w_seq = time.monotonic() - t0
    rounds2: list[int] = []
    t0 = time.monotonic()
    bat = bpe_train_batched(
        docs, "text", num_merges=SEQ_MERGES, batch_size=16,
        materialize_every=16, rounds_out=rounds2,
    )
    w_bat = time.monotonic() - t0
    print(
        f"wall at {SEQ_MERGES} merges: sequential {w_seq:.1f}s vs batched "
        f"strict {w_bat:.1f}s ({len(rounds2)} rounds) = {w_seq/w_bat:.1f}x; "
        f"identical merge lists: {seq == bat}"
    )


if __name__ == "__main__":
    main()
