#!/usr/bin/env python
"""Scale probe: unigram_encode's distinct-chunk join after de-hinting.

The round-9 review flagged unigram_encode's forced ``F.broadcast`` on
the distinct word-chunk piece table: that table grows with the CORPUS
vocabulary (Heap's law), not the model's piece vocabulary, so the hint
would eventually exceed the broadcast/driver limit at 100 TB.  The hint
is now gone (the join is unhinted, like unigram_token_counts); this
probe records the evidence:

1. synthesize corpora whose DISTINCT chunk vocabulary scales x10 while
   doc count scales with it (the adversarial axis for the old hint);
2. run unigram_encode end-to-end (force execution via a token-count
   aggregate over the encoded arrays) and record wall + distinct-chunk
   cardinality at each scale;
3. print which physical join AQE actually chose at each scale.

A healthy de-hinted plan: wall grows ~linearly in the distinct vocab,
and the join strategy is AQE's choice (broadcast while genuinely small,
shuffle join once the piece table is big) rather than a forced
broadcast that grows without bound.

Usage: python scripts/probe_unigram_encode.py [small_vocab] [docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
WORDS_PER_DOC = 120

MODEL = {
    # multi-char pieces hitting the synthetic 'w<digits>' words + the
    # single chars needed for full coverage
    "w1": -1.5, "w2": -1.6, "w3": -1.7, "w0": -1.4, "00": -2.0,
    "11": -2.1, "w": -3.0, "0": -3.1, "1": -3.2, "2": -3.3, "3": -3.4,
    "4": -3.5, "5": -3.6, "6": -3.7, "7": -3.8, "8": -3.9, "9": -4.0,
}


def make_docs(spark, n_docs: int, vocab: int):
    from pyspark.sql import functions as F

    # deterministic content: doc i draws WORDS_PER_DOC words from a
    # vocab-sized id space via a mixed hash — distinct-word count
    # saturates near `vocab`
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.hash(F.col("id") * 7919 + i * 104729), F.lit(vocab)
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.unigram import unigram_encode
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("probe-unigram-encode")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, scale in (("x1", 1), ("x10", 10)):
        docs = make_docs(spark, DOCS * scale, VOCAB * scale)
        distinct_chunks = (
            docs.select(
                F.explode(F.split(F.col("text"), " ")).alias("w")
            )
            .distinct()
            .count()
        )
        enc = unigram_encode(docs, MODEL, max_piece_len=5, max_word_len=16)
        # warmup (codegen/classload), then timed
        enc.select(F.sum(F.size("tokens"))).collect()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        total_tokens = enc.select(
            F.sum(F.size("tokens")).alias("t")
        ).collect()[0]["t"]
        wall = time.monotonic() - t0
        plan = enc._sc._jvm.PythonSQLUtils.explainString(
            enc._jdf.queryExecution(), "formatted"
        ) if hasattr(enc._sc._jvm, "PythonSQLUtils") else ""
        joins = [
            ln.strip()
            for ln in plan.splitlines()
            if "Join" in ln and "(" in ln
        ][:4]
        results[label] = (distinct_chunks, wall, total_tokens)
        print(
            f"{label}: distinct_chunks={distinct_chunks:,} wall={wall:.2f}s "
            f"tokens={total_tokens:,}"
        )
        for j in joins:
            print(f"    {j}")

    d1, w1, _ = results["x1"]
    d10, w10, _ = results["x10"]
    print(
        f"RATIO: vocab x{d10 / max(d1, 1):.1f} -> wall x{w10 / max(w1, 1e-9):.1f} "
        f"(healthy: ~linear in rows; the OLD forced broadcast would ship "
        f"{d10:,} piece arrays to every executor and pin them on the driver)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
