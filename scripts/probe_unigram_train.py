#!/usr/bin/env python
"""Scale probe: train_unigram_lm over a x10-distinct-chunk corpus.

Round-10 gave the unigram ENCODE path its x10-distinct-vocab probe; the
EM TRAINER (operators/unigram.train_unigram_lm — per-word lattice x
em_iters) had only driver-SF evidence.  This is the
probe_langid_train.py discipline applied to the trainer:

- synthetic corpora whose DISTINCT word-chunk count scales x1 -> x10
  (the trainer's cost driver: the substring harvest and every EM
  E-step run over the distinct-chunk frame, not raw tokens);
- x10 stays UNDER the max_words=200k cap so the probe measures the
  uncapped growth shape (the cap is the documented bound past it);
- the model row count must stay EXACTLY vocab_size at both scales
  (TakeOrdered prune + unconditional singles are corpus-independent);
- determinism: re-training the x1 corpus repartitioned to 7 partitions
  must give a byte-identical model (the micro-LONG rounding before the
  aggregate is the order-free-exactness claim — this checks it at a
  partitioning the fixture tests never use);
- wall should grow ~linearly in distinct chunks; no exponent.

Usage: python scripts/probe_unigram_train.py [n_distinct_x1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DISTINCT_X1 = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
WORDS_PER_DOC = 40
VOCAB_SIZE = 512


def make_corpus(spark, n_distinct: int):
    """Docs of deterministic words drawn from an n_distinct vocabulary.

    Word w_k = base36-ish letters of xxhash(k): 4-8 chars, stable across
    runs; doc i holds words k = i*WORDS_PER_DOC..+WORDS_PER_DOC mod
    n_distinct, so every vocabulary word occurs and the distinct-chunk
    frame is exactly the vocabulary (all words < max_word_len).
    """
    from pyspark.sql import functions as F

    n_docs = max(1, n_distinct // WORDS_PER_DOC * 2)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.lower(
                        F.conv(
                            F.substring(
                                F.md5(
                                    (
                                        (F.col("id") * WORDS_PER_DOC + j)
                                        % n_distinct
                                    ).cast("string")
                                ),
                                1,
                                8,
                            ),
                            16,
                            36,
                        )
                    ),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    from ia_hadoop_tools_spark.operators.unigram import train_unigram_lm
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("probe-unigram-train")
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    model_x1 = None
    for label, nd in (("x1", N_DISTINCT_X1), ("x10", N_DISTINCT_X1 * 10)):
        corpus = make_corpus(spark, nd)
        # warm the corpus generator path so the timed leg measures the
        # trainer, not codegen/classloading
        corpus.count()
        t0 = time.monotonic()
        model = train_unigram_lm(corpus, vocab_size=VOCAB_SIZE)
        rows = sorted(
            (r["piece"], r["logp"]) for r in model.collect()
        )
        wall = round(time.monotonic() - t0, 2)
        out[label] = {"wall": wall, "model_rows": len(rows), "nd": nd}
        print(f"{label}: nd={nd:,} wall={wall}s model_rows={len(rows)}",
              flush=True)
        assert len(rows) == VOCAB_SIZE, (label, len(rows))
        if label == "x1":
            model_x1 = rows

    # determinism leg: same x1 corpus, adversarial partitioning
    corpus = make_corpus(spark, N_DISTINCT_X1).repartition(7)
    corpus.count()
    t0 = time.monotonic()
    model = train_unigram_lm(corpus, vocab_size=VOCAB_SIZE)
    rows = sorted((r["piece"], r["logp"]) for r in model.collect())
    out["x1_repart7"] = {
        "wall": round(time.monotonic() - t0, 2),
        "identical_to_x1": rows == model_x1,
    }
    print(f"x1 repartition(7): identical model = {rows == model_x1}",
          flush=True)
    assert rows == model_x1, "trainer model depends on partitioning!"

    ratio = out["x10"]["wall"] / max(out["x1"]["wall"], 1e-9)
    out["ratio_x10"] = round(ratio, 2)
    import json

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
