#!/usr/bin/env python
"""Scale probe: train_lang_nb over a x10-replicated labeled set.

The round-9 review noted language-ID TRAINING had only fixture-grade
evidence (the lang_nb registry row pins the scorer under a fixed
model; training is pinned by a plain-Python mirror on a fixture).
This probe trains on a realistically shaped labeled corpus and its
x10 replication and records the walls + output cardinality — the
train_unigram_lm probe discipline:

- labeled docs across 8 synthetic "languages" with distinct character
  inventories (so the trigram distributions genuinely differ);
- train at x1 and x10 doc counts with the default 10k vocab cap;
- the model row count must stay EXACTLY vocab_size x n_langs + 2 x
  n_langs (dense rows + __floor__/__prior__) at BOTH scales — the
  trainer's TakeOrdered cap and dense build are corpus-independent;
- wall should grow ~linearly (the only corpus-sized work is one
  explode+count pass and one broadcast-vocab join+count pass).

Usage: python scripts/probe_langid_train.py [docs_per_lang]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_PER_LANG = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
N_LANGS = 8
WORDS_PER_DOC = 60
VOCAB = 10_000

# distinct per-language character inventories -> distinct trigram mass
ALPHABETS = [
    "etaoinshrdlu", "aeioubcdfghj", "xyzwvutsrqpo", "mnbvcxzasdfg",
    "qwertyuiopas", "zxcvbnmlkjhg", "poiuytrewqas", "lkjhgfdsamnb",
]


def make_labeled(spark, docs_per_lang: int):
    from pyspark.sql import functions as F

    frames = []
    for li in range(N_LANGS):
        alpha = ALPHABETS[li]
        # deterministic words: 3-6 chars drawn from the language's
        # alphabet via a mixed hash of (doc, word)
        frames.append(
            spark.range(docs_per_lang).select(
                (F.col("id") + li * 10_000_000).alias("doc_id"),
                F.lit(f"l{li}").alias("lang"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
                        lambda i: F.concat_ws(
                            "",
                            F.transform(
                                F.sequence(
                                    F.lit(1),
                                    F.pmod(
                                        F.hash(F.col("id") * 31 + i), F.lit(4)
                                    ).cast("int")
                                    + 3,
                                ),
                                lambda j: F.substring(
                                    F.lit(alpha),
                                    (
                                        F.pmod(
                                            F.hash(
                                                F.col("id") * 131071
                                                + i * 8191
                                                + j
                                            ),
                                            F.lit(len(alpha)),
                                        )
                                        + 1
                                    ).cast("int"),
                                    1,
                                ),
                            ),
                        ),
                    ),
                ).alias("text"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def main() -> None:
    from ia_hadoop_tools_spark.operators.langid import lang_nb, train_lang_nb
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("probe-langid-train")
    spark.sparkContext.setLogLevel("ERROR")

    walls, model_rows = {}, {}
    for label, scale in (("x1", 1), ("x10", 10)):
        labeled = make_labeled(spark, DOCS_PER_LANG * scale)
        n_docs = labeled.count()  # materialize the input cost separately
        t0 = time.monotonic()
        model = train_lang_nb(labeled, vocab_size=VOCAB).persist()
        n_rows = model.count()
        wall = time.monotonic() - t0
        walls[label], model_rows[label] = wall, n_rows
        # dense contract: rows == retained_vocab x langs + 2 x langs,
        # with retained_vocab <= the cap (the corpus may have fewer
        # distinct n-grams than the cap — then V is the corpus count)
        from ia_hadoop_tools_spark.operators.langid import (
            FLOOR_KEY,
            PRIOR_KEY,
        )
        from pyspark.sql import functions as F

        v = (
            model.filter(~F.col("ngram").isin(FLOOR_KEY, PRIOR_KEY))
            .select("ngram")
            .distinct()
            .count()
        )
        expect = v * N_LANGS + 2 * N_LANGS
        ok = n_rows == expect and v <= VOCAB
        print(
            f"{label}: {n_docs:,} labeled docs -> model rows {n_rows:,} "
            f"(dense contract V={v:,} <= cap {VOCAB:,}: "
            f"{'OK' if ok else 'WRONG'}) train wall {wall:.2f}s"
        )
        # score a held-out slice under the trained model: accuracy must
        # be ~1.0 (the alphabets are nearly disjoint) — proves the
        # trained model is usable, not just well-shaped
        if label == "x1":
            from pyspark.sql import functions as F

            test = make_labeled(spark, 200)
            preds = lang_nb(test, model)
            acc = (
                test.select("doc_id", "lang")
                .join(preds, "doc_id")
                .agg(
                    F.avg(
                        (F.col("lang") == F.col("lang_pred")).cast("double")
                    ).alias("acc")
                )
                .collect()[0]["acc"]
            )
            print(f"    held-out accuracy under trained model: {acc:.4f}")
        model.unpersist()
    same = model_rows["x1"] == model_rows["x10"]
    print(
        f"RATIO: x10 docs -> wall x{walls['x10'] / max(walls['x1'], 1e-9):.1f} "
        f"(healthy: ~linear); model rows identical across scales: {same}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
