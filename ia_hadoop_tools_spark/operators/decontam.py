"""Benchmark decontamination: flag corpus docs overlapping an eval set.

The standard pre-training hygiene step (GPT-3, Brown et al. 2020 App. C;
Gopher, Rae et al. 2021 App. A1.3): a training document is CONTAMINATED if
it shares at least ``min_overlap`` distinct token n-grams with any benchmark
document. Not in the reference (its dedup is CDX-key-level, SURVEY §2.6) —
this is the training-data-pipeline extension, built like the span-dedup
family (operators/spans.py).

Scale shape (100 TB corpus, MB-scale benchmark):
- Both sides hash their token windows with ``xxhash64`` (narrow codegen
  projection — no Python, no window text past the hash input).
- The benchmark window table is TINY (benchmarks are thousands of docs) —
  deduplicated and BROADCAST into the join, so the corpus never shuffles:
  the only wide operation is the per-doc overlap count aggregation, whose
  input is just the matching (doc, window) rows.
- ``decontaminate`` keeps clean docs with a broadcast left-anti join —
  corpus rows stream through one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.spans import _tokens


def _window_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    """(id, __h) distinct per doc: xxhash64 of each n-token window."""
    base = (
        df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
        .withColumn("__nt", F.size("__toks"))
        .filter(F.col("__nt") >= n)
    )
    return base.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nt") - n),
                    # lower() at window-KEY time: contamination matching is
                    # case-insensitive (spans._tokens keeps original case)
                    lambda i: F.xxhash64(
                        F.lower(F.concat_ws(" ", F.slice("__toks", i + 1, n)))
                    ),
                )
            )
        ).alias("__h"),
    )


def _overlap_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    bench_text_col: str | None,
) -> DataFrame:
    """(id, overlap_ngrams >= 1) for corpus docs sharing any window with
    the benchmark — the small table both public entry points derive from."""
    bcol = bench_text_col or text_col
    bench_w = (
        _window_hashes(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bcol)),
            "__bid", bcol, n,
        )
        .select("__h")
        .distinct()
    )
    corpus_w = _window_hashes(corpus, id_col, text_col, n)
    return (
        corpus_w.join(F.broadcast(bench_w), "__h")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))
    )


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-corpus-doc overlap with the benchmark: ``(id_col,
    overlap_ngrams, contaminated)`` — every corpus doc gets a row.

    ``overlap_ngrams`` counts DISTINCT n-gram windows the doc shares with
    the benchmark as a whole (union over benchmark docs, the GPT-3
    formulation); ``contaminated`` is ``overlap_ngrams >= 1`` — callers
    with a laxer policy threshold on ``overlap_ngrams`` themselves.
    """
    hits = _overlap_counts(
        corpus, benchmark, n, id_col, text_col, bench_text_col
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0)) >= 1).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Corpus rows whose benchmark overlap is under ``min_overlap``.

    ``min_overlap=1`` drops any doc sharing a single n-gram window (the
    strict GPT-3 policy); 0 is rejected (it would broadcast EVERY corpus
    id and anti-join the whole corpus away). The dirty set comes straight
    from the hits aggregate — not from ``contamination_stats``, whose
    every-doc-gets-a-row left join would drag a full corpus id scan into
    the broadcast subtree just to re-filter the zero rows back out.
    The contaminated-id set is small (benchmark-bounded), so the removal
    is a broadcast left-anti join — the corpus streams through one stage.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    dirty = (
        _overlap_counts(corpus, benchmark, n, id_col, text_col, bench_text_col)
        .filter(F.col("overlap_ngrams") >= min_overlap)
        .select(id_col)
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")
