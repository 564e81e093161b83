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

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.spans import _tokens

#: Most distinct short-benchmark-doc lengths to window the corpus for
#: (bounded plan width; see _overlap_counts).
_MAX_SHORT_LENGTHS = 64


def _window_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int,
    lengths: tuple[int, ...] = (),
    exact_lengths: bool = False,
):
    """(id, __h) distinct per doc: xxhash64 of each n-token window, PLUS
    windows of each extra length in ``lengths`` (the short-benchmark
    matching path — see _overlap_counts).

    ``exact_lengths=True`` (the BENCHMARK side) emits an extra-length
    window only for docs whose token count EQUALS that length — i.e. the
    short doc's single whole-doc window. Without it a long benchmark doc
    would emit every ``ln``-gram it contains, silently dropping the
    effective matching n to the shortest benchmark item for the entire
    benchmark (a 2-token item would flag any corpus doc sharing any
    2-gram with any benchmark doc). The CORPUS side keeps ``>=`` so a
    long corpus doc quoting a short benchmark item verbatim still emits
    the matching window."""
    base = df.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).withColumn("__nt", F.size("__toks"))
    all_lengths = (n,) + tuple(lengths)

    def _win(ln: int):
        # a closure FACTORY, not a default-arg lambda: F.transform treats
        # a two-parameter lambda as (element, index) and would silently
        # bind the window length to the array position
        def at(i):
            # lower() at window-KEY time: contamination matching is
            # case-insensitive (spans._tokens keeps original case)
            return F.xxhash64(
                F.lower(F.concat_ws(" ", F.slice("__toks", i + 1, ln)))
            )

        return at

    def _cond(ln: int):
        # extra lengths are whole-doc-only on the benchmark side; the
        # primary length n always uses >= (both sides window normally)
        if exact_lengths and ln != n:
            return F.col("__nt") == ln
        return F.col("__nt") >= ln

    window_arrays = [
        F.when(
            _cond(ln),
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.col("__nt") - ln, F.lit(0))),
                _win(ln),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        for ln in all_lengths
    ]
    return base.filter(F.col("__nt") >= min(all_lengths)).select(
        id_col,
        F.explode(
            F.array_distinct(F.flatten(F.array(*window_arrays)))
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
    # SHORT benchmark docs (< n tokens) contribute their WHOLE-DOC window,
    # and the corpus generates windows of exactly those lengths too —
    # otherwise a doc quoting a short benchmark answer verbatim passes as
    # clean. The distinct short lengths are driver-collected (bounded by
    # n-1 values); each adds one more corpus window length, so a very
    # short benchmark item makes the corpus explode proportionally more —
    # the honest cost of catching it.
    bench_base = benchmark.select(
        F.lit(0).alias("__bid"), F.col(bcol)
    ).select("__bid", _tokens(bcol).alias("__toks"))
    short_lengths = tuple(
        sorted(
            r["__nt"]
            for r in bench_base.select(F.size("__toks").alias("__nt"))
            .filter((F.col("__nt") >= 1) & (F.col("__nt") < n))
            .distinct()
            .collect()
        )
    )
    # The collect is bounded by n-1 distinct values, but each length adds
    # one more corpus window array to the plan — with a huge n a
    # pathological benchmark could carry thousands of distinct short
    # lengths and blow up the projection. Cap at the LARGEST lengths
    # (closest to n = most specific windows, least false-positive-prone)
    # and log what was dropped: benchmark items of a dropped length are
    # NOT matched against the corpus.
    if len(short_lengths) > _MAX_SHORT_LENGTHS:
        dropped = short_lengths[: -_MAX_SHORT_LENGTHS]
        short_lengths = short_lengths[-_MAX_SHORT_LENGTHS:]
        warnings.warn(
            f"decontam: benchmark has {len(dropped) + len(short_lengths)} "
            f"distinct short doc lengths; keeping the largest "
            f"{_MAX_SHORT_LENGTHS}, dropping lengths "
            f"{dropped[0]}..{dropped[-1]} — benchmark items of those "
            f"lengths are not checked for contamination",
            stacklevel=3,
        )
    bench_w = (
        _window_hashes(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bcol)),
            "__bid", bcol, n, lengths=short_lengths,
            exact_lengths=True,
        )
        .select("__h")
        .distinct()
    )
    corpus_w = _window_hashes(
        corpus, id_col, text_col, n, lengths=short_lengths
    )
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
    The contaminated-id set is USUALLY small, but it is corpus-bounded
    (boilerplate benchmark n-grams can match huge swaths), so the join is
    left to AQE: broadcast when small, shuffle when not.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    dirty = (
        _overlap_counts(corpus, benchmark, n, id_col, text_col, bench_text_col)
        .filter(F.col("overlap_ngrams") >= min_overlap)
        .select(id_col)
    )
    # NO broadcast hint: the dirty set is corpus-bounded (a benchmark
    # n-gram appearing in boilerplate can match tens of millions of corpus
    # docs); the hint would override autoBroadcastJoinThreshold and OOM
    # the driver instead of degrading to a shuffle anti-join — AQE picks
    # the broadcast automatically whenever dirty is actually small
    return corpus.join(dirty, id_col, "left_anti")


def fuzzy_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str | None = None,
    num_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate (paraphrase-level) contamination pairs:
    ``(id_col, bench_id_col, jaccard)`` for every corpus doc whose word-
    shingle Jaccard with a benchmark doc reaches ``threshold``.  When
    the benchmark reuses the corpus id name (``bench_id_col ==
    id_col``, the common doc_id/doc_id case) the bench column comes
    back as ``bench_{id_col}``.

    The exact n-gram path (:func:`contamination_stats`) misses lightly
    edited benchmark leakage — a dropped sentence or re-tokenized quote
    shares near-all shingles but few exact n-token windows at large
    ``n``.  This is the MinHash-LSH formulation of the same hygiene step
    (Gopher App. A1.3 uses 13-gram overlap; near-dup decontamination is
    the Dolma/RedPajama practice): candidates where corpus and benchmark
    signatures collide in at least one LSH band, verified with the TRUE
    Jaccard over the shingle sets.

    Scale shape (100 TB corpus, MB-scale benchmark): the benchmark's
    band table and shingle sets are benchmark-sized — BROADCAST; the
    corpus side computes signatures in one pass (its only exchange is
    the signature hash-aggregate) and the band probe is a broadcast
    join, so the corpus never shuffles on candidates.  Verification
    joins the candidate ids back to the corpus shingle sets — bounded by
    the candidate count, with the benchmark side broadcast again.
    Band geometry (``num_perm``/``bands``) carries the standard LSH
    recall contract: pairs missed by every band are missed here too
    (raise ``bands`` for recall; the oracle row mirrors the banded
    contract exactly, the ``minhash_pairs`` convention).
    """
    from ia_hadoop_tools_spark.operators.textops import (
        band_key_array,
        ensure_min_partitions,
        minhash_signatures,
        shingle_sets,
    )

    btext = bench_text_col or text_col
    # a benchmark parquet often reuses the corpus id name (doc_id):
    # rename internally so the candidate join is never ambiguous, and
    # emit the bench column as bench_{id_col} in that case
    out_bid = (
        bench_id_col if bench_id_col != id_col else f"bench_{bench_id_col}"
    )
    benchmark = benchmark.withColumnRenamed(bench_id_col, "__bid")
    bsh = shingle_sets(benchmark, "__bid", btext, shingle_words)
    bsig = minhash_signatures(
        benchmark, "__bid", btext, num_perm, shingle_words, shingles=bsh
    )
    bband = bsig.select(
        F.col("__bid"),
        F.explode(band_key_array(num_perm, bands)).alias("bucket"),
    )
    from pyspark import StorageLevel

    # the corpus shingle sets are read TWICE (signature aggregate +
    # candidate verification) — persist once, hand the cache back via
    # the shingle_cache handle (the minhash_lsh_pairs convention:
    # unpersist it after materializing the result)
    csh = shingle_sets(
        ensure_min_partitions(corpus.select(id_col, text_col)),
        id_col, text_col, shingle_words,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    csig = minhash_signatures(
        corpus, id_col, text_col, num_perm, shingle_words, shingles=csh
    )
    cband = csig.select(
        F.col(id_col),
        F.explode(band_key_array(num_perm, bands)).alias("bucket"),
    )
    cand = (
        cband.join(F.broadcast(bband), "bucket")
        .select(id_col, "__bid")
        .distinct()
    )
    inter = F.size(F.array_intersect("shingles", "__bsh"))
    union = F.size("shingles") + F.size("__bsh") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    out = (
        cand.join(csh, id_col)
        .join(
            F.broadcast(
                bsh.select(F.col("__bid"), F.col("shingles").alias("__bsh"))
            ),
            "__bid",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            id_col, F.col("__bid").alias(out_bid), "jaccard"
        )
    )
    out.shingle_cache = csh
    return out


def decontaminate_fuzzy(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str | None = None,
    num_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Corpus rows with NO near-duplicate benchmark match (the
    :func:`decontaminate` twin over :func:`fuzzy_contamination`).  The
    dirty-id set is corpus-bounded, so the anti-join is left to AQE —
    the same no-hint rationale as :func:`decontaminate`."""
    pairs = fuzzy_contamination(
        corpus,
        benchmark,
        id_col,
        text_col,
        bench_id_col,
        bench_text_col,
        num_perm,
        bands,
        shingle_words,
        threshold,
    )
    dirty = pairs.select(id_col).distinct()
    out = corpus.join(dirty, id_col, "left_anti")
    # pass the corpus-shingle cache handle through (unpersist after the
    # result materializes)
    out.shingle_cache = pairs.shingle_cache
    return out
