"""Linear text-quality classifier: Multinomial Naive Bayes over tokens.

The quality-filter family every large pretraining corpus ships through —
GPT-3 (Brown et al. 2020, Appendix A) and PaLM filter web documents with
a linear classifier trained on a "good" reference (books/wiki) vs raw
web; CCNet (Wenzek et al. 2020) does the same job with an LM.  A
Multinomial NB over token counts IS a linear classifier whose weight for
token ``w`` is the log-likelihood ratio ``ln P(w|pos) - ln P(w|neg)``,
so training reduces to two token-count aggregations and scoring to one
broadcast join — the Spark-native shape of a fastText-style filter with
zero Python in the hot path.

Not in the reference (its filters are CDX predicates, SURVEY §2.4) —
this is the training-data-pipeline extension, built like the LM scorers
in ``operators/lm_quality.py`` and sharing their conventions:

- **Capped vocabulary** (the 100 TB contract): the model keeps the top
  ``vocab_size`` tokens by pooled count via the one shared cap
  definition (:func:`~ia_hadoop_tools_spark.operators.lm_quality._top_vocab`
  over the union) — TakeOrderedAndProject, bounded memory, no global
  sort over the unbounded typo/URL token tail.  Out-of-vocab tokens
  score 0 (equally unknown to both classes) — no ``<unk>`` rewrite pass
  over the corpus.
- **Integer micro-nat aggregation**: model weights are rounded to 6 dp,
  each token contributes ``round(llr * 1e6)`` as a LONG, and the per-doc
  mean is one fixed-order division of exact integer operands — the
  engine-exact trick that closed the backoff scorer's cross-engine ULP
  drift (``lm_quality.lm_score_backoff``).
- **Broadcast model, text never shuffles**: scoring explodes tokens
  in-place, broadcast-hash-joins the (<= vocab_size)-row model, and the
  only exchange is the skinny ``(id, micro)`` partial-aggregated
  groupBy.  The document text column itself never crosses the wire.

PERSIST CONTRACT: an unpersisted model passed to
:func:`nb_quality_score` is persisted internally; the returned frame
carries the persisted model as ``.model_cache`` (the semdedup
``assign_cache`` convention) so loop callers passing fresh
(plan-distinct) model frames can unpersist each one — or persist the
model ONCE themselves.  The handle is a plain Python attribute on the
RETURNED OBJECT only: every DataFrame transformation
(select/filter/join/...) returns a NEW object without it, so capture
it immediately (``m = out.model_cache``) before chaining — or, in
loops that wrap the result, persist the model yourself (an
already-persisted model is never re-persisted, so no handle is
needed).  Same lifetime rule at every ``model_cache`` site:
``langid.lang_nb``, ``textops.lang_id_corpus``, and this module.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT

DEFAULT_SMOOTH_K = 0.5


def _tokens(df: DataFrame, keep_cols, text_col: str):
    """One tokenization rule for train and score: lowercase, split on
    WORD_SPLIT, drop empties (mirrors ``lm_quality``'s word unit so the
    DuckDB oracle reproduces tokens exactly)."""
    raw = F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    return df.select(
        *keep_cols,
        F.explode(F.filter(raw, lambda t: t != "")).alias("__w"),
    )


def _class_counts(ref: DataFrame, vocab: DataFrame, text_col: str):
    """In-vocab token counts for one class: (__w, __c) plus the class
    total as a lazy 1-row frame (no job at construction)."""
    toks = _tokens(ref, [], text_col).join(F.broadcast(vocab), "__w")
    counts = toks.groupBy("__w").agg(F.count("*").alias("__c"))
    total = counts.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__t"))
    return counts, total


def train_nb_quality(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    smooth_k: float = DEFAULT_SMOOTH_K,
) -> DataFrame:
    """Train the NB quality model: (``token``, ``llr``) — one row per
    vocabulary token, ``llr = ln P(token|pos) - ln P(token|neg)`` with
    add-k smoothing, rounded to 6 dp (the micro-nat contract).

    ``pos`` is the high-quality reference (the books/wiki side of the
    GPT-3 filter), ``neg`` the raw-web side.  The vocabulary is the top
    ``vocab_size`` tokens of the POOLED corpus (union), so a token
    frequent in either class is retained and class counts are taken over
    the same support; V in the smoothing denominator is the retained
    vocabulary size.

    LAZY: constructing the model launches no Spark job — class totals
    and V ride along as 1-row broadcast aggregates folded into the plan.
    Empty references are valid (all mass from smoothing).  Scale shape:
    two explode+groupBy count aggregations (map-side combinable, skinny
    ``(token, count)`` rows after the broadcast vocab semi-join) and one
    vocab-bounded full-outer join — nothing proportional to corpus size
    survives past the first aggregation.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if smooth_k <= 0:
        raise ValueError(f"smooth_k must be > 0, got {smooth_k}")
    from ia_hadoop_tools_spark.operators.lm_quality import _top_vocab

    pooled = pos.select(F.col(text_col).alias("text")).unionByName(
        neg.select(F.col(text_col).alias("text"))
    )
    vocab = _top_vocab(pooled, "text", vocab_size).select("__w")
    vdf = vocab.agg(F.count("*").alias("__v"))
    pc, pt = _class_counts(pos, vocab, text_col)
    nc, nt = _class_counts(neg, vocab, text_col)
    joined = (
        vocab.join(pc, "__w", "left")
        .withColumnRenamed("__c", "__cp")
        .join(nc, "__w", "left")
        .withColumnRenamed("__c", "__cn")
        .crossJoin(F.broadcast(pt.withColumnRenamed("__t", "__tp")))
        .crossJoin(F.broadcast(nt.withColumnRenamed("__t", "__tn")))
        .crossJoin(F.broadcast(vdf))
    )
    k = F.lit(smooth_k)
    logp = F.log(
        (F.coalesce(F.col("__cp"), F.lit(0)) + k)
        / (F.col("__tp") + k * F.col("__v"))
    )
    logn = F.log(
        (F.coalesce(F.col("__cn"), F.lit(0)) + k)
        / (F.col("__tn") + k * F.col("__v"))
    )
    return joined.select(
        F.col("__w").alias("token"),
        F.round(logp - logn, 6).alias("llr"),
    )


def nb_quality_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a trained NB model: (``id_col``,
    ``nb_llr``, ``n_tokens``).

    ``nb_llr`` is the MEAN per-token log-likelihood ratio (mean, not
    sum, so the score is length-invariant and one threshold works across
    document sizes — the same normalization as ``lm_score``); > 0 reads
    "more like the positive reference".  Out-of-vocab tokens contribute
    exactly 0.  Documents with no tokens get a NULL score and
    ``n_tokens = 0`` (kept; the caller decides, the ``lm_score`` NULL
    convention).

    Engine-exact: each token's contribution is ``round(llr * 1e6)`` as
    a LONG (the model's 6-dp weights make this within 1 ULP of an
    integer, so the rounding is tie-free), the sum is associative, and
    the mean is one fixed-order division — bit-identical across engines
    and partitionings.  Plan: one broadcast hash join (model <=
    vocab_size rows) + one partial-aggregated groupBy of skinny
    ``(id, micro)`` rows; the text column never shuffles.
    """
    # CacheManager dedups identical plans, so repeated calls on the SAME
    # model frame don't stack entries (the lm_score persist convention)
    if not model.is_cached:
        model = model.persist()
    # LAZY empty-model guard (ADVICE r8: the old first() probe launched
    # a Spark job at plan-BUILD time, breaking the lazy-construction
    # convention train_nb_quality advertises): an empty model scores
    # every doc exactly 0.0 — NEUTRAL — which silently turns the filter
    # into keep-all or drop-all depending on the threshold's sign, so a
    # broadcast 1-row token count rides the plan and raise_error fires
    # at first execution instead.
    guard = model.agg(F.count("*").alias("__mc"))
    m = model.select(
        F.col("token").alias("__w"),
        F.round(F.col("llr") * F.lit(1e6), 0).cast("long").alias("__mi"),
    )
    scored = (
        _tokens(docs, [F.col(id_col)], text_col)
        .join(F.broadcast(m), "__w", "left")
        .select(
            id_col,
            F.coalesce(F.col("__mi"), F.lit(0)).alias("__micro"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__micro").alias("__sm"),
            F.count("*").alias("n_tokens"),
        )
        .select(
            id_col,
            (
                F.col("__sm").cast("double")
                / F.col("n_tokens")
                / F.lit(1e6)
            ).alias("nb_llr"),
            "n_tokens",
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .crossJoin(F.broadcast(guard))
        .select(
            id_col,
            F.when(
                F.col("__mc") < 1,
                F.raise_error(
                    F.lit("nb_quality_score: model is empty (no token rows)")
                ).cast("double"),
            )
            .otherwise(F.col("nb_llr"))
            .alias("nb_llr"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
    # release handle (the semdedup assign_cache convention): loop callers
    # passing plan-distinct model frames unpersist via out.model_cache
    out.model_cache = model
    return out


def expected_llr(
    cp: int, cn: int, tp: int, tn: int, v: int, k: float = DEFAULT_SMOOTH_K
) -> float:
    """The trainer's weight formula as plain Python — the test/oracle
    mirror (one definition, computed two ways)."""
    return round(
        math.log((cp + k) / (tp + k * v)) - math.log((cn + k) / (tn + k * v)),
        6,
    )
