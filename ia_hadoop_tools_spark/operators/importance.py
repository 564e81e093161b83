"""DSIR-style importance scoring for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by how target-like its hashed n-gram profile
is, then resamples the corpus by that weight. This module implements the
scoring half with a DETERMINISM twist that makes it oracle-exact: the
per-bucket importance ratio is kept in scaled-integer arithmetic
(``(ct+1) * SCALE div (cr+1)`` instead of ``log((ct+1)/(cr+1))``), so
document scores are bit-stable under any partitioning and reproducible
in plain SQL. Ranking by the linear-domain mean ratio preserves the
spirit (target-heavy n-grams push a doc up) while dodging
platform-dependent ``log`` rounding.

Pipeline (one pass over the corpus + one tiny broadcast):

1. explode each doc into word bigrams, hash each into ``n_buckets``
   (portable ``hash32``) — the hashed n-gram feature space;
2. one groupBy(bucket) computes raw-corpus and target counts together
   (the target is a PREDICATE over the same table, so no second scan);
3. the bucket->score table (``n_buckets`` rows) broadcasts back onto
   the exploded bigrams; summing per doc gives the importance score.

Scale shape: step 1-2 is one shuffle with map-side combine over at most
``n_buckets`` keys; step 3 is a broadcast join (the score table is KB)
plus one groupBy(doc) — linear in corpus tokens, no skew (bucket
hashing spreads hot n-grams by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.hashfns import hash32

#: fixed-point scale for the per-bucket importance ratio
DSIR_SCALE = 1_000_000


def word_bigrams(text: Column | str) -> Column:
    r"""Whitespace-tokenized text -> array of word bigrams ("w1 w2").

    Tokens split on the PORTABLE whitespace class (the bpe.WORD_SPLIT
    rationale: \s differs across engines) with empties removed — a
    single-space split turned 'a  b' into garbage bigrams ('a ', ' b')
    and treated newlines as token characters. Guarded for <2 words:
    Spark's ``sequence(0, -1)`` would count DOWN (yielding [0, -1]), so
    short docs explicitly map to the empty array.
    """
    raw = F.split(
        text if isinstance(text, Column) else F.col(text), "[ \t\n\f\r]+"
    )
    w = F.filter(raw, lambda t: t != "")
    # zip of two slices, NOT transform+element_at: element_at is O(n) per
    # access, making the transform O(n^2) per document (and higher-order
    # functions are interpreted, not codegen'd — fewer of them matters)
    m = F.greatest(F.size(w) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(F.size(w) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance score against a target predicate.

    ``target`` is a boolean column over ``docs`` marking the target
    distribution sample (e.g. ``F.col("lang") == "en"``). Returns
    (``id_col``, ``n_bigrams``, ``dsir_score``) for documents with at
    least one bigram; ``dsir_score`` is the integer mean over the doc's
    bigram occurrences of the scaled target/raw bucket ratio — higher
    means more target-like.
    """
    bg = docs.select(
        F.col(id_col),
        target.alias("__t"),
        F.explode(word_bigrams(text_col)).alias("__bg"),
    ).select(
        id_col, "__t", (hash32("__bg", salt="dsir:") % n_buckets).alias("__b")
    )
    # consumed twice (bucket counts + per-doc sums — the counts side is a
    # broadcast subquery, which Catalyst does NOT exchange-reuse with the
    # main scan): persist the skinny rows so parsing + hashing runs once.
    # Lazy — no job until the caller acts. Measured 3.1 vs 4.9 s at sf0.1.
    # Release handle: out.score_caches (loop callers unpersist when done).
    bg = bg.persist()
    scores = bg.groupBy("__b").agg(
        F.count("*").alias("__cr"),
        F.count_if(F.col("__t")).alias("__ct"),
    )
    scores = scores.select(
        "__b",
        F.expr(f"(({DSIR_SCALE}L * (__ct + 1)) div (__cr + 1))").alias("__s"),
    )
    out = (
        bg.join(F.broadcast(scores), "__b")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("__s").alias("__sum"))
        .select(
            id_col,
            "n_bigrams",
            F.expr("__sum div n_bigrams").alias("dsir_score"),
        )
    )
    out.score_caches = (bg,)
    return out


def dsir_select(
    docs: DataFrame,
    target: Column,
    fraction_num: int,
    fraction_den: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-``fraction`` of the corpus by DSIR score (deterministic ranking).

    The deterministic analogue of DSIR's Gumbel-noise resampling: order
    by (score desc, id asc) and keep the top ``num/den`` of docs
    (integer quota m = n * num div den). Selection is HISTOGRAM-BASED,
    never a global row_number: the per-score histogram (bounded by the
    score DOMAIN, not the corpus) finds the threshold score; docs above
    it pass outright, and only the boundary score's docs — one score
    cell — are ranked by id to fill the remaining quota. No single-task
    global window anywhere, so the plan survives a corpus of any size.
    """
    from pyspark.sql import Window

    if fraction_den < 1 or fraction_num < 0 or fraction_num > fraction_den:
        # >100% or /0 made the bounds filter unsatisfiable: the crossJoin
        # with an EMPTY broadcast silently dropped every row
        raise ValueError(
            f"fraction must satisfy 0 <= num <= den (den >= 1), got "
            f"{fraction_num}/{fraction_den}"
        )
    # scored is consumed three times (histogram, above-threshold branch,
    # boundary branch) and its bounds side is a broadcast subquery, which
    # Catalyst does not exchange-reuse — persist the doc-sized rows (lazy);
    # release via out.score_caches
    scored = dsir_scores(docs, target, id_col, text_col, n_buckets).persist()
    hist = scored.groupBy("dsir_score").agg(F.count("*").alias("__cnt"))
    wcum = Window.orderBy(F.col("dsir_score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # histogram rows = distinct scores (bounded by value domain): tiny
    cum = hist.withColumn("__cum", F.sum("__cnt").over(wcum)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy())
    )
    # quota m = floor(n * num / den); boundary = first score where the
    # running total reaches m; __take = how many boundary-score docs fit
    bounds = (
        cum.filter(F.col("__cum") * fraction_den >= F.col("__n") * fraction_num)
        .orderBy(F.col("dsir_score").desc())
        .limit(1)
        .select(
            F.col("dsir_score").alias("__thr"),
            (
                F.expr(f"__n * {fraction_num} div {fraction_den}")
                - (F.col("__cum") - F.col("__cnt"))
            ).alias("__take"),
        )
    )
    j = scored.crossJoin(F.broadcast(bounds))
    above = j.filter(F.col("dsir_score") > F.col("__thr"))
    wb = Window.partitionBy("dsir_score").orderBy(F.col(id_col).asc())
    boundary = (
        j.filter(F.col("dsir_score") == F.col("__thr"))
        .withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") <= F.col("__take"))
        .drop("__r")
    )
    out = above.unionByName(boundary).drop("__thr", "__take")
    out.score_caches = (scored, *getattr(scored, "score_caches", ()))
    return out
