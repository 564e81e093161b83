"""Corpus keyword search: postings + BM25 ranking over a text column.

The retrieval counterpart of the dedup/quality layer: a training-data
pipeline needs "find the documents matching these terms" at corpus scale
(inspection, targeted filtering, contamination forensics) just as much as
dedup. Spark-first shape:

- one token-explode pass over the corpus builds (doc, term, tf) postings
  and doc lengths — map-side combinable aggregations, no Python;
- the query side collapses to a TINY per-term document-frequency table
  that broadcasts back into the postings;
- ranking is a single TakeOrderedAndProject (bounded top-k heap per
  partition, no global sort).

At 100 TB the posting build is the only corpus-sized stage (one shuffle
keyed on doc_id); per-query work touches only the rows containing query
terms (filter pushed below the explode's projection). For a standing
index, persist ``build_postings``'s output as a parquet table bucketed by
term and skip the build per query.

Float discipline: tf/df/doclen are exact integers; idf/score math runs in
IEEE doubles from identical inputs and the final score is rounded to 6
decimals BEFORE ranking, so cross-engine ulp drift in ln() cannot reorder
the top-k (ties break on doc_id).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) rows: lowercase, split on non-alphanumeric runs."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): (token, id, tf) and (id, doclen).

    Both are one map-side-combinable aggregation off the same token
    explode; write them out bucketed by token/id respectively to serve
    standing queries without re-tokenizing."""
    toks = tokenize(df, id_col, text_col)
    postings = toks.groupBy("token", id_col).agg(F.count("*").alias("tf"))
    doclens = toks.groupBy(id_col).agg(F.count("*").alias("doclen"))
    return postings, doclens


def bm25_topk(
    df: DataFrame | None,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
    doclens: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson-Sparck Jones idf, the standard
    `ln(1 + (N-df+0.5)/(df+0.5))` form) for a bag of query terms.

    Query terms pass through the SAME tokenizer as the corpus (lowercase
    + TOKEN_SPLIT), so ``"New York"`` or ``"e-mail"`` match the tokens
    the postings actually hold; a term repeated in the bag weights its
    per-term summand by its multiplicity (bag-of-words BM25).

    STANDING-INDEX PATH: pass ``postings``/``doclens`` (the two frames
    :func:`build_postings` returns, typically read back from parquet
    bucketed by token/id) and ``df`` as None — the query then touches
    only the skinny tables instead of re-tokenizing the corpus twice per
    query (the inline path's doclens and tf aggregations cannot share
    one exchange). Scores are identical either way: both paths feed the
    same exact-integer (tf, df, doclen) inputs into the ranking math.

    Returns (id_col, bm25) with bm25 rounded to 6 decimals, ordered
    score-desc then id-asc (deterministic k boundary)."""
    import re

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if (postings is None) != (doclens is None):
        raise ValueError("pass BOTH postings and doclens, or neither")
    if postings is None and df is None:
        raise ValueError("pass a corpus df, or postings+doclens")
    weights: dict[str, int] = {}
    for q in query_terms:
        for t in re.split(TOKEN_SPLIT, str(q).lower()):
            if t:
                weights[t] = weights.get(t, 0) + 1
    if not weights:
        raise ValueError(
            f"query_terms {list(query_terms)!r} contain no tokens after "
            "tokenizer normalization"
        )
    session = (df if df is not None else postings).sparkSession
    qterms = F.broadcast(
        session.createDataFrame(
            sorted(weights.items()), "token string, __qw long"
        )
    )
    if postings is None:
        toks = tokenize(df, id_col, text_col)
        doclens = toks.groupBy(id_col).agg(F.count("*").alias("__dl"))
        tf = (
            toks.join(qterms, "token")
            .groupBy(id_col, "token")
            .agg(F.count("*").alias("__tf"), F.first("__qw").alias("__qw"))
        )
    else:
        doclens = doclens.select(
            F.col(id_col), F.col("doclen").alias("__dl")
        )
        tf = postings.join(qterms, "token").select(
            F.col(id_col), "token", F.col("tf").alias("__tf"), "__qw"
        )
    stats = doclens.agg(
        F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("__df"))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (
        F.col("__tf") * (k1 + 1)
        / (F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("__qw") * idf * tf_part), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: fixed-point scale for tfidf_topk's integer score (6 implied decimals)
TFIDF_SCALE = 1_000_000


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_ratio: float = 0.5,
) -> DataFrame:
    """Per-document top-k characteristic terms by a deterministic
    TF-IDF surrogate: ``score = tf * TFIDF_SCALE // (df + 1)`` (integer
    division — no transcendental idf, so the ranking is bit-identical
    on any engine; df is monotone in true idf, so the ORDER per doc
    matches ln-idf whenever tf ties don't mask it).

    The keyword-extraction dual of :func:`bm25_topk`: instead of "which
    docs match these terms", "which terms characterize each doc" —
    labels for corpus exploration / cluster naming / quality triage.

    Terms in more than ``max_doc_ratio`` of documents are dropped
    (stopword suppression the tokenizer can't provide).  Returns
    (id_col, token, tf, df, score, rank), rank 1..k per doc, ties
    broken token-ascending.

    Scale: one tokenize pass -> (doc, token, tf) groupBy, a token-keyed
    df aggregation joined back (both partial-aggregated), and a per-doc
    top-k window bounded by each doc's distinct-term count — no global
    sort, no corpus-sized window.
    """
    from pyspark.sql import Window

    toks = tokenize(df, id_col, text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").alias("__n"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("df").cast("double")
            <= F.lit(max_doc_ratio) * F.col("__n").cast("double")
        )
        .withColumn(
            "score",
            F.expr(f"(tf * {TFIDF_SCALE}L) div (df + 1)"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )
