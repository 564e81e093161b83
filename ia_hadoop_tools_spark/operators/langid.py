"""Trained language identification: multi-class char n-gram Naive Bayes.

The CCNet/fastText-style approach (Wenzek et al. 2020 use a fastText
langid model over char n-grams; Joulin et al. 2016 describe the linear
classifier itself): P(lang | doc) ∝ P(lang) · Π P(ngram | lang), which
is a linear score over char-n-gram counts — exactly the broadcast-join
shape of the round-8 quality classifier (``operators/classifier.py``),
generalized from binary LLR to multi-class argmax.  This replaces the
stopword-vote heuristic (``functions/textfns.lang_id``) as the
state-of-practice path; the heuristic stays as the zero-model default
of ``textops.language_id``.

Not in the reference (its text analysis is CDX-field parsing, SURVEY
§2.4/§2.10) — training-data-pipeline extension.  Conventions shared
with ``classifier.py``/``lm_quality.py``:

- **Capped n-gram vocabulary**: top ``vocab_size`` n-grams by pooled
  count via ``orderBy().limit()`` (TakeOrderedAndProject — bounded
  memory, no global sort over the distinct-n-gram tail).
- **Dense model**: one row per (retained n-gram × language), plus one
  reserved ``__floor__`` row per language (the smoothed
  unseen-in-vocab... er, out-of-vocab n-gram cost) and one reserved
  ``__prior__`` row per language (ln class prior).  Density makes the
  in-vocab token count identical across languages after the broadcast
  join, so the out-of-vocab correction is a single integer multiply —
  no per-language match bookkeeping.  Reserved keys are longer than
  any real n-gram (n <= 8 enforced), so they cannot collide.
- **Integer micro-nat scoring**: weights rounded to 6 dp, each n-gram
  contributes ``round(logp * 1e6)`` as a LONG, per-(doc, lang) sums are
  exact, and the argmax compares integers with a deterministic
  ``lang`` tie-break — bit-identical across engines and partitionings
  (the lesson of the round-8 ``lm_score`` ULP drift).
- **Bounded text slice**: scoring reads the first ``max_chars``
  characters (langid saturates within a few hundred chars; the slice
  bounds the explode fan-out per document at 100 TB).

Scale shape of :func:`lang_nb`: two narrow scans of (id, text) — one
for the per-doc n-gram total, one exploded through a broadcast-hash
join against the (vocab × langs)-bounded model.  Every exchange after
that carries skinny rows bounded by docs × n_langs: the per-(doc,
lang) partial-aggregated score sum, the (id, n_total) × langs join
side, and the argmax window — which plans as WindowGroupLimit, so the
top-1 prune happens map-side before its exchange.  The text column
never shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SMOOTH_K = 0.5
DEFAULT_N = 3
DEFAULT_MAX_CHARS = 1000
DEFAULT_VOCAB_SIZE = 10_000
DEFAULT_LABEL_COL = "lang"
MAX_N = 8

#: reserved model rows (strictly longer than any real n-gram, n <= MAX_N=8)
FLOOR_KEY = "__floor__"
PRIOR_KEY = "__prior__"


def _char_ngrams(col: Column, n: int, max_chars: int) -> Column:
    """All n-char grams of the lowercased first ``max_chars`` characters
    (empty array when the slice is shorter than ``n``; NULL text reads
    as empty).  Same generator rule as ``textfns.char_shingles`` with
    the bounded-prefix and NULL-coalesce added — the single tokenization
    contract shared by the trainer, the scorer, and the SQL oracle.

    ARRAY form — the per-element ``transform`` lambda runs on
    Catalyst's INTERPRETED higher-order path, so exploding this array
    is the slow way to enumerate grams; hot paths use
    :func:`_char_ngram_rows` (identical gram values, codegen)."""
    c = F.substring(F.lower(F.coalesce(col, F.lit(""))), 1, max_chars)
    num = F.length(c) - F.lit(n - 1)
    gen = F.transform(F.sequence(F.lit(1), num), lambda i: c.substr(i, F.lit(n)))
    return F.when(num >= 1, gen).otherwise(F.array().cast("array<string>"))


def _ngram_count(col: Column, n: int, max_chars: int) -> Column:
    """n-gram count of the scored slice — ``size(_char_ngrams(...))``
    as plain arithmetic (no array built)."""
    c = F.substring(F.lower(F.coalesce(col, F.lit(""))), 1, max_chars)
    return F.greatest(F.length(c) - F.lit(n - 1), F.lit(0))


def _char_ngram_rows(df, id_cols, text_col: str, n: int, max_chars: int):
    """One row per (``id_cols``..., ``__g`` n-gram) — the CODEGEN gram
    enumerator.  ``id_cols`` are plain column names already on ``df``.

    Identical gram multiset to ``explode(_char_ngrams(...))`` but ~10x
    faster (sf0.1: 14.6 s -> 1.25 s for the scorer's model join).  Two
    traps this construction avoids, both measured:

    - the array form's per-element ``transform`` lambda runs on the
      interpreted HigherOrderFunction path (5.6 s for 1.5M grams);
    - the "obvious" fix — explode an index sequence and slice with a
      dynamic ``substr`` — is WORSE (14.6 s): ``__c`` collapses into
      every consumer, and the join's constraint-inferred filters then
      re-derive ``lower(substring(text, 1, max_chars))`` per GRAM row,
      plus each ``substr(c, i, n)`` is an O(i) codepoint seek.

    Here the char array is built ONCE per doc (``split`` is
    codepoint-aware — astral parity tested), the n shifted ``slice``
    views zip into per-position structs, and the Generate emits the
    struct as an ATTRIBUTE — downstream filters touch only the n
    1-char fields, O(1) per gram, all whole-stage codegen."""
    c = F.substring(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), 1, max_chars
    )
    chars = F.split(c, "")
    # gram count from LENGTH, not size(chars): split('', '') is ['']
    # (size 1), so a size-based count would emit one bogus '' gram per
    # empty/NULL doc at n=1 — length('') = 0 gives the correct zero
    num = F.greatest(F.length(c) - F.lit(n - 1), F.lit(0))
    # each slice is ALIASED so the zipped struct's field names are
    # pinned by this code ('0'..'n-1'), not by Catalyst's fallback
    # naming for unnamed arrays_zip children (an internal rule that has
    # shifted across Spark versions; relying on it would break
    # getField(str(i)) silently-at-analysis on an upgrade)
    zipped = F.arrays_zip(
        *[F.slice(chars, i + 1, num).alias(str(i)) for i in range(n)]
    )
    return df.select(*id_cols, F.explode(zipped).alias("__z")).select(
        *id_cols,
        F.concat(
            *[F.col("__z").getField(str(i)) for i in range(n)]
        ).alias("__g"),
    )


def _check_params(n: int, max_chars: int) -> None:
    if not 1 <= n <= MAX_N:
        raise ValueError(f"n must be in [1, {MAX_N}], got {n}")
    if max_chars < n:
        raise ValueError(f"max_chars must be >= n, got {max_chars} < {n}")


def train_lang_nb(
    labeled: DataFrame,
    label_col: str = DEFAULT_LABEL_COL,
    text_col: str = "text",
    n: int = DEFAULT_N,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    smooth_k: float = DEFAULT_SMOOTH_K,
    max_chars: int = DEFAULT_MAX_CHARS,
) -> DataFrame:
    """Train the char n-gram NB langid model from labeled documents.

    Returns (``lang``, ``ngram``, ``logp``), 6-dp rounded, containing:

    - one DENSE row per (top-``vocab_size`` pooled n-gram × language):
      ``logp = ln((c + k) / (t_lang + k·V))`` with add-k smoothing,
      where ``c`` is the language's count of that n-gram, ``t_lang``
      its total in-vocab n-gram count, ``V`` the retained vocab size;
    - one ``__floor__`` row per language: the same formula at ``c = 0``
      (the per-out-of-vocab-gram cost);
    - one ``__prior__`` row per language: ``ln(docs_lang / docs_total)``.

    LAZY: no Spark job at construction (totals ride as 1-row broadcast
    aggregates).  Scale: one explode+groupBy count per corpus pass
    (map-side combinable), a TakeOrdered vocab cap, then everything is
    bounded by vocab_size × n_langs.
    """
    _check_params(n, max_chars)
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if smooth_k <= 0:
        raise ValueError(f"smooth_k must be > 0, got {smooth_k}")
    grams = _char_ngram_rows(
        labeled.select(F.col(label_col).alias("__lang"), F.col(text_col)),
        ["__lang"],
        text_col,
        n,
        max_chars,
    )
    vocab = (
        grams.groupBy("__g")
        .agg(F.count("*").alias("__pc"))
        .orderBy(F.col("__pc").desc(), F.col("__g").asc())
        .limit(vocab_size)
        .select("__g")
    )
    vdf = vocab.agg(F.count("*").alias("__v"))
    counts = (
        grams.join(F.broadcast(vocab), "__g")
        .groupBy("__lang", "__g")
        .agg(F.count("*").alias("__c"))
    )
    totals = counts.groupBy("__lang").agg(F.sum("__c").alias("__t"))
    langs = labeled.groupBy(F.col(label_col).alias("__lang")).agg(
        F.count("*").alias("__nd")
    )
    ndocs = langs.agg(F.sum("__nd").alias("__N"))
    k = F.lit(smooth_k)
    # per-lang smoothing denominator (langs with no in-vocab grams: t=0)
    lang_t = (
        langs.join(totals, "__lang", "left")
        .crossJoin(F.broadcast(vdf))
        .select(
            "__lang",
            F.coalesce(F.col("__t"), F.lit(0)).alias("__t"),
            "__v",
            "__nd",
        )
    )
    dense = (
        vocab.crossJoin(lang_t.select("__lang", "__t", "__v"))
        .join(counts, ["__lang", "__g"], "left")
        .select(
            "__lang",
            "__g",
            F.round(
                F.log(
                    (F.coalesce(F.col("__c"), F.lit(0)) + k)
                    / (F.col("__t") + k * F.col("__v"))
                ),
                6,
            ).alias("logp"),
        )
    )
    floors = lang_t.select(
        "__lang",
        F.lit(FLOOR_KEY).alias("__g"),
        F.round(F.log(k / (F.col("__t") + k * F.col("__v"))), 6).alias("logp"),
    )
    priors = (
        lang_t.crossJoin(F.broadcast(ndocs))
        .select(
            "__lang",
            F.lit(PRIOR_KEY).alias("__g"),
            F.round(F.log(F.col("__nd") / F.col("__N")), 6).alias("logp"),
        )
    )
    return (
        dense.unionByName(floors)
        .unionByName(priors)
        .select(
            F.col("__lang").alias("lang"),
            F.col("__g").alias("ngram"),
            "logp",
        )
    )


def lang_nb(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
    max_chars: int = DEFAULT_MAX_CHARS,
) -> DataFrame:
    """Predict a language per document: (``id_col``, ``lang_pred``,
    ``lang_score``, ``n_grams``).

    ``lang_pred`` is the argmax over the model's languages of
    ``prior + Σ_in-vocab logp + (n_total − n_in-vocab) · floor`` (exact
    integer micro-nats; ties break lang-ascending).  ``lang_score`` is
    the winning score in nats (micro/1e6 — a fixed-order division, so
    engine-exact).  ``n_grams`` is the n-gram count of the scored slice;
    documents with no n-grams are classified by prior alone.  ``n`` and
    ``max_chars`` MUST match training (the model stores n-grams of one
    length; a mismatch scores everything as out-of-vocab).

    The model frame must contain the reserved ``__floor__``/``__prior__``
    rows for every language (``train_lang_nb`` emits them; a model
    missing them raises at plan build).  The model is broadcast — keep
    vocab_size × n_langs within broadcast range (the trainer's cap
    does).  PERSIST CONTRACT (same as ``nb_quality_score``): an
    unpersisted model is persisted internally and the returned frame
    carries it as ``.model_cache`` — a plain attribute on the RETURNED
    OBJECT only, lost by any subsequent transformation, so capture it
    immediately before chaining; loop callers that wrap the result
    should instead persist the model themselves (already-persisted
    models are never re-persisted, so nothing leaks).
    """
    _check_params(n, max_chars)
    if not model.is_cached:
        model = model.persist()
    micro = F.round(F.col("logp") * F.lit(1e6), 0).cast("long")
    floors = model.filter(F.col("ngram") == FLOOR_KEY).select(
        F.col("lang").alias("__lang"), micro.alias("__floor")
    )
    priors = model.filter(F.col("ngram") == PRIOR_KEY).select(
        F.col("lang").alias("__lang"), micro.alias("__prior")
    )
    real = model.filter(
        ~F.col("ngram").isin(FLOOR_KEY, PRIOR_KEY)
    ).select(
        F.col("ngram").alias("__g"),
        F.col("lang").alias("__lang"),
        micro.alias("__mi"),
    )
    lang_rows = floors.join(F.broadcast(priors), "__lang")
    # LAZY model guard (no job at construction): a model without
    # __floor__/__prior__ rows would make the crossJoin below silently
    # emit ZERO rows — a cardinality bug raise_error alone can't catch
    # (no surviving row to evaluate it on).  A NULL-lang sentinel row
    # with a score floor no real language can reach keeps exactly one
    # candidate alive per document; it wins the argmax ONLY when the
    # model contributed no languages, and the output projection raises.
    sentinel = docs.sparkSession.range(1).select(
        F.lit(None).cast("string").alias("__lang"),
        F.lit(0).cast("long").alias("__floor"),
        F.lit(-(1 << 62)).cast("long").alias("__prior"),
    )
    lang_rows = lang_rows.unionByName(sentinel)
    base = docs.select(
        id_col,
        _ngram_count(F.col(text_col), n, max_chars).cast("long").alias("__nt"),
    )
    invocab = (
        _char_ngram_rows(
            docs.select(id_col, text_col), [id_col], text_col, n, max_chars
        )
        .join(F.broadcast(real), "__g")
        .groupBy(id_col, "__lang")
        .agg(F.sum("__mi").alias("__sm"), F.count("*").alias("__ni"))
    )
    scored = (
        base.crossJoin(F.broadcast(lang_rows))
        .join(invocab, [id_col, "__lang"], "left")
        .select(
            id_col,
            "__lang",
            "__nt",
            (
                F.coalesce(F.col("__sm"), F.lit(0))
                + (F.col("__nt") - F.coalesce(F.col("__ni"), F.lit(0)))
                * F.col("__floor")
                + F.col("__prior")
            ).alias("__score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("__lang").asc()
    )
    out = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.when(
                F.col("__lang").isNull(),
                F.raise_error(
                    F.lit(
                        "lang_nb: model has no __floor__/__prior__ rows "
                        "(train with train_lang_nb or add them)"
                    )
                ).cast("string"),
            )
            .otherwise(F.col("__lang"))
            .alias("lang_pred"),
            (F.col("__score").cast("double") / F.lit(1e6)).alias("lang_score"),
            F.col("__nt").alias("n_grams"),
        )
    )
    # release handle (the semdedup assign_cache convention): loop callers
    # passing plan-distinct model frames unpersist via out.model_cache
    out.model_cache = model
    return out


def expected_lang_logp(c: int, t: int, v: int, k: float = DEFAULT_SMOOTH_K) -> float:
    """Trainer weight formula as plain Python — the test mirror."""
    return round(math.log((c + k) / (t + k * v)), 6)


def expected_lang_prior(nd: int, total: int) -> float:
    """Trainer prior formula as plain Python — the test mirror."""
    return round(math.log(nd / total), 6)
