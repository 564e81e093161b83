"""Trained char n-gram NB language ID (operators/langid.py).

Pins: trainer weights against the plain-Python mirror, scorer
micro-nat exactness and partitioning invariance, the lazy sentinel
guard for broken models, and the differential against the stopword
heuristic on a seeded three-language fixture corpus (VERDICT r8 task
#3 — done means the trained path beats-or-ties the heuristic and the
operator ships with a pending registry row).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.langid import (
    FLOOR_KEY,
    PRIOR_KEY,
    expected_lang_logp,
    expected_lang_prior,
    lang_nb,
    train_lang_nb,
)

# seeded fixture corpus: stopword-heavy sentences so the heuristic has a
# fair shot; word pools disjoint enough that trigram NB separates cleanly
WORDS = {
    "en": "the and is of to in that it was for with are this have from".split(),
    "de": "der die und ist das nicht von mit sich auf eine ich werden".split(),
    "fr": "le la les et est de que pour dans une avec sur pas vous".split(),
}


def _corpus(seed: int, docs_per_lang: int, words_per_doc: int = 12):
    rng = random.Random(seed)
    rows, i = [], 0
    for lang in sorted(WORDS):
        for _ in range(docs_per_lang):
            text = " ".join(rng.choice(WORDS[lang]) for _ in range(words_per_doc))
            rows.append((i, lang, text))
            i += 1
    return rows


@pytest.fixture(scope="module")
def fixture_model(spark):
    rows = _corpus(seed=7, docs_per_lang=40)
    labeled = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = train_lang_nb(labeled, vocab_size=500).persist()
    model.count()
    yield model
    model.unpersist()


def test_trainer_matches_python_mirror(spark):
    labeled = spark.createDataFrame(
        [(0, "en", "aab"), (1, "en", "aab"), (2, "xx", "bba")],
        "doc_id long, lang string, text string",
    )
    model = {
        (r["lang"], r["ngram"]): r["logp"]
        for r in train_lang_nb(labeled, n=2, vocab_size=10).collect()
    }
    # pooled bigrams: en gives aa,ab twice each; xx gives bb,ba once each
    # vocab = {aa, ab, bb, ba}, V=4; t_en=4, t_xx=2
    assert model[("en", "aa")] == expected_lang_logp(2, 4, 4)
    assert model[("en", "bb")] == expected_lang_logp(0, 4, 4)
    assert model[("xx", "ba")] == expected_lang_logp(1, 2, 4)
    assert model[("en", FLOOR_KEY)] == expected_lang_logp(0, 4, 4)
    assert model[("xx", FLOOR_KEY)] == expected_lang_logp(0, 2, 4)
    assert model[("en", PRIOR_KEY)] == expected_lang_prior(2, 3)
    assert model[("xx", PRIOR_KEY)] == expected_lang_prior(1, 3)


def test_scorer_micro_nat_exactness(spark):
    """Hand-computed integer micro-nat argmax on a two-lang model."""
    model = spark.createDataFrame(
        [
            ("en", "ab", -0.5), ("en", FLOOR_KEY, -3.0), ("en", PRIOR_KEY, -0.25),
            ("xx", "ab", -2.0), ("xx", FLOOR_KEY, -1.0), ("xx", PRIOR_KEY, -1.5),
        ],
        "lang string, ngram string, logp double",
    )
    docs = spark.createDataFrame(
        [(1, "abzz")],  # bigrams: ab, bz, zz -> 1 in-vocab + 2 OOV
        "doc_id long, text string",
    )
    out = lang_nb(docs, model, n=2).collect()
    assert len(out) == 1
    r = out[0]
    # en: -0.5 + 2*(-3.0) + (-0.25) = -6.75 ; xx: -2.0 + 2*(-1.0) - 1.5 = -5.5
    assert r["lang_pred"] == "xx"
    assert r["lang_score"] == -5.5
    assert r["n_grams"] == 3


def test_null_and_short_text_predict_by_prior(spark):
    model = spark.createDataFrame(
        [
            ("aa", "zz", -1.0), ("aa", FLOOR_KEY, -2.0), ("aa", PRIOR_KEY, -0.9),
            ("bb", "zz", -1.0), ("bb", FLOOR_KEY, -2.0), ("bb", PRIOR_KEY, -0.2),
        ],
        "lang string, ngram string, logp double",
    )
    docs = spark.createDataFrame(
        [(1, None), (2, "ab")],  # NULL text; text shorter than n=3
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lang_nb(docs, model, n=3).collect()}
    assert out[1]["lang_pred"] == "bb" and out[1]["n_grams"] == 0
    assert out[1]["lang_score"] == -0.2
    assert out[2]["lang_pred"] == "bb" and out[2]["n_grams"] == 0


def test_tie_breaks_lang_ascending(spark):
    model = spark.createDataFrame(
        [
            ("bb", FLOOR_KEY, -1.0), ("bb", PRIOR_KEY, -0.5),
            ("aa", FLOOR_KEY, -1.0), ("aa", PRIOR_KEY, -0.5),
        ],
        "lang string, ngram string, logp double",
    )
    docs = spark.createDataFrame([(1, "xyz")], "doc_id long, text string")
    assert lang_nb(docs, model, n=3).collect()[0]["lang_pred"] == "aa"


def test_broken_model_raises_at_execution_not_construction(spark):
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    no_meta = spark.createDataFrame(
        [("en", "hel", -1.0)], "lang string, ngram string, logp double"
    )
    out = lang_nb(docs, no_meta)  # construction must NOT raise (lazy)
    with pytest.raises(Exception, match="no __floor__/__prior__"):
        out.collect()
    out.model_cache.unpersist()


def test_invariant_under_partitioning(spark, fixture_model):
    rows = _corpus(seed=11, docs_per_lang=5)
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(lang_nb(docs, fixture_model).collect())
    b = sorted(lang_nb(docs.repartition(17), fixture_model).collect())
    assert a == b


def test_trained_beats_or_ties_heuristic_on_heldout(spark, fixture_model):
    """The VERDICT done-criterion: differential vs the stopword vote on
    a held-out seeded slice of the same three-language distribution."""
    from ia_hadoop_tools_spark.operators.textops import language_id

    rows = _corpus(seed=23, docs_per_lang=30)  # disjoint seed = held out
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    nb = {
        r["doc_id"]: r["lang_pred"]
        for r in lang_nb(docs, fixture_model).collect()
    }
    heur = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id(docs).select("doc_id", "lang_pred").collect()
    }
    truth = {i: lang for i, lang, _ in rows}
    acc_nb = sum(nb[i] == truth[i] for i in truth) / len(truth)
    acc_heur = sum(heur[i] == truth[i] for i in truth) / len(truth)
    assert acc_nb >= acc_heur
    assert acc_nb >= 0.99  # trigram NB should nail this separation


def test_score_is_exact_log_posterior_numerator(spark, fixture_model):
    """lang_score must equal the integer micro-nat sum / 1e6 recomputed
    in plain Python from the model rows (engine-exactness check)."""
    m = {}
    for r in fixture_model.collect():
        m[(r["lang"], r["ngram"])] = round(r["logp"] * 1e6)
    langs = sorted({lang for lang, g in m if g == PRIOR_KEY})
    text = "the and is of the that it was"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = lang_nb(docs, fixture_model).collect()[0]
    p = text.lower()[:1000]
    grams = [p[i : i + 3] for i in range(len(p) - 2)]
    best = None
    for lang in langs:
        s = m[(lang, PRIOR_KEY)]
        for g in grams:
            s += m.get((lang, g), m[(lang, FLOOR_KEY)])
        if best is None or s > best[1]:
            best = (lang, s)
    assert row["lang_pred"] == best[0]
    assert row["lang_score"] == best[1] / 1e6
    assert math.isclose(row["lang_score"], best[1] / 1e6, rel_tol=0)


def test_param_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be"):
        train_lang_nb(docs, label_col="text", n=9)
    with pytest.raises(ValueError, match="max_chars"):
        train_lang_nb(docs, label_col="text", max_chars=1)
    with pytest.raises(ValueError, match="vocab_size"):
        train_lang_nb(docs, label_col="text", vocab_size=0)
    with pytest.raises(ValueError, match="smooth_k"):
        train_lang_nb(docs, label_col="text", smooth_k=0)


def test_gram_rows_match_array_form_at_every_n(spark):
    """The codegen enumerator must emit the IDENTICAL gram multiset as
    explode(_char_ngrams(...)) for every supported n, including the
    n=1 empty/NULL trap: split('', '') is [''] (size 1), so a
    size-based count would emit one bogus '' gram per empty doc —
    review r10 finding, counted from length() instead."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.langid import (
        _char_ngram_rows,
        _char_ngrams,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a"), (4, "ab\U0001F600"), (5, "Mixed CaßE")],
        "doc_id long, text string",
    )
    for n in (1, 2, 3):
        new = sorted(
            (r["doc_id"], r["__g"])
            for r in _char_ngram_rows(df, ["doc_id"], "text", n, 100).collect()
        )
        old = sorted(
            (r["doc_id"], r["g"])
            for r in df.select(
                "doc_id",
                F.explode(_char_ngrams(F.col("text"), n, 100)).alias("g"),
            ).collect()
        )
        assert new == old, f"gram multiset diverged at n={n}"
    # empty/NULL docs contribute ZERO grams at n=1 (not one '' gram)
    n1 = _char_ngram_rows(df, ["doc_id"], "text", 1, 100).collect()
    assert {r["doc_id"] for r in n1} == {3, 4, 5}
