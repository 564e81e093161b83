"""Character-LM quality scoring (operators/lm_quality.py)."""

from __future__ import annotations

import math

from ia_hadoop_tools_spark.operators.lm_quality import lm_score, train_char_lm


def _model(spark):
    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "sphinx of black quartz judge my vow"),
            (4, "the five boxing wizards jump quickly"),
        ],
        "doc_id: long, text: string",
    )
    return ref, train_char_lm(ref)


def test_reference_like_scores_above_gibberish(spark):
    ref, model = _model(spark)
    docs = spark.createDataFrame(
        [
            (10, "the quick red fox jumps over dogs"),  # english-like
            (11, "zzqx qzxj xjqq zzzz qqqq xxxx jjjj"),  # gibberish
            (12, "a"),  # too short -> null score
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: (r.lm_score, r.n_bigrams) for r in lm_score(docs, model).collect()}
    assert got[10][0] > got[11][0]
    assert got[12] == (None, 0)
    assert got[10][1] == len("the quick red fox jumps over dogs") - 1


def test_model_shape_and_determinism(spark):
    ref, model = _model(spark)
    rows = sorted(map(tuple, model.collect()))
    rows2 = sorted(map(tuple, train_char_lm(ref).collect()))
    assert rows == rows2
    # every row is a valid log-prob and the per-context floor is the min
    for ctx, nxt, logp, logp_unseen, logp_nc in rows:
        assert len(ctx) == 1 and len(nxt) == 1
        assert logp < 0 and logp_unseen < logp
    # probabilities per context sum to < 1 (smoothing reserves mass)
    from collections import defaultdict

    mass = defaultdict(float)
    for ctx, _, logp, _, _ in rows:
        mass[ctx] += math.exp(logp)
    assert all(0 < m <= 1.0 + 1e-6 for m in mass.values())


def test_unseen_context_uses_global_floor(spark):
    ref, model = _model(spark)
    docs = spark.createDataFrame(
        [(20, "éééé")],  # chars absent from reference
        "doc_id: long, text: string",
    )
    got = lm_score(docs, model).collect()[0]
    nc = model.select("logp_nocontext").first()[0]
    assert got.lm_score == nc  # every bigram fell to the 1/V floor


def test_degenerate_model_raises(spark):
    import pytest as _pytest

    # an empty reference builds (lazily) an empty model, which lm_score
    # rejects — emptiness surfaces at the first action, not construction
    empty_ref = spark.createDataFrame([], "doc_id: long, text: string")
    docs = spark.createDataFrame([(1, "ab")], "doc_id: long, text: string")
    with _pytest.raises(ValueError, match="model is empty"):
        lm_score(docs, train_char_lm(empty_ref))
    ref, model = _model(spark)
    empty_model = model.filter("1 = 0")
    with _pytest.raises(ValueError, match="model is empty"):
        lm_score(docs, empty_model)


def test_train_launches_no_jobs_at_construction(spark):
    """Model construction is LAZY: zero Spark jobs until an action (the
    old implementation ran a distinct().count() vocabulary census plus an
    empty-check per construction). Same guard as the textops builders."""
    ref = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over the lazy dog")],
        "doc_id: long, text: string",
    )
    sc = spark.sparkContext
    group = "lazy-lm-construction-probe"
    sc.setJobGroup(group, "no jobs may appear here")
    try:
        train_char_lm(ref)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(jobs or []) == []


def test_empty_doc_does_not_inflate_vocabulary(spark):
    """An empty reference doc must not add a phantom '' character to V:
    model probabilities with and without the empty doc are identical."""
    from ia_hadoop_tools_spark.operators.lm_quality import train_char_lm

    clean = spark.createDataFrame([("ab",)], "text string")
    with_empty = spark.createDataFrame([("ab",), ("",)], "text string")
    a = sorted(map(tuple, train_char_lm(clean).collect()))
    b = sorted(map(tuple, train_char_lm(with_empty).collect()))
    assert a == b
    # V=2 ({'a','b'}): logp(a->b) = ln((1+0.1)/(1+0.1*2))
    import math

    assert a[0][2] == round(math.log(1.1 / 1.2), 6)
