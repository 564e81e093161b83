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


def _word_model(spark, vocab_size=50):
    from ia_hadoop_tools_spark.operators.lm_quality import train_word_lm

    ref = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "a cat and a dog sat"),
        ],
        "doc_id: long, text: string",
    )
    return ref, train_word_lm(ref, vocab_size=vocab_size)


def test_word_lm_hand_computed(spark):
    """Pin the exact add-k arithmetic on a tiny reference, python-side."""
    from collections import Counter

    ref, model = _word_model(spark)
    toks = [
        "the cat sat on the mat".split(),
        "the dog sat on the rug".split(),
        "a cat and a dog sat".split(),
    ]
    pairs = Counter(
        (a, b) for ws in toks for a, b in zip(ws, ws[1:])
    )
    ctxs = Counter(a for (a, _), n in pairs.items() for _ in range(n))
    vocab = {w for ws in toks for w in ws}
    v = len(vocab)
    k = 0.1
    rows = {(r.ctx, r.nxt): (r.logp, r.logp_unseen) for r in model.collect()}
    assert set(rows) == set(pairs)
    for (a, b), n in pairs.items():
        want = round(math.log((n + k) / (ctxs[a] + k * v)), 6)
        want_floor = round(math.log(k / (ctxs[a] + k * v)), 6)
        assert rows[(a, b)] == (want, want_floor), (a, b)
    # scoring: doc with all-seen bigrams == mean of its pair logps
    docs = spark.createDataFrame(
        [(9, "the cat sat")], "doc_id: long, text: string"
    )
    got = lm_score(docs, model, unit="word").collect()[0]
    want = round(
        (rows[("the", "cat")][0] + rows[("cat", "sat")][0]) / 2, 6
    )
    assert (got.lm_score, got.n_bigrams) == (want, 2)


def test_word_lm_vocab_cap_drops_oov_bigrams(spark):
    from ia_hadoop_tools_spark.operators.lm_quality import train_word_lm

    ref = spark.createDataFrame(
        # 'rare' appears once; everything else >= 2 times
        [(1, "big big cat cat big cat rare big")],
        "doc_id: long, text: string",
    )
    model = train_word_lm(ref, vocab_size=2)
    rows = {(r.ctx, r.nxt) for r in model.collect()}
    assert rows and all(
        a in ("big", "cat") and b in ("big", "cat") for a, b in rows
    )
    # an OOV-context doc falls to the global 1/V floor (V = capped vocab)
    docs = spark.createDataFrame(
        [(5, "rare unknown")], "doc_id: long, text: string"
    )
    got = lm_score(docs, model, unit="word").collect()[0]
    assert got.lm_score == round(math.log(1.0 / 2), 6)


def test_word_lm_scores_rank_english_over_shuffled(spark):
    ref, model = _word_model(spark)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),  # reference-like word order
            (2, "rug the on sat cat the"),  # same words, scrambled
            (3, "one"),  # < 2 tokens -> null
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.lm_score, r.n_bigrams)
        for r in lm_score(docs, model, unit="word").collect()
    }
    assert got[1][0] > got[2][0]
    assert got[3] == (None, 0)


def _bucket_docs(spark):
    return spark.createDataFrame(
        [
            (i, t)
            for i, t in enumerate(
                [
                    "the cat sat on the mat",
                    "the dog sat on the rug",
                    "a cat and a dog sat",
                    "the cat sat on the rug",
                    "dog the rug on a sat",
                    "mat rug dog cat a the",
                    "zz qq xx vv ww yy",
                    "the dog sat on the mat",
                    "on on on on on on",
                ]
            )
        ],
        "doc_id: long, text: string",
    )


def _pandas_terciles(scored_pdf):
    """Independent reference bucketing mirroring CCNet's threshold
    semantics: rank by (score desc, id asc) into exact terciles (when
    evenly divisible), take each tile's min score as its cutoff, then
    assign by score >= cutoff — so a score TIE straddling a tile
    boundary lands whole in the higher bucket, same as the operator."""
    pdf = scored_pdf.sort_values(
        ["lm_score", "doc_id"], ascending=[False, True]
    )
    n = len(pdf)
    if n % 3 != 0:
        return None
    # itertuples keeps doc_id integral (iterrows coerces to float64)
    rows = list(pdf.itertuples(index=False))
    t1 = min(r.lm_score for i, r in enumerate(rows) if i * 3 // n == 0)
    t2 = min(r.lm_score for i, r in enumerate(rows) if i * 3 // n == 1)
    return {
        int(r.doc_id): (
            "head" if r.lm_score >= t1
            else "middle" if r.lm_score >= t2
            else "tail"
        )
        for r in rows
    }


def test_word_lm_bucket_parity_head_middle_tail(spark):
    """CCNet's operational step works identically on word scores: the
    lm_buckets operator (fixed calibration slice -> tercile cutoffs ->
    broadcast comparison) applied to unit='word' scores must reproduce
    a direct pandas bucketing of the same scores."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    ref, model = _word_model(spark)
    docs = _bucket_docs(spark)
    scored = lm_score(docs, model, unit="word").filter(
        F.col("lm_score").isNotNull()
    )
    got = {r.doc_id: r.bucket for r in lm_buckets(scored).collect()}
    want = _pandas_terciles(scored.toPandas())
    if want is not None:  # exact terciles only when evenly divisible
        assert got == want
    assert set(got.values()) == {"head", "middle", "tail"}


def test_lm_buckets_char_word_parity_and_scorers(spark):
    """The bucket operator is scorer-agnostic: char-model scores,
    word-model scores, and backoff scores each bucket per THEIR OWN
    score ordering (the operator never looks at text), and two scorers
    with the same ranking produce the same buckets."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.lm_quality import (
        lm_buckets,
        lm_score_backoff,
        train_char_lm,
        train_word_backoff_lm,
    )

    docs = _bucket_docs(spark)
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        "doc_id: long, text: string",
    )
    for scored in (
        lm_score(docs, train_char_lm(ref), unit="char"),
        lm_score_backoff(docs, train_word_backoff_lm(ref, vocab_size=100)),
    ):
        scored = scored.filter(F.col("lm_score").isNotNull())
        got = {r.doc_id: r.bucket for r in lm_buckets(scored).collect()}
        want = _pandas_terciles(scored.toPandas())
        if want is not None:
            assert got == want
        assert set(got.values()) == {"head", "middle", "tail"}


def test_lm_buckets_null_scores_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    scored = spark.createDataFrame(
        [(1, -1.0), (2, -2.0), (3, -3.0), (4, None)],
        "doc_id: long, lm_score: double",
    )
    out = {r.doc_id: r.bucket for r in lm_buckets(scored).collect()}
    # null score -> null bucket, row kept (split_corpus NULL convention)
    assert out == {1: "head", 2: "middle", 3: "tail", 4: None}
    # bounded calibration slice: cutoffs derive only from the slice
    cal = {
        r.doc_id: r.bucket
        for r in lm_buckets(
            scored, calibration=F.col("doc_id") <= 3
        ).collect()
    }
    assert cal == out
    with pytest.raises(ValueError, match="labels"):
        lm_buckets(scored, labels=("a", "b"))
    with pytest.raises(ValueError, match="n_buckets"):
        lm_buckets(scored, n_buckets=1)
    # n_buckets=2 with generated labels
    # ntile(2) over 3 rows puts 2 in the first tile -> cutoff -2.0
    two = {r.doc_id: r.bucket for r in lm_buckets(scored, n_buckets=2).collect()}
    assert two == {1: "b1", 2: "b1", 3: "b2", 4: None}


def test_backoff_lm_hand_computed_all_four_paths(spark):
    """Pin each stupid-backoff path: trigram hit, bigram backoff,
    unigram backoff, fully-unseen floor — python-side arithmetic."""
    from ia_hadoop_tools_spark.operators.lm_quality import (
        lm_score_backoff,
        train_word_backoff_lm,
    )

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran on the mat")],
        "doc_id: long, text: string",
    )
    model = train_word_backoff_lm(ref)
    rows = {(r.order, r.ctx, r.nxt): r.logs for r in model.collect()}
    toks = "the cat sat on the mat the cat ran on the mat".split()
    from collections import Counter

    uni = Counter(toks)
    bi = Counter(zip(toks[:6], toks[1:6])) + Counter(zip(toks[6:], toks[7:]))
    v = len(uni)
    assert rows[(1, "", "the")] == round(math.log(uni["the"] / 12), 6)
    assert rows[(2, "the", "cat")] == round(
        math.log(bi[("the", "cat")] / uni["the"]), 6
    )
    assert rows[(3, "the cat", "sat")] == round(math.log(1 / 2), 6)

    la, la2 = round(math.log(0.4), 6), round(2 * math.log(0.4), 6)
    docs = spark.createDataFrame(
        [
            (10, "the cat sat"),      # trigram hit (count 1 of 2)
            (11, "cat on the"),       # no "cat on" trigram/bigram start
            (12, "zz qq xx"),         # fully unseen -> floor
            (13, "a b"),              # < 3 tokens -> null
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.lm_score, r.n_trigrams)
        for r in lm_score_backoff(docs, model, alpha=0.4).collect()
    }
    assert got[10] == (rows[(3, "the cat", "sat")], 1)
    # doc 11: trigram (cat, on, the) unseen; bigram (on, the) seen ->
    # alpha * relfreq(the | on)
    want11 = round(rows[(2, "on", "the")] + la, 6)
    assert got[11] == (want11, 1)
    floor = round(math.log(1.0 / v), 6)
    assert got[12] == (round(floor + la2, 6), 1)
    assert got[13] == (None, 0)


def test_backoff_lm_ranks_and_empty_model(spark):
    import pytest as _pytest

    from ia_hadoop_tools_spark.operators.lm_quality import (
        lm_score_backoff,
        train_word_backoff_lm,
    )

    ref, _ = _word_model(spark)
    model = train_word_backoff_lm(ref)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.lm_score for r in lm_score_backoff(docs, model).collect()}
    assert got[1] > got[2]
    empty = model.filter("1 = 0")
    with _pytest.raises(ValueError, match="unigram"):
        lm_score_backoff(docs, empty)
    # alpha is a SCORING-time knob: > 1 would reward backoff, <= 0 is a
    # log-domain error — both rejected before any computation
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="alpha"):
            lm_score_backoff(docs, model, alpha=bad)


def test_lm_buckets_rejects_bucket_clash(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    scored = spark.createDataFrame(
        [(1, -1.0, "x")], "doc_id: long, lm_score: double, bucket: string"
    )
    with pytest.raises(ValueError, match="bucket"):
        lm_buckets(scored)


def test_lm_buckets_empty_calibration_raises_at_action(spark):
    import pytest
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    scored = spark.createDataFrame(
        [(1, -1.0), (2, -2.0), (3, -3.0)], "doc_id: long, lm_score: double"
    )
    out = lm_buckets(scored, calibration=F.col("doc_id") > 100)
    # silent all-'tail' bucketing would drop the whole corpus downstream
    with pytest.raises(Exception, match="calibration slice"):
        out.collect()
    # a one-row slice cannot define tercile cutoffs either
    out2 = lm_buckets(scored, calibration=F.col("doc_id") == 1)
    with pytest.raises(Exception, match="calibration slice"):
        out2.collect()


def test_lm_buckets_rejects_scratch_clash(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    scored = spark.createDataFrame(
        [(1, -1.0, 0.0)], "doc_id: long, lm_score: double, __t1: double"
    )
    with pytest.raises(ValueError, match="__t1"):
        lm_buckets(scored)
