"""NB quality classifier: trainer weights vs the plain-Python mirror,
scorer exactness, OOV neutrality, NULL convention, determinism under
repartitioning, and prototype_prune's keep arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.classifier import (
    expected_llr,
    nb_quality_score,
    train_nb_quality,
)
from ia_hadoop_tools_spark.operators.similarity import prototype_prune


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


@pytest.fixture(scope="module")
def tiny_model(spark):
    pos = _docs(spark, ["good good spark", "good clean spark"])
    neg = _docs(spark, ["spam spam spam", "spam noise"])
    return train_nb_quality(pos, neg, vocab_size=100, smooth_k=0.5)


def test_trainer_matches_python_mirror(spark, tiny_model):
    got = {r["token"]: r["llr"] for r in tiny_model.collect()}
    # pooled vocab: good(3) spam(4) spark(2) clean(1) noise(1) -> V=5
    # class totals over in-vocab tokens: Tp=6, Tn=5
    v, tp, tn = 5, 6, 5
    exp = {
        "good": expected_llr(3, 0, tp, tn, v),
        "spark": expected_llr(2, 0, tp, tn, v),
        "clean": expected_llr(1, 0, tp, tn, v),
        "spam": expected_llr(0, 4, tp, tn, v),
        "noise": expected_llr(0, 1, tp, tn, v),
    }
    assert got == exp
    assert got["good"] > 0 > got["spam"]


def test_scorer_micro_nat_exactness(spark, tiny_model):
    docs = _docs(spark, ["good spark", "spam spam", "zzz-oov only", ""])
    out = {
        r["doc_id"]: (r["nb_llr"], r["n_tokens"])
        for r in nb_quality_score(docs, tiny_model).collect()
    }
    w = {r["token"]: round(r["llr"] * 1e6) for r in tiny_model.collect()}
    exp0 = (w["good"] + w["spark"]) / 2 / 1e6
    assert out[0] == (exp0, 2)
    assert out[1] == (2 * w["spam"] / 2 / 1e6, 2)
    # OOV tokens contribute exactly 0 but still count toward the mean
    assert out[2] == (0.0, 2)
    # empty doc: NULL score, zero tokens (the lm_score convention)
    assert out[3] == (None, 0)
    assert out[0][0] > 0 > out[1][0]


def test_scorer_invariant_under_partitioning(spark, tiny_model):
    docs = _docs(
        spark, [f"good spark spam noise doc{i}" for i in range(50)]
    )
    a = nb_quality_score(docs, tiny_model).collect()
    b = nb_quality_score(docs.repartition(13), tiny_model).collect()
    assert sorted(a) == sorted(b)


def test_vocab_cap_drops_tail_tokens(spark):
    # vocab_size=1 keeps only the most frequent pooled token ('spam', 3)
    pos = _docs(spark, ["good good"])
    neg = _docs(spark, ["spam spam spam"])
    model = train_nb_quality(pos, neg, vocab_size=1)
    assert [r["token"] for r in model.collect()] == ["spam"]
    # 'good' is now OOV -> scores 0
    out = nb_quality_score(_docs(spark, ["good good"]), model).collect()
    assert out[0]["nb_llr"] == 0.0


def test_trainer_rejects_bad_params(spark, tiny_model):
    d = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="vocab_size"):
        train_nb_quality(d, d, vocab_size=0)
    with pytest.raises(ValueError, match="smooth_k"):
        train_nb_quality(d, d, smooth_k=0.0)


# ---------------------------------------------------------------- prototypes


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


@pytest.fixture(scope="module")
def two_clusters(spark):
    # cluster 0 along +x (decreasing prototypicality 1..4), cluster 1
    # along +y (ids 10..12)
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.95, 0.1]),
            (3, [0.8, 0.3]),
            (4, [0.7, 0.5]),
            (10, [0.0, 1.0]),
            (11, [0.1, 0.9]),
            (12, [0.4, 0.8]),
        ],
    )
    centroids = spark.createDataFrame(
        [
            Row(centroid_id=0, centroid=[1.0, 0.0]),
            Row(centroid_id=1, centroid=[0.0, 1.0]),
        ]
    )
    return corpus, centroids


def test_prototype_prune_drops_nearest(spark, two_clusters):
    corpus, centroids = two_clusters
    out = prototype_prune(corpus, centroids, keep_frac=0.5).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert {r["vec_id"] for r in out} == {1, 2, 3, 4, 10, 11, 12}
    assert all(
        by_id[i]["cluster_id"] == (0 if i < 10 else 1) for i in by_id
    )
    # cluster 0 (4 docs, keep 2): the two FARTHEST from the centroid
    kept0 = {i for i in (1, 2, 3, 4) if by_id[i]["keep"]}
    assert kept0 == {3, 4}
    # cluster 1 (3 docs, keep floor(1.5)=1): only the farthest survives
    kept1 = {i for i in (10, 11, 12) if by_id[i]["keep"]}
    assert kept1 == {12}


def test_prototype_prune_outlier_mode(spark, two_clusters):
    corpus, centroids = two_clusters
    out = prototype_prune(
        corpus, centroids, keep_frac=0.5, drop="outliers"
    ).collect()
    kept = {r["vec_id"] for r in out if r["keep"]}
    # now the CLOSEST survive
    assert kept == {1, 2, 10}


def test_prototype_prune_keep_frac_edges(spark, two_clusters):
    corpus, centroids = two_clusters
    all_kept = prototype_prune(corpus, centroids, keep_frac=1.0).collect()
    assert all(r["keep"] for r in all_kept)
    none_kept = prototype_prune(corpus, centroids, keep_frac=0.0).collect()
    assert not any(r["keep"] for r in none_kept)
    with pytest.raises(ValueError, match="keep_frac"):
        prototype_prune(corpus, centroids, keep_frac=1.5)
    with pytest.raises(ValueError, match="drop"):
        prototype_prune(corpus, centroids, drop="nothing")


def test_prototype_prune_integer_boundary(spark):
    # 25 docs, keep_frac=0.8: float 0.8*25 can round to 20.000000000000004
    # (ceil->21) — the ppm integer path must give exactly 20
    corpus = _vecs(
        spark, [(i, [1.0, i * 0.01]) for i in range(25)]
    )
    centroids = spark.createDataFrame(
        [Row(centroid_id=0, centroid=[1.0, 0.0])]
    )
    out = prototype_prune(corpus, centroids, keep_frac=0.8).collect()
    assert sum(r["keep"] for r in out) == 20


def test_prototype_prune_invariant_under_partitioning(spark, two_clusters):
    corpus, centroids = two_clusters
    a = prototype_prune(corpus, centroids, keep_frac=0.5).collect()
    b = prototype_prune(
        corpus.repartition(7), centroids, keep_frac=0.5
    ).collect()
    assert sorted(a) == sorted(b)


def test_nb_scores_compose_with_lm_buckets(spark, tiny_model):
    """The CCNet bucket step is scorer-agnostic (lm_buckets docstring):
    head/middle/tail over NB llr scores is the classifier-backed quality
    cut — pin the composition end-to-end."""
    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    docs = _docs(
        spark,
        ["good good spark"] * 4 + ["good spam"] * 4 + ["spam spam noise"] * 4,
    )
    scored = nb_quality_score(docs, tiny_model)
    out = lm_buckets(scored, score_col="nb_llr").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["nb_llr"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    # buckets are monotone in score: every head score >= every tail score
    assert min(by_bucket["head"]) >= max(by_bucket["tail"])


def test_scorer_construction_launches_no_jobs(spark, tiny_model):
    """Scorer construction is LAZY (ADVICE r8: the old emptiness probe
    ran model.first() — a Spark job — at plan-build time).  Same guard
    as the lm_quality/textops builders."""
    from ia_hadoop_tools_spark.operators.langid import lang_nb, train_lang_nb

    docs = _docs(spark, ["some text"])
    labeled = spark.createDataFrame(
        [(1, "en", "the fox")], "doc_id long, lang string, text string"
    )
    sc = spark.sparkContext
    group = "lazy-scorer-construction-probe"
    sc.setJobGroup(group, "no jobs may appear here")
    try:
        nb_quality_score(docs, tiny_model)
        lang_nb(docs, train_lang_nb(labeled))
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(jobs or []) == []


def test_scorer_rejects_empty_model_lazily(spark):
    """Construction stays lazy (no job — the train_nb_quality
    convention); the empty-model error fires at first execution."""
    docs = _docs(spark, ["anything"])
    nothing = spark.createDataFrame([], "doc_id: long, text: string")
    empty = train_nb_quality(nothing, nothing)
    out = nb_quality_score(docs, empty)  # must NOT raise or launch a job
    with pytest.raises(Exception, match="model is empty"):
        out.collect()
    out.model_cache.unpersist()


# ------------------------------------------------------- differential tests


def _py_nb_model(pos_texts, neg_texts, vocab_size, k=0.5):
    """From-scratch NB trainer reference: plain dicts + loops, shares no
    code with the operator (the test_analytics_properties convention)."""
    import math
    from collections import Counter

    def toks(texts):
        out = []
        for t in texts:
            out.extend(w for w in t.lower().split() if w)
        return out

    pooled = Counter(toks(pos_texts) + toks(neg_texts))
    vocab = sorted(pooled, key=lambda w: (-pooled[w], w))[:vocab_size]
    vs = set(vocab)
    cp = Counter(w for w in toks(pos_texts) if w in vs)
    cn = Counter(w for w in toks(neg_texts) if w in vs)
    tp, tn, v = sum(cp.values()), sum(cn.values()), len(vocab)
    return {
        w: round(
            math.log((cp[w] + k) / (tp + k * v))
            - math.log((cn[w] + k) / (tn + k * v)),
            6,
        )
        for w in vocab
    }


def test_nb_trainer_matches_python_reference_random_corpora(spark):
    import random as _random

    rng = _random.Random(11)
    words = [f"w{i}" for i in range(12)]
    for trial in range(3):
        mk = lambda n: [
            " ".join(rng.choices(words, k=rng.randrange(0, 9)))
            for _ in range(n)
        ]
        pos_texts, neg_texts = mk(15), mk(15)
        got = {
            r["token"]: r["llr"]
            for r in train_nb_quality(
                _docs(spark, pos_texts), _docs(spark, neg_texts),
                vocab_size=8,
            ).collect()
        }
        assert got == _py_nb_model(pos_texts, neg_texts, 8), f"trial {trial}"


def test_prototype_prune_keep_rule_matches_python_reference(spark):
    """The NEW logic (within-cluster rank + integer-ppm keep) against a
    plain-Python reference over the operator's own assignment output
    (assignment itself is oracle-pinned via the semdedup registry row)."""
    import random as _random

    rng = _random.Random(23)
    corpus = _vecs(
        spark,
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)],
    )
    centroids = spark.createDataFrame(
        [
            Row(centroid_id=c, centroid=[rng.uniform(-1, 1) for _ in range(4)])
            for c in range(5)
        ]
    )
    for keep_frac, drop in ((0.8, "prototypes"), (0.33, "outliers")):
        ppm = int(round(keep_frac * 1e6))
        rows = prototype_prune(
            corpus, centroids, keep_frac=keep_frac, drop=drop
        ).collect()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        expect_keep = set()
        for cid, members in by_cluster.items():
            sign = 1 if drop == "prototypes" else -1
            ordered = sorted(
                members,
                key=lambda r: (sign * r["cos_to_centroid"], r["vec_id"]),
            )
            n_keep = (len(members) * ppm) // 1_000_000
            expect_keep |= {r["vec_id"] for r in ordered[:n_keep]}
            # ranks are 1..n with no gaps
            assert sorted(r["cluster_rank"] for r in members) == list(
                range(1, len(members) + 1)
            )
        got_keep = {r["vec_id"] for r in rows if r["keep"]}
        assert got_keep == expect_keep, (keep_frac, drop)
