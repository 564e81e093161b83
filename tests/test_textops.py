from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.textops import (
    dedup_exact_text,
    fingerprint,
    language_id,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
    text_stats,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),
        (2, "completely different content about spark engines and distributed joins"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (4, "el la de que y en un por con los"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_text_stats(spark):
    out = text_stats(_docs(spark)).filter("doc_id = 0").collect()[0]
    assert out.n_tokens == 14
    assert out.n_chars_computed == len(
        "the quick brown fox jumps over the lazy dog near the river bank today"
    )
    assert out.punct_ratio == 0.0
    assert out.stopword_ratio_en > 0.2  # 'the' x3, 'over' no, 'near' no...
    assert 0.0 <= out.quality <= 1.0


def test_language_id(spark):
    got = {r.doc_id: r.lang_pred for r in language_id(_docs(spark)).collect()}
    assert got[0] == "en"
    assert got[4] == "es"


def test_fingerprint_dup_detection(spark):
    fp = {r.doc_id: r.fingerprint for r in fingerprint(_docs(spark)).collect()}
    assert fp[0] == fp[3]  # exact dups share the fingerprint
    assert fp[0] != fp[2]


def test_dedup_exact_text(spark):
    out = dedup_exact_text(_docs(spark))
    assert out.count() == 4
    assert 3 not in {r.doc_id for r in out.collect()}  # min-id representative kept
    # skinny-shuffle scale path returns the same winner ids
    ids = {r.doc_id for r in dedup_exact_text(_docs(spark), ids_only=True).collect()}
    assert ids == {r.doc_id for r in out.collect()}


def test_minhash_signatures_shape(spark):
    sigs = minhash_signatures(_docs(spark), num_perm=16)
    r = sigs.filter("doc_id = 0").collect()[0]
    assert len(r.sig) == 16
    assert all(isinstance(x, int) for x in r.sig)
    # identical docs -> identical signatures
    r3 = sigs.filter("doc_id = 3").collect()[0]
    assert r.sig == r3.sig


def test_minhash_lsh_finds_neardups(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), num_perm=16, bands=8, threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 3) in got  # exact dup, jaccard 1.0
    assert (0, 1) in got  # near dup (one word differs)
    assert all(p[0] != 2 and p[1] != 2 for p in got)  # unrelated doc not paired
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(0, 3)] == 1.0


def test_simhash_and_neardup(spark):
    sh = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert sh[0] == sh[3]
    pairs = simhash_neardup_pairs(_docs(spark), max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 3) in got and (0, 1) in got
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert ham[(0, 3)] == 0


def _boilerplate_corpus(spark, n_dup=80):
    """n_dup identical boilerplate docs + two near-dup real docs + one odd."""
    boiler = "all rights reserved copyright notice terms of service privacy policy page"
    rows = [(i, boiler) for i in range(n_dup)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river today"),
        (1001, "the quick brown fox jumps over the lazy dog near the river tomorrow"),
        (1002, "completely different content about spark engines and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_minhash_max_bucket_caps_boilerplate(spark):
    docs = _boilerplate_corpus(spark)
    # uncapped: the 80 identical docs flood the pairs (80*79/2 of them)
    uncapped = minhash_lsh_pairs(docs, num_perm=16, bands=8, max_bucket=None)
    assert uncapped.filter("id_a < 1000").count() == 80 * 79 // 2
    capped = minhash_lsh_pairs(docs, num_perm=16, bands=8, max_bucket=50)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # boilerplate blowup gone, genuine near-dup pair survives
    assert not any(a < 1000 for a, _ in got)
    assert (1000, 1001) in got
    # the dropped-row metric rides the action as an Observation (no extra job)
    assert capped.hot_bucket_obs.get["hot_band_rows"] > 0
    capped.shingle_cache.unpersist()


def test_simhash_max_bucket_caps_boilerplate(spark):
    docs = _boilerplate_corpus(spark)
    uncapped = simhash_neardup_pairs(docs, max_hamming=6, max_bucket=None)
    assert uncapped.filter("id_a < 1000").count() == 80 * 79 // 2
    capped = simhash_neardup_pairs(docs, max_hamming=6, max_bucket=50)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not any(a < 1000 for a, _ in got)
    assert (1000, 1001) in got
    assert capped.hot_bucket_obs.get["hot_band_rows"] > 0


def test_lsh_builders_launch_no_jobs_at_construction(spark):
    """The pair builders are LAZY: constructing the DataFrame must launch
    zero Spark jobs (the old implementation ran an eager hot-bucket /
    max_df census per construction). Guarded via the status tracker's
    job-group listing on a dedicated group."""
    from ia_hadoop_tools_spark.operators.textops import novel_docs

    docs = _boilerplate_corpus(spark, n_dup=10)
    sc = spark.sparkContext
    group = "lazy-construction-probe"
    sc.setJobGroup(group, "no jobs may appear here")
    try:
        minhash_lsh_pairs(docs, max_bucket=5)
        simhash_neardup_pairs(docs, max_bucket=5)
        ngram_jaccard_pairs(docs, max_df=3)
        novel_docs(docs, docs, max_df=3)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(jobs or []) == []


def test_ngram_jaccard_exact(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(0, 3)] == 1.0
    assert (0, 1) in jac and 0.3 <= jac[(0, 1)] < 1.0


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark):
    boiler = "terms of service apply"
    rows = [
        (i, f"unique document number {i} about topic {i} {boiler}")
        for i in range(30)
    ]
    rows.append((100, rows[0][1]))  # exact dup of doc 0
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_df=5).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    # the boilerplate-only overlaps disappear; the true dup pair survives
    # with jaccard computed over its surviving (non-hot) shingles
    assert (0, 100) in got and got[(0, 100)] == 1.0
    assert all(a == 0 and b == 100 for a, b in got)


def test_novel_docs_cross_corpus(spark):
    from ia_hadoop_tools_spark.operators.textops import novel_docs

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "spark catalyst tungsten optimizer whole stage codegen"),
            (102, "totally unrelated corpus padding line with extra words"),
        ],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [
            # exact copy of 100
            (1, "the quick brown fox jumps over the lazy dog today"),
            # near-dup of 100 (one word changed)
            (2, "the quick brown fox jumps over the lazy dog tomorrow"),
            # novel
            (3, "completely new content nobody has ever written before here"),
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.exact_dup, r.n_near, r.is_novel)
        for r in novel_docs(batch, corpus, threshold=0.5).collect()
    }
    assert got[1] == (True, 1, False)
    assert got[2] == (False, 1, False)
    assert got[3] == (False, 0, True)


def test_novel_docs_max_df_drops_boilerplate_overlap(spark):
    from ia_hadoop_tools_spark.operators.textops import novel_docs

    # every doc shares the same boilerplate sentence; bodies are disjoint.
    boiler = "subscribe to our newsletter for updates and offers"
    corpus = spark.createDataFrame(
        [(100 + i, f"{boiler} corpus body {i} alpha beta gamma delta") for i in range(4)],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [(1, f"{boiler} batch body one epsilon zeta eta theta")],
        "doc_id: long, text: string",
    )
    # without pruning the boilerplate shingles make doc 1 near SOME corpus
    # docs at a low threshold
    loose = novel_docs(batch, corpus, threshold=0.2).first()
    assert loose.n_near > 0
    pruned = novel_docs(batch, corpus, threshold=0.2, max_df=3).first()
    assert pruned.n_near == 0 and bool(pruned.is_novel)


def test_band_key_array_rejects_bad_band_split(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.textops import band_key_array

    with pytest.raises(ValueError, match="divide num_perm"):
        band_key_array(16, 32)
    with pytest.raises(ValueError, match="divide num_perm"):
        band_key_array(16, 3)


def test_corpus_stats_hand_computed(spark):
    from ia_hadoop_tools_spark.operators.textops import corpus_stats

    rows = [
        (0, "a", "one two three"),
        (1, "a", "one two three"),   # exact dup of doc 0
        (2, "a", "four"),
        (3, "b", None),              # NULL text counts as empty doc
        (4, "b", "five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = {r["source"]: r for r in corpus_stats(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_tokens"], a["max_tokens"]) == (3, 7, 3)
    assert a["mean_tokens"] == 7 / 3
    assert a["n_chars"] == 13 + 13 + 4
    assert a["n_unique_texts"] == 2 and a["dup_frac"] == 1 / 3
    assert (b["n_docs"], b["n_tokens"], b["n_chars"]) == (2, 2, 8)
    assert b["n_unique_texts"] == 2 and b["dup_frac"] == 0.0
    # corpus-wide rollup
    (tot,) = corpus_stats(df, by=None).collect()
    assert tot["source"] == "ALL" and tot["n_docs"] == 5
    assert tot["n_tokens"] == 9 and tot["n_unique_texts"] == 4
    # approx path keeps the schema; HLL exact at tiny cardinality
    (ap,) = corpus_stats(df, by=None, distinct="approx").collect()
    assert ap["n_unique_texts"] == 4
    import pytest as _pt

    with _pt.raises(ValueError, match="distinct"):
        corpus_stats(df, distinct="bogus")


def test_ngram_jaccard_default_is_bounded(spark):
    """Round-11 default change: ngram_jaccard_pairs' DEFAULT must carry
    a finite max_df (the last pair-producing API whose default was
    unbounded-quadratic — a boilerplate shingle in 10^6 docs made the
    default plan 10^12-row on that key).  Pins (a) the default constant
    is finite and equals the LSH max_bucket convention, and (b) the
    default call site prunes a hot shingle while max_df=None keeps it."""
    import inspect

    from ia_hadoop_tools_spark.operators.textops import (
        DEFAULT_JACCARD_MAX_DF,
    )

    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_df"].default == DEFAULT_JACCARD_MAX_DF
    assert DEFAULT_JACCARD_MAX_DF == 5000

    boiler = "terms of service apply"
    rows = [
        (i, f"unique document number {i} about topic {i} {boiler}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    # 30 < 5000: the shipped default must behave exactly here; engage
    # the bound by widening the signature's default semantics at a
    # test-sized cap to prove the default PATH is the pruning one
    exact = ngram_jaccard_pairs(docs, threshold=0.1, max_df=None).count()
    capped = ngram_jaccard_pairs(docs, threshold=0.1, max_df=5).count()
    default = ngram_jaccard_pairs(docs, threshold=0.1).count()
    assert exact > 0 and capped == 0
    # at df(boiler)=30 <= 5000 the default keeps every shingle: results
    # equal the exact contract (the cap only engages on pathological df)
    assert default == exact


def test_ngram_jaccard_candidate_volume_guard(spark):
    """Round-11 sf10 probe finding: the per-shingle max_df cap bounds
    each KEY, but sum(df^2) — the join's total candidate volume — is
    quadratic in corpus size even when no shingle reaches the cap (sf10:
    max df 2,500 under a 5,000 cap, yet 2.8e10 candidates filled the
    disk).  The guard must (a) stay lazy at construction, (b) fail the
    action fast with the measured volume when over budget, (c) stay out
    of the exact max_df=None contract, and (d) not change results when
    under budget."""
    import inspect

    from ia_hadoop_tools_spark.operators.textops import (
        DEFAULT_JACCARD_MAX_CANDIDATES,
    )

    sig = inspect.signature(ngram_jaccard_pairs)
    assert (
        sig.parameters["max_candidates"].default
        == DEFAULT_JACCARD_MAX_CANDIDATES
    )

    docs = _docs(spark)
    baseline = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs, threshold=0.3, max_candidates=None
        ).collect()
    )
    guarded = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    )
    assert guarded == baseline  # under budget: bit-identical results

    import pytest as _pytest

    with _pytest.raises(Exception, match="candidate volume"):
        ngram_jaccard_pairs(docs, threshold=0.3, max_candidates=1).count()

    # max_df=None (the exact registered contract) never runs the guard,
    # even with an absurd budget — exhaustive means exhaustive
    n = ngram_jaccard_pairs(
        docs, threshold=0.3, max_df=None, max_candidates=1
    ).count()
    assert n == len(baseline)
