"""Benchmark decontamination tests (operators/decontam.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.decontam import (
    contamination_stats,
    decontaminate,
)


def _dfs(spark):
    corpus = spark.createDataFrame(
        [
            # contains the benchmark q1 8-gram verbatim
            (1, "prefix words here what is the capital of france answer paris"),
            # shares only a 5-gram -> clean at n=8
            (2, "what is the capital of spain is a different question"),
            (3, "completely unrelated text about spark partitions and shuffles ok"),
            # too short for any 8-gram window
            (4, "tiny doc"),
            # contains windows from BOTH benchmark docs
            (
                5,
                "what is the capital of france answer paris and also "
                "compute two plus two equals four exactly now",
            ),
        ],
        "doc_id: long, text: string",
    )
    benchmark = spark.createDataFrame(
        [
            (100, "what is the capital of france answer paris"),
            (101, "compute two plus two equals four exactly now"),
        ],
        "doc_id: long, text: string",
    )
    return corpus, benchmark


def test_contamination_stats(spark):
    corpus, bench = _dfs(spark)
    got = {
        r.doc_id: (r.overlap_ngrams, r.contaminated)
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # every corpus doc gets a row
    assert got[1][1] and got[1][0] >= 1
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5][1] and got[5][0] > got[1][0]  # overlaps both bench docs


def test_decontaminate_strict_and_thresholded(spark):
    corpus, bench = _dfs(spark)
    strict = sorted(
        r.doc_id for r in decontaminate(corpus, bench, n=8).collect()
    )
    assert strict == [2, 3, 4]
    # high threshold keeps the single-window doc, drops the multi-hit one
    n1 = {
        r.doc_id: r.overlap_ngrams
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    thresh = n1[1] + 1
    lax = sorted(
        r.doc_id
        for r in decontaminate(corpus, bench, n=8, min_overlap=thresh).collect()
    )
    assert 1 in lax and 5 not in lax


def test_distinct_windows_counted_once(spark):
    corpus = spark.createDataFrame(
        [(1, " ".join(["a b c d e f g h"] * 3))],  # window repeats in doc
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id: long, text: string"
    )
    got = contamination_stats(corpus, bench, n=8).collect()[0]
    # repeated occurrences of the same window count once (distinct windows)
    assert got.overlap_ngrams < 24


def test_decontaminate_rejects_min_overlap_zero(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_overlap"):
        decontaminate(docs, docs, min_overlap=0)


def test_contamination_matching_is_case_insensitive(spark):
    from ia_hadoop_tools_spark.operators.decontam import contamination_stats

    corpus = spark.createDataFrame(
        [(1, "The Quick Brown Fox Jumps Over Lazy Dogs")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox jumps over lazy dogs")],
        "doc_id long, text string",
    )
    row = contamination_stats(corpus, bench, n=8).collect()[0]
    assert row["contaminated"] is True


def test_short_benchmark_docs_are_matched(spark):
    """Review repro: a benchmark doc shorter than n tokens contributed
    ZERO windows, so corpus docs quoting it verbatim passed as clean.
    Short bench docs now match via their whole-doc window."""
    corpus = spark.createDataFrame(
        [
            (1, "filler words then the capital of france is paris end stuff"),
            (2, "completely unrelated text about spark partitions today"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris")],  # 6 tokens < n=8
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert got == {1: True, 2: False}
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=8).collect()}
    assert kept == {2}


def test_short_lengths_do_not_degrade_long_bench_docs(spark):
    """Advisor repro (round 5): with a mixed short+long benchmark, the
    short doc's length used to window EVERY bench doc, so a corpus doc
    sharing only a 2-gram with a LONG bench doc was flagged. Extra-length
    windows must be whole-doc-only on the bench side."""
    corpus = spark.createDataFrame(
        [
            # shares only the 2-gram "capital of" with the LONG bench doc
            (1, "the capital of norway has fjords and completely other words"),
            # quotes the SHORT bench doc verbatim -> contaminated
            (2, "filler filler yes no filler trailing words here too"),
            # quotes the LONG bench doc's full 10-gram -> contaminated
            (
                3,
                "prefix what is the capital of france the answer is paris "
                "suffix",
            ),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [
            (100, "what is the capital of france the answer is paris"),  # 10
            (101, "yes no"),  # 2 tokens — whole-doc window only
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert got == {1: False, 2: True, 3: True}


def test_short_length_cap_warns_and_truncates(spark, monkeypatch):
    """Past the cap, only the LARGEST short lengths are matched and a
    warning names the dropped range."""
    import warnings

    from ia_hadoop_tools_spark.operators import decontam as mod

    monkeypatch.setattr(mod, "_MAX_SHORT_LENGTHS", 2)
    corpus = spark.createDataFrame(
        [
            (1, "alpha"),  # quotes the 1-token bench doc (dropped length)
            (2, "carol dave eve frank"),  # quotes the 4-token bench doc
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha"),
            (101, "bob carol"),
            (102, "dave eve frank"),
            (103, "carol dave eve frank"),
        ],
        "doc_id: long, text: string",
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {
            r.doc_id: r.contaminated
            for r in contamination_stats(corpus, bench, n=8).collect()
        }
    # lengths {1,2,3,4} capped to the largest two {3,4}: the 1-token
    # bench doc is no longer checked, the 4-token one still is
    assert got == {1: False, 2: True}
    assert any("dropping lengths 1..2" in str(w.message) for w in caught)


def test_fuzzy_contamination_catches_paraphrase_missed_by_exact(spark):
    """The MinHash path must flag a lightly edited benchmark quote that
    the exact large-n window path misses entirely, must NOT flag
    unrelated docs, and the decontaminate_fuzzy twin must drop exactly
    the flagged ids."""
    from ia_hadoop_tools_spark.operators.decontam import (
        decontaminate_fuzzy,
        fuzzy_contamination,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while the sun sets slowly behind the tall green hills tonight"
    )
    corpus = spark.createDataFrame(
        [
            # one word changed mid-sentence (position 12 of 24): the
            # longest unedited run is 12 tokens, so NO 13-token window
            # survives — but nearly every 3-shingle does
            (1, base.replace("river", "creek")),
            (2, "completely unrelated text about spark catalyst plans "
                "and adaptive query execution engines at scale"),
            (3, base),  # verbatim copy
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, base)], "bench_id: long, text: string"
    )

    from ia_hadoop_tools_spark.operators.decontam import contamination_stats

    exact = {
        r.doc_id: r.contaminated
        for r in contamination_stats(corpus, bench, n=13).collect()
    }
    assert exact == {1: False, 2: False, 3: True}  # exact misses the edit

    pairs = fuzzy_contamination(corpus, bench, threshold=0.5).collect()
    got = {(r.doc_id, r.bench_id): r.jaccard for r in pairs}
    assert (3, 100) in got and got[(3, 100)] == 1.0
    assert (1, 100) in got and 0.5 <= got[(1, 100)] < 1.0
    assert all(d != 2 for d, _ in got)

    clean = {r.doc_id for r in decontaminate_fuzzy(corpus, bench).collect()}
    assert clean == {2}
