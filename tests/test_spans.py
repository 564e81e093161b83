"""Exact substring span dedup tests (operators/spans.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.spans import span_dedup, span_dedup_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_span_stats_cross_doc_duplicate(spark):
    # docs 1/2 share the 3-gram "a b c"; doc 3 is clean
    df = _docs(
        spark,
        [
            (1, "a b c x y"),
            (2, "p q a b c"),
            (3, "u v w z k"),
        ],
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_ngrams, r.covered_tokens, r.coverage)
        for r in span_dedup_stats(df, n=3).collect()
    }
    assert got == {
        1: (5, 1, 3, 0.6),
        2: (5, 1, 3, 0.6),
        3: (5, 0, 0, 0.0),
    }


def test_span_dedup_rewrite_and_full_coverage(spark):
    # doc 2 is an exact copy of doc 1 -> every window duplicated, both
    # rewritten to ''; doc 3 keeps only tokens outside the shared span
    df = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "a b c d"),
            (3, "zz a b c qq"),
        ],
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
        for r in span_dedup(df, n=3).collect()
    }
    # doc 3's windows ("zz a b", "a b c", "b c qq") — only "a b c" repeats
    assert got == {
        1: ("", 4, 4),
        2: ("", 4, 4),
        3: ("zz qq", 5, 3),
    }


def test_span_within_doc_repeat_counts(spark):
    # the duplicate occurrences are WITHIN one doc — corpus-level count
    # semantics still flag them (Lee et al. count occurrences, not docs)
    df = _docs(spark, [(1, "a b c x a b c"), (2, "m n o p q")])
    got = {
        r.doc_id: (r.dup_ngrams, r.covered_tokens)
        for r in span_dedup_stats(df, n=3).collect()
    }
    assert got[1] == (2, 6)  # both "a b c" windows; x survives
    assert got[2] == (0, 0)


def test_span_min_count_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "a b")])
    # min_count=3: two occurrences are no longer "duplicated"
    got = {
        r.doc_id: r.covered_tokens
        for r in span_dedup_stats(df, n=3, min_count=3).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0}
    # doc 3 is shorter than n: zero windows, still present with full text
    rw = {
        r.doc_id: (r.clean_text, r.removed_tokens)
        for r in span_dedup(df, n=3).collect()
    }
    assert rw[3] == ("a b", 0)
    assert rw[1] == ("", 3) and rw[2] == ("", 3)


def test_span_hash_and_string_paths_agree(spark):
    df = _docs(
        spark,
        [(i, f"w{i} shared phrase tokens here w{i + 1} tail") for i in range(6)],
    )
    a = sorted(map(tuple, span_dedup_stats(df, n=4, use_hash=True).collect()))
    b = sorted(map(tuple, span_dedup_stats(df, n=4, use_hash=False).collect()))
    assert a == b


def test_span_dedup_heavy_branch_equals_light(spark):
    """A fully-duplicated long doc (>inplace_cov_limit covered positions)
    takes the positions-anti-join branch; forcing the in-place branch with a
    huge limit must give identical output — the hybrid split is purely
    physical. Also pins the partially-covered heavy case (clean prefix kept,
    in original order)."""
    dup_body = " ".join(f"w{i % 97}x{i % 31}" for i in range(400))
    rows = [
        (1, dup_body),
        (2, dup_body),  # exact copy -> 400 covered positions in both
        (3, "unique" + " lead" * 5 + " " + dup_body),  # covered tail only
        (4, "none of these tokens repeat anywhere else at all"),
    ]
    df = _docs(spark, rows)
    heavy = {
        r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
        for r in span_dedup(df, n=8, inplace_cov_limit=16).collect()
    }
    light = {
        r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
        for r in span_dedup(df, n=8, inplace_cov_limit=10**6).collect()
    }
    assert heavy == light
    assert heavy[1] == ("", 400, 400)
    assert heavy[2] == ("", 400, 400)
    # doc 3: the unique prefix survives, ordered; the shared body is gone
    clean3, n3, rem3 = heavy[3]
    assert clean3.startswith("unique lead lead")
    assert rem3 >= 400
    assert heavy[4][2] == 0


def test_span_dedup_preserves_case_and_whitespace_tokens(spark):
    """The rewrite must not lowercase the surviving corpus: matching is
    case-insensitive (window keys fold), kept tokens keep their case."""
    from ia_hadoop_tools_spark.operators.spans import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "The President Said Something Unique Today About Peace"),
            (2, "the president said something unique today about war"),
            (3, "Completely Different Text With No Overlap At All"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, n=6).collect()}
    # docs 1 and 2 share a 6-token window case-insensitively -> covered
    assert out[1]["removed_tokens"] > 0 and out[2]["removed_tokens"] > 0
    # doc 3 untouched, case preserved verbatim
    assert out[3]["clean_text"] == "Completely Different Text With No Overlap At All"
    # surviving tokens of doc 1 keep original case
    assert all(t[0].isupper() for t in out[1]["clean_text"].split())


def test_span_stats_null_text_scores_zero(spark):
    from ia_hadoop_tools_spark.operators.spans import (
        span_dedup,
        span_dedup_stats,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e f g h a b c d e f g h")],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in span_dedup_stats(docs, n=8).collect()}
    assert stats[1]["n_tokens"] == 0 and stats[1]["coverage"] == 0.0
    clean = {r["doc_id"]: r for r in span_dedup(docs, n=8).collect()}
    assert clean[1]["n_tokens"] == 0 and clean[1]["removed_tokens"] == 0


def test_span_ops_expose_release_handles(spark):
    """Loop callers must be able to unpersist the internal caches
    (span_caches = (base, grams)); after releasing, no persisted RDDs
    from the call remain."""
    from tests.test_bloom_bpe import _persistent_ids

    from ia_hadoop_tools_spark.operators.spans import (
        span_dedup,
        span_dedup_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h"), (2, "a b c d e f g h x y")],
        "doc_id long, text string",
    )
    before = _persistent_ids(spark)
    for fn in (span_dedup_stats, span_dedup):
        out = fn(df, n=4)
        out.count()
        assert len(out.span_caches) == 2
        for cached in out.span_caches:
            cached.unpersist(blocking=True)
        assert _persistent_ids(spark) - before == set()
