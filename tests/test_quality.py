"""Quality filtering / line dedup / PII scrub tests (operators/quality.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.quality import (
    dedup_lines,
    quality_filter,
    repetition_stats,
    scrub_pii,
)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),
            (2, "a fresh take on distributed query planning today"),
            (3, ""),
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].n_words == 5
    assert got[1].top_word_fraction == 1.0
    assert got[1].distinct_word_ratio == 0.2
    assert got[1].dup_2gram_fraction == 0.75  # 4 bigrams, 3 dups
    assert got[2].top_word_fraction == 0.125
    assert got[2].dup_2gram_fraction == 0.0
    assert got[3].n_words == 0


def test_quality_filter_verdicts(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam"),
            (2, "a genuinely varied sentence with many distinct useful words here"),
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in quality_filter(df).collect()}
    assert got[2].passes
    assert not got[1].passes
    assert not got[1].ok_top_word  # the reason is auditable


def test_dedup_lines_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "shared header\nunique to one\nshared footer"),
            (2, "shared header\nunique to two\nshared footer"),
            (3, "shared header\nshared footer"),
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.text for r in dedup_lines(df).collect()}
    # doc 1 (lowest id) keeps the shared lines; later docs lose them
    assert got[1] == "shared header\nunique to one\nshared footer"
    assert got[2] == "unique to two"
    assert 3 not in got  # all lines lost -> doc dropped


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b@example.com or call +1 (555) 123-4567 from 10.0.0.1")],
        "doc_id: long, text: string",
    )
    out = scrub_pii(df).collect()[0].text
    assert "example.com" not in out
    assert "555" not in out
    assert "10.0.0.1" not in out
    assert "[REDACTED-EMAIL]" in out and "[REDACTED-PHONE]" in out


def test_dedup_lines_keeps_empty_lines_everywhere(spark):
    from ia_hadoop_tools_spark.operators.quality import dedup_lines

    docs = spark.createDataFrame(
        [(1, "para one\n\nunique tail one"), (2, "para two\n\nunique tail two")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(docs).collect()}
    # the blank separator survives in BOTH docs (exempt from dedup)
    assert out[1] == "para one\n\nunique tail one"
    assert out[2] == "para two\n\nunique tail two"


def test_scrub_pii_ipv4_not_eaten_by_phone_rule(spark):
    from ia_hadoop_tools_spark.operators.quality import scrub_pii

    docs = spark.createDataFrame(
        [(1, "server at 192.168.1.100 or call +1 415-555-0199")],
        "doc_id long, text string",
    )
    text = scrub_pii(docs).collect()[0]["text"]
    assert "[REDACTED-IPV4]" in text
    assert "192.168" not in text
    assert "[REDACTED-PHONE]" in text


def test_ngram_repetition_stats_values(spark):
    """Hand-computed Gopher character fractions: 'a b a b a b' has
    top 2-gram 'a b' x3 (overlapping count) = 9 chars over 11 total;
    dup 2-grams cover ('a b' x3 + 'b a' x2) = 15 chars -> capped 1.0;
    a no-repetition doc scores the single-occurrence top fraction and
    zero dup fraction; docs shorter than n score 0 for that n."""
    from ia_hadoop_tools_spark.operators.quality import (
        ngram_repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "one two three four"),
            (3, "x"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r.doc_id: r
        for r in ngram_repetition_stats(
            docs, top_ns=(2,), dup_ns=(2, 3)
        ).collect()
    }
    assert out[1].top_2gram_char_frac == round(9 / 11, 6)
    assert out[1].dup_2gram_char_frac == 1.0  # 15/11 capped
    # 'a b a' x2 overlapping + 'b a b' x2 = 20 chars -> capped
    assert out[1].dup_3gram_char_frac == 1.0
    # all 2-grams occur once; the longest is "three four" (10 chars)
    assert out[2].top_2gram_char_frac == round(len("three four") / 18, 6)
    assert out[2].dup_2gram_char_frac == 0.0
    assert out[3].top_2gram_char_frac == 0.0
    assert out[3].dup_3gram_char_frac == 0.0
