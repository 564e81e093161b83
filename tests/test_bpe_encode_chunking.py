"""bpe_encode / bpe_token_counts / chunk_documents / tfidf_topk /
hll_distinct_bound unit + differential tests.

The encoder differential reference is a direct transcription of the
standard BPE apply rule (for each merge in training order: scan the
symbol list left-to-right, merging non-overlapping adjacent (a, b)),
independent of the engine's wrapped-string replace-fold.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.bpe import (
    WORD_SPLIT,
    bpe_encode,
    bpe_token_counts,
    bpe_train,
)
from ia_hadoop_tools_spark.operators.chunking import chunk_documents


def ref_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    toks: list[str] = []
    for w in re.split("[ \t\n\f\r]+", text):
        if w:
            toks.extend(ref_encode_word(w, merges))
    return toks


ADVERSARIAL = [
    # consecutive non-overlapping pairs: both must merge (a naive
    # single-separator state misses the second — shared boundary)
    ("abab", [("a", "b")], None),
    # left-suffix trap: after (x,a) mints 'xa', (a,b) must NOT bind the
    # 'a' inside 'xa' (a naive state matches the suffix)
    ("xab", [("x", "a"), ("a", "b")], ["xa", "b"]),
    # right-prefix trap: 'ab' exists as one symbol; (x,a) must not bind
    # the 'a' inside 'ab'
    ("xab", [("a", "b"), ("x", "a")], ["x", "ab"]),
    # overlapping triple: left-to-right gives ['aa', 'a']
    ("aaa", [("a", "a")], ["aa", "a"]),
    # then (aa,a) can take the remainder
    ("aaa", [("a", "a"), ("aa", "a")], ["aaa"]),
    # merge chains across earlier merges
    ("thethe", [("t", "h"), ("th", "e")], ["the", "the"]),
    # symbols containing regex metacharacters must be treated literally
    ("a.b.c", [(".", "b")], ["a", ".b", ".", "c"]),
    ("x+*x", [("+", "*")], ["x", "+*", "x"]),
]


@pytest.mark.parametrize("word,merges,expected", ADVERSARIAL)
def test_encode_word_adversarial(spark, word, merges, expected):
    ref = ref_encode_word(word, merges)
    if expected is not None:
        assert ref == expected
    got = (
        bpe_encode(spark.createDataFrame([(word,)], ["text"]), merges)
        .select("tokens")
        .first()[0]
    )
    assert got == ref


def test_encode_differential_random(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    docs = [
        (i, " ".join(rng.sample(words, rng.randint(1, 8)))) for i in range(30)
    ]
    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("c", "d"), ("a", "a"), ("aa", "aa")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: r.tokens
        for r in bpe_encode(df, merges).select("doc_id", "tokens").collect()
    }
    for i, text in docs:
        assert got[i] == ref_encode_text(text, merges), (i, text)


def test_encode_unicode_line_terminators(spark):
    # U+2028/U+2029/U+0085 survive WORD_SPLIT (explicit ASCII class) and
    # so occur INSIDE words; Java '.' without DOTALL skips them, which
    # used to leave unwrapped chars corrupting tokens and breaking the
    # DuckDB-oracle parity (review finding) — (?s) pins the fix
    word = "a\u2028b\u2029c\u0085d"
    df = spark.createDataFrame([(word,)], ["text"])
    got = bpe_encode(df, []).select("tokens").first()[0]
    assert got == list(word)
    # and counts agree with the reference under a merge that must NOT
    # bind across the terminator chars
    got2 = (
        bpe_encode(df, [("a", "b")]).select("tokens").first()[0]
    )
    assert got2 == ref_encode_word(word, [("a", "b")])


def test_encode_empty_merges_and_separator_strip(spark):
    df = spark.createDataFrame([("ab\x1ecd\x1fef gh",)], ["text"])
    got = bpe_encode(df, []).select("tokens").first()[0]
    # markers stripped from input, then per-char symbols
    assert got == list("abcdef") + list("gh")


def test_token_counts_match_encode(spark):
    docs = [
        (1, "the thin thread threads the thing"),
        (2, "and and and banana band"),
        (3, "   "),  # whitespace-only: no output row
        (4, "solo"),
    ]
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_token_counts(df, merges).collect()
    }
    assert 3 not in rows
    for i, text in docs:
        toks = ref_encode_text(text, merges)
        words = [w for w in re.split("[ \t\n\f\r]+", text) if w]
        if not words:
            continue
        assert rows[i] == (len(words), len(toks)), i


def test_train_then_encode_composition(spark):
    corpus = [("low lower lowest low low newer newest new",)] * 3
    df = spark.createDataFrame(corpus, ["text"])
    merges = [(a, b) for a, b, _ in bpe_train(df, num_merges=6)]
    got = bpe_encode(df, merges).select("tokens").first()[0]
    assert got == ref_encode_text(corpus[0][0], merges)


# --------------------------------------------------------------------------
# chunking


def test_chunk_documents_shapes(spark):
    text70 = " ".join(f"w{i}" for i in range(70))
    df = spark.createDataFrame(
        [(1, text70), (2, "a b c"), (3, ""), (4, "   ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_tokens=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc and 4 not in by_doc
    # doc 1: starts 0,24,48 -> sizes 32,32,22
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.n_tokens for r in d1] == [32, 32, 22]
    assert d1[0].chunk.split(" ")[0] == "w0"
    assert d1[1].chunk.split(" ")[0] == "w24"
    assert d1[2].chunk.split(" ")[-1] == "w69"
    # overlap: token w24..w31 appear in both chunk 0 and 1
    assert "w30" in d1[0].chunk.split(" ") and "w30" in d1[1].chunk.split(" ")
    # doc 2 shorter than one chunk: exactly one chunk, all tokens
    d2 = by_doc[2]
    assert len(d2) == 1 and d2[0].n_tokens == 3 and d2[0].chunk == "a b c"
    # every token covered exactly ceil positions: reconstruct doc1 from
    # disjoint stride prefixes
    recon = []
    for r in d1:
        recon.extend(r.chunk.split(" ")[: 24 if r.chunk_id < 2 else 32])
    assert recon == text70.split(" ")


def test_chunk_documents_disjoint_default(spark):
    df = spark.createDataFrame([(1, " ".join("abcdefgh"))], ["doc_id", "text"])
    out = sorted(
        chunk_documents(df, chunk_tokens=3).collect(), key=lambda r: r.chunk_id
    )
    assert [r.chunk for r in out] == ["a b c", "d e f", "g h"]


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=0)


# --------------------------------------------------------------------------
# tfidf_topk


def test_tfidf_topk_ranks_and_stopword_cut(spark):
    from ia_hadoop_tools_spark.operators.search import tfidf_topk

    docs = [
        (1, "apple apple apple common common"),
        (2, "banana banana common cherry"),
        (3, "cherry common date"),
        (4, "date common egg egg"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = tfidf_topk(df, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # 'common' appears in 4/4 docs > 0.5 ratio -> suppressed everywhere
    assert all(r.token != "common" for r in rows.values())
    # doc 1 top term is apple (tf=3, df=1): score = 3*1e6 // 2
    r11 = rows[(1, 1)]
    assert r11.token == "apple" and r11.score == 1_500_000
    # deterministic tie-break: doc 3 terms cherry(df=2) date(df=2) tf=1
    assert rows[(3, 1)].token == "cherry" and rows[(3, 2)].token == "date"


# --------------------------------------------------------------------------
# hll_distinct_bound


def test_hll_distinct_bound_holds_and_filters_null(spark):
    from ia_hadoop_tools_spark.operators.sketches import hll_distinct_bound

    rows = [("a", i % 97) for i in range(2000)] + [("b", None)] + [
        ("c", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = hll_distinct_bound(df, ["g"], F.col("v"), rsd=0.05).collect()
    got = {r.g: r.within_bound for r in out}
    # group b has only a NULL value -> no row at all
    assert set(got) == {"a", "c"}
    assert all(got.values())


# --------------------------------------------------------------------------
# streaming compatibility: chunking and encoding are pure narrow plans,
# so they must run unchanged inside the incremental ingest path


def test_chunk_and_encode_streaming_parity(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(1 + i % 9))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    df.write.parquet(src)

    merges = [("t", "h")]
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        bpe_encode(chunk_documents(stream, chunk_tokens=4, stride=3),
                   merges, text_col="chunk", out_col="toks")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = bpe_encode(
        chunk_documents(df, chunk_tokens=4, stride=3),
        merges, text_col="chunk", out_col="toks",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, tuple(r.toks))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.chunk_id): (r.n_tokens, tuple(r.toks))
        for r in batch.collect()
    }
    assert got == want and len(want) > 40


def test_encode_rejects_reserved_marker_symbols(spark):
    """Caller-supplied merge tables are validated against the reserved
    U+001E/U+001F boundary markers (input TEXT is sanitized, but a
    hand-edited --merges TSV could smuggle a marker into a symbol and
    silently corrupt the wrapped fold state — round-7 advisory fix)."""
    import pytest as _pytest

    from ia_hadoop_tools_spark.operators.bpe import bpe_encode, bpe_token_counts

    df = spark.createDataFrame([(1, "ab")], "doc_id: long, text: string")
    for bad in [("a", "\x1eb"), ("a\x1f", "b"), ("", "b"), ("a", "")]:
        with _pytest.raises(ValueError):
            bpe_encode(df, [bad])
        with _pytest.raises(ValueError):
            bpe_token_counts(df, [bad])
