"""Pins for corpus keyword search (operators/search.py)."""

from __future__ import annotations

import math

import pytest

from ia_hadoop_tools_spark.operators.search import (
    bm25_topk,
    build_postings,
    tokenize,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join spark window"),
        (1, "join the window; JOIN the Spark!"),
        (2, "nothing relevant here"),
        (3, "window window window window window window window window"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_tokenize_and_postings(docs):
    toks = {(r.doc_id, r.token) for r in tokenize(docs).collect()}
    assert (1, "join") in toks and (1, "spark") in toks  # case folded
    assert not any(d == 4 for d, _ in toks)  # empty text -> no tokens
    postings, doclens = build_postings(docs)
    p = {(r.token, r.doc_id): r.tf for r in postings.collect()}
    assert p[("spark", 0)] == 2 and p[("join", 1)] == 2
    dl = {r.doc_id: r.doclen for r in doclens.collect()}
    assert dl[0] == 4 and dl[3] == 8 and 4 not in dl


def test_bm25_ranking_matches_reference_formula(docs):
    out = bm25_topk(docs, ["spark", "join"], k=10).collect()
    got = {r.doc_id: r.bm25 for r in out}
    # doc 2 (no query terms) and 4 (empty) never appear
    assert set(got) == {0, 1}
    # hand-computed BM25 (k1=1.2, b=0.75, N=4 non-empty docs, avgdl=21/4)
    n, avgdl = 4, 21 / 4

    def score(tf_by_term, dl):
        s = 0.0
        for t, tf in tf_by_term.items():
            df = {"spark": 2, "join": 2}[t]
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        return round(s, 6)

    assert got[0] == pytest.approx(score({"spark": 2, "join": 1}, 4), abs=1e-6)
    assert got[1] == pytest.approx(score({"spark": 1, "join": 2}, 6), abs=1e-6)
    # ranking is deterministic: score desc then doc_id asc
    assert [r.doc_id for r in out] == sorted(
        got, key=lambda d: (-got[d], d)
    )


def test_bm25_plan_bounded_topk(docs):
    plan = (
        bm25_topk(docs, ["spark"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan  # dfreq + stats broadcast


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_standing_index_path_matches_inline(spark, sf_dir):
    """The postings/doclens standing-index path must score identically to
    the inline corpus path, without re-tokenizing (no explode in plan)."""
    import pytest

    from ia_hadoop_tools_spark.operators.search import (
        bm25_topk,
        build_postings,
    )
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(200)
    terms = ["spark batch", "sort"]
    inline = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
    postings, doclens = build_postings(docs)
    # persist the index as a real standing table (parquet roundtrip) so
    # the query plan below provably reads tables, not the tokenizer
    import tempfile

    tdir = tempfile.mkdtemp(prefix="bm25idx-")
    postings.write.mode("overwrite").parquet(f"{tdir}/postings")
    doclens.write.mode("overwrite").parquet(f"{tdir}/doclens")
    postings = spark.read.parquet(f"{tdir}/postings")
    doclens = spark.read.parquet(f"{tdir}/doclens")
    standing_df = bm25_topk(
        None, terms, k=10, postings=postings, doclens=doclens
    )
    standing = [tuple(r) for r in standing_df.collect()]
    assert standing == inline
    plan = standing_df._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" not in plan.lower() or "Generate" not in plan

    with pytest.raises(ValueError, match="BOTH postings"):
        bm25_topk(docs, terms, postings=postings)
    with pytest.raises(ValueError, match="corpus df"):
        bm25_topk(None, terms)
