"""Feature-hash embeddings (operators/embed.py) and CCNet dedup
normalization (functions/textfns.normalize_text): unit semantics,
partitioning invariance, and composition with the embedding family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.embed import hash_embed


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_embedding_is_unit_norm_and_deterministic(spark):
    docs = _docs(spark, ["alpha beta gamma", "alpha beta gamma", "delta"])
    rows = {r["doc_id"]: r for r in hash_embed(docs, dim=16).collect()}
    assert len(rows) == 3
    # identical texts -> identical vectors
    assert rows[0]["embedding"] == rows[1]["embedding"]
    for r in rows.values():
        nrm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert r["n_tokens"] > 0
        assert len(r["embedding"]) == 16
        assert abs(nrm - 1.0) < 1e-12


def test_empty_and_null_text_get_zero_vector(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in hash_embed(docs, dim=8).collect()}
    for i in (1, 2, 3):
        assert rows[i]["embedding"] == [0.0] * 8
        assert rows[i]["n_tokens"] == 0


def test_cosine_reflects_token_overlap(spark):
    docs = _docs(
        spark,
        [
            "spark scan merge batch table",
            "spark scan merge batch value",   # 4/5 shared
            "zz1 zz2 zz3 zz4 zz5",            # disjoint
        ],
    )
    rows = {r["doc_id"]: r["embedding"] for r in hash_embed(docs, dim=64).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(rows[0], rows[1]) > 0.5
    assert cos(rows[0], rows[1]) > cos(rows[0], rows[2])


def test_invariant_under_partitioning(spark):
    docs = _docs(spark, [f"word{i} common shared {i % 3}" for i in range(50)])
    a = sorted(map(tuple, hash_embed(docs, dim=16).collect()))
    b = sorted(map(tuple, hash_embed(docs.repartition(13), dim=16).collect()))
    assert a == b


def test_composes_with_ann_topk(spark):
    """The point of hash_embed: text-only corpora feed the embedding
    family directly."""
    from ia_hadoop_tools_spark.operators.similarity import ann_bruteforce_topk

    docs = _docs(
        spark,
        ["the quick brown fox", "the quick brown foxes", "unrelated words here",
         "another document entirely", "the quick brown fox"],
    )
    emb = hash_embed(docs, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    q = emb.filter(F.col("vec_id") == 0)
    top = ann_bruteforce_topk(emb, q, k=1).collect()
    assert len(top) == 1
    # the exact duplicate (doc 4) is the nearest neighbor at cosine 1.0
    assert top[0]["neighbor_id"] == 4
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_dim_validation(spark):
    with pytest.raises(ValueError, match="dim"):
        hash_embed(_docs(spark, ["x"]), dim=0)


# ------------------------------------------------------ normalize_text


def test_normalize_text_rules(spark):
    from ia_hadoop_tools_spark.operators.textops import normalize_corpus

    docs = spark.createDataFrame(
        [
            (1, "Hello,  WORLD!  123"),
            (2, "tabs\there\nnewlines\fand\rcontrol\x01chars"),
            (3, None),
            (4, "  edge  "),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_corpus(docs, digits=True, punct=True).collect()
    }
    assert got[1] == "hello world 000"
    assert got[2] == "tabs here newlines and controlchars"
    assert got[3] is None
    assert got[4] == "edge"
    # digits kept when digits=False; punctuation kept when punct=False
    keep = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_corpus(docs, digits=False, punct=False).collect()
    }
    assert keep[1] == "hello, world! 123"


def test_normalize_collapses_trivial_variants_for_dedup(spark):
    """The purpose: case/digit/spacing variants dedup into ONE group
    after normalization, none before."""
    from ia_hadoop_tools_spark.operators.textops import (
        dedup_exact_text,
        normalize_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "Order 123 shipped"),
            (2, "order   456 SHIPPED"),
            (3, "order 9 shipped"),
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    assert dedup_exact_text(docs).count() == 4
    norm = normalize_corpus(docs).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    kept = dedup_exact_text(norm).collect()
    # 1 and 2 collapse ("order 000 shipped" — CCNet's PER-DIGIT zero
    # rule keeps digit-run length, so "order 0 shipped" stays distinct)
    assert len(kept) == 3
    assert {r["doc_id"] for r in kept} == {1, 3, 4}  # min-id reps
