"""Persistent corpus dedup index (operators/dedup_index.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.dedup_index import (
    CorpusDedupIndex,
    build_corpus_index,
    novel_docs_indexed,
)
from ia_hadoop_tools_spark.operators.textops import novel_docs


def _rows(df):
    return {
        r.doc_id: (r.exact_dup, r.n_near, r.is_novel) for r in df.collect()
    }


def _corpus_and_batch(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = spark.createDataFrame(
        [
            (100, base),
            (101, "completely different corpus content about spark shuffles"),
            (102, "a third corpus document with its own unique wording here"),
        ],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [
            (1, base),  # exact dup of 100 (and near-dup)
            (2, base + " today"),  # near-dup of 100 only
            (3, "entirely novel text that matches nothing in the corpus"),
        ],
        "doc_id: long, text: string",
    )
    return corpus, batch


def test_indexed_matches_inverted_index_path(spark):
    corpus, batch = _corpus_and_batch(spark)
    idx = build_corpus_index(corpus).persist()
    try:
        got = _rows(novel_docs_indexed(batch, idx, threshold=0.5))
        want = _rows(novel_docs(batch, corpus, threshold=0.5))
        assert got == want
        assert got[1] == (True, 1, False)
        assert got[2] == (False, 1, False)
        assert got[3] == (False, 0, True)
    finally:
        idx.unpersist()


def test_index_save_load_roundtrip(spark):
    corpus, batch = _corpus_and_batch(spark)
    with tempfile.TemporaryDirectory() as td:
        build_corpus_index(corpus, num_perm=32, bands=8).save(td)
        idx = CorpusDedupIndex.load(spark, td)
        assert (idx.shingle_words, idx.num_perm, idx.bands) == (3, 32, 8)
        got = _rows(novel_docs_indexed(batch, idx, threshold=0.5))
        assert got[1] == (True, 1, False)
        assert got[3] == (False, 0, True)


def test_batch_probe_reads_index_not_corpus(spark):
    """The point of the index: a saved index answers batches with the corpus
    text GONE — per-batch cost cannot include corpus re-shingling."""
    corpus, batch = _corpus_and_batch(spark)
    with tempfile.TemporaryDirectory() as td:
        build_corpus_index(corpus).save(td)
        idx = CorpusDedupIndex.load(spark, td)
        plan = novel_docs_indexed(batch, idx)._jdf.queryExecution().toString()
        # the probe's scan set is the index parquet + the in-memory batch:
        # no scan of any corpus text relation appears in the plan
        assert "exact" in plan and "buckets" in plan and "shingles" in plan


def test_multiple_batches_reuse_one_index(spark):
    corpus, batch = _corpus_and_batch(spark)
    idx = build_corpus_index(corpus).persist()
    try:
        first = _rows(novel_docs_indexed(batch, idx))
        batch2 = batch.withColumn("doc_id", F.col("doc_id") + 10)
        second = _rows(novel_docs_indexed(batch2, idx))
        assert second == {k + 10: v for k, v in first.items()}
    finally:
        idx.unpersist()


def test_extend_corpus_index_incremental(spark):
    """index ∪ delta answers like an index built from scratch on the union."""
    from ia_hadoop_tools_spark.operators.dedup_index import extend_corpus_index

    corpus, batch = _corpus_and_batch(spark)
    extra = spark.createDataFrame(
        [(200, "entirely novel text that matches nothing in the corpus")],
        "doc_id: long, text: string",
    )
    grown = extend_corpus_index(build_corpus_index(corpus), extra)
    scratch = build_corpus_index(corpus.unionByName(extra))
    got = _rows(novel_docs_indexed(batch, grown, threshold=0.5))
    want = _rows(novel_docs_indexed(batch, scratch, threshold=0.5))
    assert got == want
    # doc 3 was novel against the old corpus; the extension makes it a dup
    assert got[3] == (True, 1, False)


def test_capped_buckets_memoized_per_index(spark, sf_dir):
    """The hot-bucket cap window runs once per index lifetime: repeated
    probes reuse the same persisted capped view."""
    from ia_hadoop_tools_spark.operators.dedup_index import build_corpus_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    idx = build_corpus_index(docs).persist()
    a = idx.capped_buckets(100)
    b = idx.capped_buckets(100)
    assert a is b and a.storageLevel.useMemory
    assert idx.capped_buckets(None) is idx.buckets
    idx.unpersist()
