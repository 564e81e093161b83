"""Rolling corpus dedup stream (streaming/rolling_dedup.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.streaming.rolling_dedup import (
    load_current_index,
    rolling_dedup_stream,
)

SCHEMA = "doc_id long, text string"

BASE = "the quick brown fox jumps over the lazy dog near the river bank"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_rolling_dedup_cycles(spark, tmp_path):
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct docs + one exact dup inside the batch
    _write_batch(
        spark,
        inp,
        [(1, BASE), (2, BASE), (3, "a completely different document body")],
    )
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, SCHEMA
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 3}  # in-batch exact dup dropped (min id kept)
    assert os.path.exists(os.path.join(index_root, "CURRENT"))

    # batch 2: one exact dup of batch 1, one near-dup, one novel
    _write_batch(
        spark,
        inp,
        [
            (10, BASE),
            (11, BASE + " extra"),
            (12, "fresh unseen content that matches nothing prior"),
        ],
    )
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, SCHEMA
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 3, 12}

    # batch 3: dup of a batch-2 novel doc -> the index really grew
    _write_batch(
        spark, inp, [(20, "fresh unseen content that matches nothing prior")]
    )
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, SCHEMA
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 3, 12}

    # the published index answers standalone probes (versioned pointer)
    idx = load_current_index(spark, index_root)
    assert idx.buckets.select("cid").distinct().count() == 3
    with open(os.path.join(index_root, "CURRENT")) as fh:
        # batch 3 had nothing novel -> no publish: v000 (b1) then v001 (b2)
        assert fh.read().strip() == "v001"

    # restart with NO new files: exactly-once file log -> no reprocessing
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, SCHEMA
    )
    q.awaitTermination()
    assert spark.read.parquet(corpus).count() == 3

    # every published version carries the _PUBLISHED commit marker
    for v in ("v000", "v001"):
        assert os.path.exists(os.path.join(index_root, v, "_PUBLISHED"))

    # a crash mid-save leaves an UNMARKED partial dir: readers must skip
    # it (no marker), and the next publish must not reuse its number
    os.makedirs(os.path.join(index_root, "v002", "exact"))
    idx2 = load_current_index(spark, index_root)
    assert idx2.buckets.select("cid").distinct().count() == 3  # still v001
    from ia_hadoop_tools_spark.streaming.rolling_dedup import publish_index

    assert publish_index(idx2, index_root) == "v003"
    idx3 = load_current_index(spark, index_root)
    assert idx3.buckets.select("cid").distinct().count() == 3


def test_rolling_dedup_in_batch_near_dups_and_marker_gate(spark, tmp_path):
    """Two review repros: (1) near-dup pairs arriving in ONE batch must
    not both be ingested (min-id survives, the semdedup keep rule);
    (2) the index-existence gate is the _PUBLISHED marker protocol — a
    deleted CURRENT pointer must NOT reset the dedup corpus; (3) extra
    input columns survive into the corpus."""
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, url string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    # batch 1: a near-dup PAIR inside the batch + one distinct doc
    write(
        [
            (1, BASE, "u1"),
            (2, BASE + " tail", "u2"),  # near-dup of 1, same batch
            (3, "a completely different document body", "u3"),
        ]
    )
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, schema
    )
    q.awaitTermination()
    got = {r.doc_id: r.url for r in spark.read.parquet(corpus).collect()}
    assert set(got) == {1, 3}  # 2 dropped in-batch (near-dup of min id 1)
    assert got[1] == "u1"  # extra columns carried into the corpus

    # kill the ops pointer; the marker-resolved index must still gate
    os.remove(os.path.join(index_root, "CURRENT"))
    write([(10, BASE, "u10"), (11, "genuinely new material here", "u11")])
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, ckpt, schema
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 3, 11}  # 10 still recognized as a dup of 1


def test_fresh_checkpoint_against_published_index_fails_loudly(
    spark, tmp_path
):
    """The stats_stream identity rule, with higher stakes here: a fresh
    checkpoint restarts batch ids at 0, and the idempotent batch_id=N
    overwrite would REPLACE the originally-ingested corpus partition
    while the published index still references those docs.  The sink
    must refuse before anything is written."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")

    _write_batch(spark, inp, [(1, BASE), (2, "another document body here")])
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, str(tmp_path / "ckpt1"), SCHEMA
    )
    q.awaitTermination()
    before = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert before == {1, 2}

    # checkpoint lost; NEW unrelated data arrives under a fresh one
    _write_batch(
        spark, inp, [(10, "entirely new content arriving after the loss")]
    )
    q = rolling_dedup_stream(
        spark, inp, corpus, index_root, str(tmp_path / "ckpt2"), SCHEMA
    )
    with pytest.raises(StreamingQueryException, match="not comparable"):
        q.awaitTermination()
    # nothing was overwritten or appended by the refused run
    after = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert after == before
