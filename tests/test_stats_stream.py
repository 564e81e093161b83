"""Incremental corpus-stats maintenance: streamed-in batches must yield
the EXACT report card of the full corpus (additive folds + min-k merge),
and the batch-id ledger must make replays no-ops."""

from __future__ import annotations

import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

from ia_hadoop_tools_spark.operators.textops import corpus_stats
from ia_hadoop_tools_spark.streaming.stats_stream import (
    corpus_stats_stream,
    current_stats,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_cycle(spark, inp, root, ckpt):
    q = corpus_stats_stream(spark, inp, root, ckpt, SCHEMA, k=32)
    q.awaitTermination(60)
    time.sleep(0.2)


def test_streamed_stats_equal_direct_stats(spark, tmp_path):
    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "stats"),
        str(tmp_path / "ckpt"),
    )
    all_rows = []
    cycles = [
        [(i, "a", f"one two doc {i}") for i in range(20)],
        [(100 + i, "a", "one two doc 3") for i in range(5)]  # dups of doc 3
        + [(200 + i, "b", f"three four {i} x") for i in range(8)],
        [(300, "b", None), (301, "c", "five")],  # NULL text + new source
    ]
    for rows in cycles:
        all_rows.extend(rows)
        _write_batch(spark, inp, rows)
        _run_cycle(spark, inp, root, ckpt)

    got = {r["source"]: r for r in current_stats(spark, root, k=32).collect()}
    direct = {
        r["source"]: r
        for r in corpus_stats(
            spark.createDataFrame(all_rows, SCHEMA)
        ).collect()
    }
    assert set(got) == set(direct) == {"a", "b", "c"}
    for s in got:
        for c in ("n_docs", "n_tokens", "n_chars", "max_tokens"):
            assert got[s][c] == direct[s][c], (s, c)
        assert got[s]["mean_tokens"] == direct[s]["mean_tokens"], s
        # every source is far below k=32 distinct texts: KMV is EXACT
        assert got[s]["est_unique_texts"] == direct[s]["n_unique_texts"], s
        assert got[s]["dup_frac_est"] == direct[s]["dup_frac"], s


def test_replay_same_checkpoint_is_a_noop(spark, tmp_path):
    """The batch-id ledger's real target: at-least-once re-delivery
    WITHIN one checkpoint.  Publish succeeds but the crash lands before
    Spark records the epoch commit (simulated by deleting the
    checkpoint's commits/0), so the restart re-runs batch 0 with the
    SAME batch id — the ledger must skip it, not double-count."""
    import os

    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "stats"),
        str(tmp_path / "ckpt1"),
    )
    rows = [(i, "a", f"text {i}") for i in range(10)]
    _write_batch(spark, inp, rows)
    _run_cycle(spark, inp, root, ckpt)
    before = {
        r["source"]: r["n_docs"]
        for r in current_stats(spark, root, k=32).collect()
    }
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")  # hadoop local-fs sidecar
    if os.path.exists(crc):
        os.remove(crc)
    _run_cycle(spark, inp, root, ckpt)  # batch 0 re-fires, same id
    after = {
        r["source"]: r["n_docs"]
        for r in current_stats(spark, root, k=32).collect()
    }
    assert before == after == {"a": 10}


def test_fresh_checkpoint_against_published_root_fails_loudly(spark, tmp_path):
    """ADVICE r8 (medium): losing the checkpoint is a routine ops event;
    restarting with a FRESH one against an existing root restarts batch
    ids at 0 and the ledger would silently skip every new batch — the
    identity stamp must turn that invisible under-count into an error."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    inp, root = str(tmp_path / "in"), str(tmp_path / "stats")
    _write_batch(spark, inp, [(i, "a", f"text {i}") for i in range(10)])
    _run_cycle(spark, inp, root, str(tmp_path / "ckpt1"))
    # NEW data arrives, but the checkpoint was lost: a fresh one starts
    # batch ids over, which the published identity must reject
    _write_batch(spark, inp, [(100 + i, "b", f"new {i}") for i in range(3)])
    q = corpus_stats_stream(
        spark, inp, root, str(tmp_path / "ckpt2"), SCHEMA, k=32
    )
    with pytest.raises(StreamingQueryException, match="not comparable"):
        q.awaitTermination(60)
    # the published state is untouched by the failed fold
    got = {
        r["source"]: r["n_docs"]
        for r in current_stats(spark, root, k=32).collect()
    }
    assert got == {"a": 10}


def test_empty_root_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no published stats"):
        current_stats(spark, str(tmp_path / "nope"))


def test_torn_publish_is_skipped_and_never_reused(spark, tmp_path):
    """Crash-partial discipline (streaming/versioned.py): an UNMARKED
    version dir — payload written, crash before the _PUBLISHED marker —
    must be invisible to readers, and the next publish must skip past
    its number rather than reuse it."""
    import os

    from ia_hadoop_tools_spark.streaming.stats_stream import (
        corpus_stats_stream,
        current_stats,
    )

    inp, root = str(tmp_path / "in"), str(tmp_path / "stats")
    _write_batch(spark, inp, [(i, "a", f"text {i}") for i in range(5)])
    _run_cycle(spark, inp, root, str(tmp_path / "ck1"))
    assert os.path.isdir(os.path.join(root, "v000"))

    # simulate a torn save: v001 payload exists, marker missing
    torn = os.path.join(root, "v001", "counts")
    os.makedirs(torn)
    with open(os.path.join(torn, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")

    # reader resolves the last MARKED version, not the torn one
    got = {r["source"]: r["n_docs"] for r in current_stats(spark, root, k=32).collect()}
    assert got == {"a": 5}

    # next fold publishes v002 (number not reused), readers see it
    _write_batch(spark, inp, [(100 + i, "b", f"new {i}") for i in range(3)])
    _run_cycle(spark, inp, root, str(tmp_path / "ck1"))
    assert os.path.exists(os.path.join(root, "v002", "_PUBLISHED"))
    got2 = {r["source"]: r["n_docs"] for r in current_stats(spark, root, k=32).collect()}
    assert got2 == {"a": 5, "b": 3}


def test_unreadable_identity_refuses_to_publish(spark, tmp_path, monkeypatch):
    """FAIL CLOSED (review r9 second pass): an unreadable checkpoint
    identity must refuse the batch — publishing an unstamped version
    would silently disarm the guard for the whole root.  Spark itself
    rejects a CORRUPT metadata file at query start, so the sink-level
    None path (a transient FS fault during the sink's own read) is
    simulated by patching stream_identity."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from ia_hadoop_tools_spark.streaming import stats_stream as mod

    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "stats"),
        str(tmp_path / "ckpt"),
    )
    _write_batch(spark, inp, [(i, "a", f"text {i}") for i in range(5)])
    _run_cycle(spark, inp, root, ckpt)
    before = {
        r["source"]: r["n_docs"]
        for r in current_stats(spark, root, k=32).collect()
    }
    monkeypatch.setattr(mod, "stream_identity", lambda _ckpt: None)
    _write_batch(spark, inp, [(100, "b", "new data")])
    q = corpus_stats_stream(spark, inp, root, ckpt, SCHEMA, k=32)
    with pytest.raises(StreamingQueryException, match="refusing to publish"):
        q.awaitTermination(60)
    # published state untouched by the refused batch
    after = {
        r["source"]: r["n_docs"]
        for r in current_stats(spark, root, k=32).collect()
    }
    assert after == before
