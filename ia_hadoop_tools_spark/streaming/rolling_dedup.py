"""Rolling corpus dedup: stream batches in, keep what's novel, grow the index.

The composition that makes the dedup family operational on a LIVE corpus —
the text-corpus analog of the reference's STAGED/INCLUDED loop
(cdx/notes.txt:19-36) with near-duplicate rather than file-name membership:

    batch arrives -> probe against the CorpusDedupIndex (novel_docs_indexed)
    -> append ONLY the novel docs to the corpus -> extend the index with
    those docs (extend_corpus_index) -> publish the new index atomically.

Per-batch cost tracks the batch and its LSH candidates, never a corpus
re-derivation (operators/dedup_index.py; BASELINE.md probe shows flat batch
cost at 20x corpus). Exactly-once per input file comes from the streaming
checkpoint's file log, replacing STAGED-INCLUDED bookkeeping.

Index publication is versioned-directory + atomic swap: each cycle saves to
``index/vNNN`` then moves a ``CURRENT`` pointer file — readers resolve the
pointer and never observe a half-written index (the TMP+rename protocol,
jobs/CDXGenerator.java:123-136, applied to a directory tree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ia_hadoop_tools_spark.operators.dedup_index import (
    CorpusDedupIndex,
    build_corpus_index,
    extend_corpus_index,
    novel_docs_indexed,
)
from ia_hadoop_tools_spark.sources import fsio

CURRENT = "CURRENT"


def publish_index(index: CorpusDedupIndex, index_root: str) -> str:
    """Save ``index`` as the next version and swap the CURRENT pointer."""
    ver = 0
    cur = fsio.join(index_root, CURRENT)
    if fsio.exists(cur):
        with fsio.open_read_text(cur) as fh:
            ver = int(fh.read().strip().lstrip("v")) + 1
    vdir = f"v{ver:03d}"
    index.save(fsio.join(index_root, vdir))
    tmp = fsio.join(index_root, f"_tmp.{CURRENT}")
    with fsio.open_write_text(tmp) as fh:
        fh.write(vdir)
    if fsio.exists(cur):
        fsio.remove(cur)
    fsio.rename(tmp, cur)
    return vdir


def load_current_index(spark: SparkSession, index_root: str) -> CorpusDedupIndex:
    with fsio.open_read_text(fsio.join(index_root, CURRENT)) as fh:
        vdir = fh.read().strip()
    return CorpusDedupIndex.load(spark, fsio.join(index_root, vdir))


def rolling_dedup_stream(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    index_root: str,
    checkpoint_path: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_words: int = 3,
    num_perm: int = 16,
    bands: int = 4,
):
    """``availableNow`` stream: dedup each batch against the live index.

    Novel docs append to ``corpus_path`` (Parquet); the index grows by
    exactly those docs and republishes per batch. First batch bootstraps an
    empty-corpus index. Returns the streaming query (caller awaits
    termination); restarts resume exactly-once from the checkpoint.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col).persist()
        try:
            if fsio.exists(fsio.join(index_root, CURRENT)):
                idx = load_current_index(spark, index_root)
                verdict = novel_docs_indexed(
                    batch_df, idx, id_col, text_col, threshold
                )
                novel_ids = verdict.filter("is_novel").select(id_col)
                novel = batch_df.join(novel_ids, id_col)
            else:
                idx = None
                # bootstrap: batch self-dedup via exact text (keep min id)
                novel = (
                    batch_df.groupBy(text_col)
                    .agg({id_col: "min"})
                    .withColumnRenamed(f"min({id_col})", id_col)
                    .select(id_col, text_col)
                )
            novel = novel.persist()
            if novel.take(1):
                novel.write.mode("append").parquet(corpus_path)
                grown = (
                    extend_corpus_index(idx, novel, id_col, text_col)
                    if idx is not None
                    else build_corpus_index(
                        novel, id_col, text_col,
                        shingle_words, num_perm, bands,
                    )
                )
                publish_index(grown, index_root)
            novel.unpersist()
        finally:
            batch_df.unpersist()

    os.makedirs(index_root, exist_ok=True)
    return (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
