"""Rolling corpus dedup: stream batches in, keep what's novel, grow the index.

The composition that makes the dedup family operational on a LIVE corpus —
the text-corpus analog of the reference's STAGED/INCLUDED loop
(cdx/notes.txt:19-36) with near-duplicate rather than file-name membership:

    batch arrives -> probe against the CorpusDedupIndex (novel_docs_indexed)
    -> append ONLY the novel docs to the corpus -> extend the index with
    those docs (extend_corpus_index) -> publish the new index atomically.

Per-batch cost tracks the batch and its LSH candidates, never a corpus
re-derivation (operators/dedup_index.py; BASELINE.md probe shows flat batch
cost at 20x corpus). The streaming checkpoint's file log delivers each
input file at-least-once (replacing STAGED-INCLUDED bookkeeping); the sink
is IDEMPOTENT per batch — novel docs overwrite a ``batch_id=N`` corpus
partition, so a replayed batch rewrites its own output instead of
duplicating it — which upgrades the composition to effectively-once.

Index publication is versioned directories with a ``_PUBLISHED`` marker
written LAST: readers resolve the highest marked ``vNNN`` and never observe
a half-written index (the TMP+rename commit idea, jobs/CDXGenerator.java:
123-136, applied to a directory tree without relying on
rename-with-overwrite — pyarrow's HDFS move fails when the destination
exists, and object-store renames are copy+delete, so a mutable pointer
file cannot be swapped atomically everywhere). A ``CURRENT`` pointer file
is still refreshed as an ops convenience, but nothing depends on it.
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
PUBLISHED_MARKER = "_PUBLISHED"


def _existing_versions(
    index_root: str, published_only: bool = False
) -> list[int]:
    from pyarrow import fs as pafs

    fs, p = fsio.resolve(index_root)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except OSError:
        return []
    out = []
    for i in infos:
        name = i.base_name
        if name.startswith("v") and name[1:].isdigit():
            if published_only:
                marker = fs.get_file_info(
                    f"{i.path}/{PUBLISHED_MARKER}"
                )
                if marker.type == pafs.FileType.NotFound:
                    continue  # crashed mid-save: ignore the partial dir
            out.append(int(name[1:]))
    return sorted(out)


def publish_index(index: CorpusDedupIndex, index_root: str) -> str:
    """Save ``index`` as the next version and mark it published.

    The next version comes from scanning ALL existing ``vNNN`` dirs
    (published or partial), so a crash mid-save never reuses a dir and a
    lost pointer never restarts at v000 over data a stale reader may
    still hold. The commit point is the ``_PUBLISHED`` marker written
    LAST inside the version dir — a plain create, atomic on every
    filesystem (local/HDFS/object stores), unlike rename-with-overwrite
    which pyarrow's HDFS move rejects and object stores emulate as
    copy+delete. CURRENT is refreshed best-effort for ops visibility;
    readers resolve versions from markers, never from CURRENT.
    """
    vers = _existing_versions(index_root)
    vdir = f"v{(vers[-1] + 1) if vers else 0:03d}"
    index.save(fsio.join(index_root, vdir))
    with fsio.open_write_text(
        fsio.join(index_root, vdir, PUBLISHED_MARKER)
    ) as fh:
        fh.write("ok")
    cur = fsio.join(index_root, CURRENT)
    tmp = fsio.join(index_root, f"_tmp.{CURRENT}")
    with fsio.open_write_text(tmp) as fh:
        fh.write(vdir)
    try:
        fsio.rename(tmp, cur)
    except OSError:
        # HDFS rename won't overwrite: retire the old pointer first. The
        # brief absent-pointer window is harmless — no reader uses CURRENT.
        try:
            fsio.remove(cur)
            fsio.rename(tmp, cur)
        except OSError:
            pass
    return vdir


def load_current_index(spark: SparkSession, index_root: str) -> CorpusDedupIndex:
    """Load the highest PUBLISHED version (marker-resolved; falls back to
    the CURRENT pointer only for pre-marker layouts)."""
    vers = _existing_versions(index_root, published_only=True)
    if vers:
        vdir = f"v{vers[-1]:03d}"
    else:
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
        from pyspark.sql import functions as F

        # in-batch exact self-dedup FIRST (keep the min id per text):
        # two copies arriving in one batch must not both survive — the
        # index only covers already-ingested docs, so without this the
        # steady-state path would admit intra-batch duplicates
        batch_df = (
            batch_df.select(id_col, text_col)
            .groupBy(text_col)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, text_col)
            .persist()
        )
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
                novel = batch_df
            novel = novel.persist()
            if novel.take(1):
                # per-batch subdir + overwrite = IDEMPOTENT append:
                # foreachBatch is at-least-once, so a replayed batch (crash
                # between this write and the index publish) overwrites its
                # own partition instead of duplicating rows
                novel.write.mode("overwrite").parquet(
                    fsio.join(corpus_path, f"batch_id={batch_id}")
                )
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
