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
That overwrite contract is only safe WITHIN one checkpoint: published
index versions therefore record the stream identity
(``versioned.stream_identity``) and the sink fails loudly when a
different checkpoint (fresh ids starting at 0) targets an existing
root — otherwise batch 0's replay-overwrite would destroy the
originally-ingested partition while the index still references it.

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

from pyspark.sql import DataFrame, SparkSession

from ia_hadoop_tools_spark.operators.dedup_index import (
    CorpusDedupIndex,
    build_corpus_index,
    extend_corpus_index,
    novel_docs_indexed,
)
from ia_hadoop_tools_spark.sources import fsio
from ia_hadoop_tools_spark.streaming.versioned import (
    PUBLISHED_MARKER,  # noqa: F401 — re-export (pre-refactor import site)
    commit_version,
    existing_versions,
    latest_published_dir,
    next_version,
    prune_versions,
    read_stream_stamp,
    stream_identity,
    version_dir,
    write_stream_stamp,
)

CURRENT = "CURRENT"

#: back-compat alias (sketch_stream historically imported the private name)
_existing_versions = existing_versions


def publish_index(
    index: CorpusDedupIndex,
    index_root: str,
    keep_versions: int | None = None,
    stream_id: str | None = None,
) -> str:
    """Save ``index`` as the next version and mark it published
    (streaming/versioned.py protocol: numbers never reused, marker
    committed last, readers resolve markers — never CURRENT, which is
    refreshed best-effort for ops visibility only). ``keep_versions``
    prunes older published versions after the commit (a long-lived
    stream otherwise accumulates one full index copy per batch).
    ``stream_id`` (the publishing checkpoint's identity) is stamped
    into the version so the sink can refuse cross-checkpoint growth.
    """
    v = next_version(index_root)
    index.save(version_dir(index_root, v))
    if stream_id is not None:
        write_stream_stamp(version_dir(index_root, v), stream_id)
    commit_version(index_root, v)
    vdir = f"v{v:03d}"
    if keep_versions is not None:
        prune_versions(index_root, keep_versions)
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
    latest = latest_published_dir(index_root)
    if latest is None:
        with fsio.open_read_text(fsio.join(index_root, CURRENT)) as fh:
            latest = fsio.join(index_root, fh.read().strip())
    return CorpusDedupIndex.load(spark, latest)


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
    keep_versions: int = 8,
):
    """``availableNow`` stream: dedup each batch against the live index.

    Novel docs append to ``corpus_path`` (Parquet); the index grows by
    exactly those docs and republishes per batch, pruning to the newest
    ``keep_versions`` published index versions (one full copy per batch
    otherwise — unbounded storage and O(versions) listing on a stream).
    First batch bootstraps an empty-corpus index. Returns the streaming
    query (caller awaits termination); restarts resume exactly-once from
    the checkpoint.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ia_hadoop_tools_spark.operators.textops import minhash_lsh_pairs

        original = batch_df.persist()
        # in-batch exact self-dedup FIRST (keep the min id per text):
        # two copies arriving in one batch must not both survive — the
        # index only covers already-ingested docs, so without this the
        # steady-state path would admit intra-batch duplicates.
        # Shuffle on the ~40-byte (md5, length) digest — the SAME exact
        # identity the CorpusDedupIndex uses — never on the full text,
        # which would make every micro-batch a corpus-sized text shuffle;
        # the survivor's text rides back via the min-id semi-join
        keep_ids = (
            original.select(
                F.col(id_col),
                F.md5(F.col(text_col)).alias("__md5"),
                F.length(F.col(text_col)).alias("__len"),
            )
            .groupBy("__md5", "__len")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        slim = (
            original.select(id_col, text_col)
            .join(keep_ids, id_col, "left_semi")
            .persist()
        )
        novel = None
        idx = None
        caches = []
        try:
            # index existence gate = the PUBLISHED-marker protocol, never
            # the best-effort CURRENT pointer: a missing pointer (crash
            # between commit and pointer refresh, or an HDFS re-rename
            # failure) must NOT silently reset the dedup corpus
            latest = latest_published_dir(index_root)
            # identity guard (same rule as stats_stream): batch ids are
            # only comparable within one checkpoint, and here the stakes
            # are higher — a fresh checkpoint restarts at batch 0 and
            # the idempotent-overwrite contract would REPLACE the
            # original batch_id=0 corpus partition with different rows
            # while the published index still references the destroyed
            # docs. Refuse before anything is written.
            ident = stream_identity(checkpoint_path)
            if ident is None:
                # FAIL CLOSED (review r9): an unstamped publish would
                # leave the newest version unguarded; metadata exists
                # once the query started, so None is a transient FS
                # error — fail the batch, the stream retries
                raise ValueError(
                    f"rolling_dedup_stream: cannot read the stream "
                    f"identity from {checkpoint_path}/metadata — "
                    "refusing to grow an unstamped index"
                )
            if latest is not None:
                rec = read_stream_stamp(latest)
                if rec is not None and rec != ident:
                    raise ValueError(
                        f"rolling_dedup_stream: index root {index_root} "
                        f"was published by stream {rec}, but checkpoint "
                        f"{checkpoint_path} has identity {ident}. Batch "
                        "ids are not comparable across checkpoints and "
                        "the idempotent batch_id=N overwrite would "
                        "destroy previously-ingested corpus partitions. "
                        "Restore the original checkpoint, or start a "
                        "fresh corpus_path + index_root."
                    )
            has_legacy = latest is None and fsio.exists(
                fsio.join(index_root, CURRENT)
            )
            if latest is not None or has_legacy:
                idx = load_current_index(spark, index_root)
                verdict = novel_docs_indexed(
                    slim, idx, id_col, text_col, threshold
                )
                caches.extend(getattr(verdict, "probe_caches", ()))
                novel_ids = verdict.filter("is_novel").select(id_col)
                novel = slim.join(novel_ids, id_col)
            else:
                idx = None
                novel = slim
            # in-batch NEAR-dup self-probe (same parameters as the index):
            # two near-identical docs arriving in ONE batch are invisible
            # to the corpus index, which only covers prior batches. Keep
            # rule = semdedup's: a doc is dropped iff some smaller-id
            # same-batch doc is within threshold of it.
            pairs = minhash_lsh_pairs(
                novel,
                id_col=id_col,
                text_col=text_col,
                num_perm=num_perm,
                bands=bands,
                shingle_words=shingle_words,
                threshold=threshold,
            )
            if hasattr(pairs, "shingle_cache"):
                caches.append(pairs.shingle_cache)
            in_batch_dups = pairs.select(
                F.col("id_b").alias(id_col)
            ).distinct()
            novel = novel.join(in_batch_dups, id_col, "left_anti").persist()
            if novel.take(1):
                # per-batch subdir + overwrite = IDEMPOTENT append:
                # foreachBatch is at-least-once, so a replayed batch (crash
                # between this write and the index publish) overwrites its
                # own partition instead of duplicating rows. The corpus
                # keeps EVERY input column (surviving ids join back to the
                # raw batch); the index needs only (id, text).
                novel_full = original.join(
                    novel.select(id_col), id_col
                )
                novel_full.write.mode("overwrite").parquet(
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
                publish_index(
                    grown, index_root,
                    keep_versions=keep_versions, stream_id=ident,
                )
        finally:
            # unpersist in a finally: at-least-once replays after a
            # transient write/publish failure must not leak cache entries.
            # The index's own persisted frames (capped_buckets memo etc.)
            # are released too — each batch loads a FRESH index instance,
            # so without this a long stream accumulates one cached corpus
            # bucket table per batch
            if novel is not None:
                novel.unpersist()
            for c in caches:
                c.unpersist()
            if idx is not None:
                idx.unpersist()
            slim.unpersist()
            original.unpersist()

    fsio.makedirs(index_root)
    return (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
