"""Incremental corpus-stats maintenance over a file stream.

The streaming twin of ``operators/textops.corpus_stats``: the per-source
report card (docs, tokens, chars, max length, unique texts) stays
current as new document files arrive, at per-batch cost proportional to
the BATCH — the running corpus is never rescanned.  Counts fold by SUM
and GREATEST (exact, associative); the unique-text count folds as a KMV
sketch (``operators/sketches.py`` — min-k union is exact-associative
and idempotent, exact below k), so the published state is KBs per
source however large the corpus.

Publication uses the shared ``streaming/versioned.py`` commit protocol
(versioned ``vNNN`` dirs, ``_PUBLISHED`` marker last).  Unlike the
sketch stream, additive counts are NOT idempotent under replay —
foreachBatch is at-least-once, and folding the same batch twice would
double-count — so each published version records the batch id it
folded and the sink SKIPS any batch at or below the latest published id
(the transactional foreachBatch ledger pattern; batch ids are
monotonic per checkpoint).

Batch ids are only comparable WITHIN one checkpoint, so each published
version also records the stream identity (the checkpoint's Spark query
id, ``versioned.stream_identity``) and the sink FAILS LOUDLY when the
identity changes: restarting with a fresh checkpoint against an
existing stats root restarts batch ids at 0, and without the identity
stamp every new batch would be silently skipped by the ledger — an
invisible under-count after a routine ops event (checkpoint corruption
or cleanup).  Recovery is explicit: restore the original checkpoint,
or start a fresh stats_root (re-folding everything from scratch is the
only safe way to re-pair — additive counts cannot be reconciled across
checkpoints).  Versions published before this stamp existed (no
``_STREAM`` file) keep the old skip-only behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from ia_hadoop_tools_spark.sources import fsio
from ia_hadoop_tools_spark.streaming.versioned import (
    commit_version,
    latest_published_dir,
    next_version,
    prune_versions,
    read_stream_stamp,
    stream_identity,
    version_dir,
    write_stream_stamp,
)

_BATCH_FILE = "_BATCH"
_COUNT_COLS = ("n_docs", "n_tokens", "n_chars")


def _delta_counts(batch: DataFrame, by: str, text_col: str) -> DataFrame:
    """Per-source additive aggregates of ONE batch (the corpus_stats
    projections, minus the derived ratios — those compute at read time
    from exact folded counts)."""
    from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.size(F.filter(F.split(F.lower(t), WORD_SPLIT), lambda x: x != ""))
    return (
        batch.select(
            F.col(by).alias("source"),
            toks.alias("__t"),
            F.length(t).alias("__c"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__c").alias("n_chars"),
            F.max("__t").cast("long").alias("max_tokens"),
        )
    )


def _fold_counts(cur: DataFrame, delta: DataFrame) -> DataFrame:
    """cur ⊎ delta: SUM the additive columns, GREATEST the max — a
    full-outer join on the bounded source key set (sources absent from
    one side contribute identity: 0 / NULL)."""
    d = delta.select(
        "source",
        *[F.col(c).alias(f"__d_{c}") for c in _COUNT_COLS],
        F.col("max_tokens").alias("__d_max"),
    )
    joined = cur.join(d, "source", "full_outer")
    return joined.select(
        "source",
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in _COUNT_COLS
        ],
        F.greatest(
            F.coalesce("max_tokens", F.lit(0)),
            F.coalesce("__d_max", F.lit(0)),
        ).alias("max_tokens"),
    )


def _read_batch_id(vdir: str) -> int:
    with fsio.open_read_text(fsio.join(vdir, _BATCH_FILE)) as fh:
        return int(fh.read().strip())


def publish_stats(
    counts: DataFrame,
    sketch: DataFrame,
    root: str,
    batch_id: int,
    keep_versions: int | None = None,
    stream_id: str | None = None,
) -> str:
    """Write (counts, sketch, folded batch id, stream identity) as the
    next ``vNNN`` version; marker committed last; older versions pruned
    when set."""
    v = next_version(root)
    vdir = version_dir(root, v)
    counts.write.mode("overwrite").parquet(fsio.join(vdir, "counts"))
    sketch.write.mode("overwrite").parquet(fsio.join(vdir, "sketch"))
    with fsio.open_write_text(fsio.join(vdir, _BATCH_FILE)) as fh:
        fh.write(f"{batch_id}\n")
    if stream_id is not None:
        write_stream_stamp(vdir, stream_id)
    commit_version(root, v)
    if keep_versions is not None:
        prune_versions(root, keep_versions)
    return vdir


def corpus_stats_stream(
    spark: SparkSession,
    input_dir: str,
    stats_root: str,
    checkpoint_dir: str,
    schema,
    by: str = "source",
    text_col: str = "text",
    k: int = 64,
    keep_versions: int = 8,
):
    """``availableNow`` stream: fold each arriving parquet file's rows
    into the published per-source stats, replay-safe via the batch-id
    ledger.  Returns the STARTED StreamingQuery — ``.start()`` is
    asynchronous, so call ``awaitTermination()`` before reading
    :func:`current_stats` (an un-awaited read raises "no published
    stats" on the first cycle or silently returns the previous
    version on later ones)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # persist before the emptiness probe: take(1), the counts agg and
        # the sketch would otherwise each re-read the batch's input files
        batch_df = batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            sess = batch_df.sparkSession
            ident = stream_identity(checkpoint_dir)
            if ident is None:
                # FAIL CLOSED (review r9): publishing without a stamp
                # would leave the NEWEST version unprotected — the next
                # fresh-checkpoint stream would fold against it
                # unchallenged. The metadata file exists once a query
                # has started, so None here is a transient FS error;
                # failing the batch lets the stream retry it.
                raise ValueError(
                    f"corpus_stats_stream: cannot read the stream "
                    f"identity from {checkpoint_dir}/metadata — "
                    "refusing to publish an unstamped version"
                )
            cur_dir = latest_published_dir(stats_root)
            if cur_dir is not None:
                rec = read_stream_stamp(cur_dir)
                if rec is not None and rec != ident:
                    raise ValueError(
                        f"corpus_stats_stream: stats root {stats_root} was "
                        f"published by stream {rec}, but checkpoint "
                        f"{checkpoint_dir} has identity {ident}. Batch ids "
                        "are not comparable across checkpoints, so folding "
                        "would double-count (and the ledger would silently "
                        "skip new data). Restore the original checkpoint, "
                        "or start a fresh stats_root to re-fold from "
                        "scratch."
                    )
                if _read_batch_id(cur_dir) >= batch_id:
                    # at-least-once replay of an already-folded batch: the
                    # published state is already past it, folding again
                    # would double-count — skip (min-k alone can't save
                    # sums)
                    return
            delta_c = _delta_counts(batch_df, by, text_col)
            delta_s = kmv_sketch(
                batch_df.select(
                    F.col(by).alias("source"), F.col(text_col).alias("__txt")
                ),
                ["source"],
                F.md5(F.coalesce(F.col("__txt"), F.lit(""))),
                k,
            )
            if cur_dir is None:
                counts, sketch = delta_c, delta_s
            else:
                counts = _fold_counts(
                    sess.read.parquet(fsio.join(cur_dir, "counts")), delta_c
                )
                sketch = kmv_merge(
                    sess.read.parquet(fsio.join(cur_dir, "sketch")),
                    delta_s,
                    ["source"],
                    k,
                )
            publish_stats(
                counts, sketch, stats_root, batch_id,
                keep_versions=keep_versions, stream_id=ident,
            )
        finally:
            batch_df.unpersist()

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_stats(spark: SparkSession, stats_root: str, k: int = 64) -> DataFrame:
    """The report card from the latest published version: exact folded
    counts plus ``mean_tokens``, the KMV ``est_unique_texts`` (exact
    below k per source), and ``dup_frac_est`` (clamped at 0 — a full
    sketch's estimate can overshoot the true distinct count)."""
    latest = latest_published_dir(stats_root)
    if latest is None:
        raise ValueError(f"no published stats under {stats_root}")
    counts = spark.read.parquet(fsio.join(latest, "counts"))
    est = kmv_estimate(
        spark.read.parquet(fsio.join(latest, "sketch")), ["source"], k
    ).select("source", F.col("est_distinct").alias("est_unique_texts"))
    return counts.join(est, "source", "left").select(
        "source",
        *_COUNT_COLS,
        (F.col("n_tokens").cast("double") / F.col("n_docs")).alias(
            "mean_tokens"
        ),
        "max_tokens",
        "est_unique_texts",
        F.greatest(
            F.lit(0.0),
            (F.col("n_docs") - F.col("est_unique_texts")).cast("double")
            / F.col("n_docs"),
        ).alias("dup_frac_est"),
    )
