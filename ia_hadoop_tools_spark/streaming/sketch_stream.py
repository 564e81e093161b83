"""Incremental KMV sketch-table maintenance over a file stream.

The operational payoff of the sketch's MERGE property
(operators/sketches.py): per-group distinct-count sketches stay current
as new data files arrive, at per-batch cost proportional to the BATCH —
the running corpus is never rescanned. Each micro-batch sketches its own
rows, merges with the published sketch (min-k(A ∪ B) =
min-k(min-k(A) ∪ min-k(B)) — exact, associative), and publishes a new
version.

Publication uses the shared ``streaming/versioned.py`` commit protocol:
versioned ``vNNN`` directories with a ``_PUBLISHED`` marker written
LAST, so readers always resolve a complete sketch and a replayed batch
(foreachBatch is at-least-once) just writes the next version with
identical content — merging a batch twice is a no-op by the idempotence
of min-k union. Old versions prune to ``keep_versions`` per publish,
bounding a long stream's storage and per-batch listing cost.

At 100 TB the sketch table is KBs per group however large the corpus —
the whole point: distinct-count dashboards read the latest ``vNNN``
directory, never the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

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
    version_dir,
)


def publish_sketch(
    sketch: DataFrame, root: str, keep_versions: int | None = None
) -> str:
    """Write ``sketch`` as the next ``vNNN`` version; marker committed
    last; older versions pruned to ``keep_versions`` when set."""
    v = next_version(root)
    vdir = version_dir(root, v)
    sketch.write.mode("overwrite").parquet(fsio.join(vdir, "sketch"))
    commit_version(root, v)
    if keep_versions is not None:
        prune_versions(root, keep_versions)
    return vdir


def load_current_sketch(spark: SparkSession, root: str) -> DataFrame | None:
    """Latest PUBLISHED sketch version, or None before the first publish."""
    latest = latest_published_dir(root)
    if latest is None:
        return None
    return spark.read.parquet(fsio.join(latest, "sketch"))


def kmv_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_root: str,
    checkpoint_dir: str,
    schema,
    group_cols: list[str],
    value: Column,
    k: int = 64,
    keep_versions: int = 8,
):
    """``availableNow`` stream: fold each arriving parquet file's rows into
    the published sketch table, pruning to the newest ``keep_versions``
    sketch versions. Returns the STARTED StreamingQuery — call
    ``awaitTermination()`` before reading :func:`current_estimates`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # persist before the emptiness probe: take(1) and the sketch job
        # would otherwise each re-read the micro-batch's input files
        batch_df = batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            delta = kmv_sketch(batch_df, group_cols, value, k)
            cur = load_current_sketch(batch_df.sparkSession, sketch_root)
            merged = (
                delta if cur is None else kmv_merge(cur, delta, group_cols, k)
            )
            publish_sketch(merged, sketch_root, keep_versions=keep_versions)
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


def current_estimates(
    spark: SparkSession, sketch_root: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Distinct-count estimates from the latest published sketch."""
    cur = load_current_sketch(spark, sketch_root)
    if cur is None:
        raise ValueError(f"no published sketch under {sketch_root}")
    return kmv_estimate(cur, group_cols, k)
