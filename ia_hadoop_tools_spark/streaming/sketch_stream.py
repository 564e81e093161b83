"""Incremental KMV sketch-table maintenance over a file stream.

The operational payoff of the sketch's MERGE property
(operators/sketches.py): per-group distinct-count sketches stay current
as new data files arrive, at per-batch cost proportional to the BATCH —
the running corpus is never rescanned. Each micro-batch sketches its own
rows, merges with the published sketch (min-k(A ∪ B) =
min-k(min-k(A) ∪ min-k(B)) — exact, associative), and publishes a new
version.

Publication reuses the rolling_dedup commit protocol: versioned ``vNNN``
directories with a ``_PUBLISHED`` marker written LAST, so readers always
resolve a complete sketch and a replayed batch (foreachBatch is
at-least-once) just writes the next version with identical content —
merging a batch twice is a no-op by the idempotence of min-k union.

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
from ia_hadoop_tools_spark.streaming.rolling_dedup import (
    PUBLISHED_MARKER,
    _existing_versions,
)


def publish_sketch(sketch: DataFrame, root: str) -> str:
    """Write ``sketch`` as the next ``vNNN`` version; marker committed last."""
    versions = _existing_versions(root)
    nxt = (max(versions) + 1) if versions else 0
    vdir = fsio.join(root, f"v{nxt:03d}")
    sketch.write.mode("overwrite").parquet(fsio.join(vdir, "sketch"))
    with fsio.open_write_text(fsio.join(vdir, PUBLISHED_MARKER)) as fh:
        fh.write("ok\n")
    return vdir


def load_current_sketch(spark: SparkSession, root: str) -> DataFrame | None:
    """Latest PUBLISHED sketch version, or None before the first publish."""
    versions = _existing_versions(root, published_only=True)
    if not versions:
        return None
    vdir = fsio.join(root, f"v{max(versions):03d}")
    return spark.read.parquet(fsio.join(vdir, "sketch"))


def kmv_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_root: str,
    checkpoint_dir: str,
    schema,
    group_cols: list[str],
    value: Column,
    k: int = 64,
):
    """``availableNow`` stream: fold each arriving parquet file's rows into
    the published sketch table. Returns the finished StreamingQuery."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        delta = kmv_sketch(batch_df, group_cols, value, k)
        cur = load_current_sketch(batch_df.sparkSession, sketch_root)
        merged = delta if cur is None else kmv_merge(cur, delta, group_cols, k)
        publish_sketch(merged, sketch_root)

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
