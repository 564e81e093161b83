"""Incremental cluster updates.

The reference's incrementality is file-set bookkeeping (cdx/notes.txt:19-36):
STAGED minus INCLUDED selects the next batch of source files; after a merge
the basenames move to INCLUDED. ``incremental_merge_cycle`` is that loop as a
function. ``stream_ingest_available_now`` is the optional Structured Streaming
skin over the same semantics (SURVEY.md §2.11): ``readStream`` with
``availableNow`` discovers new files exactly-once via the checkpoint log —
Spark's file-source tracking replaces STAGED/INCLUDED — and ``foreachBatch``
applies the identical batch merge.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.merge import merge_clusters
from ia_hadoop_tools_spark.operators.setops import work_queue


def incremental_merge_cycle(
    spark: SparkSession,
    staged: DataFrame,
    included: DataFrame,
    read_source: Callable[[SparkSession, str], DataFrame],
    existing_cluster: DataFrame | None,
    daily_limit: int | None = None,
    sort_cols: Sequence[str] = ("urlkey", "timestamp"),
    tiebreakers: Sequence[str] = (),
) -> tuple[DataFrame | None, DataFrame]:
    """One STAGED/INCLUDED update cycle.

    - work = STAGED − INCLUDED (anti-join on basename);
    - new data = union of ``read_source(spark, path)`` over the work queue;
    - merged = merge_clusters([existing, new], daily_limit=...);
    - returns (merged cluster, new INCLUDED bookkeeping table). If there
      is no work AND ``existing_cluster`` is None (first-ever cycle with
      everything already included), there is no cluster to return and the
      first element is None — callers must handle that corner before
      ``.write``-ing the result.
    """
    # dedup on basename BEFORE reading: work_queue's anti-join dedups only
    # the INCLUDED side, so a basename staged twice (re-listed across
    # staging runs) would be read and merged twice — every record of that
    # file silently duplicated while the bookkeeping looked correct
    todo = (
        work_queue(staged, included)
        .select("basename", "path")
        .dropDuplicates(["basename"])
        .collect()
    )
    if not todo:
        # basename-only, like the work path returns: a full-schema
        # passthrough here made the returned bookkeeping schema depend on
        # whether the cycle happened to have work. Identity is preserved
        # when already normalized (the no-op-cycle contract).
        if included.columns == ["basename"]:
            return existing_cluster, included
        return existing_cluster, included.select("basename").dropDuplicates()
    new_parts = [read_source(spark, r["path"]) for r in todo]
    sources = new_parts if existing_cluster is None else [existing_cluster, *new_parts]
    merged = merge_clusters(
        sources, daily_limit=daily_limit, sort_cols=sort_cols,
        tiebreakers=tiebreakers,
    )
    # explicit 1-slice parallelize: createDataFrame(list) would split this
    # handful of basenames over defaultParallelism slices, making every
    # later scan of the bookkeeping table (the next cycle's anti-join)
    # spin one Python worker per core for mostly-empty partitions
    new_included = included.select("basename").unionByName(
        spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(r["basename"],) for r in todo], 1
            ),
            "basename: string",
        )
    ).dropDuplicates(["basename"])
    return merged, new_included


def stream_ingest_available_now(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    sort_cols: Sequence[str] = ("urlkey", "timestamp"),
):
    """Incremental file ingestion as an ``availableNow`` stream.

    Each micro-batch is range-sorted and written to its OWN
    ``batch_id=N`` partition with overwrite via ``foreachBatch``:
    foreachBatch is at-least-once, so a crash between a completed write
    and the checkpoint commit replays the batch — the per-batch
    overwrite makes the replay rewrite its own partition instead of
    appending duplicates (a blind append was only at-least-once despite
    the file-log's exactly-once delivery). Readers see ``batch_id`` as a
    partition column (the rolling_dedup corpus layout).
    """
    stream = spark.readStream.format(fmt).schema(schema).load(input_path)
    if transform is not None:
        stream = transform(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ia_hadoop_tools_spark.sources import fsio

        cols = [F.col(c) for c in sort_cols]
        (
            batch_df.repartitionByRange(*cols)
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            # fsio.join: URI-aware ("/" separators on every scheme), like
            # the sibling streaming sinks
            .parquet(fsio.join(output_path, f"batch_id={batch_id}"))
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
