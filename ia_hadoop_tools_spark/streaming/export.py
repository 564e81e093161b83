"""Streaming export: incremental batches -> bounded-async external sink.

The streaming-era counterpart of the reference's bulk importer jobs
(cassandra/CDXImporter.java consumed finished MapReduce outputs; a live
pipeline exports as data lands): ``readStream`` sources feed
``foreachBatch``, each micro-batch flowing through
:func:`ia_hadoop_tools_spark.sources.batched_sink.write_batched_async`
with the importer's batching/backpressure constants.

Effectively-once: the file-source checkpoint delivers each input file
at-least-once, and every HTTP batch carries the idempotency key
``b<streamBatchId>-<partition>-<seq>``. The key is deterministic across
a replay ONLY while split planning is stable — partition/seq assignment
depends on ``spark.sql.files.maxPartitionBytes`` and cluster
parallelism, so a restart on a resized cluster can replay batch N's rows
under different keys. Batch-key dedup therefore upgrades at-least-once
to effectively-once under same-config restarts (the common crash-loop
case); an endpoint needing exactly-once under config drift must
deduplicate on row content/ids, which the JSON sender ships in full.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ia_hadoop_tools_spark.sources.batched_sink import (
    DEFAULT_BATCH_SIZE,
    DEFAULT_MAX_IN_FLIGHT,
    SendFn,
    write_batched_async,
)


def stream_to_endpoint(
    stream_df: DataFrame,
    make_sender: Callable[[int], SendFn],
    checkpoint_path: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_in_flight: int = DEFAULT_MAX_IN_FLIGHT,
    retries: int = 3,
    available_now: bool = True,
):
    """Start a streaming query exporting every micro-batch through the
    bounded-async sink. Returns the ``StreamingQuery`` (caller awaits);
    ``available_now`` drains the current backlog then stops — the
    incremental-batch operating mode (SURVEY §2.11)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # collect_stats=False: per-micro-batch accumulators would leak in
        # the process-global registry for the stream's lifetime, and the
        # stats dict is unused here anyway
        write_batched_async(
            batch_df,
            make_sender,
            batch_size=batch_size,
            max_in_flight=max_in_flight,
            retries=retries,
            batch_id_prefix=f"b{batch_id}-",
            collect_stats=False,
        )

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
