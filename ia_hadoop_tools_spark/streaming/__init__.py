"""Incremental ingestion: batch work-queue cycle + Structured Streaming path."""

from ia_hadoop_tools_spark.streaming.incremental import (  # noqa: F401
    incremental_merge_cycle,
    stream_ingest_available_now,
)
from ia_hadoop_tools_spark.streaming.sessions import (  # noqa: F401
    sessionize_events,
    sessionize_stateful,
)
