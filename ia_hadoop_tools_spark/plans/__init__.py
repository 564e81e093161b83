"""Physical-layout helpers (explicit range partitioning, shard naming)."""

from ia_hadoop_tools_spark.plans.partitioning import (  # noqa: F401
    assign_range_ids,
    parse_splitfile,
    write_named_shards,
)
