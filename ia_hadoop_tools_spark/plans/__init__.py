"""Physical-layout helpers (explicit range partitioning, shard naming)."""

from ia_hadoop_tools_spark.plans.partitioning import (  # noqa: F401
    assign_range_ids,
    boundaries_from_summary,
    parse_splitfile,
    sample_boundaries,
    write_named_shards,
)
from ia_hadoop_tools_spark.plans.skew import (  # noqa: F401
    salted_distinct_count,
    salted_join,
)
from ia_hadoop_tools_spark.plans.bucketing import (  # noqa: F401
    bucketed_tables_join,
    write_bucketed,
)
from ia_hadoop_tools_spark.plans.bloom import (  # noqa: F401
    bloom_build,
    bloom_extend,
    bloom_prune,
    bloom_semi_join,
)
