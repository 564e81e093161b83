"""Composable DataFrame operators (each usable as ``df.transform(op(...))``)."""

from ia_hadoop_tools_spark.operators.parse import (  # noqa: F401
    cdx_to_text,
    parse_cdx,
    parse_crawllog,
    read_cdx_text,
)
from ia_hadoop_tools_spark.operators.filters import (  # noqa: F401
    access_control_filter,
    cdx_filter,
    global_wayback_filter,
    prefix_semi_filter,
)
from ia_hadoop_tools_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_first_per_key,
)
from ia_hadoop_tools_spark.operators.daylimit import day_limit  # noqa: F401
from ia_hadoop_tools_spark.operators.cluster import (  # noqa: F401
    build_cluster,
    cluster_range,
    write_cluster,
)
from ia_hadoop_tools_spark.operators.merge import merge_clusters  # noqa: F401
from ia_hadoop_tools_spark.operators.setops import work_queue  # noqa: F401
from ia_hadoop_tools_spark.operators.rekey import cdx_transform  # noqa: F401
from ia_hadoop_tools_spark.operators.parse import recanonicalize  # noqa: F401
from ia_hadoop_tools_spark.operators.extract import (  # noqa: F401
    archive_file_extractor,
    cdx_generate,
    http_import,
    warc_metadata_generate,
    wat_generate,
)
from ia_hadoop_tools_spark.operators.graph import (  # noqa: F401
    degree_stats,
    pagerank,
    symmetric_edges,
    triangle_count,
)
from ia_hadoop_tools_spark.operators.sketches import (  # noqa: F401
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from ia_hadoop_tools_spark.operators.analytics import (  # noqa: F401
    cohort_retention,
    exact_group_quantiles,
)
from ia_hadoop_tools_spark.operators.importance import (  # noqa: F401
    dsir_scores,
    dsir_select,
)
from ia_hadoop_tools_spark.operators.funnel import (  # noqa: F401
    funnel_counts,
    funnel_times,
    window_funnel_levels,
    window_funnel_levels_pandas,
)
from ia_hadoop_tools_spark.operators.scd import (  # noqa: F401
    scd2_as_of,
    scd2_current,
    scd2_merge,
)
from ia_hadoop_tools_spark.operators.rangejoin import interval_join  # noqa: F401
from ia_hadoop_tools_spark.operators.expectations import expectations  # noqa: F401
from ia_hadoop_tools_spark.operators.bpe import (  # noqa: F401
    bpe_pair_counts,
    bpe_train,
    word_vocab,
)
