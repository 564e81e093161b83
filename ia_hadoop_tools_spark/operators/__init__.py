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
