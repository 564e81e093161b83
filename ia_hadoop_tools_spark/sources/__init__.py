"""Source/sink connectors: ZipNum compat codec, file-listing, HTTP ingest."""

from ia_hadoop_tools_spark.sources.zipnum import (  # noqa: F401
    read_zipnum,
    write_zipnum,
    zipnum_range,
)
from ia_hadoop_tools_spark.sources.listing import (  # noqa: F401
    list_files_df,
    parse_date_filter,
    read_text_listing,
)
from ia_hadoop_tools_spark.sources.zipnum import (  # noqa: F401
    manifest_aggregator,
    summary_generator,
)
from ia_hadoop_tools_spark.sources.http import read_http_paged  # noqa: F401
