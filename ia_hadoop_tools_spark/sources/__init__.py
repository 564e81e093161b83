"""Source/sink connectors: ZipNum compat codec, file-listing, HTTP ingest."""

from ia_hadoop_tools_spark.sources.zipnum import (  # noqa: F401
    read_zipnum,
    write_zipnum,
    zipnum_range,
)
from ia_hadoop_tools_spark.sources.listing import list_files_df  # noqa: F401
