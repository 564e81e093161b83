"""JSON map conversions + Petabox metadata parsing.

Reference: pig/udf/ToJsonFunc.java:18-34 / FromJsonFunc.java:18-51 (map <->
JSON string; FromJson keeps only string-valued keys) and the Petabox item
metadata JSON (petabox/ItemMetadata.java, fixture src/test/resources/org/
archive/petabox/metadata-regular.json).

Spark: built-in ``to_json`` / ``from_json`` — JVM-side Jackson, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from ia_hadoop_tools_spark.schemas import PETABOX_ITEM_SCHEMA


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def map_to_json(col: Column | str) -> Column:
    """map<string,string> -> JSON object string (ToJsonFunc)."""
    return F.to_json(_c(col))


def json_to_map(col: Column | str) -> Column:
    """JSON object string -> map<string,string>; null on malformed input.

    Non-string JSON values are stringified rather than dropped (a relaxation
    of FromJsonFunc.java:34-44, which skipped non-string values; stringifying
    loses nothing and keeps the function total).
    """
    return F.from_json(_c(col), MapType(StringType(), StringType()))


def parse_petabox_metadata(col: Column | str) -> Column:
    """Petabox item metadata JSON -> typed struct (files as array<struct>)."""
    return F.from_json(_c(col), PETABOX_ITEM_SCHEMA)
