"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The real registry lives in
``ia_hadoop_tools_spark/driver_queries.py``; this file stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship slice (SURVEY.md §7.3): per-key-per-day top-N on the events
    stream, range-partition + sort into a cluster layout, bounded range scan.
    """
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.cluster import build_cluster
    from ia_hadoop_tools_spark.operators.daylimit import day_limit
    from ia_hadoop_tools_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    keyed = ev.select(
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("urlkey"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("timestamp"),
        "event_id",
        "event_type",
        "value",
    )
    capped = day_limit(keyed, n=5, tiebreakers=["event_id"])
    clustered = build_cluster(capped, num_ranges=4)
    return clustered.filter(
        (F.col("urlkey") >= "000002") & (F.col("urlkey") < "000015")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ia_hadoop_tools_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ia_hadoop_tools_spark.driver_queries import ORACLES

    return dict(ORACLES)
