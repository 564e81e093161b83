"""SQL surface (sql.py): registered names, SQL == DataFrame parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.datetime14 import (
    timestamp_to_ts14,
    ts14_to_epoch_millis,
    ts14_to_timestamp,
)
from ia_hadoop_tools_spark.sql import register_sql_surface

SAMPLES = [
    "20200101123456",
    "20200101123456789",  # 17-digit with millis
    "2020010112345",  # bad length -> null
    "2020a101123456",  # non-numeric -> null
    None,
]


def test_ts14_sql_equals_dataframe(spark):
    register_sql_surface(spark)
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s: string")
    df.createOrReplaceTempView("__ts14_samples")
    via_sql = spark.sql(
        "SELECT ts14_to_ts(s) AS t, ts14_to_ms(s) AS ms, day14(s) AS d "
        "FROM __ts14_samples"
    ).collect()
    via_df = df.select(
        ts14_to_timestamp("s").alias("t"),
        ts14_to_epoch_millis("s").alias("ms"),
        F.substring("s", 1, 8).alias("d"),
    ).collect()
    assert via_sql == via_df
    # sanity on the 17-digit row: millis actually arrive
    assert via_sql[1].ms == via_sql[0].ms + 789


def test_ts_to_ts14_roundtrip(spark):
    register_sql_surface(spark)
    row = spark.sql(
        "SELECT ts_to_ts14(ts14_to_ts('20200101123456')) AS s"
    ).first()
    assert row.s == "20200101123456"
    via_df = (
        spark.createDataFrame([("20200101123456",)], "s: string")
        .select(timestamp_to_ts14(ts14_to_timestamp("s")).alias("s"))
        .first()
    )
    assert via_df.s == row.s


def test_surt_and_sources_registered(spark):
    register_sql_surface(spark)
    got = spark.sql(
        "SELECT surt('http://www.Example.com/Path?b=2&a=1') AS k"
    ).first()
    assert got.k.startswith("com,example)")
    # data sources resolve by name (error would be CLASS_NOT_FOUND-style)
    assert spark.read.format("sortedkv") is not None
    assert spark.read.format("zipnum") is not None
