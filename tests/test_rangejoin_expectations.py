"""Bucketized interval join + declarative expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.expectations import expectations, rule_name
from ia_hadoop_tools_spark.operators.rangejoin import interval_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _ivs(spark, rows):
    return (
        spark.createDataFrame(rows, "iid long, s string, e string")
        .withColumn("s", F.col("s").cast("timestamp"))
        .withColumn("e", F.col("e").cast("timestamp"))
    )


def test_interval_join_inclusive_bounds(spark):
    pts = _pts(
        spark,
        [
            (1, "2024-01-01 00:00:00"),  # == start: in
            (2, "2024-01-03 00:00:00"),  # == end: in
            (3, "2024-01-03 00:00:01"),  # past end: out
            (4, "2023-12-31 23:59:59"),  # before start: out
        ],
    )
    ivs = _ivs(spark, [(10, "2024-01-01 00:00:00", "2024-01-03 00:00:00")])
    got = sorted(
        r["pid"] for r in interval_join(pts, ivs, "ts", "s", "e").collect()
    )
    assert got == [1, 2]


def test_interval_join_matches_naive_cross(spark):
    pts = _pts(
        spark, [(i, f"2024-01-{(i % 27) + 1:02d} 12:00:00") for i in range(200)]
    )
    ivs = _ivs(
        spark,
        [
            (1, "2024-01-05 00:00:00", "2024-01-10 00:00:00"),
            (2, "2024-01-09 00:00:00", "2024-01-09 23:59:59"),  # overlaps 1
            (3, "2024-02-01 00:00:00", "2024-02-05 00:00:00"),  # empty
        ],
    )
    for width in (3600, 86400, 7 * 86400):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pts, ivs, "ts", "s", "e", bucket_width=width
            ).collect()
        )
        naive = sorted(
            (r["pid"], r["iid"])
            for r in pts.crossJoin(ivs)
            .filter((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
            .collect()
        )
        assert got == naive, width


def test_interval_join_rejects_outer(spark):
    pts = _pts(spark, [(1, "2024-01-01 00:00:00")])
    ivs = _ivs(spark, [(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")])
    with pytest.raises(ValueError):
        interval_join(pts, ivs, "ts", "s", "e", how="left")


def test_expectations_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (1, "ok", 50.0),  # dup key 1; 50 out of range
            (2, None, -1.0),  # null name; -1 out of range
            (3, "bad value", 7.0),  # fails regex + accepted_values
        ],
        "k long, name string, v double",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in expectations(
            df,
            [
                ("not_null", "name"),
                ("range", "v", 0, 10),
                ("accepted_values", "name", ("ok",)),
                ("regex", "name", "[a-z]+"),
                ("unique", "k"),
            ],
        ).collect()
    }
    assert out == {
        "not_null:name": 1,
        "range:v": 2,
        "accepted_values:name": 2,  # null + "bad value"
        "regex:name": 2,  # null + "bad value" (space fails [a-z]+)
        "unique:k": 1,
    }


def test_expectations_clean_table_and_errors(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    out = expectations(df, [("not_null", "k"), ("unique", "k")]).collect()
    assert all(r["n_violations"] == 0 for r in out)
    with pytest.raises(ValueError):
        expectations(df, [])
    with pytest.raises(ValueError):
        expectations(df, [("bogus", "k")])
    assert rule_name(("unique", "a", "b")) == "unique:a,b"


def test_interval_join_rejects_sentinel_blowup(spark):
    """An 'active until 9999' sentinel interval must fail loudly instead
    of exploding millions of bucket replicas."""
    import pytest
    from pyspark.sql import functions as F

    pts = spark.createDataFrame([(1, 1_700_000_000)], "pid long, t long").select(
        "pid", F.timestamp_seconds("t").alias("ts"))
    ivs = spark.createDataFrame(
        [(1, 1_600_000_000, 253_402_300_799)], "iid long, s long, e long"
    ).select("iid", F.timestamp_seconds("s").alias("s"),
             F.timestamp_seconds("e").alias("e"))
    from ia_hadoop_tools_spark.operators.rangejoin import interval_join

    with pytest.raises(Exception, match="spans more than"):
        interval_join(pts, ivs, "ts", "s", "e", bucket_width=3600).collect()
    # widening the width under the cap keeps it runnable
    got = interval_join(
        pts, ivs, "ts", "s", "e", bucket_width=10 * 365 * 86400
    ).collect()
    assert len(got) == 1


def test_interval_join_null_bounds_dropped_not_crashed(spark):
    """Advisor round-5: a NULL start/end made the blowup guard's
    otherwise-branch raise_error with an empty (NULL-concat) message.
    Open-ended intervals can never satisfy BETWEEN, so they must be
    silently dropped — and bounded intervals in the same frame still
    match (and a real sentinel still raises)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.rangejoin import interval_join

    pts = spark.createDataFrame(
        [(1, 1_700_000_000)], "pid long, t long"
    ).select("pid", F.timestamp_seconds("t").alias("ts"))
    ivs = spark.createDataFrame(
        [
            (1, 1_699_990_000, 1_700_010_000),  # bounded, matches
            (2, 1_699_990_000, None),  # open end -> dropped
            (3, None, 1_700_010_000),  # open start -> dropped
        ],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    got = interval_join(pts, ivs, "ts", "s", "e", bucket_width=3600).collect()
    assert [r.iid for r in got] == [1]


def test_expectations_duplicate_rules_and_null_unique(spark):
    """Two rules of one kind+column stay distinguishable (#2 suffix), and
    the unique test ignores NULL keys (dbt convention)."""
    from ia_hadoop_tools_spark.operators.expectations import expectations

    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, None), (4, None), (5, None)],
        "k long, v int",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in expectations(
            df,
            [("range", "v", 0, 10), ("range", "v", 0, 3), ("unique", "v")],
        ).collect()
    }
    assert set(out) == {"range:v", "range:v#2", "unique:v"}
    assert out["range:v"] == 0  # NULLs are not-null's job (documented)
    assert out["range:v#2"] == 2  # the two 5s exceed the strict range
    assert out["unique:v"] == 1  # two 5s -> 1 dup; NULLs ignored
