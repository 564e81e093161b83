"""Skew-mitigation helpers: salted join / salted distinct equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.plans.skew import salted_distinct_count, salted_join


def test_salted_join_equals_plain_join(spark):
    # one monster key (90% of rows) + a tail
    rows = [(0, i) for i in range(900)] + [(k, k * 10) for k in range(1, 101)]
    skewed = spark.createDataFrame(rows, "k: long, v: long")
    other = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 101)], "k: long, name: string"
    )
    plain = skewed.join(other, "k").select("k", "v", "name")
    salted = salted_join(skewed, other, "k", n_salt=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert plain.count() == 1000


def test_salted_join_left_outer(spark):
    skewed = spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string")
    other = spark.createDataFrame([(1, "x")], "k: long, w: string")
    out = {
        tuple(r)
        for r in salted_join(skewed, other, "k", n_salt=4, how="left").collect()
    }
    assert out == {(1, "a", "x"), (2, "b", None)}


def test_salted_distinct_count(spark):
    rows = (
        [(0, f"u{i % 37}") for i in range(500)]  # hot key, 37 distinct
        + [(1, "a"), (1, "a"), (1, "b"), (2, "z")]
    )
    df = spark.createDataFrame(rows, "k: long, u: string")
    got = {
        r.k: r.n_distinct
        for r in salted_distinct_count(df, ["k"], "u", n_salt=8).collect()
    }
    assert got == {0: 37, 1: 2, 2: 1}
    exact = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == exact


def test_salted_join_rejects_outer_joins(spark):
    """The replicated right side would duplicate unmatched outer rows
    n_salt times — outer hows must be rejected, not silently wrong."""
    import pytest

    from ia_hadoop_tools_spark.plans.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(2, "y")], "k long, w string")
    for how in ("right", "full", "outer", "left_anti", "left_semi"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(a, b, "k", n_salt=4, how=how)
    # left join: unmatched LEFT rows survive exactly once
    got = salted_join(a, b, "k", n_salt=4, how="left").collect()
    assert len(got) == 1 and got[0]["w"] is None


def test_cap_group_population_identity_below_cap(spark):
    from ia_hadoop_tools_spark.plans.skew import cap_group_population

    df = spark.createDataFrame(
        [(d, u, 10 - u) for d in range(3) for u in range(5)],
        "d int, u int, nd int",
    )
    out = cap_group_population(df, ["d"], [F.col("nd").desc(), "u"], 5, "t")
    got = sorted((r.d, r.u) for r in out.collect())
    assert got == sorted((d, u) for d in range(3) for u in range(5))
    assert out.cap_obs.get["dropped_rows"] == 0
    # max_n=None passes the frame through untouched
    assert cap_group_population(df, ["d"], ["u"], None, "t") is df


def test_cap_group_population_caps_deterministically(spark):
    from ia_hadoop_tools_spark.plans.skew import cap_group_population

    # group d=0 has 6 members with activity nd; cap 3 must keep the three
    # highest-nd (ties by u asc) regardless of input order
    rows = [(0, u, nd) for u, nd in [(5, 9), (1, 9), (4, 7), (2, 7), (3, 1), (6, 1)]]
    rows += [(1, u, 5) for u in range(2)]  # under-cap group untouched
    df = spark.createDataFrame(rows, "d int, u int, nd int")
    out = cap_group_population(df, ["d"], [F.col("nd").desc(), "u"], 3, "t")
    got = {d: sorted(u for dd, u in grp) for d, grp in __import__("itertools").groupby(
        sorted((r.d, r.u) for r in out.collect()), key=lambda t: t[0])}
    assert got == {0: [1, 2, 5], 1: [0, 1]}
    assert out.cap_obs.get["dropped_rows"] == 3


def test_cap_group_population_rejects_bad_cap(spark):
    import pytest

    from ia_hadoop_tools_spark.plans.skew import cap_group_population

    df = spark.createDataFrame([(1, 1)], "d int, u int")
    with pytest.raises(ValueError, match="max_n"):
        cap_group_population(df, ["d"], ["u"], 0, "t")
