"""SCD2 snapshot-merge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.scd import (
    scd2_as_of,
    scd2_current,
    scd2_merge,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, valid_from string, valid_to string"
    )


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


def _merge(hist, snap, **kw):
    return scd2_merge(
        hist, snap, keys=("k",), tracked=("attr",), effective_ts="T1", **kw
    )


def test_scd2_change_closes_and_reopens(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    out = _merge(hist, _snap(spark, [(1, "b")])).collect()
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {(1, "a", "T0", "T1"), (1, "b", "T1", None)}


def test_scd2_unchanged_passes_through(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    out = _merge(hist, _snap(spark, [(1, "a")])).collect()
    assert {(r["k"], r["attr"], r["valid_to"]) for r in out} == {(1, "a", None)}


def test_scd2_new_key_inserts_open_row(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    out = _merge(hist, _snap(spark, [(1, "a"), (2, "x")])).collect()
    assert {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out} == {
        (1, "a", "T0", None),
        (2, "x", "T1", None),
    }


def test_scd2_missing_key_default_stays_open(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    out = _merge(hist, _snap(spark, [(9, "z")])).collect()
    assert {(r["k"], r["valid_to"]) for r in out} == {(1, None), (9, None)}


def test_scd2_close_missing(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    out = _merge(hist, _snap(spark, [(9, "z")]), close_missing=True).collect()
    assert {(r["k"], r["valid_to"]) for r in out} == {(1, "T1"), (9, None)}


def test_scd2_closed_history_untouched_and_null_attrs_stable(spark):
    hist = _hist(
        spark,
        [
            (1, "old", "T-1", "T0"),  # already closed: must pass through
            (1, None, "T0", None),  # current attr NULL
        ],
    )
    out = _merge(hist, _snap(spark, [(1, None)])).collect()  # unchanged (null == null)
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {(1, "old", "T-1", "T0"), (1, None, "T0", None)}


def test_scd2_current_and_as_of(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    h1 = _merge(hist, _snap(spark, [(1, "b")]))
    assert {(r["k"], r["attr"]) for r in scd2_current(h1).collect()} == {(1, "b")}
    # as-of T0 (T0 <= T0 < T1): the original version
    assert {(r["attr"]) for r in scd2_as_of(h1, "T0").collect()} == {"a"}
    assert {(r["attr"]) for r in scd2_as_of(h1, "T2").collect()} == {"b"}


def test_scd2_two_rounds_accumulate_history(spark):
    hist = _hist(spark, [(1, "a", "T0", None)])
    h1 = scd2_merge(hist, _snap(spark, [(1, "b")]), ("k",), ("attr",), "T1")
    h2 = scd2_merge(h1, _snap(spark, [(1, "c")]), ("k",), ("attr",), "T2")
    rows = {(r["attr"], r["valid_from"], r["valid_to"]) for r in h2.collect()}
    assert rows == {("a", "T0", "T1"), ("b", "T1", "T2"), ("c", "T2", None)}


def test_scd2_no_eager_jobs_on_construction(spark):
    """Building the merged DataFrame must launch zero Spark jobs."""
    hist = _hist(spark, [(1, "a", "T0", None)])
    snap = _snap(spark, [(1, "b")])
    sc = spark.sparkContext
    group = "lazy-scd2-construction-probe"
    sc.setJobGroup(group, "no jobs may appear here")
    try:
        _merge(hist, snap)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup("", "")
    assert list(jobs or []) == []


def test_scd2_preserves_date_typed_history_schema(spark):
    """Review repro: an uncast effective_ts literal made unionByName widen
    DATE valid_from/valid_to to string."""
    import datetime as dt

    from ia_hadoop_tools_spark.operators.scd import scd2_merge

    hist = spark.createDataFrame(
        [(1, "a", dt.date(2024, 1, 1), None)],
        "k long, attr string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame([(1, "b")], "k long, attr string")
    out = scd2_merge(
        hist, snap, keys=["k"], tracked=["attr"], effective_ts="2024-02-01"
    )
    dtypes = dict(out.dtypes)
    assert dtypes["valid_from"] == "date" and dtypes["valid_to"] == "date"
    rows = {(r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert ("a", dt.date(2024, 1, 1), dt.date(2024, 2, 1)) in rows
    assert ("b", dt.date(2024, 2, 1), None) in rows
