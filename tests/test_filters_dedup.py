from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.daylimit import day_limit
from ia_hadoop_tools_spark.operators.dedup import dedup_exact, dedup_first_per_key
from ia_hadoop_tools_spark.operators.filters import (
    access_control_filter,
    cdx_filter,
    global_wayback_filter,
    prefix_semi_filter,
)


def _cdx_row(urlkey, ts="20200101000000", status=200, meta=None, offset=1, fname="f.warc.gz"):
    return (
        urlkey, ts, "http://x/", "text/html", status,
        "DIGESTDIGESTDIGEST", None, meta, 100, offset, fname,
    )


CDX_DDL = (
    "urlkey string, timestamp string, original_url string, mimetype string, "
    "statuscode int, digest string, redirect string, meta_flags string, "
    "compressed_length long, compressed_offset long, filename string"
)


def test_cdx_filter_drops_pseudo_captures(spark):
    df = spark.createDataFrame(
        [
            _cdx_row("com,example)/"),
            _cdx_row("dns:example.com"),
            _cdx_row("filedesc:foo.arc"),
            _cdx_row("warcinfo:bar.warc"),
            _cdx_row(" CDX N b a"),
        ],
        CDX_DDL,
    )
    keys = [r.urlkey for r in cdx_filter(df).collect()]
    assert keys == ["com,example)/"]


def test_global_wayback_filter_rules(spark):
    rows = [
        _cdx_row("a)/ok"),
        _cdx_row("b)/noarchive", meta="A"),
        _cdx_row("c)/nostatus", status=None),
        _cdx_row("d)/live502", status=502, fname="live-20200101-x.arc.gz"),
        _cdx_row("e)/normal502", status=502),
    ]
    df = spark.createDataFrame(rows, CDX_DDL)
    # warc/revisit with null status survives
    revisit = spark.createDataFrame(
        [("f)/revisit", "20200101000000", "http://x/", "warc/revisit", None,
          "DIG", None, None, 100, 5, "f.warc.gz")], CDX_DDL)
    out = global_wayback_filter(df.unionByName(revisit))
    keys = sorted(r.urlkey for r in out.collect())
    assert keys == ["a)/ok", "e)/normal502", "f)/revisit"]
    assert all(len(r.digest) == 3 for r in out.collect())


def test_prefix_semi_filter(spark):
    df = spark.createDataFrame(
        [("com,example)/a",), ("com,other)/b",), ("org,example)/c",)], "urlkey: string"
    )
    out = prefix_semi_filter(df, ["com,example)", "org,"])
    assert sorted(r.urlkey for r in out.collect()) == ["com,example)/a", "org,example)/c"]
    assert prefix_semi_filter(df, []).count() == 0


def test_access_control_filter(spark):
    df = spark.createDataFrame(
        [("com,blocked)/secret",), ("com,open)/page",)], "urlkey: string"
    )
    rules = spark.createDataFrame(
        [("com,blocked)", "block"), ("com,open)", "allow")],
        "key_prefix: string, policy: string",
    )
    out = access_control_filter(df, rules)
    assert [r.urlkey for r in out.collect()] == ["com,open)/page"]


def test_dedup_exact(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k: int, v: string")
    assert dedup_exact(df).count() == 2


def test_dedup_first_per_key(spark):
    df = spark.createDataFrame(
        [(1, "20200102", "later"), (1, "20200101", "first"), (2, "20200101", "only")],
        "k: int, ts: string, payload: string",
    )
    out = {r.k: r.payload for r in dedup_first_per_key(df, ["k"], ["ts"]).collect()}
    assert out == {1: "first", 2: "only"}


def test_day_limit(spark):
    rows = [("u1", f"2020010100{i:02d}00") for i in range(5)]
    rows += [("u1", "20200102000000"), ("u2", "20200101000000")]
    df = spark.createDataFrame(rows, "urlkey: string, timestamp: string")
    out = day_limit(df, n=3)
    per_day = (
        out.groupBy("urlkey", F.substring("timestamp", 1, 8).alias("d")).count().collect()
    )
    assert all(r["count"] <= 3 for r in per_day)
    assert out.count() == 5  # 3 (u1 day1 capped) + 1 (u1 day2) + 1 (u2)
    kept = sorted(
        r.timestamp for r in out.filter("urlkey='u1'").collect() if r.timestamp.startswith("20200101")
    )
    assert kept == ["20200101000000", "20200101000100", "20200101000200"]  # earliest kept
