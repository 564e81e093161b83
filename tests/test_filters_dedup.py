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


def test_global_wayback_rule4_warc_exemption_and_null_safety(spark):
    """Reference parity (GlobalWaybackMergeMapper.java:107-109): the
    502/504 live-web drop sits inside the NON-warc branch, so warc/*
    rows ride — including a warc row with a real 502, and a warc row
    with a NULL statuscode from a live- file (the old unguarded isin
    made the whole predicate NULL and ~NULL dropped it)."""
    rows = [
        ("w)/warc502", "20200101000000", "http://x/", "warc/revisit", 502,
         "DIGEST", None, None, 100, 5, "live-20200101-x.arc.gz"),
        ("x)/warcnull-live", "20200101000000", "http://x/", "warc/revisit",
         None, "DIGEST", None, None, 100, 5, "live-20200101-x.arc.gz"),
        ("y)/html502-live", "20200101000000", "http://x/", "text/html", 502,
         "DIGEST", None, None, 100, 5, "live-20200101-x.arc.gz"),
    ]
    df = spark.createDataFrame(rows, CDX_DDL)
    keys = sorted(r.urlkey for r in global_wayback_filter(df).collect())
    assert keys == ["w)/warc502", "x)/warcnull-live"]


def test_merge_clusters_daily_limit_zero_means_unlimited(spark, tmp_path):
    """cdx.daily.limit=0 disables the cap in the reference — a ported
    config must not silently empty the output."""
    from ia_hadoop_tools_spark.operators.merge import merge_clusters

    rows = [("k)/u", f"202001010000{i:02d}", "http://u/", "text/html", 200,
             "DIG", None, None, 10, 1, "f.arc.gz") for i in range(5)]
    df = spark.createDataFrame(rows, CDX_DDL)
    out = merge_clusters([df], num_ranges=1, daily_limit=0)
    assert out.count() == 5


def test_global_wayback_filter_warc_gate_is_contains_not_startswith(spark):
    """Reference parity (GlobalWaybackMergeMapper.java:106): the warc
    exemption is mime.contains("warc/") — a mimetype carrying 'warc/'
    NOT at the start must still ride through rules 2 and 4."""
    rows = [
        # null status, warc/ mid-string: rule 2 must keep it
        ("a)/mid", "20200101000000", "http://x/", "x-old/warc/revisit", None,
         "D1", None, 10, "f.arc.gz"),
        # 502 from live-20*.arc.gz with warc/ mid-string: rule 4 exempts
        ("b)/mid502", "20200101000000", "http://x/", "x-old/warc/revisit",
         502, "D2", None, 11, "live-20120101.arc.gz"),
        # 502 from live with a PLAIN mimetype: still dropped
        ("c)/plain502", "20200101000000", "http://x/", "text/html", 502,
         "D3", None, 12, "live-20120101.arc.gz"),
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey string, timestamp string, original string, mimetype string, "
        "statuscode int, digest string, meta_flags string, "
        "compressed_offset long, filename string",
    )
    keys = sorted(r.urlkey for r in global_wayback_filter(df).collect())
    assert keys == ["a)/mid", "b)/mid502"]


def test_day_limit_zero_means_unlimited_and_ties_deterministic(spark):
    """Reference parity: cdx.daily.limit=0 disables the cap (it used to
    silently empty the output); same-second ties order by the remaining
    columns, so survivors are partition-layout-independent."""
    import pytest

    from ia_hadoop_tools_spark.operators.daylimit import day_limit

    rows = [
        ("k", "20200101120000", f"f{i}.warc.gz") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "urlkey string, timestamp string, filename string")
    assert day_limit(df, n=0).count() == 40  # unlimited
    with pytest.raises(ValueError, match=">= 0"):
        day_limit(df, n=-1)
    # all 40 captures share one (key, day, ts): the survivors must be the
    # filename-sorted prefix regardless of partitioning
    a = sorted(r.filename for r in day_limit(df, n=5).collect())
    b = sorted(
        r.filename for r in day_limit(df.repartition(13), n=5).collect()
    )
    want = sorted(f"f{i}.warc.gz" for i in range(40))[:5]
    assert a == b == want


def test_day_limit_arrival_order_compat_golden(spark):
    """Arrival-order compat mode reproduces the reference's survivor
    selection (GlobalWaybackMergeMapper.java:53-83: first n per
    (url, day) in stream order) on a >n-per-day fixture whose arrival
    order deliberately disagrees with the canonical timestamp order."""
    import pytest

    from ia_hadoop_tools_spark.operators.daylimit import day_limit

    # stream as the reference merge sort would deliver it: sorted by
    # (urlkey, timestamp) with same-second bursts whose file order is NOT
    # the digest/filename order the canonical mode would pick
    stream = [
        # (urlkey, timestamp, filename)  -- pos = arrival order
        ("com,a)/", "20200101000001", "z.warc.gz"),
        ("com,a)/", "20200101000001", "y.warc.gz"),
        ("com,a)/", "20200101000001", "a.warc.gz"),
        ("com,a)/", "20200101000002", "m.warc.gz"),
        ("com,a)/", "20200102000000", "q.warc.gz"),
        ("com,b)/", "20200101000001", "w.warc.gz"),
        ("com,b)/", "20200101000001", "b.warc.gz"),
        ("com,b)/", "20200101000001", "c.warc.gz"),
    ]
    n = 2

    # the reference loop (counting semantics normalized to exactly-n,
    # the documented off-by-one note in day_limit's docstring)
    want, counts = [], {}
    for pos, (u, ts, fn) in enumerate(stream):
        k = (u, ts[:8])
        c = counts.get(k, 0)
        if c < n:
            want.append((u, ts, fn))
        counts[k] = c + 1

    rows = [(u, ts, fn, pos) for pos, (u, ts, fn) in enumerate(stream)]
    df = spark.createDataFrame(
        rows, "urlkey string, timestamp string, filename string, pos long"
    )
    got = sorted(
        (r.urlkey, r.timestamp, r.filename)
        for r in day_limit(df.repartition(5), n=n, arrival_col="pos").collect()
    )
    assert got == sorted(want)
    # the fixture is chosen so canonical mode picks DIFFERENT survivors
    canon = sorted(
        (r.urlkey, r.timestamp, r.filename)
        for r in day_limit(df.drop("pos"), n=n).collect()
    )
    assert canon != got
