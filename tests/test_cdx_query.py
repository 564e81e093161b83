"""CDX Server-style query API (operators/cdx_query.py)."""

from __future__ import annotations

import pytest

from ia_hadoop_tools_spark.operators.cdx_query import cdx_query


@pytest.fixture(scope="module")
def cluster(spark):
    rows = [
        # urlkey, ts, url, mime, status, digest
        ("com,example)/", "20200101000000", "http://example.com/", "text/html", 200, "D1"),
        ("com,example)/", "20200101120000", "http://example.com/", "text/html", 200, "D1"),
        ("com,example)/", "20200102000000", "http://example.com/", "text/html", 404, "D2"),
        ("com,example)/page", "20200103000000", "http://example.com/page", "text/html", 200, "D3"),
        ("com,example,sub)/x", "20200104000000", "http://sub.example.com/x", "text/html", 200, "D4"),
        ("com,examplezz)/", "20200105000000", "http://examplezz.com/", "text/html", 200, "D5"),
        ("org,other)/", "20200106000000", "http://other.org/", "warc/revisit", None, "D6"),
    ]
    full = [
        (k, t, u, m, s, d, None, None, 10, 99, "f.warc.gz")
        for k, t, u, m, s, d in rows
    ]
    return spark.createDataFrame(
        full,
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, "
        "redirect: string, meta_flags: string, compressed_length: long, "
        "compressed_offset: long, filename: string",
    )


def _keys(df):
    return [(r.urlkey, r.timestamp) for r in df.collect()]


def test_match_types(cluster):
    assert len(_keys(cdx_query(cluster, "http://example.com/"))) == 3
    assert len(_keys(cdx_query(cluster, "http://example.com/", "prefix"))) == 4
    # host: example.com pages but NOT sub.example.com, NOT examplezz.com
    host = _keys(cdx_query(cluster, "http://example.com/other", "host"))
    assert {k for k, _ in host} == {"com,example)/", "com,example)/page"}
    # domain: subdomains included, examplezz still excluded
    dom = _keys(cdx_query(cluster, "http://example.com/", "domain"))
    assert {k for k, _ in dom} == {
        "com,example)/", "com,example)/page", "com,example,sub)/x"
    }


def test_time_bounds_and_filters(cluster):
    got = _keys(
        cdx_query(
            cluster, "http://example.com/", "domain",
            from_ts="20200102", to_ts="20200103",
        )
    )
    assert [t for _, t in got] == ["20200102000000", "20200103000000"]
    ok = cdx_query(
        cluster, "http://example.com/", "domain", filters=["status:200"]
    )
    assert all(r.statuscode == 200 for r in ok.collect())
    neg = cdx_query(
        cluster, "http://other.org/", "host", filters=["!mime:text/.*"]
    )
    assert [r.mimetype for r in neg.collect()] == ["warc/revisit"]
    # null fields render as '-' for filtering (classic CDX-server behavior)
    nul = cdx_query(
        cluster, "http://other.org/", "host", filters=["status:200"]
    )
    assert nul.count() == 0
    dash = cdx_query(
        cluster, "http://other.org/", "host", filters=["status:-"]
    )
    assert dash.count() == 1  # the null-status revisit row matches '-'
    anyv = cdx_query(
        cluster, "http://other.org/", "host", filters=["status:.*"]
    )
    assert anyv.count() == 1  # '.*' matches the rendered '-' too


def test_collapse_and_limit(cluster):
    # one per (urlkey, day): the two 20200101 exact captures collapse to the
    # earliest
    c = _keys(
        cdx_query(cluster, "http://example.com/", collapse="timestamp:8")
    )
    assert c == [("com,example)/", "20200101000000"), ("com,example)/", "20200102000000")]
    d = _keys(
        cdx_query(cluster, "http://example.com/", collapse="digest")
    )
    assert d == [("com,example)/", "20200101000000"), ("com,example)/", "20200102000000")]
    lim = cdx_query(cluster, "http://example.com/", "domain", limit=2)
    assert len(_keys(lim)) == 2
    assert cdx_query(cluster, "http://example.com/", limit=0).count() == 0
    with pytest.raises(ValueError, match="limit"):
        cdx_query(cluster, "http://example.com/", limit=-1)


def test_collapse_is_adjacent_only(spark):
    """pywb collapse merges RUNS: a value that reappears non-adjacently
    survives (D1, D2, D1 -> three rows)."""
    rows = [
        ("com,a)/", "20200101000000", "http://a.com/", "text/html", 200, "D1"),
        ("com,a)/", "20200102000000", "http://a.com/", "text/html", 200, "D2"),
        ("com,a)/", "20200103000000", "http://a.com/", "text/html", 200, "D1"),
        ("com,a)/", "20200103010000", "http://a.com/", "text/html", 200, "D1"),
    ]
    df = spark.createDataFrame(
        [(k, t, u, m, s_, d, None, None, 1, 2, "f") for k, t, u, m, s_, d in rows],
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    got = [r.timestamp for r in cdx_query(df, "http://a.com/", collapse="digest").collect()]
    # the adjacent D1 pair merges; the non-adjacent D1 reappearance stays
    assert got == ["20200101000000", "20200102000000", "20200103000000"]


def test_urlkey_predicate_reaches_pushed_filters(spark, tmp_path):
    """The query key is a driver-side literal, so the key bound must land
    in the parquet scan's PushedFilters (row-group pruning on a sorted
    cluster)."""
    from ia_hadoop_tools_spark.operators.cluster import write_cluster

    rows = [
        (f"com,s{i % 9})/p{i % 4}", f"2020010{i % 9 + 1}000000",
         f"http://s{i % 9}.com/p{i % 4}", "text/html", 200, f"D{i}",
         None, None, 1, i, "f.warc.gz")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    path = str(tmp_path / "qcluster")
    write_cluster(df, path, num_ranges=3)
    q = cdx_query(spark.read.parquet(path), "http://s3.com/", "host")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "StringStartsWith(urlkey,com,s3)" in plan
    assert q.count() > 0


def test_segmented_collapse_identical_to_single_window(spark):
    """The day-segmented collapse (mega-URL skew fix) must be BIT-IDENTICAL
    to the single per-urlkey window, including same-day runs crossing
    segment boundaries, null collapse values, and multi-key mixes."""
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(600):
        k = f"com,s{i % 3})/"
        day = rnd.randint(1, 9)
        ts = f"2020010{day}{rnd.randint(0, 23):02d}{rnd.randint(0, 59):02d}00"
        dig = rnd.choice(["D1", "D1", "D2", None])  # runs + nulls
        rows.append(
            (k, ts, f"http://s{i % 3}.com/", "text/html", 200, dig,
             None, None, 1, i, "f")
        )
    df = spark.createDataFrame(
        rows,
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    for coll in ("digest", "timestamp:8", "timestamp:10"):
        seg = cdx_query(df, "http://s1.com/", collapse=coll).collect()
        single = cdx_query(
            df, "http://s1.com/", collapse=coll, collapse_segment=None
        ).collect()
        assert seg == single, coll
    with pytest.raises(ValueError, match="collapse_segment"):
        cdx_query(df, "http://s1.com/", collapse="digest", collapse_segment=0)


def test_sort_reverse(cluster):
    got = _keys(cdx_query(cluster, "http://example.com/", sort="reverse"))
    fwd = _keys(cdx_query(cluster, "http://example.com/"))
    assert got == list(reversed(fwd))
    # reverse + limit = the LATEST capture
    last = _keys(cdx_query(cluster, "http://example.com/", sort="reverse", limit=1))
    assert last == [("com,example)/", "20200102000000")]


def test_sort_closest(spark):
    """Wayback's nearest-to-T lookup: distance is measured in SECONDS, so a
    capture one second before midnight New Year beats one a day after —
    raw ts14 numeric distance would invert that."""
    rows = [
        ("com,a)/", "20191231235959"),  # 1 s before target
        ("com,a)/", "20200102000000"),  # 1 day after
        ("com,a)/", "20200101000030"),  # 30 s after
        ("com,a)/", "20200103000000"),
    ]
    df = spark.createDataFrame(
        [(k, t, "http://a.com/", "text/html", 200, "D", None, None, 1, 2, "f")
         for k, t in rows],
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    got = [t for _, t in _keys(
        cdx_query(df, "http://a.com/", sort="closest", closest="20200101")
    )]
    assert got == [
        "20191231235959", "20200101000030", "20200102000000", "20200103000000"
    ]
    # nearest-1 with a limit
    one = _keys(cdx_query(
        df, "http://a.com/", sort="closest", closest="20200101", limit=1
    ))
    assert one == [("com,a)/", "20191231235959")]


def test_sort_closest_partial_target_and_dirty_timestamps(spark):
    """A 4/6-digit closest target pads to a VALID calendar date (2020 ->
    20200101000000, not 20200000000000 whose to_date is NULL), and a
    capture with a non-calendar timestamp ranks FARTHEST, never nearest."""
    rows = [
        ("com,a)/", "20191231235959"),
        ("com,a)/", "20200230123456"),  # Feb 30: dirty real-world CDX data
        ("com,a)/", "20200103000000"),
    ]
    df = spark.createDataFrame(
        [(k, t, "http://a.com/", "text/html", 200, "D", None, None, 1, 2, "f")
         for k, t in rows],
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    got = [t for _, t in _keys(
        cdx_query(df, "http://a.com/", sort="closest", closest="2020")
    )]
    # target = 20200101000000: the New Year's Eve capture is 1 s away; the
    # malformed Feb 30 row is unrankable and must come LAST
    assert got == ["20191231235959", "20200103000000", "20200230123456"]
    with pytest.raises(ValueError, match="closest"):
        cdx_query(df, "http://a.com/", sort="closest", closest="202")


def test_sort_closest_tie_breaks_earlier(spark):
    """Equidistant captures before/after T resolve to the EARLIER one."""
    df = spark.createDataFrame(
        [("com,a)/", t, "http://a.com/", "text/html", 200, "D", None, None,
          1, 2, "f")
         for t in ("20200101000000", "20200101002000")],
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    got = _keys(cdx_query(
        df, "http://a.com/", sort="closest", closest="20200101001000", limit=1
    ))
    assert got == [("com,a)/", "20200101000000")]


def test_closest_keeps_pushdown_and_bounded_topk(spark, tmp_path):
    """sort=closest on a parquet cluster: the exact-match key stays a
    pushable literal (EqualTo in PushedFilters — row-group pruning on the
    sorted layout) and the nearest-k is TakeOrderedAndProject (bounded
    per-partition heaps), never a full sort."""
    from ia_hadoop_tools_spark.operators.cluster import write_cluster

    rows = [
        (f"com,s{i % 9})/p{i % 4}", f"2020010{i % 9 + 1}000000",
         f"http://s{i % 9}.com/p{i % 4}", "text/html", 200, f"D{i}",
         None, None, 1, i, "f.warc.gz")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey: string, timestamp: string, original_url: string, "
        "mimetype: string, statuscode: int, digest: string, redirect: string, "
        "meta_flags: string, compressed_length: long, compressed_offset: long, "
        "filename: string",
    )
    path = str(tmp_path / "ccluster")
    write_cluster(df, path, num_ranges=3)
    q = cdx_query(
        spark.read.parquet(path), "http://s3.com/p2",
        sort="closest", closest="20200105", limit=3,
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "EqualTo(urlkey,com,s3)/p2" in plan
    assert "TakeOrderedAndProject" in plan
    got = [r.timestamp for r in q.collect()]
    # every capture of com,s3)/p2 lands on day 4 (i = 30 mod 36 fixes the
    # day); nearest-3 to the 20200105 target is that same-day trio
    assert got == ["20200104000000"] * 3


def test_bad_specs_raise(cluster):
    with pytest.raises(ValueError, match="match_type"):
        cdx_query(cluster, "http://example.com/", "fuzzy")
    with pytest.raises(ValueError, match="filter"):
        cdx_query(cluster, "http://example.com/", filters=["statuscode=200"])
    with pytest.raises(ValueError, match="unknown CDX field"):
        cdx_query(cluster, "http://example.com/", filters=["stattus:200"])
    with pytest.raises(ValueError, match="sort"):
        cdx_query(cluster, "http://example.com/", sort="fuzzy")
    with pytest.raises(ValueError, match="closest"):
        cdx_query(cluster, "http://example.com/", sort="closest")
    with pytest.raises(ValueError, match="closest"):
        cdx_query(cluster, "http://example.com/", closest="20200101")
    with pytest.raises(ValueError, match="digit"):
        cdx_query(cluster, "http://example.com/", sort="closest", closest="x")


def test_query_over_zipnum_cluster(spark, tmp_path):
    """The full user story: ZipNum cluster on disk -> zipnum DataSource scan
    (block pruning) -> parse -> CDX-Server lookup."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.parse import parse_cdx
    from ia_hadoop_tools_spark.sources.zipnum import write_zipnum
    from ia_hadoop_tools_spark.sources.zipnum_datasource import register_zipnum

    lines = [
        f"com,site{i % 5})/p{i % 3} 2020010{i % 9 + 1}000000 "
        f"http://site{i % 5}.com/p{i % 3} text/html "
        f"{200 if i % 4 else 404} DIG{i} - - 10 {i * 7} f.warc.gz"
        for i in range(300)
    ]
    df = spark.createDataFrame([(l,) for l in sorted(lines)], "value: string")
    cluster_dir = str(tmp_path / "cluster")
    write_zipnum(df, cluster_dir, lines_per_block=30, num_shards=2)

    register_zipnum(spark)
    raw = (
        spark.read.format("zipnum")
        .load(cluster_dir)
        # pushed range narrows the block scan before parsing anything
        .filter((F.col("urlkey") >= "com,site2)") & (F.col("urlkey") < "com,site3)"))
    )
    typed = parse_cdx(raw.select("value"))
    got = cdx_query(
        typed, "http://site2.com/x", match_type="host", filters=["status:200"]
    ).collect()
    assert got and all(
        r.urlkey.startswith("com,site2)") and r.statuscode == 200 for r in got
    )
    expected = sum(
        1 for i in range(300) if i % 5 == 2 and i % 4 != 0
    )
    assert len(got) == expected


def test_offset_and_fields(cluster):
    """pywb paging + projection params: offset skips n rows of the final
    order before limit; fl= projects named fields (aliases resolve) after
    filters/collapse have seen the full row."""
    base = _keys(cdx_query(cluster, "http://example.com/", "domain"))
    # offset composes with limit: rows [1:3] of the un-offset order
    page = _keys(
        cdx_query(cluster, "http://example.com/", "domain", offset=1, limit=2)
    )
    assert page == base[1:3]
    # offset past the end -> empty, not an error
    assert (
        _keys(cdx_query(cluster, "http://example.com/", "domain", offset=99))
        == []
    )
    # fields projects and resolves pywb aliases; order preserved
    df = cdx_query(
        cluster, "http://example.com/", "domain", fields=["urlkey", "timestamp"]
    )
    assert df.columns == ["urlkey", "timestamp"]
    assert [tuple(r) for r in df.collect()] == base
    # pywb alias names are PRESERVED in the output (fl=status reads
    # row["status"], not the canonical "statuscode")
    al = cdx_query(
        cluster, "http://example.com/", fields=["status", "length"]
    )
    assert al.columns == ["status", "length"]
    assert [r.status for r in al.collect()] == [200, 200, 404]
    # offset composes with sort=reverse
    rev = _keys(cdx_query(cluster, "http://example.com/", sort="reverse"))
    assert _keys(
        cdx_query(cluster, "http://example.com/", sort="reverse", offset=1)
    ) == rev[1:]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdx_query(cluster, "http://example.com/", offset=-1)
    with _pytest.raises(ValueError):
        cdx_query(cluster, "http://example.com/", fields=["nope"])


def test_collapse_renders_nulls_as_dash(spark):
    """Review repro (verified live): collapse on a nullable field must
    compare the RENDERED '-' form — a null digest after a non-null one
    was dropped, and adjacent null repeats survived."""
    rows = [
        ("com,a)/", "20200101000000", "http://a.com/", "text/html", 200,
         "D1", 1, "f.warc.gz"),
        ("com,a)/", "20200102000000", "http://a.com/", "warc/revisit", None,
         None, 2, "f.warc.gz"),
        ("com,a)/", "20200103000000", "http://a.com/", "warc/revisit", None,
         None, 3, "f.warc.gz"),
        ("com,a)/", "20200104000000", "http://a.com/", "text/html", 200,
         "D2", 4, "f.warc.gz"),
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey string, timestamp string, original_url string, "
        "mimetype string, statuscode int, digest string, "
        "compressed_offset long, filename string",
    )
    got = [
        r.timestamp
        for r in cdx_query(df, "http://a.com/", collapse="digest").collect()
    ]
    # pywb: keep 01 (D1), keep 02 ('-' != 'D1'), drop 03 ('-' == '-'),
    # keep 04 ('D2' != '-')
    assert got == ["20200101000000", "20200102000000", "20200104000000"]


def test_closest_rejects_odd_length_prefix(spark):
    import pytest

    df = spark.createDataFrame(
        [("com,a)/", "20200101000000", "http://a.com/", None, None, None,
          1, "f.warc.gz")],
        "urlkey string, timestamp string, original_url string, "
        "mimetype string, statuscode int, digest string, "
        "compressed_offset long, filename string",
    )
    with pytest.raises(ValueError, match="field boundary"):
        cdx_query(df, "http://a.com/", sort="closest", closest="20205")


def test_closest_invalid_time_of_day_ranks_farthest(spark):
    """Hour 99 must not out-rank a real capture (it used to produce a
    finite bogus distance)."""
    rows = [
        ("com,a)/", "20200101990000", "http://a.com/", None, None, None,
         1, "f.warc.gz"),
        ("com,a)/", "20200102000000", "http://a.com/", None, None, None,
         2, "f.warc.gz"),
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey string, timestamp string, original_url string, "
        "mimetype string, statuscode int, digest string, "
        "compressed_offset long, filename string",
    )
    got = [
        r.timestamp
        for r in cdx_query(
            df, "http://a.com/", sort="closest", closest="20200105000000"
        ).collect()
    ]
    assert got == ["20200102000000", "20200101990000"]
