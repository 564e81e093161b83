"""cdx_transform (CDXTransformer.java:54-138 re-keying) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.rekey import cdx_transform


def _cdx_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "original_url: string, timestamp: string, meta_flags: string, "
        "compressed_offset: long",
    )


def test_rekey_basic_and_multipart_suffix(spark):
    df = _cdx_df(
        spark,
        [
            ("http://www.sub.example.com/a/b?x=1", "20200101000000", None, 10),
            ("https://news.bbc.co.uk/stories", "20200101000001", None, 20),
            ("http://example.org/", "20200101000002", None, 30),
        ],
    )
    out = {r.original_url: r for r in cdx_transform(df).collect()}

    r = out["http://www.sub.example.com/a/b?x=1"]
    assert r.pub_suffix_surt == "(com,example"
    assert r.public_prefix == "www.sub"
    assert r.path_query == "/a/b?x=1"
    assert r.scheme == "http"

    r = out["https://news.bbc.co.uk/stories"]
    assert r.pub_suffix_surt == "(uk,co,bbc"  # co.uk is a multi-part suffix
    assert r.public_prefix == "news"
    assert r.scheme == "https"

    r = out["http://example.org/"]
    assert r.pub_suffix_surt == "(org,example"
    assert r.public_prefix is None
    assert r.path_query == "/"


def test_rekey_drops_noarchive_and_bad_offset(spark):
    df = _cdx_df(
        spark,
        [
            ("http://keep.example.com/", "20200101000000", "-", 1),
            ("http://drop.example.com/", "20200101000001", "A", 2),  # noarchive
            ("http://droptoo.example.com/", "20200101000002", None, None),  # bad offset
            ("http://localhost/x", "20200101000003", None, 4),  # 1-label host
        ],
    )
    urls = [r.original_url for r in cdx_transform(df).collect()]
    assert urls == ["http://keep.example.com/"]


def test_rekey_query_path_only(spark):
    df = _cdx_df(spark, [("http://a.example.net?q=1", "20200101000000", None, 1)])
    r = cdx_transform(df).collect()[0]
    assert r.path_query == "?q=1"


def test_ann_ivf_matches_bruteforce_on_probed_cells(spark):
    """With num_centroids >= n every vector is its own centroid and
    nprobe == n_cells makes IVF exhaustive — it must equal brute force."""
    from ia_hadoop_tools_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(20)]
    e = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = e.filter(F.col("vec_id") < 2)
    exact = ann_bruteforce_topk(e, q, k=5)
    ivf = ann_ivf_topk(e, q, k=5, num_centroids=20, nprobe=20)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, ivf.collect()))


def test_ann_ivf_centroid_count_is_corpus_independent(spark):
    """The quantizer must select exactly num_centroids regardless of corpus
    size — the round-2 stride rule grew the centroid set (and its broadcast)
    linearly with n, which was the engine's one remaining scale-killer."""
    from ia_hadoop_tools_spark.operators.similarity import ann_ivf_topk

    for n in (50, 400):
        rows = [
            (i, [float((i * 13 + j * 5) % 17) for j in range(4)])
            for i in range(n)
        ]
        e = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        q = e.filter(F.col("vec_id") < 2)
        out = ann_ivf_topk(e, q, k=3, num_centroids=8, nprobe=2)
        # smoke the result; the structural claim is checked via the plan
        assert out.count() > 0
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "GlobalLimit 8" in plan or "limit=8" in plan or "Limit 8" in plan


def test_rekey_mixed_case_scheme_not_dropped(spark):
    df = _cdx_df(
        spark, [("HTTP://Sub.Example.COM/page", "20200101000000", None, 10)]
    )
    out = cdx_transform(df).collect()
    assert len(out) == 1  # lowercase-only scheme anchor used to drop it
    assert out[0]["pub_suffix_surt"] == "(com,example"
