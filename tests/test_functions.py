from __future__ import annotations

import json

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.datetime14 import (
    timestamp_to_ts14,
    ts14_to_epoch_millis,
    ts14_to_timestamp,
)
from ia_hadoop_tools_spark.functions.hashfns import hash32, minhash_permutations
from ia_hadoop_tools_spark.functions.jsonfns import json_to_map, map_to_json, parse_petabox_metadata
from ia_hadoop_tools_spark.functions.surt import _surt_one, surt_expr, surt_udf
from ia_hadoop_tools_spark.functions.urlfns import url_resolve_udf
from ia_hadoop_tools_spark.functions.vectorfns import cosine_similarity, dot_product


def test_surt_python_semantics():
    assert _surt_one("http://www.Example.com/Path?b=2&a=1") == "com,example)/path?a=1&b=2"
    assert _surt_one("https://archive.org:443/details/x") == "org,archive)/details/x"
    assert _surt_one("http://example.com:8080/") == "com,example:8080)/"
    assert _surt_one("http://109.123.78.101/robots.txt") == "101,78,123,109)/robots.txt"
    assert _surt_one("http://www2.foo.org") == "org,foo)/"
    assert _surt_one("http://a.b/p?JSESSIONID=1&x=2") == "b,a)/p?x=2"
    assert _surt_one(None) is None


# Golden: URL -> SURT key pairs taken verbatim from the reference's own CDX
# fixture lines (pig/CDXLoaderTest.java:60,87,104 — field 1 is the SURT of
# field 3), so a green test certifies the spec, not self-consistency.
REFERENCE_CDX_GOLDEN = [
    ("http://109.123.78.101/robots.txt", "101,78,123,109)/robots.txt"),
    ("http://219.136.125.131/", "131,125,136,219)/"),
    ("http://www.nuernberger.de/rente/", "de,nuernberger)/rente/"),
]


def test_surt_matches_reference_cdx_fixtures(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in REFERENCE_CDX_GOLDEN], "url: string"
    )
    rows = df.select(
        "url", surt_expr("url").alias("e"), surt_udf(F.col("url")).alias("u")
    ).collect()
    expected = dict(REFERENCE_CDX_GOLDEN)
    for r in rows:
        assert r.e == expected[r.url], r
        assert r.u == expected[r.url], r
    for u, want in REFERENCE_CDX_GOLDEN:
        assert _surt_one(u) == want


def test_surt_expr_matches_udf_on_common_urls(spark):
    urls = [
        "http://www.Example.com/Path?b=2&a=1",
        "https://archive.org/details/x",
        "http://sub.domain.co.uk/a/b.html",
        "http://example.com:80/",
        # non-default ports relocate after the reversed host
        "ftp://User@files.example.net:21/pub",
        "http://example.com:8080/A?b=2&a=1",
        "https://Host.NET:8443/x",
        # session params stripped by BOTH paths; mixed-case keys sort the same
        "http://a.b/p?JSESSIONID=1&x=2",
        "http://a.b/p?Foo=1&bar=2",
        "http://e.com/?PHPSESSID=z&B=2&b=1",
        # IP octets comma-reversed (reference CDX behavior)
        "http://109.123.78.101/robots.txt",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    rows = df.select(
        surt_expr("url").alias("e"), surt_udf(F.col("url")).alias("u")
    ).collect()
    for r in rows:
        assert r.e == r.u, rows


def test_ts14(spark):
    df = spark.createDataFrame(
        [("20120103084508",), ("20120103084508123",), ("bogus",)], "ts: string"
    )
    rows = df.select(
        ts14_to_epoch_millis("ts").alias("ms"),
        timestamp_to_ts14(ts14_to_timestamp("ts")).alias("rt"),
    ).collect()
    assert rows[0].ms == 1325580308000
    assert rows[1].ms == 1325580308123
    assert rows[2].ms is None
    assert rows[0].rt == "20120103084508"
    assert rows[1].rt == "20120103084508"


def test_json_map_roundtrip(spark):
    df = spark.createDataFrame([({"a": "1", "b": "2"},)], "m: map<string,string>")
    out = df.select(json_to_map(map_to_json("m")).alias("m2")).collect()[0]
    assert out.m2 == {"a": "1", "b": "2"}


def test_petabox_metadata_parse(spark):
    meta = {
        "created": 1400000000,
        "server": "ia600000.us.archive.org",
        "d1": "ia600000.us.archive.org",
        "d2": "ia600001.us.archive.org",
        "dir": "/27/items/foo",
        "files": [
            {"name": "foo.warc.gz", "source": "original", "format": "WARC",
             "mtime": "1400000000", "size": "1234", "md5": "x", "crc32": "y",
             "sha1": "z"}
        ],
    }
    df = spark.createDataFrame([(json.dumps(meta),)], "j: string")
    r = df.select(parse_petabox_metadata("j").alias("m")).collect()[0].m
    assert r.server == "ia600000.us.archive.org"
    assert r.files[0].name == "foo.warc.gz"
    assert r.files[0].size == "1234"


def test_url_resolve(spark):
    df = spark.createDataFrame(
        [
            ("/about", "http://example.com/index.html", None),
            ("b.html", None, "http://example.com/a/"),
            ("http://abs.example/", "http://base/", None),
        ],
        "rel: string, base: string, via: string",
    )
    got = [
        r.out
        for r in df.select(
            url_resolve_udf("rel", "base", "via").alias("out")
        ).collect()
    ]
    assert got == [
        "http://example.com/about",
        "http://example.com/a/b.html",
        "http://abs.example/",
    ]


def test_hash32_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "hello world", "", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "s: string")
    got = {r.s: r.h for r in df.select("s", hash32("s").alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        expected = con.execute(
            "SELECT CAST('0x' || substr(md5(?),1,8) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == expected, v


def test_minhash_permutations_deterministic():
    assert minhash_permutations(4) == minhash_permutations(4)
    assert len(set(minhash_permutations(16))) == 16


def test_vector_functions(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a: array<double>, b: array<double>")
    r = df.select(
        dot_product("a", "b").alias("d"), cosine_similarity("a", "b").alias("c")
    ).collect()[0]
    assert r.d == 11.0
    assert abs(r.c - 0.9838699100999074) < 1e-12


def test_arrow_vector_math_bit_identical_to_expressions(spark):
    """Round-11: the Arrow-vectorized dots (numpy accumulation sequential
    over the dim, vectorized over rows) must be BIT-identical to the
    zip_with+aggregate expression fold — the LSH band keys and every
    oracle-pinned cosine depend on exact equality."""
    import random

    from ia_hadoop_tools_spark.functions.vectorfns import (
        dot_product,
        dot_product_arrow,
        l2_norm,
        l2_norm_arrow,
        plane_dots_arrow,
    )
    from ia_hadoop_tools_spark.operators.similarity import hyperplanes

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id: long, v: array<float>")
    planes = hyperplanes(4, 16, seed=11)
    from pyspark.sql import functions as F

    # HOF per-plane dots (the shape plane_dots_arrow replaced)
    hof_dots = [
        F.aggregate(
            F.zip_with(
                F.col("v"),
                F.array(*[F.lit(x) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for p in planes
    ]
    pda = plane_dots_arrow(F.col("v"), planes)
    deltas = df.select(
        *[
            F.max(F.abs(hof_dots[i] - F.get(pda, i))).alias(f"p{i}")
            for i in range(len(planes))
        ],
        F.max(F.abs(dot_product("v", "v") - dot_product_arrow("v", "v"))).alias(
            "dd"
        ),
        F.max(F.abs(l2_norm("v") - l2_norm_arrow("v"))).alias("dn"),
    ).collect()[0]
    assert all(x == 0.0 for x in deltas), deltas


def test_arrow_vector_math_null_and_mismatch_contract(spark):
    """Null vector -> null dot on both paths; a wrong-length vector makes
    plane_dots_arrow yield null (the band-key sign guard then raises)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.functions.vectorfns import (
        dot_product_arrow,
        plane_dots_arrow,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id: long, v: array<double>"
    )
    got = {
        r.id: (r.d, r.p)
        for r in df.select(
            "id",
            dot_product_arrow("v", "v").alias("d"),
            plane_dots_arrow(F.col("v"), [[1.0, 1.0], [2.0, 0.0]]).alias("p"),
        ).collect()
    }
    assert got[0] == (5.0, [3.0, 2.0])
    assert got[1] == (None, None)
    # wrong-length row -> null dots array (not a wrong value)
    short = spark.createDataFrame([(0, [1.0],)], "id: long, v: array<double>")
    r = short.select(
        plane_dots_arrow(F.col("v"), [[1.0, 1.0]]).alias("p")
    ).collect()[0]
    assert r.p is None


def test_vectorfns_importable_without_session():
    """The Arrow UDF wrappers must be created lazily at plan-build time:
    executor Python workers import this module with NO active session (a
    module-level @pandas_udf raises SESSION_OR_CONTEXT_NOT_EXISTS there)."""
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import ia_hadoop_tools_spark.functions.vectorfns; print('ok')",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr[-2000:]


def test_url_resolve_scheme_prefix_not_substring(spark):
    """A relative link with an absolute URL embedded in its query must
    still resolve against the base (the '://' substring test skipped it)."""
    from ia_hadoop_tools_spark.functions.urlfns import _resolve

    assert (
        _resolve("out.html?u=http://x.com", "http://example.com/dir/", None)
        == "http://example.com/dir/out.html?u=http://x.com"
    )
    assert _resolve("http://abs.example/a", "http://b/", None) == "http://abs.example/a"
    # anchors must also be scheme-prefixed to be usable
    assert _resolve("a.html", "not-a-url-but-has://inside", None) == "a.html"


def test_surt_expr_unicode_case_expansion_keeps_path(spark):
    """Hosts whose lowercase form is LONGER (U+0130) must not shift the
    path substring (the offset used the lowercased length)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.functions.surt import surt_expr

    df = spark.createDataFrame(
        [("http://İstanbul.example/abc",)], "url string"
    )
    key = df.select(surt_expr(F.col("url")).alias("k")).first()["k"]
    assert key.endswith(")/abc"), key


def test_plane_dots_self_dot_bit_identical_and_ragged(spark):
    """with_self_dot appends <v, v> as dots[k]: sqrt(dots[k]) must be
    BIT-identical to the HOF l2_norm (same sequential fold), and — unlike
    the plane dots — it is computed for ragged-dim vectors too (mixed
    lengths in one batch), with null vectors yielding a null array.
    single_eval only marks the UDF nondeterministic; values unchanged."""
    import math
    import random

    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.functions.vectorfns import (
        l2_norm,
        plane_dots_arrow,
    )
    from ia_hadoop_tools_spark.operators.similarity import hyperplanes

    rng = random.Random(13)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(8)]) for i in range(50)]
    rows += [(100, [1.0, 2.0, 3.0]), (101, [4.0] * 11), (102, None)]
    df = spark.createDataFrame(rows, "id: long, v: array<double>")
    planes = hyperplanes(3, 8, seed=5)
    k = len(planes)
    got = df.select(
        "id",
        l2_norm(F.col("v")).alias("hof"),
        F.sqrt(
            plane_dots_arrow(F.col("v"), planes, with_self_dot=True)[k]
        ).alias("arrow"),
        plane_dots_arrow(
            F.col("v"), planes, with_self_dot=True, single_eval=True
        )[k].alias("nondet_selfdot"),
        plane_dots_arrow(F.col("v"), planes, with_self_dot=True)[0].alias(
            "dot0"
        ),
    ).collect()
    for r in got:
        if r.id == 102:
            assert r.hof is None and r.arrow is None
            continue
        # exact equality, not approx: same IEEE ops in the same order
        assert r.hof == r.arrow, (r.id, r.hof, r.arrow)
        assert r.arrow == (
            None if r.nondet_selfdot is None else math.sqrt(r.nondet_selfdot)
        )
        if r.id in (100, 101):  # ragged: plane dots null, self-dot real
            assert r.dot0 is None and r.arrow is not None
        else:
            assert r.dot0 is not None
