"""Property-based SURT tests (hypothesis) — SURVEY.md §7.5 names URL
canonicalization as the biggest correctness surface; these pin the invariants
the sort order depends on, beyond the fixture examples in test_functions."""

from __future__ import annotations

import re
import string

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from ia_hadoop_tools_spark.functions.surt import _surt_one

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")

label = st.text(alphabet=string.ascii_letters + string.digits + "-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
hosts = st.lists(label, min_size=2, max_size=4).map(".".join)
paths = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + "._-", min_size=0, max_size=6),
    min_size=0, max_size=3,
).map(lambda segs: "/" + "/".join(segs) if segs else "")
qparam = st.tuples(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
    st.text(alphabet=string.ascii_letters + string.digits, min_size=0, max_size=5),
).map(lambda kv: f"{kv[0]}={kv[1]}")
session_param = st.tuples(
    st.sampled_from(["jsessionid", "PHPSESSID", "sid", "CFID", "cftoken"]),
    st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=8),
).map(lambda kv: f"{kv[0]}={kv[1]}")
queries = st.lists(qparam, min_size=0, max_size=4).map("&".join)
schemes = st.sampled_from(["http", "https", "ftp"])
ports = st.one_of(
    st.none(), st.sampled_from([80, 443]), st.integers(min_value=1, max_value=65535)
)


@st.composite
def urls(draw, with_port=False):
    s = draw(schemes)
    h = draw(hosts)
    p = draw(paths)
    q = draw(queries)
    pt = draw(ports) if with_port else None
    hp = f"{h}:{pt}" if pt else h
    return f"{s}://{hp}{p}" + (f"?{q}" if q else "")


@settings(max_examples=300, deadline=None)
@given(urls())
def test_surt_total_and_stable(u):
    """Never raises; deterministic; output shape host-reversed)path[?query]."""
    k1, k2 = _surt_one(u), _surt_one(u)
    assert k1 == k2
    assert k1 is not None
    assert ")" in k1
    host_part = k1.split(")", 1)[0]
    assert re.fullmatch(r"[^)/?#]+", host_part.split(":")[0])


@settings(max_examples=300, deadline=None)
@given(urls())
def test_surt_case_and_scheme_invariance(u):
    """Scheme http vs https and host case never change the key (path case is
    folded too, so full-URL casefold is invariant)."""
    base = _surt_one(u)
    assert _surt_one(u.replace("http://", "https://", 1)) == base
    # uppercase the host portion only
    m = re.match(r"^([a-z]+://)([^/?#]*)(.*)$", u, re.S)
    upper_host = m.group(1) + m.group(2).upper() + m.group(3)
    assert _surt_one(upper_host) == base


@settings(max_examples=200, deadline=None)
@given(urls(), st.integers(min_value=0, max_value=10))
def test_surt_query_order_invariance(u, seed):
    """Shuffling query-arg order never changes the key."""
    import random

    if "?" not in u:
        return
    base, q = u.split("?", 1)
    args = q.split("&")
    rng = random.Random(seed)
    rng.shuffle(args)
    assert _surt_one(base + "?" + "&".join(args)) == _surt_one(u)


@settings(max_examples=200, deadline=None)
@given(hosts, paths, queries)
def test_surt_www_and_default_port_stripped(h, p, q):
    tail = p + (f"?{q}" if q else "")
    base = _surt_one(f"http://{h}{tail}")
    assert _surt_one(f"http://www.{h}{tail}") == base
    assert _surt_one(f"http://{h}:80{tail}") == base
    assert _surt_one(f"https://{h}:443{tail}") == base


@settings(max_examples=200, deadline=None)
@given(hosts, st.integers(min_value=1, max_value=65535), paths, queries)
def test_surt_port_relocates_after_reversed_host(h, pt, p, q):
    """Any non-default port appears as ':port' immediately before ')' —
    never glued inside a reversed label (the round-1 spec divergence)."""
    tail = p + (f"?{q}" if q else "")
    k = _surt_one(f"http://{h}:{pt}{tail}")
    base = _surt_one(f"http://{h}{tail}")
    if pt in (80, 443):
        assert k == base
    else:
        bh, brest = base.split(")", 1)
        assert k == f"{bh}:{pt}){brest}"


@settings(max_examples=200, deadline=None)
@given(hosts, paths, st.lists(qparam, min_size=0, max_size=3), session_param)
def test_surt_session_params_stripped(h, p, qs, sp):
    """Injecting a session-id param anywhere never changes the key."""
    base_q = "&".join(qs)
    base = _surt_one(f"http://{h}{p}" + (f"?{base_q}" if base_q else ""))
    with_sp = "&".join([sp] + qs) if qs else sp
    assert _surt_one(f"http://{h}{p}?{with_sp}") == base


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_surt_never_raises_on_garbage(s):
    _surt_one(s)  # None is fine; raising is not


def test_surt_prefix_ordering_groups_host():
    """The point of SURT: all captures of one host sort contiguously, with
    subdomains AFTER the apex's own pages (reversed-label prefix order)."""
    keys = sorted(
        _surt_one(u)
        for u in [
            "http://example.com/z",
            "http://example.com/a",
            "http://sub.example.com/a",
            "http://examplf.com/a",
            "http://example.co/a",
        ]
    )
    assert keys == [
        "co,example)/a",
        "com,example)/a",
        "com,example)/z",
        "com,example,sub)/a",
        "com,examplf)/a",
    ]


def test_expr_and_udf_agree_on_common_path(spark):
    """surt_expr (codegen hot path) == _surt_one (full UDF) on plain URLs."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.functions.surt import surt_expr

    urls_list = [
        "http://www.Example.com/Path?b=2&a=1",
        "https://archive.org:443/details/Item",
        "http://sub.domain.co.uk/a/B.html",
        "http://www2.foo.org/q?z=1&y=2&x=3",
        "http://host.net/",
        "ftp://User@files.example.net:21/pub",
        "http://example.com:8080/A?PHPSESSID=abc&B=2&b=1",
        "http://109.123.78.101:8443/robots.txt",
        "http://a.b/p?Foo=1&bar=2&jsessionid=x",
    ]
    df = spark.createDataFrame([(u,) for u in urls_list], "url: string")
    got = {
        r.url: r.k for r in df.select("url", surt_expr(F.col("url")).alias("k")).collect()
    }
    for u in urls_list:
        assert got[u] == _surt_one(u), u
