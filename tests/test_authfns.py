"""HMAC cookie signing (functions/authfns.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.functions.authfns import (
    CookieRefresher,
    hmac_cookie_str,
    verify_hmac_cookie,
)

SECRET = "s3cret"


def test_sign_verify_roundtrip():
    c = hmac_cookie_str("extract", SECRET, 1000, now=1_000_000.0)
    assert c.startswith("extract=1001000-")
    assert verify_hmac_cookie(c, SECRET, now=1_000_500.0)


def test_expiry_and_tamper_rejected():
    c = hmac_cookie_str("extract", SECRET, 1000, now=1_000_000.0)
    assert not verify_hmac_cookie(c, SECRET, now=1_001_001.0)  # expired
    assert not verify_hmac_cookie(c, "wrong", now=1_000_500.0)  # bad secret
    name, rest = c.split("=", 1)
    exp, sig = rest.split("-", 1)
    forged = f"{name}={int(exp) + 100_000}-{sig}"  # extend expiry, keep sig
    assert not verify_hmac_cookie(forged, SECRET, now=1_000_500.0)
    assert not verify_hmac_cookie("garbage", SECRET)


def test_refresher_half_expiry():
    r = CookieRefresher("extract", SECRET, expiry_seconds=1000)
    c1 = r.get(now=1_000_000.0)
    assert r.get(now=1_000_400.0) == c1  # under half-expiry: cached
    c2 = r.get(now=1_000_501.0)  # past half-expiry: refreshed
    assert c2 != c1
    assert verify_hmac_cookie(c2, SECRET, now=1_000_502.0)
