"""SURT (Sort-friendly URI Reordering Transform) canonicalization.

The reference's single most important scalar function: URL -> sort key
(pig/udf/toSURT.java, Recanonicalize.java, engine in mapreduce/
CDXMapper.java:62-70 via webarchive-commons' WaybackURLKeyMaker). Example:
``http://www.Example.com:80/Path?b=2&a=1`` -> ``com,example)/path?a=1&b=2``.

Two implementations with identical semantics on the common path (URLs with a
parseable host; ports; session params; query args — pinned to each other by
tests/test_surt_properties.py and to the reference's own CDX fixture lines by
tests/test_functions.py):

- ``surt_expr``: pure column expressions — JVM-side, whole-stage codegen, the
  100 TB hot path.
- ``surt_udf``: Arrow-batched pandas UDF. Same key on the common path; differs
  only on garbage inputs, where it returns null (CDXMapper's skipOnCanonFail)
  while the expr produces a best-effort key.

Canonicalization rules (both paths):

- lowercase everything; drop scheme and userinfo; drop the fragment
- drop a leading ``www.`` / ``www\\d+.`` host label
- drop ports 80/443; keep any other port, appended AFTER the reversed host
  (``net,example,files:21)/pub``)
- reverse host labels joined by commas — including IP octets: the reference's
  own CDX data comma-reverses IPs (``http://109.123.78.101/robots.txt`` ->
  ``101,78,123,109)/robots.txt``, pig/CDXLoaderTest.java:60), so we match
  that rather than newer webarchive-commons keep-IP-verbatim behavior
- empty path -> ``/``
- query args: lowercase, drop empties and session-id params (jsessionid,
  phpsessid, sid, aspsessionid*, cfid, cftoken), sort, join with ``&``; if
  nothing survives, no ``?`` suffix
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SESSION_PARAM_PAT = r"^(jsessionid|phpsessid|sid|aspsessionid[a-z]*|cfid|cftoken)="
_SESSION_PARAMS = re.compile(_SESSION_PARAM_PAT)
_WWW = re.compile(r"^www\d*\.")


def surt_expr(url: Column | str) -> Column:
    """SURT key as a native column expression (no Python in the loop).

    Null/invalid-ish inputs produce a best-effort key rather than failing —
    the caller can pair with ``skip_on_canon_fail`` semantics by filtering
    nulls (CDXMapper.java:111-119), or use ``surt_udf`` which nulls them.
    """
    c = F.col(url) if isinstance(url, str) else url
    # strip scheme (http://, https://, ftp:// ...) and userinfo
    rest = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^[^/@?#]*@", "")
    # offset math uses the UN-lowercased hostport: lowercasing can change
    # the length (U+0130 'İ' -> 'i' + combining dot), and a shifted
    # substring would eat the path's leading '/'
    hostport_raw = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    hostport = F.lower(hostport_raw)
    pathq = F.substring(
        rest, F.length(hostport_raw) + 1, F.lit(2**30)
    ).cast("string")
    # non-default port relocates to AFTER the reversed host; 80/443 dropped
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    host = F.regexp_replace(host, r"^\[|\]$", "")  # IPv6 bracket strip
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rev_host = F.when(port.isin("", "80", "443"), rev_host).otherwise(
        F.concat(rev_host, F.lit(":"), port)
    )
    # strip the FRAGMENT first: an unanchored \?([^#]*) matched a '?'
    # appearing inside the fragment (SPA-style '#/route?tab=1' URLs),
    # leaking fragment content into the key and diverging from surt_udf
    pathq_nf = F.regexp_extract(pathq, r"^([^#]*)", 1)
    path = F.lower(F.regexp_extract(pathq_nf, r"^([^?]*)", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # lowercase BEFORE filter+sort so ordering matches surt_udf exactly
    query = F.lower(F.regexp_extract(pathq_nf, r"\?(.*)$", 1))
    qargs = F.filter(
        F.split(query, "&"),
        lambda a: (a != "") & ~a.rlike(_SESSION_PARAM_PAT),
    )
    sorted_q = F.array_join(F.array_sort(qargs), "&")
    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def _surt_one(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        u = url.strip()
        if "://" not in u:
            u = "http://" + u
        parts = urlsplit(u)
        host = (parts.hostname or "").lower()
        if not host:
            return None
        port = parts.port
        host = _WWW.sub("", host)
        rev = ",".join(reversed(host.split(".")))
        if port and port not in (80, 443):
            rev = f"{rev}:{port}"
        path = (parts.path or "/").lower() or "/"
        qargs = [
            a
            for a in parts.query.lower().split("&")
            if a and not _SESSION_PARAMS.match(a)
        ]
        q = "&".join(sorted(qargs))
        return f"{rev}){path}" + (f"?{q}" if q else "")
    except (ValueError, AttributeError):
        return None


@pandas_udf(StringType())
def surt_udf(urls: pd.Series) -> pd.Series:
    """Full SURT canonicalization (Arrow-batched). Returns null on
    canonicalization failure so callers get CDXMapper's skipOnCanonFail by
    filtering ``isNotNull``; otherwise agrees with ``surt_expr``."""
    return urls.map(_surt_one)
