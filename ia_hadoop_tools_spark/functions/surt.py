"""SURT (Sort-friendly URI Reordering Transform) canonicalization.

The reference's single most important scalar function: URL -> sort key
(pig/udf/toSURT.java, Recanonicalize.java, engine in mapreduce/
CDXMapper.java:62-70 via webarchive-commons' WaybackURLKeyMaker). Example:
``http://www.Example.com:80/Path?b=2&a=1`` -> ``com,example)/path?a=1&b=2``.

Two implementations with identical semantics on the common path:

- ``surt_expr``: pure column expressions — JVM-side, whole-stage codegen, the
  100 TB hot path. Handles scheme/userinfo strip, host lowercasing, www-strip,
  default-port strip, comma-reversed host, lowercased path, sorted query args.
- ``surt_udf``: Arrow-batched pandas UDF with fuller edge-case handling
  (IP literals kept unreversed-verbatim, session-id query params stripped,
  trailing-slash normalization) for parity-critical ingestion.

Canonicalization rules follow the public SURT definition used by Wayback
(lowercase; drop scheme + userinfo; drop 'www.' / 'www\\d+.' label; drop
default ports; reverse host labels joined by commas; '(' closes the host with
')' before the path; query args sorted).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SESSION_PARAMS = re.compile(
    r"^(jsessionid|phpsessid|sid|aspsessionid[a-z]*|cfid|cftoken)=", re.I
)
_WWW = re.compile(r"^www\d*\.")


def surt_expr(url: Column | str) -> Column:
    """SURT key as a native column expression (no Python in the loop).

    Null/invalid-ish inputs produce a best-effort key rather than failing —
    the caller can pair with ``skip_on_canon_fail`` semantics by filtering
    nulls (CDXMapper.java:111-119).
    """
    c = F.col(url) if isinstance(url, str) else url
    # strip scheme (http://, https://, ftp:// ...) and userinfo
    rest = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^[^/@?#]*@", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(2**30)).cast("string")
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # lowercase path, sort query args
    path = F.lower(F.regexp_extract(pathq, r"^([^?#]*)", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), F.lower(sorted_q))),
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
        is_ip = re.fullmatch(r"[\d.]+", host) is not None
        if not is_ip:
            host = _WWW.sub("", host)
        labels = host.split(".")
        rev = ",".join(reversed(labels))
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
    """Full SURT canonicalization (Arrow-batched; ~edge-case superset of
    ``surt_expr``). Returns null on canonicalization failure so callers get
    CDXMapper's skipOnCanonFail by filtering ``isNotNull``."""
    return urls.map(_surt_one)
