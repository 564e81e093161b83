"""CDX Server-style query API: the wayback stack's user-facing lookup.

The reference builds and maintains the sorted CDX cluster; the thing users
actually hit is the CDX Server API on top of it (pywb / OpenWayback
``/cdx?url=...&matchType=...&filter=...``). This module is that query
surface as one composable DataFrame function, so a cluster produced by this
engine answers the same questions:

- ``match_type``: ``exact`` (one urlkey), ``prefix`` (path prefix),
  ``host`` (every capture on the host), ``domain`` (host + all
  subdomains, via the SURT key's comma-order).
- ``from_ts`` / ``to_ts``: 14-digit timestamp bounds (prefix-padded, so
  ``2020`` means the whole year).
- ``filters``: CDX-Server grammar ``[!]field:regex`` — regex must match
  (or not match, with ``!``) the field's string value.
- ``collapse``: keep the first capture per distinct value of a field (or
  field prefix like ``timestamp:8`` for one-per-day) per urlkey —
  deterministic: first = earliest (timestamp, then full row order).
- ``limit``: global cap after sorting.

Every predicate lands on the sorted cluster scan (urlkey range + timestamp
comparisons push into Parquet row-group pruning; regex filters evaluate in
codegen); collapse is one window — the same shapes as the reference's own
range scans (cdx/ClusterRange.java) with the day-limit window (§2.6).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.surt import surt_expr

_TS_LEN = 14


def _pad_ts(ts: str, low: bool) -> str:
    """Prefix timestamp -> full 14-digit bound (low: 0-pad, high: 9-pad)."""
    return ts.ljust(_TS_LEN, "0" if low else "9")


def _key_predicate(url: str, match_type: str) -> Column:
    k = F.col("urlkey")
    # derive the query's SURT key once, driver-side, via a literal select
    # trick is unnecessary: surt_expr over a literal column folds constant
    skey = surt_expr(F.lit(url))
    if match_type == "exact":
        return k == skey
    if match_type == "prefix":
        return k.startswith(skey)
    if match_type == "host":
        # everything under the host: "com,example)/..." — host part of the
        # query key, up to and including ")"
        host = F.concat(F.substring_index(skey, ")", 1), F.lit(")"))
        return k.startswith(host)
    if match_type == "domain":
        # host + subdomains: "com,example)" prefix OR "com,example," prefix
        bare = F.substring_index(skey, ")", 1)
        return k.startswith(F.concat(bare, F.lit(")"))) | k.startswith(
            F.concat(bare, F.lit(","))
        )
    raise ValueError(f"match_type must be exact|prefix|host|domain: {match_type!r}")


_FILTER_RE = re.compile(r"^(!?)([a-z_]+):(.*)$", re.S)

#: CDX-Server short names -> typed columns
_FIELD_ALIASES = {
    "status": "statuscode",
    "mime": "mimetype",
    "url": "original_url",
    "length": "compressed_length",
    "offset": "compressed_offset",
}


def _filter_predicate(spec: str) -> Column:
    m = _FILTER_RE.match(spec)
    if not m:
        raise ValueError(f"filter must be [!]field:regex, got {spec!r}")
    neg, field, pattern = m.groups()
    col = F.col(_FIELD_ALIASES.get(field, field)).cast("string")
    # CDX Server semantics: regex must match the WHOLE field value
    hit = col.rlike(f"^(?:{pattern})$")
    # null fields never match a positive filter; a negated filter keeps them
    pred = F.coalesce(hit, F.lit(False))
    return ~pred if neg else pred


def cdx_query(
    cluster: DataFrame,
    url: str,
    match_type: str = "exact",
    from_ts: str | None = None,
    to_ts: str | None = None,
    filters: Sequence[str] = (),
    collapse: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Query a typed CDX cluster with CDX-Server semantics (module doc).

    Returns matching rows sorted by (urlkey, timestamp); ``collapse`` keeps
    the earliest capture per distinct (urlkey, collapse-value).
    """
    out = cluster.filter(_key_predicate(url, match_type))
    if from_ts:
        out = out.filter(F.col("timestamp") >= _pad_ts(from_ts, True))
    if to_ts:
        out = out.filter(F.col("timestamp") <= _pad_ts(to_ts, False))
    for spec in filters:
        out = out.filter(_filter_predicate(spec))
    if collapse:
        if ":" in collapse:
            field, ln = collapse.split(":", 1)
            cval = F.substring(
                F.col(_FIELD_ALIASES.get(field, field)).cast("string"),
                1, int(ln),
            )
        else:
            cval = F.col(_FIELD_ALIASES.get(collapse, collapse)).cast("string")
        w = Window.partitionBy(F.col("urlkey"), cval).orderBy(
            F.col("timestamp").asc(), F.col("original_url").asc()
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    out = out.orderBy(F.col("urlkey").asc(), F.col("timestamp").asc())
    if limit:
        out = out.limit(limit)
    return out
