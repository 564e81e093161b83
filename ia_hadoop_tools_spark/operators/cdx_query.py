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
  the field's RENDERED value, where absent fields render as ``-`` exactly
  like CDX text lines (so ``mime:-`` and ``status:.*`` behave as they do
  against a classic CDX server).
- ``collapse``: pywb semantics — merge ADJACENT captures (per urlkey, in
  timestamp order) whose collapse value repeats; field or field prefix
  (``timestamp:8`` = one per day run). Non-adjacent repeats survive,
  matching the server's streaming collapse.
- ``sort``: ``default`` (urlkey, timestamp ascending), ``reverse``
  (latest capture first per urlkey), or ``closest`` with a ``closest``
  timestamp — the Wayback Machine's primary lookup ("the capture nearest
  time T", the point binary search the reference's sorted cluster exists
  to serve: cdx/CDXCluster.java:31-43). Distance is measured in SECONDS
  (calendar-aware, timezone-free), not in raw ts14 numeric space, so
  20191231235959 really is one second from 20200101000000; ties break
  toward the EARLIER capture. With ``limit=k`` this is "the k captures
  nearest T".
- ``limit``: global cap after sorting (``limit=0`` returns nothing).

The query key is computed DRIVER-SIDE (``_surt_one``) so every urlkey
predicate is a plain string comparison that reaches Parquet
``PushedFilters`` — on a sorted cluster the scan reads only the covering
row groups (the reference's summary binary search, cdx/ClusterRange.java);
timestamp bounds push the same way. Regex filters evaluate in codegen;
collapse is one lag window over the already-sorted key order.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.surt import _surt_one
from ia_hadoop_tools_spark.schemas import CDX_COLUMNS

_TS_LEN = 14

#: total tie-break under (urlkey, timestamp) — same-second captures of one
#: URL (revisit + original) must collapse/order deterministically
_TIEBREAK = ("original_url", "digest", "compressed_offset", "filename")


def _pad_ts(ts: str, low: bool) -> str:
    """Prefix timestamp -> full 14-digit bound (low: 0-pad, high: 9-pad)."""
    return ts.ljust(_TS_LEN, "0" if low else "9")


#: low CALENDAR defaults for closest-target padding: month/day pad to 01,
#: not 00 — '2020' must become 20200101000000, a real date; zero-padding
#: would make to_date NULL and silently break the distance ranking
_CLOSEST_PAD = "01" "01" "000000"


def pad_closest_ts(ts: str) -> str:
    """Partial closest timestamp (>=4 digits) -> valid 14-digit target.

    Prefixes must end on a FIELD boundary (even length: yyyy, yyyymm,
    ...): an odd-length prefix like '20205' would pad into month '51',
    the target would parse NULL, and the closest ranking would silently
    degrade to default order — raise instead.
    """
    if len(ts) < 4 or len(ts) % 2 != 0:
        raise ValueError(
            f"closest timestamp prefix must be 4-14 digits ending on a "
            f"field boundary (even length), got {ts!r}"
        )
    return ts + _CLOSEST_PAD[len(ts) - 4 :] if len(ts) < _TS_LEN else ts[:_TS_LEN]


def _ts14_seconds(ts: Column) -> Column:
    """ts14 string -> seconds since 1970-01-01 00:00:00, timezone-free.

    ``try_to_date``/``unix_date`` are pure calendar arithmetic (no
    session-tz dependence), so closest-distance ranking is deterministic
    across drivers and matches a naive-timestamp SQL oracle exactly.
    Non-calendar timestamps (Feb 30 in dirty CDX data) yield NULL — under
    ANSI mode plain ``to_date`` would fail the whole query on one bad row.
    """
    days = F.unix_date(
        F.call_function("try_to_date", F.substring(ts, 1, 8), F.lit("yyyyMMdd"))
    )
    hh = F.substring(ts, 9, 2).cast("long")
    mm = F.substring(ts, 11, 2).cast("long")
    ss = F.substring(ts, 13, 2).cast("long")
    secs = days.cast("long") * 86400 + hh * 3600 + mm * 60 + ss
    # time-of-day validated like the date part: hour 99 would otherwise
    # produce a FINITE bogus distance that can out-rank real captures in
    # a closest lookup (the malformed-ranks-farthest contract)
    return F.when((hh <= 23) & (mm <= 59) & (ss <= 59), secs)


def _key_predicate(url: str, match_type: str) -> Column:
    skey = _surt_one(url)
    if skey is None:
        raise ValueError(f"cannot canonicalize url: {url!r}")
    k = F.col("urlkey")
    if match_type == "exact":
        return k == skey
    if match_type == "prefix":
        return k.startswith(F.lit(skey))
    host = skey.split(")", 1)[0]
    if match_type == "host":
        # everything under the host: "com,example)..." key prefix
        return k.startswith(F.lit(host + ")"))
    if match_type == "domain":
        # host + subdomains: "com,example)" prefix OR "com,example," prefix
        return k.startswith(F.lit(host + ")")) | k.startswith(
            F.lit(host + ",")
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


def _resolve_field(field: str) -> str:
    col = _FIELD_ALIASES.get(field, field)
    if col not in CDX_COLUMNS:
        raise ValueError(
            f"unknown CDX field {field!r}; use one of "
            f"{sorted(set(CDX_COLUMNS) | set(_FIELD_ALIASES))}"
        )
    return col


def _filter_predicate(spec: str) -> Column:
    m = _FILTER_RE.match(spec)
    if not m:
        raise ValueError(f"filter must be [!]field:regex, got {spec!r}")
    neg, field, pattern = m.groups()
    # filters run against the RENDERED value — null prints as '-' in CDX
    # text, and that is what server-side filters match against
    col = F.coalesce(F.col(_resolve_field(field)).cast("string"), F.lit("-"))
    # CDX Server semantics: regex must match the WHOLE field value
    pred = col.rlike(f"^(?:{pattern})$")
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
    sort: str = "default",
    closest: str | None = None,
    collapse_segment: int | None = 8,
    offset: int = 0,
    fields: Sequence[str] | None = None,
) -> DataFrame:
    """Query a typed CDX cluster with CDX-Server semantics (module doc).

    Returns matching rows sorted by (urlkey, timestamp, tiebreakers) —
    reversed per urlkey under ``sort="reverse"``, nearest-``closest``-first
    under ``sort="closest"``; ``collapse`` merges runs of adjacent captures
    sharing the collapse value (always evaluated in ascending timestamp
    order, the stream order a CDX server collapses in), keeping each run's
    first.

    ``offset``/``fields`` are pywb's paging + projection params: ``offset``
    skips the first n rows of the final order (applied BEFORE ``limit``,
    as pywb does), and ``fields`` (pywb ``fl=``) projects the named CDX
    fields — applied last so filters/collapse still see every column.
    """
    if limit is not None and limit < 0:
        raise ValueError(f"limit must be >= 0, got {limit}")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    if sort not in ("default", "reverse", "closest"):
        raise ValueError(f"sort must be default|reverse|closest: {sort!r}")
    if (sort == "closest") != (closest is not None):
        raise ValueError("sort='closest' requires closest=<ts14>, and vice versa")
    if closest is not None and (not closest.isdigit() or len(closest) < 4):
        raise ValueError(
            f"closest must be a >=4-digit timestamp prefix: {closest!r}"
        )
    if collapse_segment is not None and not 1 <= collapse_segment <= _TS_LEN:
        raise ValueError(
            f"collapse_segment must be 1..{_TS_LEN} or None: {collapse_segment}"
        )
    out = cluster.filter(_key_predicate(url, match_type))
    if from_ts:
        out = out.filter(F.col("timestamp") >= _pad_ts(from_ts, True))
    if to_ts:
        out = out.filter(F.col("timestamp") <= _pad_ts(to_ts, False))
    for spec in filters:
        out = out.filter(_filter_predicate(spec))
    order = [F.col("timestamp").asc()] + [F.col(c).asc() for c in _TIEBREAK]
    if collapse:
        # compare the RENDERED field ('-' for null, like the CDX line and
        # _filter_predicate): raw nullable compares make `cval != prev`
        # SQL NULL around null fields — a null-valued capture after a
        # non-null one was silently dropped, and adjacent null repeats
        # (e.g. warc/revisit statuscode) survived instead of collapsing
        if ":" in collapse:
            field, ln = collapse.split(":", 1)
            cval = F.substring(
                F.coalesce(
                    F.col(_resolve_field(field)).cast("string"), F.lit("-")
                ),
                1,
                int(ln),
            )
        else:
            cval = F.coalesce(
                F.col(_resolve_field(collapse)).cast("string"), F.lit("-")
            )
        # pywb collapse merges ADJACENT repeats only: keep a row iff its
        # collapse value differs from the previous row's (per urlkey, in
        # the output order) — non-adjacent repeats survive
        if collapse_segment is None:
            # one window task per urlkey: fine for normal histories, a
            # single hot task for a mega-URL (tens of millions of captures)
            w = Window.partitionBy(F.col("urlkey")).orderBy(*order)
            prev = F.lag(cval).over(w)
            out = (
                out.withColumn("__keep", prev.isNull() | (cval != prev))
                .filter(F.col("__keep"))
                .drop("__keep")
            )
        else:
            # SEGMENTED collapse, bit-identical to the single window: the
            # per-urlkey window is bounded by a timestamp-prefix bucket
            # (default 8 = per day), so a 25-year mega-history spreads over
            # ~9k tasks instead of one. Stitch: each segment's first row
            # compares against the PREVIOUS segment's last collapse value,
            # computed as a tiny (urlkey, segment)-grained aggregate whose
            # own lag window runs over segments, not captures.
            seg = F.substring(F.col("timestamp"), 1, collapse_segment)
            tb = [F.col("timestamp")] + [F.col(c) for c in _TIEBREAK]
            out = out.withColumn("__cv", cval).withColumn("__seg", seg)
            wseg = Window.partitionBy("urlkey", "__seg").orderBy(*order)
            out = out.withColumn("__prev", F.lag("__cv").over(wseg)).withColumn(
                "__rn", F.row_number().over(wseg)
            )
            # last collapse value per segment: max over (order..., cv)
            # structs == the ascending-order last row's value (null cv and
            # null tiebreaks order exactly like the window's orderBy)
            seg_last = (
                out.groupBy("urlkey", "__seg")
                .agg(F.max(F.struct(*tb, F.col("__cv"))).alias("__m"))
                .select(
                    "urlkey", "__seg", F.col("__m").getField("__cv").alias("__last")
                )
            )
            wprev = Window.partitionBy("urlkey").orderBy("__seg")
            seg_prev = seg_last.withColumn(
                "__seg_prev", F.lag("__last").over(wprev)
            ).drop("__last")
            eff_prev = F.when(F.col("__rn") == 1, F.col("__seg_prev")).otherwise(
                F.col("__prev")
            )
            out = (
                out.join(seg_prev, ["urlkey", "__seg"], "left")
                .withColumn(
                    "__keep", eff_prev.isNull() | (F.col("__cv") != eff_prev)
                )
                .filter(F.col("__keep"))
                .drop("__cv", "__seg", "__prev", "__rn", "__seg_prev", "__keep")
            )
    if sort == "reverse":
        # exact reverse of the default order within each urlkey
        final = [F.col("timestamp").desc()] + [
            F.col(c).desc() for c in _TIEBREAK
        ]
    elif sort == "closest":
        target = _ts14_seconds(F.lit(pad_closest_ts(closest)))
        dist = F.abs(_ts14_seconds(F.col("timestamp")) - target)
        # tie toward the earlier capture: equidistant before/after T picks
        # the before-T row (then the usual total tie-break). NULLs LAST:
        # a malformed capture timestamp (Feb 30 etc. in dirty CDX data)
        # has NULL distance and must rank as farthest, never nearest —
        # the HTTP server ranks unrankable captures last the same way.
        final = [dist.asc_nulls_last()] + order
    else:
        final = order
    out = out.orderBy(F.col("urlkey").asc(), *final)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    if fields is not None:
        # keep the REQUESTED name (pywb fl= contract): a caller asking for
        # fl=status reads row["status"], not the canonical "statuscode"
        out = out.select(
            *[F.col(_resolve_field(f)).alias(f) for f in fields]
        )
    return out
