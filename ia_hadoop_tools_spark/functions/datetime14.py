"""14/17-digit archival timestamp conversions.

Reference: pig/udf/DateTime14ToTimestamp.java:21-43 — ``yyyyMMddHHmmss`` (14)
or ``yyyyMMddHHmmssSSS`` (17), UTC, length-checked, null-safe -> epoch millis;
jobs/ArchiveFileExtractor.java:220-237 round-trips 14-digit <-> ARC dates.

All native column expressions (``to_timestamp`` / ``date_format`` run in the
JVM with codegen). Sessions should run with spark.sql.session.timeZone=UTC
(session.py does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ts14_to_timestamp(col: Column | str) -> Column:
    """14/17-digit string -> TimestampType (UTC); null if length is neither
    or the digits don't parse (try-variants: malformed data nulls out instead
    of failing the job under ANSI mode — the reference's loaders drop, never
    crash)."""
    c = _c(col)
    base = F.try_to_timestamp(F.substring(c, 1, 14), F.lit("yyyyMMddHHmmss"))
    with_millis = F.timestamp_millis(
        F.unix_millis(base) + F.substring(c, 15, 3).try_cast("long")
    )
    return (
        F.when(F.length(c) == 14, base)
        .when(F.length(c) == 17, with_millis)
        .otherwise(F.lit(None).cast("timestamp"))
    )


def ts14_to_epoch_millis(col: Column | str) -> Column:
    """14/17-digit string -> epoch milliseconds (DateTime14ToTimestamp.exec)."""
    return F.unix_millis(ts14_to_timestamp(col))


def timestamp_to_ts14(col: Column | str) -> Column:
    """TimestampType -> 14-digit archival string (DateUtils.get14DigitDate)."""
    return F.date_format(_c(col), "yyyyMMddHHmmss")
