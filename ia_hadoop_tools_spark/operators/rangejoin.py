"""Bucketized interval join: points against [start, end] windows.

Spark has no native band/interval join; a naive ``p.ts BETWEEN i.start
AND i.end`` condition plans as BroadcastNestedLoopJoin — O(|points| *
|intervals|) compares, the classic non-equi-join scale cliff. The
standard fix (same family as Databricks' range-join bin hints) is to
BUCKETIZE the time axis: explode each interval into the fixed-width
buckets it covers, join on the bucket as an EQUI key, then apply the
exact bounds as a post-filter. Compares drop from |P| x |I| to
|P| x (avg overlapping intervals per bucket) — and the join is a plain
hash/sort-merge shuffle that scales out on the bucket+key space.

Bucket width tuning: ~ the median interval length. Too narrow explodes
interval replicas (span/width rows each); too wide piles unrelated
intervals into each bucket. Both degrade gracefully — correctness never
depends on the width.

Points matching several intervals appear once PER MATCH (join
semantics); use the aggregate helper for per-interval rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 86400,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join ``points`` to every interval with ``start <= ts <= end``.

    ``point_ts``/``start_col``/``end_col`` are timestamp or date
    columns; ``bucket_width`` is in seconds. Inclusive on both ends
    (the SQL BETWEEN convention). ``how='inner'`` only — the bucketized
    plan has no outer form (an unmatched point appears in no bucket
    pair); filter-join against the matched keys for anti semantics.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    if bucket_width < 1 or max_buckets_per_interval < 1:
        raise ValueError("bucket_width and max_buckets_per_interval must be >= 1")

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_width)).cast("long")

    # blowup guard: a sentinel-ended interval ('active until 9999-12-31')
    # would explode millions of bucket replicas per row — fail loudly with
    # the remedy instead of OOMing an executor. NULL-bounded intervals are
    # exempt (nb IS NULL keeps checked_hi NULL): they can never satisfy
    # the inclusive BETWEEN post-filter, so the null sequence's explode
    # dropping them IS the correct inner-join semantics — without the
    # isNull arm the otherwise-branch would raise_error with a
    # NULL-concat (empty) message on every open-ended interval
    b_lo, b_hi = bucket(F.col(start_col)), bucket(F.col(end_col))
    nb = b_hi - b_lo + 1
    checked_hi = F.when(
        nb.isNull() | (nb <= max_buckets_per_interval), b_hi
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{max_buckets_per_interval} buckets at width "
                    f"{bucket_width}s ("
                ),
                nb.cast("string"),
                F.lit(
                    ") — widen bucket_width, cap sentinel end dates, or "
                    "raise max_buckets_per_interval"
                ),
            )
        ).cast("long")
    )
    iv = intervals.withColumn("__b", F.explode(F.sequence(b_lo, checked_hi)))
    pt = points.withColumn("__b", bucket(F.col(point_ts)))
    return (
        pt.join(iv, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
