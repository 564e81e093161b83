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

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_width)).cast("long")

    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))
        ),
    )
    pt = points.withColumn("__b", bucket(F.col(point_ts)))
    return (
        pt.join(iv, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
