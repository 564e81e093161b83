"""Set-algebra bookkeeping: the incremental work queue.

Reference: cdx/notes.txt:19-36 — the cluster update cycle tracks source
basenames in SOURCE/STAGED/INCLUDED lists; the work queue for the next merge
is STAGED minus INCLUDED; manifest merge is a multiset union
(cdx/ManifestAggregator.java:59-81).

Spark: ``left_anti`` / ``union`` / ``intersect`` — native, broadcast-friendly
(the bookkeeping side is always tiny relative to the data it gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def work_queue(
    staged: DataFrame,
    included: DataFrame,
    key_col: str = "basename",
) -> DataFrame:
    """STAGED − INCLUDED: items staged for indexing but not yet included.

    Left-anti join on the basename; the included list is broadcast (it is a
    list of file names — megabytes — guarding terabytes of data).
    """
    inc = included.select(F.col(key_col).alias("__inc_key")).dropDuplicates()
    return staged.join(
        F.broadcast(inc), on=staged[key_col] == F.col("__inc_key"), how="left_anti"
    )


def merge_manifests(manifests: list[DataFrame], key_col: str = "basename") -> DataFrame:
    """Union per-shard manifests into one sorted, distinct manifest.

    When the same key appears in several manifests with different
    non-key columns, the row kept is the MINIMUM over the remaining
    columns (as one struct) — deterministic under any partitioning,
    unlike ``dropDuplicates`` which keeps an arbitrary scheduling-
    dependent row.
    """
    if not manifests:
        raise ValueError("merge_manifests: need at least one manifest")
    out = manifests[0]
    for m in manifests[1:]:
        out = out.unionByName(m)
    others = [c for c in out.columns if c != key_col]
    if not others:
        return out.dropDuplicates([key_col]).orderBy(key_col)
    rest = (
        out.groupBy(key_col)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("__rest"))
    )
    return rest.select(
        key_col, *[F.col(f"__rest.{c}").alias(c) for c in others]
    ).orderBy(key_col)
