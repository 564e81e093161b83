"""Exact deduplication operators.

- ``dedup_exact``: hadoop/streaming/CdxDedupReducer.java:28-56 — eliminate
  exact-duplicate rows. Spark: ``dropDuplicates`` (map-side partial agg +
  one shuffle on the dedup key; Tungsten spillable, safe at 100 TB).
- ``dedup_first_per_key``: the reference's reducer keeps the FIRST value per
  key over the sorted stream; deterministic Spark equivalent = min_by over an
  explicit order column (arrival order is not a distributed concept, so the
  caller names the order).

Near-duplicate (MinHash/SimHash/Jaccard/embedding) dedup lives in
``operators/textops.py`` and ``operators/similarity.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop exact duplicates (whole row, or on ``subset`` key columns).

    Note: with ``subset``, which surviving row is kept is nondeterministic —
    use :func:`dedup_first_per_key` when the survivor matters.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_first_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[str]
) -> DataFrame:
    """Keep the first row per key under an explicit total order.

    Implemented with ``min_by`` on a struct of the order columns (single
    hash-aggregate, map-side combinable) rather than a row_number window —
    an agg shuffles pre-combined partial states, a window shuffles every row.
    """
    rest = [c for c in df.columns if c not in keys and c not in order]
    picked = [c for c in order if c not in keys] + rest
    ordc = F.struct(*[F.col(c) for c in order], *[F.col(c) for c in rest])
    agg = df.groupBy(*keys).agg(F.min(ordc).alias("__first"))
    return agg.select(*keys, *[F.col(f"__first.{c}").alias(c) for c in picked])
