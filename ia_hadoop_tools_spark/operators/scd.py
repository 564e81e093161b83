"""Slowly-changing-dimension (SCD type 2) snapshot merge.

The warehouse-maintenance twin of the STAGED/INCLUDED incremental loop
(streaming/incremental.py): fold a new full snapshot of a dimension into
a versioned history table where each key's row carries
``valid_from``/``valid_to`` and the current version has ``valid_to``
NULL. The merge closes changed rows, opens their replacements, inserts
new keys, and leaves unchanged/closed rows untouched — the MERGE INTO
pattern expressed as one full-outer join plus unions, so it runs on
plain parquet with no table-format dependency.

Change detection is null-safe equality over the tracked columns
(``<=>``), so NULL attribute values compare stably.

Scale shape: one key-shuffle full-outer join between the CURRENT slice
and the snapshot (both pruned to key + tracked columns by Catalyst);
closed history never joins anything — it streams through a union. At
100 TB the current slice is one version per key, orders of magnitude
smaller than the closed history it avoids touching.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols_equal(cols: Sequence[str]) -> Column:
    """AND of null-safe equality between the c.-side and s.-side columns."""
    cond = None
    for name in cols:
        c = F.col(f"c.{name}").eqNullSafe(F.col(f"s.{name}"))
        cond = c if cond is None else (cond & c)
    return cond


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    close_missing: bool = False,
) -> DataFrame:
    """Merge ``snapshot`` (keys + tracked attrs, one row per key) into the
    SCD2 ``history`` table, effective at ``effective_ts``.

    Row fates:

    - closed history rows (``to_col`` non-null): pass through untouched;
    - current row, key absent from snapshot: stays open, unless
      ``close_missing`` (then it closes at ``effective_ts``);
    - current row, attrs unchanged (null-safe): stays open as-is;
    - current row, attrs changed: closes at ``effective_ts`` AND a new
      open row with the snapshot attrs is inserted;
    - snapshot key with no current row: new open row.

    ``effective_ts`` is carried verbatim into ``from_col``/``to_col``
    (string/date — caller's choice of time domain).
    """
    cols = [*keys, *tracked, from_col, to_col]
    # effective_ts literals CAST to the history's column types: an uncast
    # string literal would make unionByName silently widen DATE/TIMESTAMP
    # valid_from/valid_to columns to string in the merged output
    eff_from = F.lit(effective_ts).cast(history.schema[from_col].dataType)
    eff_to = F.lit(effective_ts).cast(history.schema[to_col].dataType)
    closed = history.filter(F.col(to_col).isNotNull()).select(*cols)
    current = history.filter(F.col(to_col).isNull()).select(*cols)
    snap = snapshot.select(*keys, *tracked)
    j = (
        current.withColumn("__c", F.lit(1))
        .alias("c")
        .join(
            snap.withColumn("__s", F.lit(1)).alias("s"),
            _cols_equal(keys),
            "full",
        )
    )
    in_both = F.col("__c").isNotNull() & F.col("__s").isNotNull()
    unchanged = in_both & _cols_equal(tracked)
    changed = in_both & ~_cols_equal(tracked)
    only_current = F.col("__s").isNull()
    only_snap = F.col("__c").isNull()

    def from_current(to_val: Column) -> list[Column]:
        return [
            *[F.col(f"c.{k}").alias(k) for k in keys],
            *[F.col(f"c.{t}").alias(t) for t in tracked],
            F.col(f"c.{from_col}").alias(from_col),
            to_val.alias(to_col),
        ]

    def from_snap() -> list[Column]:
        return [
            *[F.col(f"s.{k}").alias(k) for k in keys],
            *[F.col(f"s.{t}").alias(t) for t in tracked],
            eff_from.alias(from_col),
            F.lit(None).cast(current.schema[to_col].dataType).alias(to_col),
        ]

    kept_open = j.filter(unchanged).select(*from_current(F.col(f"c.{to_col}")))
    missing = j.filter(only_current).select(
        *from_current(
            eff_to if close_missing else F.col(f"c.{to_col}")
        )
    )
    newly_closed = j.filter(changed).select(*from_current(eff_to))
    reopened = j.filter(changed | only_snap).select(*from_snap())
    return (
        closed.unionByName(kept_open)
        .unionByName(missing)
        .unionByName(newly_closed)
        .unionByName(reopened)
    )


def scd2_current(
    history: DataFrame, to_col: str = "valid_to"
) -> DataFrame:
    """The current view: open versions only."""
    return history.filter(F.col(to_col).isNull())


def scd2_as_of(
    history: DataFrame,
    ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time travel: versions valid at ``ts`` (from <= ts < to)."""
    return history.filter(
        (F.col(from_col) <= ts)
        & (F.col(to_col).isNull() | (F.col(to_col) > ts))
    )
