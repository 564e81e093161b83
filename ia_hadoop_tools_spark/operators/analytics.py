"""Warehouse-analytics primitives: exact group quantiles, cohort retention.

Rounding out the engine's OLAP surface (SURVEY §2.6/§2.7 aggregate
family) with two shapes every analytics user reaches for:

- :func:`exact_group_quantiles` — order-statistics quantiles
  (``percentile_disc`` semantics: the value AT index ceil(q*n), never an
  interpolated float), computed with integer index arithmetic and a
  total tie-break order so results are bit-deterministic and
  reproducible in plain SQL. Exact quantiles are sort-based — one
  window per group; for billion-row groups the engine's scale path is
  ``approx_percentile`` (t-digest, mergeable), this operator is the
  exact small/medium-group form the oracle can verify.
- :func:`cohort_retention` — the classic product-analytics rollup:
  users bucketed by first-seen day, counted at each day offset. One
  groupBy(user) for cohorts + one distinct + one groupBy(cohort,
  offset); all shuffles keyed on high-cardinality columns, fully
  partial-aggregated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-group discrete quantiles: value at row ceil(q*n) of the sorted group.

    ``quantiles`` are (label, numerator, denominator) rationals so the
    index ceil(q*n) = (n*num + den - 1) div den stays in integer
    arithmetic, clamped to >= 1 so q=0 returns the group minimum
    (``percentile_disc(0)`` semantics). NULL values are excluded before
    ranking — ``percentile_disc`` ignores them; leaving them in would
    both inflate n and shift every index (NULLs sort first in Spark).
    ``tiebreak`` columns complete the sort order when ``value_col`` has
    duplicates (determinism, not semantics — any row at the index
    carries the same value).
    """
    if not quantiles:
        # an empty sequence would leave keep=None and crash deep inside
        # DataFrame.filter(None) after the window plan is built
        raise ValueError("exact_group_quantiles: need at least one quantile")
    df = df.filter(F.col(value_col).isNotNull())
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wn = Window.partitionBy(*group_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(wn)
    )
    aggs = []
    keep: Column | None = None
    for label, num, den in quantiles:
        idx = F.expr(f"greatest((__n * {num} + {den - 1}) div {den}, 1)")
        hit = F.col("__rn") == idx
        keep = hit if keep is None else (keep | hit)
        aggs.append(
            F.max(F.when(hit, F.col(value_col))).alias(label)
        )
    return ranked.filter(keep).groupBy(*group_cols).agg(*aggs)


def approx_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles via ``percentile_approx`` —
    the 100 TB path beside :func:`exact_group_quantiles`.

    Crossover rule (documented contract): the EXACT operator ranks each
    group in one window, i.e. ONE task sorts the whole group — right
    whenever groups are small/medium and the oracle must value-match;
    a single billion-row group funnels that task. This operator builds a
    bounded Greenwald-Khanna sketch per partition and MERGES sketches
    (map-side combinable HashAggregate, no per-group sort, no window), so
    a hot group costs the same as any other. Guarantee: rank error
    <= n/accuracy per group (plus discreteness), NOT value equality —
    results are sketch-dependent, so the registry oracle for this
    operator pins the rank-error CONTRACT via
    :func:`quantile_bound_check`, not the values.

    Output schema matches :func:`exact_group_quantiles`:
    (group_cols..., label...) with one column per quantile label.
    """
    if not quantiles:
        raise ValueError("approx_group_quantiles: need at least one quantile")
    df = df.filter(F.col(value_col).isNotNull())
    probs = [num / den for _, num, den in quantiles]
    agg = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            F.col(value_col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("__qs")
    )
    return agg.select(
        *group_cols,
        *[
            F.col("__qs").getItem(i).alias(label)
            for i, (label, _, _) in enumerate(quantiles)
        ],
    )


def quantile_bound_check(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    accuracy: int = 10000,
) -> DataFrame:
    """(group_cols..., label, within_bound) — verifies the approx
    sketch's rank-error contract against the data itself.

    For each approx value v in group g with n rows: the count of rows
    strictly below v must not overshoot the target rank ceil(q*n) by
    more than n/accuracy, and the count at-or-below v must reach it
    minus n/accuracy. Every row is ``true`` iff the sketch honors its
    bound — a deterministic, engine-independent assertion the driver
    oracle can pin even though the approx VALUES are sketch-dependent.

    Cost: the approx aggregation plus ONE more scan joined against the
    (groups x quantiles)-sized approx table — both map-side combinable.
    The source is deliberately NOT persisted: two pruned parquet scans
    beat caching a fact table at scale.
    """
    df = df.filter(F.col(value_col).isNotNull())
    approx = approx_group_quantiles(
        df, group_cols, value_col, quantiles, accuracy
    )
    pairs = approx.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(label).alias("label"),
                        F.col(label).cast("double").alias("__qv"),
                        F.lit(num).alias("__num"),
                        F.lit(den).alias("__den"),
                    )
                    for label, num, den in quantiles
                ]
            )
        ).alias("__q"),
    ).select(*group_cols, "__q.label", "__q.__qv", "__q.__num", "__q.__den")
    joined = df.join(pairs, list(group_cols))
    stats = joined.groupBy(*group_cols, "label", "__qv", "__num", "__den").agg(
        F.count("*").alias("__n"),
        F.sum(
            (F.col(value_col).cast("double") < F.col("__qv")).cast("long")
        ).alias("__lt"),
        F.sum(
            (F.col(value_col).cast("double") <= F.col("__qv")).cast("long")
        ).alias("__le"),
    )
    target = F.expr("greatest((__n * __num + __den - 1) div __den, 1L)")
    slack = (F.col("__n") / accuracy) + 1
    out = stats.select(
        *group_cols,
        "label",
        (
            (F.col("__lt") <= target + slack)
            & (F.col("__le") >= target - slack)
        ).alias("within_bound"),
    )
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort-retention rollup: (``cohort_day``, ``day_offset``, ``n_users``).

    ``cohort_day`` (yyyy-MM-dd string) is the user's first active day;
    ``n_users`` counts distinct users of that cohort active exactly
    ``day_offset`` days later. Day 0 row per cohort = cohort size.
    """
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(user_col).agg(F.min(day).alias("__first"))
    active = events.select(F.col(user_col), day.alias("__day")).distinct()
    out = (
        active.join(firsts, user_col)
        .select(
            F.date_format("__first", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("__day", "__first").cast("long").alias("day_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("day_offset") <= max_offset)
    return out
