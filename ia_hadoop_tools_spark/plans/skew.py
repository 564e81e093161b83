"""Skew mitigation helpers — hot urlkeys are the norm in web-archive data.

The engine's first line of defense is AQE (`spark.sql.adaptive.skewJoin`,
enabled in session.py), which splits oversized shuffle partitions at runtime.
These helpers cover the cases AQE can't re-plan:

- ``salted_join``: shuffled equi-join where ONE side's key distribution is
  heavily skewed and the other side is too big to broadcast but small enough
  to replicate ``n_salt``-fold. The skewed side gets a deterministic salt,
  the other side is exploded across all salt values, and the join key becomes
  (key, salt) — hot keys spread over ``n_salt`` tasks.
- ``salted_distinct_count``: two-phase distinct aggregation for a single hot
  group (partial distinct per (key, salt), merge per key).

Both are pure DataFrame compositions (no shuffle service tricks), so they
work identically on local[N] and a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    ``on`` columns must exist on both sides (the usual `join(on=...)`
    contract); output columns match ``skewed.join(other, on, how)``. The salt
    is ``pmod(hash(<all skewed columns>), n_salt)`` — deterministic, so
    retries/resumes produce identical partitioning. Use when: the hot side's
    key histogram has outliers, ``other`` is 10-1000x too big to broadcast,
    and AQE's split threshold hasn't caught the skew (e.g. one monster key
    inside an otherwise-average partition).
    """
    keys = [on] if isinstance(on, str) else list(on)
    # salting REPLICATES the right side, so only join types where an
    # unmatched right row contributes nothing are semantics-preserving: a
    # right/full outer (or right_semi/anti) would emit up to n_salt
    # null-padded duplicates per right row
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r} "
            "(the replicated right side would duplicate outer rows)"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = left.join(right, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    n_salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT x) per group, skew-safe.

    Plain ``groupBy(k).agg(countDistinct(x))`` funnels every row of a hot key
    through one task. Two-phase form: distinct over (k, salt(x), x) spreads
    the dedup work, then a cheap sum-of-partial-counts per key. Exact result.
    """
    gcols = list(group_cols)
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salt))
    partial = (
        df.select(*gcols, F.col(distinct_col), salt.alias("__salt"))
        .dropDuplicates(gcols + ["__salt", distinct_col])
        .groupBy(*gcols, "__salt")
        .agg(F.count(distinct_col).alias("__partial"))
    )
    return partial.groupBy(*gcols).agg(F.sum("__partial").alias(out_col))


def cap_group_population(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    max_n: int | None,
    what: str = "cap",
) -> DataFrame:
    """Deterministic per-group top-N guard for quadratic-downstream inputs.

    A self-join keyed on ``group_cols`` generates C(n, 2) rows per group,
    so a group whose population DENSIFIES with corpus growth turns a
    linear query super-linear (the round-5 sf1 sweep measured the
    triangles day-pair join growing 100x at 10x data). This keeps the
    first ``max_n`` rows per group under the caller's ``order_cols``
    ranking (make it total — e.g. activity desc then id — so retries and
    resumes keep identical survivors), which bounds every group's
    downstream pair count by C(max_n, 2). With ``max_n=None`` or no
    group over the cap the input passes through IDENTICALLY.

    Lazy: constructing this launches no job (the ``_drop_hot_buckets``
    idiom — textops.py). The dropped-row count rides the caller's first
    action as an ``Observation`` (``out.cap_obs``;
    ``obs.get["dropped_rows"]``), so the truncation is always visible in
    metrics, never silent. The window shuffles on exactly the group key
    the downstream self-join uses, so Catalyst reuses the exchange.
    """
    if max_n is None:
        return df
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    from pyspark.sql import Observation, Window

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    marked = df.withColumn("__rk", F.row_number().over(w))
    obs = Observation(f"{what}.capped")
    marked = marked.observe(
        obs,
        F.sum((F.col("__rk") > max_n).cast("long")).alias("dropped_rows"),
    )
    out = marked.filter(F.col("__rk") <= max_n).drop("__rk")
    out.cap_obs = obs
    return out
