"""Mergeable distinct-count sketches (KMV / bottom-k) as DataFrames.

At 100 TB you cannot afford an exact ``count(distinct x)`` per rollup
cell on every dashboard refresh; the standard answer is a MERGEABLE
sketch table: pre-aggregate a small per-group sketch once (one pass over
the data), then answer distinct-count queries — and unions of groups —
from the sketch alone. This module implements the K-Minimum-Values
sketch (Bar-Yossef et al. 2002; the same estimator family behind
Datasketches' theta sketch) with a PORTABLE hash (functions/hashfns.py
``hash32``), so sketches are bit-deterministic across engines and runs —
the DuckDB oracle reproduces them exactly, unlike Spark's native HLL
(``approx_count_distinct``), whose binary sketches are engine-private.

Estimator: with M = 2^32 the hash space, keep each group's k smallest
distinct hash values; if fewer than k exist the sketch IS the exact
distinct set, else ``est = (k-1) * M div kth_min`` (integer division —
deterministic; relative error ~ 1/sqrt(k-2)).

Scale shape: the one expensive step is deduplicating (group, hash) —
one shuffle with map-side partial aggregation. The min-k selection then
runs as a SALTED two-stage window (per-(group, salt) top-k first, then
top-k of the <= salt*k survivors), so a group with a billion distinct
values never funnels through a single task. Merging sketches
(:func:`kmv_merge`) is a union + the same min-k — associative and
commutative, the property that makes the sketch table maintainable
incrementally (new day's sketch merges into the running one without
touching history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.hashfns import hash32

#: hash space size for the 32-bit portable hash
KMV_SPACE = 1 << 32
#: salt fan-out for the two-stage min-k (stage 1 keeps salt*k candidates)
KMV_SALTS = 32


def _min_k(
    df: DataFrame, group_cols: Sequence[str], k: int, salted: bool
) -> DataFrame:
    """Keep each group's k smallest ``__h`` (exact min-k, optionally salted).

    Salted two-stage: bucket rows by ``__h % KMV_SALTS``; each bucket's
    k smallest are a superset of the global k smallest, so stage 2 ranks
    only <= KMV_SALTS * k candidate rows per group.
    """
    gcols = [F.col(c) for c in group_cols]
    if salted:
        w1 = Window.partitionBy(*gcols, F.col("__h") % KMV_SALTS).orderBy("__h")
        df = (
            df.withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= k)
            .drop("__rn1")
        )
    w2 = Window.partitionBy(*gcols).orderBy("__h")
    return (
        df.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    k: int = 64,
    salted: bool = True,
) -> DataFrame:
    """Per-group KMV sketch rows: (``group_cols...``, ``__h``), <= k rows/group.

    ``value`` is hashed with the portable 32-bit hash; duplicate values
    collapse in the (group, hash) dedup, so the sketch depends only on
    the SET of values per group.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = df.select(*group_cols, hash32(value, salt="kmv:").alias("__h"))
    # NULL values hash to NULL, which would sort FIRST in the min-k window
    # (displacing a real minimum and skewing the estimate) while SQL
    # engines order it last — distinct-count semantics ignore NULL, both
    # for correctness and for cross-engine sketch parity
    hashed = hashed.filter(F.col("__h").isNotNull())
    sketch = _min_k(hashed.distinct(), group_cols, k, salted)
    # carry the build k so estimation can never silently use a different one
    return sketch.withColumn("__k", F.lit(k).cast("int"))


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Merge two sketch tables into the sketch of the UNION of their inputs.

    Exact identity: min-k(S_A ∪ S_B) = min-k(min-k(S_A) ∪ min-k(S_B));
    sketches are tiny, so the unsalted single window suffices. ``k`` must
    not exceed either input's build k (a merge cannot invent minima the
    inputs already discarded); the carried ``__k`` column enforces it at
    evaluation time via a codegen'd assertion.
    """
    # pre-__k sketch files (older published versions): assume build k =
    # the requested k, the same fallback kmv_estimate documents — without
    # it the streaming RESUME path dies on NUM_COLUMNS_MISMATCH
    if "__k" not in a.columns:
        a = a.withColumn("__k", F.lit(k).cast("int"))
    if "__k" not in b.columns:
        b = b.withColumn("__k", F.lit(k).cast("int"))
    u = a.unionByName(b).withColumn(
        "__k",
        F.when(
            F.col("__k") >= k, F.lit(k).cast("int")
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"kmv_merge: requested k={k} exceeds an input sketch's "
                    f"build k — merged minima would be incomplete"
                )
            ).cast("int")
        ),
    )
    return _min_k(u.distinct(), group_cols, k, salted=False)


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Sketch rows -> (``group_cols...``, ``n_kept``, ``kth_hash``,
    ``est_distinct``) — exact count when the sketch isn't full.

    The k used in the estimator is the sketch's own carried ``__k``
    (estimating with a different k than the build silently mis-scales);
    the ``k`` parameter is only the fallback for pre-``__k`` sketch
    files.
    """
    has_k = "__k" in sketch.columns
    aggs = [F.count("*").alias("n_kept"), F.max("__h").alias("kth_hash")]
    if has_k:
        aggs.append(F.max("__k").alias("__k"))
    agg = sketch.groupBy(*group_cols).agg(*aggs)
    kcol = F.col("__k") if has_k else F.lit(k)
    est = F.when(F.col("n_kept") < kcol, F.col("n_kept")).otherwise(
        F.expr(f"(({'__k' if has_k else k} - 1) * {KMV_SPACE}L) div kth_hash")
    )
    return agg.withColumn("est_distinct", est.cast("long")).drop("__k")


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    k: int = 64,
) -> DataFrame:
    """One-shot per-group distinct-count estimate (sketch + estimate)."""
    return kmv_estimate(kmv_sketch(df, group_cols, value, k), group_cols, k)


def hll_distinct_bound(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    rsd: float = 0.05,
    slack: float = 4.0,
) -> DataFrame:
    """(group_cols..., within_bound) — verifies Spark's native HLL++
    scale path (``approx_count_distinct``) against its own error
    contract on this data, per group.

    KMV (above) is the PORTABLE sketch (bit-identical to the DuckDB
    oracle); HLL++ is the native sibling you reach for when you don't
    need cross-engine determinism — denser (constant ~1.5 kB per group
    at 5% rsd vs k rows) and fully JVM-side.  Its binary sketch is
    engine-private, so the pinnable statement is the CONTRACT, not the
    value: ``|est - exact| <= max(1, slack * rsd * exact)`` (rsd is the
    sketch's one-sigma target; ``slack`` sigmas keeps the assertion
    deterministic-in-practice — measured on the events user-day probe
    across sf0.001/0.01/0.1/1 the worst observed relative error is
    0.039-0.072 vs the 0.20 bound, ~3x headroom at every scale).  Same
    pattern as analytics.quantile_bound_check.

    Cost: ONE scan — both aggregates share the group-keyed exchange;
    the exact count(distinct) exists only to audit the sketch (a
    production rollup would ship est alone).
    """
    v = F.col(value) if isinstance(value, str) else value
    agg = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.approx_count_distinct(v, rsd).alias("__est"),
            F.count_distinct(v).alias("__exact"),
        )
    )
    bound = F.greatest(
        F.lit(1.0), F.lit(slack * rsd) * F.col("__exact").cast("double")
    )
    return agg.select(
        *group_cols,
        (
            F.abs(F.col("__est") - F.col("__exact")).cast("double") <= bound
        ).alias("within_bound"),
    )
