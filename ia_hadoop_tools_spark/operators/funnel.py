"""Ordered-step funnel analysis over an event stream.

The product-analytics companion to ``streaming/sessions.py``: how many
users complete step 1, then step 2 AFTER step 1, ... within a conversion
window — the ClickHouse ``windowFunnel`` / Amplitude funnel shape,
expressed as chained per-user MIN aggregations so everything stays in
exact timestamp arithmetic (no floats, no ordering sensitivity):

    t_1(u) = min ts of step-1 events of u
    t_k(u) = min ts of step-k events of u with t_{k-1} < ts <= t_1 + W

Scale shape: one pass per step — a groupBy(user) conditional-min over
the (already user-keyed) event table joined to the previous step's
per-user frame. All shuffles are user-keyed and partially aggregated;
k steps = k scans, never a per-user window over raw events. For very
long funnels a single ``applyInPandas`` per user would trade scans for
state; at the typical 3-6 steps the chained-agg plan wins (each stage is
map-side combinable and whole-stage codegen).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user step-completion times: (user, ``t1`` .. ``t<k>`` timestamps).

    ``t<i>`` is NULL when the user never completed step i inside the
    funnel's constraints (strictly after step i-1, within
    ``window_seconds`` of step 1). Step-1 time is the user's earliest
    step-1 event; ties inside one timestamp resolve to the same instant,
    so simultaneous step events at the exact same ts do NOT chain
    (strict ``>`` — the conservative funnel convention).
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {list(steps)!r}")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__e"),
        F.col(ts_col).alias("__ts"),
    )
    cur = ev.filter(F.col("__e") == steps[0]).groupBy("__u").agg(
        F.min("__ts").alias("t1")
    )
    deadline = F.col("t1") + F.make_interval(secs=F.lit(window_seconds))
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        stepped = (
            ev.filter(F.col("__e") == step)
            .join(cur.select("__u", "t1", F.col(prev)), "__u")
            .filter(
                (F.col("__ts") > F.col(prev)) & (F.col("__ts") <= deadline)
            )
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(stepped, "__u", "left")
    return cur.withColumnRenamed("__u", user_col)


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel conversion table: (``step`` 1-based, ``step_name``, ``n_users``).

    ``n_users`` at step i counts users whose ``t<i>`` is non-null —
    monotone non-increasing by construction.
    """
    times = funnel_times(
        events, steps, window_seconds, user_col, type_col, ts_col
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"t{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"t{i}").alias("n_users"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return counts.select(F.explode(pairs).alias("__x")).select(
        "__x.step", "__x.step_name", "__x.n_users"
    )
