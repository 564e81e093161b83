"""Ordered-step funnel analysis over an event stream.

The product-analytics companion to ``streaming/sessions.py``: how many
users complete step 1, then step 2 AFTER step 1, ... within a conversion
window, expressed as chained per-user MIN aggregations so everything
stays in exact timestamp arithmetic (no floats, no ordering
sensitivity):

    t_1(u) = min ts of step-1 events of u
    t_k(u) = min ts of step-k events of u with t_{k-1} < ts <= t_1 + W

ANCHOR SEMANTICS — two variants:

- :func:`funnel_times` / :func:`funnel_counts` anchor the window at the
  user's EARLIEST step-1 event (the SQL-expressible convention the
  registry oracle pins). A user whose first attempt stalls but who later
  completes a fresh chain counts as non-converted here.
- :func:`window_funnel_levels` is the ClickHouse ``windowFunnel`` /
  Amplitude semantics: ANY step-1 event may anchor the chain, so it
  reports the deepest level reachable by any anchor. Level counts are
  >= the anchored variant's by construction.

Scale shape (anchored variant): one pass per step — a groupBy(user)
conditional-min over the (already user-keyed) event table joined to the
previous step's per-user frame. All shuffles are user-keyed and
partially aggregated; k steps = k scans, never a per-user window over
raw events. The any-anchor variant is a pure SQL ``aggregate()`` fold
over each user's sorted step-event array (state bounded by a user's
history, all JVM codegen — zero Python in the analytics layer); the
original ``applyInPandas`` DP is kept as
:func:`window_funnel_levels_pandas`, the differential reference.
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
    ``window_seconds`` of step 1). Step-1 time is the user's EARLIEST
    step-1 event — see the module docstring for how this anchored
    convention differs from ClickHouse's any-anchor ``windowFunnel``
    (:func:`window_funnel_levels`). Ties inside one timestamp resolve to
    the same instant, so simultaneous step events at the exact same ts
    do NOT chain (strict ``>`` — the conservative funnel convention).
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
    # each iteration references `cur` exactly ONCE (left join + re-agg with
    # the carried t-columns, constant per user): referencing it twice — in
    # the step subquery AND the assembly join — duplicates the whole prior
    # chain per step, i.e. 2^(k-1) copies of the step-1 subtree in the
    # analyzed plan (driver-side blowup long before any data moves)
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        carried = [f"t{j}" for j in range(1, i)]
        ev_k = ev.filter(F.col("__e") == step).select(
            "__u", F.col("__ts").alias("__ts_k")
        )
        cur = (
            cur.join(ev_k, "__u", "left")
            .groupBy("__u")
            .agg(
                *[F.max(c).alias(c) for c in carried],
                F.min(
                    F.when(
                        (F.col("__ts_k") > F.col(prev))
                        & (F.col("__ts_k") <= deadline),
                        F.col("__ts_k"),
                    )
                ).alias(f"t{i}"),
            )
        )
    return cur.withColumnRenamed("__u", user_col)


def window_funnel_levels(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user deepest funnel level, ClickHouse ``windowFunnel``
    semantics: (user, ``level``) where level = the largest k such that
    SOME step-1 event anchors a chain step1 < step2 < ... < stepk with
    step_k <= anchor + window (strict ``<`` between steps, matching
    :func:`funnel_times`'s convention). Users with no step-1 event are
    absent.

    Pure SQL ``aggregate()`` fold over the user's ts-sorted step-event
    array (the ``bpe.py`` merge-fold idiom) — all JVM codegen, no Python
    stage. DP state per level k: the MAXIMUM anchor timestamp over all
    chains reaching level k so far. That single value suffices because
    (a) a chain's deadline depends only on its anchor, so feasibility of
    extending with a later event is monotone in the anchor — if the
    max-anchor chain fails the window every other chain fails too; and
    (b) strict ``<`` between steps is enforced structurally: updates for
    events at timestamp t read the state COMMITTED before t (the
    ``cur``/``olda``/``newa`` two-phase below), so a level-k chain can
    never chain off a same-timestamp event. Linear in the user's event
    count (vs the reference DP's anchors x window-events), and levels
    are prefix-contiguous, so the final level is just the count of set
    anchor slots. Differential reference:
    :func:`window_funnel_levels_pandas`.
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {list(steps)!r}")
    step_list = list(steps)
    k = len(step_list)
    win_us = int(window_seconds) * 1_000_000

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__e"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("__e").isin(step_list))

    # events carry their NAME, not a precomputed step index: a step name
    # may legitimately repeat in `steps` (view -> click -> view), and an
    # index via array_position would pin every event to its FIRST match,
    # making deeper repeated levels unreachable. Spark timestamps are
    # microsecond-resolution, so unix_micros loses nothing vs the pandas
    # reference's ns ints.
    per_user = ev.groupBy("__u").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("__ts").alias("t"), F.col("__e").alias("nm")
                )
            )
        ).alias("__evs")
    )

    null_long = F.lit(None).cast("long")
    init = F.struct(
        null_long.alias("cur"),
        F.array_repeat(null_long, k).alias("olda"),
        F.array_repeat(null_long, k).alias("newa"),
    )

    def merge(acc, e):
        # two-phase commit: when the fold crosses into a new timestamp,
        # newa (which only ever grows, so newa >= olda elementwise)
        # becomes the committed pre-t state; events AT t update newa but
        # read olda — same-ts events can never chain off each other
        committed = F.when(
            acc["cur"].isNull() | (e["t"] == acc["cur"]), acc["olda"]
        ).otherwise(acc["newa"])

        step_arr = F.array(*[F.lit(s) for s in step_list])

        def upd(v, i):
            # element_at is 1-based; greatest(i,1) keeps the index legal
            # for the i==0 slot (whose branch never reads prev). The event
            # name is compared against THIS level's step name, so an event
            # can feed every level whose step repeats its name.
            prev = F.element_at(committed, F.greatest(i, F.lit(1)))
            here = e["nm"] == F.element_at(step_arr, i + F.lit(1))
            cand = F.when((i == F.lit(0)) & here, e["t"]).otherwise(
                F.when(
                    (i > F.lit(0))
                    & here
                    & prev.isNotNull()
                    & (e["t"] <= prev + F.lit(win_us)),
                    prev,
                )
            )
            return F.greatest(v, cand)

        return F.struct(
            e["t"].alias("cur"),
            committed.alias("olda"),
            F.transform(acc["newa"], upd).alias("newa"),
        )

    levels = F.aggregate(
        F.col("__evs"),
        init,
        merge,
        lambda acc: F.size(F.filter(acc["newa"], lambda v: v.isNotNull())),
    )
    return (
        per_user.select(F.col("__u"), levels.cast("int").alias("level"))
        .filter(F.col("level") > 0)
        .withColumnRenamed("__u", user_col)
    )


def window_funnel_levels_pandas(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Differential reference for :func:`window_funnel_levels`: the same
    any-anchor semantics as an ``applyInPandas`` greedy DP (per anchor,
    earliest-valid-next-step — optimal because taking the earliest
    occurrence never shrinks later choices). Kept OFF the production
    path; tests pin the SQL fold bit-identical to this.
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {list(steps)!r}")
    step_list = list(steps)
    win = int(window_seconds) * 1_000_000_000  # ns

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__e"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("__e").isin(step_list))

    def levels(pdf):
        import pandas as pd

        out_users, out_levels = [], []
        for u, g in pdf.groupby("__u", sort=False):
            g = g.sort_values("__ts", kind="mergesort")
            # full ns resolution: second-truncation would blur the
            # strict ordering between sub-second step events
            ts = g["__ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            es = g["__e"].tolist()
            best = 0
            for a in range(len(es)):
                if es[a] != step_list[0]:
                    continue
                deadline = ts[a] + win
                level, cur_ts = 1, ts[a]
                for j in range(a + 1, len(es)):
                    if ts[j] > deadline:
                        break
                    if level < len(step_list) and es[j] == step_list[level] and ts[j] > cur_ts:
                        level += 1
                        cur_ts = ts[j]
                        if level == len(step_list):
                            break
                best = max(best, level)
                if best == len(step_list):
                    break
            if best:
                out_users.append(u)
                out_levels.append(best)
        return pd.DataFrame({"__u": out_users, "level": out_levels})

    out = ev.groupBy("__u").applyInPandas(
        levels, f"__u {dict(ev.dtypes)['__u']}, level int"
    )
    return out.withColumnRenamed("__u", user_col)


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
