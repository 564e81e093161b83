"""As-of (time-travel) join — a custom operator Spark lacks natively.

Not in the reference (its only join forms are §2.5's merges/semi/anti), but a
standard need for event pipelines built on this engine: attach to each event
the most recent observation from another time series (price as of trade,
config as of request, signup as of activity).

Spark-first shape: ``groupBy(key).cogroup(right.groupBy(key))`` +
``applyInPandas`` running ``pd.merge_asof`` per key group — Arrow-batched,
one shuffle per side on the key (exactly a sort-merge join's movement), no
driver involvement. DuckDB's native ASOF JOIN is the differential oracle.

Scale notes: state per task is one key group's rows (bounded by the hottest
key — salt upstream if one key dominates); both inputs arrive sorted per
group via the in-function sort, costing O(n log n) per group, same as the
join's shuffle sort would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    how: str = "inner",
    method: str = "native",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` per key (direction='backward'; 'forward' takes
    the smallest ``>=``).

    Right's non-key, non-ts columns are appended; ``right_ts`` is kept
    (renamed if it collides with a left column). ``how='left'`` keeps
    unmatched left rows with nulls; 'inner' drops them.

    Null timestamps: a null ``right_ts`` row never matches anything, and a
    null ``left_ts`` row is unmatched (kept under 'left', dropped under
    'inner') — identical under both methods.

    ``method='native'`` (default): union the two sides, one window pass with
    ``last(col, ignorenulls=True)`` carries the latest right values forward
    within each key — whole plan stays in codegen, one shuffle+sort total,
    no Python workers. ``method='pandas'``: cogrouped ``pd.merge_asof`` —
    required for ``tolerance`` (max |left_ts - right_ts| for a match, in the
    ts column's own units), which the single-pass native form doesn't carry.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if method not in ("native", "pandas"):
        # a typo must not silently fall through to the Python cogroup path
        raise ValueError(f"method must be 'native' or 'pandas', got {method!r}")
    if method == "native":
        if tolerance is not None:
            raise ValueError("tolerance requires method='pandas'")
        if direction not in ("backward", "forward"):
            # pd.merge_asof's 'nearest' (or a typo) would silently run as
            # 'forward' in the window formulation
            raise ValueError(
                f"direction {direction!r} requires method='pandas' "
                "(native supports 'backward'/'forward')"
            )
        return _asof_native(
            left, right, key_cols, left_ts, right_ts,
            direction, allow_exact_matches, how,
        )
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    rts = right_ts or left_ts

    right_cols = [c for c in right.columns if c not in keys]
    out_fields = list(left.schema.fields)
    rfields = {f.name: f for f in right.schema.fields}
    appended = []
    for c in right_cols:
        # same collision rule as the native path: '_r' suffix
        name = c if c not in left.columns else f"{c}_r"
        appended.append((name, c))
        out_fields.append(rfields[c].__class__(name, rfields[c].dataType, True))

    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    left_names = [f.name for f in left.schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        out_names = [f.name for f in out_fields]
        # null-ts handling mirrors the native path: null right ts never
        # matches; null left ts is unmatched (kept for 'left' only)
        lnull = l[l[left_ts].isna()] if how == "left" else None
        l = l[l[left_ts].notna()]
        parts = []
        if not l.empty:
            l = l.sort_values(left_ts, kind="mergesort")
            rr = r[[c for _, c in appended]].rename(
                columns={c: n for n, c in appended}
            )
            rr["__on"] = r[rts]
            rr["__matched"] = True
            rr = rr[rr["__on"].notna()].sort_values("__on", kind="mergesort")
            l2 = l.copy()
            l2["__on"] = l[left_ts]
            if l2["__on"].dtype != rr["__on"].dtype:
                # a group whose ts column held nulls arrives as float64 while
                # the other side is int64 — promote both to the common dtype
                import numpy as np

                common = np.result_type(l2["__on"].dtype, rr["__on"].dtype)
                l2["__on"] = l2["__on"].astype(common)
                rr["__on"] = rr["__on"].astype(common)
            merged = pd.merge_asof(
                l2, rr, on="__on",
                direction=direction, allow_exact_matches=allow_exact_matches,
                tolerance=tolerance,
            ).drop(columns="__on")
            if how == "inner":
                merged = merged[merged["__matched"].notna()]
            parts.append(merged[out_names])
        if lnull is not None and not lnull.empty:
            parts.append(lnull.reindex(columns=out_names))
        if not parts:
            return pd.DataFrame(columns=out_names)
        return pd.concat(parts, ignore_index=True)

    grouped = left.groupBy(*keys).cogroup(right.groupBy(*keys))

    def trampoline(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return merge(l, r)

    return grouped.applyInPandas(trampoline, schema=out_schema)


def _asof_native(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str | None,
    direction: str,
    allow_exact_matches: bool,
    how: str,
) -> DataFrame:
    """Window formulation: sort the union of both sides on (key, ts, side)
    and carry the latest right values onto each left row with
    ``last(ignorenulls=True)``. Side ordering encodes inclusivity: for
    backward-inclusive, right rows sort BEFORE left rows at equal ts, so an
    exact-ts right row is visible to the left row; exclusive flips it.
    'forward' runs the same scan over descending ts.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    rts = right_ts or left_ts

    right_val_cols = [c for c in right.columns if c not in keys]
    appended = []
    for c in right_val_cols:
        name = c
        if name in left.columns:
            name = f"{name}_r"
        appended.append((name, c))

    # null timestamps: a null-ts right row must not be carried forward (it
    # would otherwise sort nulls-first and "match" every left row preceding
    # the first real observation); a null-ts left row is unmatched by
    # definition — kept (with nulls) for how='left', dropped for 'inner'.
    l_side = left.filter(F.col(left_ts).isNotNull()).select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(n) for n, c in appended],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
    )
    r_side = right.filter(F.col(rts).isNotNull()).select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        *[F.col(c).alias(n) for n, c in appended],
        F.lit(0).alias("__is_left"),
        F.col(rts).alias("__ts"),
    )
    unioned = l_side.unionByName(r_side)

    # side order at equal ts: inclusive -> right first (0,1); exclusive ->
    # right last (so the exact-ts right row is NOT visible to the left row)
    side = F.col("__is_left") if allow_exact_matches else -F.col("__is_left")
    ts_ord = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, side)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the matched right row as ONE struct: per-column last(...,
    # ignorenulls) treated a genuinely-NULL right value as "no
    # observation" (carrying an older row's value forward) and filled each
    # column independently — which could assemble a row that never
    # existed. A struct of all-null fields is still non-null, so NULL
    # values ride correctly and the match is atomic.
    row_struct = (
        F.struct(*[F.col(n).alias(n) for n, _ in appended])
        if appended
        else F.struct(F.lit(1).alias("__m"))
    )
    filled = unioned.select(
        "*",
        F.last(
            F.when(F.col("__is_left") == 0, row_struct), ignorenulls=True
        )
        .over(w)
        .alias("__frow"),
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__frow.{n}").alias(n) for n, _ in appended
    ]
    if how == "inner":
        filled = filled.filter(F.col("__frow").isNotNull())
    out = filled.select(*out_cols)
    if how == "left":
        null_left = left.filter(F.col(left_ts).isNull()).select(
            *[F.col(c) for c in left.columns],
            *[
                F.lit(None).cast(dict(right.dtypes)[c]).alias(n)
                for n, c in appended
            ],
        )
        out = out.unionByName(null_left)
    return out
