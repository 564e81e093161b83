"""Sessionization — the engine's stateful-streaming extension.

The reference has no streaming operators (SURVEY.md §2.11); incrementality is
batch file bookkeeping. A training-data pipeline needs event sessionization
both as a batch transform (driver_queries.q_sessionize — the oracle-checked
lag/cumsum form) and on live streams. Two Spark-native forms:

- ``sessionize_events``: the built-in ``session_window`` gap-window aggregate.
  Works identically on batch DataFrames and on streams (with a watermark);
  Catalyst plans the session merge natively — this is the default.
- ``sessionize_stateful``: ``applyInPandasWithState`` custom operator, the
  template for stateful logic ``session_window`` can't express (per-session
  caps, value-dependent gaps, custom eviction). Emits CLOSED sessions when the
  gap is exceeded inside the arriving batch and an OPEN running snapshot per
  group per batch; state carries (start, last, n, total) across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_GAP = "30 minutes"


def _session_out_schema(key_type) -> StructType:
    """Output schema with the session key typed like the INPUT key column —
    a hardcoded LongType killed string-keyed streams in the Arrow worker."""
    return StructType(
        [
            StructField("user_id", key_type),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("status", StringType()),  # 'closed' | 'open'
        ]
    )


#: long-keyed default, kept for import compatibility
SESSION_OUT_SCHEMA = _session_out_schema(LongType())

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_events(
    df: DataFrame,
    gap: str = DEFAULT_GAP,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions via the built-in ``session_window``.

    Batch: exact equivalent of the lag/cumsum formulation (tested against it).
    Streaming: pass ``watermark`` (e.g. ``"1 hour"``) — late data beyond it is
    dropped and sessions finalize once the watermark passes their close.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            user_col,
            F.unix_micros("start_ts").alias("start_us"),
            F.unix_micros("end_ts").alias("end_us"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stateful(
    grouped_or_df,
    gap_us: int = 30 * 60 * 1_000_000,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    timeout: str = "NoTimeout",
):
    """Custom stateful sessionization over ``applyInPandasWithState``.

    STREAMING-ONLY (``applyInPandasWithState`` has no batch mode — Spark
    raises on a batch DataFrame; use :func:`sessionize_events` there).
    Input: a streaming DataFrame (or pre-grouped data) with integer
    microsecond timestamps. Per group and micro-batch: ALL arriving
    chunks are concatenated and sorted by ``ts_us`` first (a group can
    span multiple Arrow batches, and chunk-local sorting would corrupt
    boundaries), then merged into the carried session; each in-batch gap
    > ``gap_us`` closes the previous session (status='closed'); the
    still-open tail is emitted as status='open' and kept in state.
    A LATE event (ts <= carried session end) inside the gap extends the
    session's count/total but never rewinds its end (``max(end, ts)``)
    — there is no watermark on this path, so cross-batch late data is
    expected and must not shrink sessions or fabricate closes.

    ``timeout`` must be a valid ``GroupStateTimeout`` member name
    (validated — a typo silently degrading to NoTimeout would disable
    eviction). With ``'ProcessingTimeTimeout'`` the open session's timer
    is (re-)armed to ``gap_us`` after every batch that touches the group;
    with ``'EventTimeTimeout'`` (requires a watermark on the stream) it is
    armed to ``end + gap``, clamped above the current watermark. When the
    timer fires, the carried session is emitted as status='closed' and the
    state REMOVED — without the remove, per-group state grows unboundedly
    on a long-running stream despite the caller requesting eviction.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not hasattr(GroupStateTimeout, timeout):
        raise ValueError(
            f"unknown timeout {timeout!r}; expected a GroupStateTimeout "
            "member name like 'NoTimeout' or 'ProcessingTimeTimeout'"
        )
    proc_timeout = timeout == "ProcessingTimeTimeout"
    event_timeout = timeout == "EventTimeTimeout"
    gap_ms = max(1, gap_us // 1000)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        cols = [
            "user_id", "start_us", "end_us", "n_events", "total_value",
            "status",
        ]
        if state.hasTimedOut:
            # idle past the gap: close the carried session and EVICT
            out = []
            if state.exists:
                s, e, cnt, tot = state.get
                out.append((user_id, s, e, cnt, round(tot, 2), "closed"))
            state.remove()
            yield pd.DataFrame(out, columns=cols)
            return
        if state.exists:
            start, end, n, total = state.get
        else:
            start = None
            end = n = 0
            total = 0.0
        out = []
        # one GLOBAL sort across all of the group's Arrow chunks: a group
        # bigger than maxRecordsPerBatch arrives as several pdfs, and
        # sorting each alone interleaves out-of-order events
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(ts_us_col, kind="mergesort")
            for ts, val in zip(allpdf[ts_us_col], allpdf[value_col]):
                ts = int(ts)
                if start is None:
                    start, end, n, total = ts, ts, 1, float(val)
                elif ts - end > gap_us:
                    out.append((user_id, start, end, n, round(total, 2), "closed"))
                    start, end, n, total = ts, ts, 1, float(val)
                else:
                    # late event (ts <= end): joins the session, never
                    # rewinds it — an unconditional end=ts would let the
                    # next on-time event measure its gap from the rewound
                    # end and falsely close (or emit end_us < start_us);
                    # an event before the carried start extends it backward
                    start = min(start, ts)
                    end, n, total = max(end, ts), n + 1, total + float(val)
        if start is not None:
            state.update((start, end, n, float(total)))
            if proc_timeout:
                state.setTimeoutDuration(gap_ms)
            elif event_timeout:
                # must exceed the current watermark or Spark raises; the
                # natural deadline is session end + gap in event time
                state.setTimeoutTimestamp(
                    max(state.getCurrentWatermarkMs() + 1, end // 1000 + gap_ms)
                )
            out.append((user_id, start, end, n, round(total, 2), "open"))
        yield pd.DataFrame(out, columns=cols)

    src = grouped_or_df
    if isinstance(src, DataFrame):
        key_type = src.schema[user_col].dataType
        src = src.groupBy(user_col)
    else:
        # GroupedData: the bound DataFrame rides the private _df attr;
        # fall back to the long-keyed default if it ever disappears
        bound = getattr(src, "_df", None)
        key_type = (
            bound.schema[user_col].dataType if bound is not None else LongType()
        )
    return src.applyInPandasWithState(
        fn,
        outputStructType=_session_out_schema(key_type),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
