"""Streaming/sessionization tests: built-in session_window equivalence with
the oracle-checked batch form, and the applyInPandasWithState operator."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.session import load_tables
from ia_hadoop_tools_spark.streaming.sessions import (
    sessionize_events,
    sessionize_stateful,
)

GAP_US = 30 * 60 * 1_000_000


def _batch_sessionize(ev):
    """The lag/cumsum reference formulation (same as driver q_sessionize)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = ev.select("user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us"))
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = base.withColumn(
        "__new", F.when(gap.isNull() | (gap > GAP_US), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def test_session_window_matches_lag_cumsum(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sw = sessionize_events(ev).select("user_id", "start_us", "end_us", "n_events")
    ref = _batch_sessionize(ev).select("user_id", "start_us", "end_us", "n_events")
    assert sorted(map(tuple, sw.collect())) == sorted(map(tuple, ref.collect()))


def test_stateful_sessionize_stream(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    # user 1: two events 10 min apart (one session), then one 2 h later
    # (closes the first); user 2: single event
    rows = [
        (1, 0, 10.0),
        (1, 10 * 60 * 1_000_000, 5.0),
        (1, 130 * 60 * 1_000_000, 1.0),
        (2, 0, 7.5),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts_us: long, value: double")
    df.coalesce(1).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, value double")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = sessionize_stateful(stream.groupBy("user_id"))
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.status): r
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    closed = got[(1, "closed")]
    assert closed.n_events == 2 and closed.total_value == 15.0
    assert closed.start_us == 0 and closed.end_us == 10 * 60 * 1_000_000
    open1 = got[(1, "open")]
    assert open1.n_events == 1 and open1.start_us == 130 * 60 * 1_000_000
    assert got[(2, "open")].total_value == 7.5


def test_stateful_state_carries_across_batches(spark, tmp_path):
    src = tmp_path / "s2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    schema = "user_id long, ts_us long, value double"

    collected = []

    def run_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        collected.clear()
        q = (
            sessionize_stateful(stream.groupBy("user_id"))
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return list(collected)

    run_batch([(7, 0, 1.0)], "b1")
    # second batch: event 5 min after the first -> SAME session continues
    rows = run_batch([(7, 5 * 60 * 1_000_000, 2.0)], "b2")
    open7 = [r for r in rows if r.user_id == 7 and r.status == "open"]
    assert len(open7) == 1
    assert open7[0].n_events == 2 and open7[0].start_us == 0
    assert open7[0].total_value == 3.0


def test_stateful_group_spanning_arrow_chunks_sorts_globally(spark, tmp_path):
    """Review repro: a group bigger than maxRecordsPerBatch arrives as
    several pandas chunks; chunk-local sorting corrupted session
    boundaries. With the global sort, 6 shuffled events at 0..25 min are
    ONE open session ending at 25 min."""
    src = tmp_path / "chunks_in"
    src.mkdir()
    minute = 60 * 1_000_000
    order = [15, 0, 25, 5, 20, 10]
    rows = [(1, m * minute, 1.0) for m in order]
    df = spark.createDataFrame(rows, "user_id: long, ts_us: long, value: double")
    df.coalesce(1).write.parquet(str(src / "b1"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema("user_id long, ts_us long, value double")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            sessionize_stateful(stream.groupBy("user_id"))
            .writeStream.format("memory")
            .queryName("sess_chunks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.sql("SELECT * FROM sess_chunks").collect()
    assert len(got) == 1
    r = got[0]
    assert r.status == "open"
    assert (r.start_us, r.end_us, r.n_events) == (0, 25 * minute, 6)


def test_stateful_late_event_never_rewinds_session(spark, tmp_path):
    """Review repro: a late event (earlier ts arriving in a later batch)
    joins the session but must not rewind its end — the next on-time
    event used to measure its gap from the rewound end and falsely
    close."""
    src = tmp_path / "late_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_late")
    schema = "user_id long, ts_us long, value double"
    minute = 60 * 1_000_000
    collected = []

    def run_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        collected.clear()
        q = (
            sessionize_stateful(stream.groupBy("user_id"))
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return list(collected)

    run_batch([(9, 100 * minute, 1.0)], "b1")
    # late event 50 min BEFORE the carried session start, within the gap?
    # 100-50=50min > 30min gap -> actually closes; use 80min (20min gap)
    rows = run_batch([(9, 80 * minute, 2.0)], "b2")
    open9 = [r for r in rows if r.status == "open"][0]
    assert (open9.start_us, open9.end_us, open9.n_events) == (
        80 * minute, 100 * minute, 2)
    # on-time event 25 min after the TRUE end (100): still same session —
    # with the rewind bug the gap was measured from 80 and falsely closed
    rows = run_batch([(9, 125 * minute, 4.0)], "b3")
    assert [r.status for r in rows] == ["open"]
    open9 = rows[0]
    assert (open9.start_us, open9.end_us, open9.n_events) == (
        80 * minute, 125 * minute, 3)


def test_stateful_rejects_bad_timeout_name(spark):
    import pytest

    df = spark.createDataFrame([(1, 0, 1.0)], "user_id long, ts_us long, value double")
    with pytest.raises(ValueError, match="GroupStateTimeout"):
        sessionize_stateful(df.groupBy("user_id"), timeout="processingTimeTimeout")


def test_session_window_stream_with_watermark(spark, tmp_path):
    """sessionize_events on a real stream: watermarked session_window in
    append mode emits only FINALIZED sessions (close < watermark)."""
    src = tmp_path / "sw_in"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"
    rows = [
        (1, "2020-01-01 00:00:00", 1.0),
        (1, "2020-01-01 00:10:00", 2.0),   # same session (10 min gap)
        (1, "2020-01-01 05:00:00", 4.0),   # far future event advances the
        (2, "2020-01-01 05:00:00", 8.0),   # watermark past session 1's close
    ]
    df = spark.createDataFrame(
        [(u, __import__("datetime").datetime.fromisoformat(t), v) for u, t, v in rows],
        schema,
    )
    df.coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    from ia_hadoop_tools_spark.streaming.sessions import sessionize_events

    sessions = sessionize_events(stream, gap="30 minutes", watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sw_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.start_us): r
        for r in spark.sql("SELECT * FROM sw_sessions").collect()
    }
    # only user 1's first session is finalized (closed 00:40 < watermark 04:00);
    # the 05:00 sessions are still open pending the watermark.
    base = __import__("datetime").datetime.fromisoformat("2020-01-01 00:00:00")
    start_us = int(base.timestamp() * 1_000_000)
    assert list(got) == [(1, start_us)]
    s = got[(1, start_us)]
    assert s.n_events == 2 and s.total_value == 3.0


def test_stateful_string_keyed_stream(spark, tmp_path):
    """Review repro: SESSION_OUT_SCHEMA hardcoded user_id as LongType, so a
    string-keyed stream died in the Arrow worker — the key column's type
    must follow the input."""
    src = tmp_path / "str_in"
    src.mkdir()
    rows = [("dev-a", 0, 1.0), ("dev-a", 60_000_000, 2.0), ("dev-b", 0, 4.0)]
    df = spark.createDataFrame(rows, "user_id: string, ts_us: long, value: double")
    df.coalesce(1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema("user_id string, ts_us long, value double")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        sessionize_stateful(stream.groupBy("user_id"))
        .writeStream.format("memory")
        .queryName("sess_str")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_str"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: r for r in spark.sql("SELECT * FROM sess_str").collect()
    }
    assert got["dev-a"].n_events == 2 and got["dev-a"].total_value == 3.0
    assert got["dev-b"].total_value == 4.0


def test_stateful_processing_timeout_closes_and_evicts(spark, tmp_path):
    """Review repro: timeout='ProcessingTimeTimeout' was validated but the
    fn never armed a timer nor removed state — idle sessions were never
    evicted. With the fix, an idle group times out on a later batch, emits
    'closed', and its state is REMOVED (a returning event starts fresh)."""
    import time

    src = tmp_path / "to_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_to")
    schema = "user_id long, ts_us long, value double"
    collected = []

    def run_batch(rows, name, done):
        """Run one availableNow cycle; ``done(collected)`` is the
        completion predicate.  An armed processing-time timer keeps the
        availableNow query ALIVE (Spark schedules further batches to
        serve future timers, so termination never comes and a bare
        awaitTermination(120) burns its full budget — this test was 366 s
        of pure timeout wait): poll for the expected rows instead and
        stop the query explicitly; the armed timer survives in the
        checkpoint and is served by the next cycle."""
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        collected.clear()
        q = (
            sessionize_stateful(
                stream.groupBy("user_id"),
                gap_us=1_000_000,  # 1 s gap -> 1 s processing-time timer
                timeout="ProcessingTimeTimeout",
            )
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and q.isActive and not done(
            list(collected)
        ):
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(30)
        return list(collected)

    def _has(rows, user, status):
        return any(r.user_id == user and r.status == status for r in rows)

    rows1 = run_batch(
        [(1, 0, 5.0)], "b1", lambda rs: _has(rs, 1, "open")
    )
    assert (1, "open") in {(r.user_id, r.status) for r in rows1}
    time.sleep(2.5)  # let user 1's 1 s processing-time timer expire
    # a batch touching only user 2 fires user 1's expired timer (the
    # timer may already have fired during b1's own run — availableNow
    # executes an extra no-data batch to serve expired timers)
    closed_in_b1 = _has(rows1, 1, "closed")
    rows2 = run_batch(
        [(2, 0, 7.0)], "b2",
        lambda rs: _has(rs, 2, "open")
        and (closed_in_b1 or _has(rs, 1, "closed")),
    )
    assert (2, "open") in {(r.user_id, r.status) for r in rows2}
    closed1 = [
        r for r in rows1 + rows2 if r.user_id == 1 and r.status == "closed"
    ]
    assert len(closed1) == 1, "idle session must close exactly once"
    assert (closed1[0].start_us, closed1[0].end_us, closed1[0].n_events) == (
        0, 0, 1)
    # user 1 returns: state was removed, so this is a FRESH session
    rows = run_batch(
        [(1, 10_000_000_000, 1.0)], "b3", lambda rs: _has(rs, 1, "open")
    )
    open1 = [r for r in rows if r.user_id == 1 and r.status == "open"]
    assert len(open1) == 1 and open1[0].n_events == 1
    assert open1[0].start_us == 10_000_000_000
