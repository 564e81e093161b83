"""Batched, bounded-async external sink (the Cassandra importer shape).

Reference: cassandra/CDXImporter.java:36-70,118-137 — rows accumulate into
10k-statement UNLOGGED batches (``numToBatch``); batches go out as async
futures with at most 8 in flight (``numActive``), applying backpressure by
waiting on the OLDEST future before admitting a new one. That
foreachPartition-writer-with-bounded-async-batches pattern is the one §2.2
sink shape the engine lacked; this module is the generic Spark-first
version, decoupled from any one database driver.

Differences from the reference, on purpose:

- The reference logs-and-continues on a batch timeout (data loss under
  sustained failure). Here a batch retries ``retries`` times with backoff
  and then RAISES, failing the Spark task — Spark re-runs the task, and
  because every batch carries a deterministic idempotency key
  (``partitionId-batchSeq``) an idempotent endpoint (Cassandra INSERT by
  primary key, any upsert store) converges to exactly-once content.
- Connection setup is per partition (``make_sender`` factory = the
  reference's ``init``: connect + prepare once, then bind per batch).

Scale: one connection pool per partition-task, ``max_in_flight`` bounds
executor memory (at most ``max_in_flight * batch_size`` rows buffered in
futures) and bounds pressure on the external store per task; totals ride
Spark accumulators, not collected data.
"""

from __future__ import annotations

import time
from collections import deque
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import DataFrame

#: reference operating constants (CDXImporter.java:38-46)
DEFAULT_BATCH_SIZE = 10_000
DEFAULT_MAX_IN_FLIGHT = 8
DEFAULT_TIMEOUT = 180.0  # the reference's 3-minute future wait

SendFn = Callable[[list[Any], str], None]


class NonRetryableError(Exception):
    """Raise from a sender to fail the batch IMMEDIATELY — no retries, no
    backoff. For permanent endpoint answers (4xx: bad payload, expired
    auth, batch too large) where re-sending the same bytes can only burn
    time and load."""


def write_batched_async(
    df: DataFrame,
    make_sender: Callable[[int], SendFn],
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_in_flight: int = DEFAULT_MAX_IN_FLIGHT,
    timeout: float = DEFAULT_TIMEOUT,
    retries: int = 3,
    backoff: float = 0.2,
    batch_id_prefix: str = "",
    collect_stats: bool = True,
) -> dict[str, int]:
    """Write ``df`` to an external store in bounded-async batches.

    ``make_sender(partition_id)`` runs once per partition task and returns
    ``send(rows, batch_id)``; ``send`` is called from a bounded thread pool
    with at most ``batch_size`` rows and a deterministic ``batch_id``
    (``"<partition>-<seq>"``) the endpoint can use as an idempotency key.
    Backpressure matches the reference: when ``max_in_flight`` futures are
    out, the OLDEST must finish before the next batch is admitted.

    Returns ``{"rows": n, "batches": n, "retries": n}`` (accumulator
    totals; task retries can overcount rows/batches — the endpoint's
    idempotency, not the counters, is the correctness story). Pass
    ``collect_stats=False`` to skip accumulator creation and get zeros —
    REQUIRED for long-lived per-micro-batch callers (streaming/export):
    pyspark accumulators register in a process-global registry that is
    never cleaned, so three new ones per micro-batch leak driver memory
    for the stream's lifetime.
    """
    if batch_size < 1 or max_in_flight < 1 or retries < 0:
        raise ValueError("batch_size/max_in_flight >= 1, retries >= 0")
    sc = df.sparkSession.sparkContext
    if collect_stats:
        rows_acc = sc.accumulator(0)
        batches_acc = sc.accumulator(0)
        retries_acc = sc.accumulator(0)
    else:
        rows_acc = batches_acc = retries_acc = None

    def run_partition(it: Iterator[Any]) -> None:
        import threading

        from pyspark import TaskContext

        # pyspark Accumulator.add is an unlocked read-modify-write; pool
        # threads would race it. Tally locally under a lock, flush to the
        # accumulators ONCE from the task thread at the end.
        local = {"rows": 0, "batches": 0, "retries": 0}
        local_lock = threading.Lock()

        def send_with_retry(
            send: SendFn, rows: list[Any], batch_id: str
        ) -> None:
            for attempt in range(retries + 1):
                try:
                    send(rows, batch_id)
                    with local_lock:
                        local["rows"] += len(rows)
                        local["batches"] += 1
                    return
                except NonRetryableError:
                    raise  # permanent endpoint answer: retrying = pure waste
                except Exception:
                    if attempt == retries:
                        raise
                    with local_lock:
                        local["retries"] += 1
                    time.sleep(backoff * (2**attempt))

        pid = TaskContext.get().partitionId()
        # probe before connecting: empty partitions (post-filter skew is
        # full of them) must not open a sender connection + thread pool
        _sentinel = object()
        it = iter(it)
        first = next(it, _sentinel)
        if first is _sentinel:
            return
        import itertools

        it = itertools.chain([first], it)
        send = make_sender(pid)
        pool = ThreadPoolExecutor(max_workers=max_in_flight)
        in_flight: deque = deque()
        seq = 0
        try:
            def submit(rows: list[Any]) -> None:
                nonlocal seq
                if len(in_flight) >= max_in_flight:
                    # admit-by-retiring-the-oldest (CDXImporter.sendBatch)
                    in_flight.popleft().result(timeout=timeout)
                in_flight.append(
                    pool.submit(
                        send_with_retry, send, rows,
                        f"{batch_id_prefix}{pid}-{seq}",
                    )
                )
                seq += 1

            batch: list[Any] = []
            for row in it:
                batch.append(row)
                if len(batch) >= batch_size:
                    submit(batch)
                    batch = []
            if batch:  # the close()-time flush
                submit(batch)
            while in_flight:
                in_flight.popleft().result(timeout=timeout)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
            closer = getattr(send, "close", None)
            if callable(closer):
                closer()
            if rows_acc is not None:
                rows_acc.add(local["rows"])
                batches_acc.add(local["batches"])
                retries_acc.add(local["retries"])

    df.rdd.foreachPartition(run_partition)
    if rows_acc is None:
        return {"rows": 0, "batches": 0, "retries": 0}
    return {
        "rows": rows_acc.value,
        "batches": batches_acc.value,
        "retries": retries_acc.value,
    }


def http_json_sender(
    url: str, cookie: str | None = None, timeout: float = 60.0
) -> Callable[[int], SendFn]:
    """``make_sender`` posting each batch as a JSON array with an
    ``X-Batch-Id`` idempotency header — the wire shape the tests' mock
    endpoint (and any upsert HTTP store) consumes."""

    def make(partition_id: int) -> SendFn:
        import json
        import urllib.error
        import urllib.request

        # NO redirect following: urllib re-issues a redirected POST as a
        # BODY-LESS GET whose 200 would count the batch as delivered —
        # silent data loss on every batch behind an http->https upgrade.
        # A 3xx from the sink is a misconfigured URL; fail loudly so the
        # caller fixes the endpoint instead of losing data.
        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                raise NonRetryableError(
                    f"sink endpoint redirected ({code}) to {newurl}; "
                    "redirects would drop the POST body — point the sink "
                    "at the final URL"
                )

        opener = urllib.request.build_opener(_NoRedirect)

        def send(rows: list[Any], batch_id: str) -> None:
            payload = [
                r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
                for r in rows
            ]
            req = urllib.request.Request(
                url,
                data=json.dumps(payload).encode("utf-8"),
                headers={
                    "Content-Type": "application/json",
                    "X-Batch-Id": batch_id,
                },
                method="POST",
            )
            if cookie:
                req.add_header("Cookie", cookie)
            try:
                # urlopen raises HTTPError for >=400 and 3xx raises above,
                # so a returned response IS a 2xx success
                with opener.open(req, timeout=timeout):
                    pass
            except urllib.error.HTTPError as e:
                # permanent client errors don't heal on resend; 408/429
                # are the two retry-worthy 4xx
                if 400 <= e.code < 500 and e.code not in (408, 429):
                    raise NonRetryableError(
                        f"sink endpoint returned {e.code}"
                    ) from e
                raise OSError(f"sink endpoint returned {e.code}") from e

        return send

    return make
