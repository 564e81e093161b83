"""Batched bounded-async sink (sources/batched_sink.py) against a live mock
endpoint: pins batch size, bounded in-flight concurrency (admit by retiring
the oldest), and idempotent retry — the CDXImporter contract."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ia_hadoop_tools_spark.sources.batched_sink import (
    http_json_sender,
    write_batched_async,
)


class _Endpoint(BaseHTTPRequestHandler):
    """Idempotent upsert store keyed by row['k'], batch-aware."""

    lock = threading.Lock()
    store: dict  # k -> row
    batch_sizes: dict  # batch_id -> size (last successful attempt)
    attempts: dict  # batch_id -> count
    active = 0
    max_active = 0
    fail_first_attempt = False
    fail_always = False
    fail_status = 500
    delay = 0.0

    def log_message(self, *a):
        pass

    def do_POST(self):  # noqa: N802 (http.server API)
        cls = _Endpoint
        body = self.rfile.read(int(self.headers["Content-Length"]))
        rows = json.loads(body)
        batch_id = self.headers["X-Batch-Id"]
        with cls.lock:
            cls.active += 1
            cls.max_active = max(cls.max_active, cls.active)
            cls.attempts[batch_id] = cls.attempts.get(batch_id, 0) + 1
            first = cls.attempts[batch_id] == 1
        try:
            if cls.delay:
                time.sleep(cls.delay)
            if cls.fail_always or (cls.fail_first_attempt and first):
                self.send_response(cls.fail_status)
                self.end_headers()
                return
            with cls.lock:
                for r in rows:  # upsert: retries converge, no duplicates
                    cls.store[r["k"]] = r
                cls.batch_sizes[batch_id] = len(rows)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
        finally:
            with cls.lock:
                cls.active -= 1


@pytest.fixture()
def endpoint():
    _Endpoint.store = {}
    _Endpoint.batch_sizes = {}
    _Endpoint.attempts = {}
    _Endpoint.active = 0
    _Endpoint.max_active = 0
    _Endpoint.fail_first_attempt = False
    _Endpoint.fail_always = False
    _Endpoint.fail_status = 500
    _Endpoint.delay = 0.0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Endpoint)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/ingest"
    srv.shutdown()


def test_batch_size_and_idempotent_retry(spark, endpoint):
    _Endpoint.fail_first_attempt = True  # every batch fails once, then lands
    df = spark.range(500).selectExpr("id as k", "id * 2 as v").repartition(2)
    stats = write_batched_async(
        df, http_json_sender(endpoint), batch_size=100,
        max_in_flight=4, retries=3, backoff=0.01,
    )
    assert sorted(_Endpoint.store) == list(range(500))  # exactly-once content
    assert all(r["v"] == r["k"] * 2 for r in _Endpoint.store.values())
    assert all(s <= 100 for s in _Endpoint.batch_sizes.values())
    assert stats["rows"] == 500
    assert stats["batches"] == len(_Endpoint.batch_sizes)
    assert stats["retries"] == len(_Endpoint.batch_sizes)  # one retry each
    assert all(n == 2 for n in _Endpoint.attempts.values())


def test_bounded_in_flight_concurrency(spark, endpoint):
    _Endpoint.delay = 0.15
    df = spark.range(600).selectExpr("id as k", "id as v").coalesce(1)
    write_batched_async(
        df, http_json_sender(endpoint), batch_size=100, max_in_flight=2,
    )
    assert sorted(_Endpoint.store) == list(range(600))
    # the bound holds strictly, and async actually overlapped requests
    assert _Endpoint.max_active <= 2
    assert _Endpoint.max_active == 2


def test_exhausted_retries_fail_the_job(spark, endpoint):
    _Endpoint.fail_always = True
    df = spark.range(10).selectExpr("id as k").coalesce(1)
    with pytest.raises(Exception, match="500|returned"):
        write_batched_async(
            df, http_json_sender(endpoint), batch_size=5,
            retries=1, backoff=0.01,
        )


def test_permanent_4xx_fails_immediately_without_retries(spark, endpoint):
    """A 400-class endpoint answer is NOT transient: the batch must fail
    on the first attempt (NonRetryableError), not burn retries+backoff
    re-sending bytes the endpoint already rejected."""
    _Endpoint.fail_always = True
    _Endpoint.fail_status = 400
    df = spark.range(10).selectExpr("id as k").coalesce(1)
    with pytest.raises(Exception, match="400"):
        write_batched_async(
            df, http_json_sender(endpoint), batch_size=5,
            retries=3, backoff=0.01,
        )
    # one attempt per batch, zero retries
    assert all(n == 1 for n in _Endpoint.attempts.values())


def test_trailing_partial_batch_flushes(spark, endpoint):
    df = spark.range(101).selectExpr("id as k").coalesce(1)
    stats = write_batched_async(
        df, http_json_sender(endpoint), batch_size=100,
    )
    assert sorted(_Endpoint.store) == list(range(101))
    assert sorted(_Endpoint.batch_sizes.values()) == [1, 100]
    assert stats["batches"] == 2


def test_bad_params_raise(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_batched_async(df, http_json_sender("http://x"), batch_size=0)


def test_stream_to_endpoint_exactly_once_content(spark, endpoint, tmp_path):
    """availableNow stream -> batched sink: backlog drains to the endpoint
    with streaming-batch-scoped idempotency keys; a restart with no new
    files re-sends nothing (file-log checkpoint)."""
    from ia_hadoop_tools_spark.streaming.export import stream_to_endpoint

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    spark.range(300).selectExpr("id as k", "id as v").write.parquet(
        inp, mode="overwrite"
    )
    stream = spark.readStream.schema("k long, v long").parquet(inp)
    q = stream_to_endpoint(
        stream, http_json_sender(endpoint), ckpt, batch_size=100,
    )
    q.awaitTermination()
    assert sorted(_Endpoint.store) == list(range(300))
    assert all(bid.startswith("b") for bid in _Endpoint.batch_sizes)

    n_batches = len(_Endpoint.batch_sizes)
    q = stream_to_endpoint(
        stream, http_json_sender(endpoint), ckpt, batch_size=100,
    )
    q.awaitTermination()
    assert len(_Endpoint.batch_sizes) == n_batches  # nothing re-sent


class _Redirector(BaseHTTPRequestHandler):
    """Answers every POST with a 302 to /elsewhere (the http->https
    upgrade shape)."""

    def log_message(self, *a):
        pass

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self.send_response(302)
        self.send_header("Location", "/elsewhere")
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):  # noqa: N802  (the redirected body-less resend)
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


def test_redirected_post_fails_loudly_not_silently(spark):
    """Review repro: urllib re-issues a redirected POST as a body-less
    GET whose 200 counted the batch as delivered — silent data loss.
    A 3xx must now fail the job as non-retryable."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Redirector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/ingest"
    try:
        df = spark.range(10).selectExpr("id as k", "id as v").coalesce(1)
        with pytest.raises(Exception, match="redirect"):
            write_batched_async(
                df, http_json_sender(url), batch_size=5, retries=0,
            )
    finally:
        srv.shutdown()


def test_empty_partitions_open_no_sender(spark, endpoint):
    """Empty partitions must not construct a sender connection."""
    opened = spark.sparkContext.accumulator(0)

    def make_sender(pid):
        opened.add(1)

        def send(rows, batch_id):
            pass

        return send

    # 64 partitions, 3 rows: at most 3 non-empty
    df = spark.range(3).selectExpr("id as k").repartition(64)
    write_batched_async(df, make_sender, batch_size=10)
    assert opened.value <= 3
