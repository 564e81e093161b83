"""HTTP paged source tests against a real local HTTP server
(HttpTextLoader paging contract: showNumPages probe + one fetch per page,
cookie passthrough, start/end pushdown)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

import pytest

from ia_hadoop_tools_spark.sources.http import discover_num_pages, read_http_paged

N_PAGES = 4
LINES_PER_PAGE = 25


class _Handler(BaseHTTPRequestHandler):
    seen_cookies: list[str] = []
    seen_ranges: list[tuple] = []

    def do_GET(self):
        q = dict(parse_qsl(urlsplit(self.path).query))
        if q.get("showNumPages") == "true":
            body = b""
            self.send_response(200)
            self.send_header("X-CDX-Num-Pages", str(N_PAGES))
            self.end_headers()
            self.wfile.write(body)
            return
        page = int(q.get("page", "0"))
        if "Cookie" in self.headers:
            _Handler.seen_cookies.append(self.headers["Cookie"])
        if "start" in q or "end" in q:
            _Handler.seen_ranges.append((q.get("start"), q.get("end")))
        lo = page * LINES_PER_PAGE
        body = "".join(
            f"key{(lo + i):05d} line{(lo + i)}\n" for i in range(LINES_PER_PAGE)
        ).encode()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/cdx?q=example"
    srv.shutdown()


def test_discover_num_pages(server):
    assert discover_num_pages(server) == N_PAGES


def test_read_all_pages(spark, server):
    df = read_http_paged(spark, server)
    rows = df.collect()
    assert len(rows) == N_PAGES * LINES_PER_PAGE
    keys = sorted(r.value.split(" ")[0] for r in rows)
    assert keys == [f"key{i:05d}" for i in range(N_PAGES * LINES_PER_PAGE)]
    assert {r.page for r in rows} == set(range(N_PAGES))


def test_cookie_and_range_pushdown(spark, server):
    _Handler.seen_cookies.clear()
    _Handler.seen_ranges.clear()
    df = read_http_paged(
        spark, server, num_pages=2, start="key00010", end="key00020",
        cookie="auth=tok123",
    )
    assert df.count() == 2 * LINES_PER_PAGE
    assert all(c == "auth=tok123" for c in _Handler.seen_cookies)
    assert _Handler.seen_cookies  # cookie actually reached the server
    assert all(r == ("key00010", "key00020") for r in _Handler.seen_ranges)


def test_with_params_preserves_duplicate_and_blank_params():
    from ia_hadoop_tools_spark.sources.http import _with_params

    url = "http://x/cdx?filter=statuscode:200&filter=mimetype:text%2Fhtml&foo="
    out = _with_params(url, {"page": "3"})
    import urllib.parse

    q = urllib.parse.parse_qsl(
        urllib.parse.urlsplit(out).query, keep_blank_values=True
    )
    assert q.count(("filter", "statuscode:200")) == 1
    assert q.count(("filter", "mimetype:text/html")) == 1
    assert ("foo", "") in q and ("page", "3") in q
