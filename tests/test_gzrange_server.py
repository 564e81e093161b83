"""GZRange server tests (sources/gzrange_server.py) against a live server.

Status contract from the reference (server/GZRangeServer.java:102-185):
206 + exact member Content-Length on success, 400 missing offset, 404
missing file, 415 gzip misalignment, 416 past EOF.
"""

from __future__ import annotations

import gzip
import io
import threading
import urllib.error
import urllib.request

import pytest

from ia_hadoop_tools_spark.sources.gzrange_server import (
    fetch_member,
    make_server,
    member_compressed_length,
)

RECORDS = [b"first record payload", b"second, longer record payload " * 10, b"third"]


def _member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


@pytest.fixture(scope="module")
def gzfile(tmp_path_factory):
    """Record-compressed file: one gzip member per record, with offsets."""
    path = tmp_path_factory.mktemp("gzr") / "records.gz"
    offsets, blob = [], b""
    for rec in RECORDS:
        offsets.append(len(blob))
        blob += _member(rec)
    path.write_bytes(blob)
    return str(path), offsets, len(blob)


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_member_compressed_length_scan(gzfile):
    path, offsets, total = gzfile
    sizes = offsets[1:] + [total]
    with open(path, "rb") as fh:
        for off, end in zip(offsets, sizes):
            fh.seek(off)
            assert member_compressed_length(fh) == end - off


def test_fetch_each_member_range_header(server, gzfile):
    path, offsets, total = gzfile
    sizes = offsets[1:] + [total]
    for off, end, rec in zip(offsets, sizes, RECORDS):
        payload = fetch_member(server, path, off)
        assert len(payload) == end - off  # exact compressed member
        assert gzip.decompress(payload) == rec


def test_offset_query_param(server, gzfile):
    path, offsets, _ = gzfile
    with urllib.request.urlopen(f"{server}{path}?offset={offsets[1]}") as r:
        assert r.status == 206
        assert gzip.decompress(r.read()) == RECORDS[1]


def _status(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_error_statuses(server, gzfile):
    path, offsets, total = gzfile
    assert _status(f"{server}{path}") == 400  # no Range / offset
    assert _status(f"{server}/does/not/exist?offset=0") == 404
    assert _status(f"{server}{path}?offset={total + 10}") == 416
    assert _status(f"{server}{path}?offset={total}") == 416  # exactly EOF
    # misaligned: inside a member, not at a boundary
    assert _status(f"{server}{path}?offset={offsets[1] + 3}") == 415
    # bounded ranges are NOT the protocol (reference parses only "bytes=N-")
    assert _status(f"{server}{path}", {"Range": "bytes=0-99"}) == 400


def test_hmac_authenticated_server(gzfile):
    """The signed-fetch loop end-to-end: client signs with the shared
    secret, authenticated server verifies; unsigned/forged -> 401."""
    import gzip as _gzip
    import threading as _threading

    from ia_hadoop_tools_spark.functions.authfns import hmac_cookie_str
    from ia_hadoop_tools_spark.sources.gzrange_server import make_server

    path, offsets, _ = gzfile
    srv = make_server(port=0, hmac_secret="topsecret")
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert _status(f"{base}{path}?offset=0") == 401  # unsigned
        bad = hmac_cookie_str("extract", "wrongsecret")
        assert _status(f"{base}{path}?offset=0", {"Cookie": bad}) == 401
        good = hmac_cookie_str("extract", "topsecret")
        payload = fetch_member(base, path, offsets[1], cookie=good)
        assert _gzip.decompress(payload) == RECORDS[1]
    finally:
        srv.shutdown()


def test_root_confinement(gzfile, tmp_path):
    """With root_dir set, only files under it are served: a readable file
    outside the root (or a ../ escape normalizing outside) gets 403."""
    import os as _os
    import threading as _threading

    path, offsets, _ = gzfile
    outside = tmp_path / "outside.gz"
    outside.write_bytes(_member(b"outside payload"))

    root = _os.path.dirname(path)
    srv = make_server(port=0, root_dir=root)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # in-root file still serves
        payload = fetch_member(base, path, offsets[0])
        assert gzip.decompress(payload) == RECORDS[0]
        # a file the process CAN read but outside the root: refused
        assert _status(f"{base}{outside}?offset=0") == 403
        # ../ escape that normalizes outside the root: refused
        esc = f"{root}/../{outside.parent.name}/{outside.name}"
        assert _status(f"{base}{esc}?offset=0") == 403
    finally:
        srv.shutdown()


def test_quoted_path_with_spaces_roundtrips(tmp_path):
    """Archive filenames with spaces/%/# must fetch: the client quotes
    the path and the server percent-decodes it."""
    from ia_hadoop_tools_spark.sources.gzrange_server import fetch_member

    path = tmp_path / "my file 100%.warc.gz"
    path.write_bytes(_member(b"spaced payload"))
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        got = fetch_member(base, str(path), 0)
        assert gzip.decompress(got) == b"spaced payload"
    finally:
        srv.shutdown()


def test_206_carries_content_range(server, gzfile):
    import urllib.request

    path, offsets, size = gzfile
    req = urllib.request.Request(
        f"{server}{path}", headers={"Range": f"bytes={offsets[1]}-"}
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 206
        cr = resp.headers["Content-Range"]
        gz_len = int(resp.headers["Content-Length"])
        assert cr == f"bytes {offsets[1]}-{offsets[1] + gz_len - 1}/{size}"
