"""GZRange HTTP server: answer one-gzip-member range requests.

Reference: server/GZRangeServer.java:29-187 — a special HTTP server for
record-compressed gzip files (WARC/ZipNum shards): the client sends an
UNBOUNDED range (``Range: bytes=OFFSET-`` or ``?offset=N``) and the server
scans ahead from that offset to find where the gzip member ends, then
responds ``206`` with ``Content-Length`` set to the member's EXACT
compressed size — so a client can fetch one record without knowing its
length up front. Status contract matches the reference: 400 no offset,
404/403 bad file, 416 offset past EOF, 415 gzip misalignment, 206 success.

The repackaging client logic itself is ``archive_file_extractor``
(operators/extract.py); :func:`fetch_member` is the thin HTTP client that
pairs with this server (server/GZRangeClient.java's fetch step).

Scale note: the server is an ops-side sidecar (it serves ranges of files it
can read locally or via pyarrow.fs), not a Spark operator — Spark-side
member access goes straight through ``fsio.read_range`` with ZipNum idx
offsets. This exists for parity with deployments where executors cannot
mount the archive filesystem and fetch members over HTTP instead.
"""

from __future__ import annotations

import io
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_CHUNK = 1 << 16


def member_compressed_length(fh: io.BufferedIOBase) -> int:
    """Scan ahead from the stream position: compressed byte length of the
    ONE gzip member starting there (GZRangeServer.getGZLength:91-99).

    Decompresses through a raw zlib window (gzip wbits) and counts consumed
    input; raises ``ValueError`` on misalignment (offset not at a member
    boundary) — the 415 case.
    """
    d = zlib.decompressobj(wbits=31)
    consumed = 0
    try:
        while not d.eof:
            chunk = fh.read(_CHUNK)
            if not chunk:
                raise ValueError("EOF before gzip member end")
            d.decompress(chunk)
            consumed += len(chunk)
    except zlib.error as e:
        raise ValueError(f"gzip alignment error: {e}") from e
    return consumed - len(d.unused_data)


def _parse_offset(range_header: str | None, query: str) -> int:
    """``Range: bytes=N-`` (unbounded only, like parseBytes:77-89) or the
    ``offset`` GET parameter; -1 when absent/malformed."""
    if range_header and range_header.startswith("bytes=") and range_header.endswith("-"):
        try:
            return int(range_header[6:-1])
        except ValueError:
            pass
    vals = parse_qs(query).get("offset")
    if vals:
        try:
            return int(vals[0])
        except ValueError:
            pass
    return -1


class GZRangeHandler(BaseHTTPRequestHandler):
    """GET <file-path>?offset=N  or  GET <file-path> + Range: bytes=N-

    With ``hmac_secret`` set on the server class, every request must carry
    a valid unexpired cookie (functions/authfns.py) — the server side of
    the reference's signed-fetch loop (ArchiveFileExtractor signs, the
    range service verifies); 401 otherwise.

    With ``root_dir`` set, only files under it are served: the request
    path is realpath-normalized and must stay inside the root (403
    otherwise), making the reference's implicit serve-the-archive-tree
    deployment assumption explicit — a cookie authorizes the archive
    tree, not every file the process can read.
    """

    hmac_secret: str | None = None
    root_dir: str | None = None

    def log_message(self, fmt, *args):  # quiet: tests drive many requests
        pass

    def _text(self, code: int, msg: str) -> None:
        body = (msg + "\n").encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "text/plain;charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        import os

        if self.hmac_secret is not None:
            from ia_hadoop_tools_spark.functions.authfns import (
                verify_hmac_cookie,
            )

            cookie = self.headers.get("Cookie") or ""
            if not verify_hmac_cookie(cookie, self.hmac_secret):
                return self._text(401, "invalid or expired cookie")
        u = urlparse(self.path)
        # percent-decode: clients quote() paths with spaces/%/#/? — raw
        # u.path would 404 any encoded name (and unencoded specials are
        # unroutable through a URL at all)
        from urllib.parse import unquote

        target = unquote(u.path)
        if self.root_dir is not None:
            real = os.path.realpath(target)
            root = os.path.realpath(self.root_dir)
            if real != root and not real.startswith(root + os.sep):
                return self._text(403, "path outside served root")
        if not os.path.isfile(target):
            return self._text(404, "not found")
        if not os.access(target, os.R_OK):
            return self._text(403, "not readable")
        offset = _parse_offset(self.headers.get("Range"), u.query)
        if offset < 0:
            return self._text(
                400, 'Require "Range" header or "offset" GET parameter'
            )
        size = os.path.getsize(target)
        if offset >= size:  # valid member starts are 0..size-1
            return self._text(416, "range past EOF")
        with open(target, "rb") as fh:
            fh.seek(offset)
            try:
                gz_len = member_compressed_length(fh)
            except ValueError:
                return self._text(415, "corrupt range, or gzip alignment error")
            fh.seek(offset)
            payload = fh.read(gz_len)
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(gz_len))
        # RFC 7233: 206 requires Content-Range; strict clients and
        # intermediaries reject or mis-cache a 206 without it
        self.send_header(
            "Content-Range", f"bytes {offset}-{offset + gz_len - 1}/{size}"
        )
        self.end_headers()
        self.wfile.write(payload)


def make_server(
    port: int = 8009,
    hmac_secret: str | None = None,
    root_dir: str | None = None,
) -> ThreadingHTTPServer:
    handler = GZRangeHandler
    if hmac_secret is not None or root_dir is not None:
        handler = type(
            "BoundGZRangeHandler", (GZRangeHandler,),
            {"hmac_secret": hmac_secret, "root_dir": root_dir},
        )
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve(
    port: int = 8009, root_dir: str | None = None
) -> None:  # pragma: no cover - CLI loop
    srv = make_server(port, root_dir=root_dir)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()


def fetch_member(
    base_url: str, file_path: str, offset: int, cookie: str | None = None
) -> bytes:
    """Client side: fetch the one compressed member at ``offset``.

    ``cookie`` is the authenticated-fetch seam (the reference signs these
    with an HMAC cookie — functions/authfns.py)."""
    from urllib.parse import quote
    from urllib.request import Request, urlopen

    headers = {"Range": f"bytes={offset}-"}
    if cookie:
        headers["Cookie"] = cookie
    # quote the path (spaces, %, #, ? in archive filenames are real):
    # unencoded they truncate at # or shift into the query string
    req = Request(f"{base_url}{quote(file_path)}", headers=headers)
    with urlopen(req) as resp:
        if resp.status != 206:
            raise OSError(f"gzrange server returned {resp.status}")
        return resp.read()
