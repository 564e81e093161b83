"""Item-API filesystem tests (sources/itemfs.py) against a live HTTP server.

Integration proof: a ZipNum cluster written locally, served through the
item-metadata protocol, read back with the UNCHANGED codec via
``filesystem=`` — the PetaboxFileSystem pattern end-to-end.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyarrow import fs as pafs

from ia_hadoop_tools_spark.sources.itemfs import make_item_filesystem


_handlers: dict = {}


@pytest.fixture(scope="module")
def item_server(tmp_path_factory):
    """Serves ``root/<itemid>/*`` files + /metadata/<itemid> JSON + ranges
    + a paged /advancedsearch.php (collection = item-name prefix)."""
    root = tmp_path_factory.mktemp("items")

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        search_fail_next = 0  # set >0 to 500 the next N search requests

        def do_GET(self):
            from urllib.parse import parse_qs, unquote, urlsplit

            u = urlsplit(self.path)
            # real HTTP servers percent-decode path segments
            parts = [unquote(x) for x in u.path.strip("/").split("/")]
            if parts[0] == "advancedsearch.php":
                if H.search_fail_next > 0:
                    H.search_fail_next -= 1
                    self.send_error(500)
                    return
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                coll = q["q"].split(":", 1)[1]
                items = sorted(
                    d.name for d in root.iterdir()
                    if d.is_dir() and d.name.startswith(coll)
                )
                start, rows = int(q["start"]), int(q["rows"])
                docs = [
                    {"identifier": i, "publicdate": "2020-01-02T03:04:05Z"}
                    for i in items[start : start + rows]
                ]
                body = json.dumps(
                    {"response": {"numFound": len(items), "docs": docs}}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parts[0] == "metadata" and len(parts) == 2:
                item = root / parts[1]
                if not item.is_dir():
                    self.send_error(404)
                    return
                # rglob + relative names: item metadata may list NESTED
                # names ("deriv/page.txt") — the filesystem must keep them
                # openable (round-6 review regression)
                files = [
                    {
                        "name": f.relative_to(item).as_posix(),
                        "size": f.stat().st_size,
                        "mtime": f.stat().st_mtime,
                    }
                    for f in sorted(item.rglob("*"))
                    if f.is_file()
                ]
                body = json.dumps({"files": files}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if len(parts) >= 2:
                f = root / parts[0] / "/".join(parts[1:])
                if not f.is_file():
                    self.send_error(404)
                    return
                data = f.read_bytes()
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    a, b = rng[6:].split("-")
                    lo = int(a)
                    hi = int(b) if b else len(data) - 1
                    data = data[lo : hi + 1]
                    self.send_response(206)
                else:
                    self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self.send_error(404)

    _handlers["H"] = H
    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield str(root), base
    srv.shutdown()


def test_listing_info_and_reads(item_server):
    root, base = item_server
    os.makedirs(os.path.join(root, "item1"), exist_ok=True)
    with open(os.path.join(root, "item1", "a.txt"), "wb") as f:
        f.write(b"hello item filesystem")
    fs = make_item_filesystem(base, base)

    infos = fs.get_file_info(pafs.FileSelector("item1"))
    assert [(i.path, i.size) for i in infos] == [("item1/a.txt", 21)]
    info = fs.get_file_info(["item1/a.txt", "item1/missing", "item1"])
    assert info[0].type == pafs.FileType.File and info[0].size == 21
    assert info[1].type == pafs.FileType.NotFound
    assert info[2].type == pafs.FileType.Directory

    with fs.open_input_file("item1/a.txt") as fh:
        assert fh.read(5) == b"hello"
        fh.seek(6)
        assert fh.read(4) == b"item"
        fh.seek(-10, 2)
        assert fh.read() == b"filesystem"

    with pytest.raises(OSError):
        fs.open_output_stream("item1/new.txt")
    with pytest.raises(OSError):
        fs.delete_file("item1/a.txt")


def test_zipnum_codec_over_item_filesystem(spark, item_server):
    from ia_hadoop_tools_spark.sources.zipnum import write_zipnum, zipnum_range

    root, base = item_server
    cluster_local = os.path.join(root, "cluster1")
    lines = [f"k{i:04d} 2020 payload-{i}" for i in range(500)]
    df = spark.createDataFrame([(l,) for l in lines], "value: string")
    write_zipnum(df, cluster_local, lines_per_block=50, num_shards=2)

    fs = make_item_filesystem(base, base)
    got = zipnum_range(
        spark, "cluster1", "k0100", "k0150", filesystem=fs
    ).collect()
    assert [r.value for r in got] == lines[100:150]


def test_zipnum_datasource_over_item_protocol(spark, item_server):
    """spark.read.format('zipnum').option('item_api', ...) scans a REMOTE
    cluster (block pruning + Arrow batches) with no local files at all."""
    import os

    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.sources.zipnum import write_zipnum
    from ia_hadoop_tools_spark.sources.zipnum_datasource import register_zipnum

    root, base = item_server
    cluster_local = os.path.join(root, "cluster2")
    lines = [f"q{i:04d} 2021 body-{i}" for i in range(400)]
    df = spark.createDataFrame([(l,) for l in lines], "value: string")
    write_zipnum(df, cluster_local, lines_per_block=40, num_shards=2)

    register_zipnum(spark)
    got = (
        spark.read.format("zipnum")
        .option("item_api", base)
        .load("cluster2")
        .filter((F.col("urlkey") >= "q0050") & (F.col("urlkey") < "q0090"))
        .orderBy("urlkey")
        .collect()
    )
    assert [r.value for r in got] == lines[50:90]


def test_search_collection_items_paged_with_retries(item_server):
    """The ItemSearcher pattern: paged advancedsearch with bounded retries
    — 5 items at 2 rows/page = 3 requests, transient 500s retried."""
    import os as _os

    from ia_hadoop_tools_spark.sources.itemfs import search_collection_items

    root, base = item_server
    for i in range(5):
        d = _os.path.join(root, f"warcs-x-{i:02d}")
        _os.makedirs(d, exist_ok=True)
        with open(_os.path.join(d, f"f{i}.txt"), "w") as fh:
            fh.write("payload")

    got = search_collection_items(base, "warcs-x", rows_per_page=2)
    assert [i for i, _ in got] == [f"warcs-x-{i:02d}" for i in range(5)]
    assert all(mt > 0 for _, mt in got)  # publicdate parsed

    _handlers["H"].search_fail_next = 2  # two transient failures, then ok
    got2 = search_collection_items(
        base, "warcs-x", rows_per_page=200, retry_delay=0.01
    )
    assert [i for i, _ in got2] == [i for i, _ in got]

    _handlers["H"].search_fail_next = 99  # permanent failure -> raises
    # the shared _retrying_get's message (retry loops are consolidated)
    with pytest.raises(OSError, match="fetch failed"):
        search_collection_items(
            base, "warcs-x", max_retries=2, retry_delay=0.01
        )
    _handlers["H"].search_fail_next = 0

    assert search_collection_items(base, "no-such-coll") == []


def test_list_collection_files_df(spark, item_server):
    """Collection -> distributed per-item metadata listing -> every file
    readable through the item filesystem by the listed path."""
    from ia_hadoop_tools_spark.sources.itemfs import list_collection_files_df

    import os as _os

    root, base = item_server
    # self-sufficient fixture data (running this test alone must pass)
    for i in range(5):
        d = _os.path.join(root, f"warcs-x-{i:02d}")
        _os.makedirs(d, exist_ok=True)
        with open(_os.path.join(d, f"f{i}.txt"), "wb") as fh:
            fh.write(b"payload")
    df = list_collection_files_df(spark, base, base, "warcs-x")
    rows = {r.path: r.size for r in df.collect()}
    assert sorted(rows) == [f"warcs-x-{i:02d}/f{i}.txt" for i in range(5)]
    assert all(s == len("payload") for s in rows.values())

    ifs = make_item_filesystem(base, base)
    with ifs.open_input_file(sorted(rows)[0]) as fh:
        assert fh.read() == b"payload"

    assert list_collection_files_df(spark, base, base, "zzz").count() == 0


def test_missing_item_is_notfound_not_httperror(item_server):
    """Probing a file inside a missing item must answer NotFound /
    FileNotFoundError (the pyarrow contract), not leak HTTPError."""
    _, base = item_server
    fs = make_item_filesystem(base, base)
    (info,) = fs.get_file_info(["nosuchitem/file.warc.gz"])
    assert info.type == pafs.FileType.NotFound
    with pytest.raises(FileNotFoundError):
        fs.open_input_file("nosuchitem/file.warc.gz")


def test_root_selector_lists_empty(item_server):
    """The root lists nothing (PetaboxFileSystem:488-491) — a recursive
    walk starting at the filesystem root must get [], not crash."""
    _, base = item_server
    fs = make_item_filesystem(base, base)
    assert fs.get_file_info(pafs.FileSelector("/")) == []
    assert fs.get_file_info(pafs.FileSelector("")) == []


def test_quoted_item_and_file_names(item_server):
    """Names with spaces and % must fetch through percent-encoded URLs."""
    root, base = item_server
    d = os.path.join(root, "item with space")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "my file 100%.txt"), "wb") as f:
        f.write(b"quoted bytes")
    fs = make_item_filesystem(base, base)
    with fs.open_input_file("item with space/my file 100%.txt") as fh:
        assert fh.read() == b"quoted bytes"


def test_metamgr_and_collection_index_searchers(tmp_path):
    """The two remaining ItemSearcher backends (MetaManagerItemSearcher,
    CollectionIndexItemSearcher): same [(itemid, mtime)] contract as the
    advancedsearch shape, pattern-faithful filtering."""
    import threading as _threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ia_hadoop_tools_spark.sources.itemfs import (
        search_collection_items_index,
        search_collection_items_metamgr,
    )

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlsplit

            u = urlsplit(self.path)
            if u.path == "/metamgr.php":
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                off = int(q["off"])
                # page 0: three rows (one collection-typed, one wrong
                # membership — the *coll* pattern over-matched); page 1 empty
                pages = {
                    0: [
                        ["item-a", "texts", "wide;c1", "2020-01-02 03:04:05"],
                        ["c1", "collection", "c1", None],
                        ["item-x", "texts", "c1x;other", None],
                    ],
                }
                body = json.dumps({"rows": pages.get(off, [])}).encode()
            elif u.path.startswith("/getitems/"):
                coll = u.path.rsplit("/", 1)[-1]
                assert coll == "c1"
                body = (
                    '{"id": "item-j", "m": 1577934245}\n'
                    "item-plain some extra\n"
                    "!!! neither json nor identifier\n"
                ).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        got = search_collection_items_metamgr(base, "c1")
        # only item-a survives: c1x membership fails the ;-delimited check,
        # the collection-typed row is excluded
        assert [i for i, _ in got] == ["item-a"]
        assert got[0][1] > 0
        idx = search_collection_items_index(f"{base}/getitems/", "c1")
        assert idx == [("item-j", 1577934245.0), ("item-plain", 0.0)]
    finally:
        srv.shutdown()


def test_nested_metadata_names_listable_and_openable(item_server):
    """Review repro: names containing '/' were listed by the selector but
    open_input_file split on every '/' and raised FileNotFoundError — a
    scan failed on a file the same filesystem just reported as existing."""
    root, base = item_server
    os.makedirs(os.path.join(root, "item9", "deriv"), exist_ok=True)
    with open(os.path.join(root, "item9", "deriv", "page.txt"), "wb") as f:
        f.write(b"nested payload")
    fs = make_item_filesystem(base, base)

    infos = fs.get_file_info(pafs.FileSelector("item9"))
    assert [(i.path, i.size) for i in infos] == [
        ("item9/deriv/page.txt", 14)
    ]
    info = fs.get_file_info(["item9/deriv/page.txt"])[0]
    assert info.type == pafs.FileType.File and info.size == 14
    with fs.open_input_file("item9/deriv/page.txt") as fh:
        assert fh.read() == b"nested payload"


def test_sparse_metadata_size_and_null_mtime(item_server):
    """Review repro: a missing size KeyError'd and an explicit-null mtime
    TypeError'd the whole listing; the handler now tolerates both like
    list_collection_files_df always did."""
    from ia_hadoop_tools_spark.sources.itemfs import ItemFileSystemHandler

    _, base = item_server
    h = ItemFileSystemHandler(base, base)
    h._meta = lambda itemid: {
        "files": [{"name": "x.gz", "mtime": None}, {"name": "y.gz", "size": 7}]
    }
    sizes = {
        i.path: i.size for i in h.get_file_info_selector(pafs.FileSelector("it"))
    }
    assert sizes == {"it/x.gz": 0, "it/y.gz": 7}
    infos = h.get_file_info(["it/x.gz", "it/y.gz"])
    assert [i.size for i in infos] == [0, 7]
