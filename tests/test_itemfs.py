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


@pytest.fixture(scope="module")
def item_server(tmp_path_factory):
    """Serves ``root/<itemid>/*`` files + /metadata/<itemid> JSON + ranges."""
    root = tmp_path_factory.mktemp("items")

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts[0] == "metadata" and len(parts) == 2:
                item = root / parts[1]
                if not item.is_dir():
                    self.send_error(404)
                    return
                files = [
                    {
                        "name": f.name,
                        "size": f.stat().st_size,
                        "mtime": f.stat().st_mtime,
                    }
                    for f in sorted(item.iterdir())
                    if f.is_file()
                ]
                body = json.dumps({"files": files}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if len(parts) == 2:
                f = root / parts[0] / parts[1]
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
