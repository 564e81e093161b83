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
from pyspark.sql import functions as F

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
                # names decode with replace like values: one raw non-UTF8
                # header byte must cost at most this record, not the file
                headers[k.decode(errors="replace").strip().lower()] = (
                    v.decode(errors="replace").strip()
                )
        raw_len = headers.get("content-length", "0")
        try:
            length = int(raw_len)
        except ValueError as e:
            # sync is unrecoverable in THIS stream (unknown payload
            # boundary) — fail with the offset; gzip-member inputs salvage
            # the remaining members in _iter_warc_records_any
            raise IOError(
                f"bad Content-Length {raw_len!r} at offset {start}"
            ) from e
        payload = stream.read(length)
        offset += len(payload)
        yield headers, payload, start


def _iter_warc_records_any(path: str):
    """Yield (headers, payload, offset, length) for every WARC record.

    For ``.gz`` inputs, iterates GZIP MEMBERS: offset/length are the
    member's COMPRESSED byte range — the values the CDX contract stores
    (compressed_offset/compressed_length, §1.1) and that range-fetch
    repackaging consumes (`archive_file_extractor`). Uncompressed inputs
    report the record's byte offset with length None.
    """
    import zlib

    if not path.endswith(".gz"):
        with open(path, "rb") as fh:
            yield from (
                (h, p, off, None) for h, p, off in _iter_warc_records_minimal(fh)
            )
        return
    max_member = 1 << 28  # 256 MiB decompressed per member
    with open(path, "rb") as fh:
        pos = 0
        fh.seek(0, 2)
        size = fh.tell()
        while pos < size:
            fh.seek(pos)
            d = zlib.decompressobj(31)
            chunks = []
            consumed = 0
            total = 0
            while True:
                chunk = fh.read(1 << 16)
                if not chunk:
                    break
                piece = d.decompress(chunk)
                chunks.append(piece)
                total += len(piece)
                if total > max_member:
                    # a member must materialize to carry its compressed
                    # byte range (the CDX S/V contract) — a WHOLE-FILE
                    # gzip is one giant member and would OOM the task, so
                    # fail loudly with the remedy instead
                    raise IOError(
                        f"gzip member at offset {pos} exceeds "
                        f"{max_member} bytes decompressed — this looks "
                        "like a whole-file-gzipped WARC; recompress "
                        "member-per-record (the WARC convention) or "
                        "gunzip it, since per-member offsets cannot be "
                        "derived from a single-member file anyway"
                    )
                consumed += len(chunk) - len(d.unused_data)
                if d.eof:
                    break
            if not d.eof:
                raise IOError(f"truncated gzip member at offset {pos}")
            payload = b"".join(chunks)
            # member boundaries are known regardless of record-parse
            # failures inside, so one corrupt member costs one error
            # sentinel and every later member still parses (the -soft
            # per-record contract); consumers map the sentinel to an
            # error row
            try:
                for h, p, _ in _iter_warc_records_minimal(io.BytesIO(payload)):
                    yield h, p, pos, consumed
            except Exception as e:
                yield {"__parse_error__": f"{type(e).__name__}: {e}"}, b"", pos, consumed
            pos += consumed


def cdx_generate(paths_df: DataFrame, surt_fn=None, use_warcio: bool | None = None) -> DataFrame:
    """(W)ARC file paths -> CDX rows (one output row per response record).

    ``paths_df`` must have a ``path`` column (from sources/listing.py). Uses
    warcio when present, else the minimal reader (``use_warcio`` forces the
    choice — resolved ONCE on the driver and captured by value, and an
    executor that cannot honor a warcio choice raises ImportError rather
    than silently degrading: the two parsers differ in conventions beyond
    the tested fields, so one job must never mix them). Per-file errors
    surface in the ``error`` column (the reference's -soft mode made them a
    counter).
    """
    from ia_hadoop_tools_spark.functions.surt import _surt_one

    surt = surt_fn or _surt_one
    want_warcio = HAVE_WARCIO if use_warcio is None else use_warcio

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if want_warcio and not HAVE_WARCIO:
            raise ImportError(
                "cdx_generate resolved to the warcio parser on the driver "
                "but warcio is not importable on this executor — install "
                "it there or pass use_warcio=False (mixing parsers inside "
                "one job would produce convention-mixed output)"
            )
        def err_row(fname: str, e: Exception) -> dict:
            return dict.fromkeys(
                [
                    "urlkey", "timestamp", "original_url", "mimetype",
                    "statuscode", "digest", "redirect", "meta_flags",
                    "compressed_length", "compressed_offset",
                ]
            ) | {"filename": fname, "error": f"{type(e).__name__}: {e}"}

        def row_from_warcio(rec, it, fname: str, is_gz: bool) -> dict | None:
            if rec.rec_type not in ("response", "revisit"):
                return None
            url = rec.rec_headers.get_header("WARC-Target-URI")
            ts = (rec.rec_headers.get_header("WARC-Date") or "").replace(
                "-", ""
            ).replace(":", "").replace("T", "").rstrip("Z")
            # raw_stream = body bytes after the HTTP header block, WITHOUT
            # transfer decoding — the same bytes the minimal reader hashes,
            # so digests agree between the two paths.
            payload = rec.raw_stream.read()
            http = rec.http_headers
            # member byte range: warcio finalizes member_info only after
            # the record — including the gzip trailer — is fully consumed,
            # so read_to_end BEFORE fetching offset/length (cdxj-indexer's
            # usage). The reference CDXGenerator always writes the S/V
            # fields — Wayback range-fetch and archive_file_extractor
            # depend on them.
            it.read_to_end(rec)
            try:
                off = it.get_record_offset()
            except Exception:
                off = None
            try:
                mlen = it.get_record_length()
            except Exception:
                mlen = None
            return dict(
                urlkey=surt(url),
                timestamp=ts[:14],
                original_url=url,
                mimetype=(
                    http.get_header("Content-Type", "-").split(";")[0]
                    if http
                    else "-"
                ),
                # warcio returns '' for a malformed status line; the
                # minimal reader nulls it — match, don't error the record
                statuscode=(
                    int(http.get_statuscode())
                    if http and str(http.get_statuscode()).strip().isdigit()
                    else None
                ),
                digest=_b32_sha1(payload),
                redirect=http.get_header("Location") if http else None,
                meta_flags=None,
                # the S field is the COMPRESSED member length; an
                # uncompressed input has none (warcio would report the
                # record length here, the minimal reader None — parser
                # choice must not change the output contract)
                compressed_length=mlen if is_gz else None,
                compressed_offset=off,
                filename=fname,
                error=None,
            )

        def row_from_minimal(headers, payload, off, mlen, fname) -> dict | None:
            if "__parse_error__" in headers:
                raise IOError(headers["__parse_error__"])
            if headers.get("warc-type") not in ("response", "revisit"):
                return None
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
            return dict(
                urlkey=surt(url),
                timestamp=ts[:14],
                original_url=url,
                # '-' for an absent content type: the CDX convention and
                # the warcio path's default — parser parity
                mimetype=mimetype or "-",
                statuscode=status,
                digest=_b32_sha1(body),
                redirect=location,
                meta_flags=None,
                compressed_length=mlen,
                compressed_offset=off,
                filename=fname,
                error=None,
            )

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                fname = os.path.basename(path)
                # -soft is PER RECORD: one malformed record adds one error
                # row and the rest of the file survives; the outer try
                # covers open/container-level failures (check_fail_pct sees
                # honest error counts either way)
                try:
                    if want_warcio:
                        # warcio consumes the RAW stream (ungzips itself)
                        with open(path, "rb") as raw:
                            it = ArchiveIterator(raw)
                            is_gz = path.endswith(".gz")
                            for rec in it:
                                try:
                                    row = row_from_warcio(rec, it, fname, is_gz)
                                except Exception as e:
                                    row = err_row(fname, e)
                                if row is not None:
                                    out.append(row)
                    else:
                        for headers, payload, off, mlen in _iter_warc_records_any(path):
                            try:
                                row = row_from_minimal(
                                    headers, payload, off, mlen, fname
                                )
                            except Exception as e:
                                row = err_row(fname, e)
                            if row is not None:
                                out.append(row)
                except Exception as e:  # container-level: one error row
                    out.append(err_row(fname, e))
            yield pd.DataFrame(
                out
                or {
                    c.split()[0]: pd.Series(dtype="object")
                    for c in CDX_OUT_SCHEMA.split(", ")
                }
            )

    return paths_df.mapInPandas(extract, schema=CDX_OUT_SCHEMA)


WAT_OUT_SCHEMA = (
    "target_uri string, timestamp string, rec_type string, wat string, "
    "filename string, offset long, error string"
)

METADATA_OUT_SCHEMA = (
    "target_uri string, timestamp string, concurrent_to string, "
    "content string, filename string, error string"
)


def check_fail_pct(
    df: DataFrame, fail_pct: float = 0.0, error_col: str = "error",
    cache: bool = True,
) -> DataFrame:
    """``-failpct`` semantics (jobs/CDXGenerator.java:200-249): the
    extraction jobs tolerate per-record errors (``-soft``, the ``error``
    column) but FAIL the whole job when more than ``fail_pct`` percent of
    records errored — silent mass failure must not look like success.

    Runs one counting action; raises ``RuntimeError`` past the threshold,
    else returns ``df`` for chaining. The counting action would otherwise
    run the whole (W)ARC parse a SECOND time when the caller writes the
    result, so by default the frame is persisted (MEMORY_AND_DISK) before
    counting and returned persisted — the caller's write reuses it and
    should ``unpersist()`` after. Pass ``cache=False`` to opt out (e.g.
    when the caller manages its own persistence). ``fail_pct`` is a
    percentage (0-100), matching the reference flag."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    if cache:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    total, errs = df.agg(
        F.count(F.lit(1)), F.count(F.col(error_col))
    ).first()
    if total and errs * 100.0 / total > fail_pct:
        if cache:
            df.unpersist()
        raise RuntimeError(
            f"extraction error rate {errs}/{total} "
            f"({errs * 100.0 / total:.1f}%) exceeds failpct={fail_pct}"
        )
    return df


def _http_meta(payload: bytes) -> tuple[dict, bytes]:
    """Split an HTTP response payload into (metadata dict, body)."""
    meta: dict = {}
    body = payload
    if payload.startswith(b"HTTP/"):
        head, _, body = payload.partition(b"\r\n\r\n")
        lines = head.decode(errors="replace").split("\r\n")
        try:
            meta["Response-Status"] = int(lines[0].split()[1])
        except (IndexError, ValueError):
            pass
        headers = {}
        for hl in lines[1:]:
            hk, _, hv = hl.partition(":")
            if hv:
                headers[hk.strip()] = hv.strip()
        meta["Headers"] = headers
        meta["Headers-Length"] = len(head) + 4
    meta["Entity-Length"] = len(body)
    return meta, body


def _header_ci(headers: dict | None, name: str, default: str = "") -> str:
    """Case-insensitive header lookup: _http_meta keeps ORIGINAL casing
    (WAT output parity), but HTTP/2 capture headers are lowercase and
    servers vary — a cased .get() silently missed them."""
    if not headers:
        return default
    lname = name.lower()
    for k, v in headers.items():
        if k.lower() == lname:
            return v
    return default


_LINK_RE = None


def _html_meta(body: bytes) -> dict:
    """Deterministic regex-level HTML metadata: title + outgoing links.

    The reference's WAT extractor walks a real HTML parse (webarchive-commons
    ExtractingParseObserver); this captures the same envelope fields for the
    common cases without an HTML dependency.
    """
    global _LINK_RE
    import re

    if _LINK_RE is None:
        _LINK_RE = {
            "title": re.compile(rb"<title[^>]*>(.*?)</title>", re.I | re.S),
            "a": re.compile(rb"""<a\s[^>]*?href\s*=\s*["']?([^"'\s>]+)""", re.I),
            "img": re.compile(rb"""<img\s[^>]*?src\s*=\s*["']?([^"'\s>]+)""", re.I),
        }
    out: dict = {}
    m = _LINK_RE["title"].search(body)
    if m:
        out["Head"] = {"Title": m.group(1).decode(errors="replace").strip()}
    links = [
        {"path": "A@/href", "url": u.decode(errors="replace")}
        for u in _LINK_RE["a"].findall(body)
    ] + [
        {"path": "IMG@/src", "url": u.decode(errors="replace")}
        for u in _LINK_RE["img"].findall(body)
    ]
    if links:
        out["Links"] = links
    return out


def wat_generate(paths_df: DataFrame) -> DataFrame:
    """(W)ARC file paths -> WAT metadata rows (WATGenerator.java:74-294).

    One row per WARC record; the ``wat`` column is the WAT envelope JSON
    (WARC header metadata + HTTP response metadata + HTML links/title +
    container offset), deterministic for a given input. The reference writes
    `<name>.wat.gz` files; here the rows ARE the dataset — persist with
    ``df.write`` (or cdx_to_text + write_zipnum for interchange).
    """
    import json

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def err_row(fname: str, e: Exception) -> dict:
            return dict.fromkeys(
                ["target_uri", "timestamp", "rec_type", "wat", "offset"]
            ) | {"filename": fname, "error": f"{type(e).__name__}: {e}"}

        def wat_row(headers, payload, off, mlen, fname) -> dict:
            if "__parse_error__" in headers:
                raise IOError(headers["__parse_error__"])
            rec_type = headers.get("warc-type", "-")
            envelope: dict = {
                "Format": "WARC",
                "WARC-Header-Metadata": {
                    k: v for k, v in sorted(headers.items())
                },
                # compressed member range for .gz containers —
                # the byte range a Wayback-style range fetch uses
                "Container": {"Filename": fname, "Offset": off},
            }
            if mlen is not None:
                envelope["Container"]["Compressed-Length"] = mlen
            if rec_type in ("response", "revisit"):
                http, body = _http_meta(payload)
                pm: dict = {"HTTP-Response-Metadata": http}
                ctype = _header_ci(http.get("Headers"), "Content-Type")
                if "html" in ctype.lower():
                    html = _html_meta(body)
                    if html:
                        pm["HTTP-Response-Metadata"]["HTML-Metadata"] = html
                envelope["Payload-Metadata"] = pm
            return dict(
                target_uri=headers.get("warc-target-uri"),
                timestamp=(headers.get("warc-date") or "")
                .replace("-", "")
                .replace(":", "")
                .replace("T", "")
                .rstrip("Z")[:14],
                rec_type=rec_type,
                wat=json.dumps({"Envelope": envelope}, sort_keys=True),
                filename=fname,
                offset=off,
                error=None,
            )

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                fname = os.path.basename(path)
                try:
                    for headers, payload, off, mlen in _iter_warc_records_any(path):
                        # -soft per RECORD (docstring contract): one bad
                        # record = one error row, the file's tail survives
                        try:
                            out.append(
                                wat_row(headers, payload, off, mlen, fname)
                            )
                        except Exception as e:
                            out.append(err_row(fname, e))
                except Exception as e:  # container-level -soft
                    out.append(err_row(fname, e))
            yield pd.DataFrame(
                out
                or {
                    c.split()[0]: pd.Series(dtype="object")
                    for c in WAT_OUT_SCHEMA.split(", ")
                }
            )

    return paths_df.mapInPandas(extract, schema=WAT_OUT_SCHEMA)


WET_OUT_SCHEMA = (
    "target_uri string, timestamp string, rec_type string, text string, "
    "n_chars long, filename string, offset long, error string"
)


def wet_generate(paths_df: DataFrame) -> DataFrame:
    """(W)ARC file paths -> WET plain-text conversion rows.

    The text sibling of :func:`wat_generate`: CDX/WAT/WET is the standard
    web-archive derivative triple (the reference stops at WAT,
    jobs/WATGenerator.java:74-294; WET follows the same per-file map-only
    skeleton). One row per ``response`` record with an HTML content type,
    carrying the extracted plain text — the exact same strip pipeline as
    the codegen ``functions.textfns.html_to_text`` (shared
    ``HTML_TEXT_STEPS``), so WARC-side extraction and documents-table
    extraction produce byte-identical text.
    """
    import re as _re

    from ia_hadoop_tools_spark.functions.textfns import HTML_TEXT_STEPS

    steps = [(_re.compile(p), r) for p, r in HTML_TEXT_STEPS]

    def strip(html: str) -> str:
        for rx, rep in steps:
            html = rx.sub(rep, html)
        return html.strip()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path in pdf["path"]:
                fname = os.path.basename(path)
                def wet_err(e: Exception) -> dict:
                    return dict.fromkeys(
                        ["target_uri", "timestamp", "rec_type", "text",
                         "n_chars", "offset"]
                    ) | {"filename": fname, "error": f"{type(e).__name__}: {e}"}

                def wet_row(headers, payload, off) -> dict | None:
                    if "__parse_error__" in headers:
                        raise IOError(headers["__parse_error__"])
                    if headers.get("warc-type") != "response":
                        return None
                    http, body = _http_meta(payload)
                    ctype = _header_ci(http.get("Headers"), "Content-Type")
                    if "html" not in ctype.lower():
                        return None
                    text = strip(body.decode("utf-8", "replace"))
                    return dict(
                        target_uri=headers.get("warc-target-uri"),
                        timestamp=(headers.get("warc-date") or "")
                        .replace("-", "")
                        .replace(":", "")
                        .replace("T", "")
                        .rstrip("Z")[:14],
                        rec_type="conversion",
                        text=text,
                        n_chars=len(text),
                        filename=fname,
                        offset=off,
                        error=None,
                    )

                try:
                    for headers, payload, off, _mlen in _iter_warc_records_any(
                        path
                    ):
                        # -soft per RECORD: the file's tail survives
                        try:
                            row = wet_row(headers, payload, off)
                        except Exception as e:
                            row = wet_err(e)
                        if row is not None:
                            out.append(row)
                except Exception as e:  # container-level -soft
                    out.append(wet_err(e))
            yield pd.DataFrame(
                out
                or {
                    c.split()[0]: pd.Series(dtype="object")
                    for c in WET_OUT_SCHEMA.split(", ")
                }
            )

    return paths_df.mapInPandas(extract, schema=WET_OUT_SCHEMA)


def warc_metadata_generate(paths_df: DataFrame) -> DataFrame:
    """(W)ARC paths -> rows of the embedded *metadata*-type records
    (WARCMetadataRecordGenerator.java:75-180): crawl outlinks, via chains,
    fetch metadata — whatever the crawler wrote alongside each capture."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path in pdf["path"]:
                fname = os.path.basename(path)
                def meta_err(e: Exception) -> dict:
                    return dict.fromkeys(
                        ["target_uri", "timestamp", "concurrent_to", "content"]
                    ) | {"filename": fname, "error": f"{type(e).__name__}: {e}"}

                def meta_row(headers, payload) -> dict | None:
                    if headers.get("warc-type") != "metadata":
                        return None
                    return dict(
                        target_uri=headers.get("warc-target-uri"),
                        timestamp=(headers.get("warc-date") or "")
                        .replace("-", "")
                        .replace(":", "")
                        .replace("T", "")
                        .rstrip("Z")[:14],
                        concurrent_to=headers.get("warc-concurrent-to"),
                        content=payload.decode(errors="replace"),
                        filename=fname,
                        error=None,
                    )

                try:
                    # with-block: the old bare open() leaked the raw fd on
                    # error paths (gzip wrapper close does not close it)
                    with open(path, "rb") as raw:
                        stream = (
                            gzip.open(raw) if path.endswith(".gz") else raw
                        )
                        try:
                            for headers, payload, _ in (
                                _iter_warc_records_minimal(stream)
                            ):
                                # -soft per RECORD: the file's tail survives
                                try:
                                    row = meta_row(headers, payload)
                                except Exception as e:
                                    row = meta_err(e)
                                if row is not None:
                                    out.append(row)
                        finally:
                            if stream is not raw:
                                stream.close()
                except Exception as e:  # container-level -soft
                    out.append(meta_err(e))
            yield pd.DataFrame(
                out
                or {
                    c.split()[0]: pd.Series(dtype="object")
                    for c in METADATA_OUT_SCHEMA.split(", ")
                }
            )

    return paths_df.mapInPandas(extract, schema=METADATA_OUT_SCHEMA)


EXTRACTOR_OUT_SCHEMA = (
    "prefix string, out_path string, n_members long, bytes long, error string"
)


def _gz_member_length(fh, offset: int) -> int:
    """Compressed length of the gzip member starting at ``offset``
    (ArchiveFileExtractor.getGZLength:173-181): decompress forward counting
    input bytes until the member ends."""
    import zlib

    fh.seek(offset)
    d = zlib.decompressobj(31)
    consumed = 0
    while True:
        chunk = fh.read(1 << 16)
        if not chunk:
            break
        d.decompress(chunk)
        consumed += len(chunk) - len(d.unused_data)
        if d.eof:
            break
    if not d.eof:
        raise IOError(f"truncated gzip member at offset {offset}")
    return consumed


def archive_file_extractor(
    spec_df: DataFrame,
    out_dir: str,
    fmt: str = "warc",
    timestamp14: str = "20200101000000",
) -> DataFrame:
    """Repackage gzip members of existing (W)ARC files into new archive files
    (jobs/ArchiveFileExtractor.java:109-524).

    ``spec_df`` columns: (prefix, path, offset[, seq]) — one row per member to
    pull; all rows of one ``prefix`` become one output file ``<prefix>.<fmt>.gz``
    with a synthesized leading ``filedesc``/``warcinfo`` member
    (ArchiveFileExtractor.java:129-141). Members keep their original compressed
    bytes (no re-compression). The record-id is derived from the prefix hash —
    deterministic where the reference used random UUIDs. Order within a file
    follows ``seq`` when present, else (path, offset). HTTP-Range fetching
    from the reference is out of scope (local/posix paths only here); the
    grouping, length-scan, header synthesis, and TMP+rename protocol are the
    ported semantics.

    Returns one row per written file: (prefix, out_path, n_members, bytes).
    """
    import hashlib as _hl

    os.makedirs(out_dir, exist_ok=True)
    order = ["seq"] if "seq" in spec_df.columns else ["path", "offset"]
    ts_z = (
        f"{timestamp14[0:4]}-{timestamp14[4:6]}-{timestamp14[6:8]}"
        f"T{timestamp14[8:10]}:{timestamp14[10:12]}:{timestamp14[12:14]}Z"
    )

    def _warcinfo(name: str) -> bytes:
        body = (
            f"software: ia-hadoop-tools-spark\r\nformat: WARC File Format 1.0\r\n"
        ).encode()
        rec_id = "urn:uuid:" + _hl.sha1(name.encode()).hexdigest()[:32]
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: warcinfo\r\n"
            f"WARC-Date: {ts_z}\r\n"
            f"WARC-Filename: {name}\r\n"
            f"WARC-Record-ID: <{rec_id}>\r\n"
            "Content-Type: application/warc-fields\r\n"
            # WARC/1.0: Content-Length covers the BLOCK only; the trailing
            # CRLFCRLF is the record separator outside it (counting it made
            # strict readers consume the separator as warc-fields content)
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return gzip.compress(head + body + b"\r\n\r\n")

    def _filedesc(name: str) -> bytes:
        body = (
            f"filedesc://{name} 0.0.0.0 {timestamp14} text/plain 76\n"
            "1 0 InternetArchive\n"
            "URL IP-address Archive-date Content-type Archive-length\n\n"
        ).encode()
        return gzip.compress(body)

    def repack(pdf: pd.DataFrame) -> pd.DataFrame:
        from pyspark import TaskContext

        prefix = pdf["prefix"].iloc[0]
        name = f"{prefix}.{fmt}.gz"
        final = os.path.join(out_dir, name)
        # ATTEMPT-unique tmp (the write_kvstore pattern): a fixed name
        # lets two speculative attempts interleave writes into one file
        # and publish a corrupt archive; the rename stays the commit point
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        tmp = f"{final}.{attempt}.TMP"
        n = 0
        try:
            with open(tmp, "wb") as out:
                out.write(_warcinfo(name) if fmt == "warc" else _filedesc(name))
                for _, row in pdf.sort_values(order).iterrows():
                    with open(row["path"], "rb") as fh:
                        length = _gz_member_length(fh, int(row["offset"]))
                        fh.seek(int(row["offset"]))
                        out.write(fh.read(length))
                    n += 1
            os.replace(tmp, final)
            return pd.DataFrame(
                [
                    dict(
                        prefix=prefix,
                        out_path=final,
                        n_members=n,
                        bytes=os.path.getsize(final),
                        error=None,
                    )
                ]
            )
        except Exception as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            return pd.DataFrame(
                [
                    dict(
                        prefix=prefix,
                        out_path=None,
                        n_members=0,
                        bytes=0,
                        error=f"{type(e).__name__}: {e}",
                    )
                ]
            )

    return spec_df.groupBy("prefix").applyInPandas(repack, schema=EXTRACTOR_OUT_SCHEMA)


def http_import(
    urls_df: DataFrame,
    target_dir: str,
    soft: bool = True,
    cookie: str | None = None,
    timeout: float = 60.0,
) -> None:
    """Parallel idempotent URL->file import (HTTPImportMapper semantics).

    Per URL: skip if the target exists with matching length (HEAD compare);
    else download to ``<name>.TMP``, verify copied == Content-Length, then
    atomically rename. ``soft`` converts per-URL failures into log lines.
    ``urls_df`` needs columns (url, name). ``cookie`` rides every request —
    the authenticated-fetch seam (jobs/ArchiveFileExtractor.java:291 signs
    with an HMAC cookie; see functions/authfns.py). ``timeout`` caps every
    connect/read socket wait — without it one stalled server wedges the
    Spark task forever instead of hitting the soft path.
    """
    os.makedirs(target_dir, exist_ok=True)
    hdrs = {"Cookie": cookie} if cookie else {}

    def work(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        for r in rows:
            url, name = r["url"], r["name"]
            final = os.path.join(target_dir, name)
            # attempt-unique tmp: concurrent speculative attempts must not
            # interleave into one file (see repack)
            tmp = f"{final}.{attempt}.TMP"
            try:
                req = urllib.request.Request(url, method="HEAD", headers=hdrs)
                with urllib.request.urlopen(req, timeout=timeout) as h:
                    remote_len = int(h.headers.get("Content-Length", "-1"))
                if (
                    os.path.exists(final)
                    and remote_len >= 0
                    and os.path.getsize(final) == remote_len
                ):
                    continue  # idempotent skip
                with urllib.request.urlopen(
                    urllib.request.Request(url, headers=hdrs), timeout=timeout
                ) as resp, open(tmp, "wb") as out:
                    copied = 0
                    while chunk := resp.read(1 << 20):
                        out.write(chunk)
                        copied += len(chunk)
                if remote_len >= 0 and copied != remote_len:
                    raise IOError(f"length mismatch: {copied} != {remote_len}")
                os.replace(tmp, final)
            except Exception as e:
                if os.path.exists(tmp):
                    os.remove(tmp)
                if not soft:
                    raise
                # the docstring's promised log line — without it a run
                # where every URL fails is indistinguishable from success
                import logging

                logging.getLogger(__name__).warning(
                    "http_import soft-skip %s -> %s: %s: %s",
                    url, name, type(e).__name__, e,
                )

    urls_df.foreachPartition(work)


def warc_to_documents(paths_df: DataFrame) -> DataFrame:
    """(W)ARC file paths -> the training-corpus ``documents`` table shape
    — the bridge between the engine's two halves: the reference's
    web-archive extraction (WARC -> WET plain text, :func:`wet_generate`
    per jobs/WATGenerator.java:74's per-file map-only skeleton) feeding
    the LLM-data-pipeline layer (split/clean/dedup/assemble all consume
    this frame directly).

    Output columns: ``doc_id`` (content-addressed xxhash64 of
    (url, timestamp) — stable across re-extractions, so downstream
    split_corpus/sample_hash assignments never churn; 64-bit, so expect
    birthday collisions past ~10^9 captures — keep ``url``+``ts`` as
    the true identity and treat doc_id as a join/sampling key), ``text``,
    ``lang`` (stopword-vote heuristic), ``source`` (the capture's host —
    the stratum cap_per_stratum/temperature_fractions expect),
    ``n_chars``, plus provenance (``url``, ``ts``, ``warc_filename``,
    ``warc_offset``).  Parse-error rows (error != null) are dropped —
    run :func:`wet_generate` directly to audit them.

    Pure composition: the only Python stage is wet_generate's existing
    Arrow mapInPandas; id/lang/source/len are codegen projections.
    """
    from ia_hadoop_tools_spark.functions.textfns import lang_id

    wet = wet_generate(paths_df).filter(
        F.col("error").isNull()
        & F.col("target_uri").isNotNull()
        & (F.length("text") > 0)
    )
    return wet.select(
        F.xxhash64("target_uri", "timestamp").alias("doc_id"),
        F.col("text"),
        lang_id(F.col("text")).alias("lang"),
        # hostnames are case-insensitive (RFC 3986): lowercase so case
        # variants of one domain share a stratum (cap_per_stratum /
        # temperature_fractions treat distinct spellings as distinct)
        F.coalesce(
            F.lower(F.expr("parse_url(target_uri, 'HOST')")),
            F.lit("unknown"),
        ).alias("source"),
        F.col("n_chars"),
        F.col("target_uri").alias("url"),
        F.col("timestamp").alias("ts"),
        F.col("filename").alias("warc_filename"),
        F.col("offset").alias("warc_offset"),
    )
