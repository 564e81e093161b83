"""Extraction-job tests: CDX/WAT/metadata generation + repackaging over a
synthetic member-gzipped WARC (the reference's CDXGenerator/WATGenerator/
WARCMetadataRecordGenerator/ArchiveFileExtractor family)."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from ia_hadoop_tools_spark.operators.extract import (
    archive_file_extractor,
    cdx_generate,
    warc_metadata_generate,
    wat_generate,
)

HTML = (
    b"<html><head><title>Test Page</title></head>"
    b'<body><a href="http://example.com/next">n</a>'
    b'<img src="/logo.png"></body></html>'
)


def _warc_record(rec_type: str, uri: str, date: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http_payload(status: int, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


@pytest.fixture(scope="module")
def warc_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    p = d / "test-00000.warc.gz"
    recs = [
        _warc_record(
            "response",
            "http://example.com/",
            "2020-01-02T03:04:05Z",
            _http_payload(200, "text/html", HTML),
        ),
        _warc_record(
            "metadata",
            "http://example.com/",
            "2020-01-02T03:04:05Z",
            b"via: http://seed.example.com/\nhopsFromSeed: L\n",
            extra="WARC-Concurrent-To: <urn:uuid:123>\r\n",
        ),
        _warc_record(
            "response",
            "http://example.com/404",
            "2020-01-02T03:04:06Z",
            _http_payload(404, "text/plain", b"gone"),
        ),
    ]
    with open(p, "wb") as fh:
        for r in recs:  # one gzip member per record (standard WARC layout)
            fh.write(gzip.compress(r))
    return str(p)


def _paths_df(spark, path):
    return spark.createDataFrame([(path,)], "path: string")


def test_cdx_generate(spark, warc_path):
    rows = cdx_generate(_paths_df(spark, warc_path)).collect()
    assert [r.error for r in rows] == [None, None]
    by_url = {r.original_url: r for r in rows}
    assert by_url["http://example.com/"].statuscode == 200
    assert by_url["http://example.com/"].timestamp == "20200102030405"
    assert by_url["http://example.com/404"].statuscode == 404
    assert by_url["http://example.com/404"].mimetype == "text/plain"


def test_wat_generate_links_and_title(spark, warc_path):
    rows = wat_generate(_paths_df(spark, warc_path)).collect()
    assert [r.error for r in rows] == [None] * 3
    resp = [r for r in rows if r.rec_type == "response"]
    wat = json.loads(resp[0].wat)
    html_meta = wat["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    assert html_meta["Head"]["Title"] == "Test Page"
    assert {l["url"] for l in html_meta["Links"]} == {
        "http://example.com/next",
        "/logo.png",
    }
    assert wat["Envelope"]["Container"]["Filename"] == "test-00000.warc.gz"


def test_warc_metadata_generate(spark, warc_path):
    rows = warc_metadata_generate(_paths_df(spark, warc_path)).collect()
    assert len(rows) == 1
    assert rows[0].concurrent_to == "<urn:uuid:123>"
    assert "hopsFromSeed: L" in rows[0].content


def test_archive_file_extractor_roundtrip(spark, warc_path, tmp_path):
    # member offsets in the source file: scan boundary positions
    offsets = []
    with open(warc_path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        from ia_hadoop_tools_spark.operators.extract import _gz_member_length

        with open(warc_path, "rb") as fh:
            ln = _gz_member_length(fh, pos)
        offsets.append((pos, ln))
        pos += ln
    assert len(offsets) == 3

    # repackage members 0 and 2 (the two responses) into a new warc
    spec = spark.createDataFrame(
        [("out-a", warc_path, offsets[0][0], 0), ("out-a", warc_path, offsets[2][0], 1)],
        "prefix: string, path: string, offset: long, seq: long",
    )
    out_dir = str(tmp_path / "repack")
    res = archive_file_extractor(spec, out_dir).collect()
    assert len(res) == 1 and res[0].error is None and res[0].n_members == 2

    # re-extract from the new file: warcinfo + the two response records
    rows = cdx_generate(_paths_df(spark, res[0].out_path)).collect()
    urls = sorted(r.original_url for r in rows if r.original_url)
    assert urls == ["http://example.com/", "http://example.com/404"]
    with gzip.open(res[0].out_path, "rb") as fh:
        first = fh.read(200)
    assert first.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")


def test_cdx_offsets_drive_repackaging(spark, warc_path, tmp_path):
    """The reference's actual workflow loop: CDX offsets from extraction are
    the byte ranges repackaging consumes. cdx_generate on a member-gzipped
    WARC must report COMPRESSED member offsets/lengths usable directly as an
    ArchiveFileExtractor spec."""
    cdx = cdx_generate(_paths_df(spark, warc_path)).collect()
    assert all(r.compressed_offset is not None for r in cdx)
    assert all(r.compressed_length and r.compressed_length > 0 for r in cdx)
    # offsets are member starts: contiguous in compressed space for our fixture
    offs = sorted((r.compressed_offset, r.compressed_length) for r in cdx)
    assert offs[0][0] == 0

    spec = spark.createDataFrame(
        [("loop", warc_path, int(r.compressed_offset), i)
         for i, r in enumerate(sorted(cdx, key=lambda r: r.compressed_offset))],
        "prefix: string, path: string, offset: long, seq: long",
    )
    res = archive_file_extractor(spec, str(tmp_path / "loop_out")).collect()
    assert res[0].error is None and res[0].n_members == 2

    back = cdx_generate(_paths_df(spark, res[0].out_path)).collect()
    assert sorted(r.digest for r in back) == sorted(r.digest for r in cdx)


def test_warcio_offsets_match_minimal_reader(spark, warc_path):
    """warcio-installed check of compressed_offset/length: the warcio branch
    (read_to_end before get_record_offset/length, cdxj-indexer usage) must
    report the same member byte ranges as the minimal gzip-member reader.
    Skipped where warcio is absent — the branch is then untaken anyway."""
    import ia_hadoop_tools_spark.operators.extract as ex

    if not ex.HAVE_WARCIO:
        pytest.skip("warcio not installed")

    with_warcio = cdx_generate(_paths_df(spark, warc_path), use_warcio=True).collect()
    minimal = cdx_generate(_paths_df(spark, warc_path), use_warcio=False).collect()

    key = lambda r: (r.original_url, r.timestamp)
    w = {key(r): (r.compressed_offset, r.compressed_length, r.digest)
         for r in with_warcio}
    m = {key(r): (r.compressed_offset, r.compressed_length, r.digest)
         for r in minimal}
    assert w == m and all(v[0] is not None and v[1] for v in w.values())


def test_wat_golden_fixture_current(spark):
    """The checked-in golden table (fixtures/wat_expected.parquet — the
    wat_extract oracle) matches a fresh run of the query: catches silent
    drift between the WAT generator and its golden oracle."""
    import pandas as pd

    from ia_hadoop_tools_spark.driver_queries import QUERIES

    fresh = (
        QUERIES["wat_extract"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("target_uri")
        .reset_index(drop=True)
    )
    golden = (
        pd.read_parquet("/root/repo/fixtures/wat_expected.parquet")
        .sort_values("target_uri")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fresh.astype({"error": "object"}), golden.astype({"error": "object"})
    )


def test_check_fail_pct(spark):
    from ia_hadoop_tools_spark.operators.extract import check_fail_pct

    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "boom"), (4, None)],
        "id: long, error: string",
    )
    # 25% errors: passes a 30% budget and returns the df unchanged
    assert check_fail_pct(df, fail_pct=30.0).count() == 4
    with _pytest.raises(RuntimeError, match="exceeds failpct"):
        check_fail_pct(df, fail_pct=10.0)
    with _pytest.raises(RuntimeError):
        check_fail_pct(df)  # default 0: any error fails the job
    clean = df.filter("error IS NULL")
    assert check_fail_pct(clean).count() == 3


def test_cdx_generate_soft_is_per_record_not_per_file(spark, tmp_path):
    """One poison record must yield one error row while the REST of the
    file's records survive (the -soft docstring contract; the old per-file
    try abandoned every record after the first bad one)."""
    p = tmp_path / "multi.warc"
    recs = [
        _warc_record(
            "response", f"http://site{i}.com/", "2020-01-02T03:04:05Z",
            _http_payload(200, "text/html", b"<html>x</html>"),
        )
        for i in range(5)
    ]
    p.write_bytes(b"".join(recs))
    paths = spark.createDataFrame([(str(p),)], "path string")

    def poison_surt(url):
        if url and "site2" in url:
            raise ValueError("poison record")
        from ia_hadoop_tools_spark.functions.surt import _surt_one

        return _surt_one(url)

    from ia_hadoop_tools_spark.operators.extract import cdx_generate

    rows = cdx_generate(paths, surt_fn=poison_surt, use_warcio=False).collect()
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert len(ok) == 4 and len(bad) == 1
    assert "poison record" in bad[0]["error"]
    assert {r["original_url"] for r in ok} == {
        f"http://site{i}.com/" for i in (0, 1, 3, 4)
    }


def test_wet_wat_content_type_case_insensitive(spark, tmp_path):
    """HTTP/2 captures carry lowercase 'content-type': the WET text row
    and WAT HTML-Metadata must still be produced (a cased .get()
    silently dropped them)."""
    import gzip as _gzip

    from ia_hadoop_tools_spark.operators.extract import (
        wat_generate,
        wet_generate,
    )

    def record(url, ctype_header):
        http = (
            f"HTTP/1.1 200 OK\r\n{ctype_header}: text/html\r\n\r\n"
            "<html><head><title>T</title></head><body>hello page</body></html>"
        ).encode()
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2020-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return _gzip.compress(head + http + b"\r\n\r\n")

    path = tmp_path / "case.warc.gz"
    path.write_bytes(
        record("http://upper.example/", "Content-Type")
        + record("http://lower.example/", "content-type")
    )
    paths_df = spark.createDataFrame([(str(path),)], "path: string")
    wet = wet_generate(paths_df).collect()
    assert {r.target_uri for r in wet if r.error is None} == {
        "http://upper.example/", "http://lower.example/"
    }
    assert all("hello page" in (r.text or "") for r in wet if r.error is None)
    wat = wat_generate(paths_df).collect()
    ok = [r for r in wat if r.error is None and r.wat]
    assert len(ok) == 2
    import json as _json

    for r in ok:
        meta = _json.loads(r.wat)
        pm = meta["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
        assert pm.get("HTML-Metadata"), r.target_uri


def test_minimal_reader_salvages_corrupt_gzip_member(spark, tmp_path):
    """Review repro: a bad Content-Length inside ONE gzip member used to
    abort the whole file at the container level — records after the bad
    member were silently lost. Member boundaries are independent of record
    parses, so one corrupt member = one error row, later members survive."""
    p = tmp_path / "salvage-00000.warc.gz"
    good1 = _warc_record(
        "response", "http://a.example/", "2020-01-02T03:04:05Z",
        _http_payload(200, "text/html", b"one"),
    )
    bad = good1.replace(
        b"Content-Length: ", b"Content-Length: x", 1
    )  # non-numeric
    good2 = _warc_record(
        "response", "http://b.example/", "2020-01-02T03:04:06Z",
        _http_payload(200, "text/html", b"two"),
    )
    with open(p, "wb") as fh:
        for r in (good1, bad, good2):
            fh.write(gzip.compress(r))
    rows = cdx_generate(_paths_df(spark, str(p)), use_warcio=False).collect()
    ok = [r for r in rows if r.error is None]
    errs = [r for r in rows if r.error is not None]
    assert sorted(r.original_url for r in ok) == [
        "http://a.example/", "http://b.example/",
    ]
    assert len(errs) == 1 and "Content-Length" in errs[0].error


def test_minimal_reader_tolerates_non_utf8_header_name(spark, tmp_path):
    """Review repro: one raw non-UTF8 byte in a header NAME aborted the
    whole file (names decoded strictly while values used replace)."""
    p = tmp_path / "hdr-00000.warc.gz"
    rec = _warc_record(
        "response", "http://c.example/", "2020-01-02T03:04:07Z",
        _http_payload(200, "text/html", b"three"),
    ).replace(b"WARC-Target-URI:", b"WARC-Target-URI\x92x:", 1)
    good = _warc_record(
        "response", "http://d.example/", "2020-01-02T03:04:08Z",
        _http_payload(200, "text/html", b"four"),
    )
    with open(p, "wb") as fh:
        for r in (rec, good):
            fh.write(gzip.compress(r))
    rows = cdx_generate(_paths_df(spark, str(p)), use_warcio=False).collect()
    # the mangled record parses (with a replaced header name, so its URI is
    # absent) and the file's other record is untouched
    assert all(r.error is None for r in rows)
    assert "http://d.example/" in {r.original_url for r in rows}


def test_forced_warcio_raises_when_absent(spark, warc_path):
    """use_warcio=True must raise ImportError where warcio is missing, not
    silently degrade to the minimal reader (mixed-parser output)."""
    import ia_hadoop_tools_spark.operators.extract as ex

    if ex.HAVE_WARCIO:
        pytest.skip("warcio installed — the forced path is honored")
    with pytest.raises(Exception, match="warcio"):
        cdx_generate(_paths_df(spark, warc_path), use_warcio=True).collect()


def test_minimal_reader_mimetype_dash_parity(spark, tmp_path):
    """Parser parity: an absent HTTP block yields mimetype '-' (the CDX
    convention and the warcio default), not NULL."""
    p = tmp_path / "nohttp-00000.warc.gz"
    rec = _warc_record(
        "response", "http://e.example/", "2020-01-02T03:04:09Z",
        b"rawbytes-no-http-block",
    )
    with open(p, "wb") as fh:
        fh.write(gzip.compress(rec))
    rows = cdx_generate(_paths_df(spark, str(p)), use_warcio=False).collect()
    assert len(rows) == 1 and rows[0].mimetype == "-"


def test_warc_to_documents_bridge(spark, warc_path, tmp_path):
    """WARC -> documents-table bridge: HTML responses become corpus rows
    with content-addressed doc_id, host source, lang — consumable by
    the training-pipeline verbs directly."""
    from ia_hadoop_tools_spark.operators.extract import warc_to_documents
    from ia_hadoop_tools_spark.operators.sampling import split_corpus

    docs = warc_to_documents(_paths_df(spark, warc_path))
    rows = docs.collect()
    # only the HTML response survives (metadata + text/plain dropped)
    assert len(rows) == 1
    (r,) = rows
    assert r.url == "http://example.com/" and r.ts == "20200102030405"
    assert r.source == "example.com"
    assert r.n_chars == len(r.text) and r.text  # stripped plain text
    assert "<" not in r.text
    assert isinstance(r.doc_id, int)
    # content-addressed id: re-extraction yields the identical doc_id
    again = warc_to_documents(_paths_df(spark, warc_path)).first()
    assert again.doc_id == r.doc_id
    # downstream pipeline verbs consume the frame as-is
    assert split_corpus(docs, [("train", 1.0)]).first().split == "train"


def test_corpus_from_warc_cli(spark, warc_path, tmp_path, capsys):
    from ia_hadoop_tools_spark.__main__ import main

    out = str(tmp_path / "warc_docs")
    main(["corpus-from-warc", warc_path, out])
    got = capsys.readouterr().out
    assert "corpus-from-warc: 1 docs" in got
    back = spark.read.parquet(out)
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(back.columns)
