"""WET-style HTML -> text extraction tests (functions/textfns.py
html_to_text + operators/extract.py wet_generate)."""

from __future__ import annotations

import gzip
import re

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.textfns import (
    HTML_TEXT_STEPS,
    html_to_text,
    html_to_text_sql,
)

TRICKY = [
    "<html><head><title>T</title><style a=b>x{}</style></head><body>"
    "<p>Hello&nbsp;world &amp;lt; ok</p><!-- no --><script>var a='<p>';"
    "</script><div>tail</div></body></html>",
    "no markup at all",
    "<br><BR/>line&lt;2&gt; &quot;q&quot; &#39;s&#39;",
    "<SCRIPT TYPE='x'>ignore</script>mixed<Style>s</STYLE>done",
    "unclosed <script>stays? <p>para</p>",
    "a   b\t\nc",
    "",
]


def _py_strip(s: str) -> str:
    for pat, rep in HTML_TEXT_STEPS:
        s = re.sub(pat, rep, s)
    return s.strip()


def test_html_to_text_matches_python_and_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(TRICKY)], "i: int, t: string"
    )
    got = {
        r.i: r.o for r in df.select("i", html_to_text("t").alias("o")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(TRICKY):
        duck = con.execute("select " + html_to_text_sql("?"), [c]).fetchone()[0]
        assert got[i] == duck == _py_strip(c), (i, got[i], duck)


def test_html_to_text_semantics(spark):
    df = spark.createDataFrame([(TRICKY[0],)], "t: string")
    out = df.select(html_to_text("t").alias("o")).first().o
    # script/style/comment content gone, entities decoded once (no
    # double-decode of &amp;lt;), whitespace collapsed
    assert out == "T Hello world &lt; ok tail"


def _write_warc(path, records):
    blobs = []
    for uri, date, rec_type, ctype, body in records:
        payload = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        blobs.append(gzip.compress(head + payload + b"\r\n\r\n"))
    path.write_bytes(b"".join(blobs))


def test_wet_generate_filters_and_extracts(spark, tmp_path):
    from ia_hadoop_tools_spark.operators.extract import wet_generate

    p = tmp_path / "t.warc.gz"
    _write_warc(
        p,
        [
            (
                "http://a/",
                "2021-05-06T07:08:09Z",
                "response",
                "text/html; charset=utf-8",
                b"<html><body><h1>Head</h1><p>Body&nbsp;text</p></body></html>",
            ),
            # non-html response and non-response record: both skipped
            ("http://b/", "2021-05-06T07:08:10Z", "response",
             "application/json", b'{"x": 1}'),
            ("http://c/", "2021-05-06T07:08:11Z", "request", "text/html",
             b"<p>ignored</p>"),
        ],
    )
    paths = spark.createDataFrame([(str(p),)], "path: string")
    rows = wet_generate(paths).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.target_uri, r.timestamp, r.rec_type) == (
        "http://a/", "20210506070809", "conversion",
    )
    assert r.text == "Head Body text"
    assert r.n_chars == len(r.text)
    assert r.error is None


def test_wet_generate_matches_codegen_path(spark, tmp_path):
    """WARC-side extraction and the documents-table codegen expression are
    the SAME pipeline — byte-identical output on identical HTML."""
    from ia_hadoop_tools_spark.operators.extract import wet_generate

    body = TRICKY[0].encode()
    p = tmp_path / "s.warc.gz"
    _write_warc(
        p, [("http://x/", "2020-01-01T00:00:00Z", "response", "text/html", body)]
    )
    paths = spark.createDataFrame([(str(p),)], "path: string")
    wet = wet_generate(paths).first().text
    expr = (
        spark.createDataFrame([(TRICKY[0],)], "t: string")
        .select(html_to_text("t").alias("o"))
        .first()
        .o
    )
    assert wet == expr
