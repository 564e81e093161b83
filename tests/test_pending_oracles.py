"""Oracle-parity gate for pending registry entries + the corpus rows.

Runs every PENDING_QUERIES entry (post-freeze additions awaiting the
next round's registration) AND every corpus_queries.py row (registered
at the round-7 freeze; kept here so they stay continuously pytest-green)
on Spark, and its oracle SQL on DuckDB at the test scale factor,
comparing exactly what the driver's correctness gate compares: row
count, column-name set, and order-insensitive values (columns sorted by
name, rows sorted).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from ia_hadoop_tools_spark.corpus_queries import (
    CORPUS_ORACLES,
    CORPUS_QUERIES,
)
from ia_hadoop_tools_spark.pending_queries import (
    PENDING_ORACLE_SQL,
    PENDING_QUERIES,
)

GATED_QUERIES = {
    **CORPUS_QUERIES,
    **PENDING_QUERIES,
}
GATED_ORACLES = {
    **CORPUS_ORACLES,
    **PENDING_ORACLE_SQL,
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                # single files (driver testdata) or Spark-written parquet
                # DIRECTORIES (scripts/make_sf1.py replicas)
                src = f"{path}/*.parquet" if os.path.isdir(path) else path
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
                )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(GATED_QUERIES))
def test_pending_query_matches_oracle(spark, sf_dir, name):
    spark_pdf = GATED_QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = _duck(sf_dir, GATED_ORACLES[name])
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf), name
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    # dtype-strict: the driver's value-hash can be representation-
    # sensitive, so the oracle must CAST to Spark's exact types
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), (name, c, a[c].dtype, b[c].dtype)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not (x == y or (pd.isna(x) and pd.isna(y)))
        ]
        assert not bad, (name, c, bad[:5])


def test_corpus_has_no_astral_chars(sf_dir):
    """Documented cross-engine divergence guard (operators/bpe.py
    _encode_word docstring): Java's '(?s)(.)' wraps UTF-16 code units,
    so astral-plane characters split into surrogate halves, while the
    DuckDB oracle's RE2 '.' wraps whole codepoints.  The
    bpe_encode_counts oracle row is therefore only valid while the test
    corpora stay inside the BMP.  If this fails, the synthetic documents
    table gained emoji/astral text — either pre-filter astral chars in
    the corpus query or split tokens at the byte level in BOTH engines
    before re-enabling the oracle."""
    import duckdb as _dd

    path = os.path.join(sf_dir, "documents.parquet")
    (n,) = (
        _dd.connect()
        .execute(
            "SELECT count(*) FROM read_parquet(?) "
            r"WHERE regexp_matches(text, '[\x{10000}-\x{10FFFF}]')",
            [path],
        )
        .fetchone()
    )
    assert n == 0, (
        f"{n} documents contain astral-plane characters; the "
        "bpe_encode_counts Spark/DuckDB oracle parity breaks on these "
        "(UTF-16 code-unit vs codepoint wrapping) — see _encode_word"
    )


def test_bpe_fold_cross_engine_edge_chars(spark):
    """The encoder folds must agree ACROSS ENGINES on the character
    classes where regex engines diverge: U+2028/U+2029/U+0085 (Java '.'
    needs DOTALL, RE2 '.' matches them natively) and multi-byte text.
    The corpus-level oracle tests can't guarantee these occur in the
    synthetic documents, so pin them directly."""
    from ia_hadoop_tools_spark.operators.bpe import bpe_token_counts

    words = ["a\u2028b", "x\u2029y\u0085z", "caf\u00e9", "th\u2028the"]
    doc = " ".join(words)
    df = spark.createDataFrame([(1, doc)], "doc_id: long, text: string")
    merges = [("t", "h"), ("th", "e")]
    got = bpe_token_counts(df, merges).first()

    con = duckdb.connect()
    merge_lits = ", ".join(
        "chr(30) || '{a}' || chr(31) || chr(30) || '{b}' || chr(31)".format(
            a=a, b=b
        )
        for a, b in merges
    )
    n_tokens = 0
    for w in words:
        n_tokens += con.execute(
            rf"""
            SELECT len(string_split(
              list_reduce(
                list_prepend(
                  regexp_replace(?, '(.)', chr(30) || '\1' || chr(31), 'g'),
                  [{merge_lits}]),
                (acc, m) -> replace(acc, m, replace(m, chr(31) || chr(30), ''))),
              chr(31) || chr(30)))
            """,
            [w],
        ).fetchone()[0]
    con.close()
    assert (got.n_words, got.n_tokens) == (len(words), n_tokens)


def test_corpus_first_import_builds_oracles():
    """Import-order regression (ADVICE r10): the lazy PEP 562
    CORPUS_ORACLES must build when corpus_queries is imported FIRST
    (its oracle builders then trigger the circular driver_queries
    import mid-build), and the result must equal the merged
    driver_queries view.  A future reordering of driver_queries that
    moves the composed helpers (SQL_MINHASH_PAIRS, the vector helpers)
    below its merge section would fail here loudly instead of with a
    partial-import AttributeError at first registry access.  Fresh
    interpreter so this test controls the import order."""
    import subprocess
    import sys

    code = (
        "import ia_hadoop_tools_spark.corpus_queries as cq\n"
        "co = cq.CORPUS_ORACLES\n"
        "assert isinstance(co, dict) and len(co) == len(cq.CORPUS_QUERIES)\n"
        "from ia_hadoop_tools_spark.driver_queries import ORACLES\n"
        "for k, v in co.items():\n"
        "    assert ORACLES[k] == v, k\n"
        "print('OK', len(co))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.startswith("OK"), out.stdout
