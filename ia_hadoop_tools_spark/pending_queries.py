"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-10 freeze: the four round-9 pending entries (``lang_nb``,
``normalize_text``, ``hash_embed``, ``unigram_counts``) were registered
(registry 122 -> 126) and now live in ``corpus_queries.py`` (one
namespace for all freezes since the round-10 fold).
Entries added below during round 10 register at the round-11 freeze.
"""

from __future__ import annotations


def q_unigram_encode(spark, sf_dir):
    """Document-order unigram-LM token arrays
    (operators/unigram.unigram_encode — the ``bpe_encode`` twin): the
    one shipped tokenizer API that previously had no value-level
    cross-engine pin (``unigram_counts`` oracles the token COUNTS, not
    the ordered piece arrays).  Runs under the registered row's FIXED
    model (shared verbatim with the oracle); the array output compares
    as posexploded (doc_id, pos, token) rows — the hash_embed
    convention, since the frame sort can't order list cells.  Pins the
    whole encode path: chunk sequence, per-distinct-chunk Viterbi with
    the documented tie rule, and the order-preserving
    flatten(sort_by_position) reassembly."""
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.corpus_queries import (
        FIXED_UNIGRAM,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_MAX_WORD,
    )
    from ia_hadoop_tools_spark.operators.unigram import unigram_encode
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    enc = unigram_encode(
        docs,
        dict(FIXED_UNIGRAM),
        max_piece_len=UNIGRAM_MAX_PIECE,
        max_word_len=UNIGRAM_MAX_WORD,
    )
    return enc.select(
        "doc_id", F2.posexplode("tokens").alias("pos", "token")
    )


def _sql_unigram_encode() -> str:
    """Independent DuckDB implementation of the SEGMENTATION contract:
    the ``unigram_counts`` fixed-depth DP (one CTE per word position,
    same integer micro scores, UNK constant, and (score DESC, pieces
    ASC, split-point ASC) tie rule) extended to carry the chosen piece
    string through every cell, then reassembled in document order —
    ordered chunk sequence, per-chunk piece list, running token offset,
    positional unnest.  Chunks contain no whitespace, so ' ' is a safe
    piece separator."""
    from ia_hadoop_tools_spark.corpus_queries import (
        FIXED_UNIGRAM,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_MAX_WORD,
    )
    from ia_hadoop_tools_spark.operators.unigram import UNK_GAP_MICRO

    micro = {p: round(lp * 1e6) for p, lp in FIXED_UNIGRAM}
    unk = min(micro.values()) - UNK_GAP_MICRO
    maxp, maxw = UNIGRAM_MAX_PIECE, UNIGRAM_MAX_WORD
    vals = ",\n    ".join(
        f"('{p}', CAST({m} AS BIGINT))" for p, m in micro.items()
    )
    parts = [
        f"""WITH model(piece, mi) AS (
  VALUES
    {vals}),
pre AS MATERIALIZED (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'),
                     x -> x <> '') AS ws
  FROM documents),
chunkseq AS MATERIALIZED (
  SELECT doc_id,
         flatten(list_transform(ws, w -> list_transform(
             range(0, CAST(ceil(length(w) / {maxw}.0) AS BIGINT)),
             k -> substr(w, CAST(k * {maxw} + 1 AS INTEGER), {maxw})))) AS cs
  FROM pre),
cpos AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS INTEGER) AS cpos, cs[u.i + 1] AS w
  FROM chunkseq,
       LATERAL (SELECT unnest(range(0, len(cs))) AS i) u),
dw AS MATERIALIZED (SELECT DISTINCT w FROM cpos),
dp0 AS MATERIALIZED (
  SELECT w, CAST(0 AS BIGINT) AS sc, 0 AS np, '' AS ps FROM dw)"""
    ]
    for i in range(1, maxw + 1):
        branches = []
        for j in range(max(0, i - maxp), i):
            ln = i - j
            unk_ok = "TRUE" if ln == 1 else "FALSE"
            piece = f"substr(d.w, {j + 1}, {ln})"
            branches.append(
                f"""      SELECT d.w,
             d.sc + CASE WHEN m.mi IS NOT NULL THEN m.mi
                         ELSE CAST({unk} AS BIGINT) END AS sc,
             d.np + 1 AS np, {j} AS j,
             CASE WHEN d.ps = '' THEN {piece}
                  ELSE d.ps || ' ' || {piece} END AS ps
      FROM dp{j} d
      LEFT JOIN model m ON m.piece = {piece}
      WHERE length(d.w) >= {i} AND (m.mi IS NOT NULL OR {unk_ok})"""
            )
        union = "\n      UNION ALL\n".join(branches)
        parts.append(
            f"""dp{i} AS MATERIALIZED (
  SELECT w, sc, np, ps FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY c.w ORDER BY c.sc DESC, c.np ASC, c.j ASC) AS rn
    FROM (
{union}
    ) c)
  WHERE rn = 1)"""
        )
    seg_union = "\n  UNION ALL\n".join(
        f"  SELECT w, np, ps FROM dp{i} WHERE length(w) = {i}"
        for i in range(1, maxw + 1)
    )
    parts.append(f"seg AS MATERIALIZED (\n{seg_union}\n)")
    parts.append(
        """offs AS (
  SELECT c.doc_id, c.cpos, s.ps, s.np,
         sum(s.np) OVER (
             PARTITION BY c.doc_id ORDER BY c.cpos
             ROWS UNBOUNDED PRECEDING) - s.np AS off
  FROM cpos c JOIN seg s ON s.w = c.w)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT doc_id, CAST(off + t.i AS INTEGER) AS pos,
       string_split(ps, ' ')[t.i + 1] AS token
FROM offs,
     LATERAL (SELECT unnest(range(0, np)) AS i) t
"""
    )


SQL_UNIGRAM_ENCODE = _sql_unigram_encode()


PENDING_QUERIES: dict = {
    "unigram_encode": q_unigram_encode,
}

PENDING_ORACLE_SQL: dict = {
    "unigram_encode": SQL_UNIGRAM_ENCODE,
}
