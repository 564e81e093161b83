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


#: hot-bucket cap for the capped embedding-LSH row: small enough to
#: ENGAGE at sf0.1+ (a 16-bucket band over 16k vectors averages 1,000
#: members), so the sweep exercises the drop path where the registered
#: uncapped row cannot
EMBED_CAP_MAX_BUCKET = 1000
EMBED_CAP_PLANES = 16
EMBED_CAP_BANDS = 4


def q_embedding_neardup_capped(spark, sf_dir):
    """The round-10 scale-guard contract of embedding_neardup_pairs
    (operators/similarity.py), value-pinned: explicit geometry
    (auto_planes=False so the oracle's plane matrix matches) with the
    hot-bucket cap ON — buckets over ``max_bucket`` are dropped before
    the self-join (the textops._drop_hot_buckets contract the sf10
    decade probe showed this operator needed; pairs agreeing ONLY in
    dropped buckets are excluded BY CONTRACT and the oracle mirrors the
    kept-bucket rule, the simhash_pairs pattern)."""
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.driver_queries import NEARDUP_COS_THRESHOLD
    from ia_hadoop_tools_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from ia_hadoop_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return embedding_neardup_pairs(
        e,
        threshold=NEARDUP_COS_THRESHOLD,
        num_planes=EMBED_CAP_PLANES,
        bands=EMBED_CAP_BANDS,
        max_bucket=EMBED_CAP_MAX_BUCKET,
        auto_planes=False,
    ).select("id_a", "id_b", F2.col("cosine").cast("double").alias("cosine"))


def _sql_embedding_neardup_capped() -> str:
    # the registered row's banded-LSH SQL with the kept-buckets CTE
    # spliced between codes and candidates (the simhash_pairs mirror)
    from ia_hadoop_tools_spark.driver_queries import (
        NEARDUP_COS_THRESHOLD,
        _cos2,
        _vec_dot_sql,
    )
    from ia_hadoop_tools_spark.operators.similarity import hyperplanes

    planes = hyperplanes(EMBED_CAP_PLANES, 64)
    width = EMBED_CAP_PLANES // EMBED_CAP_BANDS
    rows = ",\n    ".join(
        f"({pid}, [{', '.join(repr(x) for x in w)}]::DOUBLE[])"
        for pid, w in enumerate(planes)
    )
    dot_pw = _vec_dot_sql("e.embedding", "p.w")
    return f"""
WITH planes(pid, w) AS (
  VALUES
    {rows}
),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN {dot_pw} >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
codes AS (
  SELECT vec_id,
    CAST(CAST(pid // {width} AS INT) AS VARCHAR) || '_' ||
      array_to_string(list(bit ORDER BY pid), '_') AS bkey
  FROM bits GROUP BY vec_id, CAST(pid // {width} AS INT)
),
kept AS (
  SELECT bkey FROM codes GROUP BY bkey
  HAVING count(*) <= {EMBED_CAP_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM codes l
  JOIN kept k ON l.bkey = k.bkey
  JOIN codes r ON l.bkey = r.bkey
  WHERE l.vec_id < r.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT cand.id_a, cand.id_b, {_cos2('a', 'b')} AS cosine
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.id_a
  JOIN embeddings b ON b.vec_id = cand.id_b
) WHERE cosine >= {NEARDUP_COS_THRESHOLD}
"""


PENDING_QUERIES: dict = {
    "unigram_encode": q_unigram_encode,
    "embedding_neardup_capped": q_embedding_neardup_capped,
}


def _build_pending_oracles() -> dict:
    return {
        "unigram_encode": SQL_UNIGRAM_ENCODE,
        "embedding_neardup_capped": _sql_embedding_neardup_capped(),
    }


def __getattr__(name: str):
    # lazy (the corpus_queries pattern): the capped-embedding oracle
    # composes driver_queries helpers, and driver_queries must stay
    # importable without this module loading first
    if name == "PENDING_ORACLE_SQL":
        val = _build_pending_oracles()
        globals()["PENDING_ORACLE_SQL"] = val
        return val
    raise AttributeError(name)
