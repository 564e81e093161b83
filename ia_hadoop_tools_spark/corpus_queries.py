"""Training-corpus query registry rows, REGISTERED at the round-7 freeze.

History: these five were implemented and continuously oracle-verified in
round 6 as pytest-pinned PENDING entries (the registry discipline in
COVERAGE.md — additions after a round's freeze ship through
tests/test_pending_oracles.py, with the exact driver comparison of row
count + column names + sorted values, until the next freeze registers
them).  Round 7 registered them in its first session-hour: registry
106 -> 111; they are merged into ``__spark_entry__.queries()`` via
``driver_queries.py``.

The five close the remaining "training-data pipeline" verbs SURVEY's
LLM-ops mandate lists that had no first-class query yet:

- ``bpe_encode_counts`` — tokenizer-TRUE sequence lengths: apply a BPE
  merge table to the corpus (operators/bpe.bpe_token_counts, the
  boundary-wrapped replace-fold encoder) with a FIXED, corpus-
  independent merge list shared literally with the DuckDB oracle, so
  the encoder itself is value-level pinned cross-engine.
- ``doc_chunks`` — overlapping token-window chunking
  (operators/chunking.chunk_documents), the embedding-pipeline slicer.
- ``tfidf_topk`` — per-document characteristic terms
  (operators/search.tfidf_topk), integer-scaled score, no float drift.
- ``hll_distinct_bound`` — the native HLL++ scale path's error-contract
  audit (operators/sketches.hll_distinct_bound), the engine-private
  sibling of the portable ``kmv_distinct``.
- ``corpus_split`` — deterministic growth-stable train/val/test
  assignment (operators/sampling.split_corpus), exact value-level
  oracle sharing the engine's one hash mirror.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.session import load_tables

#: fixed English-bigram merge table (training order), shared verbatim
#: with the oracle — corpus-independent so the query is self-contained
#: at any scale factor.  Includes chained merges ('t','h' then 'th','e')
#: so the oracle exercises merge-order dependence, and ('e','r') after
#: ('h','e') so it exercises already-consumed left symbols.
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("o", "u"),
    ("i", "s"),
    ("a", "t"),
    ("in", "g"),
]

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
TFIDF_K = 3
HLL_RSD = 0.05


def q_bpe_encode_counts(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.bpe import bpe_token_counts

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return bpe_token_counts(docs, FIXED_MERGES)


def _sql_bpe_encode_counts() -> str:
    # the same fold, DuckDB dialect: list_reduce has no init parameter,
    # so the initial wrapped state is list_prepend'ed to the merge list
    # (state and merges are both VARCHAR, satisfying list_reduce's
    # accumulator-type = element-type rule).
    merge_lits = ", ".join(
        "chr(30) || '{a}' || chr(31) || chr(30) || '{b}' || chr(31)".format(a=a, b=b)
        for a, b in FIXED_MERGES
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(
             replace(replace(text, chr(30), ''), chr(31), ''),
             '[ \\t\\n\\f\\r]+'),
           x -> x <> '')) AS w
  FROM documents),
enc AS (
  SELECT doc_id,
    len(string_split(
      list_reduce(
        list_prepend(
          regexp_replace(w, '(.)', chr(30) || '\\1' || chr(31), 'g'),
          [{merge_lits}]),
        (acc, m) -> replace(acc, m, replace(m, chr(31) || chr(30), ''))),
      chr(31) || chr(30))) AS toks_per
  FROM words)
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(toks_per) AS BIGINT) AS n_tokens
FROM enc GROUP BY doc_id
"""


SQL_BPE_ENCODE_COUNTS = _sql_bpe_encode_counts()


def q_doc_chunks(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.chunking import chunk_documents

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return chunk_documents(docs, chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE)


SQL_DOC_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'),
                     x -> x <> '') AS ws
  FROM documents),
starts AS (
  SELECT doc_id, ws, s AS start
  FROM toks, UNNEST(range(0, len(ws), {CHUNK_STRIDE})) AS u(s)
  WHERE len(ws) > 0)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       CAST(len(ws[start + 1 : start + {CHUNK_TOKENS}]) AS INTEGER) AS n_tokens,
       array_to_string(ws[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk
FROM starts
"""


def q_tfidf_topk(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.search import tfidf_topk

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return tfidf_topk(docs, k=TFIDF_K)


SQL_TFIDF_TOPK = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))
           AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         (tf.tf * 1000000) // (dfreq.df + 1) AS score
  FROM tf JOIN dfreq USING (token), n
  WHERE CAST(dfreq.df AS DOUBLE) <= 0.5 * n.n_docs),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
  FROM scored)
SELECT doc_id, token, tf, df, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_K}
"""


def q_hll_distinct_bound(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.sketches import hll_distinct_bound

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    user_day = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd"),
    )
    return hll_distinct_bound(ev, ["event_type"], user_day, rsd=HLL_RSD)


# contract oracle (quantile_bound_check pattern): the oracle enumerates
# the groups and asserts the bound HELD — Spark's HLL++ binary sketch is
# engine-private, so the pinnable statement is the contract, not est.
SQL_HLL_DISTINCT_BOUND = """
SELECT event_type, TRUE AS within_bound
FROM (SELECT DISTINCT event_type FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL)
"""


#: the corpus-split assignment pinned by the oracle (ordered)
SPLITS: list[tuple[str, float]] = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def q_corpus_split(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.sampling import split_corpus

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return split_corpus(docs, SPLITS).select("doc_id", "split")


def _sql_corpus_split() -> str:
    # reuse the engine's ONE hash mirror and modulus so the oracle can
    # never drift from split_corpus (same float accumulation order and
    # the same int(round(...)) bounds as the Spark side)
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql
    from ia_hadoop_tools_spark.operators.sampling import _MOD

    cases, cum = [], 0.0
    for name, frac in SPLITS:
        cum += frac
        cases.append(f"WHEN b < {int(round(cum * _MOD))} THEN '{name}'")
    h = hash32_sql("CAST(doc_id AS VARCHAR)", salt="split:")
    return f"""
SELECT doc_id,
       CASE {' '.join(cases)} ELSE NULL END AS split
FROM (SELECT doc_id, {h} % {_MOD} AS b
      FROM documents)
"""


SQL_CORPUS_SPLIT = _sql_corpus_split()


CORPUS_QUERIES = {
    "bpe_encode_counts": q_bpe_encode_counts,
    "doc_chunks": q_doc_chunks,
    "tfidf_topk": q_tfidf_topk,
    "hll_distinct_bound": q_hll_distinct_bound,
    "corpus_split": q_corpus_split,
}

CORPUS_ORACLES = {
    "bpe_encode_counts": SQL_BPE_ENCODE_COUNTS,
    "doc_chunks": SQL_DOC_CHUNKS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "hll_distinct_bound": SQL_HLL_DISTINCT_BOUND,
    "corpus_split": SQL_CORPUS_SPLIT,
}
