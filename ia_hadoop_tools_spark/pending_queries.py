"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-7 freeze: the five round-6 pending entries (``bpe_encode_counts``,
``doc_chunks``, ``tfidf_topk``, ``hll_distinct_bound``, ``corpus_split``)
were registered (registry 106 -> 111) and now live in
``corpus_queries.py``.  Entries added below during round 7 register at
the round-8 freeze:

- ``corpus_shuffle`` — seeded deterministic global training-order
  shuffle (operators/sampling.corpus_shuffle): content-addressed shard
  + intra-shard position, exact value-level oracle recomputing the
  salted-hash order in SQL.
"""

from __future__ import annotations

SHUFFLE_SHARDS = 8
SHUFFLE_SEED = 7


def q_corpus_shuffle(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.sampling import corpus_shuffle
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return corpus_shuffle(docs, SHUFFLE_SHARDS, seed=SHUFFLE_SEED).select(
        "doc_id", "shard", "pos"
    )


def _sql_corpus_shuffle() -> str:
    # recompute the contract order in SQL: same salted hash mirror, the
    # same fixed-width hash-space slice, the same (hash, id) tie-break
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql
    from ia_hadoop_tools_spark.operators.sampling import _HASH_SPACE

    h = hash32_sql("CAST(doc_id AS VARCHAR)", salt=f"shuffle:{SHUFFLE_SEED}:0:")
    return f"""
WITH keyed AS (
  SELECT doc_id, {h} AS h,
         CAST(({h} * {SHUFFLE_SHARDS}) // {_HASH_SPACE} AS INTEGER) AS shard
  FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER (
           PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM keyed
"""


SQL_CORPUS_SHUFFLE = _sql_corpus_shuffle()


PENDING_QUERIES: dict = {
    "corpus_shuffle": q_corpus_shuffle,
}

PENDING_ORACLE_SQL: dict = {
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
}
