"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-8 freeze: the four round-7 pending entries (``corpus_shuffle``,
``lm_word_score``, ``lm_backoff_score``, ``split_leakage``) were
registered (registry 111 -> 115) and now live in
``corpus_queries_r8.py``.  Entries added below during round 8 register
at the round-9 freeze:

- ``split_leakage_near`` — NEAR-duplicate eval-split contamination
  (operators/sampling.split_leakage_near): MinHash-LSH near-dup pairs
  whose sides land in different content-addressed splits — the leakage
  mode real corpora have (exact dups are deduped before splitting; a
  val doc that is a 90%-Jaccard rewrite of a train doc is not).  The
  oracle composes the registry's exact MinHash pair SQL
  (driver_queries.SQL_MINHASH_PAIRS — deterministic fixed-seed
  signatures) with the split CASE applied per pair side, mirroring the
  operator's zero-join recomputation.
- ``lm_word_buckets`` — the WORD-level CCNet head/middle/tail cut
  (operators/lm_quality.lm_buckets over lm_score_backoff): the
  registered char ``lm_buckets`` row's calibration shape applied to the
  word-trigram stupid-backoff scorer with the round-8-registered FIXED
  model, shared verbatim with the oracle.
- ``source_cap`` — RefinedWeb-style per-source document cap
  (operators/sampling.cap_per_stratum): seeded uniform N-sample per
  stratum by salted content hash, exact value-level oracle via the one
  hash mirror.
"""

from __future__ import annotations

#: same split shape as corpus_queries_r8.LEAK_SPLITS / corpus SPLITS
NEAR_SPLITS: list[tuple[str, float]] = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def q_split_leakage_near(spark, sf_dir):
    from ia_hadoop_tools_spark.driver_queries import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_PERMS,
        SHINGLE_WORDS,
    )
    from ia_hadoop_tools_spark.operators.sampling import split_leakage_near
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return split_leakage_near(
        docs,
        NEAR_SPLITS,
        num_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        shingle_words=SHINGLE_WORDS,
        threshold=JACCARD_THRESHOLD,
    )


def _sql_split_leakage_near() -> str:
    # the registry's exact minhash-pair SQL as a derived table, then the
    # split CASE applied to each side — the same composition the
    # operator runs (split is a pure function of the id, so no join)
    from ia_hadoop_tools_spark.driver_queries import SQL_MINHASH_PAIRS
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql
    from ia_hadoop_tools_spark.operators.sampling import _MOD

    def case(bcol: str) -> str:
        cases, cum = [], 0.0
        for name, frac in NEAR_SPLITS:
            cum += frac
            cases.append(f"WHEN {bcol} < {int(round(cum * _MOD))} THEN '{name}'")
        return f"CASE {' '.join(cases)} ELSE NULL END"

    ha = hash32_sql("CAST(id_a AS VARCHAR)", salt="split:")
    hb = hash32_sql("CAST(id_b AS VARCHAR)", salt="split:")
    return f"""
SELECT id_a, id_b, jaccard, split_a, split_b
FROM (
  SELECT id_a, id_b, jaccard,
         {case('ba')} AS split_a,
         {case('bb')} AS split_b
  FROM (
    SELECT id_a, id_b, jaccard,
           {ha} % {_MOD} AS ba,
           {hb} % {_MOD} AS bb
    FROM ({SQL_MINHASH_PAIRS}) pairs))
WHERE split_a IS NOT NULL AND split_b IS NOT NULL AND split_a <> split_b
"""


SQL_SPLIT_LEAKAGE_NEAR = _sql_split_leakage_near()


#: calibration-slice bound for the word-level bucket cut (the fixed-size
#: slice trick of the registered char lm_buckets row, driver_queries
#: LM_CAL_DOCS — constant cost at any SF)
WORD_BUCKET_CAL_DOCS = 200


def q_lm_word_buckets(spark, sf_dir):
    """Word-level CCNet head/middle/tail cut: lm_buckets over the
    word-trigram stupid-backoff scorer with the FIXED model shared with
    the oracle — the perplexity bucket users actually ship (Wenzek et
    al. 2020 filter on word-level perplexity, not char statistics)."""
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.corpus_queries_r8 import (
        BACKOFF_ALPHA,
        FIXED_BACKOFF_LM,
    )
    from ia_hadoop_tools_spark.operators.lm_quality import (
        lm_buckets,
        lm_score_backoff,
    )
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    model = spark.createDataFrame(
        FIXED_BACKOFF_LM,
        "order: int, ctx: string, nxt: string, logs: double",
    )
    scored = lm_score_backoff(docs, model, alpha=BACKOFF_ALPHA).filter(
        F2.col("lm_score").isNotNull()
    )
    return lm_buckets(
        scored, calibration=F2.col("doc_id") < WORD_BUCKET_CAL_DOCS
    ).select("doc_id", "lm_score", "bucket")


def _sql_lm_word_buckets() -> str:
    # the registered lm_buckets shape (tercile cutoffs from the bounded
    # calibration slice) over the round-8-registered backoff score SQL;
    # the micro-nat score is engine-exact, so cutoff comparisons are too
    from ia_hadoop_tools_spark.corpus_queries_r8 import SQL_LM_BACKOFF_SCORE

    return f"""
WITH lm AS (
  SELECT doc_id, lm_score FROM ({SQL_LM_BACKOFF_SCORE}) sc
  WHERE lm_score IS NOT NULL),
cal AS (
  SELECT lm_score,
         ntile(3) OVER (ORDER BY lm_score DESC, doc_id ASC) AS b
  FROM lm WHERE doc_id < {WORD_BUCKET_CAL_DOCS}),
th AS (
  SELECT min(CASE WHEN b = 1 THEN lm_score END) AS t1,
         min(CASE WHEN b = 2 THEN lm_score END) AS t2
  FROM cal)
SELECT doc_id, lm_score,
       CASE WHEN lm_score >= t1 THEN 'head'
            WHEN lm_score >= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lm, th
"""


SQL_LM_WORD_BUCKETS = _sql_lm_word_buckets()


#: per-source document cap (RefinedWeb "limit per domain"); truncates
#: every stratum at every SF (sf0.001 already has 25 docs/source)
CAP_N = 10
CAP_SEED = 0


def q_source_cap(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.sampling import cap_per_stratum
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return cap_per_stratum(docs, CAP_N, seed=CAP_SEED).select(
        "doc_id", "source"
    )


def _sql_source_cap() -> str:
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql

    h = hash32_sql("CAST(doc_id AS VARCHAR)", salt=f"cap:{CAP_SEED}:")
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source ORDER BY {h}, doc_id) AS rn
  FROM documents)
WHERE rn <= {CAP_N}
"""


SQL_SOURCE_CAP = _sql_source_cap()


PENDING_QUERIES: dict = {
    "split_leakage_near": q_split_leakage_near,
    "lm_word_buckets": q_lm_word_buckets,
    "source_cap": q_source_cap,
}

PENDING_ORACLE_SQL: dict = {
    "split_leakage_near": SQL_SPLIT_LEAKAGE_NEAR,
    "lm_word_buckets": SQL_LM_WORD_BUCKETS,
    "source_cap": SQL_SOURCE_CAP,
}
