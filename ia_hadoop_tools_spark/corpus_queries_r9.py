"""Training-corpus query registry rows, REGISTERED at the round-9 freeze.

History: these seven were implemented and continuously oracle-verified
in round 8 as pytest-pinned PENDING entries (the registry discipline in
COVERAGE.md — additions after a round's freeze ship through
tests/test_pending_oracles.py, with the exact driver comparison of row
count + column names + sorted values, until the next freeze registers
them).  Round 9 registered them in its first session-hour: registry
115 -> 122; they are merged into ``__spark_entry__.queries()`` via
``driver_queries.py``.

The seven close the curation-layer gaps of the training-pipeline layer:

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
- ``nb_quality`` — GPT-3-style linear quality filter
  (operators/classifier.nb_quality_score): mean per-token
  log-likelihood ratio under a FIXED Multinomial-NB model shared
  verbatim with the oracle (the FIXED_WORD_LM pattern); integer
  micro-nat aggregation makes the mean engine-exact.  Training is
  pinned by tests/test_classifier.py's plain-Python weight mirror.
- ``prototype_prune`` — D4-style cluster-aware pruning
  (operators/similarity.prototype_prune): nearest-centroid assignment
  (first-K-embeddings centroids, the semdedup-row trick),
  within-cluster prototypicality rank, keep verdicts by pure integer
  ppm arithmetic so no float multiply can flip a boundary row.
- ``corpus_stats`` — per-source corpus report card
  (operators/textops.corpus_stats): docs/tokens/chars/unique-texts/dup
  fraction in one aggregation job; every column an exact long or a
  fixed-order division of exact longs.
- ``curriculum_shuffle`` — phase-major annealing training order
  (operators/sampling.curriculum_shuffle): exact-count Hamilton shard
  apportionment (pure integer math) + the corpus_shuffle hash slice
  within each phase's contiguous range; the oracle recomputes the whole
  allocation in SQL CTEs — full value-level parity on (shard, pos).
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


#: fixed NB quality model (token, llr at 6 dp) shared verbatim with the
#: oracle — the FIXED_WORD_LM pattern: training is pinned separately by
#: tests/test_classifier.py's plain-Python mirror; the registry row pins
#: the SCORER (broadcast join + integer micro-nat mean) end-to-end.
#: Tokens chosen from the synthetic documents vocabulary so every doc
#: mixes in-model and out-of-model words.
FIXED_NB_MODEL: list[tuple[str, float]] = [
    ("spark", 0.693147),
    ("scan", 0.405465),
    ("merge", 0.223144),
    ("fast", 0.105361),
    ("slow", -0.105361),
    ("batch", -0.223144),
    ("table", -0.405465),
    ("dup", -1.386294),
]


def q_nb_quality(spark, sf_dir):
    """GPT-3-style linear quality filter (operators/classifier.py): mean
    per-token log-likelihood ratio under the fixed NB model — the scorer
    every pretraining corpus ships through, engine-exact via integer
    micro-nats."""
    from ia_hadoop_tools_spark.operators.classifier import nb_quality_score
    from ia_hadoop_tools_spark.session import load_tables

    model = spark.createDataFrame(FIXED_NB_MODEL, "token string, llr double")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return nb_quality_score(docs, model)


def _sql_nb_quality() -> str:
    vals = ",\n    ".join(
        f"('{t}', CAST({int(round(llr * 1e6))} AS BIGINT))"
        for t, llr in FIXED_NB_MODEL
    )
    return f"""
WITH model(token, mi) AS (
  VALUES
    {vals}),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
                                                  '[ \\t\\n\\f\\r]+'),
                            x -> x <> '')) AS w
  FROM documents),
scored AS (
  SELECT doc_id,
         CAST(sum(coalesce(m.mi, 0)) AS DOUBLE) / count(*) / 1e6
           AS nb_llr,
         count(*) AS n_tokens
  FROM toks LEFT JOIN model m ON toks.w = m.token
  GROUP BY doc_id)
SELECT d.doc_id, s.nb_llr,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


SQL_NB_QUALITY = _sql_nb_quality()


#: prototype_prune fixture: the semdedup-row trick (first-K embeddings
#: as centroids) + ppm keep fraction
PROTO_K = 8
PROTO_KEEP_FRAC = 0.75


def q_prototype_prune(spark, sf_dir):
    """D4-style cluster-aware pruning (operators/similarity.py
    prototype_prune): nearest-centroid assignment, within-cluster
    prototypicality rank, integer-ppm keep verdicts."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import prototype_prune
    from ia_hadoop_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    centroids = e.filter(F.col("vec_id") < PROTO_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    return prototype_prune(e, centroids, keep_frac=PROTO_KEEP_FRAC)


def _sql_prototype_prune() -> str:
    from ia_hadoop_tools_spark.driver_queries import (
        _vec_dot_sql,
        _vec_norm_sql,
    )

    ppm = int(round(PROTO_KEEP_FRAC * 1e6))
    dot = _vec_dot_sql("e.embedding", "c.cvec")
    ne, nc = _vec_norm_sql("e.embedding"), _vec_norm_sql("c.cvec")
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  WHERE vec_id < {PROTO_K}
),
scored AS (
  SELECT e.vec_id, c.cid,
         round({dot} / ({ne} * {nc}), 6) AS cos
  FROM embeddings e, cent c
  WHERE {ne} * {nc} <> 0
),
best AS (
  SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, cos FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
ranked AS (
  SELECT vec_id, cluster_id, cos AS cos_to_centroid,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY cos ASC, vec_id ASC) AS rnk,
         count(*) OVER (PARTITION BY cluster_id) AS sz
  FROM best)
SELECT vec_id, cluster_id, cos_to_centroid,
       CAST(rnk AS INTEGER) AS cluster_rank,
       rnk <= (sz * {ppm}) // 1000000 AS keep
FROM ranked
"""




def q_corpus_stats(spark, sf_dir):
    """Per-source corpus report card (operators/textops.corpus_stats):
    docs, tokens under the engine's one word rule, chars, exact unique
    texts, dup fraction — every aggregate either an exact long or a
    fixed-order division of exact longs, so the row is engine-exact."""
    from ia_hadoop_tools_spark.operators.textops import corpus_stats
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return corpus_stats(docs)


SQL_CORPUS_STATS = r"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       CAST(sum(t) AS DOUBLE) / count(*) AS mean_tokens,
       CAST(max(t) AS BIGINT) AS max_tokens,
       CAST(sum(c) AS BIGINT) AS n_chars,
       count(DISTINCT h) AS n_unique_texts,
       CAST(count(*) - count(DISTINCT h) AS DOUBLE) / count(*) AS dup_frac
FROM (
  SELECT source,
         len(list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                               '[ \t\n\f\r]+'),
                         x -> x <> '')) AS t,
         length(coalesce(text, '')) AS c,
         md5(coalesce(text, '')) AS h
  FROM documents)
GROUP BY source
"""


#: curriculum fixture: language as the phase (any content-derived
#: bucket works — the oracle only needs determinism)
CURR_SHARDS = 8
CURR_SEED = 3


def q_curriculum_shuffle(spark, sf_dir):
    """Phase-major annealing order (operators/sampling.curriculum_shuffle):
    exact-count Hamilton shard apportionment + the corpus_shuffle hash
    slice within each phase's contiguous range — the whole allocation is
    integer math, so the oracle recomputes it verbatim in SQL CTEs."""
    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curriculum_shuffle(
        docs, CURR_SHARDS, "lang", seed=CURR_SEED
    ).select("doc_id", "lang", "shard", "pos")


def _sql_curriculum_shuffle() -> str:
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql
    from ia_hadoop_tools_spark.operators.sampling import _HASH_SPACE

    h = hash32_sql("CAST(doc_id AS VARCHAR)", salt=f"shuffle:{CURR_SEED}:0:")
    n = CURR_SHARDS
    return f"""
WITH counts AS (
  SELECT lang AS p, count(*) AS c FROM documents GROUP BY lang),
tot AS (SELECT sum(c) AS t, count(*) AS np FROM counts),
quota AS (
  SELECT p, c, ((c * ({n} - np)) // t) AS fl, ((c * ({n} - np)) % t) AS rem
  FROM counts, tot),
lo AS (
  SELECT ({n} - any_value(np)) - sum(fl) AS leftover FROM quota, tot),
ranked AS (
  SELECT p, fl, rem,
         row_number() OVER (ORDER BY rem DESC, p ASC) AS rk
  FROM quota),
alloc AS (
  SELECT p, 1 + fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS a
  FROM ranked, lo),
starts AS (
  SELECT p, a,
         sum(a) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) - a AS st
  FROM alloc),
keyed AS (SELECT doc_id, lang, {h} AS h FROM documents),
assigned AS (
  SELECT k.doc_id, k.lang, k.h,
         CAST(s.st + (k.h * s.a) // {_HASH_SPACE} AS INTEGER) AS shard
  FROM keyed k JOIN starts s ON k.lang = s.p)
SELECT doc_id, lang, shard,
       CAST(row_number() OVER (
           PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM assigned
"""


SQL_CURRICULUM_SHUFFLE = _sql_curriculum_shuffle()


R9_QUERIES: dict = {
    "split_leakage_near": q_split_leakage_near,
    "lm_word_buckets": q_lm_word_buckets,
    "source_cap": q_source_cap,
    "nb_quality": q_nb_quality,
    "prototype_prune": q_prototype_prune,
    "corpus_stats": q_corpus_stats,
    "curriculum_shuffle": q_curriculum_shuffle,
}

# R9_ORACLES is built lazily (PEP 562 __getattr__): two of the oracle
# builders compose registry SQL from driver_queries (SQL_MINHASH_PAIRS,
# the vector helpers), and driver_queries imports THIS module at its
# bottom to merge the round-9 rows.  Building at first attribute access
# makes the import graph order-independent: whichever module loads
# first, the other's needed names are already bound by the time the
# builders run (driver_queries defines them well before its merge
# section).

def _build_r9_oracles() -> dict:
    return {
        "split_leakage_near": _sql_split_leakage_near(),
        "lm_word_buckets": SQL_LM_WORD_BUCKETS,
        "source_cap": SQL_SOURCE_CAP,
        "nb_quality": SQL_NB_QUALITY,
        "prototype_prune": _sql_prototype_prune(),
        "corpus_stats": SQL_CORPUS_STATS,
        "curriculum_shuffle": SQL_CURRICULUM_SHUFFLE,
    }


def __getattr__(name: str):
    if name == "R9_ORACLES":
        val = _build_r9_oracles()
        globals()["R9_ORACLES"] = val
        return val
    raise AttributeError(name)
