"""Training-corpus query registry rows (all freezes, one namespace).

Every row here is REGISTERED in the frozen registry (merged into
``__spark_entry__.queries()``/``oracle_sql()`` via ``driver_queries.py``)
and was oracle-verified as a pytest-pinned PENDING entry for a full
round before registration (the registry discipline in COVERAGE.md:
additions after a round's freeze ship through
tests/test_pending_oracles.py — the exact driver comparison of row
count + column names + sorted values — until the next freeze registers
them).  Registration history (the manifest's freeze_commit tracks the
current freeze): round 7 registered bpe_encode_counts, doc_chunks,
tfidf_topk, hll_distinct_bound, corpus_split (106 -> 111); round 8
added corpus_shuffle, lm_word_score, lm_backoff_score, split_leakage
(111 -> 115); round 9 added split_leakage_near, lm_word_buckets,
source_cap, nb_quality, prototype_prune, corpus_stats,
curriculum_shuffle (115 -> 122); round 10 added lang_nb,
normalize_text, hash_embed, unigram_counts (122 -> 126); round 11
added unigram_encode, embedding_neardup_capped (126 -> 128).  The
module was folded from the per-round files in round 10 — the layout no
longer encodes round history; per-row design notes live on each query
function.

``CORPUS_ORACLES`` builds lazily (PEP 562 ``__getattr__``): two oracle
builders compose registry SQL from ``driver_queries``
(SQL_MINHASH_PAIRS, the vector helpers), and ``driver_queries`` imports
THIS module at its bottom to merge the rows.  Building at first
attribute access makes the import graph order-independent: whichever
module loads first, the other's needed names are already bound by the
time the builders run (``driver_queries`` defines them well before its
merge section).
"""

from __future__ import annotations

import math

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


#: fixed word-bigram model (ctx, nxt, logp, logp_unseen, logp_nocontext)
#: over the synthetic-document vocabulary, shared verbatim with the SQL
#: oracle.  Four contexts exercise all three scoring paths: seen pair ->
#: logp, seen context + unseen pair -> that context's floor, unseen
#: context -> the global 1/V floor (identical on every row by contract).
FIXED_WORD_LM: list[tuple[str, str, float, float, float]] = [
    ("the", "fast", -1.203973, -4.60517, -3.401197),
    ("the", "batch", -1.609438, -4.60517, -3.401197),
    ("batch", "batch", -0.693147, -3.912023, -3.401197),
    ("batch", "stream", -2.302585, -3.912023, -3.401197),
    ("merge", "slow", -1.386294, -4.174387, -3.401197),
    ("merge", "part", -1.89712, -4.174387, -3.401197),
    ("data", "row", -1.050822, -3.988984, -3.401197),
    ("data", "line", -2.014903, -3.988984, -3.401197),
]


def q_lm_word_score(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.lm_quality import lm_score
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    model = spark.createDataFrame(
        FIXED_WORD_LM,
        "ctx: string, nxt: string, logp: double, logp_unseen: double, "
        "logp_nocontext: double",
    )
    return lm_score(docs, model, unit="word")


def _sql_lm_word_score() -> str:
    vals = ",\n    ".join(
        f"('{c}', '{n}', CAST({lp} AS DOUBLE), CAST({lu} AS DOUBLE), "
        f"CAST({lnc} AS DOUBLE))"
        for c, n, lp, lu, lnc in FIXED_WORD_LM
    )
    return f"""
WITH model(ctx, nxt, logp, logp_unseen, logp_nocontext) AS (
  VALUES
    {vals}),
floors AS (SELECT DISTINCT ctx, logp_unseen FROM model),
nc AS (SELECT logp_nocontext FROM model LIMIT 1),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'),
                     x -> x <> '') AS ws
  FROM documents),
dbg AS (
  SELECT doc_id, ws[CAST(i AS INT)] AS ctx, ws[CAST(i AS INT) + 1] AS nxt
  FROM toks, UNNEST(range(1, len(ws))) AS u(i)
  WHERE len(ws) >= 2),
scored AS (
  -- integer micro-nats mirror lm_score's engine-exact aggregation: a
  -- float avg drifts a ULP at the 6-dp rounding boundary cross-engine
  SELECT doc_id,
         round(CAST(sum(CAST(round(
                 coalesce(m.logp, f.logp_unseen, nc.logp_nocontext) * 1e6,
               0) AS BIGINT)) AS DOUBLE) / count(*) / 1e6, 6)
           AS lm_score,
         count(*) AS n_bigrams
  FROM dbg
  LEFT JOIN model m ON dbg.ctx = m.ctx AND dbg.nxt = m.nxt
  LEFT JOIN floors f ON dbg.ctx = f.ctx
  CROSS JOIN nc
  GROUP BY doc_id)
SELECT d.doc_id, s.lm_score,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


SQL_LM_WORD_SCORE = _sql_lm_word_score()


#: fixed stupid-backoff model (order, ctx, nxt, logs) shared verbatim
#: with the oracle — rows at every order so all FOUR scoring paths are
#: exercised on corpus vocabulary: trigram hit, bigram backoff (+ln a),
#: unigram backoff (+2 ln a), fully-unseen floor (ln(1/V) + 2 ln a).
FIXED_BACKOFF_LM: list[tuple[int, str, str, float]] = [
    (3, "the batch", "batch", -0.510826),
    (3, "merge slow", "part", -0.693147),
    (2, "batch", "batch", -0.916291),
    (2, "on", "the", -1.098612),
    (2, "the", "fast", -1.203973),
    (1, "", "the", -2.014903),
    (1, "", "batch", -2.197225),
    (1, "", "data", -2.407946),
    (1, "", "merge", -2.60269),
]

BACKOFF_ALPHA = 0.4
#: derived exactly as lm_score_backoff derives them (alpha and the
#: unigram-row count V are the only inputs), so editing BACKOFF_ALPHA or
#: the model can never desynchronize the oracle constants
_BACKOFF_V = sum(1 for o, _c, _n, _s in FIXED_BACKOFF_LM if o == 1)
_BACKOFF_LA = round(math.log(BACKOFF_ALPHA), 6)
_BACKOFF_LA2 = round(2 * math.log(BACKOFF_ALPHA), 6)
_BACKOFF_FLOOR = round(math.log(1.0 / _BACKOFF_V), 6)


def q_lm_backoff_score(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.lm_quality import lm_score_backoff
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    model = spark.createDataFrame(
        FIXED_BACKOFF_LM,
        "order: int, ctx: string, nxt: string, logs: double",
    )
    return lm_score_backoff(docs, model, alpha=BACKOFF_ALPHA)


def _sql_lm_backoff_score() -> str:
    def vals(order):
        return ",\n    ".join(
            f"('{c}', '{n}', CAST({s} AS DOUBLE))"
            for o, c, n, s in FIXED_BACKOFF_LM
            if o == order
        )

    # the backoff penalties ADD in SQL exactly as Spark adds them
    # (identical IEEE operands => identical doubles in both engines)
    return f"""
WITH m3(ctx, nxt, logs) AS (VALUES
    {vals(3)}),
m2(ctx, nxt, logs) AS (VALUES
    {vals(2)}),
m1(z, nxt, logs) AS (VALUES
    {vals(1)}),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'),
                     x -> x <> '') AS ws
  FROM documents),
tg AS (
  SELECT doc_id,
         ws[CAST(i AS INT)] AS w1,
         ws[CAST(i AS INT) + 1] AS w2,
         ws[CAST(i AS INT) + 2] AS w3
  FROM toks, UNNEST(range(1, len(ws) - 1)) AS u(i)
  WHERE len(ws) >= 3),
scored AS (
  -- integer micro-nats, exact sum, one fixed-order division: mirrors
  -- lm_score_backoff's engine-exact aggregate (float avg drifted a ULP)
  SELECT doc_id,
         (CAST(SUM(CAST(round(coalesce(
             m3.logs,
             m2.logs + CAST({_BACKOFF_LA} AS DOUBLE),
             m1.logs + CAST({_BACKOFF_LA2} AS DOUBLE),
             CAST({_BACKOFF_FLOOR} AS DOUBLE)
               + CAST({_BACKOFF_LA2} AS DOUBLE)) * 1000000)
             AS BIGINT)) AS DOUBLE) / count(*)) / 1000000 AS lm_score,
         count(*) AS n_trigrams
  FROM tg
  LEFT JOIN m3 ON m3.ctx = tg.w1 || ' ' || tg.w2 AND m3.nxt = tg.w3
  LEFT JOIN m2 ON m2.ctx = tg.w2 AND m2.nxt = tg.w3
  LEFT JOIN m1 ON m1.nxt = tg.w3
  GROUP BY doc_id)
SELECT d.doc_id, s.lm_score,
       CAST(coalesce(s.n_trigrams, 0) AS BIGINT) AS n_trigrams
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


SQL_LM_BACKOFF_SCORE = _sql_lm_backoff_score()


#: splits for the leakage audit — same shape as corpus_queries.SPLITS
LEAK_SPLITS: list[tuple[str, float]] = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


#: leakage signature granularity: the synthetic corpus has no EXACT
#: full-text duplicates, so the oracle row audits a 2-token prefix
#: fingerprint — coarse enough to collide for real at every SF, while
#: the operator itself stays generic (text_col takes any content key)
LEAK_PREFIX_TOKENS = 2


def q_split_leakage(spark, sf_dir):
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT
    from ia_hadoop_tools_spark.operators.sampling import split_leakage
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ws = F2.filter(
        F2.split(F2.lower("text"), WORD_SPLIT), lambda t: t != F2.lit("")
    )
    sig = F2.array_join(F2.slice(ws, 1, LEAK_PREFIX_TOKENS), " ")
    return split_leakage(
        docs.select("doc_id", sig.alias("sig")), LEAK_SPLITS, text_col="sig"
    )


def _sql_split_leakage() -> str:
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql
    from ia_hadoop_tools_spark.operators.sampling import _MOD

    cases, cum = [], 0.0
    for name, frac in LEAK_SPLITS:
        cum += frac
        cases.append(f"WHEN b < {int(round(cum * _MOD))} THEN '{name}'")
    h = hash32_sql("CAST(doc_id AS VARCHAR)", salt="split:")
    return f"""
WITH sigs AS (
  SELECT doc_id,
         array_to_string(
           list_filter(regexp_split_to_array(lower(text),
                       '[ \\t\\n\\f\\r]+'), x -> x <> '')
             [1 : {LEAK_PREFIX_TOKENS}], ' ') AS sig
  FROM documents),
assigned AS (
  SELECT doc_id, md5(sig) AS text_md5,
         CASE {' '.join(cases)} ELSE NULL END AS split
  FROM (SELECT doc_id, sig, {h} % {_MOD} AS b FROM sigs)
  ),
grp AS (
  SELECT text_md5,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT split) AS n_splits,
         array_to_string(list_sort(list_distinct(list(split))), ',')
           AS splits,
         MIN(doc_id) AS min_doc_id
  FROM assigned WHERE split IS NOT NULL
  GROUP BY text_md5)
SELECT text_md5, n_docs, n_splits, splits, min_doc_id
FROM grp WHERE n_splits > 1
"""


SQL_SPLIT_LEAKAGE = _sql_split_leakage()


#: same split shape as LEAK_SPLITS / SPLITS above
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


#: fixed dense char-trigram NB langid model (lang, ngram, logp at 6 dp)
#: shared verbatim with the oracle — the FIXED_NB_MODEL pattern: training
#: is pinned by tests/test_langid.py's plain-Python mirror; this row pins
#: the SCORER (broadcast dense join + OOV floor + prior + integer
#: micro-nat argmax) end-to-end.  Trigrams chosen from the synthetic
#: documents vocabulary so predictions vary with content; '__floor__' is
#: the per-OOV-gram cost, '__prior__' the ln class prior (langid.py).
FIXED_LANG_NB: list[tuple[str, str, float]] = [
    ("en", "the", -2.0), ("en", "tab", -5.0), ("en", "que", -5.5),
    ("en", "sca", -4.0), ("en", "mer", -4.5), ("en", "bat", -4.8),
    ("en", "__floor__", -8.0), ("en", "__prior__", -0.7),
    ("de", "the", -6.0), ("de", "tab", -3.0), ("de", "que", -6.5),
    ("de", "sca", -5.0), ("de", "mer", -2.5), ("de", "bat", -3.5),
    ("de", "__floor__", -7.5), ("de", "__prior__", -1.2),
    ("fr", "the", -5.5), ("fr", "tab", -4.5), ("fr", "que", -2.0),
    ("fr", "sca", -6.0), ("fr", "mer", -3.0), ("fr", "bat", -5.2),
    ("fr", "__floor__", -7.8), ("fr", "__prior__", -1.4),
]

LANG_NB_N = 3
LANG_NB_MAX_CHARS = 1000


def q_lang_nb(spark, sf_dir):
    """Trained char-trigram NB language ID (operators/langid.py — the
    CCNet/fastText-style classification the heuristic stopword vote
    approximates): per-doc argmax over integer micro-nat class scores
    under the FIXED dense model."""
    from ia_hadoop_tools_spark.operators.langid import lang_nb
    from ia_hadoop_tools_spark.session import load_tables

    model = spark.createDataFrame(
        FIXED_LANG_NB, "lang string, ngram string, logp double"
    )
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return lang_nb(docs, model, n=LANG_NB_N, max_chars=LANG_NB_MAX_CHARS)


def _sql_lang_nb() -> str:
    vals = ",\n    ".join(
        f"('{lang}', '{g}', CAST({int(round(lp * 1e6))} AS BIGINT))"
        for lang, g, lp in FIXED_LANG_NB
    )
    n, mx = LANG_NB_N, LANG_NB_MAX_CHARS
    return f"""
WITH model(lang, ngram, mi) AS (
  VALUES
    {vals}),
floors AS (SELECT lang, mi FROM model WHERE ngram = '__floor__'),
priors AS (SELECT lang, mi FROM model WHERE ngram = '__prior__'),
real_m AS (SELECT * FROM model WHERE ngram NOT IN ('__floor__', '__prior__')),
pre AS (
  SELECT doc_id, substr(lower(coalesce(text, '')), 1, {mx}) AS p
  FROM documents),
base AS (
  SELECT doc_id, greatest(length(p) - {n - 1}, 0) AS nt FROM pre),
grams AS (
  SELECT doc_id, substr(p, i, {n}) AS g FROM (
    SELECT doc_id, p,
           CAST(unnest(range(1, greatest(length(p) - {n - 1}, 0) + 1))
                AS INTEGER) AS i
    FROM pre)),
inv AS (
  SELECT g.doc_id, m.lang, sum(m.mi) AS sm, count(*) AS ni
  FROM grams g JOIN real_m m ON g.g = m.ngram
  GROUP BY g.doc_id, m.lang),
scored AS (
  SELECT b.doc_id, f.lang,
         coalesce(i.sm, 0) + (b.nt - coalesce(i.ni, 0)) * f.mi + p.mi AS sc,
         b.nt
  FROM base b
  CROSS JOIN floors f
  JOIN priors p ON p.lang = f.lang
  LEFT JOIN inv i ON i.doc_id = b.doc_id AND i.lang = f.lang)
SELECT doc_id, lang AS lang_pred,
       CAST(sc AS DOUBLE) / 1e6 AS lang_score,
       CAST(nt AS BIGINT) AS n_grams
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY sc DESC, lang ASC) AS rn
  FROM scored)
WHERE rn = 1
"""


SQL_LANG_NB = _sql_lang_nb()


def q_normalize_text(spark, sf_dir):
    """CCNet-style dedup normalization (functions/textfns.normalize_text
    via operators/textops.normalize_corpus): lowercase, control strip,
    digits->0, ASCII punctuation strip, whitespace collapse — the
    Wenzek et al. 2020 preprocessing step before hashing/dedup.  Pure
    codegen regexp chain; punct=True exercises every branch."""
    from ia_hadoop_tools_spark.operators.textops import normalize_corpus
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return normalize_corpus(docs, digits=True, punct=True).select(
        "doc_id", "text_norm"
    )


def _sql_normalize_text() -> str:
    from ia_hadoop_tools_spark.functions.textfns import normalize_text_sql

    norm = normalize_text_sql("text", digits=True, punct=True)
    return f"SELECT doc_id, {norm} AS text_norm FROM documents"


SQL_NORMALIZE_TEXT = _sql_normalize_text()


#: feature-hash embedding dimension for the registry row (small enough
#: that the oracle's docs x dim dense build stays cheap at every SF)
HASH_EMBED_DIM = 32


def q_hash_embed(spark, sf_dir):
    """Signed feature-hash document embeddings (operators/embed.py —
    Weinberger et al. 2009 hashing trick): text-only corpora get
    L2-normalized vectors consumable by the whole embedding family
    (ann_topk/semdedup/prototype_prune) with no external encoder.
    Engine-exact: integer cell sums, one sqrt + one division per
    element on identical operands."""
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.operators.embed import hash_embed
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    emb = hash_embed(docs, dim=HASH_EMBED_DIM)
    # array outputs compare as posexploded rows (the minhash_sigs
    # registry convention — the frame sort can't order list cells)
    return emb.select(
        "doc_id", "n_tokens", F2.posexplode("embedding").alias("j", "x")
    )


def _sql_hash_embed() -> str:
    from ia_hadoop_tools_spark.operators.embed import hash_embed_sql

    inner = hash_embed_sql(dim=HASH_EMBED_DIM)
    return f"""
SELECT doc_id, n_tokens, CAST(u.i AS INTEGER) AS j, u.x
FROM ({inner}) e,
     LATERAL (SELECT unnest(range(0, {HASH_EMBED_DIM})) AS i,
                     unnest(e.embedding) AS x) u
"""


SQL_HASH_EMBED = _sql_hash_embed()


#: fixed unigram-LM tokenizer model (piece, logp at 6 dp) shared
#: verbatim with the oracle — pieces from the synthetic vocabulary plus
#: a few chars, so segmentation exercises multi-char pieces, singles,
#: AND the UNK single-char path on every document.  Training is pinned
#: by tests/test_unigram.py's exact plain-Python mirror; this row pins
#: the Viterbi SCORER (integer micro-nat DP + the documented tie rule)
#: against an independent fixed-depth DP the oracle builds in SQL.
FIXED_UNIGRAM: list[tuple[str, float]] = [
    ("spark", -1.2), ("merge", -1.3), ("scan", -1.8), ("tab", -2.2),
    ("le", -2.4), ("row", -2.0), ("va", -2.6), ("lu", -2.7),
    ("batch", -1.6), ("a", -3.0), ("e", -3.1), ("r", -3.2),
    ("t", -3.3), ("s", -3.4),
]

UNIGRAM_MAX_PIECE = 5
UNIGRAM_MAX_WORD = 16


def q_unigram_counts(spark, sf_dir):
    """Unigram-LM (SentencePiece-style) Viterbi token counts
    (operators/unigram.py — Kudo 2018): per-doc (n_words, n_tokens)
    under the FIXED piece model; distinct-chunk dictionary path, exact
    integer micro-nat DP with the documented tie rule."""
    from ia_hadoop_tools_spark.operators.unigram import unigram_token_counts
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return unigram_token_counts(
        docs,
        dict(FIXED_UNIGRAM),
        max_piece_len=UNIGRAM_MAX_PIECE,
        max_word_len=UNIGRAM_MAX_WORD,
    )


def _sql_unigram_counts() -> str:
    """Independent DuckDB implementation of the Viterbi contract: a
    fixed-depth DP (one generated CTE per word position, 1..max_word —
    chunking bounds the lattice, which is what makes this expressible
    without recursion) over the same integer micro scores, UNK constant,
    and (score DESC, pieces ASC, split-point ASC) tie rule."""
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
words0 AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'),
                            x -> x <> '')) AS w
  FROM documents),
chunks AS (
  SELECT doc_id, substr(w, k * {maxw} + 1, {maxw}) AS w FROM (
    SELECT doc_id, w,
           CAST(unnest(range(0, CAST(ceil(length(w) / {maxw}.0) AS BIGINT)))
                AS INTEGER) AS k
    FROM words0)),
docw AS MATERIALIZED (SELECT doc_id, w, count(*) AS occ FROM chunks GROUP BY 1, 2),
dw AS MATERIALIZED (SELECT DISTINCT w FROM docw),
dp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS sc, 0 AS np FROM dw)"""
    ]
    for i in range(1, maxw + 1):
        branches = []
        for j in range(max(0, i - maxp), i):
            ln = i - j
            unk_ok = "TRUE" if ln == 1 else "FALSE"
            branches.append(
                f"""      SELECT d.w,
             d.sc + CASE WHEN m.mi IS NOT NULL THEN m.mi
                         ELSE CAST({unk} AS BIGINT) END AS sc,
             d.np + 1 AS np, {j} AS j
      FROM dp{j} d
      LEFT JOIN model m ON m.piece = substr(d.w, {j + 1}, {ln})
      WHERE length(d.w) >= {i} AND (m.mi IS NOT NULL OR {unk_ok})"""
            )
        union = "\n      UNION ALL\n".join(branches)
        parts.append(
            f"""dp{i} AS MATERIALIZED (
  SELECT w, sc, np FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY c.w ORDER BY c.sc DESC, c.np ASC, c.j ASC) AS rn
    FROM (
{union}
    ) c)
  WHERE rn = 1)"""
        )
    cost_union = "\n  UNION ALL\n".join(
        f"  SELECT w, np FROM dp{i} WHERE length(w) = {i}"
        for i in range(1, maxw + 1)
    )
    parts.append(f"cost AS (\n{cost_union}\n)")
    return (
        ",\n".join(parts)
        + """
SELECT d.doc_id,
       CAST(sum(d.occ) AS BIGINT) AS n_words,
       CAST(sum(d.occ * c.np) AS BIGINT) AS n_tokens
FROM docw d JOIN cost c ON c.w = d.w
GROUP BY d.doc_id
"""
    )


SQL_UNIGRAM_COUNTS = _sql_unigram_counts()


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
    from ia_hadoop_tools_spark.operators.unigram import unigram_encode

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    enc = unigram_encode(
        docs,
        dict(FIXED_UNIGRAM),
        max_piece_len=UNIGRAM_MAX_PIECE,
        max_word_len=UNIGRAM_MAX_WORD,
    )
    return enc.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
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
    from ia_hadoop_tools_spark.driver_queries import NEARDUP_COS_THRESHOLD
    from ia_hadoop_tools_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return embedding_neardup_pairs(
        e,
        threshold=NEARDUP_COS_THRESHOLD,
        num_planes=EMBED_CAP_PLANES,
        bands=EMBED_CAP_BANDS,
        max_bucket=EMBED_CAP_MAX_BUCKET,
        auto_planes=False,
    ).select("id_a", "id_b", F.col("cosine").cast("double").alias("cosine"))


def _sql_embedding_neardup_capped() -> str:
    # the registered row's banded-LSH SQL with the kept-buckets CTE
    # spliced between codes and candidates (the simhash_pairs mirror);
    # composes driver_queries helpers, so it builds lazily inside
    # _build_corpus_oracles (never at import time)
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


CORPUS_QUERIES: dict = {
    # round-7 freeze
    "bpe_encode_counts": q_bpe_encode_counts,
    "doc_chunks": q_doc_chunks,
    "tfidf_topk": q_tfidf_topk,
    "hll_distinct_bound": q_hll_distinct_bound,
    "corpus_split": q_corpus_split,
    # round-8 freeze
    "corpus_shuffle": q_corpus_shuffle,
    "lm_word_score": q_lm_word_score,
    "lm_backoff_score": q_lm_backoff_score,
    "split_leakage": q_split_leakage,
    # round-9 freeze
    "split_leakage_near": q_split_leakage_near,
    "lm_word_buckets": q_lm_word_buckets,
    "source_cap": q_source_cap,
    "nb_quality": q_nb_quality,
    "prototype_prune": q_prototype_prune,
    "corpus_stats": q_corpus_stats,
    "curriculum_shuffle": q_curriculum_shuffle,
    # round-10 freeze
    "lang_nb": q_lang_nb,
    "normalize_text": q_normalize_text,
    "hash_embed": q_hash_embed,
    "unigram_counts": q_unigram_counts,
    # round-11 freeze
    "unigram_encode": q_unigram_encode,
    "embedding_neardup_capped": q_embedding_neardup_capped,
}


def _build_corpus_oracles() -> dict:
    return {
        "bpe_encode_counts": SQL_BPE_ENCODE_COUNTS,
        "doc_chunks": SQL_DOC_CHUNKS,
        "tfidf_topk": SQL_TFIDF_TOPK,
        "hll_distinct_bound": SQL_HLL_DISTINCT_BOUND,
        "corpus_split": SQL_CORPUS_SPLIT,
        "corpus_shuffle": SQL_CORPUS_SHUFFLE,
        "lm_word_score": SQL_LM_WORD_SCORE,
        "lm_backoff_score": SQL_LM_BACKOFF_SCORE,
        "split_leakage": SQL_SPLIT_LEAKAGE,
        "split_leakage_near": _sql_split_leakage_near(),
        "lm_word_buckets": SQL_LM_WORD_BUCKETS,
        "source_cap": SQL_SOURCE_CAP,
        "nb_quality": SQL_NB_QUALITY,
        "prototype_prune": _sql_prototype_prune(),
        "corpus_stats": SQL_CORPUS_STATS,
        "curriculum_shuffle": SQL_CURRICULUM_SHUFFLE,
        "lang_nb": SQL_LANG_NB,
        "normalize_text": SQL_NORMALIZE_TEXT,
        "hash_embed": SQL_HASH_EMBED,
        "unigram_counts": SQL_UNIGRAM_COUNTS,
        "unigram_encode": SQL_UNIGRAM_ENCODE,
        "embedding_neardup_capped": _sql_embedding_neardup_capped(),
    }


def __getattr__(name: str):
    if name == "CORPUS_ORACLES":
        val = _build_corpus_oracles()
        globals()["CORPUS_ORACLES"] = val
        return val
    raise AttributeError(name)
