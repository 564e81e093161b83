"""Training-corpus query registry rows, REGISTERED at the round-8 freeze.

History: these four were implemented and continuously oracle-verified in
round 7 as pytest-pinned PENDING entries (the registry discipline in
COVERAGE.md — additions after a round's freeze ship through
tests/test_pending_oracles.py, with the exact driver comparison of row
count + column names + sorted values, until the next freeze registers
them).  Round 8 registered them in its first session-hour: registry
111 -> 115; they are merged into ``__spark_entry__.queries()`` via
``driver_queries.py``.

The four close the seeded-shuffle / word-level-quality / contamination
gaps of the training-pipeline layer:

- ``corpus_shuffle`` — seeded deterministic global training-order
  shuffle (operators/sampling.corpus_shuffle): content-addressed shard
  + intra-shard position, exact value-level oracle recomputing the
  salted-hash order in SQL.
- ``lm_word_score`` — word-level LM quality scoring
  (operators/lm_quality.lm_score with ``unit='word'``): a FIXED tiny
  word-bigram model shared literally with the oracle (the FIXED_MERGES
  pattern), so the word tokenizer + floor-coalesce scoring path is
  value-level pinned cross-engine without retraining per run.
- ``lm_backoff_score`` — word-trigram stupid-backoff scoring
  (operators/lm_quality.lm_score_backoff): a FIXED tall model with rows
  at every order, so all four backoff paths (trigram hit, +ln a bigram,
  +2 ln a unigram, unseen floor) are value-level pinned cross-engine.
- ``split_leakage`` — eval-split contamination audit
  (operators/sampling.split_leakage): content groups straddling >1
  split; the oracle row keys on a 2-token prefix signature so the
  synthetic corpus (which has no exact full-text dups) yields a
  substantive, value-level-checked result at every SF.
"""

from __future__ import annotations

import math

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


R8_QUERIES: dict = {
    "corpus_shuffle": q_corpus_shuffle,
    "lm_word_score": q_lm_word_score,
    "lm_backoff_score": q_lm_backoff_score,
    "split_leakage": q_split_leakage,
}

R8_ORACLES: dict = {
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "lm_word_score": SQL_LM_WORD_SCORE,
    "lm_backoff_score": SQL_LM_BACKOFF_SCORE,
    "split_leakage": SQL_SPLIT_LEAKAGE,
}
