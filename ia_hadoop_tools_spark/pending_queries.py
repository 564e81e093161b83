"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-11 freeze: the two round-10 pending entries (``unigram_encode``,
``embedding_neardup_capped``) were registered (registry 126 -> 128) and
now live in ``corpus_queries.py``.  Entries added below during round 11
register at the round-12 freeze.
"""

from __future__ import annotations

#: benchmark derivation for the decontam_fuzzy row: every corpus doc
#: with doc_id % 10 == 7 (the exact-decontam row's planted-contamination
#: rule) contributes a NEAR-duplicate benchmark item — its text minus
#: the last FUZZY_BENCH_DROP tokens — so paraphrase-level contamination
#: exists deterministically at any scale factor while staying invisible
#: to exact whole-window matching at large n.
FUZZY_BENCH_MOD = 7
FUZZY_BENCH_DROP = 3


def q_decontam_fuzzy(spark, sf_dir):
    """Near-duplicate benchmark decontamination pairs
    (operators/decontam.fuzzy_contamination — the MinHash-LSH twin of
    the registered exact-n-gram ``decontam`` row): (doc_id, bench_id,
    jaccard) for every corpus doc whose shingle Jaccard with a
    benchmark doc reaches the threshold, candidates by band collision
    (the oracle mirrors the banded recall contract exactly, the
    ``minhash_pairs`` convention).  Benchmark items are corpus docs
    with the last 3 tokens dropped, so every planted item is a fuzzy
    (not exact) match of its source doc."""
    from pyspark.sql import functions as F2

    from ia_hadoop_tools_spark.driver_queries import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_PERMS,
        SHINGLE_WORDS,
    )
    from ia_hadoop_tools_spark.functions.textfns import tokens
    from ia_hadoop_tools_spark.operators.decontam import fuzzy_contamination
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = tokens(F2.col("text"))
    bench = docs.filter(F2.col("doc_id") % 10 == FUZZY_BENCH_MOD).select(
        F2.col("doc_id").alias("bench_id"),
        F2.concat_ws(
            " ",
            F2.slice(
                toks,
                1,
                F2.greatest(
                    F2.size(toks) - FUZZY_BENCH_DROP, F2.lit(SHINGLE_WORDS)
                ),
            ),
        ).alias("text"),
    )
    return fuzzy_contamination(
        docs,
        bench,
        num_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        shingle_words=SHINGLE_WORDS,
        threshold=JACCARD_THRESHOLD,
    )


def _sql_decontam_fuzzy() -> str:
    """The minhash_pairs oracle machinery applied CROSS-CORPUS: corpus
    and benchmark each build shingles -> hashed minhash signatures ->
    band buckets from the SAME fixed permutation table; candidates are
    bucket collisions; verification is true Jaccard over the distinct
    shingle lists.  Composes driver_queries SQL fragments, so it builds
    lazily inside _build_pending_oracles."""
    from ia_hadoop_tools_spark.driver_queries import (
        _TOKS_SQL,
        JACCARD_THRESHOLD,
        MINHASH_PERMS,
        MINHASH_ROWS,
        SHINGLE_WORDS,
    )
    from ia_hadoop_tools_spark.functions.hashfns import (
        MERSENNE_P,
        hash32_sql,
        minhash_permutations,
    )

    perms = minhash_permutations(MINHASH_PERMS)
    vals = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(perms))
    h = hash32_sql("sv")
    sw = SHINGLE_WORDS

    def _sig_block(src: str, idc: str) -> str:
        # shingles -> hashes -> per-(id, permutation) min: the
        # _minhash_sigs_sql shape with a parameterized source CTE
        return f"""
{src}sh AS (
  SELECT {idc}, list_distinct(list_transform(
    range(1, len(ts) - {sw} + 2),
    i -> array_to_string(list_slice(ts, CAST(i AS INT), CAST(i + {sw - 1} AS INT)), ' ')
  )) AS shingles
  FROM {src}tok WHERE len(ts) >= {sw}
),
{src}sig AS (
  SELECT {idc}, CAST(p.j AS INTEGER) AS j,
         min((p.a * (h % {MERSENNE_P}) + p.b) % {MERSENNE_P}) AS sigv
  FROM (SELECT {idc}, {h} AS h FROM
          (SELECT {idc}, unnest(shingles) AS sv FROM {src}sh))
  CROSS JOIN (VALUES {vals}) AS p(j, a, b)
  GROUP BY {idc}, p.j
),
{src}band AS (
  SELECT {idc},
         CAST(j // {MINHASH_ROWS} AS VARCHAR) || '_' ||
         string_agg(CAST(sigv AS VARCHAR), '_' ORDER BY j) AS bucket
  FROM {src}sig GROUP BY {idc}, j // {MINHASH_ROWS}
)"""

    jac = (
        "round(CAST(len(list_intersect(cs.shingles, bs.shingles)) AS DOUBLE)"
        " / CAST(len(cs.shingles) + len(bs.shingles)"
        " - len(list_intersect(cs.shingles, bs.shingles)) AS DOUBLE), 6)"
    )
    return f"""
WITH ctok AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(
           list_slice(ts, 1, greatest(len(ts) - {FUZZY_BENCH_DROP}, {sw})),
           ' ') AS text
  FROM ctok WHERE doc_id % 10 = {FUZZY_BENCH_MOD}
),
btok AS (SELECT bench_id, {_TOKS_SQL} AS ts FROM bench),
{_sig_block('c', 'doc_id').lstrip()},
{_sig_block('b', 'bench_id').lstrip()},
cand AS (
  SELECT DISTINCT c.doc_id, b.bench_id
  FROM cband c JOIN bband b ON c.bucket = b.bucket
)
SELECT doc_id, bench_id, jaccard FROM (
  SELECT cand.doc_id, cand.bench_id, {jac} AS jaccard
  FROM cand
  JOIN csh cs ON cs.doc_id = cand.doc_id
  JOIN bsh bs ON bs.bench_id = cand.bench_id
)
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


#: the repeat_ngrams row's geometry (the operator defaults): Gopher's
#: top-n-gram n = 2..4 and dup-n-gram n = 5..10 character fractions
REPEAT_TOP_NS = (2, 3, 4)
REPEAT_DUP_NS = (5, 6, 7, 8, 9, 10)


def q_repeat_ngrams(spark, sf_dir):
    """Gopher character-fraction repetition signals
    (operators/quality.ngram_repetition_stats): top_{2,3,4}gram_char_frac
    and dup_{5..10}gram_char_frac per doc — the repetition-table half
    the registered ``quality_rules`` row does not cover."""
    from ia_hadoop_tools_spark.operators.quality import (
        ngram_repetition_stats,
    )
    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return ngram_repetition_stats(
        docs, top_ns=REPEAT_TOP_NS, dup_ns=REPEAT_DUP_NS
    )


def _sql_repeat_ngrams() -> str:
    from ia_hadoop_tools_spark.driver_queries import _TOKS_SQL

    ns = sorted(set(REPEAT_TOP_NS) | set(REPEAT_DUP_NS))
    per_n = "\n    UNION ALL\n".join(
        f"""    SELECT doc_id, {n} AS n,
           array_to_string(list_slice(ts, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' ') AS g
    FROM tok, UNNEST(range(1, len(ts) - {n} + 2)) AS u(i)
    WHERE len(ts) >= {n}"""
        for n in ns
    )
    tops = ",\n    ".join(
        f"max(CASE WHEN n = {n} THEN c * length(g) END) AS top{n}"
        for n in REPEAT_TOP_NS
    )
    dups = ",\n    ".join(
        f"sum(CASE WHEN n = {n} AND c > 1 THEN c * length(g) ELSE 0 END) AS dup{n}"
        for n in REPEAT_DUP_NS
    )
    sel_tops = ",\n  ".join(
        f"round(least(CAST(coalesce(top{n}, 0) AS DOUBLE)"
        f" / CAST(greatest(total, 1) AS DOUBLE), 1.0), 6)"
        f" AS top_{n}gram_char_frac"
        for n in REPEAT_TOP_NS
    )
    sel_dups = ",\n  ".join(
        f"round(least(CAST(coalesce(dup{n}, 0) AS DOUBLE)"
        f" / CAST(greatest(total, 1) AS DOUBLE), 1.0), 6)"
        f" AS dup_{n}gram_char_frac"
        for n in REPEAT_DUP_NS
    )
    return f"""
WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
base AS (
  SELECT doc_id, length(array_to_string(ts, ' ')) AS total FROM tok),
grams AS (
  SELECT doc_id, n, g, count(*) AS c FROM (
{per_n}
  ) GROUP BY doc_id, n, g
),
agg AS (
  SELECT doc_id,
    {tops},
    {dups}
  FROM grams GROUP BY doc_id
)
SELECT b.doc_id,
  {sel_tops},
  {sel_dups}
FROM base b LEFT JOIN agg USING (doc_id)
"""


PENDING_QUERIES: dict = {
    "decontam_fuzzy": q_decontam_fuzzy,
    "repeat_ngrams": q_repeat_ngrams,
}


def _build_pending_oracles() -> dict:
    return {
        "decontam_fuzzy": _sql_decontam_fuzzy(),
        "repeat_ngrams": _sql_repeat_ngrams(),
    }


def __getattr__(name: str):
    # lazy (the corpus_queries pattern): both oracles compose
    # driver_queries fragments, and driver_queries must stay importable
    # without this module loading first
    if name == "PENDING_ORACLE_SQL":
        val = _build_pending_oracles()
        globals()["PENDING_ORACLE_SQL"] = val
        return val
    raise AttributeError(name)
