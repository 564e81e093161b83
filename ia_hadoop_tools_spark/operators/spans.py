"""Exact substring (token n-gram span) dedup for training corpora.

Corpus-level exact substring dedup in the spirit of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"): a token
window of ``n`` consecutive tokens that occurs >= ``min_count`` times
ANYWHERE in the corpus (across or within documents) marks every token it
covers as duplicated. ``span_dedup_stats`` reports per-document coverage;
``span_dedup`` rewrites documents with the covered tokens removed.

Not in the reference (its dedup is per-CDX-key, SURVEY §2.6) — this is the
training-data-pipeline extension, built like the MinHash family in
``operators/textops.py``.

Semantics note vs Lee et al.: they keep ONE occurrence of each duplicated
substring (requires a global total order over occurrences); we drop ALL
covered tokens, which is the common streaming-corpus simplification and is
order-independent — the output does not depend on partitioning or input
order, which keeps the operator deterministic and oracle-checkable.

Scale shape (100 TB of documents):
- Window hashing is a narrow codegen projection (``transform`` over a
  ``sequence`` + ``xxhash64``) — no Python, no shuffle, no window text
  materialized beyond the hash input.
- The only wide exchanges are (1) the hash-count aggregation over skinny
  ``(hash)`` rows with map-side combine and (2) the join of window rows
  against the surviving duplicate hashes — cost proportional to the number
  of DUPLICATE windows, never all-pairs.
- The rewrite is a per-doc hybrid: lightly-covered docs (the common case)
  filter the token array in place with an index-aware lambda — tokens never
  explode; heavily-covered docs (over ``inplace_cov_limit`` positions)
  switch to a positions anti-join + ordered re-aggregation, keeping the
  worst case (a fully-duplicated long doc) ~linear instead of quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.textops import ensure_min_partitions


def _tokens(text_col: str):
    """ORIGINAL-case whitespace tokens; NULL text tokenizes as empty (a
    null array would otherwise propagate NULL n_tokens/removed_tokens
    through every stat). Case-folding happens at window-KEY time only —
    matching is case-insensitive, but the rewrite must not lowercase the
    surviving corpus."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )


def _dup_windows(
    base: DataFrame, id_col: str, n: int, min_count: int, use_hash: bool
) -> DataFrame:
    """(id, pos) of every n-token window whose corpus count >= min_count.

    ``base`` must carry ``__toks`` / ``__nt``. With ``use_hash`` the join
    key is ``xxhash64`` of the window text (the 100 TB path — collisions
    are ~2^-64 per pair); without it the window string itself (exact, used
    by tests to pin hash-vs-string equivalence).
    """
    # ROUND-11 OPTIMIZATION (the langid _char_ngram_rows idiom): the old
    # ``posexplode(transform(sequence(0, nt-n), i -> lower(concat_ws(' ',
    # slice(__toks, i+1, n)))))`` ran the window builder on Catalyst's
    # INTERPRETED HigherOrderFunction path, one lambda eval + slice copy
    # per window.  Zipping n shifted slice views and emitting the struct
    # through Generate keeps the whole window key (lower(concat_ws))
    # in whole-stage codegen; positions and key values are identical
    # (posexplode index == the old sequence index).
    m = F.col("__nt") - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice("__toks", i + 1, m).alias(str(i)) for i in range(n)]
    )
    key = F.lower(
        # lower() HERE (window key only): duplicate detection is
        # case-insensitive, the kept tokens keep their case
        F.concat_ws(" ", *[F.col("__z").getField(str(i)) for i in range(n)])
    )
    grams = (
        base.filter(F.col("__nt") >= n)
        .select(id_col, F.posexplode(zipped).alias("pos", "__z"))
        .select(
            id_col,
            "pos",
            (F.xxhash64(key) if use_hash else key).alias("__h"),
        )
    )
    # grams feeds BOTH the count aggregate and the join below — without a
    # persist the corpus-wide tokenize + window-hash projection runs twice
    # (different exchange children, Catalyst does not reuse them); same
    # discipline as novel_docs' shingle persist (textops.py)
    from pyspark import StorageLevel

    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        grams.groupBy("__h")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__h")
    )
    out = grams.join(dup, "__h").select(id_col, "pos")
    # release handle (the shingle_cache convention): loop callers
    # unpersist via the consumer's span_caches tuple
    out.gram_cache = grams
    return out


def span_dedup_stats(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    use_hash: bool = True,
) -> DataFrame:
    """Per-doc duplicated-span coverage: ``n_tokens``, ``dup_ngrams``
    (duplicate windows in the doc), ``covered_tokens`` (distinct token
    positions under any duplicate window), ``coverage`` (fraction).

    Every input doc gets a row (zeroes when nothing is duplicated).
    """
    from pyspark import StorageLevel

    base = (
        # spread the CPU-bound window-hash projection across executor slots
        # (a one-row-group input would otherwise hash on a single core)
        ensure_min_partitions(df.select(F.col(id_col), _tokens(text_col).alias("__toks")))
        .withColumn("__nt", F.size("__toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # grams side + stats join
    )
    dw = _dup_windows(base, id_col, n, min_count, use_hash)
    # ROUND-11 OPTIMIZATION (guide §2.3/§2.4 — aggregate before you
    # shuffle, and don't shuffle rows you can compute away): the old
    # covered_tokens path exploded every window into its n positions and
    # ran distinct().groupBy() — two corpus-wide exchanges over n x
    # dup_windows rows, on top of a separate count aggregation for
    # dup_ngrams (dw consumed twice, so the grams-join subtree executed
    # twice). The window positions of ONE doc are unique and sorted-able,
    # and all windows have equal length n, so the size of the interval
    # union is n + sum over consecutive sorted positions of
    # min(n, p_i - p_{i-1}) — computable per doc from the collected
    # position list in ONE aggregation that also yields dup_ngrams.
    # 3 exchanges -> 1, and dw (with its upstream join) runs once.
    ps = F.sort_array(F.collect_list("pos"))
    covered = F.when(
        F.size(ps) == 0, F.lit(0)
    ).otherwise(
        F.aggregate(
            ps,
            F.struct(
                F.lit(-n).alias("prev"), F.lit(0).alias("tot")
            ),
            lambda acc, p: F.struct(
                p.alias("prev"),
                (acc["tot"] + F.least(F.lit(n), p - acc["prev"])).alias(
                    "tot"
                ),
            ),
            lambda acc: acc["tot"],
        )
    )
    stats = dw.groupBy(id_col).agg(
        F.count("*").alias("dup_ngrams"),
        covered.cast("long").alias("covered_tokens"),
    )
    out = (
        # long n_tokens: size() is int32, counts are int64 — keep the stat
        # columns uniformly 64-bit
        base.select(id_col, F.col("__nt").cast("long").alias("n_tokens"))
        .join(stats, id_col, "left")
        .fillna(0, ["dup_ngrams", "covered_tokens"])
        .withColumn(
            "coverage",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("covered_tokens")
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    # release handles for per-batch loop callers (ADVICE r4): unpersist
    # both frames once the result is consumed, like textops.shingle_cache
    out.span_caches = (base, dw.gram_cache)
    return out


def span_dedup(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    use_hash: bool = True,
    inplace_cov_limit: int = 256,
) -> DataFrame:
    """Rewrite: drop every token covered by a duplicated window.

    Output: ``(id, clean_text, n_tokens, removed_tokens)`` — one row per
    input doc; ``clean_text`` is the space-rejoin of the surviving tokens
    (empty string when the whole doc is duplicated).

    Cost shape — the rewrite is a per-doc HYBRID on covered-set size:

    - ``<= inplace_cov_limit`` covered positions (the overwhelmingly common
      case): in-place codegen array filter, the token array never explodes;
      cost O(n_tokens * |covered|) with a small bounded |covered|.
    - ``> inplace_cov_limit``: positions anti-join — tokens posexplode once,
      left-anti against the covered (id, position) rows, re-aggregate in
      position order. Linear in tokens, so a FULLY duplicated long document
      costs O(n_tokens log n_tokens) instead of the in-place filter's
      O(n_tokens^2).

    Both branches compute identical output (the split is purely physical);
    each doc takes exactly one branch of the union.
    """
    from pyspark import StorageLevel

    base = (
        # spread the CPU-bound window-hash projection across executor slots
        # (a one-row-group input would otherwise hash on a single core)
        ensure_min_partitions(df.select(F.col(id_col), _tokens(text_col).alias("__toks")))
        .withColumn("__nt", F.size("__toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # grams side + rewrite join
    )
    dw = _dup_windows(base, id_col, n, min_count, use_hash)
    # one skinny array of covered indices per affected doc
    cov = (
        dw.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias(
                "__ti"
            ),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__ti").alias("__cov"))
    )
    joined = base.join(cov, id_col, "left")
    ncov = F.coalesce(F.size("__cov"), F.lit(0))

    # --- light branch: in-place filter over the token array ---
    light = joined.filter(ncov <= inplace_cov_limit)
    kept = F.filter(
        "__toks",
        lambda t, i: ~F.array_contains(
            F.coalesce(F.col("__cov"), F.array().cast("array<int>")), i
        ),
    )
    light_out = light.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        F.col("__nt").cast("long").alias("n_tokens"),
        (F.col("__nt") - F.size(kept)).cast("long").alias("removed_tokens"),
    )

    # --- heavy branch: posexplode -> anti-join on (id, position) -> regroup
    heavy = joined.filter(ncov > inplace_cov_limit)
    htoks = heavy.select(
        F.col(id_col), F.posexplode("__toks").alias("__ti", "__tok")
    )
    hcov = heavy.select(F.col(id_col), F.explode("__cov").alias("__ti"))
    surviving = htoks.join(hcov, [id_col, "__ti"], "left_anti")
    regrouped = surviving.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ti", "__tok"))),
                lambda x: x["__tok"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("__nk"),
    )
    heavy_out = (
        heavy.select(F.col(id_col), "__nt")
        .join(regrouped, id_col, "left")
        .select(
            id_col,
            # a fully-covered doc survives with zero tokens -> empty string
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("__nt").cast("long").alias("n_tokens"),
            (F.col("__nt") - F.coalesce("__nk", F.lit(0))).cast("long").alias(
                "removed_tokens"
            ),
        )
    )
    out = light_out.unionByName(heavy_out)
    # release handles for per-batch loop callers (ADVICE r4)
    out.span_caches = (base, dw.gram_cache)
    return out
