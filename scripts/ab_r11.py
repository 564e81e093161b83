#!/usr/bin/env python
"""Round-11 interleaved A/B harness: times OLD (round-10) vs NEW (round-11)
implementations of the rewritten operators in ONE Spark session with
alternating reps (A,B,A,B,...), so JVM warmup and host-load drift hit both
sides equally.  The OLD implementations are inlined below verbatim from
git d52bf56 (the round-10 freeze); the NEW ones come from the package.

Usage: python scripts/ab_r11.py [pairs] [case ...]
Cases: lm_score lm_buckets shingles spans bpe
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- OLD implementations (verbatim shapes from d52bf56) ---------------------

def old_char_bigrams(df, keep_cols, text_col):
    t = F.lower(F.col(text_col))
    return (
        df.filter(F.length(t) >= 2)
        .select(
            *keep_cols,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: F.struct(
                        F.substring(t, i, 1).alias("ctx"),
                        F.substring(t, i + 1, 1).alias("nxt"),
                    ),
                )
            ).alias("__s"),
        )
        .select(*keep_cols, "__s.ctx", "__s.nxt")
    )


def old_char_shingles(col, k=5):
    c = F.lower(col)
    n = F.length(c)
    gen = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)), lambda i: c.substr(i, F.lit(k))
    )
    return F.when(n >= k, gen).otherwise(F.array().cast("array<string>"))


def old_word_shingles(col, n=3):
    from ia_hadoop_tools_spark.functions.textfns import tokens

    t = tokens(col)
    cnt = F.size(t)
    gen = F.transform(
        F.sequence(F.lit(1), cnt - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.when(cnt >= n, gen).otherwise(F.array().cast("array<string>"))


def old_dup_window_grams(base, id_col, n, use_hash):
    return (
        base.filter(F.col("__nt") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nt") - n),
                    lambda i: F.lower(
                        F.concat_ws(" ", F.slice("__toks", i + 1, n))
                    ),
                )
            ).alias("pos", "__g"),
        )
        .select(
            id_col,
            "pos",
            (F.xxhash64("__g") if use_hash else F.col("__g")).alias("__h"),
        )
    )


def main() -> None:
    args = sys.argv[1:]
    pairs = 4
    cases = []
    for a in args:
        if a.isdigit():
            pairs = int(a)
        else:
            cases.append(a)
    if not cases:
        cases = ["lm_score", "lm_buckets", "shingles", "spans", "bpe"]

    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    docs.limit(5).collect()  # warm listing

    import ia_hadoop_tools_spark.operators.lm_quality as lmq
    import ia_hadoop_tools_spark.operators.spans as spans_mod
    import ia_hadoop_tools_spark.operators.textops as textops_mod
    import ia_hadoop_tools_spark.functions.textfns as textfns_mod

    new_char_bigrams = lmq._char_bigrams
    new_char_shingles = textfns_mod.char_shingles
    new_word_shingles = textfns_mod.word_shingles

    def run(df) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def report(name, olds, news):
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{name:14s} old med={mo:7.3f} min={min(olds):7.3f} | "
            f"new med={mn:7.3f} min={min(news):7.3f} | "
            f"med ratio {mn / mo:0.3f}  (walls old={['%.2f' % w for w in olds]}, "
            f"new={['%.2f' % w for w in news]})",
            flush=True,
        )

    def ab_case(name, build_old, build_new):
        olds, news = [], []
        for _ in range(pairs):
            spark.sparkContext.setJobDescription(f"ab:{name}:old")
            olds.append(run(build_old()))
            spark.sparkContext.setJobDescription(f"ab:{name}:new")
            news.append(run(build_new()))
        report(name, olds, news)

    from ia_hadoop_tools_spark.driver_queries import QUERIES

    if "lm_score" in cases or "lm_buckets" in cases:
        for qname in ("lm_score", "lm_buckets"):
            if qname not in cases:
                continue

            def build_old(q=qname):
                lmq._char_bigrams = old_char_bigrams
                try:
                    return QUERIES[q](spark, SF_DIR)
                finally:
                    lmq._char_bigrams = new_char_bigrams

            def build_new(q=qname):
                return QUERIES[q](spark, SF_DIR)

            ab_case(qname, build_old, build_new)

    if "shingles" in cases:
        # minhash_pairs exercises word_shingles via shingle_sets twice
        # (signatures + verification); fingerprint exercises char_shingles
        def set_old():
            textops_mod.word_shingles = old_word_shingles
            textfns_mod.char_shingles = old_char_shingles
            textfns_mod.word_shingles = old_word_shingles

        def set_new():
            textops_mod.word_shingles = new_word_shingles
            textfns_mod.char_shingles = new_char_shingles
            textfns_mod.word_shingles = new_word_shingles

        for qname in ("minhash_sigs", "minhash_pairs", "fingerprint"):

            def build_old(q=qname):
                set_old()
                try:
                    return QUERIES[q](spark, SF_DIR)
                finally:
                    set_new()

            def build_new(q=qname):
                return QUERIES[q](spark, SF_DIR)

            ab_case(qname, build_old, build_new)

    if "spans" in cases:
        new_dup_windows = spans_mod._dup_windows

        def old_dup_windows(base, id_col, n, min_count, use_hash):
            from pyspark import StorageLevel

            grams = old_dup_window_grams(base, id_col, n, use_hash).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            dup = (
                grams.groupBy("__h")
                .agg(F.count("*").alias("__c"))
                .filter(F.col("__c") >= min_count)
                .select("__h")
            )
            out = grams.join(dup, "__h").select(id_col, "pos")
            out.gram_cache = grams
            return out

        for qname in ("span_stats", "span_dedup"):

            def build_old(q=qname):
                spans_mod._dup_windows = old_dup_windows
                try:
                    return QUERIES[q](spark, SF_DIR)
                finally:
                    spans_mod._dup_windows = new_dup_windows

            def build_new(q=qname):
                return QUERIES[q](spark, SF_DIR)

            ab_case(qname, build_old, build_new)

    if "bpe" in cases:
        # the bpe change is a job-count change inside the driver loop; time
        # the full registry row (both trainers) and count jobs via the
        # status tracker
        import ia_hadoop_tools_spark.operators.bpe as bpe_mod

        def count_jobs():
            st = spark.sparkContext.statusTracker()
            return len(st.getJobIdsForGroup(None) or [])

        def run_bpe() -> float:
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES["bpe_strict_batch"](spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.time() - t0

        news = [run_bpe() for _ in range(pairs)]
        print(
            f"bpe_strict_batch NEW walls={['%.2f' % w for w in news]} "
            f"med={statistics.median(news):.3f}",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
