"""Bloom-filter join pruning (plans/bloom.py) and BPE tokenizer prep
(operators/bpe.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.bpe import (
    bpe_pair_counts,
    bpe_train,
    word_vocab,
)
from ia_hadoop_tools_spark.plans.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


def _load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# bloom


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    build = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = bloom_semi_join(li, build, "l_orderkey", "o_orderkey")
    want = li.join(
        build.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    a = sorted(map(tuple, got.select("l_orderkey", "l_linenumber").collect()))
    b = sorted(map(tuple, want.select("l_orderkey", "l_linenumber").collect()))
    assert a == b and len(a) > 0


def test_bloom_mask_constant_size_and_superset(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    build = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    num_bits = 1 << 16  # deliberately small so false positives exist
    mask = bloom_build(build, "o_orderkey", num_bits=num_bits)
    assert len(mask) == num_bits // 8  # driver state constant in row count

    pruned = bloom_prune(li, "l_orderkey", mask)
    exact = li.join(
        build.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    n_pruned, n_exact, n_total = pruned.count(), exact.count(), li.count()
    assert n_exact <= n_pruned < n_total  # superset, but actually pruning


def test_bloom_prebuilt_mask_reuse_and_fp_rate(spark, sf_dir):
    """The cross-job path: mask built once, handed to bloom_semi_join.
    At the default 8M bits the FP rate over ~600 keys is ~0."""
    li = _load(spark, sf_dir, "lineitem")
    build = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    mask = bloom_build(build, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", mask)
    got = bloom_semi_join(
        li, build, "l_orderkey", "o_orderkey", mask=mask
    ).count()
    exact = li.join(
        build.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()
    assert got == exact
    # default-sized mask: prune alone is already essentially exact
    assert pruned.count() <= exact * 1.01 + 10


def test_bloom_empty_build_side(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    build = _load(spark, sf_dir, "orders").filter(F.lit(False))
    assert bloom_semi_join(li, build, "l_orderkey", "o_orderkey").count() == 0


def test_bloom_null_probe_keys_dropped(spark):
    probe = spark.createDataFrame(
        [(None,), (1,), (2,)], "k bigint"
    )
    build = spark.createDataFrame([(1,), (None,)], "k2 bigint")
    got = sorted(
        r["k"] for r in bloom_semi_join(probe, build, "k", "k2").collect()
    )
    assert got == [1]  # null never equi-joins, matching plain semi-join


# ---------------------------------------------------------------------------
# bpe


def _py_vocab(texts):
    c = Counter()
    for t in texts:
        for w in t.split():
            c[w] += 1
    return c


def _py_pair_counts(vocab):
    pc = Counter()
    for w, wc in vocab.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += wc
    return pc


def _py_bpe_train(texts, num_merges):
    """Pure-Python reference trainer: same tie-break (count desc, then
    pair lexicographic) and left-to-right non-overlapping merge."""
    vocab = {tuple(w): c for w, c in _py_vocab(texts).items()}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        new_vocab = {}
        for syms, wc in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + wc
        vocab = new_vocab
    return merges


def test_word_vocab_and_pair_counts_match_python(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").limit(50)
    texts = [r["text"] for r in docs.select("text").collect()]

    vocab_got = {
        r["w"]: r["wc"] for r in word_vocab(docs, "text").collect()
    }
    assert vocab_got == dict(_py_vocab(texts))

    pairs_got = {
        r["pair"]: r["n"] for r in bpe_pair_counts(docs, "text").collect()
    }
    assert pairs_got == dict(_py_pair_counts(_py_vocab(texts)))


def test_bpe_min_count_filter(spark):
    docs = spark.createDataFrame([("ab ab xy",)], "text string")
    got = {
        r["pair"]: r["n"]
        for r in bpe_pair_counts(docs, "text", min_count=2).collect()
    }
    assert got == {"ab": 2}


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents").limit(30)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, "text", num_merges=6, materialize_every=3)
    want = _py_bpe_train(texts, 6)
    assert got == want
    assert len(got) == 6


def test_bpe_merge_left_to_right_non_overlapping(spark):
    # "bbb" under merge (b,b): leftmost wins -> [bb, b], not [b, bb]
    docs = spark.createDataFrame([("bbb bbb bb",)], "text string")
    merges = bpe_train(docs, "text", num_merges=2)
    assert merges[0][:2] == ("b", "b")
    want = _py_bpe_train(["bbb bbb bb"], 2)
    assert merges == want
