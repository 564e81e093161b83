"""Unigram-LM tokenizer (operators/unigram.py): kernel semantics,
trainer-vs-plain-Python-mirror exactness, Viterbi optimality vs brute
force, partitioning invariance, and composition with packing."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.unigram import (
    expected_piece_counts,
    model_to_micro,
    train_unigram_lm,
    unigram_token_counts,
    unk_micro,
    viterbi_pieces,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


# ------------------------------------------------------------ kernels


def test_viterbi_prefers_high_probability_pieces():
    model = model_to_micro({"ab": -1.0, "a": -3.0, "b": -3.0, "c": -3.0})
    assert viterbi_pieces("abc", model, 8) == ["ab", "c"]
    # one big piece beats two smalls when its score wins
    model2 = model_to_micro({"abc": -2.0, "ab": -1.0, "c": -3.0, "a": -3.0, "b": -3.0})
    assert viterbi_pieces("abc", model2, 8) == ["abc"]


def test_viterbi_tie_rule_fewer_then_longer_last():
    # scores engineered so "ab"+"c" ties "a"+"bc" exactly; fewer-pieces
    # can't break it (both 2) so the longer LAST piece (smaller split
    # point) must win -> ["a", "bc"]
    model = model_to_micro({"ab": -1.0, "c": -2.0, "a": -2.0, "bc": -1.0, "b": -9.0})
    assert viterbi_pieces("abc", model, 8) == ["a", "bc"]
    # fewer pieces beats more at equal score
    model2 = model_to_micro({"abcd": -4.0, "ab": -2.0, "cd": -2.0})
    assert viterbi_pieces("abcd", model2, 8) == ["abcd"]


def test_viterbi_matches_bruteforce_on_random_models():
    rng = random.Random(5)
    alphabet = "abc"
    for _ in range(60):
        pieces = {"a", "b", "c"}
        for ln in (2, 3):
            for _k in range(3):
                i = rng.randrange(0, 4 - ln + 1)
                pieces.add("".join(rng.choice(alphabet) for _ in range(ln)))
        model = {p: round(rng.uniform(-6, -0.5), 6) for p in pieces}
        micro = model_to_micro(model)
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        got = viterbi_pieces(word, micro, 8)
        assert "".join(got) == word
        # brute force best score over all segmentations
        def segs(w):
            if not w:
                yield []
                return
            for ln in range(1, len(w) + 1):
                head, rest = w[:ln], w[ln:]
                if head in micro or ln == 1:
                    for tail in segs(rest):
                        yield [head] + tail
        unk = unk_micro(micro)
        def score(seg):
            return sum(micro.get(p, unk) for p in seg)
        best = max(score(s) for s in segs(word))
        assert score(got) == best


def test_expected_counts_sum_to_expected_length():
    """FB sanity: for a word fully covered by the model, the expected
    piece counts weighted by piece length must sum to the word length
    (every character is covered by exactly one piece per path)."""
    model = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -2.5, "bc": -1.5}
    e = expected_piece_counts("abcab", model, 8)
    covered = sum(len(p) * x for p, x in e.items())
    assert covered == pytest.approx(5.0, rel=1e-9)


def test_unknown_chars_take_unk_path():
    model = model_to_micro({"a": -1.0})
    assert viterbi_pieces("aXa", model, 8) == ["a", "X", "a"]
    e = expected_piece_counts("aXa", {"a": -1.0}, 8)
    assert set(e) == {"a"} and e["a"] == pytest.approx(2.0)


# ------------------------------------------------- trainer mirror


def _py_train(texts, vocab_size, max_piece_len=8, max_word_len=16,
              em_iters=2, seed_multiplier=4):
    """From-scratch plain-Python mirror of train_unigram_lm: same
    harvesting, same micro rounding, same prune + renormalize — shares
    ONLY the per-word kernel (the same sharing the executors get)."""
    chunks: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            for k in range(0, len(w), max_word_len):
                c = w[k : k + max_word_len]
                chunks[c] = chunks.get(c, 0) + 1
    cand: dict[str, int] = {}
    for w, wc in chunks.items():
        for ln in range(1, max_piece_len + 1):
            for i in range(0, len(w) - ln + 1):
                p = w[i : i + ln]
                cand[p] = cand.get(p, 0) + wc
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: vocab_size * seed_multiplier]
    kept = dict(singles)
    kept.update(dict(multi))
    total = sum(kept.values()) or 1
    model = {p: math.log(c / total) for p, c in kept.items()}

    def e_sums(m):
        sums: dict[str, int] = {}
        for w, wc in chunks.items():
            for p, e in expected_piece_counts(w, m, max_piece_len).items():
                sums[p] = sums.get(p, 0) + round(e * wc * 1e6)
        return sums

    for _ in range(em_iters):
        sums = e_sums(model)
        z = sum(sums.values()) or 1
        model = {p: math.log(m / z) for p, m in sums.items() if m > 0}
        floor = (min(model.values()) if model else 0.0) - 1.0
        for p in singles:
            model.setdefault(p, floor)
    sums = e_sums(model)
    keep = set(singles)
    room = max(0, vocab_size - len(keep))
    ranked = sorted(
        ((p, m) for p, m in sums.items() if p not in keep),
        key=lambda t: (-t[1], t[0]),
    )
    keep |= {p for p, _ in ranked[:room]}
    mass = {p: sums.get(p, 0) for p in keep}
    z = sum(mass.values())
    return {
        p: round(math.log(max(m, 1) / max(z, 1)), 6)
        for p, m in sorted(mass.items())
    }


def test_trainer_matches_python_mirror_exactly(spark):
    rng = random.Random(11)
    vocab = ["spark", "scan", "scanner", "sparking", "merge", "merged", "table"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(8)) for _ in range(40)
    ]
    got = {
        r["piece"]: r["logp"]
        for r in train_unigram_lm(
            _docs(spark, texts), vocab_size=24, em_iters=2
        ).collect()
    }
    want = _py_train(texts, vocab_size=24, em_iters=2)
    assert got == want  # EXACT — micro-LONG aggregation, shared kernel


def test_trainer_invariant_under_partitioning(spark):
    texts = [f"alpha beta{i % 5} gamma delta" for i in range(60)]
    a = {
        r["piece"]: r["logp"]
        for r in train_unigram_lm(_docs(spark, texts), vocab_size=16).collect()
    }
    b = {
        r["piece"]: r["logp"]
        for r in train_unigram_lm(
            _docs(spark, texts).repartition(13), vocab_size=16
        ).collect()
    }
    assert a == b


def test_singles_always_survive_so_everything_segments(spark):
    texts = ["xyzzy qwerty", "mixed UP case", "a b c"]
    model = train_unigram_lm(_docs(spark, texts), vocab_size=4)
    counts = unigram_token_counts(_docs(spark, texts), model).collect()
    assert len(counts) == 3
    assert all(r["n_tokens"] >= r["n_words"] >= 1 for r in counts)


# ----------------------------------------------------- token counts


def test_token_counts_dictionary_path_matches_direct_viterbi(spark):
    texts = ["spark spark merge", "merge table spark", ""]
    model = {"spark": -1.0, "mer": -1.5, "ge": -1.5, "table": -1.2}
    for ch in set("".join(texts).replace(" ", "")):
        model.setdefault(ch, -5.0)
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in unigram_token_counts(_docs(spark, texts), model).collect()
    }
    micro = model_to_micro(model)
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            assert i not in out  # empty doc yields no row (bpe rule)
            continue
        want = sum(len(viterbi_pieces(w, micro, 8)) for w in ws)
        assert out[i] == (len(ws), want)


def test_long_words_chunk_without_dropping_text(spark):
    word = "abcdefghijklmnopqrstuvwxyz" * 2  # 52 chars -> 16/16/16/4
    model = {ch: -3.0 for ch in "abcdefghijklmnopqrstuvwxyz"}
    out = unigram_token_counts(
        _docs(spark, [word]), model, max_word_len=16
    ).collect()[0]
    assert out["n_words"] == 4  # chunks
    assert out["n_tokens"] == 52  # every char a single -> none dropped


def test_packs_with_token_budget(spark):
    from ia_hadoop_tools_spark.operators.sampling import pack_sequences

    texts = [f"doc number {i} spark merge table scan" for i in range(20)]
    model = train_unigram_lm(_docs(spark, texts), vocab_size=32)
    counted = unigram_token_counts(_docs(spark, texts), model)
    packed = pack_sequences(counted, budget=32, token_col="n_tokens")
    assert packed.count() == 20
    assert "bin" in packed.columns


def test_param_validation(spark):
    d = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="max_piece_len"):
        train_unigram_lm(d, max_piece_len=20, max_word_len=16)
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_lm(d, vocab_size=0)
    with pytest.raises(ValueError, match="em_iters"):
        train_unigram_lm(d, em_iters=0)


# ----------------------------------------------------------- encode


def test_unigram_encode_preserves_document_order(spark):
    from ia_hadoop_tools_spark.operators.unigram import unigram_encode

    model = {"spark": -1.0, "mer": -1.5, "ge": -1.5}
    for ch in "sparkmget able":
        model.setdefault(ch, -5.0)
    texts = ["merge spark merge", "spark", "", "   "]
    out = {
        r["doc_id"]: r["tokens"]
        for r in unigram_encode(_docs(spark, texts), model).collect()
    }
    micro = model_to_micro(model)
    for i, t in enumerate(texts):
        want = [
            p for w in t.split() for p in viterbi_pieces(w, micro, 8)
        ]
        assert out[i] == want, (i, t)
    assert out[2] == [] and out[3] == []  # empty docs: empty array


def test_unigram_encode_concatenation_invariant(spark):
    """join(tokens) with spaces removed must equal the original text's
    non-space characters — no text dropped or duplicated, any order."""
    from ia_hadoop_tools_spark.operators.unigram import unigram_encode

    rng = random.Random(3)
    texts = [
        " ".join(
            "".join(rng.choice("abcxyz") for _ in range(rng.randint(1, 24)))
            for _ in range(rng.randint(1, 6))
        )
        for _ in range(25)
    ]
    model = {ch: -3.0 for ch in "abcxyz"}
    model["ab"] = -1.0
    out = {
        r["doc_id"]: r["tokens"]
        for r in unigram_encode(_docs(spark, texts), model).collect()
    }
    for i, t in enumerate(texts):
        assert "".join(out[i]) == t.replace(" ", "")
