"""SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
Regularization": the unigram language model tokenizer; Kudo &
Richardson 2018 SentencePiece).  Completes the engine's tokenizer
family: ``operators/bpe.py`` trains/applies merge rules, this module
trains a piece-probability model by EM and segments by Viterbi.

Spark-first shape (the ``bpe_train`` vocabulary trick): the corpus
reduces ONCE to distinct words with counts — vocabulary-bounded however
big the corpus — and every expensive step (candidate harvesting, EM
expectation, Viterbi costing) runs per DISTINCT word, never per
occurrence.  Per-word lattice math is plain Python over Arrow batches
(`mapInPandas`/`pandas_udf`): it is vocabulary-bounded, so the
UDF-is-the-slow-path rule does not bite — the corpus-sized work stays
in codegen (split/explode/groupBy joins).

Determinism contract (the engine's micro-nat discipline): per-word
expectation/Viterbi kernels are pure module-level Python functions
(:func:`expected_piece_counts`, :func:`viterbi_pieces`) shared verbatim
by the distributed path, the plain-Python test mirror, and the
documented tie rules; every cross-partition aggregate is an exact LONG
(expected counts round to micro-units per word BEFORE the shuffle), so
training and encoding are bit-identical at any parallelism.  Lattices
are bounded by chunking words at ``max_word_len`` (no text dropped —
long words split into fixed-width chunks segmented independently),
which also makes the SQL oracle's fixed-depth DP possible.

Simplification vs the reference algorithm, documented: pruning between
EM rounds keeps the highest EXPECTED-COUNT pieces (singles always
survive) rather than re-segmenting to measure each piece's likelihood
loss — the standard cheap approximation; the EM itself is the real
forward-backward.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT

DEFAULT_MAX_PIECE = 8
DEFAULT_MAX_WORD = 16
#: out-of-vocabulary single characters segment as their own piece at
#: this micro-nat penalty below the model's worst piece (mirrored by
#: the SQL oracle; multi-char unknown spans are never candidates)
UNK_GAP_MICRO = 10_000_000


def _check(max_piece_len: int, max_word_len: int) -> None:
    if not 1 <= max_piece_len <= max_word_len:
        raise ValueError(
            f"need 1 <= max_piece_len <= max_word_len, got "
            f"max_piece_len={max_piece_len}, max_word_len={max_word_len}"
        )


def unk_micro(model_micro: dict[str, int]) -> int:
    """The OOV single-char score for a micro-nat model dict."""
    worst = min(model_micro.values()) if model_micro else 0
    return worst - UNK_GAP_MICRO


# --------------------------------------------------------------- kernels
# Pure per-word functions — shared by the executors, the plain-Python
# test mirror, and (as the spec) the generated SQL oracle.


def expected_piece_counts(
    word: str, model: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for ONE word under a
    piece->logp model (the unigram E-step).  Unknown single chars take
    the UNK path (they contribute no model-piece counts).  Returns {}
    for words the model cannot segment at all (impossible once singles
    are retained, but kept total)."""
    n = len(word)
    if n == 0:
        return {}
    unk = (min(model.values()) if model else 0.0) - UNK_GAP_MICRO / 1e6

    def piece_lp(j: int, i: int) -> float | None:
        p = word[j:i]
        lp = model.get(p)
        if lp is None and i - j == 1:
            return unk
        return lp

    # forward (log alpha) / backward (log beta)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = neg
        for j in range(max(0, i - max_piece_len), i):
            lp = piece_lp(j, i)
            if lp is None or alpha[j] == neg:
                continue
            cand = alpha[j] + lp
            acc = cand if acc == neg else _logadd(acc, cand)
        alpha[i] = acc
    if alpha[n] == neg:
        return {}
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = neg
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            lp = piece_lp(j, i)
            if lp is None or beta[i] == neg:
                continue
            cand = lp + beta[i]
            acc = cand if acc == neg else _logadd(acc, cand)
        beta[j] = acc
    out: dict[str, float] = {}
    z = alpha[n]
    for j in range(n):
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            p = word[j:i]
            lp = model.get(p)
            if lp is None or alpha[j] == neg or beta[i] == neg:
                continue
            out[p] = out.get(p, 0.0) + math.exp(alpha[j] + lp + beta[i] - z)
    return out


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def viterbi_pieces(
    word: str, model_micro: dict[str, int], max_piece_len: int
) -> list[str]:
    """Best segmentation of ONE word under integer micro-nat scores.
    Tie rule (mirrored exactly by the SQL oracle): maximize score, then
    minimize piece count, then prefer the LONGER last piece (smaller
    split point) — applied at every DP cell, so the argmax is total.
    Unknown single chars segment as themselves at :func:`unk_micro`."""
    n = len(word)
    if n == 0:
        return []
    unk = unk_micro(model_micro)
    neg = None
    # dp[i] = (score, n_pieces, back_j) under the tie rule
    dp: list[tuple[int, int, int] | None] = [neg] * (n + 1)
    dp[0] = (0, 0, -1)
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_piece_len), i):
            if dp[j] is None:
                continue
            p = word[j:i]
            mi = model_micro.get(p)
            if mi is None:
                if i - j != 1:
                    continue
                mi = unk
            cand = (dp[j][0] + mi, dp[j][1] + 1, j)
            # maximize score, minimize pieces, minimize j (longest last)
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (cand[0] == best[0] and cand[1] == best[1] and cand[2] < best[2])
            ):
                best = cand
        dp[i] = best
    out: list[str] = []
    i = n
    while i > 0:
        j = dp[i][2]
        out.append(word[j:i])
        i = j
    return out[::-1]


def model_to_micro(model: dict[str, float]) -> dict[str, int]:
    """6-dp logp -> exact micro-nat LONGs (the engine convention)."""
    return {p: round(lp * 1e6) for p, lp in model.items()}


# ------------------------------------------------------------- operators


def _word_chunks(text_col: str, max_word_len: int):
    """array<string>: whitespace words, long words split into
    ``max_word_len``-char chunks (no text dropped — the lattice bound)."""
    # no lowercasing — the bpe.py family convention (compose with
    # textops.normalize_corpus upstream when case folding is wanted)
    words = F.filter(
        F.split(F.col(text_col), WORD_SPLIT), lambda w: w != ""
    )
    return F.flatten(
        F.transform(
            words,
            lambda w: F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.length(w) - 1) / max_word_len).cast("int"),
                ),
                lambda k: w.substr(
                    (k * max_word_len + 1).cast("int"), F.lit(max_word_len)
                ),
            ),
        )
    )


def _distinct_chunks(df: DataFrame, text_col: str, max_word_len: int):
    """(chunk ``w``, corpus occurrences ``wc``) — the vocabulary-bounded
    unit all per-word work runs on."""
    return (
        df.select(F.explode(_word_chunks(text_col, max_word_len)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def train_unigram_lm(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    max_piece_len: int = DEFAULT_MAX_PIECE,
    max_word_len: int = DEFAULT_MAX_WORD,
    em_iters: int = 2,
    seed_multiplier: int = 4,
    max_words: int = 200_000,
) -> DataFrame:
    """Train the unigram tokenizer: returns (``piece``, ``logp``) with
    ``logp`` the 6-dp ln piece probability over the final vocabulary.

    Steps: harvest the top ``vocab_size * seed_multiplier`` substrings
    (length <= ``max_piece_len``) of the top-``max_words`` distinct
    word-chunks by pooled occurrence count (single characters always
    retained, so every word stays segmentable); run ``em_iters``
    rounds of forward-backward EM where each word's fractional expected
    counts round to micro-unit LONGs BEFORE the corpus aggregation
    (exact, order-free); after the last round keep the top
    ``vocab_size`` pieces by expected count (ties piece-ascending,
    singles always kept) and renormalize.

    Driver memory holds only the candidate table (<= vocab_size *
    seed_multiplier rows) and per-round piece sums; per-word E-steps run
    in executors over Arrow batches.  Each EM round is one Spark job
    over the distinct-chunk frame (persisted once).
    """
    _check(max_piece_len, max_word_len)
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    words = (
        _distinct_chunks(df, text_col, max_word_len)
        .orderBy(F.col("wc").desc(), F.col("w").asc())
        .limit(max_words)
        .persist()
    )
    try:
        # candidate harvest: all substrings <= max_piece_len, weighted
        # by chunk count; singles kept unconditionally
        # NB: Spark's sequence(1, stop) is DESCENDING for stop < 1 (it
        # never returns empty), so the per-length generator must be
        # gated on length >= ln or short chunks emit spurious repeats
        subs = words.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(max_piece_len)),
                        lambda ln: F.when(
                            F.length("w") >= ln,
                            F.transform(
                                F.sequence(
                                    F.lit(1),
                                    (F.length("w") - ln + 1).cast("int"),
                                ),
                                lambda i: F.col("w").substr(i, ln),
                            ),
                        ).otherwise(F.array().cast("array<string>")),
                    )
                )
            ).alias("p"),
            "wc",
        ).filter(F.length("p") > 0)
        # two collects (multi-char top-K + singles) read this — persist
        # so the substring explode+aggregate runs once (review r9)
        counts = subs.groupBy("p").agg(F.sum("wc").alias("c")).persist()
        try:
            top = (
                counts.filter(F.length("p") > 1)
                .orderBy(F.col("c").desc(), F.col("p").asc())
                .limit(max(0, vocab_size * seed_multiplier))
                .collect()
            )
            singles = counts.filter(F.length("p") == 1).collect()
        finally:
            # release in a finally (the rolling_dedup sink convention):
            # a failed collect must not leak the cached frame
            counts.unpersist()
        cand = {r["p"]: int(r["c"]) for r in singles}
        for r in top:
            cand[r["p"]] = int(r["c"])
        total = sum(cand.values()) or 1
        model = {p: math.log(c / total) for p, c in cand.items()}

        spark = df.sparkSession
        for _ in range(em_iters):
            sums = _expectation_sums(words, model, max_piece_len)
            ztot = sum(sums.values()) or 1
            model = {p: math.log(m / ztot) for p, m in sums.items() if m > 0}
            # singles must survive even at zero expectation (kept at the
            # model floor) so every word remains segmentable
            floor = (min(model.values()) if model else 0.0) - 1.0
            for r in singles:
                model.setdefault(r["p"], floor)
        # final prune to vocab_size by last-round expected micro counts
        sums = _expectation_sums(words, model, max_piece_len)
        keep = {r["p"] for r in singles}
        room = max(0, vocab_size - len(keep))
        ranked = sorted(
            ((p, m) for p, m in sums.items() if p not in keep),
            key=lambda t: (-t[1], t[0]),
        )
        keep |= {p for p, _ in ranked[:room]}
        kept_mass = {p: sums.get(p, 0) for p in keep}
        ztot = sum(kept_mass.values())
        floor_c = 1  # micro-unit floor so zero-mass singles stay finite
        out = [
            (p, round(math.log(max(m, floor_c) / max(ztot, 1)), 6))
            for p, m in sorted(kept_mass.items())
        ]
        return spark.createDataFrame(out, "piece string, logp double")
    finally:
        words.unpersist()


def _expectation_sums(
    words: DataFrame, model: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One distributed E-step: per-chunk expected counts x occurrence
    count, rounded to micro LONGs per (chunk, piece) BEFORE the
    aggregate — exact at any parallelism.  Result is bounded by the
    candidate-piece count."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows_p, rows_m = [], []
            for w, wc in zip(pdf["w"], pdf["wc"]):
                for p, e in expected_piece_counts(
                    w, model, max_piece_len
                ).items():
                    rows_p.append(p)
                    rows_m.append(round(e * int(wc) * 1e6))
            yield pd.DataFrame({"p": rows_p, "m": rows_m})

    agg = (
        words.mapInPandas(gen, "p string, m long")
        .groupBy("p")
        .agg(F.sum("m").alias("m"))
        .collect()
    )
    return {r["p"]: int(r["m"]) for r in agg}


def unigram_token_counts(
    df: DataFrame,
    model: DataFrame | dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = DEFAULT_MAX_PIECE,
    max_word_len: int = DEFAULT_MAX_WORD,
) -> DataFrame:
    """(id, ``n_words``, ``n_tokens``) per document under a trained
    unigram model — the Viterbi twin of ``bpe.bpe_token_counts`` and
    the tokenizer-true input to ``pack_sequences``.

    Same dictionary shape: cost each DISTINCT word-chunk once (Viterbi
    over the bounded lattice, integer micro-nat scores, the documented
    tie rule), join costs back to the (doc, chunk, occurrences) table.
    ``n_words`` counts chunks (= words for text whose words fit
    ``max_word_len``); empty/whitespace-only docs yield no row —
    left-join if zeros matter.  ``model`` is the ``train_unigram_lm``
    frame or a plain {piece: logp} dict."""
    _check(max_piece_len, max_word_len)
    if isinstance(model, DataFrame):
        model = {r["piece"]: r["logp"] for r in model.collect()}
    micro = model_to_micro(model)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cost(ws):  # type: ignore[no-untyped-def]
        return ws.map(
            lambda w: len(viterbi_pieces(w, micro, max_piece_len))
        )

    doc_words = (
        df.select(
            F.col(id_col),
            F.explode(_word_chunks(text_col, max_word_len)).alias("w"),
        )
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("occ"))
    )
    word_costs = (
        doc_words.select("w").distinct().withColumn("toks_per", cost("w"))
    )
    return (
        doc_words.join(word_costs, "w")
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_words"),
            F.sum(F.col("occ") * F.col("toks_per")).alias("n_tokens"),
        )
    )


def unigram_encode(
    df: DataFrame,
    model: DataFrame | dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    max_piece_len: int = DEFAULT_MAX_PIECE,
    max_word_len: int = DEFAULT_MAX_WORD,
) -> DataFrame:
    """Add ``out_col`` = array<string> of Viterbi pieces in DOCUMENT
    order — the ``bpe.bpe_encode`` twin for the unigram family.

    Viterbi is Python, so unlike bpe_encode's pure-expression fold this
    uses the dictionary shape plus an order-preserving reassembly: the
    per-doc chunk SEQUENCE posexplodes, each distinct chunk is costed
    once (Arrow batch — UDF invocations are bounded by the corpus's
    DISTINCT chunk count, not total tokens), and the doc's token array
    rebuilds as ``flatten(sort_by_position(collect_list))`` — all
    codegen around the one bounded UDF.  Documents with no tokens get
    an empty array (the bpe_encode convention).  ``id_col`` must be
    unique per row (it keys the reassembly).

    The chunks->pieces join is deliberately UNHINTED (like
    ``unigram_token_counts``): the distinct-chunk table grows with the
    corpus vocabulary (Heap's law — NOT bounded by the model's piece
    vocabulary), so forcing a broadcast would cap the operator at the
    driver/broadcast memory limit at large scale; AQE broadcasts it
    when it is actually small and shuffle-joins otherwise."""
    _check(max_piece_len, max_word_len)
    if isinstance(model, DataFrame):
        model = {r["piece"]: r["logp"] for r in model.collect()}
    micro = model_to_micro(model)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def pieces(ws):  # type: ignore[no-untyped-def]
        return pd.Series(
            [viterbi_pieces(w, micro, max_piece_len) for w in ws]
        )

    chunk_pos = df.select(
        F.col(id_col),
        F.posexplode(_word_chunks(text_col, max_word_len)).alias(
            "__pos", "__w"
        ),
    )
    chunk_pieces = (
        chunk_pos.select("__w").distinct().withColumn("__ps", pieces("__w"))
    )
    assembled = (
        chunk_pos.join(chunk_pieces, "__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__ps"))
                    ),
                    lambda s: s["__ps"],
                )
            ).alias(out_col)
        )
    )
    return df.join(assembled, id_col, "left").withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast("array<string>")),
    )
