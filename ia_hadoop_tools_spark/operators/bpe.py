"""BPE tokenizer training prep: corpus-scale symbol-pair statistics and
an iterative merge trainer.

The scale trick is the one every real BPE trainer uses: collapse the
corpus to a WORD-FREQUENCY vocabulary first (one shuffle over tokens,
output bounded by distinct-word count, not corpus size), then do all
pair counting and merging on the vocabulary weighted by word count.  At
100 TB the corpus pass is embarrassingly parallel + one bounded groupBy;
every one of the (typically 30k-50k) merge iterations afterwards touches
only the vocab — millions of rows, not billions.

``bpe_pair_counts`` is the first-merge statistic (adjacent character
pairs weighted by word frequency) and is fully SQL-expressible — it
carries the registry oracle.  ``bpe_train`` runs the driver-side merge
loop (pick argmax pair, merge it inside every affected word's symbol
sequence, recount) with the same persist + lineage-cut discipline as
``operators/graph.pagerank``; it is pinned by a differential test
against a pure-Python reference trainer rather than a SQL oracle
(iterative, data-dependent control flow).

Ties in the argmax are broken lexicographically on the pair string so
training is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: split pattern for the corpus -> word pass; matches the oracle's
#: string_split_regex.
WORD_SPLIT = r"\s+"


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (w, wc) word-frequency vocabulary. One shuffle, output
    bounded by |distinct words|.  The corpus explode is CPU-bound, so a
    small single-row-group input is spread across all slots first
    (no-op at scale — see textops.ensure_min_partitions)."""
    from ia_hadoop_tools_spark.operators.textops import ensure_min_partitions

    return (
        ensure_min_partitions(df.select(F.col(text_col).alias("__t")))
        .select(F.explode(F.split(F.col("__t"), WORD_SPLIT)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Adjacent-character-pair counts over the corpus, computed on the
    vocabulary: (pair, n) where n = sum of word counts containing the
    pair at each position.  The top row is BPE's first merge.

    Plan shape: token explode -> vocab groupBy (the only corpus-sized
    shuffle) -> per-word pair explode (bounded by vocab * word length)
    -> vocab-sized groupBy.
    """
    vocab = word_vocab(df, text_col)
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").alias("n"))
    )
    return pairs.filter(F.col("n") >= min_count)


def _pair_stats(vocab: DataFrame) -> DataFrame:
    """(pair=[a,b] symbols, n) over a (syms array<string>, wc) vocab."""
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] as a, syms[i+1] as b))"
                )
            ).alias("p"),
            "wc",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("n"))
    )


def _merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) in each word's symbol sequence with
    the merged symbol a+b — left-to-right, non-overlapping, matching the
    standard BPE merge rule.

    Pure Spark SQL: an aggregate() fold over the symbol array.  The fold
    state is (out array, pending symbol); the finish step flushes the
    pending symbol.  Left-to-right non-overlap falls out of the fold
    order: once (a,b) merges, the merged token is appended to `out` and
    pending resets, so the second b of "a b b" cannot merge again.
    """
    expr = F.expr(
        """
        aggregate(
          syms,
          struct(cast(array() as array<string>) as out,
                 cast(null as string) as pend),
          (acc, s) -> if(acc.pend = {a} and s = {b},
                         struct(concat(acc.out, array({ab})) as out,
                                cast(null as string) as pend),
                         struct(if(acc.pend is null, acc.out,
                                   concat(acc.out, array(acc.pend))) as out,
                                s as pend)),
          acc -> if(acc.pend is null, acc.out,
                    concat(acc.out, array(acc.pend)))
        )
        """.format(
            a=_sql_str(a), b=_sql_str(b), ab=_sql_str(a + b)
        )
    )
    return vocab.withColumn("syms", expr)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    materialize_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(a, b, count), ...] in
    merge order.  ACTION: runs 1 corpus job + 1 small vocab job per
    merge (plus periodic vocab materialization for lineage cuts).

    The per-merge job touches only the vocabulary (corpus-independent
    size); `materialize_every` persists+localCheckpoints the vocab so
    the fold-expression lineage never deepens past a bound — the
    pagerank discipline (operators/graph.py) applied to a text loop.
    """
    vocab = word_vocab(df, text_col).withColumn(
        "syms", F.expr("filter(split(w, ''), s -> s <> '')")
    ).select("syms", "wc")
    vocab = vocab.persist()
    merges: list[tuple[str, str, int]] = []
    prev = vocab
    for step in range(num_merges):
        top = (
            _pair_stats(vocab)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        vocab = _merge_pair(vocab, a, b)
        if (step + 1) % materialize_every == 0:
            # eager cut: materializes BEFORE the parent is unpersisted,
            # and truncates the stacked fold-expression lineage
            vocab = vocab.localCheckpoint(eager=True)
        else:
            vocab = vocab.persist()
            vocab.count()  # materialize (vocab-sized) before dropping parent
        prev.unpersist()
        prev = vocab
    prev.unpersist()
    return merges
