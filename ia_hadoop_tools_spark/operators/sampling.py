"""Deterministic corpus sampling and training-sequence packing.

Training-data pipelines need reproducible subsets and mixes — not
``df.sample`` (seed-stable only per partitioning) but content-addressed
sampling: a row's in/out decision depends only on its id, so any re-run,
re-partitioning, or incremental extension agrees with the last one. Same
idea as the reference's deterministic partition-by-key routing
(AlphaPartitioner), applied to sampling.

- ``sample_hash``: keep rows where md5(id) mod M < fraction*M.
- ``sample_stratified``: per-stratum fractions (e.g. per ``source`` or per
  language) — the standard training-mix reweighting step.
- ``pack_sequences``: assign documents to fixed-token-budget training bins:
  cumulative token count per stratum (one window), bin = cumsum div budget.
  Greedy-by-sort-order packing — deterministic, one shuffle per stratum
  column, and the bin id is reproducible given (order, budget).

All pure codegen projections/windows — no Python, exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MOD = 1_000_000


def _hash_bucket(id_col: str):
    # first 8 hex chars of md5 -> int -> [0, _MOD); content-addressed and
    # reproducible in any engine with md5 (DuckDB oracle uses the same)
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long") % _MOD


def sample_hash(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``id_col`` content."""
    return df.filter(_hash_bucket(id_col) < int(fraction * _MOD))


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (training-mix reweighting).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. One codegen filter, no shuffle: the
    threshold lookup inlines as a CASE expression.
    """
    thr = F.lit(int(default_fraction * _MOD))
    for val, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == val, F.lit(int(frac * _MOD))
        ).otherwise(thr)
    return df.filter(_hash_bucket(id_col) < thr)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a training-sequence bin under a token budget.

    Concat-and-chunk layout (the GPT-style packing): docs are concatenated
    in ``id_col`` order (per stratum if given) into one token stream, the
    stream is cut every ``budget`` tokens, and each doc reports the bin
    containing its FIRST token plus its offset within that bin —
    ``seq_start`` is the doc's global token offset. One cumulative-sum
    window; the sort order makes the layout exactly reproducible.
    """
    parts = [strata_col] if strata_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    return (
        df.withColumn("seq_start", start)
        .withColumn("bin", (F.col("seq_start") / budget).cast("long"))
        .withColumn("bin_offset", F.col("seq_start") % budget)
    )
