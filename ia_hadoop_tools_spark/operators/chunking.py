"""Document chunking: fixed-size token windows with overlap.

Every embedding / retrieval / long-context training pipeline slices
documents into overlapping token windows before vectorizing or packing
(the "512-token chunks, 64-token stride" preprocessing step).  At 100 TB
this must be a pure map: split to tokens, generate window starts with
``sequence``, ``posexplode`` — all codegen'd expressions, zero shuffle,
output partitioning inherited from the scan.  Chunk text is rejoined
with a single space (tokenizer-equivalent, not byte-identical to the
source — chunking happens AFTER whitespace normalization by design).

Word split is the engine-wide portable class (see operators/bpe.py
WORD_SPLIT) so the DuckDB oracle reproduces chunks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk) rows: overlapping token windows.

    ``stride`` defaults to ``chunk_tokens`` (disjoint windows); a
    smaller stride overlaps.  Window starts are 0, stride, 2*stride, ...
    while a start < token count remains, so with ``stride <=
    chunk_tokens`` the FINAL window may be short (< chunk_tokens) but no
    token is dropped (a doc shorter than one chunk yields exactly one
    chunk).  ``stride > chunk_tokens`` is allowed and SAMPLES the
    corpus: tokens in the inter-window gaps appear in no chunk — useful
    for sketching a 100 TB corpus, wrong for full-coverage embedding.
    Empty / whitespace-only documents yield no rows (there is nothing
    to embed).

    Pure narrow plan: split -> sequence(0, n-1, stride) -> posexplode ->
    slice.  No shuffle; a 100 TB corpus chunks at scan speed.

    Empty docs are dropped by making their START ARRAY empty (posexplode
    of [] emits nothing) rather than by a ``filter(size(...) > 0)`` —
    that filter form gets pushed into the scan as a DataFilter that
    re-evaluates the whole tokenize expression per row (the repo-wide
    perf trap documented in the verify notes).
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = F.filter(F.split(F.col(text_col), WORD_SPLIT), lambda w: w != F.lit(""))
    starts = F.when(
        F.size("__toks") > 0,
        F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    piece = F.slice("__toks", F.col("__start") + 1, chunk_tokens)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            F.posexplode(starts).alias("chunk_id", "__start"),
            "__toks",
        )
        .select(
            id_col,
            "chunk_id",
            F.size(piece).alias("n_tokens"),
            F.concat_ws(" ", piece).alias("chunk"),
        )
    )
