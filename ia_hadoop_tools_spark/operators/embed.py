"""Feature-hashed document embeddings — vectors from text alone.

The hashing trick (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning"; the classic signed-hash variant): token
``w`` maps to dimension ``hash(w) mod dim`` with sign ``±1`` from an
independent hash bit, occurrences sum, the vector L2-normalizes.  The
signed sum makes collisions cancel in expectation, so cosine between
hashed vectors estimates cosine between the underlying bag-of-words
vectors — which is exactly what the engine's embedding family consumes:
:func:`hash_embed` bridges TEXT-ONLY corpora into ``ann_topk`` /
``embedding_neardup`` / ``semdedup`` / ``prototype_prune`` without an
external encoder model.

Not in the reference (no vector layer there) — training-data-pipeline
extension.  Conventions:

- one tokenization rule (lowercase + ``WORD_SPLIT``, the ``lm_quality``
  word unit) shared with the classifiers and the SQL oracle;
- the portable ``hash32`` md5-prefix hash (``functions/hashfns.py``)
  for both the dimension and the sign, so the DuckDB oracle reproduces
  vectors bit-for-bit;
- engine-exact values: per-cell sums are exact LONGs, the norm is one
  ``sqrt`` of an exact integer and each element one division of exact
  operands — single correctly-rounded IEEE ops on identical inputs, so
  the doubles match across engines with no accumulation-order drift.

Scale shape: one narrow scan exploding tokens (bounded fan-out per
doc), ONE exchange of skinny ``(id, dim_index, signed_count)`` rows
(<= dim per doc after map-side partial aggregation), a per-doc
``map_from_entries`` assembly, and a codegen ``transform`` for the
dense normalized array.  The text column never shuffles; nothing
touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.hashfns import hash32
from ia_hadoop_tools_spark.operators.bpe import WORD_SPLIT

DEFAULT_DIM = 64


def hash_embed(
    docs: DataFrame,
    dim: int = DEFAULT_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "embed",
) -> DataFrame:
    """(``id_col``, ``embedding`` array<double> of length ``dim``,
    ``n_tokens``): the signed-feature-hash embedding, L2-normalized.

    Tokens hash to ``hash32(salt:d:w) mod dim`` with sign from
    ``hash32(salt:s:w) mod 2`` (+1 on even).  Documents with no tokens
    (empty/NULL text) get the all-zero vector and ``n_tokens = 0`` —
    kept, like the ``lm_score`` NULL convention, so downstream joins
    see every document.  A zero vector also results when signed counts
    fully cancel (possible, rare); consumers treating zero-norm vectors
    specially (``ann_topk`` skips them) behave as with any degenerate
    embedding."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    raw = F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.filter(raw, lambda t: t != "")).alias("__w"),
    )
    cells = (
        toks.select(
            id_col,
            (hash32(F.col("__w"), salt=f"{salt}:d:") % dim).alias("__j"),
            F.when(hash32(F.col("__w"), salt=f"{salt}:s:") % 2 == 0, 1)
            .otherwise(-1)
            .alias("__s"),
        )
        .groupBy(id_col, "__j")
        .agg(F.sum("__s").alias("__v"), F.count("*").alias("__c"))
    )
    per_doc = cells.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__j"), F.col("__v")))
        ).alias("__m"),
        F.sum(F.col("__v") * F.col("__v")).alias("__sq"),
        F.sum("__c").alias("n_tokens"),
    )
    nrm = F.sqrt(F.col("__sq").cast("double"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.col("__sq") > 0,
            F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")), F.lit(0)
            ).cast("double")
            / nrm,
        ).otherwise(F.lit(0.0)),
    )
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__sq").isNull(), zeros)
            .otherwise(dense)
            .alias("embedding"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )


def hash_embed_sql(
    dim: int = DEFAULT_DIM,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "embed",
) -> str:
    """DuckDB oracle mirror of :func:`hash_embed` over ``table``."""
    from ia_hadoop_tools_spark.functions.hashfns import hash32_sql

    hd = hash32_sql("w", salt=f"{salt}:d:")
    hs = hash32_sql("w", salt=f"{salt}:s:")
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(list_filter(regexp_split_to_array(lower({text_col}),
                                                  '[ \\t\\n\\f\\r]+'),
                            x -> x <> '')) AS w
  FROM {table}),
cells AS (
  SELECT {id_col}, ({hd}) % {dim} AS j,
         sum(CASE WHEN ({hs}) % 2 = 0 THEN 1 ELSE -1 END) AS v,
         count(*) AS c
  FROM toks GROUP BY 1, 2),
per_doc AS (
  SELECT {id_col}, sum(v * v) AS sq, sum(c) AS nt FROM cells GROUP BY 1),
dims AS (SELECT unnest(range(0, {dim})) AS i),
dense AS (
  SELECT p.{id_col}, d.i,
         CASE WHEN p.sq > 0
              THEN CAST(coalesce(c.v, 0) AS DOUBLE)
                   / sqrt(CAST(p.sq AS DOUBLE))
              ELSE 0.0 END AS x
  FROM per_doc p CROSS JOIN dims d
  LEFT JOIN cells c ON c.{id_col} = p.{id_col} AND c.j = d.i),
emb AS (
  SELECT {id_col}, list(x ORDER BY i) AS embedding FROM dense GROUP BY 1)
SELECT t.{id_col},
       coalesce(e.embedding,
                (SELECT list(0.0) FROM range({dim}))) AS embedding,
       CAST(coalesce(p.nt, 0) AS BIGINT) AS n_tokens
FROM {table} t
LEFT JOIN emb e ON e.{id_col} = t.{id_col}
LEFT JOIN per_doc p ON p.{id_col} = t.{id_col}
"""
