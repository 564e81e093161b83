"""Explicit Bloom-filter join pruning — the "runtime filter" pattern as a
reusable, cross-job artifact.

The shape: a probe table far too big to move (lineitem at 100 TB) is
semi-joined to a build side that is too big to broadcast as raw keys but
whose MEMBERSHIP fits in a fixed-size bit mask (millions of keys -> one
1 MiB mask).  Building the mask is one scan with per-partition partial
ORs (a 1 MiB row per partition, OR-reduced on the driver — constant
driver state at any data size); probing is an Arrow-vectorized bit test
applied BEFORE the join's shuffle, so non-matching probe rows never
leave their input partition.  A final exact semi-join removes the Bloom
false positives, so results are bit-identical to the plain semi-join.

Catalyst does an automatic in-query version of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects a
BloomFilter aggregate below the probe-side shuffle).  This module is the
EXPLICIT variant for when the filter must cross job boundaries: build
once, keep the mask (it is just ``bytes``), prune every future batch —
the same build-once/probe-many economics as
``operators/dedup_index.py``.  Reference parity: the manifest-membership
prune (STAGED minus INCLUDED) in jobs/SummaryGenerator.java:48-96 is the
exact-set ancestor of this pattern; the Bloom mask is its bounded-memory
form.

Determinism: ``xxhash64`` is a fixed published function, double hashing
(Kirsch–Mitzenmacher) derives the k probe positions from two JVM-side
hash columns, and false positives are removed by the exact verify join —
so the composed result is exactly the semi-join, independent of
partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: second-hash salt; any fixed literal works, it only has to match
#: between build and probe (both call :func:`_hash_cols`).
BLOOM_SALT = 0x9E3779B1

DEFAULT_NUM_BITS = 1 << 23  # 8M bits = 1 MiB mask
DEFAULT_NUM_HASHES = 5


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """The two 64-bit hash streams shared by build and probe."""
    return (
        F.xxhash64(key),
        F.xxhash64(key, F.lit(BLOOM_SALT)),
    )


def _positions(
    h1: np.ndarray, h2: np.ndarray, i: int, num_bits: int
) -> np.ndarray:
    """i-th double-hash position; uint64 wrap-around is intentional."""
    return (h1 + np.uint64(i) * h2) % np.uint64(num_bits)


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> bytes:
    """Build a Bloom mask over ``df[key_col]``. ACTION: runs one job.

    One scan: the two hash columns are computed JVM-side, each partition
    folds its rows into a local ``num_bits/8``-byte mask inside
    ``mapInPandas`` (numpy bit-sets over Arrow batches), and the driver
    ORs one mask row per partition.  Driver state is ``num_bits/8``
    bytes times the partition count transiently, then one mask —
    constant in the row count.
    """
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    h1, h2 = _hash_cols(F.col(key_col))
    hashed = df.select(h1.alias("__h1"), h2.alias("__h2"))
    nbytes = num_bits // 8

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mask = np.zeros(nbytes, dtype=np.uint8)
        saw = False
        for b in batches:
            if not len(b):
                continue
            saw = True
            a1 = b["__h1"].to_numpy(dtype=np.int64).view(np.uint64)
            a2 = b["__h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(num_hashes):
                pos = _positions(a1, a2, i, num_bits)
                np.bitwise_or.at(
                    mask,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if saw:
            yield pd.DataFrame({"mask": [mask.tobytes()]})

    rows = hashed.mapInPandas(fold, "mask binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r["mask"], dtype=np.uint8)
    return out.tobytes()


def bloom_prune(
    df: DataFrame,
    key_col: str,
    mask: bytes,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep rows whose key MIGHT be in the mask (superset of matches).

    The mask ships once per executor via a Spark broadcast; the test is
    a vectorized numpy bit lookup per Arrow batch.  Null keys hash like
    any value and may survive here — the exact verify join in
    :func:`bloom_semi_join` drops them (SQL null-equality semantics),
    matching the plain semi-join.
    """
    num_bits = len(mask) * 8
    bc = df.sparkSession.sparkContext.broadcast(mask)

    @pandas_udf("boolean")
    def might_contain(s1: pd.Series, s2: pd.Series) -> pd.Series:
        m = np.frombuffer(bc.value, dtype=np.uint8)
        a1 = s1.to_numpy(dtype=np.int64).view(np.uint64)
        a2 = s2.to_numpy(dtype=np.int64).view(np.uint64)
        keep = np.ones(len(a1), dtype=bool)
        for i in range(num_hashes):
            pos = _positions(a1, a2, i, num_bits)
            byte = m[(pos >> np.uint64(3)).astype(np.int64)]
            keep &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) == 1
        return pd.Series(keep)

    h1, h2 = _hash_cols(F.col(key_col))
    return df.filter(might_contain(h1, h2))


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    mask: bytes | None = None,
) -> DataFrame:
    """``probe LEFT SEMI JOIN build`` with a Bloom prune before the
    shuffle.  Bit-identical to the plain semi-join (false positives are
    removed by the exact join; false negatives are impossible).

    ACTION on first use: builds the mask (one job over ``build``) unless
    a prebuilt ``mask`` from :func:`bloom_build` is passed — the
    cross-job reuse path.
    """
    if mask is None:
        mask = bloom_build(build, build_key, num_bits, num_hashes)
    pruned = bloom_prune(probe, probe_key, mask, num_hashes)
    keys = build.select(F.col(build_key).alias(probe_key))
    return pruned.join(keys, on=probe_key, how="left_semi")
