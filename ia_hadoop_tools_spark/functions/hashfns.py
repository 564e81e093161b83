"""Portable deterministic hashing for dedup/sketch operators.

The MinHash/SimHash operators need a hash function that (a) runs JVM-side in
Spark as column expressions and (b) can be mirrored EXACTLY in ANSI-ish SQL so
the DuckDB oracle reproduces identical sketches. Neither engine's native
``hash()``/``xxhash64`` matches the other, so we define:

    hash32(s) = int(first 8 hex chars of md5(s), 16)      # in [0, 2^32)

- Spark:  ``conv(substring(md5(col), 1, 8), 16, 10)`` cast to long
- DuckDB: ``CAST('0x' || substr(md5(col), 1, 8) AS BIGINT)``

MinHash uses the classic universal-hash family over the Mersenne prime
p = 2^31 - 1:  h_j(x) = (a_j * (x mod p) + b_j) mod p, with (a_j, b_j) drawn
once from a fixed seed so Spark and the oracle share them. Products stay
< 2^62 — no 64-bit overflow in either engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash32(col: Column | str, salt: str = "") -> Column:
    """32-bit md5-prefix hash of a string column (portable across engines)."""
    c = _c(col)
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL mirror of :func:`hash32` (``expr`` is a SQL fragment)."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


def minhash_permutations(num: int, seed: int = 42) -> list[tuple[int, int]]:
    """The shared (a_j, b_j) universal-hash coefficients for ``num`` permutations."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num)
    ]


def permute_hash(h: Column, a: int, b: int) -> Column:
    """h -> (a * (h mod p) + b) mod p as a column expression."""
    return (F.lit(a) * (h % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def permute_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB SQL mirror of :func:`permute_hash`."""
    return f"(({a} * (({h_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
