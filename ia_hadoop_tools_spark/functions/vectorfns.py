"""Vector math over array<float>/array<double> embedding columns.

All pure column expressions: ``zip_with`` + ``aggregate`` run inside codegen —
no Python, no UDF round-trip. Accumulation is sequential left-to-right in
double precision, which makes results bit-reproducible (and matchable by an
oracle that accumulates the same way).

At scale: these are narrow per-row ops (no shuffle); a 768-dim float vector
costs ~768 fused multiply-adds per row JVM-side. For the brute-force top-k
path built on them see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i] in double precision (sequential accumulation)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b); null-safe on zero vectors (returns null, not NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
