"""Z-order (Morton) clustering for multi-column data skipping.

A sorted cluster prunes row groups on ONE key (the urlkey sort the whole
reference architecture is built on). When queries filter on TWO
independent columns (partkey AND suppkey; host AND timestamp), no single
sort order serves both — the standard warehouse answer is Z-ORDER
clustering (Morton curve; the technique behind Databricks Delta's
``OPTIMIZE ZORDER BY`` and ClickHouse's ``mortonEncode``): interleave
the bits of the columns' rank codes and range-sort by the interleaved
key, so every parquet row group covers a small HYPER-RECTANGLE of the
key space and min/max stats prune on any filtered dimension.

Implementation is pure column expressions (codegen'd bit arithmetic —
no UDF):

1. each column is quantized to a ``bits``-bit code via its value range
   (driver fetches per-column min/max — one bounded-metadata agg, the
   same cost class as sampled range boundaries);
2. codes are bit-interleaved into the Morton key;
3. ``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` writes
   files whose row groups are Z-curve segments.

Scale shape: one extra full-shuffle write pass — identical cost to the
single-key cluster build (operators/cluster.py) — paid once at layout
time; every subsequent multi-dimensional scan prunes. The min/max agg
is the only driver-side step and returns 2 numbers per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map [lo, hi] integers onto [0, 2^bits) uniformly; out-of-range
    values clamp to the ends, and NULLs go to cell 0 (the lo corner) —
    explicitly, because Spark's least/greatest SKIP nulls, which would
    otherwise silently fold every NULL row into the hi corner, widening
    that corner's row groups on every other dimension.

    floor(scaled / span) stays EXACT in double arithmetic because
    scaled <= span * 2^bits < 2^52 for 32-bit value spans and
    bits <= 16 — no precision cliff.
    """
    span = max(hi - lo, 1)
    if span * ((1 << bits) - 1) >= (1 << 53):
        raise ValueError(
            f"z-order span {span} x {bits} bits exceeds exact double "
            f"arithmetic (2^53) — reduce bits, or pre-scale the column "
            f"(e.g. epoch-micros -> minutes) and pass ranges= explicitly"
        )
    filled = F.coalesce(col.cast("long"), F.lit(lo))
    clamped = F.greatest(F.least(filled, F.lit(hi)), F.lit(lo))
    scaled = (clamped - F.lit(lo)) * F.lit((1 << bits) - 1)
    return F.floor(scaled / F.lit(span)).cast("long")


def zorder_key(codes: Sequence[Column], bits: int = 16) -> Column:
    """Interleave ``bits``-bit codes into one Morton key column.

    ``codes`` must already be in [0, 2^bits); with d columns the result
    uses d*bits bits (keep d*bits <= 62 for long arithmetic).
    """
    d = len(codes)
    if d < 2:
        raise ValueError("zorder needs >= 2 columns")
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits exceeds long range")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(codes):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (b * d + j))).cast("long")
    return key


def zorder_code(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> tuple[DataFrame, Column]:
    """(df, morton key column) for integer columns ``cols``.

    ``ranges`` maps col -> (min, max); omitted entries are computed with
    one min/max aggregation (the bounded-metadata driver step).
    """
    ranges = dict(ranges or {})
    # validate + coerce USER-supplied ranges like inferred ones: an
    # inverted (hi < lo) range would silently collapse the dimension to a
    # single Z-code (clamped = lo everywhere) and kill pruning with no
    # error, and a float range would poison the integer index arithmetic
    for c, (lo, hi) in list(ranges.items()):
        lo, hi = int(lo), int(hi)
        if hi < lo:
            raise ValueError(
                f"z-order range for {c!r} is inverted: ({lo}, {hi})"
            )
        ranges[c] = (lo, hi)
    missing = [c for c in cols if c not in ranges]
    if missing:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in missing],
            *[F.max(c).alias(f"hi_{c}") for c in missing],
        ).collect()[0]
        for c in missing:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is None or hi is None:
                raise ValueError(
                    f"cannot infer z-order range for {c!r}: table is empty "
                    f"or the column is all-NULL (pass ranges= explicitly)"
                )
            ranges[c] = (int(lo), int(hi))
    codes = [
        _quantize(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    return df, zorder_key(codes, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    Row groups end up covering small hyper-rectangles of the col space,
    so min/max skipping prunes scans filtering on ANY of ``cols`` —
    verify with the footer-stats audit in tests/test_zorder.py.
    """
    df, zkey = zorder_code(df, cols, bits, ranges)
    # pick a scratch column name not colliding with input data — a user
    # column named "__z" would be silently overwritten then dropped
    zcol = "__z"
    while zcol in df.columns:
        zcol = "_" + zcol
    (
        df.withColumn(zcol, zkey)
        .repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
