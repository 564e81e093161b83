"""Explicit-boundary range partitioning (the AlphaPartitioner path).

Reference: mapreduce/AlphaPartitioner.java:20-110 (binary-search a sorted
boundary array, insertion-point-minus-one semantics, boundaries from a split
file) and cdx/SplitFile.java:39-51 (``name start end`` per output shard).

``repartitionByRange`` covers the common case (sampled boundaries — the
ZipNumPartitioner sampling mode). When the caller must control EXACT shard
boundaries and names (Wayback-compatible cluster layout), we compute a
partition-id column from the boundary array and write with
``partitionBy(shard_name)`` — each named shard directory holds exactly its
key range, sorted. No Catalyst rule needed (SURVEY.md §4).

At scale the boundary array is a broadcast-sized literal (thousands of
entries for hundreds of TB) and the id computation is a codegen'd binary-ish
scan per row — the same work AlphaPartitioner did per record.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.schemas import SPLITFILE_SCHEMA


def parse_splitfile(spark: SparkSession, path_or_lines) -> list[tuple[str, str, str]]:
    """Read a ``name start end`` split file into [(name, start, end)] sorted by
    start (end exclusive, SplitFile.java:39-51)."""
    if isinstance(path_or_lines, str):
        # read as raw text and tokenize EXACTLY like the in-memory path: a
        # 3-column CSV read silently truncated lines with extra tokens
        # (e.g. a shard name containing a space), so the two entry points
        # disagreed — the file path mis-parsed where the list path raised
        lines = [r[0] for r in spark.read.text(path_or_lines).collect()]
        recs = [tuple(line.split()) for line in lines]
    else:
        recs = [tuple(line.split()) for line in path_or_lines]
    bad = [r for r in recs if len(r) != 3 or any(v is None for v in r)]
    if bad:
        # a short/null line would crash the sort (or worse: a null end
        # flows into `key < NULL` downstream and silently drops a shard)
        raise ValueError(f"malformed split-file lines (need name start end): {bad!r}")
    return sorted(recs, key=lambda r: r[1])


def assign_range_ids(
    df: DataFrame,
    boundaries: Sequence[str],
    key_col: str = "urlkey",
    out_col: str = "range_id",
    linear_scan_max: int = 32,
) -> DataFrame:
    """Add ``out_col`` = number of boundaries <= key, minus one, floored at 0
    (AlphaPartitioner's insertion-point-minus-one, :31-41). ``boundaries`` are
    the k range-start keys (sorted); keys below boundaries[0] get id 0 along
    with the first range. Zero shuffle either way; the subsequent
    ``partitionBy`` write or ``repartitionByRange(out_col)`` realizes the
    physical layout.

    Two strategies: small boundary lists inline as a codegen'd O(k) scan;
    larger ones use a vectorized Arrow-batched binary search
    (``np.searchsorted`` — the literal AlphaPartitioner algorithm), because a
    per-row O(k) expression over thousands of boundaries at billions of rows
    is the wrong complexity class.
    """
    bnds = sorted(boundaries)
    key = F.col(key_col)
    if len(bnds) <= linear_scan_max:
        arr = F.array(*[F.lit(b) for b in bnds])
        pid = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(key >= b, 1).otherwise(0),
        )
        return df.withColumn(out_col, F.greatest(pid - 1, F.lit(0)))

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bnd_arr = np.array(bnds, dtype=object)

    def _bucket(keys):
        arr = keys.to_numpy(dtype=object)
        # null keys: searchsorted cannot compare None; route them to range
        # 0 explicitly, matching the codegen path's behavior exactly
        mask = pd.isna(arr)
        if mask.any():
            safe = arr.copy()
            safe[mask] = bnd_arr[0]
            ids = np.searchsorted(bnd_arr, safe, side="right")
            ids[mask] = 1  # -> max(1-1, 0) == range 0
        else:
            ids = np.searchsorted(bnd_arr, arr, side="right")
        return pd.Series(np.maximum(ids - 1, 0).astype("int32"))

    _bucket.__annotations__ = {"keys": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_bucket, "int")(key))


def _pick_evenly(keys: list, n_ranges: int) -> list:
    """n_ranges-1 evenly-ranked boundary keys from a sorted sample
    (ZipNumPartitioner's every-(n/splits)th-line pick, :120-127)."""
    if not keys:
        return []
    step = len(keys) / n_ranges
    return sorted({keys[min(int(i * step), len(keys) - 1)] for i in range(1, n_ranges)})


def sample_boundaries(
    df: DataFrame,
    key_col: str,
    n_ranges: int,
    sample_size: int = 100_000,
    seed: int = 42,
) -> list:
    """Sample ``n_ranges - 1`` range-boundary keys from an existing table —
    ZipNumPartitioner's sampling mode (mapreduce/ZipNumPartitioner.java:92-135
    samples an existing cluster's summary; here a seeded sample of the table
    itself, so it works for STRING sort keys where ``approxQuantile`` doesn't).
    The result is the n_ranges-1 INTERIOR cut points. ``assign_range_ids``
    treats its boundary list as range-START keys, so prepend range 0's
    start (the global minimum, or ``""``) before passing these cuts —
    feeding the interior cuts directly would merge the first two intended
    ranges into one double-weight shard. Deterministic for a fixed
    (data, partitioning, seed); driver memory is bounded by
    ``sample_size`` keys.

    ONE Spark job, no pre-count: a uniform ``sample_size``-row sample is the
    global top-k by a seeded random priority (``TakeOrdered`` — per-partition
    bounded heaps, merge of partials), so the table is scanned exactly once.
    When the table IS a cluster on disk, prefer
    :func:`boundaries_from_summary`: the summary is ~1/3000 of the data and
    already stratified.
    """
    if n_ranges < 2:
        return []
    sampled = (
        df.select(key_col)
        .filter(F.col(key_col).isNotNull())
        .withColumn("__r", F.rand(seed))
        .orderBy("__r")
        .limit(sample_size)
    )
    keys = sorted(r[0] for r in sampled.collect())
    return _pick_evenly(keys, n_ranges)


def boundaries_from_summary(
    spark: SparkSession,
    cluster_dir: str,
    n_ranges: int,
    sample_size: int = 100_000,
    seed: int = 42,
    filesystem=None,
) -> list:
    """Boundary keys for re-sharding, read from an existing cluster's
    ALL.summary instead of scanning the data — the literal
    ZipNumPartitioner strategy (mapreduce/ZipNumPartitioner.java:92-135).

    Blocks hold equal line counts, so block keys are an exact stratified
    sample of the row distribution; at 100 TB the summary is ~1/3000 of the
    data and this touches ZERO data files. ``sample_size`` bounds driver
    memory when even the summary is huge (same top-k-by-random-priority
    sample as :func:`sample_boundaries`).
    """
    from ia_hadoop_tools_spark.sources.zipnum import load_summary

    return sample_boundaries(
        load_summary(spark, cluster_dir, filesystem),
        "summary_key",
        n_ranges,
        sample_size=sample_size,
        seed=seed,
    )


def write_named_shards(
    df: DataFrame,
    path: str,
    splits: Sequence[tuple[str, str, str]],
    key_col: str = "urlkey",
    sort_cols: Sequence[str] = ("urlkey", "timestamp"),
) -> None:
    """Write one named, sorted shard directory per split-file range.

    ``splits`` = [(name, start, end)]; rows outside every range are dropped
    (matching the reference, where the partitioner only routes covered keys) —
    including rows falling in a GAP between one split's end and the next
    split's start: each row is checked against its assigned split's own
    ``end``, so every shard holds exactly its [start, end).

    ``splits`` may arrive in ANY order: they are sorted by start here —
    assign_range_ids sorts its boundary array internally, so an unsorted
    caller list would index the wrong names/ends (silently misrouting or
    dropping whole shards' rows).
    """
    if not splits:
        raise ValueError("write_named_shards: need at least one split")
    # null check BEFORE the sort: sorted() on a None start raises a bare
    # TypeError and hides this explanation
    if any(s[1] is None or s[2] is None for s in splits):
        raise ValueError(
            "write_named_shards: every split needs non-null start AND end "
            "(a null end would silently drop that shard's rows via "
            "`key < NULL`)"
        )
    splits = sorted(splits, key=lambda s: s[1])
    names = [s[0] for s in splits]
    starts = [s[1] for s in splits]
    if len(set(starts)) != len(starts):
        # assign_range_ids counts boundaries <= key, so two splits sharing
        # a start would route every key to the LAST one — the earlier-named
        # shard would be written silently empty
        dupes = sorted({s for s in starts if starts.count(s) > 1})
        raise ValueError(
            f"write_named_shards: duplicate split start keys {dupes!r} "
            "would silently empty the earlier-named shard"
        )
    ends = [s[2] for s in splits]
    with_ids = assign_range_ids(df, starts, key_col, "__rid")
    name_map = F.array(*[F.lit(n) for n in names])
    end_map = F.array(*[F.lit(e) for e in ends])
    out = (
        with_ids.withColumn("shard", F.element_at(name_map, F.col("__rid") + 1))
        .filter(F.col(key_col) >= starts[0])
        .filter(F.col(key_col) < F.element_at(end_map, F.col("__rid") + 1))
        .drop("__rid")
    )
    (
        # "shard" leads the sort: the partitionBy write REQUIRES an
        # ordering on [shard], so V1Writes inserts its own Sort and
        # EliminateSorts DELETES a user sort that lacks the shard prefix
        # — the files would be written UNSORTED (verified on 4.1.2),
        # silently breaking the sorted-shard cluster invariant. With the
        # shard prefix the one sort satisfies both requirements.
        out.repartition(len(names), "shard")
        .sortWithinPartitions("shard", *sort_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
