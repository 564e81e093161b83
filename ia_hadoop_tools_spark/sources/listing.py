"""File-listing sources (the LSR / DateFilter family).

Reference: pig/LSRPigLoader.java:77-146 (recursive BFS walk with extension +
hidden-file filters), pig/DateFilterLSRLoader.java:72-94 and
pig/DateFilter.java:19-316 (mtime predicates at listing time),
hadoop/util/FilenameInputFormat.java (one record per file NAME).

Spark-first: listing-time pruning is reader options — ``recursiveFileLookup``,
``pathGlobFilter``, ``modifiedAfter``/``modifiedBefore`` — so the predicate
never touches file contents (the partition-pruning analog, SURVEY.md §4). For
jobs that need the file list AS DATA (the FilenameInputFormat pattern driving
per-file extraction), ``list_files_df`` enumerates driver-side and returns a
DataFrame of paths ready for ``mapInPandas``/``foreachPartition`` fan-out.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession


def read_text_listing(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modified_after: str | None = None,
    modified_before: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Text read with listing-time pruning (LSR + DateFilter semantics)."""
    r = spark.read.option("recursiveFileLookup", str(recursive).lower())
    if glob:
        r = r.option("pathGlobFilter", glob)
    if modified_after:
        r = r.option("modifiedAfter", modified_after)
    if modified_before:
        r = r.option("modifiedBefore", modified_before)
    return r.text(path)


def list_files_df(
    spark: SparkSession,
    root: str,
    extensions: tuple[str, ...] = (),
    include_hidden: bool = False,
    min_mtime: float | None = None,
    max_mtime: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Recursive file enumeration -> DataFrame(path, size, mtime).

    The walk is driver-side (file listings are metadata — tiny next to data);
    the returned DataFrame is the fan-out axis for per-file extraction jobs
    (FilenameInputFormat semantics: one record per file name).
    """
    rows = []
    for dirpath, dirnames, filenames in os.walk(root):
        if not include_hidden:
            dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        for fn in filenames:
            if not include_hidden and fn.startswith((".", "_")):
                continue
            if extensions and not fn.endswith(tuple(extensions)):
                continue
            full = os.path.join(dirpath, fn)
            st = os.stat(full)
            if min_mtime is not None and st.st_mtime < min_mtime:
                continue
            if max_mtime is not None and st.st_mtime >= max_mtime:
                continue
            rows.append((full, st.st_size, datetime.utcfromtimestamp(st.st_mtime)))
    df = spark.createDataFrame(rows, "path: string, size: long, mtime: timestamp")
    return df.repartition(num_partitions) if num_partitions else df
