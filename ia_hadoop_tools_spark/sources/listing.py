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


_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "="}
_OP_FN = {
    "<": lambda m, d: m < d,
    ">": lambda m, d: m > d,
    "<=": lambda m, d: m <= d,
    ">=": lambda m, d: m >= d,
    "=": lambda m, d: m == d,
}


def _parse_filter_date(tok: str) -> float:
    """Date literal -> epoch seconds: ISO date/datetime, 14-digit timestamp,
    or a FILE PATH whose mtime is the date (DateFilter.parseDateForParam:216-237
    supports all three)."""
    from datetime import timezone

    for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y%m%d%H%M%S"):
        try:
            return datetime.strptime(tok, fmt).replace(tzinfo=timezone.utc).timestamp()
        except ValueError:
            pass
    if os.path.exists(tok):
        return os.stat(tok).st_mtime
    raise ValueError(f"unparseable date (not ISO/14-digit/existing path): {tok!r}")


def parse_date_filter(expr: str):
    """The reference's mtime predicate grammar (DateFilter.init:139-214) ->
    a ``predicate(mtime_epoch_seconds) -> bool``.

    Forms (whitespace-separated; ops ``< > <= >= =``):
      ``OP DATE``             e.g. ``< 2020-06-01``   (implicit leading mtime)
      ``mtime OP DATE``
      ``DATE OP mtime``       (op is flipped)
      ``DATE OP mtime OP DATE``
    """
    toks = expr.split()
    constraints: list[tuple[str, str]] = []
    if len(toks) == 2:
        constraints = [(toks[0], toks[1])]
    elif len(toks) == 3:
        if toks[0] == "mtime":
            constraints = [(toks[1], toks[2])]
        elif toks[2] == "mtime":
            constraints = [(_FLIP.get(toks[1], toks[1]), toks[0])]
        else:
            raise ValueError("must mention mtime: 'X < mtime' or 'mtime > X'")
    elif len(toks) == 5:
        if toks[2] != "mtime":
            raise ValueError("5-token form is 'X OP mtime OP Y'")
        constraints = [(_FLIP.get(toks[1], toks[1]), toks[0]), (toks[3], toks[4])]
    else:
        raise ValueError(
            "use: 'OP X', 'X OP mtime', 'mtime OP X', or 'X OP mtime OP Y'"
        )
    for op, _ in constraints:
        if op not in _OP_FN:
            raise ValueError(f"illegal comparison op: {op!r}")  # DateFilter.parseOp
    parsed = [(_OP_FN[op], _parse_filter_date(d)) for op, d in constraints]
    return lambda mtime: all(fn(mtime, d) for fn, d in parsed)


def list_files_df(
    spark: SparkSession,
    root: str,
    extensions: tuple[str, ...] = (),
    include_hidden: bool = False,
    min_mtime: float | None = None,
    max_mtime: float | None = None,
    date_filter: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Recursive file enumeration -> DataFrame(path, size, mtime).

    The walk is driver-side (file listings are metadata — tiny next to data);
    the returned DataFrame is the fan-out axis for per-file extraction jobs
    (FilenameInputFormat semantics: one record per file name).
    """
    pred = parse_date_filter(date_filter) if date_filter else None
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
            if pred is not None and not pred(st.st_mtime):
                continue
            rows.append((full, st.st_size, datetime.utcfromtimestamp(st.st_mtime)))
    df = spark.createDataFrame(rows, "path: string, size: long, mtime: timestamp")
    return df.repartition(num_partitions) if num_partitions else df
