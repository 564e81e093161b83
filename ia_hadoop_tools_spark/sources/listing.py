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


def _utc_dt(ts: float):
    """Timezone-AWARE UTC datetime: a naive utcfromtimestamp value
    is reinterpreted in the Spark session timezone by
    createDataFrame, shifting every mtime by the UTC offset on
    non-UTC clusters; aware datetimes convert correctly."""
    from datetime import datetime, timezone

    return datetime.fromtimestamp(ts, timezone.utc)


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


#: past this many driver-walked entries, list_files_df hands off to the
#: distributed walk (the 10M+-file LSR case should never serialize through
#: one os.walk loop)
AUTO_DISTRIBUTE_THRESHOLD = 100_000


def list_files_df(
    spark: SparkSession,
    root: str,
    extensions: tuple[str, ...] = (),
    include_hidden: bool = False,
    min_mtime: float | None = None,
    max_mtime: float | None = None,
    date_filter: str | None = None,
    num_partitions: int | None = None,
    auto_distribute_threshold: int | None = AUTO_DISTRIBUTE_THRESHOLD,
) -> DataFrame:
    """Recursive file enumeration -> DataFrame(path, size, mtime).

    Small trees walk driver-side (file listings are metadata — tiny next
    to data); the returned DataFrame is the fan-out axis for per-file
    extraction jobs (FilenameInputFormat semantics: one record per file
    name). Past ``auto_distribute_threshold`` enumerated files — or for
    any non-local URI root — the call routes itself to
    :func:`list_files_df_distributed`, so callers never driver-walk a
    10M-file tree by accident (pass ``None`` to force the driver walk).
    """
    from ia_hadoop_tools_spark.sources import fsio

    if fsio.has_scheme(root):  # URI roots (file/hdfs/s3/gs) walk via pyarrow
        return list_files_df_distributed(
            spark, root, extensions, include_hidden, min_mtime, max_mtime,
            date_filter, num_partitions=num_partitions,
        )
    pred = parse_date_filter(date_filter) if date_filter else None
    extensions = tuple(extensions)  # hoisted: not rebuilt per file below
    # abspath so the driver walk and the distributed walk (which resolves
    # through pyarrow and always yields absolute paths) return the SAME
    # path shape whichever side of the threshold a tree lands on
    root = os.path.abspath(root)

    def _unreadable(e: OSError):
        # same contract as the distributed walk's shipped-subtree raise:
        # a swallowed PermissionError (os.walk's default) would return a
        # silently PARTIAL listing — the worst failure mode for a corpus
        # enumeration
        raise e

    rows = []
    seen = 0
    for dirpath, dirnames, filenames in os.walk(root, onerror=_unreadable):
        if not include_hidden:
            dirnames[:] = [d for d in dirnames if _visible(d)]
        # the threshold counts ENUMERATED files, not kept rows — a 10M-file
        # tree with a selective filter must still route to the distributed
        # walk instead of serializing through this loop
        seen += len(filenames)
        if (
            auto_distribute_threshold is not None
            and seen > auto_distribute_threshold
        ):
            # the distributed walk runs IN executors: a schemeless local
            # path only means the same tree there on a local[*] master —
            # on a real cluster each worker would list ITS OWN disk
            # (silently wrong listing), so refuse and name the remedies
            if not spark.sparkContext.master.startswith("local"):
                raise ValueError(
                    f"{root!r} exceeded auto_distribute_threshold="
                    f"{auto_distribute_threshold} but is a local path on a "
                    "non-local master — executors cannot see the driver's "
                    "disk. Pass a shared-filesystem URI (file:// on NFS, "
                    "hdfs://, s3://) to distribute the walk, or "
                    "auto_distribute_threshold=None to force the driver "
                    "walk."
                )
            return list_files_df_distributed(
                spark, root, extensions, include_hidden, min_mtime,
                max_mtime, date_filter, num_partitions=num_partitions,
            )
        for fn in filenames:
            if not include_hidden and not _visible(fn):
                continue
            if extensions and not fn.endswith(extensions):
                continue
            full = os.path.join(dirpath, fn)
            try:
                st = os.stat(full)
            except FileNotFoundError:
                # dangling symlink, or deleted between walk and stat —
                # the same vanish-mid-walk race the distributed path
                # tolerates; anything else (PermissionError) stays loud
                continue
            if min_mtime is not None and st.st_mtime < min_mtime:
                continue
            if max_mtime is not None and st.st_mtime >= max_mtime:
                continue
            if pred is not None and not pred(st.st_mtime):
                continue
            rows.append((full, st.st_size, _utc_dt(st.st_mtime)))
    df = spark.createDataFrame(rows, "path: string, size: long, mtime: timestamp")
    return df.repartition(num_partitions) if num_partitions else df


_LISTING_SCHEMA = "path: string, size: long, mtime: timestamp"


def _visible(name: str) -> bool:
    return not name.startswith((".", "_"))


def _walk_subtree(
    dir_path: str,
    uri_prefix: str,
    extensions: tuple[str, ...],
    include_hidden: bool,
    min_mtime: float | None,
    max_mtime: float | None,
    pred,
):
    """Recursively list one subtree through pyarrow.fs — runs IN the worker.

    ``dir_path`` is a scheme-stripped pyarrow path (``info.path`` — e.g.
    ``bucket/key`` for s3); ``uri_prefix`` is the original root's
    ``scheme://authority`` prefix, re-attached before resolving so the
    worker lands on the SAME filesystem as the driver (a bare resolve
    would silently fall back to LocalFileSystem). The filesystem is
    re-resolved inside the task (fs handles don't need to pickle);
    hidden-dir pruning walks level-by-level, so a hidden subtree costs one
    listing call, not a full descent. A failure listing the shipped
    subtree root RAISES (a silently skipped frontier entry = silently
    partial results); directories that vanish mid-walk are tolerated.
    """
    from datetime import datetime

    from pyarrow import fs as pafs

    from ia_hadoop_tools_spark.sources import fsio

    fs, p = fsio.resolve(uri_prefix + dir_path)
    root_path = p
    stack = [p]
    while stack:
        cur = stack.pop()
        try:
            infos = fs.get_file_info(pafs.FileSelector(cur, recursive=False))
        except OSError:
            if cur == root_path:
                raise OSError(
                    f"cannot list shipped subtree {uri_prefix + dir_path!r}"
                    " — results would be silently partial"
                )
            continue  # dir vanished between discovery and walk: a race
        for info in infos:
            name = info.base_name
            if not include_hidden and not _visible(name):
                continue
            if info.type == pafs.FileType.Directory:
                stack.append(info.path)
                continue
            if info.type != pafs.FileType.File:
                continue
            if extensions and not name.endswith(extensions):
                continue
            mt = info.mtime
            mts = mt.timestamp() if mt is not None else 0.0
            if min_mtime is not None and mts < min_mtime:
                continue
            if max_mtime is not None and mts >= max_mtime:
                continue
            if pred is not None and not pred(mts):
                continue
            yield (
                uri_prefix + info.path,
                int(info.size or 0),
                _utc_dt(mts),
            )


def list_files_df_distributed(
    spark: SparkSession,
    root: str,
    extensions: tuple[str, ...] = (),
    include_hidden: bool = False,
    min_mtime: float | None = None,
    max_mtime: float | None = None,
    date_filter: str | None = None,
    fanout_depth: int = 2,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed recursive enumeration -> DataFrame(path, size, mtime).

    The 10M+-file form of :func:`list_files_df` (same filters, same output
    schema): the driver expands only the top ``fanout_depth`` directory
    levels (cheap — hundreds of listing calls), then ships each frontier
    subtree to an executor task that walks it via ``pyarrow.fs`` — so the
    walk parallelizes across the cluster and works on any pyarrow
    filesystem (local/HDFS/S3/GCS), mirroring the reference's client-side
    ``getSplits`` walk (pig/LSRPigLoader.java:77-146) lifted into tasks.

    Skew note: one giant subtree under a shallow frontier makes one hot
    task — raise ``fanout_depth`` to split deeper. Files living at depths
    shallower than the frontier are captured during driver expansion.
    """
    from datetime import datetime

    from pyarrow import fs as pafs

    from ia_hadoop_tools_spark.sources import fsio

    pred = parse_date_filter(date_filter) if date_filter else None
    extensions = tuple(extensions)  # hoisted: not rebuilt per entry below
    fs, base = fsio.resolve(root)
    # scheme://authority prefix of the original root: pyarrow's info.path
    # is scheme-stripped, so every path shipped to a worker (and every
    # returned row) gets the prefix back — a schemeless re-resolve would
    # silently fall back to LocalFileSystem on hdfs/s3/gs roots. Built
    # from the PARSED root (not suffix-matching, which breaks on '/' roots
    # and non-normalized paths): object-store fs paths keep the authority
    # (bucket) in the path ('bucket/key'), hdfs-like ones don't ('/path'),
    # so include the netloc in the prefix only when base does not carry it.
    if fsio.has_scheme(root):
        from urllib.parse import urlsplit

        u = urlsplit(root)
        if u.netloc and base.startswith(u.netloc):
            uri_prefix = f"{u.scheme}://"
        else:
            uri_prefix = f"{u.scheme}://{u.netloc}"
    else:
        uri_prefix = ""

    shallow_rows: list[tuple] = []
    frontier = [base]
    for _ in range(max(0, fanout_depth)):
        nxt: list[str] = []
        for d in frontier:
            for info in fs.get_file_info(pafs.FileSelector(d, recursive=False)):
                name = info.base_name
                if not include_hidden and not _visible(name):
                    continue
                if info.type == pafs.FileType.Directory:
                    nxt.append(info.path)
                elif info.type == pafs.FileType.File:
                    if extensions and not name.endswith(extensions):
                        continue
                    mt = info.mtime
                    mts = mt.timestamp() if mt is not None else 0.0
                    if min_mtime is not None and mts < min_mtime:
                        continue
                    if max_mtime is not None and mts >= max_mtime:
                        continue
                    if pred is not None and not pred(mts):
                        continue
                    shallow_rows.append(
                        (uri_prefix + info.path, int(info.size or 0),
                         _utc_dt(mts))
                    )
        frontier = nxt
        if not frontier:
            break

    shallow = spark.createDataFrame(shallow_rows, _LISTING_SCHEMA)
    if not frontier:
        out = shallow
    else:
        sc = spark.sparkContext
        n_slices = min(len(frontier), sc.defaultParallelism * 4)
        args = (
            uri_prefix, tuple(extensions), include_hidden, min_mtime,
            max_mtime, pred,
        )
        deep = spark.createDataFrame(
            sc.parallelize(sorted(frontier), n_slices).flatMap(
                lambda d: _walk_subtree(d, *args)
            ),
            _LISTING_SCHEMA,
        )
        out = shallow.unionByName(deep)
    return out.repartition(num_partitions) if num_partitions else out
