"""Sorted key-value store connector: the HBase load/store pattern, Spark-first.

The reference ships an HBase Pig connector (pig/HBaseStorage.java:96-330 —
row-key range scan options ``-gt/-gte/-lt/-lte``, ``-loadKey``, per-region
``-limit``, a column list projected per row) and an HFile bulk-loader
(pig/HFileStorage.java:51-263 — rows range-partitioned and sorted so each
output file is one region's worth of ordered cells). This module re-expresses
that pattern against a self-contained sorted-KV layout so the connector
logic is testable without an HBase cluster; swapping the file I/O for a real
KV client keeps every other line:

- **Layout** (an HBase region/HFile miniature): ``region-NNNNN.kvz`` gzip
  text files of cells ``rowkey\\tcolumn\\tts\\tvalue`` sorted by (rowkey,
  column, ts DESC), plus a ``_REGIONS`` meta-index ``file\\tfirst\\tlast``
  — the META-table equivalent that drives region pruning.
- **Bulk load** (:func:`write_kvstore`): ``repartitionByRange(rowkey)`` +
  ``sortWithinPartitions`` + one region file per partition (TMP+rename),
  exactly HFileStorage's contract: globally range-partitioned, locally
  sorted, ready for ordered ingestion.
- **Scan** (the ``sortedkv`` Spark data source): one input partition per
  region; ``pushFilters`` turns row-key comparisons into region pruning via
  the meta-index BEFORE any data I/O (partial pushdown — every filter is
  re-evaluated row-level by Spark, so correctness never depends on
  pruning), and the in-region read early-terminates past the upper bound
  because cells are sorted.
- **Row facade** (:func:`read_kv_columns`): HBaseStorage's column-list
  semantics — latest-timestamp cell per (rowkey, column), pivoted to one
  row per key with the requested columns.

Keys and column qualifiers must not contain tab/newline (binary HBase keys
would be base64-coded by the caller); values are escaped.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

KV_SCHEMA = "rowkey string, column string, ts long, value string"
REGIONS_FILE = "_REGIONS"


def _esc(v: str) -> str:
    # \r included: a raw carriage return in a VALUE would otherwise be
    # treated as a line terminator by a universal-newline reader,
    # truncating the value and crashing on the orphaned remainder
    return (
        v.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _unesc(v: str) -> str:
    out = []
    it = iter(v)
    for ch in it:
        if ch != "\\":
            out.append(ch)
            continue
        nxt = next(it, "")
        out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, nxt))
    return "".join(out)


def write_kvstore(
    df: DataFrame,
    path: str,
    num_regions: int | None = None,
) -> None:
    """Bulk-load ``(rowkey, column, ts, value)`` cells into a sorted store.

    The HFileStorage contract: range-partition on rowkey (region boundaries
    come from Spark's reservoir sampling, the analog of presplit points),
    sort within each partition by (rowkey, column, ts DESC), write one
    region file per partition under a TMP name and rename on success, then
    commit the ``_REGIONS`` meta-index last — readers never observe a
    half-written store.
    """
    import gzip

    from pyspark import TaskContext

    from ia_hadoop_tools_spark.sources import fsio

    cells = df.select(
        F.col("rowkey").cast("string"),
        F.col("column").cast("string"),
        F.col("ts").cast("long"),
        F.col("value").cast("string"),
    )
    if num_regions:
        cells = cells.repartitionByRange(num_regions, "rowkey")
    else:
        cells = cells.repartitionByRange("rowkey")
    cells = cells.sortWithinPartitions("rowkey", "column", F.desc("ts"))

    fsio.makedirs(path)

    def _write_region(it):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # ATTEMPT-unique tmp name (the OutputCommitter pattern): with
        # speculative execution two attempts of one partition would
        # otherwise interleave writes into the same tmp file and commit
        # a corrupt region; rename-to-final stays the commit point
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        name = f"region-{pid:05d}.kvz"
        tmp = fsio.join(path, f"_tmp.{attempt}.{name}")
        first = last = None
        n = 0
        out = None
        gz = None
        ok = False
        try:
            for row in it:
                if out is None:  # open lazily: empty partitions write nothing
                    out = fsio.open_write(tmp)
                    gz = gzip.GzipFile(fileobj=out, mode="wb", mtime=0)
                if row.rowkey is None or row.column is None:
                    raise ValueError(
                        "write_kvstore: rowkey/column must be non-null "
                        f"(got rowkey={row.rowkey!r}, column={row.column!r})"
                    )
                # enforce the documented no-separator contract loudly: a
                # tab/newline in a key would shift fields on read (binary
                # keys must be base64-coded by the caller)
                for bad in ("\t", "\n", "\r"):
                    if bad in row.rowkey or bad in row.column:
                        raise ValueError(
                            "write_kvstore: rowkey/column must not contain "
                            f"tab/newline (got rowkey={row.rowkey!r}, "
                            f"column={row.column!r})"
                        )
                if first is None:
                    first = row.rowkey
                last = row.rowkey
                line = "\t".join(
                    (
                        row.rowkey,
                        row.column,
                        str(row.ts if row.ts is not None else 0),
                        _esc(row.value if row.value is not None else ""),
                    )
                )
                # streamed straight to the target fs — a region never
                # accumulates in executor memory
                gz.write(line.encode("utf-8") + b"\n")
                n += 1
            ok = True
        finally:
            if gz is not None:
                gz.close()
            if out is not None:
                out.close()
            if not ok and out is not None:
                # task aborting: drop this attempt's tmp now (best-effort —
                # a killed JVM can't run this, so the driver also sweeps
                # survivors after the index commit)
                try:
                    fsio.remove(tmp)
                except OSError:
                    pass
        if n == 0:
            return
        fsio.rename(tmp, fsio.join(path, name))
        yield (name, first, last, n)

    regions = sorted(
        cells.rdd.mapPartitions(_write_region).collect()
    )  # one row per region — driver-sized metadata, like a META table
    tmp_idx = fsio.join(path, f"_tmp.{REGIONS_FILE}")
    with fsio.open_write_text(tmp_idx) as fh:
        for name, first, last, n in regions:
            fh.write(f"{name}\t{first}\t{last}\t{n}\n")
    fsio.rename(tmp_idx, fsio.join(path, REGIONS_FILE))
    # sweep orphaned attempt tmp files (failed/killed speculative attempts
    # whose finally-block never ran). Readers already ignore them via the
    # regions index; this keeps the directory from accumulating partials.
    # Safe AFTER the index commit: every live region was renamed away from
    # its _tmp name before its metadata row was collected.
    for leftover in fsio.listdir(path):
        base = leftover.rsplit("/", 1)[-1]
        if base.startswith("_tmp."):
            try:
                fsio.remove(fsio.join(path, base))
            except OSError:
                pass


def read_regions_index(path: str) -> list[tuple[str, str, str, int]]:
    from ia_hadoop_tools_spark.sources import fsio

    rows = []
    with fsio.open_read_text(fsio.join(path, REGIONS_FILE)) as fh:
        for line in fh:
            name, first, last, n = line.rstrip("\n").split("\t")
            rows.append((name, first, last, int(n)))
    return rows


class KVRegion(InputPartition):
    def __init__(self, file: str):
        self.file = file


class SortedKVReader(DataSourceReader):
    """Region-pruning reader (HBaseStorage scan semantics).

    ``pushFilters`` collects row-key bounds (gt/gte/lt/lte/eq — the same
    option surface HBaseStorage exposes) and prunes whole regions via the
    meta-index; bounds are ALSO applied in-region (sorted cells: skip until
    start, stop past end), and every filter is returned to Spark for exact
    re-evaluation. ``limit`` caps rows per region, mirroring -limit.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sortedkv source requires .load(<store dir>)")
        # "is not None"-style presence check: the option arrives as a
        # string, so a plain truthiness test would drop limit="0"
        self.limit = (
            int(options["limit"]) if options.get("limit") is not None else None
        )
        # comma-separated qualifier projection (HBaseStorage's columnList):
        # non-matching cells are dropped DURING the region stream, before
        # any row reaches Spark
        cols = options.get("columns")
        self.columns = set(cols.split(",")) if cols else None
        self.start: str | None = None  # inclusive
        self.end: str | None = None  # inclusive upper bound
        self.end_exclusive = False

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if getattr(f, "attribute", None) == ("rowkey",):
                v = getattr(f, "value", None)
                if isinstance(v, str):
                    if isinstance(f, (GreaterThanOrEqual, GreaterThan)):
                        # gt prunes like gte at region granularity; the
                        # returned filter restores strictness row-level
                        if self.start is None or v > self.start:
                            self.start = v
                    elif isinstance(f, LessThanOrEqual):
                        if self.end is None or v < self.end:
                            self.end, self.end_exclusive = v, False
                    elif isinstance(f, LessThan):
                        if self.end is None or v <= self.end:
                            self.end, self.end_exclusive = v, True
                    elif isinstance(f, EqualTo):
                        if self.start is None or v > self.start:
                            self.start = v
                        if self.end is None or v < self.end:
                            self.end, self.end_exclusive = v, False
            yield f  # partial pushdown: Spark re-checks every predicate

    def schema(self) -> str:
        return KV_SCHEMA

    def partitions(self) -> Sequence[KVRegion]:
        parts = []
        for name, first, last, _ in read_regions_index(self.path):
            if self.start is not None and last < self.start:
                continue
            if self.end is not None and (
                first > self.end
                or (self.end_exclusive and first >= self.end)
            ):
                continue
            parts.append(KVRegion(name))
        # never return []: pyspark substitutes [None] for an empty partition
        # list and read(None) would crash — same guard as the zipnum reader
        return parts or [KVRegion("")]

    def read(self, partition: KVRegion) -> Iterator[tuple]:
        import gzip
        import io

        from ia_hadoop_tools_spark.sources import fsio

        if partition is None or not partition.file:  # fully-pruned scan
            return
        fs, p = fsio.resolve(fsio.join(self.path, partition.file))
        n = 0
        with fs.open_input_stream(p) as raw:
            # stream-decode: the upper-bound early-break means a bounded
            # scan never decompresses the rest of the region
            # newline="\n": the writer terminates records with \n only;
            # universal-newline mode would additionally split on any raw
            # \r that predates the _esc CR coverage
            text = io.TextIOWrapper(
                io.BufferedReader(gzip.GzipFile(fileobj=raw)),
                encoding="utf-8",
                newline="\n",
            )
            for line in text:
                rowkey, column, ts, value = line.rstrip("\n").split("\t", 3)
                if self.start is not None and rowkey < self.start:
                    continue
                if self.end is not None:
                    if rowkey > self.end or (
                        self.end_exclusive and rowkey >= self.end
                    ):
                        break  # sorted region: nothing later can match
                if self.columns is not None and column not in self.columns:
                    continue
                # limit checked BEFORE the yield so limit=0 scans empty
                if self.limit is not None and n >= self.limit:
                    break
                yield (rowkey, column, int(ts), _unesc(value))
                n += 1


class SortedKVDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sortedkv"

    def schema(self) -> str:
        return KV_SCHEMA

    def reader(self, schema) -> SortedKVReader:
        return SortedKVReader(self.options)


def register_sortedkv(spark: SparkSession) -> None:
    spark.dataSource.register(SortedKVDataSource)


def read_kv_columns(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    load_key: bool = True,
    gt: str | None = None,
    gte: str | None = None,
    lt: str | None = None,
    lte: str | None = None,
    limit_per_region: int | None = None,
) -> DataFrame:
    """HBaseStorage facade: one row per rowkey with the requested columns.

    Option-for-option with the reference loader (HBaseStorage.java:137-146):
    ``gt/gte/lt/lte`` row-key bounds (pushed into region pruning),
    ``load_key`` controls whether the rowkey is projected, ``limit_per_region``
    caps each region scan. Cell resolution is newest-timestamp-wins with a
    deterministic value tiebreak (HBase returns the max-ts cell version).
    """
    register_sortedkv(spark)
    bad = [c for c in columns if "," in c]
    if bad:
        # the DataSource option is comma-joined; a comma qualifier would
        # silently split into bogus qualifiers and return all-null cells
        raise ValueError(
            f"column qualifiers may not contain ',': {bad!r} — read the "
            "full table and filter on the column cell instead"
        )
    r = spark.read.format("sortedkv").option("columns", ",".join(columns))
    if limit_per_region is not None:
        r = r.option("limit", str(limit_per_region))
    cells = r.load(path)
    if gt is not None:
        cells = cells.filter(F.col("rowkey") > gt)
    if gte is not None:
        cells = cells.filter(F.col("rowkey") >= gte)
    if lt is not None:
        cells = cells.filter(F.col("rowkey") < lt)
    if lte is not None:
        cells = cells.filter(F.col("rowkey") <= lte)
    cells = cells.filter(F.col("column").isin(*columns))
    row = (
        cells.groupBy("rowkey")
        .pivot("column", list(columns))
        .agg(F.expr("max_by(value, struct(ts, value))"))
    )
    if not load_key:
        row = row.drop("rowkey")
    return row
