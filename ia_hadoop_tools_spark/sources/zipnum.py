"""ZipNum blocked-gzip codec — Wayback interchange-format compatibility.

Format (cdx/notes.txt:1-36, mapreduce/ZipNumOutputFormat.java:32-156,
ZipNumRecordWriter.java:119-201): a SHARD is sorted CDX text compressed as
CONCATENATED GZIP MEMBERS of a fixed line count (default 3000); a sidecar idx
has one line per member: ``firstKey \t shard \t offset \t length``; a CLUSTER
directory adds ``ALL.summary`` (sorted concat of the idx files) and
``manifest.txt``.

This is the one operator family Spark genuinely lacks, implemented with
``mapPartitions`` + Python gzip (SURVEY.md §7.4 hard part #2):

- ``write_zipnum``: range-sorted partitions -> one shard per partition,
  written executor-side with the reference's TMP+atomic-rename protocol
  (jobs/CDXGenerator.java:123-136); idx entries come back as the job result
  (not a side channel), ALL.summary is their sorted projection.
- ``read_zipnum``: idx-driven ranged reads — each task opens only its blocks'
  byte ranges (the GZIPRangeLineDereferencingRecordReader pattern).
- ``zipnum_range``: bounded [start, end) scan that prunes to covering blocks
  via the summary BEFORE any data I/O — the reference's binary search over
  ALL.summary expressed as a DataFrame filter over the idx table.

The native engine stores clusters as sorted Parquet (operators/cluster.py);
this codec exists for interchange with Wayback-era tooling, and its envelope
structure (3000-line members) is preserved byte-semantically.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.schemas import ZIPNUM_IDX_SCHEMA
from ia_hadoop_tools_spark.sources import fsio

DEFAULT_LINES_PER_BLOCK = 3000  # conf.zipnum.count, ZipNumOutputFormat.java:33-34


def _summary_key(line: str) -> str:
    """First two CDX fields, tabs %09-escaped (ZipNumRecordWriter.java:94-112)."""
    parts = line.split(" ", 2)
    key = " ".join(parts[:2])
    return key.replace("\t", "%09")


def _write_shard(
    part_id: int,
    lines: Iterator[str],
    out_dir: str,
    lines_per_block: int,
    filesystem=None,
) -> Iterator[Row]:
    """Executor-side shard writer: TMP + atomic rename, one gzip member per
    ``lines_per_block`` lines; yields idx rows. All I/O goes through
    :mod:`fsio`, so ``out_dir`` may be local, ``hdfs://`` or ``s3://``."""
    from pyspark import TaskContext

    shard = f"part-{part_id:05d}.gz"
    final = fsio.join(out_dir, shard)
    # ATTEMPT-unique tmp (the write_kvstore pattern): a fixed .TMP name
    # lets speculative/zombie attempts interleave writes into one file
    # and commit a corrupt shard; rename stays the commit point
    ctx = TaskContext.get()
    attempt = ctx.taskAttemptId() if ctx is not None else 0
    tmp = f"{final}.{attempt}.TMP"
    idx_rows: list[Row] = []
    offset = 0
    buf: list[str] = []
    wrote_any = False

    def flush(fh) -> None:
        nonlocal offset, buf
        if not buf:
            return
        # mtime=0 pins the 4-byte MTIME header field: identical input lines
        # produce byte-identical shards on every run (golden-testable, and
        # re-runs of an idempotent job produce rsync-stable outputs)
        payload = gzip.compress("".join(buf).encode("utf-8"), mtime=0)
        fh.write(payload)
        idx_rows.append(
            Row(
                summary_key=_summary_key(buf[0].rstrip("\n")),
                shard=shard,
                offset=offset,
                length=len(payload),
            )
        )
        offset += len(payload)
        buf = []

    with fsio.open_write(tmp, filesystem) as fh:
        for line in lines:
            wrote_any = True
            if not line.endswith("\n"):
                line += "\n"
            buf.append(line)
            if len(buf) >= lines_per_block:
                flush(fh)
        flush(fh)
    if wrote_any:
        fsio.rename(tmp, final, filesystem)  # atomic commit (rename protocol)
    else:
        fsio.remove(tmp, filesystem)
        return iter(())
    # per-shard idx sidecar (ZipNumRecordWriter.java:190-201 writes these
    # alongside each shard; SummaryGenerator later concatenates them)
    summary = final[: -len(".gz")] + ".summary"
    stmp = f"{summary}.{attempt}.TMP"
    with fsio.open_write_text(stmp, filesystem) as sfh:
        for r in idx_rows:
            sfh.write(f"{r.summary_key}\t{r.shard}\t{r.offset}\t{r.length}\n")
    fsio.rename(stmp, summary, filesystem)
    return iter(idx_rows)


def write_zipnum(
    df: DataFrame,
    out_dir: str,
    lines_per_block: int = DEFAULT_LINES_PER_BLOCK,
    num_shards: int | None = None,
    value_col: str = "value",
    sort: bool = True,
    filesystem=None,
) -> DataFrame:
    """Write a text DataFrame as a ZipNum cluster directory; returns the idx
    DataFrame (summary_key, shard, offset, length), also persisted as
    ALL.summary + manifest.txt.

    ``out_dir`` may be a local path or any URI pyarrow.fs resolves
    (``hdfs://``, ``s3://``, …); pass ``filesystem=`` to supply your own
    FileSystem object (it is pickled into the executor closure).
    """
    fsio.makedirs(out_dir, filesystem)
    # Re-running into a non-empty dir with different sharding must not leave
    # a previous run's shards beside fresh metadata: ALL.summary is scoped to
    # this job's shard set (below), and stale part-*.gz / part-*.summary /
    # uncommitted *.TMP files are removed up front so the directory IS the
    # cluster (the reference treats the output dir as job-owned:
    # mapreduce/ZipNumOutputFormat.java:87-128 names every file it commits).
    import re as _re

    for f in fsio.listdir(out_dir, filesystem):
        if f.endswith(".TMP") or _re.fullmatch(r"part-\d+\.(gz|summary)", f):
            fsio.remove(fsio.join(out_dir, f), filesystem)
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("string").alias("v"))
    if sort:
        if num_shards:
            vals = vals.repartitionByRange(num_shards, "v")
        else:
            vals = vals.repartitionByRange("v")
        vals = vals.sortWithinPartitions("v")

    lpb, fs_obj = lines_per_block, filesystem

    def writer(pid: int, it: Iterator[Row]) -> Iterator[Row]:
        def checked(rows):
            for r in rows:
                v = r["v"]
                # loud validation: a NULL value would die deep in the
                # writer with a bare AttributeError, and an embedded
                # newline silently SPLITS the record (fabricating rows on
                # read); a tab in the key fields would corrupt the TSV
                # sidecar / sort differently after %09-escaping
                if v is None:
                    raise ValueError("write_zipnum: null value row")
                if "\n" in v or "\r" in v:
                    raise ValueError(
                        f"write_zipnum: value contains a newline: {v[:80]!r}"
                    )
                head = v.split(" ", 2)[:2]
                if any("\t" in fld for fld in head):
                    raise ValueError(
                        "write_zipnum: tab inside the first two (key) "
                        f"fields: {v[:80]!r}"
                    )
                yield v

        return _write_shard(pid, checked(it), out_dir, lpb, fs_obj)

    # eager localCheckpoint, NOT cache(): the writer has side effects
    # (shard files), so the lineage must never re-run; the checkpoint cuts
    # it, and the caller may safely unpersist the returned idx when done
    # (a long session writing many clusters should — each idx pins one
    # block-count-sized table otherwise)
    idx = spark.createDataFrame(
        vals.rdd.mapPartitionsWithIndex(writer), ZIPNUM_IDX_SCHEMA
    ).localCheckpoint(eager=True)

    # ALL.summary: the per-shard idx sidecars (written executor-side, already
    # offset-ordered; shard order == range-partition order) are streamed into
    # one file (cdx/SummaryGenerator.java:46-122). No driver-side row
    # materialization — at 100 TB the summary is ~300M lines, and this is a
    # file-to-file concat, not a collect(). THIS JOB'S shard set (from the
    # idx result, a few rows per shard) scopes both sidecar aggregation
    # steps — globbing the directory instead would silently merge stale
    # shards from a previous run with different sharding into the cluster
    # metadata.
    job_shards = sorted({r["shard"] for r in idx.select("shard").distinct().collect()})
    summary_generator(out_dir, shards=job_shards, filesystem=filesystem)
    manifest_aggregator(out_dir, job_shards, filesystem=filesystem)
    return idx


def summary_generator(
    cluster_dir: str, shards: list[str] | None = None, filesystem=None
) -> int:
    """Rebuild ``ALL.summary`` from the per-shard ``*.summary`` sidecars
    (cdx/SummaryGenerator.java:46-122).

    ``shards`` (``.gz`` basenames) scopes the aggregation to a known shard
    set — ``write_zipnum`` passes its own job's shards so stale files from a
    previous run can never leak into the cluster metadata. With ``None`` the
    directory is globbed (standalone CLI rebuild of a whole cluster).

    Pairs each ``<shard>.summary`` with its ``<shard>.gz`` (sanity check
    :75-79 — a summary without its data file aborts), concatenates them in
    sorted shard order, and rewrites ``ALL.summary`` atomically. Returns the
    number of idx lines written. Driver-side by design: the summary is
    ~1/3000 of the data, and this runs as the post-job finalization step
    (§3.1 step 4), not inside the dataflow.
    """
    def stem_key(stem: str):
        # numeric-aware: plain string sort puts part-100000 before
        # part-99999, silently breaking ALL.summary's global key order
        # past 100k shards (the 100 TB sizing)
        import re

        m = re.match(r"^(.*?)(\d+)$", stem)
        return (m.group(1), int(m.group(2))) if m else (stem, -1)

    if shards is None:
        stems = sorted(
            (
                f[: -len(".summary")]
                for f in fsio.listdir(cluster_dir, filesystem)
                if f.endswith(".summary") and f != "ALL.summary"
            ),
            key=stem_key,
        )
    else:
        stems = sorted(
            (s[: -len(".gz")] if s.endswith(".gz") else s for s in shards),
            key=stem_key,
        )
    for s in stems:
        if not fsio.exists(fsio.join(cluster_dir, s + ".gz"), filesystem):
            raise IOError(f"summary {s}.summary has no matching {s}.gz")
    n = 0
    out = fsio.join(cluster_dir, "ALL.summary")
    with fsio.open_write_text(out + ".TMP", filesystem) as fh:
        for s in stems:
            with fsio.open_read_text(
                fsio.join(cluster_dir, s + ".summary"), filesystem
            ) as sfh:
                for line in sfh:
                    fh.write(line)
                    n += 1
    fsio.rename(out + ".TMP", out, filesystem)
    return n


def manifest_aggregator(
    cluster_dir: str, source_basenames: list[str], filesystem=None
) -> str:
    """Write a sorted, deduplicated ``manifest.txt`` of source basenames
    (cdx/ManifestAggregator.java:34-81 — the reference heap-merges per-shard
    sorted manifests; with a driver-side set the result is identical)."""
    out = fsio.join(cluster_dir, "manifest.txt")
    with fsio.open_write_text(out + ".TMP", filesystem) as fh:
        for b in sorted(set(source_basenames)):
            fh.write(b + "\n")
    fsio.rename(out + ".TMP", out, filesystem)
    return out


def block_lines(text: str) -> list[str]:
    """Split a decompressed block into record lines.

    Records are framed by ``\\n`` ONLY (the writer's contract in
    ``_write_shard``); ``str.splitlines()`` would also split on
    ``\\x0b``/``\\x0c``/``\\x85``/U+2028/U+2029 INSIDE a value, so a line
    carrying one of those bytes would read back as two corrupt rows.
    Shared by ``_read_blocks`` and the ``zipnum`` DataSource reader.
    """
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # writer terminates the block with a trailing \n
    return lines


def iter_summary_rows(cluster_dir: str, filesystem=None):
    """Stream ALL.summary as (key, shard, offset, length) tuples — the one
    TSV parse shared by ``load_summary``'s fsio branch, the served-cluster
    pager and the ``zipnum`` DataSource planner. A generator so planners
    can stream a 100 TB cluster's ~300M-line summary in O(1) memory."""
    with fsio.open_read_text(
        fsio.join(cluster_dir, "ALL.summary"), filesystem
    ) as fh:
        for line in fh:
            key, shard, off, length = line.rstrip("\n").split("\t")
            yield (key, shard, int(off), int(length))


def read_summary_rows(
    cluster_dir: str, filesystem=None
) -> list[tuple[str, str, int, int]]:
    """Materialized :func:`iter_summary_rows` (driver-sized clusters)."""
    return list(iter_summary_rows(cluster_dir, filesystem))


def _gunzip_salvage(payload: bytes) -> tuple[str, bool]:
    """Decompress concatenated gzip members, salvaging what precedes any
    corruption.

    Returns ``(text, clean)``. On a corrupt/truncated member the reference
    degrades to EOF after two attempts rather than failing the task
    (mapreduce/GZIPRangeLineDereferencingRecordReader.java:94-109,
    streaming/GzipSingleFileRecordReader.java:89-113); here the complete
    members before the bad one are kept, plus the bad member's output up to
    its last complete line.
    """
    import zlib

    try:
        return gzip.decompress(payload).decode("utf-8"), True
    except (OSError, EOFError, zlib.error, UnicodeDecodeError):
        pass
    parts: list[bytes] = []
    data = payload
    while data:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data)
        except zlib.error:
            break
        parts.append(out)
        if not d.eof:  # truncated mid-member
            break
        data = d.unused_data
    text = b"".join(parts).decode("utf-8", errors="replace")
    # drop a trailing partial line — it was cut mid-record
    if text and not text.endswith("\n"):
        nl = text.rfind("\n")
        text = text[: nl + 1] if nl >= 0 else ""
    return text, False


def _read_blocks(
    out_dir: str,
    rows: Iterator[Row],
    start: str | None,
    end: str | None,
    skip_bad: bool = False,
    bad_acc=None,
    filesystem=None,
) -> Iterator[Row]:
    """Ranged-read + gunzip idx blocks; bound emitted lines to [start, end).

    ``skip_bad`` is the reference's ``--skip-bad`` tolerance: corrupt or
    truncated members are salvaged to their last complete line, counted in
    ``bad_acc`` (a Spark accumulator) and logged, instead of failing the
    task. Without it, corruption raises — a 100 TB job should not silently
    lose data unless the operator asked for it.
    """
    import logging

    log = logging.getLogger(__name__)
    for r in rows:
        path = fsio.join(out_dir, r["shard"])
        try:
            payload = fsio.read_range(path, r["offset"], r["length"], filesystem)
        except OSError:
            if not skip_bad:
                raise
            log.warning("skip-bad: unreadable block %s@%s", r["shard"], r["offset"])
            if bad_acc is not None:
                bad_acc += 1
            continue
        text, clean = _gunzip_salvage(payload)
        if not clean:
            if not skip_bad:
                raise IOError(
                    f"corrupt gzip member in {r['shard']} at offset "
                    f"{r['offset']} (len {r['length']}); pass skip_bad=True "
                    f"to salvage"
                )
            log.warning(
                "skip-bad: corrupt member %s@%s, salvaged %d lines",
                r["shard"], r["offset"], text.count("\n"),
            )
            if bad_acc is not None:
                bad_acc += 1
        for line in block_lines(text):
            if start is not None or end is not None:
                key = line.split(" ", 2)
                k = " ".join(key[:2])
                if start is not None and k < start:
                    continue
                if end is not None and k >= end:
                    continue
            yield Row(value=line)


def read_zipnum(
    spark: SparkSession,
    cluster_dir: str,
    skip_bad: bool = False,
    filesystem=None,
) -> DataFrame:
    """Read a whole ZipNum cluster back into a text DataFrame ('value')."""
    return zipnum_range(
        spark, cluster_dir, None, None, skip_bad=skip_bad, filesystem=filesystem
    )


def load_summary(
    spark: SparkSession, cluster_dir: str, filesystem=None
) -> DataFrame:
    """ALL.summary as a DataFrame. Spark's own CSV reader handles every
    Hadoop-FS scheme (file/hdfs/s3a/gs/…); for pyarrow-only filesystems
    (explicit ``filesystem=`` or a non-Hadoop URI) the summary — 1/3000 of
    the data — is read driver-side through fsio and parallelized."""
    path = fsio.join(cluster_dir, "ALL.summary")
    if filesystem is None and fsio.spark_can_read(path):
        # quote disabled: the file is RAW tab-separated text; the CSV
        # default quote='"' would strip/merge around a double quote in a
        # SURT key (real in archived query strings), silently corrupting
        # summary keys on this fast path only
        df = (
            spark.read.schema(ZIPNUM_IDX_SCHEMA)
            .option("sep", "\t")
            .option("quote", "")
            .csv(path)
        )
        # CSV PERMISSIVE mode nulls empty fields; the fsio branch returns
        # '' for an empty key — coalesce so a null summary_key can never
        # make a range predicate three-valued and silently drop the block
        return df.withColumn(
            "summary_key", F.coalesce(F.col("summary_key"), F.lit(""))
        )
    return spark.createDataFrame(
        read_summary_rows(cluster_dir, filesystem), ZIPNUM_IDX_SCHEMA
    )


def zipnum_range(
    spark: SparkSession,
    cluster_dir: str,
    start: str | None,
    end: str | None,
    num_tasks: int | None = None,
    skip_bad: bool = False,
    filesystem=None,
) -> DataFrame:
    """Bounded [start, end) scan over a ZipNum cluster.

    Block pruning happens on the summary DataFrame before any data I/O: a
    block is fetched iff its key range [summary_key, next_summary_key) can
    intersect [start, end) — exactly CDXCluster.getRangeBlockIterator's
    binary-search semantics (cdx/CDXCluster.java:31-43).

    With ``skip_bad`` (the reference's ``--skip-bad``), corrupt members are
    salvaged + counted instead of failing the job; the skip count is exposed
    as ``df.skip_bad_count`` (a Spark accumulator, valid after an action;
    accumulators in transformations are AT-LEAST-ONCE — task retries or
    recomputation can overcount, so treat it as an upper-bound signal,
    not an exact tally).
    """
    from pyspark.sql import Window

    summary = load_summary(spark, cluster_dir, filesystem)
    if start is not None or end is not None:
        # lead() partitioned BY SHARD, not globally: the global-order window
        # would funnel the whole summary (1/3000 of the data — GBs at 100 TB)
        # through one task. Shards are alphabetically contiguous, so within a
        # shard the next block's key bounds this block exactly; each shard's
        # LAST block gets a null next-key and is kept conservatively (at most
        # one extra block fetched per shard).
        w = Window.partitionBy("shard").orderBy("summary_key", "offset")
        summary = summary.withColumn("__next_key", F.lead("summary_key").over(w))
        if end is not None:
            summary = summary.filter(F.col("summary_key") < end)
        if start is not None:
            summary = summary.filter(
                F.col("__next_key").isNull() | (F.col("__next_key") >= start)
            )
        summary = summary.drop("__next_key")
    if num_tasks:
        summary = summary.repartition(num_tasks)

    s, e, d, sb, fs_obj = start, end, cluster_dir, skip_bad, filesystem
    acc = spark.sparkContext.accumulator(0) if skip_bad else None

    def loader(rows: Iterator[Row]) -> Iterator[Row]:
        return _read_blocks(
            d, rows, s, e, skip_bad=sb, bad_acc=acc, filesystem=fs_obj
        )

    rdd = summary.rdd.mapPartitions(loader)
    df = spark.createDataFrame(rdd, "value: string")
    if acc is not None:
        df.skip_bad_count = acc
    return df
