"""Versioned-directory commit protocol shared by the streaming sinks.

One publisher, many readers, any filesystem: each publish writes a fresh
``vNNN`` directory and creates a ``_PUBLISHED`` marker file LAST — a
plain create, atomic everywhere (local/HDFS/object stores), unlike
rename-with-overwrite which pyarrow's HDFS move rejects and object
stores emulate as copy+delete. Readers resolve the highest MARKED
version and never observe a half-written publish; a crash mid-save
leaves an unmarked dir that the next publish skips past (version
numbers come from ALL dirs, marked or not, so numbers are never
reused). The TMP+rename commit idea of jobs/CDXGenerator.java:123-136
applied to directory trees.

``prune_versions`` bounds a long-lived stream's storage and the
O(versions) listing cost per publish: keep the newest ``keep`` marked
versions, delete everything older (marker FIRST, so a reader that races
the delete sees a cleanly unpublished dir, not a marked dir with
missing data files). Retention assumes readers re-resolve versions per
query — a reader pinned to an old version for longer than ``keep``
publishes can lose it, the standard retention trade.
"""

from __future__ import annotations

from ia_hadoop_tools_spark.sources import fsio

PUBLISHED_MARKER = "_PUBLISHED"


def _list_version_dirs(root: str):
    """ONE non-recursive listing -> (filesystem, sorted [(version, path)])."""
    from pyarrow import fs as pafs

    fs, p = fsio.resolve(root)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except OSError:
        return None, []
    vers = [
        (int(i.base_name[1:]), i.path)
        for i in infos
        if i.base_name.startswith("v") and i.base_name[1:].isdigit()
    ]
    return fs, sorted(vers)


def _versions_with_markers(root: str) -> list[tuple[int, bool]]:
    """One directory listing + ONE batched marker stat -> sorted
    (version, published) pairs.

    Serves both the published and the stale-unmarked views so callers
    needing both (prune_versions) pay a single remote listing; the
    markers resolve in a single ``get_file_info([paths])`` batch rather
    than O(versions) serial round-trips (a recursive listing is NOT the
    answer — it would enumerate every payload file of every version)."""
    from pyarrow import fs as pafs

    fs, vers = _list_version_dirs(root)
    if not vers:
        return []
    markers = fs.get_file_info(
        [f"{path}/{PUBLISHED_MARKER}" for _, path in vers]
    )
    return [
        (v, m.type != pafs.FileType.NotFound)
        for (v, _), m in zip(vers, markers)
    ]


def existing_versions(root: str, published_only: bool = False) -> list[int]:
    """Sorted version numbers under ``root`` (``vNNN`` dirs); with
    ``published_only`` skip dirs whose marker is missing (crashed saves)."""
    if published_only:
        return [v for v, marked in _versions_with_markers(root) if marked]
    # no marker stats at all when the caller doesn't need publish state
    _, vers = _list_version_dirs(root)
    return [v for v, _ in vers]


def version_dir(root: str, version: int) -> str:
    return fsio.join(root, f"v{version:03d}")


def next_version(root: str) -> int:
    """Next unused version number — counts UNMARKED dirs too, so a crash
    mid-save never reuses a number a stale reader may still hold."""
    vers = existing_versions(root)
    return (vers[-1] + 1) if vers else 0


def commit_version(root: str, version: int) -> str:
    """Write the ``_PUBLISHED`` marker — the commit point. Call AFTER all
    payload files under the version dir are fully written."""
    vdir = version_dir(root, version)
    with fsio.open_write_text(fsio.join(vdir, PUBLISHED_MARKER)) as fh:
        fh.write("ok\n")
    return vdir


def latest_published_dir(root: str) -> str | None:
    vers = existing_versions(root, published_only=True)
    return version_dir(root, vers[-1]) if vers else None


def prune_versions(root: str, keep: int) -> int:
    """Delete all but the newest ``keep`` PUBLISHED versions (and any
    unmarked dirs older than the newest published one — crashed saves).
    Returns the number of directories removed. Marker deleted first so a
    racing reader sees an unpublished dir rather than a torn one."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    pairs = _versions_with_markers(root)  # one listing for both views
    published = [v for v, marked in pairs if marked]
    if not published:
        return 0
    cutoff = published[-1]
    drop_published = published[:-keep] if len(published) > keep else []
    stale_unmarked = [
        v for v, marked in pairs if not marked and v < cutoff
    ]
    removed = 0
    for v in sorted(set(drop_published + stale_unmarked)):
        vdir = version_dir(root, v)
        try:
            if v in published:
                fsio.remove(fsio.join(vdir, PUBLISHED_MARKER))
            fsio.remove_dir(vdir)
            removed += 1
        except OSError:
            continue  # best-effort: the next publish retries
    return removed


def stream_identity(checkpoint_dir: str) -> str | None:
    """The Spark streaming-query id recorded in the checkpoint's
    ``metadata`` file (written once at first query start) — stable
    across restarts on the SAME checkpoint, fresh for a new checkpoint
    dir.  Sinks whose folds are NOT idempotent (additive counts) stamp
    this into each published version and refuse to fold under a
    different identity: batch ids restart at 0 on a fresh checkpoint,
    so a ledger comparison across identities silently skips (or
    double-counts) real data.  Returns None when unreadable (no stream
    started yet, foreign layout).  The stamped sinks FAIL CLOSED on
    None — inside a running foreachBatch the Spark-managed metadata
    file must exist, so None there is an FS fault and publishing an
    unstamped version would silently disarm the guard for the whole
    root.  Non-sink callers may treat None as "unknown" but must never
    treat it as a match."""
    import json

    try:
        with fsio.open_read_text(fsio.join(checkpoint_dir, "metadata")) as fh:
            ident = json.loads(fh.read()).get("id")
            return ident if isinstance(ident, str) else None
    except (OSError, ValueError):
        return None


#: per-version stream-identity stamp filename (written by sinks whose
#: folds are not cross-checkpoint safe; read back by their guards)
STREAM_FILE = "_STREAM"


def read_stream_stamp(vdir: str) -> str | None:
    """The identity stamped into a published version at publish time;
    None for versions published before the stamp existed (legacy roots
    keep their documented pre-guard behavior)."""
    try:
        with fsio.open_read_text(fsio.join(vdir, STREAM_FILE)) as fh:
            return fh.read().strip() or None
    except OSError:
        return None


def write_stream_stamp(vdir: str, stream_id: str) -> None:
    """Stamp ``vdir`` (call BEFORE commit_version so the marker never
    publishes an unstamped version)."""
    with fsio.open_write_text(fsio.join(vdir, STREAM_FILE)) as fh:
        fh.write(f"{stream_id}\n")
