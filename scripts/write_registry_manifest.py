#!/usr/bin/env python
"""Write REGISTRY_MANIFEST.json: the frozen query registry as machine-
readable metadata so the driver/judge can detect CORRECTNESS-snapshot
pinning (the round-3 and round-4 snapshots silently checked the identical
50-query subset of a 102-query registry).

Usage: python scripts/write_registry_manifest.py  (run at freeze time)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402


def main():
    from ia_hadoop_tools_spark.pending_queries import (
        PENDING_ORACLE_SQL,
        PENDING_QUERIES,
    )

    queries = sorted(entry.queries())
    oracles = set(entry.oracle_sql())
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    # freeze_commit means "the commit the registry froze at", not "last
    # regeneration": keep the recorded one while the query list is
    # unchanged (regenerating for metadata-only additions must not move it)
    prev_path = os.path.join(ROOT, "REGISTRY_MANIFEST.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        if prev.get("queries") == queries and prev.get("freeze_commit"):
            commit = prev["freeze_commit"]
    manifest = {
        "count": len(queries),
        "oracle_count": len(oracles),
        "queries_without_oracle": sorted(set(queries) - oracles),
        "freeze_commit": commit,
        "note": (
            "Every name below has a queries() entry; all but "
            "queries_without_oracle also carry an oracle_sql() entry. A "
            "CORRECTNESS_r{N}.json containing fewer rows than count means "
            "the snapshot is pinned to a stale subset."
        ),
        "queries": queries,
        "pending_note": (
            "Implemented after this round's freeze; oracle-verified by "
            "tests/test_pending_oracles.py (dtype-strict) and registered "
            "at the NEXT freeze — see pending_queries.py."
        ),
        "pending_count": len(PENDING_QUERIES),
        "pending_oracle_count": len(PENDING_ORACLE_SQL),
        "pending_queries": sorted(PENDING_QUERIES),
    }
    out = os.path.join(ROOT, "REGISTRY_MANIFEST.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(queries)} queries @ {commit[:12]}")


if __name__ == "__main__":
    main()
