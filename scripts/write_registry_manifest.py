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
    queries = sorted(entry.queries())
    oracles = set(entry.oracle_sql())
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
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
    }
    out = os.path.join(ROOT, "REGISTRY_MANIFEST.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(queries)} queries @ {commit[:12]}")


if __name__ == "__main__":
    main()
