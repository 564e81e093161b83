#!/usr/bin/env python
"""ZipNum interchange decade probe: publish -> export -> import -> scan.

The ZipNum writer was probed at 600k lines (round 3); this round-trips
a PUBLISHED corpus version at one decade up — the sf10 documents table
(~5M docs) — through the full interchange path, recording walls and the
identity check:

1. assemble_corpus publishes a 2-split / 64-shard version of the sf10
   documents (the single-writer commit protocol, MANIFEST counts);
2. export_version_zipnum writes the version as a ZipNum cluster (the
   reference's blocked-gzip + idx interchange format — one text line
   per doc, key ``{split}:{shard:05d}:{pos:020d}``);
3. import_corpus_zipnum reads the cluster back; identity = row count
   AND the order-insensitive sum of xxhash64(doc_id, text, split,
   shard, pos) equals the published version's (value-level, not just
   cardinality);
4. one INDEXED range scan (zipnum_range over the 'valid' split prefix)
   must stream only that split's blocks — wall recorded next to the
   full-scan wall; rows must equal the split's manifest count.

Usage: python scripts/probe_zipnum_interchange.py [sf_dir] [work_dir] [rep]

``rep`` (default 1) unions ``rep`` re-keyed copies of the documents
table before publishing — sf10 docs x rep=10 = ~5M lines, one decade
past the round-3 600k-line writer probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iht_sf10"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_zipnum_interchange"


def main() -> None:
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.assemble import (
        export_version_zipnum,
        import_corpus_zipnum,
        read_manifest,
        read_version_frame,
    )
    from ia_hadoop_tools_spark.session import get_spark, load_tables
    from ia_hadoop_tools_spark.sources.zipnum import zipnum_range

    spark = get_spark("probe-zipnum-interchange")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    root = os.path.join(WORK, "corpus")
    zn = os.path.join(WORK, "zipnum")
    out = {}

    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    base = load_tables(spark, SF, ("documents",))["documents"].select(
        "doc_id", "text", "source"
    )
    docs = base
    for k in range(1, rep):
        docs = docs.unionByName(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * 100_000_000)
            )
        )
    from ia_hadoop_tools_spark.operators.assemble import assemble_corpus

    t0 = time.monotonic()
    vdir = assemble_corpus(
        docs, root, [("train", 0.95), ("valid", 0.05)], n_shards=64
    )
    out["publish_wall"] = round(time.monotonic() - t0, 2)
    man = read_manifest(root)
    n_total = sum(int(v) for v in man["counts"].values())
    print(f"published {vdir}: {n_total:,} rows "
          f"({out['publish_wall']}s)", flush=True)

    def _fp(df):
        # order-insensitive value fingerprint of the full interchange
        # payload (sum of per-row hashes, counted)
        r = df.select(
            F.sum(
                F.xxhash64(
                    "doc_id", "text", "source", "split", "shard", "pos"
                ).cast("decimal(38,0)")  # ANSI: a LONG sum of 5M hashes overflows
            ).alias("h"),
            F.count("*").alias("n"),
        ).first()
        return (int(r["h"]), int(r["n"]))

    t0 = time.monotonic()
    export_version_zipnum(spark, root, zn)
    out["export_wall"] = round(time.monotonic() - t0, 2)
    print(f"exported zipnum ({out['export_wall']}s)", flush=True)

    t0 = time.monotonic()
    back = import_corpus_zipnum(
        spark, zn, "doc_id long, text string, source string"
    ).select("doc_id", "text", "source", "split", "shard", "pos")
    fp_back = _fp(back)
    out["import_wall"] = round(time.monotonic() - t0, 2)
    fp_src = _fp(read_version_frame(spark, vdir))
    out["identity"] = fp_back == fp_src
    print(f"import fingerprint {fp_back} vs source {fp_src} "
          f"identical={out['identity']} ({out['import_wall']}s)", flush=True)
    assert out["identity"], "zipnum round-trip lost or mangled rows"

    # indexed range scan: only the 'valid' split's blocks
    t0 = time.monotonic()
    n_valid = zipnum_range(spark, zn, "valid", "valid~").count()
    out["range_scan_wall"] = round(time.monotonic() - t0, 2)
    out["range_rows"] = n_valid
    want = int(man["counts"]["valid"])
    print(f"range scan valid split: {n_valid:,} rows "
          f"(manifest {want:,}) in {out['range_scan_wall']}s", flush=True)
    assert n_valid == want, (n_valid, want)

    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
