#!/usr/bin/env python
"""Streaming-layer scale probe: 3 sf1-scale ingestion cycles per stream.

rolling_dedup / corpus_stats_stream / kmv_sketch_stream carry
correctness + replay pins (tests/), but the batch-FLAT claim — per-batch
cost stays ~constant as the published state (dedup index / stats table /
sketch table) grows — was probed only for the batch novel_docs_indexed
path (round 3).  This probe drives each stream through 3 cycles of
sf1-scale document batches (~50k docs/cycle from /tmp/iht_sf1, re-keyed
per cycle so each batch is mostly NOVEL — the worst case for the dedup
index, which grows by every novel doc) and records per-cycle walls.

Flat = cycle-3 wall within ~1.5x cycle-1 (the index the 3rd batch probes
against is 2 batches big; a super-linear slope here means per-batch cost
scales with corpus size, which would sink the stream at 100 TB).

Usage: python scripts/probe_streams_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iht_sf1"
SCHEMA = "doc_id long, text string, source string"
CYCLES = 3


def _batches(spark):
    """3 disjoint re-keyed slices of the sf1 documents table.

    Each cycle's docs get a distinct doc_id range AND a per-cycle text
    salt on ~90% of docs (suffix token carrying the cycle), so cycles
    are mostly novel to the dedup index while ~10% are exact dups of
    cycle 1 — the steady-state mix."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.session import load_tables

    docs = load_tables(spark, SF1, ("documents",))["documents"].select(
        "doc_id", "text", "source"
    )
    out = []
    for c in range(CYCLES):
        salted = docs.select(
            (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
            F.when(
                (F.abs(F.hash("doc_id", F.lit(c))) % 10 < 9) & (F.lit(c) > 0),
                F.concat(F.col("text"), F.lit(f" cycle{c}marker")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
        )
        out.append(salted)
    return out


def run_rolling_dedup(spark, batches, root) -> list[float]:
    from ia_hadoop_tools_spark.streaming.rolling_dedup import (
        rolling_dedup_stream,
    )

    inp = os.path.join(root, "in")
    walls = []
    for i, b in enumerate(batches):
        b.write.mode("append").parquet(inp)
        t0 = time.monotonic()
        q = rolling_dedup_stream(
            spark,
            inp,
            os.path.join(root, "corpus"),
            os.path.join(root, "index"),
            os.path.join(root, "ckpt"),
            SCHEMA,
        )
        q.awaitTermination()
        walls.append(round(time.monotonic() - t0, 2))
        print(f"rolling_dedup cycle {i + 1}: {walls[-1]}s", flush=True)
    n = spark.read.parquet(os.path.join(root, "corpus")).count()
    print(f"rolling_dedup corpus rows after 3 cycles: {n:,}", flush=True)
    return walls


def run_stats_stream(spark, batches, root) -> list[float]:
    from ia_hadoop_tools_spark.streaming.stats_stream import (
        corpus_stats_stream,
    )

    inp = os.path.join(root, "in")
    walls = []
    for i, b in enumerate(batches):
        b.write.mode("append").parquet(inp)
        t0 = time.monotonic()
        q = corpus_stats_stream(
            spark,
            inp,
            os.path.join(root, "stats"),
            os.path.join(root, "ckpt"),
            SCHEMA,
        )
        q.awaitTermination()
        walls.append(round(time.monotonic() - t0, 2))
        print(f"stats_stream cycle {i + 1}: {walls[-1]}s", flush=True)
    return walls


def run_sketch_stream(spark, batches, root) -> list[float]:
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.streaming.sketch_stream import (
        kmv_sketch_stream,
    )

    inp = os.path.join(root, "in")
    walls = []
    for i, b in enumerate(batches):
        b.write.mode("append").parquet(inp)
        t0 = time.monotonic()
        q = kmv_sketch_stream(
            spark,
            inp,
            os.path.join(root, "sketch"),
            os.path.join(root, "ckpt"),
            SCHEMA,
            ["source"],
            F.col("text"),
        )
        q.awaitTermination()
        walls.append(round(time.monotonic() - t0, 2))
        print(f"sketch_stream cycle {i + 1}: {walls[-1]}s", flush=True)
    return walls


def main() -> None:
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("probe-streams-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    batches = _batches(spark)
    work = tempfile.mkdtemp(prefix="probe_streams_")
    out = {}
    try:
        for name, fn in (
            ("rolling_dedup", run_rolling_dedup),
            ("stats_stream", run_stats_stream),
            ("sketch_stream", run_sketch_stream),
        ):
            root = os.path.join(work, name)
            os.makedirs(root)
            walls = fn(spark, batches, root)
            out[name] = {
                "walls": walls,
                "c3_over_c1": round(walls[-1] / max(walls[0], 1e-9), 2),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
