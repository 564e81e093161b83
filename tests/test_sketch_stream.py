"""Incremental sketch maintenance: streamed-in batches must yield the
EXACT sketch of the full corpus (the min-k merge identity, end-to-end)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ia_hadoop_tools_spark.operators.sketches import kmv_sketch
from ia_hadoop_tools_spark.streaming.sketch_stream import (
    current_estimates,
    kmv_sketch_stream,
    load_current_sketch,
)

SCHEMA = StructType(
    [
        StructField("g", StringType()),
        StructField("v", LongType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streamed_sketch_equals_direct_sketch(spark, tmp_path):
    inp = str(tmp_path / "in")
    root = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    all_rows = []

    def run_cycle(rows):
        all_rows.extend(rows)
        _write_batch(spark, inp, rows)
        q = kmv_sketch_stream(
            spark, inp, root, ckpt, SCHEMA, ["g"], F.col("v").cast("string"), k=32
        )
        q.awaitTermination(60)
        time.sleep(0.2)

    run_cycle([("a", i) for i in range(200)])
    run_cycle([("a", i) for i in range(100, 400)] + [("b", i) for i in range(50)])
    run_cycle([("b", i) for i in range(40, 90)])

    streamed = load_current_sketch(spark, root)
    direct = kmv_sketch(
        spark.createDataFrame(all_rows, SCHEMA),
        ["g"],
        F.col("v").cast("string"),
        k=32,
    )
    assert sorted(map(tuple, streamed.select("g", "__h").collect())) == sorted(
        map(tuple, direct.select("g", "__h").collect())
    )
    est = {
        r["g"]: r["est_distinct"]
        for r in current_estimates(spark, root, ["g"], k=32).collect()
    }
    # group b has 90 distinct (< ... k=32 full) -> estimate, a has 400
    assert set(est) == {"a", "b"}
    assert abs(est["a"] - 400) / 400 < 0.6
    assert abs(est["b"] - 90) / 90 < 0.6


def test_empty_root_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        current_estimates(spark, str(tmp_path / "nope"), ["g"])


def test_versioned_prune_keeps_newest_and_latest_loadable(spark, tmp_path):
    from ia_hadoop_tools_spark.streaming.sketch_stream import (
        load_current_sketch,
        publish_sketch,
    )
    from ia_hadoop_tools_spark.streaming.versioned import existing_versions

    root = str(tmp_path / "sketches")
    for i in range(5):
        df = spark.createDataFrame([(f"g{i}", f"h{i}", i)],
                                   "g string, h string, v long")
        publish_sketch(df, root, keep_versions=2)
    vers = existing_versions(root, published_only=True)
    assert vers == [3, 4]  # newest 2 kept, older pruned
    cur = load_current_sketch(spark, root)
    assert cur.collect()[0]["g"] == "g4"


def test_versioned_prune_drops_stale_unmarked_dirs(spark, tmp_path):
    import os

    from ia_hadoop_tools_spark.streaming.sketch_stream import publish_sketch
    from ia_hadoop_tools_spark.streaming.versioned import (
        existing_versions,
        prune_versions,
    )

    root = str(tmp_path / "s2")
    df = spark.createDataFrame([("g", "h", 1)], "g string, h string, v long")
    publish_sketch(df, root)          # v000 published
    os.makedirs(os.path.join(root, "v001"))  # crashed save, no marker
    publish_sketch(df, root)          # v002 (numbers never reused)
    prune_versions(root, keep=1)
    assert existing_versions(root) == [2]  # stale unmarked + old published gone
