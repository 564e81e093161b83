"""Sorted-KV store connector (sources/kvstore.py): HBase load/store pattern."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.sources.kvstore import (
    read_kv_columns,
    read_regions_index,
    register_sortedkv,
    write_kvstore,
)


def _cells(spark, n=300):
    rows = []
    for i in range(n):
        k = f"row{i:05d}"
        rows.append((k, "f:title", 100, f"title-{i}"))
        rows.append((k, "f:title", 200, f"title-{i}-v2"))  # newer version wins
        rows.append((k, "f:size", 150, str(i * 10)))
    return spark.createDataFrame(
        rows, "rowkey: string, column: string, ts: long, value: string"
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kv") / "store")
    write_kvstore(_cells(spark), path, num_regions=4)
    return path


def test_bulk_load_layout(store):
    regions = read_regions_index(store)
    assert len(regions) == 4
    names = [r[0] for r in regions]
    assert all(n.startswith("region-") and n.endswith(".kvz") for n in names)
    # regions are disjoint, ordered ranges (the HFile bulk-load invariant)
    for (_, _, last_a, _), (_, first_b, _, _) in zip(regions, regions[1:]):
        assert last_a <= first_b
    assert sum(r[3] for r in regions) == 900
    assert not [f for f in os.listdir(store) if f.startswith("_tmp.")]


def test_scan_all_and_values(spark, store):
    register_sortedkv(spark)
    df = spark.read.format("sortedkv").load(store)
    assert df.count() == 900
    one = df.filter(
        (F.col("rowkey") == "row00007") & (F.col("column") == "f:title")
    ).orderBy(F.desc("ts")).collect()
    assert [(r.ts, r.value) for r in one] == [
        (200, "title-7-v2"), (100, "title-7")
    ]


def test_range_pushdown_prunes_regions(spark, store):
    register_sortedkv(spark)
    df = (
        spark.read.format("sortedkv")
        .load(store)
        .filter((F.col("rowkey") >= "row00100") & (F.col("rowkey") < "row00110"))
    )
    assert df.count() == 30
    # the physical scan plans only the covering region(s), not all 4
    rdd_parts = df.rdd.getNumPartitions()
    assert rdd_parts < 4, f"expected region pruning, got {rdd_parts} partitions"


def test_equality_and_limit(spark, store):
    register_sortedkv(spark)
    eq = (
        spark.read.format("sortedkv").load(store)
        .filter(F.col("rowkey") == "row00042")
    )
    assert eq.count() == 3
    lim = (
        spark.read.format("sortedkv").option("limit", "5").load(store)
    )
    # per-region limit: 4 regions x 5 cells
    assert lim.count() == 20


def test_columns_option_filters_in_stream(spark, store):
    register_sortedkv(spark)
    only_size = (
        spark.read.format("sortedkv").option("columns", "f:size").load(store)
    )
    assert only_size.count() == 300
    assert only_size.select("column").distinct().collect()[0].column == "f:size"


def test_read_kv_columns_facade(spark, store):
    row = read_kv_columns(
        spark, store, ["f:title", "f:size"], gte="row00290", lt="row00293"
    ).orderBy("rowkey")
    got = [tuple(r) for r in row.collect()]
    assert got == [
        ("row00290", "title-290-v2", "2900"),
        ("row00291", "title-291-v2", "2910"),
        ("row00292", "title-292-v2", "2920"),
    ]


def test_value_escaping_roundtrip(spark, tmp_path):
    path = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [("k1", "c", 1, "tab\there\nand \\ backslash")],
        "rowkey: string, column: string, ts: long, value: string",
    )
    write_kvstore(df, path, num_regions=1)
    register_sortedkv(spark)
    got = spark.read.format("sortedkv").load(path).collect()
    assert got[0].value == "tab\there\nand \\ backslash"


def test_escape_roundtrip_property():
    """_esc/_unesc inverse on arbitrary text (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ia_hadoop_tools_spark.sources.kvstore import _esc, _unesc

    @given(st.text())
    @settings(max_examples=300, deadline=None)
    def check(s):
        e = _esc(s)
        assert "\t" not in e and "\n" not in e
        assert _unesc(e) == s

    check()


def test_write_read_roundtrip_randomized(spark, tmp_path):
    """Differential: random cell tables -> bulk load -> full scan == input
    (multiset equality), across region counts. Seeded, reproducible."""
    import random

    rng = random.Random(4242)
    for trial, n_regions in ((0, 1), (1, 3), (2, 8)):
        rows = []
        for i in range(rng.randrange(50, 200)):
            rows.append(
                (
                    f"k{rng.randrange(1000):04d}",
                    rng.choice(["a", "b", "c"]),
                    rng.randrange(10),
                    "".join(
                        rng.choice("xy\t\n\\ z") for _ in range(rng.randrange(12))
                    ),
                )
            )
        df = spark.createDataFrame(
            rows, "rowkey: string, column: string, ts: long, value: string"
        )
        path = str(tmp_path / f"rt{trial}")
        write_kvstore(df, path, num_regions=n_regions)
        register_sortedkv(spark)
        got = sorted(
            map(tuple, spark.read.format("sortedkv").load(path).collect())
        )
        assert got == sorted(map(tuple, rows)), (trial, n_regions)


def test_fully_pruned_and_empty_scans(spark, store, tmp_path):
    """A filter that prunes every region (and an empty store) must return
    an empty DataFrame, not crash the read task."""
    from pyspark.sql import functions as F

    register_sortedkv(spark)
    none = (
        spark.read.format("sortedkv").load(store)
        .filter(F.col("rowkey") > "zzzz")
    )
    assert none.count() == 0
    empty = str(tmp_path / "empty_store")
    write_kvstore(
        spark.createDataFrame(
            [], "rowkey: string, column: string, ts: long, value: string"
        ),
        empty,
        num_regions=2,
    )
    assert spark.read.format("sortedkv").load(empty).count() == 0


def test_write_kvstore_sweeps_orphaned_tmp_files(spark, tmp_path):
    """Leftover _tmp.* attempt files (killed speculative attempts) must be
    swept by the next successful write's post-commit pass."""
    import os

    from ia_hadoop_tools_spark.operators import __name__ as _  # noqa: F401
    from ia_hadoop_tools_spark.sources.kvstore import write_kvstore

    store = str(tmp_path / "store")
    os.makedirs(store)
    orphan = os.path.join(store, "_tmp.999.region-00042.kvz")
    with open(orphan, "wb") as f:
        f.write(b"partial")
    df = spark.createDataFrame(
        [("k1", "c", 1, "v1"), ("k2", "c", 1, "v2")],
        "rowkey string, column string, ts long, value string",
    )
    write_kvstore(df, store, num_regions=2)
    names = set(os.listdir(store))
    assert orphan.rsplit("/", 1)[-1] not in names
    assert "_REGIONS" in names
    assert not any(n.startswith("_tmp.") for n in names)


def test_kvstore_carriage_return_in_value_roundtrips(spark, tmp_path):
    """A raw \\r in a value must survive the store roundtrip — it used to
    be read as a line terminator, truncating the value and crashing on
    the orphaned remainder."""
    from ia_hadoop_tools_spark.sources.kvstore import (
        register_sortedkv,
        write_kvstore,
    )

    store = str(tmp_path / "crstore")
    df = spark.createDataFrame(
        [("k1", "c", 1, "a\rb"), ("k2", "c", 1, "x\r\ny"), ("k3", "c", 1, "z")],
        "rowkey string, column string, ts long, value string",
    )
    write_kvstore(df, store, num_regions=1)
    register_sortedkv(spark)
    got = {
        r["rowkey"]: r["value"]
        for r in spark.read.format("sortedkv").load(store).collect()
    }
    assert got == {"k1": "a\rb", "k2": "x\r\ny", "k3": "z"}


def test_kvstore_rejects_separator_in_keys(spark, tmp_path):
    import pytest

    from ia_hadoop_tools_spark.sources.kvstore import write_kvstore

    for badkey in ("a\tb", "a\nb", "a\rb"):
        df = spark.createDataFrame(
            [(badkey, "c", 1, "v")],
            "rowkey string, column string, ts long, value string",
        )
        with pytest.raises(Exception, match="must not contain"):
            write_kvstore(df, str(tmp_path / "bad"), num_regions=1)


def test_kvstore_limit_zero_scans_empty(spark, tmp_path):
    from ia_hadoop_tools_spark.sources.kvstore import (
        register_sortedkv,
        write_kvstore,
    )

    store = str(tmp_path / "lim0")
    df = spark.createDataFrame(
        [("k1", "c", 1, "v1"), ("k2", "c", 1, "v2")],
        "rowkey string, column string, ts long, value string",
    )
    write_kvstore(df, store, num_regions=2)
    register_sortedkv(spark)
    out = (
        spark.read.format("sortedkv").option("limit", "0").load(store).collect()
    )
    assert out == []
