"""ZipNum Python DataSource tests (spark.read.format('zipnum'))."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.sources.zipnum import write_zipnum, zipnum_range
from ia_hadoop_tools_spark.sources.zipnum_datasource import (
    plan_blocks,
    register_zipnum,
)


def _lines(n):
    return [f"k{i:04d} 2020010100{i % 100:02d}00 payload-{i}" for i in range(n)]


def _cluster(spark, tmp_path, n=300, lpb=30, shards=2):
    out = str(tmp_path / "cluster")
    df = spark.createDataFrame([(l,) for l in _lines(n)], "value: string")
    write_zipnum(df, out, lines_per_block=lpb, num_shards=shards)
    return out


def test_datasource_full_read_matches_codec(spark, tmp_path):
    out = _cluster(spark, tmp_path)
    register_zipnum(spark)
    df = spark.read.format("zipnum").load(out)
    got = sorted(r.value for r in df.collect())
    want = sorted(r.value for r in zipnum_range(spark, out, None, None).collect())
    assert got == want and len(got) == 300
    # urlkey/timestamp columns are the first two CDX fields
    r0 = df.orderBy("urlkey").first()
    assert r0.urlkey == "k0000" and r0.value.startswith("k0000 ")


def test_datasource_range_filter_prunes_and_is_exact(spark, tmp_path):
    out = _cluster(spark, tmp_path)
    register_zipnum(spark)
    df = (
        spark.read.format("zipnum").load(out)
        .filter((F.col("urlkey") >= "k0100") & (F.col("urlkey") < "k0110"))
    )
    got = sorted(r.value for r in df.collect())
    want = sorted(
        l for l in _lines(300) if "k0100" <= l.split(" ", 1)[0] < "k0110"
    )
    assert got == want


def test_plan_blocks_prunes_by_summary():
    summary = [
        (f"k{i:04d}", "part-00000.gz", i * 100, 100) for i in range(0, 100, 10)
    ]
    all_groups = plan_blocks(summary, None, None, 4)
    assert sum(len(g) for g in all_groups) == 10
    pruned = plan_blocks(summary, "k0035", "k0055", 4)
    kept = [b for g in pruned for b in g]
    # covering blocks only: k0030 (covers 30-39), k0040, k0050
    assert [b[1] // 1000 for b in kept] == [3, 4, 5]


def test_plan_blocks_rejects_malformed_summaries():
    """Advisor round-5: an out-of-order external summary used to be
    silently mis-pruned (row loss the row-level re-filter cannot repair);
    it must fail loudly instead."""
    import pytest

    ok = [(f"k{i:04d}", "s0.gz", i * 100, 100) for i in range(0, 40, 10)]
    assert sum(len(g) for g in plan_blocks(ok, None, None, 2)) >= 1

    offset_regress = list(ok)
    offset_regress[2] = ("k0020", "s0.gz", 50, 100)
    with pytest.raises(ValueError, match="offset regressed"):
        plan_blocks(offset_regress, None, None, 2)

    key_regress = list(ok)
    key_regress[2] = ("k0005", "s0.gz", 2000, 100)
    with pytest.raises(ValueError, match="key regressed"):
        plan_blocks(key_regress, None, None, 2)

    interleaved = [
        ("k0000", "s0.gz", 0, 100),
        ("k0010", "s1.gz", 0, 100),
        ("k0020", "s0.gz", 100, 100),
    ]
    with pytest.raises(ValueError, match="reappears"):
        plan_blocks(interleaved, None, None, 2)


def test_datasource_skip_bad_option(spark, tmp_path):
    out = _cluster(spark, tmp_path, n=100, lpb=25, shards=1)
    register_zipnum(spark)
    # corrupt the second member
    import glob

    shard = glob.glob(os.path.join(out, "*.gz"))[0]
    with open(out + "/ALL.summary") as fh:
        idx = [l.split("\t") for l in fh.read().splitlines()]
    off, length = int(idx[1][2]), int(idx[1][3])
    with open(shard, "r+b") as fh:
        fh.seek(off + length // 2)
        fh.write(b"\xff\x00\xff\x00")

    import pytest

    with pytest.raises(Exception):
        spark.read.format("zipnum").load(out).count()
    tolerant = (
        spark.read.format("zipnum").option("skip_bad", "true").load(out)
    )
    assert 50 <= tolerant.count() < 100


def test_datasource_le_and_eq_filters_on_block_boundary(spark, tmp_path):
    """Regression: <=/== pruning with a v+"\\x00" end bound pruned blocks
    whose FIRST line matched the filter (summary keys are composite
    "urlkey<space>ts", and ' ' > '\\x00') — silent row loss the row-level
    re-filter could not repair."""
    out = _cluster(spark, tmp_path, n=300, lpb=30, shards=2)
    register_zipnum(spark)
    base = spark.read.format("zipnum").load(out)
    # every key is the FIRST line of some block for lpb=30 boundaries;
    # sweep keys including exact block starts
    for probe in ("k0000", "k0030", "k0060", "k0150", "k0299"):
        eq = base.filter(F.col("urlkey") == probe).count()
        assert eq == 1, f"== {probe} lost rows"
        le = base.filter(F.col("urlkey") <= probe).count()
        want = sum(1 for l in _lines(300) if l.split(" ", 1)[0] <= probe)
        assert le == want, f"<= {probe}: {le} != {want}"


def test_block_lines_does_not_split_on_unicode_line_breaks(spark, tmp_path):
    """A value containing \\x0b / U+2028 must round-trip as ONE row
    (records are framed by \\n only; splitlines() over-split them)."""
    out = str(tmp_path / "weird")
    vals = ["ka 20200101 a\x0bb", "kb 20200101 c d", "kc 20200101 e"]
    df = spark.createDataFrame([(v,) for v in vals], "value: string")
    write_zipnum(df, out, lines_per_block=10, num_shards=1)
    register_zipnum(spark)
    got = sorted(r.value for r in spark.read.format("zipnum").load(out).collect())
    assert got == sorted(vals)
    direct = sorted(
        r.value for r in zipnum_range(spark, out, None, None).collect()
    )
    assert direct == sorted(vals)
