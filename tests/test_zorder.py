"""Z-order clustering: key correctness + footer-stats pruning audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.plans.zorder import (
    write_zordered,
    zorder_code,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 3), (r["x"], r["y"])


def test_zorder_key_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], bits=32)


def test_zorder_code_quantizes_with_clamping(spark):
    df = spark.createDataFrame(
        [(0,), (50,), (100,), (150,)], "v long"
    )
    _, key = zorder_code(
        df.withColumn("w", F.lit(0)), ["v", "w"], bits=4,
        ranges={"v": (0, 100), "w": (0, 1)},
    )
    vals = [r["z"] for r in df.withColumn("w", F.lit(0)).select(key.alias("z")).collect()]
    # w contributes 0 bits; v=0 -> 0, v=100 -> 15 interleaved, 150 clamps to max
    assert vals[0] == 0
    assert vals[2] == vals[3]  # clamped
    assert vals[1] < vals[2]


def _rowgroup_spans(path: str, cols: list[str]) -> list[dict[str, tuple[int, int]]]:
    """Per-row-group (min, max) spans for ``cols`` across all files."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            spans.append(
                {
                    c: (
                        g.column(idx[c]).statistics.min,
                        g.column(idx[c]).statistics.max,
                    )
                    for c in cols
                }
            )
    return spans


def test_write_zordered_shrinks_rowgroup_spans_on_both_dims(spark, tmp_path):
    """The data-skipping claim, measured: after Z-ordering, the average
    row-group min/max span on EACH dimension must be far below the full
    domain (a plain single-column sort only achieves that on its own
    sort key)."""
    n = 40_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 200).alias("a"),
            ((F.col("id") * 7919) % 200).alias("b"),
        )
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    # plain: sorted on a only — b spans stay ~full-domain
    df.repartitionByRange(32, "a").sortWithinPartitions("a").write.parquet(plain)
    write_zordered(df, zed, ["a", "b"], bits=8, num_files=32)

    def avg_span(path: str, col: str) -> float:
        spans = _rowgroup_spans(path, [col])
        return sum(hi - lo for (lo, hi) in (s[col] for s in spans)) / len(spans)

    # sanity: single-key sort is tight on a, terrible on b
    assert avg_span(plain, "a") < 200 * 0.2
    assert avg_span(plain, "b") > 200 * 0.7
    # z-order with 32 curve segments: BOTH dims well under the domain
    # (expected ~47/~35 from the Morton-bucket simulation; threshold
    # leaves headroom for range-partition boundary straddle)
    assert avg_span(zed, "a") < 200 * 0.4
    assert avg_span(zed, "b") < 200 * 0.4
    # and the z-ordered files still hold exactly the same rows
    assert (
        spark.read.parquet(zed).groupBy().sum("a", "b").collect()
        == df.groupBy().sum("a", "b").collect()
    )


def test_zordered_scan_prunes_with_predicate(spark, tmp_path):
    """End-to-end pruning: a tight two-sided predicate over the z-ordered
    layout must read fewer rows at the scan node than the plain layout
    (parquet row-group skipping visible via input metrics)."""
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 500).alias("a"), ((F.col("id") * 7919) % 500).alias("b")
    )
    zed = str(tmp_path / "zed2")
    write_zordered(df, zed, ["a", "b"], bits=9, num_files=8)
    out = (
        spark.read.parquet(zed)
        .filter((F.col("a") < 20) & (F.col("b") < 20))
        .count()
    )
    expect = df.filter((F.col("a") < 20) & (F.col("b") < 20)).count()
    assert out == expect


def test_zorder_cli(spark, tmp_path):
    from ia_hadoop_tools_spark.__main__ import main

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(1000).selectExpr(
        "id % 50 as a", "(id * 7) % 50 as b"
    ).write.parquet(src)
    main(["zorder-write", src, dst, "a", "b", "--bits", "6", "--num-files", "4"])
    out = spark.read.parquet(dst)
    assert out.count() == 1000
    assert set(out.columns) == {"a", "b"}


def test_zorder_nulls_map_to_lo_corner(spark):
    """NULL values quantize to cell 0 explicitly — least/greatest skip
    NULLs, which would otherwise fold NULL rows into the hi corner."""
    from ia_hadoop_tools_spark.plans.zorder import _quantize

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(None,), (0,), (100,)], "v long")
    codes = [
        r["c"] for r in df.select(_quantize(F.col("v"), 0, 100, 4).alias("c"))
        .collect()
    ]
    assert codes == [0, 0, 15]
