"""asof_join operator tests (cogrouped merge_asof custom operator)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 50, 5.0), (2, 100, 1.0)],
        "k: long, ts: long, px: double",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 0.9), (1, 100, 1.0), (1, 150, 1.5), (3, 10, 9.9)],
        "k: long, qts: long, q: double",
    )
    return trades, quotes


def test_asof_backward_inner(spark):
    trades, quotes = _frames(spark)
    out = {
        (r.k, r.ts): (r.qts, r.q)
        for r in asof_join(trades, quotes, "k", "ts", "qts").collect()
    }
    # ts=100 matches qts=100 exactly (inclusive); ts=200 -> latest qts=150;
    # ts=50 has no earlier quote -> dropped (inner); k=2 has no quotes at all
    assert out == {(1, 100): (100, 1.0), (1, 200): (150, 1.5)}


def test_asof_left_keeps_unmatched(spark):
    trades, quotes = _frames(spark)
    rows = asof_join(trades, quotes, "k", "ts", "qts", how="left").collect()
    got = {(r.k, r.ts): r.q for r in rows}
    assert len(rows) == 4
    assert got[(1, 50)] is None and got[(2, 100)] is None
    assert got[(1, 200)] == 1.5


def test_asof_forward_and_exclusive(spark):
    trades, quotes = _frames(spark)
    fwd = {
        (r.k, r.ts): r.qts
        for r in asof_join(
            trades, quotes, "k", "ts", "qts", direction="forward"
        ).collect()
    }
    assert fwd[(1, 50)] == 90 and fwd[(1, 100)] == 100
    excl = {
        (r.k, r.ts): r.qts
        for r in asof_join(
            trades, quotes, "k", "ts", "qts", allow_exact_matches=False
        ).collect()
    }
    assert excl[(1, 100)] == 90  # exact ts=100 excluded -> falls back to 90


def test_native_and_pandas_strategies_agree(spark):
    trades, quotes = _frames(spark)
    for kw in (
        dict(),
        dict(how="left"),
        dict(direction="forward"),
        dict(allow_exact_matches=False),
    ):
        nat = sorted(
            map(tuple, asof_join(trades, quotes, "k", "ts", "qts",
                                 method="native", **kw).collect())
        )
        pdm = sorted(
            map(tuple, asof_join(trades, quotes, "k", "ts", "qts",
                                 method="pandas", **kw).collect())
        )
        assert nat == pdm, kw


def test_asof_tolerance_pandas_path(spark):
    import pytest as _pytest

    trades, quotes = _frames(spark)
    got = {
        (r.k, r.ts): r.qts
        for r in asof_join(
            trades, quotes, "k", "ts", "qts", method="pandas",
            how="left", tolerance=40,
        ).collect()
    }
    assert got[(1, 100)] == 100       # exact match within tolerance
    assert got[(1, 200)] is None      # latest quote is 50 behind -> too far
    with _pytest.raises(ValueError):
        asof_join(trades, quotes, "k", "ts", "qts", tolerance=40)


def test_colliding_column_names_consistent_across_strategies(spark):
    left = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0)], "k: long, ts: long, v: double"
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0)], "k: long, ts: long, v: double"  # both names collide
    )
    nat = asof_join(left, right, "k", "ts", "ts", method="native")
    pdm = asof_join(left, right, "k", "ts", "ts", method="pandas")
    assert nat.columns == pdm.columns == ["k", "ts", "v", "ts_r", "v_r"]
    assert sorted(map(tuple, nat.collect())) == sorted(map(tuple, pdm.collect()))


def test_asof_null_timestamps_agree_across_methods(spark):
    """Null-ts right rows never match; null-ts left rows survive only under
    how='left' — identically for method='native' and method='pandas'."""
    trades = spark.createDataFrame(
        [(1, None, 0.0), (1, 100, 10.0), (1, 40, 4.0), (2, 100, 1.0)],
        "k: long, ts: long, px: double",
    )
    quotes = spark.createDataFrame(
        [(1, None, 99.0), (1, 90, 0.9), (2, None, 77.0)],
        "k: long, qts: long, q: double",
    )
    for how in ("inner", "left"):
        results = {}
        for method in ("native", "pandas"):
            rows = asof_join(
                trades, quotes, "k", "ts", "qts", how=how, method=method
            ).collect()
            results[method] = {
                (r.k, r.ts, r.px, r.qts, r.q) for r in rows
            }
        assert results["native"] == results["pandas"], how
        got = results["native"]
        if how == "inner":
            # only ts=100/k=1 matches (qts=90); ts=40 precedes every real
            # quote and must NOT match the null-ts quote row
            assert got == {(1, 100, 10.0, 90, 0.9)}
        else:
            assert len(got) == 4
            by_key = {(k, ts): (qts, q) for k, ts, _, qts, q in got}
            assert by_key[(1, 40)] == (None, None)
            assert by_key[(1, None)] == (None, None)
            assert by_key[(2, 100)] == (None, None)
            assert by_key[(1, 100)] == (90, 0.9)


def test_asof_native_null_right_value_is_the_match(spark):
    """A genuinely-NULL right value at the matching timestamp must come
    back NULL (the old per-column ignorenulls fill carried an OLDER row's
    value forward), and multi-column matches must be atomic."""
    from ia_hadoop_tools_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 3)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 100, None), ("k", 2, None, 200)],
        "key string, ts long, a int, b int",
    )
    for method in ("native", "pandas"):
        row = asof_join(
            left, right, "key", "ts", method=method
        ).collect()[0]
        # the ts=2 row is the as-of match: a=None, b=200 — NOT the
        # never-existed mix (a=100, b=200)
        assert (row["a"], row["b"]) == (None, 200), method


def test_asof_native_rejects_unsupported_direction_and_how(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1)], "key string, ts long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, "key", "ts", direction="nearest")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, left, "key", "ts", how="outer")


def test_asof_rejects_unknown_method(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 10)], "k long, ts long")
    r = spark.createDataFrame([(1, 9, 1.0)], "k long, qts long, v double")
    with pytest.raises(ValueError, match="method"):
        asof_join(l, r, ["k"], "ts", "qts", method="natve")
