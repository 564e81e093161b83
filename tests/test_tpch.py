"""Pins for the 12 round-4 TPC-H planner shapes (tpch.py).

Correctness is pinned by the DuckDB oracle (scripts/oracle_check.py /
driver gate); these tests pin the PLANS — the broadcast/semi/anti join
strategies and scan-level pushdown each query exists to exercise — plus
cheap structural sanity at sf0.001.
"""

from __future__ import annotations

import pytest

from ia_hadoop_tools_spark.tpch import (
    TPCH_EXTRA_QUERIES,
    q_tpch_q2,
    q_tpch_q6,
    q_tpch_q11,
    q_tpch_q21,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(TPCH_EXTRA_QUERIES))
def test_runs_and_schema_stable(spark, sf_dir, name):
    df = TPCH_EXTRA_QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns == TPCH_EXTRA_QUERIES[name](spark, sf_dir).columns
    # global-aggregate queries return exactly one row even on tiny data
    # (q14, the other global agg, lives in driver_queries.py, not here)
    if name in ("tpch_q6", "tpch_q17"):
        assert len(rows) == 1


def test_q6_is_a_single_pushed_scan(spark, sf_dir):
    """q6 must fold to scan+filter+partial/final agg: no join, no window,
    with the quantity/discount/date predicates reaching the parquet scan."""
    plan = _plan(q_tpch_q6(spark, sf_dir))
    assert "Join" not in plan
    assert "PushedFilters" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1][:400]


def test_q2_broadcasts_dims_into_ps(spark, sf_dir):
    """The region/nation/part dims and the per-part min must broadcast —
    the derived ps (lineitem-sized) side must never shuffle-exchange for
    the dim joins."""
    plan = _plan(q_tpch_q2(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q21_semi_and_anti_joins(spark, sf_dir):
    """The EXISTS / NOT-EXISTS pair must plan as LeftSemi + LeftAnti with
    the non-equi suppkey conjunct attached, not as a cartesian filter."""
    plan = _plan(q_tpch_q21(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q11_threshold_stays_decimal(spark, sf_dir):
    """value*1000 > total must compare decimals (exact, order-independent);
    a double compare would reintroduce the cross-engine rounding hazard."""
    df = q_tpch_q11(spark, sf_dir)
    # output column is double only at the final projection
    assert dict(df.dtypes)["value"] == "double"
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
