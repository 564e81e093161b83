"""Property/differential tests: each round-4 analytics operator against an
independent pure-Python reference on randomized inputs.

The integer-determinism design claim ("bit-exact under any partitioning/
engine") is only credible if a from-scratch reimplementation agrees —
these references share NO code with the operators (plain dicts + loops).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    symmetric_edges,
    triangle_count,
)
from ia_hadoop_tools_spark.operators.analytics import exact_group_quantiles
from ia_hadoop_tools_spark.operators.rangejoin import interval_join
from ia_hadoop_tools_spark.operators.scd import scd2_merge


# ---------------------------------------------------------------------------
# pagerank vs pure-python integer reference


def _py_pagerank(edges: set[tuple[int, int]], iters: int) -> dict[int, int]:
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {n: PR_SCALE for n in nodes}
    base = (PR_SCALE * 15) // 100
    for _ in range(iters):
        sums = dict.fromkeys(nodes, 0)
        for u, v in edges:
            sums[v] += r[u] // out[u]
        r = {n: base + (85 * sums[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_python_reference_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        raw = {
            (rng.randrange(30), rng.randrange(30)) for _ in range(60)
        }
        raw = {(u, v) for u, v in raw if u != v}
        sym = raw | {(v, u) for u, v in raw}
        edges = spark.createDataFrame(sorted(sym), "src long, dst long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(edges, iterations=4).collect()
        }
        assert got == _py_pagerank(sym, 4), f"trial {trial}"


# ---------------------------------------------------------------------------
# triangles vs brute force


def test_triangle_count_matches_bruteforce_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        und = {
            tuple(sorted((rng.randrange(15), rng.randrange(15))))
            for _ in range(40)
        }
        und = {(a, b) for a, b in und if a != b}
        nodes = sorted({n for e in und for n in e})
        brute = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in und and (b, c) in und and (a, c) in und
        )
        df = spark.createDataFrame(sorted(und), "src long, dst long")
        got = triangle_count(df).collect()[0]["n_triangles"]
        assert got == brute, f"trial {trial}"


# ---------------------------------------------------------------------------
# exact quantiles vs sorted-list indexing


def test_group_quantiles_match_python_on_random_data(spark):
    rng = random.Random(13)
    rows = [
        (f"g{rng.randrange(3)}", i, round(rng.uniform(0, 100), 2))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    got = {
        r["g"]: (r["p50"], r["p90"], r["p99"])
        for r in exact_group_quantiles(
            df, ["g"], "v", tiebreak=("i",)
        ).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, _, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        expect = tuple(
            vals[(n * num + den - 1) // den - 1]
            for num, den in ((1, 2), (9, 10), (99, 100))
        )
        assert got[g] == expect, g


# ---------------------------------------------------------------------------
# interval_join vs naive filter on random data


def test_interval_join_matches_naive_random(spark):
    rng = random.Random(17)
    base = 1_700_000_000
    pts = [(i, base + rng.randrange(0, 40 * 86400)) for i in range(300)]
    ivs = []
    for j in range(25):
        s = base + rng.randrange(0, 35 * 86400)
        ivs.append((j, s, s + rng.randrange(3600, 10 * 86400)))
    pdf = spark.createDataFrame(pts, "pid long, t long").select(
        "pid", F.timestamp_seconds("t").alias("ts")
    )
    idf = spark.createDataFrame(ivs, "iid long, s long, e long").select(
        "iid",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, idf, "ts", "s", "e", bucket_width=5 * 86400
        ).collect()
    )
    naive = sorted(
        (p, j) for p, t in pts for j, s, e in ivs if s <= t <= e
    )
    assert got == naive


# ---------------------------------------------------------------------------
# scd2 vs stateful python reference over a random snapshot sequence


def test_scd2_matches_python_reference_over_random_sequence(spark):
    rng = random.Random(19)
    # python reference: history as list of [key, attr, from, to]
    hist_py: list[list] = []

    def py_merge(snap: dict[int, str], ts: str) -> None:
        open_rows = {r[0]: r for r in hist_py if r[3] is None}
        for k, attr in snap.items():
            cur = open_rows.get(k)
            if cur is None:
                hist_py.append([k, attr, ts, None])
            elif cur[1] != attr:
                cur[3] = ts
                hist_py.append([k, attr, ts, None])

    hist_df = spark.createDataFrame(
        [], "k long, attr string, valid_from string, valid_to string"
    )
    for step in range(4):
        snap = {
            k: f"v{rng.randrange(3)}"
            for k in rng.sample(range(8), rng.randrange(2, 7))
        }
        ts = f"T{step}"
        py_merge(snap, ts)
        snap_df = spark.createDataFrame(
            list(snap.items()), "k long, attr string"
        )
        hist_df = scd2_merge(
            hist_df, snap_df, ("k",), ("attr",), ts
        ).localCheckpoint()
    got = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in hist_df.collect()
    )
    expect = sorted((r[0], r[1], r[2], r[3]) for r in hist_py)
    assert got == expect


def test_symmetric_edges_no_self_loops_needed(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    e = {(r["src"], r["dst"]) for r in symmetric_edges(pairs, "a", "b").collect()}
    assert e == {(1, 2), (2, 1), (2, 3), (3, 2)}


# ---------------------------------------------------------------------------
# funnel vs pure-python reference (strict-after chaining + window deadline)


def _py_funnel_times(events, steps, window_s):
    """events: [(user, type, ts_epoch_seconds)]. Returns {user: [t1..tk]}
    with None for uncompleted steps — independent re-derivation of the
    conservative funnel convention (strict >, deadline t1 + window)."""
    out = {}
    users = {u for u, _, _ in events}
    for u in sorted(users):
        ts_of = lambda s: sorted(t for uu, e, t in events if uu == u and e == s)
        firsts = ts_of(steps[0])
        if not firsts:
            continue
        times = [firsts[0]]
        deadline = firsts[0] + window_s
        for step in steps[1:]:
            prev = times[-1]
            if prev is None:
                times.append(None)
                continue
            cand = [t for t in ts_of(step) if t > prev and t <= deadline]
            times.append(cand[0] if cand else None)
        out[u] = times
    return out


def test_funnel_matches_python_reference_random_streams(spark):
    from ia_hadoop_tools_spark.operators.funnel import funnel_times

    rng = random.Random(23)
    steps = ["A", "B", "C"]
    base = 1_700_000_000
    for trial in range(3):
        events = [
            (
                rng.randrange(12),
                rng.choice(["A", "B", "C", "X"]),
                base + rng.randrange(0, 7200),
            )
            for _ in range(250)
        ]
        df = spark.createDataFrame(
            [
                (u, e, __import__("datetime").datetime.fromtimestamp(
                    t, __import__("datetime").timezone.utc
                ))
                for u, e, t in events
            ],
            "user_id long, event_type string, ts timestamp",
        )
        got = {
            r["user_id"]: [
                None if r[f"t{i}"] is None else int(r[f"t{i}"].timestamp())
                for i in range(1, 4)
            ]
            for r in funnel_times(df, steps, window_seconds=1800).collect()
        }
        assert got == _py_funnel_times(events, steps, 1800), f"trial {trial}"


# ---------------------------------------------------------------------------
# cohort retention vs pure-python reference


def test_retention_matches_python_reference_random_activity(spark):
    import datetime as dt

    from ia_hadoop_tools_spark.operators.analytics import cohort_retention

    rng = random.Random(31)
    rows = []
    for _ in range(300):
        u = rng.randrange(25)
        day = dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(20))
        sec = rng.randrange(86400)
        rows.append((u, dt.datetime.combine(day, dt.time()) + dt.timedelta(seconds=sec)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    first = {}
    for u, ts in rows:
        d = ts.date()
        if u not in first or d < first[u]:
            first[u] = d
    expect = {}
    for u, d in {(u, ts.date()) for u, ts in rows}:
        key = (first[u].isoformat(), (d - first[u]).days)
        expect[key] = expect.get(key, 0) + 1

    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == expect


def test_approx_group_quantiles_rank_error_bound(spark):
    """The sketch's answers must honor rank error <= n/accuracy + 1 per
    group, verified against an in-test Python ranking — plus the
    quantile_bound_check operator must agree (all within_bound)."""
    from ia_hadoop_tools_spark.operators.analytics import (
        approx_group_quantiles,
        quantile_bound_check,
    )

    rng = random.Random(7)
    rows = [
        (g, float(rng.randrange(0, 10_000)))
        for g in ("a", "b")
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    acc = 100  # coarse accuracy so the bound actually bites
    got = approx_group_quantiles(df, ["g"], "v", accuracy=acc).collect()
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for r in got:
        vals = sorted(by_g[r["g"]])
        n = len(vals)
        for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            v = r[label]
            target = max((n * num + den - 1) // den, 1)
            lt = sum(1 for x in vals if x < v)
            le = sum(1 for x in vals if x <= v)
            slack = n / acc + 1
            assert lt <= target + slack and le >= target - slack, (
                r["g"], label, v, lt, le, target)

    checked = quantile_bound_check(df, ["g"], "v", accuracy=acc).collect()
    assert len(checked) == 6
    assert all(r["within_bound"] for r in checked)


def test_approx_group_quantiles_no_window_in_plan(spark):
    """Crossover contract: the approx path must plan as a map-side
    combinable aggregate — no Window, no per-group Sort."""
    from ia_hadoop_tools_spark.operators.analytics import (
        approx_group_quantiles,
    )

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, v double"
    )
    plan = (
        approx_group_quantiles(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_percentile_approx" in plan  # partial agg before shuffle


# ---------------------------------------------------------------------------
# window_funnel_levels (any-anchor ClickHouse semantics) vs an
# independent DP reference


def _py_window_funnel(events, steps, window_s):
    """events: [(user, type, ts_int_seconds)] -> {user: level}.
    Independent formulation: per anchor, a patience-style DP keeping the
    earliest time each level is reachable (NOT the operator's greedy)."""
    import math

    out = {}
    users = {u for u, _, _ in events}
    k = len(steps)
    for u in sorted(users):
        evs = sorted(
            [(t, e) for uu, e, t in events if uu == u], key=lambda x: x[0]
        )
        best = 0
        for a, (ta, ea) in enumerate(evs):
            if ea != steps[0]:
                continue
            reach = [math.inf] * (k + 1)
            reach[1] = ta
            for t, e in evs[a + 1 :]:
                if t > ta + window_s:
                    break
                for lvl in range(k, 1, -1):
                    if e == steps[lvl - 1] and t > reach[lvl - 1]:
                        reach[lvl] = min(reach[lvl], t)
            depth = max(lvl for lvl in range(1, k + 1) if reach[lvl] < math.inf)
            best = max(best, depth)
        if best:
            out[u] = best
    return out


def test_window_funnel_any_anchor_beats_earliest_anchor(spark):
    """The review repro: first step-1 attempt stalls, a later anchor
    completes — any-anchor reports level 2, the anchored variant NULL."""
    import datetime as dt

    from ia_hadoop_tools_spark.operators.funnel import (
        funnel_times,
        window_funnel_levels,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "A", base),
        (1, "A", base + dt.timedelta(seconds=30)),
        (1, "B", base + dt.timedelta(seconds=32)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    lv = {r["user_id"]: r["level"] for r in window_funnel_levels(df, ["A", "B"], 5).collect()}
    assert lv == {1: 2}
    t = funnel_times(df, ["A", "B"], 5).collect()[0]
    assert t["t2"] is None  # documented anchored-convention difference


def test_window_funnel_matches_dp_reference_random_streams(spark):
    import datetime as dt

    from ia_hadoop_tools_spark.operators.funnel import window_funnel_levels

    rng = random.Random(41)
    steps = ["A", "B", "C"]
    for trial in range(3):
        events = [
            (
                rng.randrange(10),
                rng.choice(["A", "B", "C", "X"]),
                rng.randrange(0, 3600),
            )
            for _ in range(200)
        ]
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (u, e, base + dt.timedelta(seconds=t))
                for u, e, t in events
            ],
            "user_id long, event_type string, ts timestamp",
        )
        got = {
            r["user_id"]: r["level"]
            for r in window_funnel_levels(df, steps, 600).collect()
        }
        assert got == _py_window_funnel(events, steps, 600), f"trial {trial}"


def test_window_funnel_sql_fold_matches_pandas_dp(spark):
    """The SQL aggregate() fold must be bit-identical to the retained
    applyInPandas greedy DP on adversarial streams: duplicate timestamps
    (same-ts events must not chain), repeated anchors, off-funnel noise,
    and 4-step chains."""
    import datetime as dt

    from ia_hadoop_tools_spark.operators.funnel import (
        window_funnel_levels,
        window_funnel_levels_pandas,
    )

    rng = random.Random(43)
    steps = ["A", "B", "C", "D"]
    base = dt.datetime(2024, 1, 1)
    for trial in range(4):
        # coarse ts grid forces many exact ties
        events = [
            (
                rng.randrange(8),
                rng.choice(["A", "A", "B", "C", "D", "X"]),
                rng.randrange(0, 40),
            )
            for _ in range(300)
        ]
        df = spark.createDataFrame(
            [(u, e, base + dt.timedelta(seconds=t)) for u, e, t in events],
            "user_id long, event_type string, ts timestamp",
        )
        sql_lv = {
            r["user_id"]: r["level"]
            for r in window_funnel_levels(df, steps, 15).collect()
        }
        pd_lv = {
            r["user_id"]: r["level"]
            for r in window_funnel_levels_pandas(df, steps, 15).collect()
        }
        assert sql_lv == pd_lv, f"trial {trial}"


def test_window_funnel_repeated_step_names(spark):
    """A step name may repeat in `steps` (view -> click -> view): the SQL
    fold must match the pandas DP, which compares names per level — an
    index-based mapping pins events to their first match and caps the
    depth (the review repro)."""
    import datetime as dt

    from ia_hadoop_tools_spark.operators.funnel import (
        window_funnel_levels,
        window_funnel_levels_pandas,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", base),
        (1, "click", base + dt.timedelta(seconds=1)),
        (1, "view", base + dt.timedelta(seconds=2)),
        (2, "view", base),
        (2, "view", base + dt.timedelta(seconds=1)),  # no click between
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    steps = ["view", "click", "view"]
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel_levels(df, steps, 60).collect()
    }
    ref = {
        r["user_id"]: r["level"]
        for r in window_funnel_levels_pandas(df, steps, 60).collect()
    }
    assert got == ref == {1: 3, 2: 1}

    # randomized repeats
    rng = random.Random(47)
    events = [
        (rng.randrange(6), rng.choice(["A", "B", "A", "X"]), rng.randrange(0, 30))
        for _ in range(200)
    ]
    df2 = spark.createDataFrame(
        [(u, e, base + dt.timedelta(seconds=t)) for u, e, t in events],
        "user_id long, event_type string, ts timestamp",
    )
    for steps2 in (["A", "B", "A"], ["A", "A"], ["B", "A", "B", "A"]):
        got2 = {
            r["user_id"]: r["level"]
            for r in window_funnel_levels(df2, steps2, 10).collect()
        }
        ref2 = {
            r["user_id"]: r["level"]
            for r in window_funnel_levels_pandas(df2, steps2, 10).collect()
        }
        assert got2 == ref2, steps2


def test_funnel_times_plan_growth_is_linear(spark):
    """Each funnel step must reference the prior chain ONCE — a 10-step
    funnel whose plan still analyzes in bounded time (the old shape held
    2^(k-1) copies of the step-1 subtree)."""
    import datetime as dt
    import time

    from ia_hadoop_tools_spark.operators.funnel import funnel_times

    base = dt.datetime(2024, 1, 1)
    steps = [f"s{i}" for i in range(10)]
    rows = [
        (u, f"s{i}", base + dt.timedelta(seconds=u + i))
        for u in range(5)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    t0 = time.monotonic()
    out = funnel_times(df, steps, 3600)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert time.monotonic() - t0 < 30
    # step-1 filter appears exactly once in the analyzed tree
    assert plan.count("s0") <= 4
    rows_out = out.collect()
    assert len(rows_out) == 5
    assert all(r["t10"] is not None for r in rows_out)


def test_window_funnel_is_pure_codegen(spark):
    """No Python stage: the executed plan must contain no
    FlatMapGroupsInPandas / ArrowEvalPython / BatchEvalPython node."""
    import datetime as dt

    from ia_hadoop_tools_spark.operators.funnel import window_funnel_levels

    df = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp",
    )
    plan = (
        window_funnel_levels(df, ["A", "B"], 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("FlatMapGroupsInPandas", "EvalPython"):
        assert node not in plan, plan


def test_dsir_select_rejects_impossible_fraction(spark):
    import pytest
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.importance import dsir_select

    df = spark.createDataFrame(
        [(i, "a b c", i % 2 == 0) for i in range(10)],
        "doc_id long, text string, t boolean",
    )
    with pytest.raises(ValueError, match="fraction"):
        dsir_select(df, F.col("t"), 3, 2)
    with pytest.raises(ValueError, match="fraction"):
        dsir_select(df, F.col("t"), 1, 0)
