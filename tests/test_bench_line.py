"""Layout gate for the bench stdout line (VERDICT r8 task #2).

The driver records only the LAST 2000 chars of bench.py stdout; rounds
4-8 shipped `parsed: None` BENCH artifacts because the one JSON line
outgrew that window.  bench.build_line guarantees the emitted line (a)
parses, (b) fits the window, (c) ends with the ``queries`` key so a
front-clipped tail still reads as timings, and (d) never clips out a
failed query.  These tests pin that contract against the REAL registry
names so growth past the budget fails loudly here, not in the driver
artifact.
"""

from __future__ import annotations

import json

from bench import LINE_BUDGET, build_line

HEAD = {
    "metric": "registry_total_wall_sec",
    "value": 123.456,
    "unit": "sec",
    "sf": 0.1,
    "reps": 3,
    "agg": "min",
    "load_1m_start": 1.55,
    "load_1m_end": 12.34,
    "n_failed": 0,
    "full": "BENCH_FULL.json",
}


def _registry_timings() -> dict[str, float]:
    from ia_hadoop_tools_spark.driver_queries import QUERIES

    # worst-case realistic widths: two-digit seconds at 3 dp
    return {name: 10.0 + i / 1000.0 for i, name in enumerate(QUERIES)}


def test_line_fits_window_and_parses():
    line = build_line(HEAD, _registry_timings())
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "registry_total_wall_sec"
    assert parsed["value"] == 123.456
    assert parsed["n_queries"] == len(_registry_timings())
    assert parsed["queries_shown"] == len(parsed["queries"]) > 0


def test_queries_is_the_last_key():
    line = build_line(HEAD, _registry_timings())
    parsed = json.loads(line)
    assert list(parsed)[-1] == "queries"
    # and physically last in the serialized line (tail-capture survival)
    assert line.rstrip("}").rstrip().endswith("}") or '"queries":{' in line
    assert line.index('"queries":{') > max(
        line.index(f'"{k}"') for k in HEAD
    )


def test_slowest_queries_survive_clipping():
    timings = _registry_timings()
    line = build_line(HEAD, timings)
    parsed = json.loads(line)
    shown = parsed["queries"]
    if len(shown) < len(timings):  # clipped: shown must be the slowest
        cut = min(shown.values())
        dropped_max = max(v for k, v in timings.items() if k not in shown)
        assert cut >= dropped_max


def test_failed_queries_never_clipped():
    timings = _registry_timings()
    # mark three mid-pack queries failed
    failed = sorted(timings)[10:13]
    for name in failed:
        timings[name] = -1.0
    parsed = json.loads(build_line(HEAD, timings))
    for name in failed:
        assert parsed["queries"][name] == -1.0
    assert "failed_clipped" not in parsed


def test_mass_failure_clipping_is_marked_not_silent():
    """When even the failures outgrow the budget (every query failed),
    the line must carry failed_clipped rather than silently naming a
    subset (review r9)."""
    timings = {n: -1.0 for n in _registry_timings()}
    line = build_line(HEAD, timings)
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["failed_clipped"] is True
    assert parsed["n_queries"] == len(timings)
    assert 0 < parsed["queries_shown"] < len(timings)
    assert all(v == -1.0 for v in parsed["queries"].values())
    assert list(parsed)[-1] == "queries"


def test_small_registry_shows_everything():
    timings = {f"q{i}": 0.1 * i for i in range(10)}
    parsed = json.loads(build_line(HEAD, timings))
    assert parsed["queries_shown"] == 10
    assert parsed["queries"] == timings


def test_load_flagged_head_still_fits():
    """The load-contamination marker (round-11 bench hardening) grows the
    head by two keys — the line must still fit the driver's 2000-char
    tail window with the full registry's worst-case timing widths."""
    head = {**HEAD, "load_flagged": True, "n_requeried": 17}
    line = build_line(head, _registry_timings())
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["load_flagged"] is True
    assert parsed["n_requeried"] == 17
    assert list(parsed)[-1] == "queries"


def test_membership_is_stable_under_run_noise():
    """VERDICT r11 task #2: the clipped line's MEMBERSHIP must come from
    the committed reference (rank_ref + sticky), not this run's noisy
    timings — ranking by the run's own values made PERF_r11 report 9
    phantom 'dropped' queries."""
    timings = _registry_timings()
    names = sorted(timings)
    # reference ranks the first 80 names highest; sticky pins 5 of the
    # cheapest-by-this-run names into the line regardless of their wall
    rank_ref = {n: 100.0 - i for i, n in enumerate(names[:80])}
    sticky = names[-5:]
    noisy = dict(timings)
    for n in sticky:
        noisy[n] = 0.001  # this-run noise says "fast" — must still show
    line = build_line(HEAD, noisy, rank_ref=rank_ref, sticky=sticky)
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    for n in sticky:
        assert n in parsed["queries"], f"sticky {n} clipped out"
        assert parsed["queries"][n] == 0.001  # value is THIS run's
    # the PERF_r11 artifact was queries that got FAST falling out of the
    # line: with a full-coverage reference, downward noise must never
    # change membership (rank = max(ref, now) = ref)
    full_ref = dict(timings)
    # values rounded to 3 dp like the real protocol, and kept at equal
    # serialized width (the budget fit depends on character count, so a
    # width change can legitimately move the boundary entry)
    fast1 = {n: round(t / 4.0, 3) for n, t in timings.items()}
    fast2 = {n: round(t / 2.0, 3) for n, t in timings.items()}
    m1 = json.loads(build_line(HEAD, fast1, rank_ref=full_ref))
    m2 = json.loads(build_line(HEAD, fast2, rank_ref=full_ref))
    assert set(m1["queries"]) == set(m2["queries"])


def test_newly_slow_query_still_forces_into_line():
    """Membership stability must not hide a genuine regression: a query
    absent from the reference whose current wall is huge ranks by its
    own timing (max(ref, now)) and survives clipping."""
    timings = _registry_timings()
    newcomer = sorted(timings)[0]
    rank_ref = {n: 50.0 for n in timings if n != newcomer}
    timings[newcomer] = 99.0
    parsed = json.loads(build_line(HEAD, timings, rank_ref=rank_ref))
    assert newcomer in parsed["queries"]


def test_committed_bench_ref_covers_previous_driver_line():
    """BENCH_REF.json (the committed reference bench.py ranks by) must
    carry a sticky list covering the previous driver-visible line and a
    positive quiet-box wall for every registry query, and the resulting
    line must fit the window with every sticky name shown."""
    import os

    from ia_hadoop_tools_spark.driver_queries import QUERIES

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_REF.json")
    ref = json.load(open(path))
    assert set(ref["queries"]) == set(QUERIES)
    assert all(v > 0 for v in ref["queries"].values())
    assert 0 < len(ref["sticky"]) <= len(QUERIES)
    assert set(ref["sticky"]) <= set(QUERIES)
    line = build_line(
        HEAD,
        {n: ref["queries"][n] for n in QUERIES},
        rank_ref=ref["queries"],
        sticky=ref["sticky"],
    )
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    for n in ref["sticky"]:
        assert n in parsed["queries"]


def test_bench_notes_disclose_fixture_reuse():
    """VERDICT r11 #8: the novel_docs_indexed fixture reuse is measured
    policy — the bench artifact must name it (the sidecar carries
    BENCH_NOTES for every noted query present in the run)."""
    from bench import BENCH_NOTES

    assert "novel_docs_indexed" in BENCH_NOTES
    assert "build_excluded" in BENCH_NOTES["novel_docs_indexed"]
    from ia_hadoop_tools_spark.driver_queries import QUERIES

    assert set(BENCH_NOTES) <= set(QUERIES)


def test_load_outliers_selection():
    """Re-run candidates under load: measured > 1.5x the quiet-box
    reference; failures and reference-less queries excluded."""
    from bench import load_outliers

    timings = {
        "a": 3.0,   # ref 1.0 -> outlier
        "b": 1.4,   # ref 1.0 -> within ratio
        "c": -1.0,  # failed -> never an outlier
        "d": 9.9,   # no ref -> excluded
        "e": 0.2,   # ref 0.1 -> outlier (ratio applies at any scale)
    }
    ref = {"a": 1.0, "b": 1.0, "c": 1.0, "e": 0.1}
    assert load_outliers(timings, ref) == {"a", "e"}
