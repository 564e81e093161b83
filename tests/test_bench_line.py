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
