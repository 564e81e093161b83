"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-8 freeze: the four round-7 pending entries (``corpus_shuffle``,
``lm_word_score``, ``lm_backoff_score``, ``split_leakage``) were
registered (registry 111 -> 115) and now live in
``corpus_queries_r8.py``.  Entries added below during round 8 register
at the round-9 freeze.
"""

from __future__ import annotations

PENDING_QUERIES: dict = {}

PENDING_ORACLE_SQL: dict = {}
