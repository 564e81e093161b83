"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-9 freeze: the seven round-8 pending entries (``split_leakage_near``,
``lm_word_buckets``, ``source_cap``, ``nb_quality``, ``prototype_prune``,
``corpus_stats``, ``curriculum_shuffle``) were registered (registry
115 -> 122) and now live in ``corpus_queries_r9.py``.  Entries added
below during round 9 register at the round-10 freeze.
"""

from __future__ import annotations

PENDING_QUERIES: dict = {}

PENDING_ORACLE_SQL: dict = {}
