"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-11 freeze: the two round-10 pending entries (``unigram_encode``,
``embedding_neardup_capped``) were registered (registry 126 -> 128) and
now live in ``corpus_queries.py``.  Entries added below during round 11
register at the round-12 freeze.
"""

from __future__ import annotations

PENDING_QUERIES: dict = {}

PENDING_ORACLE_SQL: dict = {}
