"""Registry candidates implemented AFTER the current round's freeze.

Registry discipline (COVERAGE.md): the manifest freezes in each round's
first session-hour; anything added after the freeze would reach the
driver's correctness snapshot unverified.  Post-freeze additions
therefore ship as pytest-pinned pending entries — the same
(spark_query, oracle_sql) contract as ``__spark_entry__.queries()``,
exercised continuously by tests/test_pending_oracles.py with the exact
driver comparison (row count + column names + sorted value equality) —
and move into the real registry when the next round opens it.

Round-10 freeze: the four round-9 pending entries (``lang_nb``,
``normalize_text``, ``hash_embed``, ``unigram_counts``) were registered
(registry 122 -> 126) and now live in ``corpus_queries_r10.py``.
Entries added below during round 10 register at the round-11 freeze.
"""

from __future__ import annotations

PENDING_QUERIES: dict = {}

PENDING_ORACLE_SQL: dict = {}
