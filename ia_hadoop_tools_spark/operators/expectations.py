"""Declarative data-quality expectations (the dbt-test / Great
Expectations shape) evaluated in one pass.

A 100 TB ingest pipeline gates every batch on contract checks; running
them as N separate queries means N full scans. This module compiles a
rule list into ONE conditional-aggregation pass over the table (row
rules), plus one groupBy for each uniqueness rule — the minimal scan
count — and returns a tidy violations table the gate can assert on.

Rule grammar (tuples, order preserved in output):

- ``("not_null", col)``
- ``("range", col, lo, hi)``            — violations outside [lo, hi];
  NULL is not a range violation (compose with not_null)
- ``("accepted_values", col, values)``  — NULL is a violation (unknown)
- ``("regex", col, pattern)``           — full-match; NULL violates
- ``("unique", cols...)``               — rows in excess of one per key
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_violation(rule: tuple) -> Column:
    kind = rule[0]
    if kind == "not_null":
        return F.col(rule[1]).isNull()
    if kind == "range":
        _, col, lo, hi = rule
        c = F.col(col)
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if kind == "accepted_values":
        _, col, values = rule
        c = F.col(col)
        return c.isNull() | ~c.isin(list(values))
    if kind == "regex":
        _, col, pattern = rule
        c = F.col(col)
        return c.isNull() | ~c.rlike(f"^(?:{pattern})$")
    raise ValueError(f"unknown rule kind: {kind!r}")


def rule_name(rule: tuple) -> str:
    kind = rule[0]
    if kind == "unique":
        return "unique:" + ",".join(rule[1:])
    return f"{kind}:{rule[1]}"


def expectations(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` -> (``rule``, ``n_violations``).

    One scan covers all row-level rules (conditional count aggregation);
    each ``unique`` rule adds one groupBy on its key. A clean table
    yields all-zero counts — assert ``max(n_violations) == 0`` to gate.
    """
    if not rules:
        raise ValueError("no rules given")
    # disambiguate duplicate rule names in the OUTPUT too: a strict and a
    # loose range on one field both named 'range:v' would silently collapse
    # in any dict-keyed consumer — suffix repeats with #2, #3, ...
    seen: dict[str, int] = {}

    def out_name(r: tuple) -> str:
        base = rule_name(r)
        seen[base] = seen.get(base, 0) + 1
        return base if seen[base] == 1 else f"{base}#{seen[base]}"

    names = {id(r): out_name(r) for r in rules}
    row_rules = [r for r in rules if r[0] != "unique"]
    uniq_rules = [r for r in rules if r[0] == "unique"]
    parts = []
    if row_rules:
        # positional internal aliases: two rules may share kind+column
        # (e.g. a strict and a loose range on one field), and rule_name
        # collisions would make the F.col references ambiguous
        agg = df.agg(
            *[
                F.count_if(_row_violation(r)).alias(f"__r{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        pairs = F.array(
            *[
                F.struct(
                    F.lit(names[id(r)]).alias("rule"),
                    F.col(f"__r{i}").alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        parts.append(
            agg.select(F.explode(pairs).alias("__x")).select(
                "__x.rule", "__x.n_violations"
            )
        )
    for r in uniq_rules:
        keys = list(r[1:])
        # dbt convention: NULL keys are ignored by the unique test (they
        # are not-null's job) — grouping them together counted all NULL
        # rows as duplicates of each other
        nn = df
        for kcol in keys:
            nn = nn.filter(F.col(kcol).isNotNull())
        dupes = (
            nn.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.col("__n") - 1), F.lit(0).cast("long")
                ).alias("n_violations")
            )
            .select(F.lit(names[id(r)]).alias("rule"), "n_violations")
        )
        parts.append(dupes)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
