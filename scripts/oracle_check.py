#!/usr/bin/env python
"""Local differential harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, then compares row count + column names + order-insensitive values
(columns sorted by name, rows sorted, exact equality after normalizing to
pandas objects). Exit code 0 iff every query matches.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        issues.append(
            f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
        )
        return issues
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    # dtype drift is warn-only here (values compare loosely below), but the
    # driver's value-hash may be representation-sensitive — surface it.
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            print(f"  dtype-warn {name}.{c}: spark={a[c].dtype} duck={b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(av, bv))
                if not _eq(x, y)
            ]
            if bad:
                i, x, y = bad[0]
                issues.append(
                    f"col {c}: {len(bad)}/{len(av)} values differ; first row {i}: {x!r} != {y!r}"
                )
    return issues


def _eq(x, y) -> bool:
    import math

    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y
    try:
        if pd.isna(x) and pd.isna(y):
            return True
        if bool(pd.isna(x)) != bool(pd.isna(y)):
            return False
    except (TypeError, ValueError):
        pass
    return x == y


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:]) if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from ia_hadoop_tools_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; Spark-written sf1
        # replicas (scripts/make_sf1.py) are parquet DIRECTORIES — glob
        # the parts so the sweep runs against either layout
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle, rows-only)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        issues = compare(name, spark_pdf, duck_pdf)
        dt = time.time() - t0
        if issues:
            failures.append(name)
            print(f"FAIL  {name} ({dt:.1f}s, {len(spark_pdf)} rows): " + "; ".join(issues))
        else:
            print(f"MATCH {name} ({dt:.1f}s, {len(spark_pdf)} rows)")

    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
