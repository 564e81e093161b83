#!/usr/bin/env python
"""Synthesize an sf1-scale dataset from sf0.1 by FK-consistent 10x
replication, for the registry-wide scale sweep (BASELINE.md): each fact
table is unioned 10 times with every key family shifted by
rep * (global_max(family) + 1), so joins keep exactly 10x the matches;
nation/region stay fixed (TPC-H keeps 25 nations at every sf).
Embeddings get a small deterministic per-rep perturbation (plain
replication would make every vector a 10-way exact duplicate and turn
the near-dup probes into a different workload); documents get a per-rep
suffix token for the same reason.

Usage: python scripts/make_sf1.py [src_sf_dir] [out_dir] [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/iht_sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

#: key families shifted together across tables (FK consistency); matched
#: by column-name suffix after the TPC-H table prefix
FAMILIES = {
    "orderkey": ["o_orderkey", "l_orderkey"],
    "custkey": ["c_custkey", "o_custkey"],
    "partkey": ["p_partkey", "l_partkey"],
    "suppkey": ["s_suppkey", "l_suppkey"],
    "event_id": ["event_id"],
    "user_id": ["user_id"],
    "doc_id": ["doc_id"],
    "vec_id": ["vec_id"],
}
FIXED_TABLES = ("region", "nation")
SCALED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main():
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    tables = {
        t: spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        for t in FIXED_TABLES + SCALED_TABLES
    }
    col_to_family = {c: fam for fam, cols in FAMILIES.items() for c in cols}
    base = {}
    for fam, cols in FAMILIES.items():
        ms = [
            tables[t].agg(F.max(c)).first()[0]
            for t in SCALED_TABLES
            for c in cols
            if c in tables[t].columns
        ]
        base[fam] = max(m for m in ms if m is not None) + 1

    os.makedirs(OUT, exist_ok=True)
    for t in FIXED_TABLES:
        tables[t].write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )
    for t in SCALED_TABLES:
        df = tables[t]
        reps = []
        for i in range(REPS):
            r = df
            for c in df.columns:
                fam = col_to_family.get(c)
                if fam is not None:
                    r = r.withColumn(
                        c, (F.col(c) + F.lit(i * base[fam])).cast("long")
                    )
            if t == "embeddings" and i > 0:
                r = r.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x
                            + F.cos(
                                F.col("vec_id") * 7 + j * 13 + F.lit(i)
                            )
                            * 0.05
                        ).cast("float"),
                    ),
                )
            if t == "documents" and i > 0:
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rep{i}"))
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
        print(f"{t}: {REPS}x written")
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()
