#!/usr/bin/env python
"""Interleaved A/Bs for round-11 candidates:

  span:  V0 current span_dedup_stats/span_dedup (base persisted MEMORY_AND_DISK)
         V1 same code with the BASE persist skipped (tokenize runs twice,
            no token-array cache materialization)
  tri:   T0 current triangle_count (deg = union of two e subtrees)
         T1 deg via explode(array(a,b)) — single e subtree
         T2 T1 + e persisted (the day-pair-join pipeline runs once)

Registry-row inputs, one session, alternating reps, value identity checked.
Usage: python scripts/ab_span_tri_r11.py [pairs] [span|tri]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class skip_toks_persist:
    """Context manager: DataFrame.persist becomes a no-op for frames
    carrying __toks (the span base frame)."""

    def __enter__(self):
        self._orig = DataFrame.persist

        def fake(df, *a, **k):
            if "__toks" in df.columns:
                return df
            return self._orig(df, *a, **k)

        DataFrame.persist = fake
        return self

    def __exit__(self, *exc):
        DataFrame.persist = self._orig
        return False


def tri_variant(pairs, mode):
    from ia_hadoop_tools_spark.operators.graph import _node_col

    sa, sb = _node_col(pairs, "src"), _node_col(pairs, "dst")
    e = pairs.select(
        F.least(sa, sb).alias("a"), F.greatest(sa, sb).alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    caches = []
    if mode == "T2":
        e = e.persist()
        caches.append(e)
    if mode == "T0":
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
    else:
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("__e")
        )
        .select("__e.u", "__e.v")
    ).persist()
    caches.append(oriented)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    tri = wedges.join(
        e3, (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v"))
    )
    out = tri.agg(F.count("*").alias("n_triangles"))
    out.tri_caches = tuple(caches)
    return out


def main() -> None:
    pairs_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    which_fam = sys.argv[2] if len(sys.argv) > 2 else "both"

    import ia_hadoop_tools_spark.analytics_queries as aq
    from ia_hadoop_tools_spark.driver_queries import QUERIES
    from ia_hadoop_tools_spark.session import get_spark, load_tables

    spark = get_spark("r11-ab-span-tri")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].limit(5).collect()

    def run(fn, label) -> float:
        spark.catalog.clearCache()
        df = fn()
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def report(name, walls):
        base = statistics.median(walls[sorted(walls)[0]])
        for k in sorted(walls):
            m = statistics.median(walls[k])
            print(
                f"{name} {k} med={m:.3f} min={min(walls[k]):.3f} "
                f"ratio {m / base:0.3f} ({['%.2f' % w for w in walls[k]]})",
                flush=True,
            )

    if which_fam in ("span", "both"):
        qs = QUERIES["span_stats"]
        qd = QUERIES["span_dedup"]

        def v0s():
            return qs(spark, SF_DIR)

        def v1s():
            with skip_toks_persist():
                return qs(spark, SF_DIR)

        def v0d():
            return qd(spark, SF_DIR)

        def v1d():
            with skip_toks_persist():
                return qd(spark, SF_DIR)

        a = sorted(map(tuple, v0s().collect()))
        b = sorted(map(tuple, v1s().collect()))
        assert a == b, "span_stats V1 differs"
        spark.catalog.clearCache()
        a = sorted(map(tuple, v0d().collect()))
        b = sorted(map(tuple, v1d().collect()))
        assert a == b, "span_dedup V1 differs"
        print(f"span value identity OK ({len(a)} rows)", flush=True)
        walls = {"V0_stats": [], "V1_stats": [], "V0_dedup": [], "V1_dedup": []}
        for _ in range(pairs_n):
            walls["V0_stats"].append(run(v0s, "ab:span_stats:V0"))
            walls["V1_stats"].append(run(v1s, "ab:span_stats:V1"))
            walls["V0_dedup"].append(run(v0d, "ab:span_dedup:V0"))
            walls["V1_dedup"].append(run(v1d, "ab:span_dedup:V1"))
        report("span", walls)

    if which_fam in ("tri", "both"):
        from ia_hadoop_tools_spark.operators import graph as g

        orig_tc = g.triangle_count

        def build(mode):
            # q_triangles imports triangle_count from operators.graph at
            # call time — patch the graph module itself
            g.triangle_count = (
                orig_tc if mode == "orig" else (lambda p, **k: tri_variant(p, mode))
            )
            try:
                return QUERIES["triangles"](spark, SF_DIR)
            finally:
                g.triangle_count = orig_tc

        vals = {}
        for mode in ("orig", "T1", "T2"):
            spark.catalog.clearCache()
            vals[mode] = build(mode).collect()[0]["n_triangles"]
        assert len(set(vals.values())) == 1, f"triangle counts differ: {vals}"
        print(f"tri value identity OK (n={vals['orig']})", flush=True)
        walls = {m: [] for m in ("orig", "T1", "T2")}
        for _ in range(pairs_n):
            for m in ("orig", "T1", "T2"):
                walls[m].append(run(lambda m=m: build(m), f"ab:triangles:{m}"))
        report("tri", walls)

    spark.stop()


if __name__ == "__main__":
    main()
