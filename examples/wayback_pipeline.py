#!/usr/bin/env python
"""End-to-end Wayback-style index pipeline, the reference's core loop:

    raw CDX text -> parse -> canonicalize-filter -> global wayback rules
    -> day limit -> sorted range-partitioned cluster -> bounded range
    query + CDX-Server lookups (closest-timestamp, collapse).

Run: python examples/wayback_pipeline.py [work_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="wb_")
    os.makedirs(work, exist_ok=True)
    from ia_hadoop_tools_spark.operators.cdx_query import cdx_query
    from ia_hadoop_tools_spark.operators.cluster import (
        cluster_range,
        write_cluster,
    )
    from ia_hadoop_tools_spark.operators.daylimit import day_limit
    from ia_hadoop_tools_spark.operators.filters import (
        cdx_filter,
        global_wayback_filter,
    )
    from ia_hadoop_tools_spark.operators.parse import parse_cdx, read_cdx_text
    from ia_hadoop_tools_spark.session import get_spark

    spark = get_spark("example-wayback")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. synthesize a raw CDX file (in production: HDFS/S3 paths)
    cdx = os.path.join(work, "raw.cdx")
    with open(cdx, "w") as fh:
        fh.write(" CDX N b a m s k r M S V g\n")
        for i in range(5000):
            fh.write(
                f"org,example)/page{i % 100} 2020{i % 12 + 1:02d}"
                f"{i % 28 + 1:02d}{i % 24:02d}0000 "
                f"http://example.org/page{i % 100} text/html 200 DIG{i} - - "
                f"{400 + i} {i * 800} crawl-{i % 7}.warc.gz\n"
            )

    # 2. parse -> filter -> day-limit -> sorted cluster
    parsed = global_wayback_filter(cdx_filter(parse_cdx(read_cdx_text(spark, cdx))))
    limited = day_limit(parsed, n=2)
    cluster = os.path.join(work, "cluster")
    write_cluster(limited, cluster, num_ranges=4)

    # 3. bounded range scan (the reference's cluster-range CLI)
    rows = cluster_range(
        cluster, "org,example)/page10", "org,example)/page20", spark=spark
    )
    print(f"range scan rows: {rows.count()}")

    # 4. CDX-Server lookups over the same cluster
    cl = spark.read.parquet(cluster)
    closest = cdx_query(
        cl, "http://example.org/page42", sort="closest", closest="20200615", limit=3
    )
    print("3 captures nearest 2020-06-15 for /page42:")
    for r in closest.collect():
        print("  ", r["timestamp"], r["original_url"])
    collapsed = cdx_query(
        cl, "http://example.org/page7", collapse="timestamp:6", limit=5
    )
    print(f"per-month collapsed history rows for /page7: {collapsed.count()}")
    spark.stop()
    print(f"work dir: {work}")


if __name__ == "__main__":
    main()
