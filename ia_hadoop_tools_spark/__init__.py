"""ia_hadoop_tools_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of internetarchive/ia-hadoop-tools.

The reference (/root/reference, Java 6 / Hadoop 1.x MapReduce + Pig) is the
Internet Archive's web-archive ETL toolkit: WARC/ARC -> CDX extraction, total-order
"cluster" index builds, incremental sorted merges, and indexed range queries
(see SURVEY.md). This package re-expresses those semantics Spark-first:

- The CDX table is a typed DataFrame (``schemas.CDX_SCHEMA``), Parquet-native,
  sorted by (urlkey, timestamp); ZipNum blocked-gzip is kept only as a compat codec
  (``sources.zipnum``).
- Every reference operator is a composable ``df.transform(...)``-style function
  under ``operators/``; scalar UDF surface under ``functions/``.
- Planning is left to Catalyst: range partitioning via ``repartitionByRange``,
  data skipping via Parquet row-group stats, merges via union + range sort.

Layout:
    schemas      — CDX / crawl-log / ZipNum-idx / split-file schemas
    session      — SparkSession builder tuned for large-scale batch
    functions/   — surt, datetime14, json, url, text, hash, vector scalar layers
    operators/   — parse, filter, dedup, daylimit, cluster, merge, setops,
                   similarity, textops, multimodal, extract
    sources/     — zipnum codec, file-listing / http ingestion helpers
    plans/       — explicit-boundary range partitioner helper
    streaming/   — incremental (STAGED/INCLUDED) batch + availableNow ingest
"""

__version__ = "0.1.0"
