"""Typed schemas for the engine's record formats.

The reference keeps everything as untyped ``Text`` key/value pairs; here each
format is a first-class ``StructType`` so Catalyst can prune columns and push
predicates into the Parquet scan.

References (field semantics, /root/reference):
- CDX 11-field "N b a m s k r M S V g" layout: src/main/java/org/archive/hadoop/
  pig/CDXLoader.java:28-41, mapreduce/CDXMapper.java:21-22.
- 9/10-column legacy variants: mapreduce/CDXMapper.java:76-91,
  jobs/CDXTransformer.java:55-66.
- Heritrix crawl log (13 output cols, field 8 split on '+'):
  pig/CrawlLogLoader.java:47-99.
- ZipNum idx sidecar (firstKey \t shard \t offset \t length):
  mapreduce/ZipNumRecordWriter.java:26-35,190-201; cdx/ZipNumBlock.java:8-17.
- Split file (name start end): cdx/SplitFile.java:39-51.
- Petabox item metadata JSON: src/test/resources/org/archive/petabox/
  metadata-regular.json, petabox/ItemMetadata.java.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical 11-field CDX capture record. Null is spelled "-" in the text form;
#: parsed DataFrames use real nulls (operators/parse.py).
CDX_SCHEMA = StructType(
    [
        StructField("urlkey", StringType(), False),          # N: SURT key, sort key 1
        StructField("timestamp", StringType(), False),       # b: yyyyMMddHHmmss, sort key 2
        StructField("original_url", StringType(), True),     # a
        StructField("mimetype", StringType(), True),         # m
        StructField("statuscode", IntegerType(), True),      # s ("-" -> null)
        StructField("digest", StringType(), True),           # k: SHA1 base32
        StructField("redirect", StringType(), True),         # r ("-" -> null; may hold ' '/CR)
        StructField("meta_flags", StringType(), True),       # M ("A" = noarchive)
        StructField("compressed_length", LongType(), True),  # S (absent in 9/10-col)
        StructField("compressed_offset", LongType(), True),  # V
        StructField("filename", StringType(), True),         # g: source (W)ARC basename
    ]
)

#: Column order matters: text emission re-joins in this order with '-' for nulls
#: (jobs/CDXTransformer.java:139-141 semantics).
CDX_COLUMNS = [f.name for f in CDX_SCHEMA.fields]

#: Heritrix crawl log, 13 output columns (field 8 "start+duration" split in two,
#: pig/CrawlLogLoader.java:67-93; bad size -> -1, '-' -> null).
CRAWLLOG_SCHEMA = StructType(
    [
        StructField("log_ts", StringType(), True),
        StructField("status", IntegerType(), True),
        StructField("size", LongType(), True),
        StructField("url", StringType(), True),
        StructField("discovery_path", StringType(), True),
        StructField("via_url", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("thread", StringType(), True),
        StructField("start_time", StringType(), True),
        StructField("duration", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("source_tag", StringType(), True),
        StructField("annotations", StringType(), True),
    ]
)

#: ZipNum block index sidecar line (one per gzip envelope).
ZIPNUM_IDX_SCHEMA = StructType(
    [
        StructField("summary_key", StringType(), False),
        StructField("shard", StringType(), False),
        StructField("offset", LongType(), False),
        StructField("length", LongType(), False),
    ]
)

#: Range-partition boundary spec (end-exclusive), cdx/SplitFile.java:39-51.
SPLITFILE_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("start", StringType(), False),
        StructField("end", StringType(), False),
    ]
)

#: Petabox item metadata (nested JSON -> typed struct; numerics arrive as strings).
PETABOX_FILE_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("source", StringType(), True),
        StructField("format", StringType(), True),
        StructField("mtime", StringType(), True),
        StructField("size", StringType(), True),
        StructField("md5", StringType(), True),
        StructField("crc32", StringType(), True),
        StructField("sha1", StringType(), True),
        StructField("private", StringType(), True),
    ]
)

PETABOX_ITEM_SCHEMA = StructType(
    [
        StructField("created", LongType(), True),
        StructField("server", StringType(), True),
        StructField("d1", StringType(), True),
        StructField("d2", StringType(), True),
        StructField("dir", StringType(), True),
        StructField("files", ArrayType(PETABOX_FILE_SCHEMA), True),
        StructField("is_collection", BooleanType(), True),
        StructField("solo", BooleanType(), True),
    ]
)

#: Multimodal asset record: opaque payload + typed metadata (operators/multimodal.py).
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("codec", StringType(), True),
    ]
)
