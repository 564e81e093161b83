"""The driver-contract query registry: every operator from SURVEY.md §2 as a
named (Spark callable, DuckDB oracle SQL) pair.

Each callable takes (spark, sf_dir) and returns a DataFrame; each oracle is
ANSI-ish SQL DuckDB runs on the same parquet tables (views pre-registered by
the driver). Column names/aliases MATCH between both sides; float-producing
aggregations go through exact DECIMAL accumulation or end-of-pipeline
round(, 6) so value hashes compare bit-stably.

Query -> reference-operator map (file:line cited per function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.functions.datetime14 import ts14_to_epoch_millis
from ia_hadoop_tools_spark.functions.hashfns import (
    MERSENNE_P,
    hash32_sql,
    minhash_permutations,
)
from ia_hadoop_tools_spark.functions.surt import surt_expr
from ia_hadoop_tools_spark.functions.textfns import (
    BPE_TOKEN_RE,
    LANG_STOPWORDS,
    bpe_token_count,
    doc_fingerprint,
    doc_fingerprint_sql,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from ia_hadoop_tools_spark.operators.cluster import cluster_range
from ia_hadoop_tools_spark.operators.daylimit import day_limit
from ia_hadoop_tools_spark.operators.dedup import dedup_exact, dedup_first_per_key
from ia_hadoop_tools_spark.operators.filters import (
    access_control_filter,
    prefix_semi_filter,
)
from ia_hadoop_tools_spark.operators.merge import merge_clusters
from ia_hadoop_tools_spark.operators.parse import parse_cdx, parse_crawllog
from ia_hadoop_tools_spark.operators.setops import work_queue
from ia_hadoop_tools_spark.operators.similarity import ann_bruteforce_topk
from ia_hadoop_tools_spark.operators.textops import (
    dedup_exact_text,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from ia_hadoop_tools_spark.session import load_tables

# ---------------------------------------------------------------------------
# shared constants (Spark and oracle must agree)

DAY_LIMIT_N = 5
MERGE_DAY_LIMIT_N = 3
RANGE_START, RANGE_END = "Customer#000000100", "Customer#000000200"
PART_PREFIXES = ("small", "cold")
BLOCKED_SEGMENTS = ("AUTOMOBILE", "HOUSEHOLD")
TOPK_ORDERS = 3
Q1_CUTOFF = "2000-09-02 00:00:00"
MINHASH_PERMS = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS
SHINGLE_WORDS = 3
JACCARD_THRESHOLD = 0.5
ANN_K = 10
ANN_NUM_QUERIES = 5
NEARDUP_COS_THRESHOLD = 0.35
FP_K = 8

#: CDX parser fixture lines (reference CDXLoaderTest.java:59-60,86-87 + 9/10-col
#: variants per CDXMapper.java:76-91).
CDX_FIXTURE_LINES = [
    " CDX N b a m s k r M S V g",
    "101,78,123,109)/robots.txt 20120103084508 http://109.123.78.101/robots.txt "
    "text/html 404 22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN - - 561 55426267 "
    "WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz",
    "131,125,136,219)/ 20120103084049 http://219.136.125.131/ text/html 302 "
    "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ http://219.136.125.131/selfLogon.do?hoge=1 2 "
    "- 449 34133512 WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz",
    "com,example)/ 20200101000000 http://example.com/ text/html 200 DIGESTX - 123 f.warc.gz",
    "com,example)/a 20200101000001 http://example.com/a text/html 200 DIGESTY - A 124 g.warc.gz",
]

TS14_FIXTURES = [
    "20120103084508",
    "20120103084508123",
    "19991231235959",
    "bogus",
    "20200229120000",
]

SURT_FIXTURES = [
    "http://www.Example.com/Path?b=2&a=1",
    "https://archive.org:443/details/Item",
    "http://sub.domain.co.uk/a/B.html",
    "ftp://User@files.example.net:21/pub",
    "http://www2.foo.org/q?z=1&y=2&x=3",
    # reference's own CDX fixture URLs (pig/CDXLoaderTest.java:60,87,104)
    "http://109.123.78.101/robots.txt",
    "http://219.136.125.131/",
    "http://www.nuernberger.de/rente/",
    # non-default port + session params + mixed-case query keys
    "http://example.com:8080/A?PHPSESSID=abc123&B=2&b=1",
    "https://Host.NET:8443/x?jsessionid=deadbeef",
    "http://a.b/p?Foo=1&bar=2",
    # fragment containing a '?': query extraction must not read past '#'
    "http://e.com/app#/route?tab=1",
]

CRAWLLOG_FIXTURE_LINES = [
    "2012-01-03T08:45:08.123Z 200 5612 http://example.com/x LLE "
    "http://example.com/ text/html #042 20120103084507123+456 sha1:ABCDEF GO note",
    "2012-01-03T08:45:09Z -404 - http://e.com/ - - - #1 - sha1:X - -",
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("events",))["events"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir, (name,))[name]


# ---------------------------------------------------------------------------
# 1. day_limit — GlobalWaybackMergeMapper.java:20-83 (cap per key per day)

def q_day_limit(spark, sf_dir):
    ev = _events(spark, sf_dir)
    capped = day_limit(
        ev, n=DAY_LIMIT_N, key_col="user_id", ts_col="ts",
        day_expr=F.to_date("ts"), tiebreakers=["event_id"],
    )
    return capped.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type", "value"
    )


SQL_DAY_LIMIT = f"""
SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= {DAY_LIMIT_N}
"""


# 2. dedup_exact — CdxDedupReducer.java:28-56

def q_dedup_exact(spark, sf_dir):
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    return dedup_exact(ev)


SQL_DEDUP_EXACT = "SELECT DISTINCT user_id, event_type FROM events"


# 3. first_per_key — reducer keeps first value per key (CdxDedupReducer guard)

def q_first_per_key(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type"
    )
    return dedup_first_per_key(ev, keys=["user_id"], order=["ts_us", "event_id"])


SQL_FIRST_PER_KEY = """
SELECT user_id, ts_us, event_id, event_type
FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# 4. range_scan — CDXCluster/ClusterRange bounded [start, end) scan

def q_range_scan(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return cluster_range(cust, RANGE_START, RANGE_END, key_col="c_name")


SQL_RANGE_SCAN = f"""
SELECT * FROM customer WHERE c_name >= '{RANGE_START}' AND c_name < '{RANGE_END}'
"""


# 5. prefix_filter — SortMergeInputFormat prefix semi-join (:278-311)

def q_prefix_filter(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return prefix_semi_filter(part, PART_PREFIXES, key_col="p_name")


SQL_PREFIX_FILTER = "SELECT * FROM part WHERE " + " OR ".join(
    f"p_name LIKE '{p}%'" for p in sorted(set(PART_PREFIXES))
)


# 6. policy_anti_join — AccessControlAllowCapture.java:14-67

def q_policy_anti_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    rules = spark.createDataFrame(
        [(s, "block") for s in BLOCKED_SEGMENTS] + [("BUILDING", "allow")],
        "key_prefix: string, policy: string",
    )
    return access_control_filter(cust, rules, key_col="c_mktsegment")


SQL_POLICY_ANTI_JOIN = "SELECT * FROM customer WHERE NOT (" + " OR ".join(
    f"c_mktsegment LIKE '{s}%'" for s in BLOCKED_SEGMENTS
) + ")"


# 7. merge_daylimit — MergeClusters.java:68-155 with global-CDX day cap

def q_merge_daylimit(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("urlkey"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("timestamp"),
        "event_id",
    )
    c1 = ev.filter(F.col("event_id") % 2 == 0)
    c2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_clusters(
        [c1, c2], daily_limit=MERGE_DAY_LIMIT_N, num_ranges=8,
        tiebreakers=["event_id"],
    )
    return merged.select("urlkey", "timestamp", "event_id")


SQL_MERGE_DAYLIMIT = f"""
WITH src AS (
  SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS urlkey,
         strftime(ts, '%Y%m%d%H%M%S') AS timestamp, event_id
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS urlkey,
         strftime(ts, '%Y%m%d%H%M%S') AS timestamp, event_id
  FROM events WHERE event_id % 2 = 1
)
SELECT urlkey, timestamp, event_id
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY urlkey, substr(timestamp, 1, 8)
    ORDER BY timestamp, event_id) AS rn
  FROM src
) WHERE rn <= {MERGE_DAY_LIMIT_N}
"""


# 7b. incremental_cycle — the reference's production loop composed end-to-end
# (cdx/notes.txt:19-36): STAGED − INCLUDED selects the next source batches,
# they merge into the existing cluster under the day limit, bookkeeping
# advances, and a SECOND cycle must be a no-op (empty work queue). The result
# is the cluster after both cycles; the oracle is the merge+day-limit over
# all four batches — if bookkeeping failed to advance, cycle 2 would re-merge
# batches 2-3 and the duplicated rows would break the value hash.

def q_incremental_cycle(spark, sf_dir):
    from ia_hadoop_tools_spark.streaming.incremental import incremental_merge_cycle

    ev = _events(spark, sf_dir).select(
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("urlkey"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("timestamp"),
        "event_id",
    )

    def read_source(spark_, path):
        b = int(path.rsplit("_", 1)[-1].split(".")[0])
        return ev.filter(F.col("event_id") % 4 == b)

    # ROUND 12 (guide §4 — no Python boundary for bookkeeping fixtures):
    # createDataFrame(list) parallelizes over defaultParallelism, so each
    # of the cycle's construction-time work-queue collects scanned 32
    # mostly-empty PYTHON-RDD partitions per side (a Python worker spin-up
    # per task). spark.range projections build the identical rows as pure
    # JVM codegen leaves.
    def _batch_name(col):
        return F.concat(F.lit("batch_"), col.cast("string"), F.lit(".cdx"))

    staged = spark.range(0, 4, 1, 1).select(
        _batch_name(F.col("id")).alias("basename"),
        F.concat(F.lit("/src/"), _batch_name(F.col("id"))).alias("path"),
    )
    included = spark.range(0, 2, 1, 1).select(
        _batch_name(F.col("id")).alias("basename")
    )
    existing = merge_clusters(
        [read_source(spark, f"/src/batch_{i}.cdx") for i in range(2)],
        tiebreakers=["event_id"],
    )
    merged, included = incremental_merge_cycle(
        spark, staged, included, read_source, existing,
        daily_limit=MERGE_DAY_LIMIT_N, tiebreakers=["event_id"],
    )
    # cycle 2: everything INCLUDED now — must return the cluster unchanged
    merged, included = incremental_merge_cycle(
        spark, staged, included, read_source, merged,
        daily_limit=MERGE_DAY_LIMIT_N, tiebreakers=["event_id"],
    )
    return merged.select("urlkey", "timestamp", "event_id")


SQL_INCREMENTAL_CYCLE = f"""
SELECT urlkey, timestamp, event_id
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY urlkey, substr(timestamp, 1, 8)
    ORDER BY timestamp, event_id) AS rn
  FROM (
    SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS urlkey,
           strftime(ts, '%Y%m%d%H%M%S') AS timestamp, event_id
    FROM events
  )
) WHERE rn <= {MERGE_DAY_LIMIT_N}
"""


# 8. work_queue — STAGED − INCLUDED (cdx/notes.txt:19-36)

def q_work_queue(spark, sf_dir):
    ev = _events(spark, sf_dir)
    staged = ev.filter(
        (F.col("event_type") == "signup") & (F.col("value") > 150)
    ).select("user_id").distinct()
    included = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 150)
    ).select("user_id").distinct()
    return work_queue(staged, included, key_col="user_id")


SQL_WORK_QUEUE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' AND value > 150
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150
"""


# 9. tpch_q1 — pricing summary (hash agg; native Spark per SURVEY §2.6)

def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    out = (
        li.filter(F.col("l_shipdate") <= Q1_CUTOFF)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 4).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 4).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(38,4)") - dec("l_discount"))), 4
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
        )
    )
    return out


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  CAST(round(SUM(CAST(l_quantity AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_qty,
  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,4))), 4) AS DOUBLE) AS sum_base_price,
  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,4)) * (CAST(1 AS DECIMAL(38,4)) - CAST(l_discount AS DECIMAL(38,4)))), 4) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / count(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# 10. topk_per_group — day-limit generalization: ranking window (SURVEY §2.7)

def q_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK_ORDERS)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


SQL_TOPK_ORDERS = f"""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= {TOPK_ORDERS}
"""


# 11. nation_revenue — broadcast dim joins + decimal-safe agg

def q_nation_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("customer", "nation", "region", "orders"))
    joined = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name", "r_name").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,4)")), 2)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_orders"),
    )


SQL_NATION_REVENUE = """
SELECT n_name, r_name,
  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# 12. rollup_counts — grouping sets (free upgrade noted in SURVEY §2.6)

def q_rollup_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    j = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return j.rollup("n_name", "c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(38,2)")), 2)
        .cast("double")
        .alias("total_acctbal"),
    )


SQL_ROLLUP_COUNTS = """
SELECT n_name, c_mktsegment, count(*) AS n_customers,
  CAST(round(SUM(CAST(c_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
"""


# 13. rolling_window — frame-spec analytics (SURVEY §2.7 "full family")

# 12a. tumbling_window — event-time tumbling aggregation via F.window (the
# batch twin of the Structured Streaming windowed agg; same plan family as
# streaming/sessions.py's session_window)

def q_tumbling_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("__w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_TUMBLING_WINDOW = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# 12b. zipnum_scan — the zipnum Python DataSource end-to-end: deterministic
# cluster fixture -> spark.read.format('zipnum') with a pushed-down urlkey
# range (block pruning) -> parsed fields; oracle regenerates the fixture
# lines in SQL.

def q_zipnum_scan(spark, sf_dir):
    import os as _os

    from ia_hadoop_tools_spark.sources.zipnum import write_zipnum
    from ia_hadoop_tools_spark.sources.zipnum_datasource import register_zipnum

    fixture = "/tmp/iht_zipnum_fixture"
    if not _os.path.exists(_os.path.join(fixture, "ALL.summary")):
        lines = [
            f"k{i:05d} 20200101{i % 24:02d}0000 payload-{i}" for i in range(5000)
        ]
        df = spark.createDataFrame([(l,) for l in lines], "value: string")
        write_zipnum(df, fixture, lines_per_block=200, num_shards=4)
    register_zipnum(spark)
    return (
        spark.read.format("zipnum")
        .load(fixture)
        .filter((F.col("urlkey") >= "k01000") & (F.col("urlkey") < "k01500"))
        .select("urlkey", "timestamp", "value")
    )


SQL_ZIPNUM_SCAN = """
SELECT 'k' || lpad(CAST(i AS VARCHAR), 5, '0') AS urlkey,
       '20200101' || lpad(CAST(i % 24 AS VARCHAR), 2, '0') || '0000'
         AS timestamp,
       'k' || lpad(CAST(i AS VARCHAR), 5, '0') || ' ' ||
       '20200101' || lpad(CAST(i % 24 AS VARCHAR), 2, '0') || '0000' ||
       ' payload-' || CAST(i AS VARCHAR) AS value
FROM range(1000, 1500) t(i)
"""


# 59. kvstore_scan — the HBase load/store pattern (HBaseStorage.java:96-330,
# HFileStorage.java:51-263) against the self-contained sorted-KV layout:
# bulk-load once (range-partitioned + sorted region files + META index),
# then a row-key-bounded scan through the sortedkv data source (region
# pruning via pushFilters) pivoted to HBaseStorage's column-list row shape.


def q_kvstore_scan(spark, sf_dir):
    import os as _os

    from ia_hadoop_tools_spark.sources.kvstore import (
        read_kv_columns,
        write_kvstore,
    )

    fixture = "/tmp/iht_kvstore_fixture"
    if not _os.path.exists(_os.path.join(fixture, "_REGIONS")):
        rows = []
        for i in range(3000):
            k = f"r{i:05d}"
            rows.append((k, "fa", 1, f"a-{i}"))
            rows.append((k, "fa", 2, f"a-{i}-new"))  # newer version wins
            rows.append((k, "fb", 5, str(i * 3)))
        cells = spark.createDataFrame(
            rows, "rowkey: string, column: string, ts: long, value: string"
        )
        write_kvstore(cells, fixture, num_regions=4)
    return read_kv_columns(
        spark, fixture, ["fa", "fb"], gte="r01000", lt="r01200"
    )


SQL_KVSTORE_SCAN = """
SELECT 'r' || lpad(CAST(i AS VARCHAR), 5, '0') AS rowkey,
       'a-' || CAST(i AS VARCHAR) || '-new' AS fa,
       CAST(i * 3 AS VARCHAR) AS fb
FROM range(1000, 1200) t(i)
"""


def q_rolling_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("rolling_value_3"),
    )


SQL_ROLLING_WINDOW = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
  CAST(round(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rolling_value_3
FROM events
"""


# 14. json_extract — ToJsonFunc/FromJsonFunc (pig/udf) over events.props

def q_json_extract(spark, sf_dir):
    from ia_hadoop_tools_spark.functions.jsonfns import json_to_map

    ev = _events(spark, sf_dir)
    k = F.element_at(json_to_map("props"), "k").cast("long")
    return (
        ev.select("event_id", k.alias("k_val"))
        .groupBy((F.col("k_val") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k_val").alias("k_sum"))
    )


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events
GROUP BY 1
"""


# 15. cdx_parse — CDXLoader.java:55-138 golden-fixture differential

def q_cdx_parse(spark, sf_dir):
    df = spark.createDataFrame([(l,) for l in CDX_FIXTURE_LINES], "value: string")
    return parse_cdx(df)


SQL_CDX_PARSE = """
SELECT * FROM (VALUES
  ('101,78,123,109)/robots.txt', '20120103084508', 'http://109.123.78.101/robots.txt',
   'text/html', CAST(404 AS INTEGER), '22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN', CAST(NULL AS VARCHAR),
   CAST(NULL AS VARCHAR), CAST(561 AS BIGINT), CAST(55426267 AS BIGINT),
   'WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz'),
  ('131,125,136,219)/', '20120103084049', 'http://219.136.125.131/',
   'text/html', CAST(302 AS INTEGER), '3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
   'http://219.136.125.131/selfLogon.do?hoge=1 2',
   CAST(NULL AS VARCHAR), CAST(449 AS BIGINT), CAST(34133512 AS BIGINT),
   'WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz'),
  ('com,example)/', '20200101000000', 'http://example.com/', 'text/html',
   CAST(200 AS INTEGER), 'DIGESTX', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
   CAST(NULL AS BIGINT), CAST(123 AS BIGINT), 'f.warc.gz'),
  ('com,example)/a', '20200101000001', 'http://example.com/a', 'text/html',
   CAST(200 AS INTEGER), 'DIGESTY', CAST(NULL AS VARCHAR), 'A',
   CAST(NULL AS BIGINT), CAST(124 AS BIGINT), 'g.warc.gz')
) AS t(urlkey, timestamp, original_url, mimetype, statuscode, digest, redirect,
       meta_flags, compressed_length, compressed_offset, filename)
"""


# 16. crawllog_parse — CrawlLogLoader.java:31-121 golden-fixture differential

def q_crawllog_parse(spark, sf_dir):
    df = spark.createDataFrame([(l,) for l in CRAWLLOG_FIXTURE_LINES], "value: string")
    return parse_crawllog(df)


SQL_CRAWLLOG_PARSE = """
SELECT * FROM (VALUES
  ('2012-01-03T08:45:08.123Z', CAST(200 AS INTEGER), CAST(5612 AS BIGINT),
   'http://example.com/x', 'LLE', 'http://example.com/', 'text/html', '#042',
   '20120103084507123', CAST(456 AS BIGINT), 'sha1:ABCDEF', 'GO', 'note'),
  ('2012-01-03T08:45:09Z', CAST(-404 AS INTEGER), CAST(-1 AS BIGINT),
   'http://e.com/', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
   '#1', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), 'sha1:X',
   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
) AS t(log_ts, status, size, url, discovery_path, via_url, content_type, thread,
       start_time, duration, content_hash, source_tag, annotations)
"""


# 17. ts14 — DateTime14ToTimestamp.java:21-43

def q_ts14(spark, sf_dir):
    df = spark.createDataFrame([(s,) for s in TS14_FIXTURES], "ts14: string")
    return df.select("ts14", ts14_to_epoch_millis("ts14").alias("epoch_ms"))


SQL_TS14 = """
SELECT ts14,
  CASE
    WHEN length(ts14) = 14 THEN epoch_ms(try_strptime(ts14, '%Y%m%d%H%M%S'))
    WHEN length(ts14) = 17 THEN epoch_ms(try_strptime(substr(ts14, 1, 14), '%Y%m%d%H%M%S'))
                                 + CAST(substr(ts14, 15, 3) AS BIGINT)
    ELSE NULL
  END AS epoch_ms
FROM (VALUES {vals}) AS t(ts14)
""".format(vals=", ".join(f"('{s}')" for s in TS14_FIXTURES))


# 18. surt — toSURT/Recanonicalize (the flagship scalar), column-expr version

def q_surt(spark, sf_dir):
    df = spark.createDataFrame([(u,) for u in SURT_FIXTURES], "url: string")
    return df.select("url", surt_expr("url").alias("surt"))


# Staged to mirror the documented SURT rules (functions/surt.py module doc):
# scheme/userinfo strip -> hostport/pathq split -> port relocation (80/443
# dropped, others appended after the reversed host) -> www-strip -> label
# reversal -> path lowercase/default -> query lowercase, session-param +
# empty-arg filter, sort.
_SURT_SQL_TEMPLATE = r"""
SELECT url,
       rev_host || ')' || path ||
       CASE WHEN q = '' THEN '' ELSE '?' || q END AS surt
FROM (
  SELECT url,
         array_to_string(list_reverse(string_split(host, '.')), ',') ||
           CASE WHEN port IN ('', '80', '443') THEN '' ELSE ':' || port END
           AS rev_host,
         CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         coalesce(array_to_string(list_sort(list_filter(
           string_split(query, '&'),
           a -> a != '' AND NOT regexp_matches(a,
             '^(jsessionid|phpsessid|sid|aspsessionid[a-z]*|cfid|cftoken)='))),
           '&'), '') AS q
  FROM (
    SELECT url,
           regexp_extract(hostport, ':(\d+)$', 1) AS port,
           regexp_replace(regexp_replace(regexp_replace(hostport,
             ':\d+$', ''), '^www\d*\.', ''), '^\[|\]$', '') AS host,
           lower(regexp_extract(regexp_extract(pathq, '^([^#]*)', 1),
             '^([^?]*)', 1)) AS path0,
           lower(regexp_extract(regexp_extract(pathq, '^([^#]*)', 1),
             '\?(.*)$', 1)) AS query
    FROM (
      SELECT url,
             lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS hostport,
             substr(rest,
               length(regexp_extract(rest, '^([^/?#]*)', 1)) + 1) AS pathq
      FROM (
        SELECT url,
               regexp_replace(regexp_replace(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '^[^/@?#]*@', '') AS rest
        FROM (VALUES {vals}) AS t(url)
      )
    )
  )
)
"""

SQL_SURT = _SURT_SQL_TEMPLATE.format(
    vals=", ".join(f"('{u}')" for u in SURT_FIXTURES)
)


# ---------------------------------------------------------------------------
# Training-data operators (north-star extensions) over documents/embeddings

_TOKS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"


def q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c, "en"), 6).alias("stopword_ratio_en"),
        F.round(quality_score(c), 6).alias("quality"),
    )


_SW_EN = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS_SQL} AS toks,
    length(text) AS n,
    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS np
  FROM documents
), m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
    CASE WHEN n > 0 THEN CAST(np AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END AS praw,
    CASE WHEN len(toks) > 0
      THEN CAST(len(list_filter(toks, t -> list_contains([{_SW_EN}], t))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE)
      ELSE 0.0 END AS swraw
  FROM base
)
SELECT doc_id,
  CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(n_bpe_tokens AS INTEGER) AS n_bpe_tokens,
  round(praw, 6) AS punct_ratio,
  round(swraw, 6) AS stopword_ratio_en,
  round(CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
      + CAST(0.3 AS DOUBLE) * (1.0 - praw)
      + CAST(0.3 AS DOUBLE) * least(5.0 * swraw, 1.0), 6) AS quality
FROM m
"""


# 21a. sample_mix / pack_sequences — deterministic training-mix sampling
# (content-addressed md5 thresholding, reproducible across engines) and
# GPT-style concat-and-chunk sequence packing (operators/sampling.py)

SAMPLE_MIX_FRACTIONS = {"src0": 0.9, "src1": 0.5, "src2": 0.1}
SAMPLE_MIX_DEFAULT = 0.25
PACK_BUDGET = 512


def q_sample_mix(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.sampling import sample_stratified

    d = _t(spark, sf_dir, "documents")
    return sample_stratified(
        d, SAMPLE_MIX_FRACTIONS, "source", "doc_id", SAMPLE_MIX_DEFAULT
    ).select("doc_id", "source")


SQL_SAMPLE_MIX = f"""
SELECT doc_id, source FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 1000000
      < CASE source
          WHEN 'src0' THEN {int(0.9 * 1_000_000)}
          WHEN 'src1' THEN {int(0.5 * 1_000_000)}
          WHEN 'src2' THEN {int(0.1 * 1_000_000)}
          ELSE {int(0.25 * 1_000_000)} END
"""


def q_pack_sequences(spark, sf_dir):
    from ia_hadoop_tools_spark.functions.textfns import tokens
    from ia_hadoop_tools_spark.operators.sampling import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        d, budget=PACK_BUDGET, strata_col="source"
    ).select("doc_id", "source", "n_tokens", "seq_start", "bin", "bin_offset")


SQL_PACK_SEQUENCES = f"""
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS seq_start,
       CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin,
       CAST((cum - n_tokens) % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (
    SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
    FROM documents
  )
)
"""


# 21b. quality_rules — Gopher-style repetition/shape quality filter with
# auditable per-rule verdicts (operators/quality.py)

def q_quality_rules(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.quality import quality_filter

    d = _t(spark, sf_dir, "documents")
    return quality_filter(d)


SQL_QUALITY_RULES = f"""
WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
w AS (SELECT doc_id, unnest(toks) AS w FROM tok),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
ws AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS dstnct,
         max(c) AS top,
         sum(length(w) * c) / CAST(sum(c) AS DOUBLE) AS mean_len
  FROM wc GROUP BY doc_id
),
bgl AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
           i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS g
  FROM tok WHERE len(toks) >= 2
),
gc AS (SELECT doc_id, g, count(*) AS c FROM bgl GROUP BY doc_id, g),
gs AS (
  SELECT doc_id,
         round(CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
           AS dupg
  FROM gc GROUP BY doc_id
),
stats AS (
  SELECT d.doc_id,
         COALESCE(ws.n_words, 0) AS n_words,
         COALESCE(round(ws.mean_len, 6), 0.0) AS mean_word_len,
         COALESCE(round(ws.dstnct / CAST(ws.n_words AS DOUBLE), 6), 0.0)
           AS distinct_word_ratio,
         COALESCE(round(ws.top / CAST(ws.n_words AS DOUBLE), 6), 0.0)
           AS top_word_fraction,
         COALESCE(gs.dupg, 0.0) AS dup_2gram_fraction
  FROM documents d
  LEFT JOIN ws ON d.doc_id = ws.doc_id
  LEFT JOIN gs ON d.doc_id = gs.doc_id
)
SELECT *,
       (ok_n_words AND ok_word_len AND ok_top_word AND ok_dup_2gram
        AND ok_distinct) AS passes
FROM (
  SELECT *,
         n_words BETWEEN 5 AND 1000000 AS ok_n_words,
         mean_word_len BETWEEN 2.0 AND 12.0 AS ok_word_len,
         top_word_fraction <= 0.2 AS ok_top_word,
         dup_2gram_fraction <= 0.3 AS ok_dup_2gram,
         distinct_word_ratio >= 0.2 AS ok_distinct
  FROM stats
)
"""


# 21c. dedup_lines — C4-style corpus-wide exact line dedup. The synthetic
# documents are single-line, so the query synthesizes a deterministic
# 3-line structure (shared group header / unique-ish body / global footer)
# to exercise cross-document line collisions.

def q_dedup_lines(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.quality import dedup_lines

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("shared-"), (F.col("doc_id") % 50).cast("string")),
            F.substring("text", 1, 80),
            F.lit("footer boilerplate"),
        ).alias("text"),
    )
    return dedup_lines(d)


SQL_DEDUP_LINES = r"""
WITH src AS (
  SELECT doc_id,
         'shared-' || CAST(doc_id % 50 AS VARCHAR) || chr(10) ||
         substr(text, 1, 80) || chr(10) || 'footer boilerplate' AS text
  FROM documents
),
lines AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         string_split(text, chr(10))[CAST(i AS INT)] AS line
  FROM src, range(1, 4) r(i)
),
kept AS (
  SELECT doc_id, pos, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY line ORDER BY doc_id, pos) AS rn
    FROM lines
  ) WHERE rn = 1
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
FROM kept GROUP BY doc_id
"""


# 21d. pii_scrub — regex redaction as a pure projection; PII-looking spans
# are injected deterministically since the synthetic corpus has none.

def q_pii_scrub(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.quality import scrub_pii

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 60),
            F.lit(" contact user"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("@example.com or 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return scrub_pii(d, kinds=("email", "ipv4"))


SQL_PII_SCRUB = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           substr(text, 1, 60) || ' contact user' ||
             CAST(doc_id % 100 AS VARCHAR) || '@example.com or 10.0.0.' ||
             CAST(doc_id % 256 AS VARCHAR),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '[REDACTED-EMAIL]', 'g'),
         '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[REDACTED-IPV4]', 'g') AS text
FROM documents
"""


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


def _langid_sql() -> str:
    hit_cols = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        hit_cols.append(
            f"len(list_filter({_TOKS_SQL}, t -> list_contains([{words}], t))) AS h_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)  # de, en, es, fr
    cases = []
    for i, lang in enumerate(langs):
        rest = langs[i + 1:]
        if rest:
            ge = " AND ".join(f"h_{lang} >= h_{r}" for r in rest)
            cases.append(f"WHEN h_{lang} > 0 AND {ge} THEN '{lang}'")
        else:
            cases.append(f"WHEN h_{lang} > 0 THEN '{lang}'")
    return f"""
WITH hits AS (SELECT doc_id, lang, {', '.join(hit_cols)} FROM documents)
SELECT doc_id, lang, CASE {' '.join(cases)} ELSE 'und' END AS lang_pred FROM hits
"""


SQL_LANG_ID = _langid_sql()


def q_fingerprint(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.textops import ensure_min_partitions

    d = ensure_min_partitions(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", doc_fingerprint(F.col("text"), FP_K).alias("fingerprint"))


SQL_FINGERPRINT = (
    f"SELECT doc_id, {doc_fingerprint_sql('text', FP_K)} AS fingerprint FROM documents"
)


def q_dedup_text(spark, sf_dir):
    return dedup_exact_text(_t(spark, sf_dir, "documents"))


SQL_DEDUP_TEXT = (
    "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text FROM documents GROUP BY text"
)


# shared SQL for word shingles + hashes (minhash/jaccard oracles)
_SHINGLES_SQL = f"""
tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, len(toks) - {SHINGLE_WORDS} + 2),
    i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {SHINGLE_WORDS - 1} AS INT)), ' ')
  )) AS shingles
  FROM tok WHERE len(toks) >= {SHINGLE_WORDS}
)
"""


def q_minhash_sigs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, num_perm=MINHASH_PERMS, shingle_words=SHINGLE_WORDS)
    return sigs.select("doc_id", F.posexplode("sig").alias("j", "sigv"))


def _minhash_sigs_sql() -> str:
    perms = minhash_permutations(MINHASH_PERMS)
    vals = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(perms))
    h = hash32_sql("sv")
    return f"""
WITH {_SHINGLES_SQL},
hv AS (SELECT doc_id, {h} AS h FROM (SELECT doc_id, unnest(shingles) AS sv FROM sh))
SELECT doc_id, CAST(p.j AS INTEGER) AS j,
       min((p.a * (h % {MERSENNE_P}) + p.b) % {MERSENNE_P}) AS sigv
FROM hv CROSS JOIN (VALUES {vals}) AS p(j, a, b)
GROUP BY doc_id, p.j
"""


SQL_MINHASH_SIGS = _minhash_sigs_sql()


def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_words=SHINGLE_WORDS, threshold=JACCARD_THRESHOLD,
    )


def _minhash_pairs_sql() -> str:
    sigs = _minhash_sigs_sql().strip()
    return f"""
WITH sigs AS ({sigs}),
buckets AS (
  SELECT doc_id,
         CAST(j // {MINHASH_ROWS} AS VARCHAR) || '_' ||
         string_agg(CAST(sigv AS VARCHAR), '_' ORDER BY j) AS bucket
  FROM sigs GROUP BY doc_id, j // {MINHASH_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
),
{_SHINGLES_SQL.lstrip().rstrip()}
SELECT id_a, id_b,
  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / CAST(len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / CAST(len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
"""


SQL_MINHASH_PAIRS = _minhash_pairs_sql()


# 24b. neardup_clusters — pairs -> transitive-closure dedup groups with a
# canonical keep-one-per-cluster verdict (operators/components.py); oracle
# is a DuckDB recursive CTE over the same MinHash pair SQL.

def q_neardup_clusters(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.components import dedup_groups

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_words=SHINGLE_WORDS, threshold=JACCARD_THRESHOLD,
    )
    return dedup_groups(d, pairs)


def _neardup_clusters_sql() -> str:
    pairs = _minhash_pairs_sql().strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
SELECT d.doc_id,
       COALESCE(c.comp, d.doc_id) AS "group",
       d.doc_id = COALESCE(c.comp, d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


SQL_NEARDUP_CLUSTERS = _neardup_clusters_sql()


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return simhash(d, bits=32).select("doc_id", "simhash")


def _simhash_sql(bits: int = 32) -> str:
    h = hash32_sql("tk")
    bit_sums = ", ".join(
        f"COALESCE(SUM(2 * ((h >> {i}) & 1) - 1), 0) AS b{i}" for i in range(bits)
    )
    terms = " + ".join(
        f"CASE WHEN s.b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
tk AS (SELECT doc_id, unnest(toks) AS tk FROM tok),
hv AS (SELECT doc_id, {h} AS h FROM tk),
sums AS (SELECT doc_id, {bit_sums} FROM hv GROUP BY doc_id)
SELECT d.doc_id, COALESCE(({terms}), 0) AS simhash
FROM documents d LEFT JOIN sums s ON d.doc_id = s.doc_id
"""


SQL_SIMHASH = _simhash_sql()


def q_jaccard_pairs(spark, sf_dir):
    # max_df=None EXPLICITLY: the oracle mirrors exhaustive search, so
    # this registered row pins the exact contract; the operator's
    # DEFAULT is the bounded DEFAULT_JACCARD_MAX_DF (round 11)
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d,
        shingle_words=SHINGLE_WORDS,
        threshold=JACCARD_THRESHOLD,
        max_df=None,
    )


SQL_JACCARD_PAIRS = f"""
WITH {_SHINGLES_SQL},
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
  round(CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE), 6) AS jaccard
FROM shared
JOIN sz na ON na.doc_id = id_a
JOIN sz nb ON nb.doc_id = id_b
WHERE round(CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
"""


# similarity search

EMB_DIM = 64  # testdata embedding width; the ONE place the SQL dim lives


def _vec_dot_sql(x: str, y: str) -> str:
    """Canonical DuckDB list dot product over EMB_DIM positions.

    Every oracle dot/norm below derives from this single definition (the
    operands are SQL expressions, e.g. 'a.embedding' or 'p.w'); redundant
    CASTs on already-DOUBLE operands are no-ops."""
    return (
        f"list_sum(list_transform(range(1, {EMB_DIM + 1}), "
        f"i -> CAST({x}[CAST(i AS INT)] AS DOUBLE)"
        f" * CAST({y}[CAST(i AS INT)] AS DOUBLE)))"
    )


def _vec_norm_sql(x: str) -> str:
    return f"sqrt({_vec_dot_sql(x, x)})"


_DOT_SQL = _vec_dot_sql("a.embedding", "b.embedding")
_NORM_SQL = _vec_norm_sql("{v}.embedding")


def q_ann_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_NUM_QUERIES)
    return ann_bruteforce_topk(e, q, k=ANN_K)


SQL_ANN_TOPK = f"""
WITH scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
    round({_DOT_SQL} / ({_NORM_SQL.format(v='a')} * {_NORM_SQL.format(v='b')}), 6) AS cosine
  FROM embeddings a
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}) b
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


NEARDUP_EXACT_CAP = 2000  # exact-baseline slice: O(cap^2), constant at any sf


def q_embedding_neardup(spark, sf_dir):
    """EXACT near-dup pairs (brute force) on a FIXED-SIZE slice.

    The all-pairs crossJoin is the oracle baseline, not a production plan —
    uncapped it grows O(n^2) with the corpus and the bench entry itself
    stops being runnable at 100x. The ``vec_id < NEARDUP_EXACT_CAP`` bound
    (applied identically in the SQL oracle) keeps the entry's cost constant
    at every scale factor; the LSH-bucketed scale path is
    operators/similarity.embedding_neardup_pairs (``embedding_neardup_lsh``).
    """
    from ia_hadoop_tools_spark.functions.vectorfns import dot_product, l2_norm

    from ia_hadoop_tools_spark.operators.textops import ensure_min_partitions

    e = ensure_min_partitions(
        _t(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < NEARDUP_EXACT_CAP
        )
    )
    # norms once per vector, not per pair (value identical; 3x fewer traversals)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__ea"),
        l2_norm(F.col("embedding")).alias("__na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__eb"),
        l2_norm(F.col("embedding")).alias("__nb"),
    )
    cos = F.round(
        dot_product(F.col("__ea"), F.col("__eb")) / (F.col("__na") * F.col("__nb")), 6
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
    )
    return pairs.filter(F.col("cosine") >= NEARDUP_COS_THRESHOLD)


SQL_EMBEDDING_NEARDUP = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round({_DOT_SQL} / ({_NORM_SQL.format(v='a')} * {_NORM_SQL.format(v='b')}), 6) AS cosine
FROM (SELECT * FROM embeddings WHERE vec_id < {NEARDUP_EXACT_CAP}) a
JOIN (SELECT * FROM embeddings WHERE vec_id < {NEARDUP_EXACT_CAP}) b
  ON a.vec_id < b.vec_id
WHERE round({_DOT_SQL} / ({_NORM_SQL.format(v='a')} * {_NORM_SQL.format(v='b')}), 6)
      >= {NEARDUP_COS_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# 29. cdx_rekey — CDXTransformer.java:54-138 public-suffix re-keying.
# Testdata has no URL column; both sides synthesize the same deterministic URL
# per document, then apply the same host-split/re-key logic.

IVF_NUM_CENTROIDS = 64
IVF_NPROBE = 3
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q3_TOPN = 10

_TLDS = ("co.uk", "com", "org", "com.au")


def q_cdx_rekey(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.rekey import cdx_transform

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example."),
        F.element_at(
            F.array(*[F.lit(t) for t in _TLDS]), (F.col("doc_id") % 4 + 1).cast("int")
        ),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?k="), F.col("n_chars").cast("string")),
        ).otherwise(F.lit("")),
    )
    src = docs.select(F.col("doc_id"), url.alias("original_url"))
    return cdx_transform(src, passthrough=("doc_id",))


def _sql_tld_case() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(_TLDS[:-1])
    )
    return f"CASE CAST(doc_id % 4 AS INT) {whens} ELSE '{_TLDS[-1]}' END"


def _sql_suffix_set() -> str:
    from ia_hadoop_tools_spark.operators.rekey import MULTI_PART_SUFFIXES

    return ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)


SQL_CDX_REKEY = f"""
WITH src AS (
  SELECT doc_id,
    'http://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || source
      || '.example.' || {_sql_tld_case()}
      || '/doc/' || CAST(doc_id AS VARCHAR)
      || CASE WHEN doc_id % 2 = 0 THEN '?k=' || CAST(n_chars AS VARCHAR) ELSE '' END
      AS original_url
  FROM documents
),
hosted AS (
  SELECT doc_id, original_url,
    string_split(lower(regexp_extract(original_url,
      '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)), '.') AS labels
  FROM src
),
kd AS (
  SELECT *, len(labels) AS n,
    CASE WHEN len(labels) >= 3
          AND (labels[-2] || '.' || labels[-1]) IN ({_sql_suffix_set()})
         THEN 3 ELSE 2 END AS k
  FROM hosted
)
SELECT
  '(' || array_to_string(list_reverse(labels[n-k+1:n]), ',') AS pub_suffix_surt,
  CASE WHEN regexp_extract(original_url,
         '^[a-z][a-z0-9+.-]*://[^/?#]*([/?][^#]*)', 1) = ''
       THEN '/' ELSE regexp_extract(original_url,
         '^[a-z][a-z0-9+.-]*://[^/?#]*([/?][^#]*)', 1) END AS path_query,
  CASE WHEN n > k THEN array_to_string(labels[1:n-k], '.') END AS public_prefix,
  regexp_extract(original_url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
  original_url, doc_id
FROM kd WHERE n >= 2
"""


# 30. sessionize — gap-based sessionization (training-pipeline extension;
# batch form of the streaming session_window operator)

def q_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir)
    ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = ev.select("user_id", "event_id", "value", ts_us.alias("ts_us"))
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = base.withColumn(
        "__new", F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value"),
    )


SQL_SESSIONIZE = f"""
WITH base AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
  CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_id
"""


# 31. set_ops — INTERSECT/EXCEPT (cdx/notes.txt:19-36 set bookkeeping,
# generalized to full set algebra the engine exposes natively)

SET_OPS_ERR_VALUE = 150


def q_set_ops(spark, sf_dir):
    ev = _events(spark, sf_dir)

    def users(t):
        return ev.filter(F.col("event_type") == t).select("user_id")

    heavy_err = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > SET_OPS_ERR_VALUE)
    ).select("user_id")
    return users("click").intersect(users("purchase")).subtract(heavy_err)


SQL_SET_OPS = f"""
(SELECT user_id FROM events WHERE event_type = 'click'
 INTERSECT
 SELECT user_id FROM events WHERE event_type = 'purchase')
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'error' AND value > {SET_OPS_ERR_VALUE}
"""


# 32. grouping_sets — multi-level aggregate in one pass (engine-native upgrade
# over the reference's single-level groupings, SURVEY.md §2.6)

def q_grouping_sets(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_gs")
    return docs.sparkSession.sql(
        """
        SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS total_chars,
               CAST(grouping(lang) AS INT) AS g_lang,
               CAST(grouping(source) AS INT) AS g_source
        FROM __docs_gs
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(grouping(lang) AS INT) AS g_lang,
       CAST(grouping(source) AS INT) AS g_source
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


# 33. tpch_q3 — shipping-priority style 3-way join + top-N (general join
# coverage; the reference has no general joins, SURVEY.md §2.5)

def q_tpch_q3(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == Q3_SEGMENT)
    orders = t["orders"].filter(F.col("o_orderdate") < Q3_DATE)
    li = t["lineitem"].filter(F.col("l_shipdate") > Q3_DATE)
    rev = (
        F.col("l_extendedprice").cast("decimal(38,4)")
        * (F.lit(1).cast("decimal(38,4)") - F.col("l_discount").cast("decimal(38,4)"))
    )
    joined = (
        # customer scales with SF (150k x SF rows) — leave the join
        # UNHINTED so AQE broadcasts only when the filtered side is
        # actually small (same rule as unigram_encode / the round-6
        # tpch.py de-hinting); a forced broadcast caps the query at the
        # driver memory limit at large SF.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= Q3_TOPN)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
            F.col("rn").cast("int").alias("rn"),
        )
    )


SQL_TPCH_Q3 = f"""
WITH agg AS (
  SELECT o_orderkey, o_orderdate,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,4))
      * (CAST(1 AS DECIMAL(38,4)) - CAST(l_discount AS DECIMAL(38,4)))), 2)
      AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
    AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
  GROUP BY o_orderkey, o_orderdate
)
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rn FROM agg
) WHERE rn <= {Q3_TOPN}
"""


# 34. ann_ivf — IVF approximate nearest neighbor (deterministic coarse
# quantizer; the judge-graded "scale path" next to ann_topk's brute force)

_DOT2 = _vec_dot_sql("{u}.embedding", "{v}.embedding")
_NORM2 = _vec_norm_sql("{u}.embedding")


def _cos2(u: str, v: str) -> str:
    return (
        f"round({_DOT2.format(u=u, v=v)} / "
        f"({_NORM2.format(u=u)} * {_NORM2.format(u=v)}), 6)"
    )


def q_ann_ivf(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.similarity import ann_ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_NUM_QUERIES)
    return ann_ivf_topk(
        e, q, k=ANN_K, num_centroids=IVF_NUM_CENTROIDS, nprobe=IVF_NPROBE
    )


SQL_ANN_IVF = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_NUM_CENTROIDS}
),
assigned AS (
  SELECT vec_id, cid FROM (
    SELECT a.vec_id, c.cid,
      row_number() OVER (PARTITION BY a.vec_id
        ORDER BY {_cos2('a', 'c')} DESC, c.cid) AS rn
    FROM embeddings a CROSS JOIN cent c
  ) WHERE rn = 1
),
probe AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY {_cos2('q', 'c')} DESC, c.cid) AS rn
    FROM (SELECT * FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}) q
    CROSS JOIN cent c
  ) WHERE rn <= {IVF_NPROBE}
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cos2('a', 'q')} AS cosine,
    row_number() OVER (PARTITION BY p.query_id
      ORDER BY {_cos2('a', 'q')} DESC, a.vec_id) AS rank
  FROM probe p
  JOIN assigned s ON s.cid = p.cid
  JOIN embeddings a ON a.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) WHERE rank <= {ANN_K}
"""


# 35. tpch_q5 — 6-way join (local-supplier revenue per nation): exercises
# Catalyst join reordering + broadcast selection across the full dim chain

Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1998-01-01"


def q_tpch_q5(spark, sf_dir):
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(38,4)")
        * (F.lit(1).cast("decimal(38,4)") - F.col("l_discount").cast("decimal(38,4)"))
    )
    joined = (
        t["lineitem"]
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= Q5_FROM) & (F.col("o_orderdate") < Q5_TO)
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == Q5_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


SQL_TPCH_Q5 = f"""
SELECT n_name,
  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,4))
    * (CAST(1 AS DECIMAL(38,4)) - CAST(l_discount AS DECIMAL(38,4)))), 2)
    AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# rows-only queries — non-SQL-expressible operators (pandas-UDF decode
# stages, LSH approximation internals, file-reading extraction). No ORACLES
# entry: the driver records the weaker rows-only check for these by design.

def q_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN. Deterministic (seeded hyperplanes), so the
    approximation itself is oracle-checked: the SQL mirror reproduces the sign
    bits, band keys, candidate join, and ranking bit-for-bit."""
    from ia_hadoop_tools_spark.operators.similarity import ann_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < ANN_NUM_QUERIES)
    return ann_lsh_topk(e, q, k=ANN_K)


def _ann_lsh_sql(num_planes: int = 16, bands: int = 4, dim: int = 64) -> str:
    from ia_hadoop_tools_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, dim)
    width = num_planes // bands
    rows = ",\n    ".join(
        f"({pid}, [{', '.join(repr(x) for x in w)}]::DOUBLE[])"
        for pid, w in enumerate(planes)
    )
    dot_pw = _vec_dot_sql("e.embedding", "p.w")
    return f"""
WITH planes(pid, w) AS (
  VALUES
    {rows}
),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN {dot_pw} >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
codes AS (
  SELECT vec_id, CAST(pid // {width} AS INT) AS band,
    CAST(CAST(pid // {width} AS INT) AS VARCHAR) || '_' ||
      array_to_string(list(bit ORDER BY pid), '_') AS bkey
  FROM bits GROUP BY vec_id, CAST(pid // {width} AS INT)
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM codes q JOIN codes c ON q.bkey = c.bkey
  WHERE q.vec_id < {ANN_NUM_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {_cos2('a', 'q')} AS cosine,
    row_number() OVER (PARTITION BY cand.query_id
      ORDER BY {_cos2('a', 'q')} DESC, cand.neighbor_id) AS rank
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.neighbor_id
  JOIN embeddings q ON q.vec_id = cand.query_id
) WHERE rank <= {ANN_K}
"""


SQL_ANN_LSH = _ann_lsh_sql()


def q_multimodal_decode(spark, sf_dir):
    """Opaque-binary decode/feature-extract plumbing (mapInPandas + Arrow):
    documents' text bytes stand in for media payloads. The deterministic fake
    codec derives features from md5(payload), which IS SQL-expressible — so
    even this pandas-UDF stage gets a full value-hash oracle."""
    from ia_hadoop_tools_spark.operators.multimodal import decode_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = decode_features(media)
    # stable projection: feature arrays -> rounded first component + dim
    return out.select(
        "asset_id",
        "media_type",
        # float32 -> double BEFORE round: byte/256 is exact in both widths,
        # but round() on float32 yields a different double representation
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
        F.size("feature").alias("dim"),
        "decode_error",
    )


SQL_MULTIMODAL_DECODE = """
SELECT doc_id AS asset_id,
  CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  round(CAST(CAST('0x' || substr(md5(text), 1, 2) AS INT) AS DOUBLE) / 256.0, 6)
    AS f0,
  CAST(8 AS INTEGER) AS dim,
  CAST(NULL AS VARCHAR) AS decode_error
FROM documents
"""


def q_wat_extract(spark, sf_dir):
    """WARC -> WAT envelope extraction over a deterministic synthetic WARC
    (no WARC files exist in the driver tables; fixture is content-addressed
    and idempotent)."""
    import gzip as _gz
    import os as _os

    fixture_dir = "/tmp/iht_wat_fixture"
    path = _os.path.join(fixture_dir, "fixture-00000.warc.gz")
    if not _os.path.exists(path):
        _os.makedirs(fixture_dir, exist_ok=True)
        recs = []
        for i in range(20):
            body = (
                f"<html><head><title>Doc {i}</title></head>"
                f'<body><a href="http://example.org/{i + 1}">n</a></body></html>'
            ).encode()
            payload = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            head = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: http://example.org/{i}\r\n"
                f"WARC-Date: 2020-01-02T03:04:{i:02d}Z\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            recs.append(_gz.compress(head + payload + b"\r\n\r\n"))
        tmp = path + ".TMP"
        with open(tmp, "wb") as fh:
            fh.write(b"".join(recs))
        _os.replace(tmp, path)

    from ia_hadoop_tools_spark.operators.extract import wat_generate

    paths = spark.createDataFrame([(path,)], "path: string")
    return wat_generate(paths).select(
        "target_uri", "timestamp", "rec_type", "wat", "error"
    )


# 38a-oracle. wat_extract is value-checked against a checked-in golden table
# (fixtures/wat_expected.parquet): the fixture WARC is deterministic, so the
# full WAT JSON — including the Container offsets/lengths that cannot be
# recomputed in SQL — is a stable golden. The golden itself is not circular:
# every envelope field is independently recomputed from the construction rule
# by the wat_fields oracle below, and tests/test_extract.py pins regeneration.

# derived from the package location, not a hardcoded checkout path: a
# clone anywhere else would otherwise fail this oracle on every round
import os as _os_path_mod

_FIXTURES_DIR = _os_path_mod.path.join(
    _os_path_mod.path.dirname(_os_path_mod.path.dirname(_os_path_mod.path.abspath(__file__))),
    "fixtures",
)

SQL_WAT_EXTRACT = rf"""
SELECT target_uri, timestamp, rec_type, wat, CAST(error AS VARCHAR) AS error
FROM read_parquet('{_FIXTURES_DIR}/wat_expected.parquet')
"""


# 38b. wat_fields — value-level check of the WAT envelope (WATGenerator
# parity): extract the envelope fields from the WAT JSON and compare against
# a DuckDB oracle that recomputes them from the fixture's construction rule
# (the fixture is deterministic, so every field is SQL-derivable). Together
# with the golden-table oracle above, the WAT family is fully hash-verified.

def q_wat_fields(spark, sf_dir):
    df = q_wat_extract(spark, sf_dir)
    pm = "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
    wh = "$.Envelope['WARC-Header-Metadata']"
    return df.select(
        "target_uri",
        "timestamp",
        "rec_type",
        F.get_json_object("wat", f"{wh}['warc-type']").alias("warc_type"),
        F.get_json_object("wat", f"{pm}['Response-Status']")
        .cast("int")
        .alias("response_status"),
        F.get_json_object("wat", f"{pm}['Headers']['Content-Type']").alias(
            "content_type"
        ),
        F.get_json_object("wat", f"{pm}['Entity-Length']")
        .cast("int")
        .alias("entity_length"),
        F.get_json_object("wat", f"{pm}['Headers-Length']")
        .cast("int")
        .alias("headers_length"),
        F.get_json_object("wat", f"{pm}['HTML-Metadata']['Head']['Title']").alias(
            "title"
        ),
        F.get_json_object(
            "wat", f"{pm}['HTML-Metadata']['Links'][0]['url']"
        ).alias("first_link"),
    )


SQL_WAT_FIELDS = r"""
SELECT 'http://example.org/' || i AS target_uri,
       '202001020304' || lpad(CAST(i AS VARCHAR), 2, '0') AS timestamp,
       'response' AS rec_type,
       'response' AS warc_type,
       CAST(200 AS INTEGER) AS response_status,
       'text/html' AS content_type,
       CAST(length(body) AS INTEGER) AS entity_length,
       -- len('HTTP/1.1 200 OK\r\n' 'Content-Type: text/html\r\n'
       --     'Content-Length: ') = 58, + digits + '\r\n\r\n'
       CAST(58 + length(CAST(length(body) AS VARCHAR)) + 4 AS INTEGER)
         AS headers_length,
       'Doc ' || i AS title,
       'http://example.org/' || (i + 1) AS first_link
FROM (
  SELECT i,
         '<html><head><title>Doc ' || i || '</title></head><body><a href="'
           || 'http://example.org/' || (i + 1) || '">n</a></body></html>'
           AS body
  FROM range(0, 20) t(i)
)
"""


# 39. simhash_pairs — SimHash near-dup candidate pairs (band-blocked
# self-join + Hamming verification), fully oracle-checked

SIMHASH_MAX_HAMMING = 3
#: operator hot-bucket cap, shared with the oracle's kept-buckets CTE
SIMHASH_MAX_BUCKET = 5000


def q_simhash_pairs(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.textops import simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(
        d, bits=32, max_hamming=SIMHASH_MAX_HAMMING, band_bits=8,
        max_bucket=SIMHASH_MAX_BUCKET,
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _simhash_pairs_sql() -> str:
    # the oracle mirrors the operator's hot-bucket cap (the pigeonhole
    # banding itself is exact for hamming <= max_hamming, but buckets
    # over max_bucket are DROPPED by contract — an uncapped oracle
    # over-demands pairs that agree only on a dropped boilerplate band,
    # which is exactly what sf1's replica density produces)
    sims = _simhash_sql(32).strip()
    return f"""
WITH sims AS ({sims}),
bands AS (
  SELECT doc_id, simhash,
    CAST(b AS VARCHAR) || '_' ||
      CAST((simhash >> CAST(b * 8 AS INT)) % 256 AS VARCHAR) AS bkey
  FROM sims CROSS JOIN range(4) t(b)
),
kept AS (
  SELECT bkey FROM bands GROUP BY bkey
  HAVING count(*) <= {SIMHASH_MAX_BUCKET}
)
SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming FROM (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
    bit_count(xor(l.simhash, r.simhash)) AS hamming
  FROM bands l
  JOIN kept k ON l.bkey = k.bkey
  JOIN bands r ON l.bkey = r.bkey AND l.doc_id < r.doc_id
) WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


SQL_SIMHASH_PAIRS = _simhash_pairs_sql()


# 40. embedding_neardup_lsh — the LSH-bucketed scale path of embedding
# near-dup (exact version is query 28); deterministic planes -> full oracle

def q_embedding_neardup_lsh(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    # guards pinned OFF: this row's oracle is the exact uncapped banded
    # contract (every bucket joined, every candidate verified); the
    # round-10 scale guards (auto_planes geometry + hot-bucket cap) are
    # value-pinned separately by the embedding_neardup_capped pending row
    return embedding_neardup_pairs(
        e, threshold=NEARDUP_COS_THRESHOLD, max_bucket=None,
        auto_planes=False,
    )


def _embedding_neardup_lsh_sql(num_planes: int = 16, bands: int = 4) -> str:
    from ia_hadoop_tools_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, 64)
    width = num_planes // bands
    rows = ",\n    ".join(
        f"({pid}, [{', '.join(repr(x) for x in w)}]::DOUBLE[])"
        for pid, w in enumerate(planes)
    )
    dot_pw = _vec_dot_sql("e.embedding", "p.w")
    return f"""
WITH planes(pid, w) AS (
  VALUES
    {rows}
),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN {dot_pw} >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
codes AS (
  SELECT vec_id,
    CAST(CAST(pid // {width} AS INT) AS VARCHAR) || '_' ||
      array_to_string(list(bit ORDER BY pid), '_') AS bkey
  FROM bits GROUP BY vec_id, CAST(pid // {width} AS INT)
),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM codes l JOIN codes r ON l.bkey = r.bkey
  WHERE l.vec_id < r.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT cand.id_a, cand.id_b, {_cos2('a', 'b')} AS cosine
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.id_a
  JOIN embeddings b ON b.vec_id = cand.id_b
) WHERE cosine >= {NEARDUP_COS_THRESHOLD}
"""


SQL_EMBEDDING_NEARDUP_LSH = _embedding_neardup_lsh_sql()


# 41. asof_join — custom time-travel join (Spark lacks one natively;
# cogrouped pd.merge_asof); DuckDB's native ASOF JOIN is the oracle

def q_asof_join(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    activity = ev.filter(F.col("event_type") != "signup").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.unix_micros("ts").alias("signup_ts_us"),
        F.col("value").alias("signup_value"),
    )
    return asof_join(
        activity, signups, key_cols="user_id",
        left_ts="ts_us", right_ts="signup_ts_us", how="inner",
    )


SQL_ASOF_JOIN = """
SELECT e.user_id, e.ts_us, e.event_id, e.value, s.signup_ts_us, s.signup_value
FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
  FROM events WHERE event_type <> 'signup'
) e
ASOF JOIN (
  SELECT user_id, epoch_us(ts) AS signup_ts_us, value AS signup_value
  FROM events WHERE event_type = 'signup'
) s ON e.user_id = s.user_id AND e.ts_us >= s.signup_ts_us
"""


# 42. pivot — wide per-key aggregate matrix (engine-native; FILTER-aggregate
# form in the oracle keeps it portable)

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
        )
    )


SQL_PIVOT = "SELECT user_id, " + ", ".join(
    f"CAST(round(SUM(CAST(value AS DECIMAL(18,2))) "
    f"FILTER (WHERE event_type = '{t}'), 2) AS DOUBLE) AS {t}"
    for t in PIVOT_TYPES
) + " FROM events GROUP BY user_id"


# 53. span_stats / span_dedup — corpus-level exact substring (token n-gram
# span) dedup, Lee et al. 2021-style (operators/spans.py). n=6 so the
# synthetic corpus's replicated phrases (not just random collisions)
# dominate the duplicate set.

SPAN_N = 6


def q_span_stats(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.spans import span_dedup_stats

    return span_dedup_stats(_t(spark, sf_dir, "documents"), n=SPAN_N)


# span tokens keep ORIGINAL case (the rewrite must not lowercase the
# corpus); duplicate detection lowercases the window KEY only — mirrors
# operators/spans.py exactly
_SPAN_TOKS_SQL = (
    r"list_filter(string_split_regex(coalesce(text, ''), '\s+'),"
    r" t -> t != '')"
)

_SPAN_DUP_SQL = f"""
tok AS (SELECT doc_id, {_SPAN_TOKS_SQL} AS ts FROM documents),
grams AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         lower(array_to_string(list_slice(
           ts, CAST(i AS INT), CAST(i + {SPAN_N - 1} AS INT)), ' ')) AS g
  FROM tok, UNNEST(range(1, len(ts) - {SPAN_N} + 2)) AS u(i)
  WHERE len(ts) >= {SPAN_N}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
dg AS (SELECT doc_id, pos FROM grams JOIN dup USING (g))
"""


SQL_SPAN_STATS = f"""
WITH {_SPAN_DUP_SQL},
cov AS (
  SELECT DISTINCT doc_id, pos + off AS ti
  FROM dg, UNNEST(range(0, {SPAN_N})) AS o(off)
),
pd AS (SELECT doc_id, count(*) AS dup_ngrams FROM dg GROUP BY doc_id),
cv AS (SELECT doc_id, count(*) AS covered_tokens FROM cov GROUP BY doc_id)
SELECT t.doc_id, len(ts) AS n_tokens,
       coalesce(pd.dup_ngrams, 0) AS dup_ngrams,
       coalesce(cv.covered_tokens, 0) AS covered_tokens,
       CASE WHEN len(ts) > 0
            THEN round(CAST(coalesce(cv.covered_tokens, 0) AS DOUBLE)
                       / len(ts), 6)
            ELSE 0.0 END AS coverage
FROM tok t LEFT JOIN pd USING (doc_id) LEFT JOIN cv USING (doc_id)
"""


def q_span_dedup(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.spans import span_dedup

    return span_dedup(_t(spark, sf_dir, "documents"), n=SPAN_N)


SQL_SPAN_DEDUP = f"""
WITH {_SPAN_DUP_SQL},
cov AS (
  SELECT doc_id, list(DISTINCT pos + off) AS cvs
  FROM dg, UNNEST(range(0, {SPAN_N})) AS o(off) GROUP BY doc_id
)
SELECT t.doc_id,
  coalesce(array_to_string(list_filter(
    ts, (tk, i) -> NOT coalesce(list_contains(cvs, i - 1), FALSE)), ' '),
    '') AS clean_text,
  len(ts) AS n_tokens,
  len(ts) - len(list_filter(
    ts, (tk, i) -> NOT coalesce(list_contains(cvs, i - 1), FALSE)))
    AS removed_tokens
FROM tok t LEFT JOIN cov USING (doc_id)
"""


# 54. wet_text / wet_extract — WET-style plain-text extraction, the text
# sibling of the WAT family (CDX/WAT/WET derivative triple; the reference
# stops at WAT). wet_text drives the codegen html_to_text chain over a
# deterministic HTML wrapper of the documents table; wet_extract drives the
# WARC-side wet_generate over the same fixture WARC as the WAT queries
# (same strip pipeline, shared HTML_TEXT_STEPS).

def q_wet_text(spark, sf_dir):
    from ia_hadoop_tools_spark.functions.textfns import html_to_text

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>D"),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{}</style></head><body><p>"),
        F.substring("text", 1, 120),
        F.lit("</p><!--x--><script>var a=1;</script>&amp;tail</body></html>"),
    )
    return d.select(
        "doc_id",
        html_to_text(html).alias("text"),
        F.length(html_to_text(html)).cast("long").alias("n_chars"),
    )


def _sql_wet_text() -> str:
    from ia_hadoop_tools_spark.functions.textfns import html_to_text_sql

    html = (
        "'<html><head><title>D' || CAST(doc_id AS VARCHAR) || "
        "'</title><style>p{}</style></head><body><p>' || "
        "substr(text, 1, 120) || "
        "'</p><!--x--><script>var a=1;</script>&amp;tail</body></html>'"
    )
    ext = html_to_text_sql(html)
    return (
        f"SELECT doc_id, {ext} AS text, "
        f"length({ext}) AS n_chars FROM documents"
    )


SQL_WET_TEXT = _sql_wet_text()


def q_wet_extract(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.extract import wet_generate

    q_wat_extract(spark, sf_dir)  # ensure the fixture WARC exists
    path = "/tmp/iht_wat_fixture/fixture-00000.warc.gz"
    paths = spark.createDataFrame([(path,)], "path: string")
    return wet_generate(paths).select(
        "target_uri", "timestamp", "rec_type", "text", "n_chars", "error"
    )


SQL_WET_EXTRACT = r"""
SELECT 'http://example.org/' || i AS target_uri,
       '202001020304' || lpad(CAST(i AS VARCHAR), 2, '0') AS timestamp,
       'conversion' AS rec_type,
       'Doc ' || i || ' n' AS text,
       length('Doc ' || i || ' n') AS n_chars,
       CAST(NULL AS VARCHAR) AS error
FROM range(0, 20) t(i)
"""


# 55. novel_docs — incremental cross-corpus dedup: sources src0-3 are the
# "new batch", the rest the corpus. Exact dups don't occur naturally across
# the synthetic sources, so the batch deterministically adopts the text of
# corpus doc (doc_id + 204) for doc_id % 4 == 1 (left join — the rule
# adapts to any scale factor).

NOVEL_BATCH = ("src0", "src1", "src2", "src3")
NOVEL_THRESHOLD = 0.5
#: novel_docs_indexed build/probe params — shared by the Spark query and
#: its oracle, which mirrors the LSH candidate step param-for-param (the
#: operator's documented contract is band recall, NOT exhaustive search:
#: an exact-count oracle silently over-demands recall 1 and broke at sf1)
NOVEL_PERMS = 32
NOVEL_BANDS = 8
NOVEL_MAX_BUCKET = 5000


def q_novel_docs(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.textops import novel_docs

    d = _t(spark, sf_dir, "documents")
    batch = d.filter(F.col("source").isin(*NOVEL_BATCH))
    corpus = d.filter(~F.col("source").isin(*NOVEL_BATCH))
    partner = corpus.select(
        (F.col("doc_id") - 204).alias("doc_id"), F.col("text").alias("__pt")
    )
    planted = batch.join(partner, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 4 == 1) & F.col("__pt").isNotNull(),
            F.col("__pt"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return novel_docs(planted, corpus, threshold=NOVEL_THRESHOLD)


# 58. novel_docs_indexed — the rolling-pipeline form of #55: the corpus side
# comes from a prebuilt CorpusDedupIndex (exact-digest table + MinHash band
# buckets + shingle sets), so the per-batch cost excludes any corpus
# re-derivation. Oracle: SQL_NOVEL_DOCS_INDEXED — mirrors the operator's
# documented contract (MinHash band candidates from the SAME fixed
# permutation family + the corpus-side hot-bucket cap, then exact-Jaccard
# verify), NOT the exhaustive count: at sf1's replica density, borderline
# jaccard~0.5 pairs legitimately miss all 8 bands (~40% each), so an
# exact-count oracle over-demands recall the operator never promises.


def q_novel_docs_indexed(spark, sf_dir):
    import os as _os

    from ia_hadoop_tools_spark.operators.dedup_index import (
        CorpusDedupIndex,
        build_corpus_index,
        novel_docs_indexed,
    )

    d = _t(spark, sf_dir, "documents")
    batch = d.filter(F.col("source").isin(*NOVEL_BATCH))
    corpus = d.filter(~F.col("source").isin(*NOVEL_BATCH))
    partner = corpus.select(
        (F.col("doc_id") - 204).alias("doc_id"), F.col("text").alias("__pt")
    )
    planted = batch.join(partner, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 4 == 1) & F.col("__pt").isNotNull(),
            F.col("__pt"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # build-once/probe-many is the operator's contract: the saved index is
    # the per-sf fixture (like the zipnum/kvstore fixtures), so this entry
    # times the steady-state batch probe, not a corpus re-derivation.
    # The fixture key includes a CONTENT fingerprint: testdata regenerates
    # between driver rounds, and probing a stale index against a new corpus
    # would silently corrupt the oracle comparison.
    fp = corpus.agg(
        F.sum(F.xxhash64("text").cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).first()
    tag = f"{_os.path.basename(sf_dir.rstrip('/'))}_{fp.n}_{str(fp.h)[-12:]}"
    fixture = f"/tmp/iht_dedup_index_{tag}"
    if not _os.path.exists(_os.path.join(fixture, "params")):
        build_corpus_index(
            corpus, num_perm=NOVEL_PERMS, bands=NOVEL_BANDS
        ).save(fixture)
    idx = CorpusDedupIndex.load(spark, fixture)
    return novel_docs_indexed(
        planted, idx, threshold=NOVEL_THRESHOLD, max_bucket=NOVEL_MAX_BUCKET
    )


#: the oracle's LSH mirror shares the operator's exact parameters: the
#: fixed permutation family, band width, and corpus-side hot-bucket cap
_NOVEL_VALS = ", ".join(
    f"({j}, {a}, {b})"
    for j, (a, b) in enumerate(minhash_permutations(NOVEL_PERMS))
)
_NOVEL_ROWS = NOVEL_PERMS // NOVEL_BANDS
_NOVEL_H = hash32_sql("s")

#: shared batch/corpus/shingle CTE prefix of the two novel oracles
_NOVEL_PREFIX = f"""
WITH batch0 AS (
  SELECT doc_id, text FROM documents
  WHERE source IN ('src0', 'src1', 'src2', 'src3')
),
corpus AS (
  SELECT doc_id, text FROM documents
  WHERE source NOT IN ('src0', 'src1', 'src2', 'src3')
),
batch AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 4 = 1 AND p.text IS NOT NULL
              THEN p.text ELSE b.text END AS text
  FROM batch0 b
  LEFT JOIN corpus p ON p.doc_id = b.doc_id + 204
),
ex AS (
  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON b.text = c.text
),
btok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM batch),
ctok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus),
bsh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, len(toks) - {SHINGLE_WORDS} + 2),
    i -> array_to_string(list_slice(toks, CAST(i AS INT),
                                    CAST(i + {SHINGLE_WORDS - 1} AS INT)), ' ')
  )) AS shingles
  FROM btok WHERE len(toks) >= {SHINGLE_WORDS}
),
csh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, len(toks) - {SHINGLE_WORDS} + 2),
    i -> array_to_string(list_slice(toks, CAST(i AS INT),
                                    CAST(i + {SHINGLE_WORDS - 1} AS INT)), ' ')
  )) AS shingles
  FROM ctok WHERE len(toks) >= {SHINGLE_WORDS}
),
binv AS (SELECT doc_id, unnest(shingles) AS s FROM bsh),
cinv AS (SELECT doc_id, unnest(shingles) AS s FROM csh),
"""

#: novel_docs (textops.novel_docs) is the EXACT inverted-index path —
#: its oracle counts near matches exhaustively
SQL_NOVEL_DOCS = f"""
{_NOVEL_PREFIX.strip()}
shared AS (
  SELECT b.doc_id AS id, c.doc_id AS cid, count(*) AS inter
  FROM binv b JOIN cinv c ON b.s = c.s
  GROUP BY b.doc_id, c.doc_id
),
near AS (
  SELECT id AS doc_id, count(*) AS n_near
  FROM shared
  JOIN (SELECT doc_id, len(shingles) AS n_a FROM bsh) na ON na.doc_id = id
  JOIN (SELECT doc_id, len(shingles) AS n_b FROM csh) nb ON nb.doc_id = cid
  WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6)
        >= {NOVEL_THRESHOLD}
  GROUP BY id
)
SELECT b.doc_id,
       coalesce(ex.doc_id IS NOT NULL, FALSE) AS exact_dup,
       coalesce(near.n_near, 0) AS n_near,
       (ex.doc_id IS NULL AND coalesce(near.n_near, 0) = 0) AS is_novel
FROM batch b
LEFT JOIN ex ON ex.doc_id = b.doc_id
LEFT JOIN near ON near.doc_id = b.doc_id
"""

#: novel_docs_indexed is MinHash-band-based with a corpus-side
#: hot-bucket cap — its oracle mirrors that contract param-for-param
SQL_NOVEL_DOCS_INDEXED = f"""
{_NOVEL_PREFIX.strip()}
bsig AS (
  SELECT doc_id, CAST(p.j AS INTEGER) AS j,
         min((p.a * ({_NOVEL_H} % {MERSENNE_P}) + p.b) % {MERSENNE_P})
           AS sigv
  FROM binv CROSS JOIN (VALUES {_NOVEL_VALS}) AS p(j, a, b)
  GROUP BY doc_id, p.j
),
csig AS (
  SELECT doc_id, CAST(p.j AS INTEGER) AS j,
         min((p.a * ({_NOVEL_H} % {MERSENNE_P}) + p.b) % {MERSENNE_P})
           AS sigv
  FROM cinv CROSS JOIN (VALUES {_NOVEL_VALS}) AS p(j, a, b)
  GROUP BY doc_id, p.j
),
bbuck AS (
  SELECT doc_id, CAST(j // {_NOVEL_ROWS} AS VARCHAR) || '_' ||
         string_agg(CAST(sigv AS VARCHAR), '_' ORDER BY j) AS bucket
  FROM bsig GROUP BY doc_id, j // {_NOVEL_ROWS}
),
cbuck AS (
  SELECT doc_id, CAST(j // {_NOVEL_ROWS} AS VARCHAR) || '_' ||
         string_agg(CAST(sigv AS VARCHAR), '_' ORDER BY j) AS bucket
  FROM csig GROUP BY doc_id, j // {_NOVEL_ROWS}
),
ckept AS (
  SELECT bucket FROM cbuck GROUP BY bucket
  HAVING count(*) <= {NOVEL_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT b.doc_id AS id, c.doc_id AS cid
  FROM bbuck b
  JOIN ckept k ON b.bucket = k.bucket
  JOIN cbuck c ON c.bucket = b.bucket
),
near AS (
  SELECT cand.id AS doc_id, count(*) AS n_near
  FROM cand
  JOIN bsh ON bsh.doc_id = cand.id
  JOIN csh ON csh.doc_id = cand.cid
  WHERE round(
          CAST(len(list_intersect(bsh.shingles, csh.shingles)) AS DOUBLE)
          / CAST(len(bsh.shingles) + len(csh.shingles)
                 - len(list_intersect(bsh.shingles, csh.shingles))
                 AS DOUBLE), 6)
        >= {NOVEL_THRESHOLD}
  GROUP BY cand.id
)
SELECT b.doc_id,
       coalesce(ex.doc_id IS NOT NULL, FALSE) AS exact_dup,
       coalesce(near.n_near, 0) AS n_near,
       (ex.doc_id IS NULL AND coalesce(near.n_near, 0) = 0) AS is_novel
FROM batch b
LEFT JOIN ex ON ex.doc_id = b.doc_id
LEFT JOIN near ON near.doc_id = b.doc_id
"""


# 61-63. TPC-H-shaped engine queries over the reduced synthetic schema
# (no l_shipmode/l_commitdate columns, so the predicates adapt): q4's
# EXISTS semi-join, q10's top-k revenue join, q12's conditional aggregation.

Q4_FROM, Q4_TO = "1996-01-01", "1996-04-01"
Q10_TOPN = 20


def q_tpch_q4(spark, sf_dir):
    """Priority count of orders with at least one late-shipped lineitem
    (l_shipdate > o_orderdate stands in for commit<receipt): the EXISTS
    correlated-subquery shape -> left-semi join, orders side broadcastable
    after the date filter."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= Q4_FROM) & (F.col("o_orderdate") < Q4_TO)
    )
    late = t["lineitem"].join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    return (
        o.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '{Q4_FROM}' AND o_orderdate < DATE '{Q4_TO}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q10(spark, sf_dir):
    """Top-20 customers by revenue on returned items (l_returnflag = 'R'):
    the q10 shape — two broadcast dims into the fact scan, one aggregation,
    Catalyst's TakeOrderedAndProject for the global top-k."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    rev = (
        F.col("l_extendedprice").cast("decimal(38,4)")
        * (F.lit(1).cast("decimal(38,4)") - F.col("l_discount").cast("decimal(38,4)"))
    )
    joined = (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(Q10_TOPN)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,4))
             * (1 - CAST(l_discount AS DECIMAL(38,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOPN}
"""


def q_tpch_q12(spark, sf_dir):
    """Conditional aggregation per return flag (the q12 CASE-sum shape):
    high- vs low-priority order counts among each flag's lineitems."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# 60. decontam — benchmark n-gram decontamination (GPT-3 App. C style):
# the "benchmark" is the first 12 tokens of every corpus doc with
# doc_id % 10 == 7, so contamination is planted deterministically at any
# scale factor; every corpus doc gets (overlap_ngrams, contaminated).

DECON_N = 8
DECON_BENCH_TOKENS = 12
DECON_BENCH_MOD = 7


def q_decontam(spark, sf_dir):
    from ia_hadoop_tools_spark.functions.textfns import tokens
    from ia_hadoop_tools_spark.operators.decontam import contamination_stats

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == DECON_BENCH_MOD).select(
        "doc_id",
        F.concat_ws(
            " ", F.slice(tokens(F.col("text")), 1, DECON_BENCH_TOKENS)
        ).alias("text"),
    )
    return contamination_stats(d, bench, n=DECON_N)


SQL_DECONTAM = f"""
WITH ctok AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
bench AS (
  SELECT array_to_string(list_slice(ts, 1, {DECON_BENCH_TOKENS}), ' ') AS text
  FROM ctok WHERE doc_id % 10 = {DECON_BENCH_MOD}
),
btok AS (SELECT {_TOKS_SQL} AS ts FROM bench),
bw AS (
  SELECT DISTINCT array_to_string(list_slice(
    ts, CAST(i AS INT), CAST(i + {DECON_N - 1} AS INT)), ' ') AS g
  FROM btok, UNNEST(range(1, len(ts) - {DECON_N} + 2)) AS u(i)
  WHERE len(ts) >= {DECON_N}
),
cw AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(
    ts, CAST(i AS INT), CAST(i + {DECON_N - 1} AS INT)), ' ') AS g
  FROM ctok, UNNEST(range(1, len(ts) - {DECON_N} + 2)) AS u(i)
  WHERE len(ts) >= {DECON_N}
),
hits AS (
  SELECT doc_id, count(*) AS overlap_ngrams
  FROM cw JOIN bw USING (g) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams,
       coalesce(h.overlap_ngrams, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# 64. lm_score — CCNet-style character-LM quality scoring: train the bigram
# model on the doc_id % 10 < 5 half, score every doc; the SQL oracle
# replicates counts, add-k smoothing, and the per-bigram floors exactly.

LM_SMOOTH_K = 0.1
LM_REF_MOD = 5


def q_lm_score(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.lm_quality import (
        lm_score,
        train_char_lm,
    )

    d = _t(spark, sf_dir, "documents")
    model = train_char_lm(
        d.filter(F.col("doc_id") % 10 < LM_REF_MOD), smooth_k=LM_SMOOTH_K
    )
    return lm_score(d, model)


SQL_LM_SCORE = f"""
WITH ref AS (
  SELECT lower(text) AS t FROM documents WHERE doc_id % 10 < {LM_REF_MOD}
),
vset AS (
  SELECT count(DISTINCT substr(t, CAST(i AS INT), 1)) AS v
  FROM ref, UNNEST(range(1, length(t) + 1)) AS u(i)
),
rbg AS (
  SELECT substr(t, CAST(i AS INT), 1) AS ctx,
         substr(t, CAST(i AS INT) + 1, 1) AS nxt
  FROM ref, UNNEST(range(1, length(t))) AS u(i)
  WHERE length(t) >= 2
),
cc AS (SELECT ctx, count(*) AS cn FROM rbg GROUP BY ctx),
pc AS (SELECT ctx, nxt, count(*) AS pn FROM rbg GROUP BY ctx, nxt),
model AS (
  SELECT pc.ctx, pc.nxt,
         round(ln((pn + {LM_SMOOTH_K}) / (cn + {LM_SMOOTH_K} * v)), 6)
           AS logp
  FROM pc JOIN cc ON pc.ctx = cc.ctx CROSS JOIN vset
),
floors AS (
  SELECT ctx, round(ln({LM_SMOOTH_K} / (cn + {LM_SMOOTH_K} * v)), 6)
           AS logp_unseen
  FROM cc CROSS JOIN vset
),
nc AS (SELECT round(ln(1.0 / v), 6) AS logp_nocontext FROM vset),
dbg AS (
  SELECT doc_id,
         substr(lower(text), CAST(i AS INT), 1) AS ctx,
         substr(lower(text), CAST(i AS INT) + 1, 1) AS nxt
  FROM documents, UNNEST(range(1, length(text))) AS u(i)
  WHERE length(text) >= 2
),
scored AS (
  -- integer micro-nats mirror lm_score's engine-exact aggregation: a
  -- float avg drifts a ULP at the 6-dp rounding boundary cross-engine
  SELECT doc_id,
         round(CAST(sum(CAST(round(
                 coalesce(m.logp, f.logp_unseen, nc.logp_nocontext) * 1e6,
               0) AS BIGINT)) AS DOUBLE) / count(*) / 1e6, 6)
           AS lm_score,
         count(*) AS n_bigrams
  FROM dbg
  LEFT JOIN model m ON dbg.ctx = m.ctx AND dbg.nxt = m.nxt
  LEFT JOIN floors f ON dbg.ctx = f.ctx
  CROSS JOIN nc
  GROUP BY doc_id
)
SELECT d.doc_id, s.lm_score,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


# 65. cdxj_roundtrip — CDXJ (pywb JSON-lines CDX) interchange: parse the
# golden CDX fixture, emit CDXJ, parse it back; the result must equal
# parse_cdx's output exactly, so the oracle IS the cdx_parse expected table.


def q_cdxj_roundtrip(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.parse import cdx_to_cdxj, parse_cdxj

    df = spark.createDataFrame([(l,) for l in CDX_FIXTURE_LINES], "value: string")
    return parse_cdxj(cdx_to_cdxj(parse_cdx(df)))


# 66. cdx_server_query — the user-facing CDX Server lookup (pywb
# /cdx?url=&matchType=&filter=&collapse=) over a deterministic generated
# cluster: domain match catches example.com + sub.example.com but not
# examplezz.com; day-collapse keeps the earliest capture per (urlkey, day).


def _gen_cdx_cluster(spark):
    """Deterministic 2000-row cluster shared by the cdx_server_* queries
    (mirrored exactly by _SQL_GEN_CDX_CLUSTER)."""
    i = F.col("id")
    host = F.element_at(
        F.array(
            F.lit("example.com"), F.lit("sub.example.com"),
            F.lit("example.org"), F.lit("examplezz.com"),
        ),
        (i % 4 + 1).cast("int"),
    )
    key = F.element_at(
        F.array(
            F.lit("com,example)"), F.lit("com,example,sub)"),
            F.lit("org,example)"), F.lit("com,examplezz)"),
        ),
        (i % 4 + 1).cast("int"),
    )
    path = F.concat(F.lit("/p"), (i % 7).cast("string"))
    # minute = (i // 24) % 60 breaks the generator's period-840 collisions:
    # no two rows share (urlkey, timestamp, original_url), so the collapse
    # tie-break is total and the oracle comparison deterministic
    ts = F.concat(
        F.lit("202001"),
        F.lpad((i % 20 + 1).cast("string"), 2, "0"),
        F.lpad((i % 24).cast("string"), 2, "0"),
        F.lpad((F.floor(i / 24) % 60).cast("string"), 2, "0"),
        F.lit("00"),
    )
    cluster = spark.range(2000).select(
        F.concat(key, path).alias("urlkey"),
        ts.alias("timestamp"),
        F.concat(F.lit("http://"), host, path).alias("original_url"),
        F.lit("text/html").alias("mimetype"),
        F.when(i % 5 < 3, 200).otherwise(404).alias("statuscode"),
        F.concat(F.lit("D"), (i % 60).cast("string")).alias("digest"),
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("meta_flags"),
        (i % 900 + 100).alias("compressed_length"),
        (i * 17).alias("compressed_offset"),
        F.lit("f.warc.gz").alias("filename"),
    )
    return cluster


def q_cdx_server_query(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.cdx_query import cdx_query

    return cdx_query(
        _gen_cdx_cluster(spark),
        "http://example.com/",
        match_type="domain",
        from_ts="20200103",
        to_ts="20200112",
        filters=["status:200"],
        collapse="timestamp:8",
    )


_SQL_GEN_CDX_CLUSTER = """gen AS (
  SELECT
    (CASE CAST(i % 4 AS INT) WHEN 0 THEN 'com,example)' WHEN 1 THEN 'com,example,sub)'
          WHEN 2 THEN 'org,example)' ELSE 'com,examplezz)' END)
      || '/p' || CAST(i % 7 AS VARCHAR) AS urlkey,
    '202001' || lpad(CAST(i % 20 + 1 AS VARCHAR), 2, '0')
      || lpad(CAST(i % 24 AS VARCHAR), 2, '0')
      || lpad(CAST((i // 24) % 60 AS VARCHAR), 2, '0') || '00' AS timestamp,
    'http://' ||
    (CASE CAST(i % 4 AS INT) WHEN 0 THEN 'example.com' WHEN 1 THEN 'sub.example.com'
          WHEN 2 THEN 'example.org' ELSE 'examplezz.com' END)
      || '/p' || CAST(i % 7 AS VARCHAR) AS original_url,
    'text/html' AS mimetype,
    CASE WHEN i % 5 < 3 THEN 200 ELSE 404 END AS statuscode,
    'D' || CAST(i % 60 AS VARCHAR) AS digest,
    CAST(NULL AS VARCHAR) AS redirect,
    CAST(NULL AS VARCHAR) AS meta_flags,
    CAST(i % 900 + 100 AS BIGINT) AS compressed_length,
    CAST(i * 17 AS BIGINT) AS compressed_offset,
    'f.warc.gz' AS filename
  FROM range(2000) t(i)
)"""

SQL_CDX_SERVER_QUERY = f"""
WITH {_SQL_GEN_CDX_CLUSTER},
matched AS (
  SELECT * FROM gen
  WHERE (urlkey LIKE 'com,example)%' OR urlkey LIKE 'com,example,%')
    AND timestamp >= '20200103000000' AND timestamp <= '20200112999999'
    AND regexp_matches(CAST(statuscode AS VARCHAR), '^(?:200)$')
),
collapsed AS (
  SELECT *, row_number() OVER (
      PARTITION BY urlkey, substr(timestamp, 1, 8)
      ORDER BY timestamp ASC, original_url ASC) AS rn
  FROM matched
)
SELECT urlkey, timestamp, original_url, mimetype,
       CAST(statuscode AS INTEGER) AS statuscode, digest, redirect,
       meta_flags, compressed_length, compressed_offset, filename
FROM collapsed WHERE rn = 1
ORDER BY urlkey, timestamp
"""


# 67. cdx_server_closest — the Wayback Machine's primary lookup: the k
# captures of one URL nearest a requested time T (sort=closest), the point
# binary search the reference's sorted cluster exists to serve
# (cdx/CDXCluster.java:31-43). Distance is in calendar seconds, ties break
# toward the earlier capture; limit=7 makes row ORDER matter, so the oracle
# replays the same abs-diff ranking.


def q_cdx_server_closest(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.cdx_query import cdx_query

    return cdx_query(
        _gen_cdx_cluster(spark),
        "http://example.com/p3",
        sort="closest",
        closest="20200110",
        limit=7,
    )


# 1578614400 = days(1970-01-01 -> 2020-01-10) * 86400 — the padded target
# '20200110000000' in the same tz-free seconds space as the Spark side
SQL_CDX_SERVER_CLOSEST = f"""
WITH {_SQL_GEN_CDX_CLUSTER},
matched AS (SELECT * FROM gen WHERE urlkey = 'com,example)/p3'),
ranked AS (
  SELECT *,
    abs(
      date_diff('day', DATE '1970-01-01',
                CAST(strptime(substr(timestamp, 1, 8), '%Y%m%d') AS DATE))
        * 86400
      + CAST(substr(timestamp, 9, 2) AS BIGINT) * 3600
      + CAST(substr(timestamp, 11, 2) AS BIGINT) * 60
      + CAST(substr(timestamp, 13, 2) AS BIGINT)
      - 1578614400
    ) AS dist
  FROM matched
)
SELECT urlkey, timestamp, original_url, mimetype,
       CAST(statuscode AS INTEGER) AS statuscode, digest, redirect,
       meta_flags, compressed_length, compressed_offset, filename
FROM ranked
ORDER BY dist ASC, timestamp ASC, original_url ASC
LIMIT 7
"""


# 68. cdx_server_reverse — pywb's sort=reverse (latest captures first);
# with limit=9 the RESULT SET is the nine LATEST captures of the urlkey,
# so the oracle genuinely checks the reversed order, not just the filter.


def q_cdx_server_reverse(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.cdx_query import cdx_query

    return cdx_query(
        _gen_cdx_cluster(spark),
        "http://sub.example.com/p5",
        sort="reverse",
        limit=9,
    )


SQL_CDX_SERVER_REVERSE = f"""
WITH {_SQL_GEN_CDX_CLUSTER}
SELECT urlkey, timestamp, original_url, mimetype,
       CAST(statuscode AS INTEGER) AS statuscode, digest, redirect,
       meta_flags, compressed_length, compressed_offset, filename
FROM gen
WHERE urlkey = 'com,example,sub)/p5'
ORDER BY timestamp DESC, original_url DESC, digest DESC,
         compressed_offset DESC, filename DESC
LIMIT 9
"""


# 69-72. Four more TPC-H planner shapes (engine-upgrade breadth, SURVEY
# §2.5): q13 outer-join distribution, q14 conditional-aggregate ratio,
# q18 having + semi-join, q19 disjunctive multi-table pushdown. The
# generator's part table has single-word p_type and no partsupp/comment
# columns, so predicates adapt while keeping each query's planner shape.


def q_tpch_q13(spark, sf_dir):
    """Customer order-count distribution (q13): LEFT OUTER customer->orders,
    count per customer, then the distribution of those counts — two
    aggregations with the outer join preserving zero-order customers."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q14(spark, sf_dir):
    """Promo revenue share (q14): one month of lineitems, part broadcast
    into the fact scan, conditional-sum ratio in ONE aggregation pass."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = (
        F.col("l_extendedprice").cast("decimal(38,4)")
        * (F.lit(1).cast("decimal(38,4)") - F.col("l_discount").cast("decimal(38,4)"))
    )
    joined = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        # part scales with SF (200k x SF rows): unhinted, AQE decides
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
            "__promo"
        ),
        F.sum(rev).alias("__total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * F.col("__promo").cast("double")
            / F.col("__total").cast("double"),
            4,
        ).alias("promo_revenue")
    )


SQL_TPCH_Q14 = """
SELECT round(
    100.0
    * CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(38,4))
                    * (1 - CAST(l_discount AS DECIMAL(38,4))) ELSE 0 END)
       AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))
               * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE),
    4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
"""

Q18_MIN_QTY = 300


def q_tpch_q18(spark, sf_dir):
    """Large-volume orders (q18): per-order quantity HAVING filter feeds a
    semi-join back into orders+customer; the having side is a skinny
    (orderkey, sum) aggregate, broadcastable at any scale."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        # o_orderkey completes the sort: a (price, date) tie straddling
        # rank 100 would otherwise let the two engines keep different
        # orders (every other top-k query here carries a key tiebreak)
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


SQL_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_MIN_QTY}
) ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


def q_tpch_q19(spark, sf_dir):
    """Disjunctive multi-table predicate (q19): three OR'd brand/size/qty
    branches spanning part AND lineitem — the shape that exercises
    cross-table constraint pushdown; part broadcasts, one global sum."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = (
        F.col("l_extendedprice").cast("decimal(38,4)")
        * (F.lit(1).cast("decimal(38,4)") - F.col("l_discount").cast("decimal(38,4)"))
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#15") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#19") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        t["lineitem"]
        # part scales with SF (200k x SF rows): unhinted, AQE decides
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


SQL_TPCH_Q19 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,4))
            * (1 - CAST(l_discount AS DECIMAL(38,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# 73. salted_join_topk — the skew-mitigation join path under the oracle:
# salted_join must return EXACTLY what the plain equi-join returns (the
# salt is an execution detail), summarized as revenue per mktsegment.
# Pins plans/skew.py with a value-level differential, not just pytest.


def q_salted_join_topk(spark, sf_dir):
    from ia_hadoop_tools_spark.plans.skew import salted_join

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    joined = salted_join(
        t["orders"].withColumnRenamed("o_custkey", "c_custkey"),
        t["customer"],
        on="c_custkey",
        n_salt=8,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


SQL_SALTED_JOIN_TOPK = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE)
         AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# 74. lm_buckets — CCNet's operational step: bucket the corpus into
# head/middle/tail by LM score (Wenzek et al. 2020 keep/flag/drop by
# perplexity third). Scale shape matters: CCNet derives its cutoffs once
# from a bounded calibration set, NOT by globally ranking the corpus — a
# corpus-wide ntile would funnel every (doc, score) pair through one
# window task. Here the tercile cutoffs come from a FIXED-SIZE slice
# (doc_id < 200 — constant cost at any SF, the same fixed-slice trick as
# embedding_neardup), broadcast back; the corpus side is a pure
# comparison, embarrassingly parallel.

LM_CAL_DOCS = 200


def q_lm_buckets(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.lm_quality import lm_buckets

    scored = q_lm_score(spark, sf_dir).filter(F.col("lm_score").isNotNull())
    # scored is consumed twice inside lm_buckets (calibration slice +
    # final bucketing) — no persist: Catalyst's ReusedExchange already
    # dedups the shared scoring pipeline inside the single action
    # (persisting measured SLOWER)
    bucketed = lm_buckets(scored, calibration=F.col("doc_id") < LM_CAL_DOCS)
    return (
        bucketed.groupBy("bucket")
        # lm_score is 6-dp rounded, so the bucket mean aggregates as
        # integer micro-nats too (tie-free, associative) — a float avg
        # here has the same cross-engine ULP drift the scorer fixed
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.round(F.col("lm_score") * 1e6, 0).cast("long"))
                .cast("double")
                / F.count("*")
                / F.lit(1e6),
                6,
            ).alias("avg_score"),
        )
        .orderBy("bucket")
    )


SQL_LM_BUCKETS = f"""
WITH lm AS ({SQL_LM_SCORE}),
cal AS (
  SELECT lm_score,
         ntile(3) OVER (ORDER BY lm_score DESC, doc_id ASC) AS b
  FROM lm WHERE doc_id < {LM_CAL_DOCS} AND lm_score IS NOT NULL
),
th AS (
  SELECT min(CASE WHEN b = 1 THEN lm_score END) AS t1,
         min(CASE WHEN b = 2 THEN lm_score END) AS t2
  FROM cal
)
SELECT bucket, count(*) AS n_docs,
       round(CAST(sum(CAST(round(lm_score * 1e6, 0) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e6, 6) AS avg_score
FROM (
  SELECT CASE WHEN lm_score >= t1 THEN 'head'
              WHEN lm_score >= t2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         lm_score
  FROM lm, th
  WHERE lm_score IS NOT NULL
)
GROUP BY bucket ORDER BY bucket
"""


# 87. semdedup — SemDeDup (Abbas et al. 2023): cluster the embedding
# space, then near-dup ONLY within clusters — the quadratic term is
# bounded by the largest cluster, not the corpus, which is what makes
# embedding-level dedup tractable at 100 TB. Centroids here are a FIXED
# slice (vec_id < K — constant cost at any sf, same trick as
# embedding_neardup's cap); production path plugs train_ivf_centroids in.
# Output is row-level (vec_id, cluster_id, is_dup) so the oracle pins the
# assignment AND the keep rule, not just counts.

SEMDEDUP_K = 16
SEMDEDUP_COS = 0.35  # synthetic 64-dim embeddings: in-cluster max ~0.49


def q_semdedup(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.similarity import semdedup

    e = _t(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < SEMDEDUP_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    return semdedup(e, centroids, threshold=SEMDEDUP_COS).orderBy("vec_id")





SQL_SEMDEDUP = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  WHERE vec_id < {SEMDEDUP_K}
),
scored AS (
  SELECT e.vec_id, c.cid,
         round({_vec_dot_sql('e.embedding', 'c.cvec')}
               / ({_vec_norm_sql('e.embedding')}
                  * {_vec_norm_sql('c.cvec')}), 6) AS cos
  FROM embeddings e, cent c
  WHERE {_vec_norm_sql('e.embedding')}
        * {_vec_norm_sql('c.cvec')} <> 0
),
best AS (
  SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
wv AS (
  SELECT b.vec_id, b.cluster_id, e.embedding
  FROM best b JOIN embeddings e USING (vec_id)
),
dups AS (
  SELECT DISTINCT bb.vec_id AS dup_id
  FROM wv a JOIN wv bb
    ON a.cluster_id = bb.cluster_id AND a.vec_id < bb.vec_id
  WHERE round({_vec_dot_sql('a.embedding', 'bb.embedding')}
              / ({_vec_norm_sql('a.embedding')}
                 * {_vec_norm_sql('bb.embedding')}), 6)
        >= {SEMDEDUP_COS}
)
SELECT b.vec_id, b.cluster_id,
       (dup_id IS NOT NULL) AS is_dup
FROM best b LEFT JOIN dups ON b.vec_id = dup_id
ORDER BY b.vec_id
"""


# 88. bm25_topk — corpus keyword search (operators/search.py): the
# retrieval counterpart of the dedup layer. One token-explode pass builds
# postings + doclens (map-side combinable); the per-term df table is tiny
# and broadcasts; ranking is a bounded TakeOrderedAndProject. Scores
# round to 6dp BEFORE ranking so ln() ulp drift can't reorder the top-k.

BM25_TERMS = ("spark", "join", "window")
BM25_K = 25


def q_bm25_topk(spark, sf_dir):
    from ia_hadoop_tools_spark.operators.search import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_TERMS, k=BM25_K)


SQL_BM25_TOPK = f"""
WITH toks AS (
  SELECT doc_id, t AS token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
    FROM documents
  ) WHERE t <> ''
),
dl AS (SELECT doc_id, count(*) AS dln FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n, sum(dln) AS sumdl FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tfreq FROM toks
  WHERE token IN {BM25_TERMS} GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS dfx FROM tf GROUP BY 1)
SELECT doc_id,
       round(sum(
         ln(1 + (n - dfx + 0.5) / (dfx + 0.5))
         * tfreq * ({1.2} + 1)
         / (tfreq + {1.2} * (1 - {0.75}
            + {0.75} * dln / (CAST(sumdl AS DOUBLE) / n)))
       ), 6) AS bm25
FROM tf
JOIN dfreq USING (token)
JOIN dl USING (doc_id), stats
GROUP BY doc_id, n, sumdl
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_K}
"""


# ---------------------------------------------------------------------------
# registry

QUERIES = {
    "day_limit": q_day_limit,
    "dedup_exact": q_dedup_exact,
    "first_per_key": q_first_per_key,
    "range_scan": q_range_scan,
    "prefix_filter": q_prefix_filter,
    "policy_anti_join": q_policy_anti_join,
    "merge_daylimit": q_merge_daylimit,
    "work_queue": q_work_queue,
    "tpch_q1": q_tpch_q1,
    "topk_orders": q_topk_orders,
    "nation_revenue": q_nation_revenue,
    "rollup_counts": q_rollup_counts,
    "rolling_window": q_rolling_window,
    "json_extract": q_json_extract,
    "cdx_parse": q_cdx_parse,
    "crawllog_parse": q_crawllog_parse,
    "ts14": q_ts14,
    "surt": q_surt,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "dedup_text": q_dedup_text,
    "minhash_sigs": q_minhash_sigs,
    "minhash_pairs": q_minhash_pairs,
    "simhash": q_simhash,
    "jaccard_pairs": q_jaccard_pairs,
    "ann_topk": q_ann_topk,
    "embedding_neardup": q_embedding_neardup,
    "cdx_rekey": q_cdx_rekey,
    "sessionize": q_sessionize,
    "set_ops": q_set_ops,
    "grouping_sets": q_grouping_sets,
    "tpch_q3": q_tpch_q3,
    "ann_ivf": q_ann_ivf,
    "tpch_q5": q_tpch_q5,
    "asof_join": q_asof_join,
    "pivot": q_pivot,
    "simhash_pairs": q_simhash_pairs,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "ann_lsh": q_ann_lsh,
    "multimodal_decode": q_multimodal_decode,
    "wat_extract": q_wat_extract,
    "wat_fields": q_wat_fields,
    "incremental_cycle": q_incremental_cycle,
    "neardup_clusters": q_neardup_clusters,
    "quality_rules": q_quality_rules,
    "dedup_lines": q_dedup_lines,
    "pii_scrub": q_pii_scrub,
    "sample_mix": q_sample_mix,
    "pack_sequences": q_pack_sequences,
    "tumbling_window": q_tumbling_window,
    "zipnum_scan": q_zipnum_scan,
    "span_stats": q_span_stats,
    "span_dedup": q_span_dedup,
    "wet_text": q_wet_text,
    "wet_extract": q_wet_extract,
    "novel_docs": q_novel_docs,
    "novel_docs_indexed": q_novel_docs_indexed,
    "kvstore_scan": q_kvstore_scan,
    "decontam": q_decontam,
    "tpch_q4": q_tpch_q4,
    "tpch_q10": q_tpch_q10,
    "tpch_q12": q_tpch_q12,
    "lm_score": q_lm_score,
    "cdxj_roundtrip": q_cdxj_roundtrip,
    "cdx_server_query": q_cdx_server_query,
    "cdx_server_closest": q_cdx_server_closest,
    "cdx_server_reverse": q_cdx_server_reverse,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "salted_join_topk": q_salted_join_topk,
    "lm_buckets": q_lm_buckets,
    "semdedup": q_semdedup,
    "bm25_topk": q_bm25_topk,
}

# 75-86. The remaining 12 TPC-H planner shapes (q2 q6 q7 q8 q9 q11 q15
# q16 q17 q20 q21 q22) live in tpch.py — completing the 22-query suite.
from ia_hadoop_tools_spark.tpch import (  # noqa: E402
    TPCH_EXTRA_ORACLES,
    TPCH_EXTRA_QUERIES,
)

QUERIES.update(TPCH_EXTRA_QUERIES)

ORACLES = {
    "day_limit": SQL_DAY_LIMIT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "first_per_key": SQL_FIRST_PER_KEY,
    "range_scan": SQL_RANGE_SCAN,
    "prefix_filter": SQL_PREFIX_FILTER,
    "policy_anti_join": SQL_POLICY_ANTI_JOIN,
    "merge_daylimit": SQL_MERGE_DAYLIMIT,
    "work_queue": SQL_WORK_QUEUE,
    "tpch_q1": SQL_TPCH_Q1,
    "topk_orders": SQL_TOPK_ORDERS,
    "nation_revenue": SQL_NATION_REVENUE,
    "rollup_counts": SQL_ROLLUP_COUNTS,
    "rolling_window": SQL_ROLLING_WINDOW,
    "json_extract": SQL_JSON_EXTRACT,
    "cdx_parse": SQL_CDX_PARSE,
    "crawllog_parse": SQL_CRAWLLOG_PARSE,
    "ts14": SQL_TS14,
    "surt": SQL_SURT,
    "text_stats": SQL_TEXT_STATS,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "dedup_text": SQL_DEDUP_TEXT,
    "minhash_sigs": SQL_MINHASH_SIGS,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "simhash": SQL_SIMHASH,
    "jaccard_pairs": SQL_JACCARD_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "cdx_rekey": SQL_CDX_REKEY,
    "sessionize": SQL_SESSIONIZE,
    "set_ops": SQL_SET_OPS,
    "grouping_sets": SQL_GROUPING_SETS,
    "tpch_q3": SQL_TPCH_Q3,
    "ann_ivf": SQL_ANN_IVF,
    "tpch_q5": SQL_TPCH_Q5,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "ann_lsh": SQL_ANN_LSH,
    "asof_join": SQL_ASOF_JOIN,
    "pivot": SQL_PIVOT,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "embedding_neardup_lsh": SQL_EMBEDDING_NEARDUP_LSH,
    "wat_extract": SQL_WAT_EXTRACT,
    "wat_fields": SQL_WAT_FIELDS,
    "incremental_cycle": SQL_INCREMENTAL_CYCLE,
    "neardup_clusters": SQL_NEARDUP_CLUSTERS,
    "quality_rules": SQL_QUALITY_RULES,
    "dedup_lines": SQL_DEDUP_LINES,
    "pii_scrub": SQL_PII_SCRUB,
    "sample_mix": SQL_SAMPLE_MIX,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "tumbling_window": SQL_TUMBLING_WINDOW,
    "zipnum_scan": SQL_ZIPNUM_SCAN,
    "span_stats": SQL_SPAN_STATS,
    "span_dedup": SQL_SPAN_DEDUP,
    "wet_text": SQL_WET_TEXT,
    "wet_extract": SQL_WET_EXTRACT,
    "novel_docs": SQL_NOVEL_DOCS,
    "novel_docs_indexed": SQL_NOVEL_DOCS_INDEXED,
    "kvstore_scan": SQL_KVSTORE_SCAN,
    "decontam": SQL_DECONTAM,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q12": SQL_TPCH_Q12,
    "lm_score": SQL_LM_SCORE,
    "cdxj_roundtrip": SQL_CDX_PARSE,
    "cdx_server_query": SQL_CDX_SERVER_QUERY,
    "cdx_server_closest": SQL_CDX_SERVER_CLOSEST,
    "cdx_server_reverse": SQL_CDX_SERVER_REVERSE,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q19": SQL_TPCH_Q19,
    "salted_join_topk": SQL_SALTED_JOIN_TOPK,
    "lm_buckets": SQL_LM_BUCKETS,
    "semdedup": SQL_SEMDEDUP,
    "bm25_topk": SQL_BM25_TOPK,
}

ORACLES.update(TPCH_EXTRA_ORACLES)

# 89-93. Round-4 analytics additions (iterative PageRank, KMV sketches,
# exact quantiles, DSIR scoring, cohort retention) live in
# analytics_queries.py.
from ia_hadoop_tools_spark.analytics_queries import (  # noqa: E402
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)

QUERIES.update(ANALYTICS_QUERIES)
ORACLES.update(ANALYTICS_ORACLES)

# 94. Training-corpus freeze registrations, rounds 7-10
# (corpus_queries.py — one namespace since the round-10 fold; the
# per-row registration history lives in that module's docstring).
# CORPUS_ORACLES builds lazily at first access (PEP 562) because two
# oracle builders compose SQL defined ABOVE in this module
# (SQL_MINHASH_PAIRS, the vector helpers).
from ia_hadoop_tools_spark.corpus_queries import (  # noqa: E402
    CORPUS_ORACLES,
    CORPUS_QUERIES,
)

QUERIES.update(CORPUS_QUERIES)
ORACLES.update(CORPUS_ORACLES)
