"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster — AQE on (runtime re-plan + skew-join splitting),
Arrow on (every pandas UDF crosses the JVM/Python boundary in columnar batches),
and shuffle partitions sized explicitly rather than left at the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ia-hadoop-tools-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    Defaults mirror what a production deployment would set cluster-wide:

    - ``spark.sql.adaptive.enabled`` + skew-join handling: the reference
      hand-partitions by boundary files (AlphaPartitioner); AQE re-plans at
      runtime instead and splits skewed shuffle partitions (hot urlkeys are the
      norm in web-archive data).
    - ``spark.sql.execution.arrow.pyspark.enabled``: all Python UDF traffic is
      Arrow-batched.
    - ``spark.sql.files.maxPartitionBytes`` 128m: keeps scan tasks uniform when
      reading many shards.
    - ``spark.sql.shuffle.partitions``: defaults to ``SPARK_GRAFT_CPUS`` (or 32)
      locally; on a real cluster this would be ~2-3x total cores or left to AQE
      coalescing, which is enabled.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # Make this package importable in executor Python workers regardless of the
    # driver's cwd (UDF/mapPartitions closures reference these modules). Local
    # mode: workers inherit PYTHONPATH from the JVM, which inherits it from us.
    # On a real cluster, ship a wheel/zip via spark.submit.pyFiles instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{pypath}" if pypath else pkg_parent
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python DataSource pushdown (sources/zipnum_datasource.py uses
        # pushFilters for summary-driven block pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Spark's default 10m, set explicitly as a documented choice: the
        # threshold compares COMPRESSED/serialized size estimates, and
        # highly-compressible corpus text understates the in-memory
        # HashedRelation build by ~20x — at 64m (the round-1 value) the
        # static planner broadcast the corpus-derived shingle and band
        # tables of the MinHash pipeline at the sf10 probe scale (58 MB
        # parquet -> >1 GiB build -> notEnoughMemoryToBuildAndBroadcast).
        # AQE still upgrades genuinely small sides to broadcast at
        # runtime from actual shuffle sizes, so small-dim joins keep
        # their broadcast plans.
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate turns explode(expr) into an inferred
        # `size(expr)>0 AND isnotnull(expr)` filter that predicate-pushdown
        # then substitutes below upstream exchanges — for expensive generator
        # expressions (shingling, tokenization: interpreted higher-order
        # functions) the inferred filter re-evaluates the whole expression on
        # the pre-shuffle partitioning. Measured 8x slowdown on the MinHash
        # pipeline at sf0.1; the rule's benefit (skipping empty arrays before
        # a Generate) is negligible for this engine's workloads.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # iterative loops checkpoint every round (_truncate_lineage); without
        # this the reliable-checkpoint dirs accumulate for the session's
        # lifetime — with it, checkpoints are deleted once their DataFrame
        # is garbage-collected
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Iterative operators (connected components, k-means) cut lineage per
    # round via checkpoint: with a dir set they use RELIABLE checkpoints
    # (survive executor loss — the cluster-correct mode); without one they
    # fall back to eager localCheckpoint (fine for local mode). Point this
    # at HDFS/S3 on a real cluster.
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables from ``sf_dir`` into a dict of DataFrames.

    ``events.parquet``'s ``ts`` physical type has varied across driver data
    generations — TIMESTAMP(NANOS) (rejected by Spark's reader unless
    ``nanosAsLong`` is flipped, then surfacing as bigint nanos) or
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfacing as TIMESTAMP_NTZ).
    Normalize every shape to a microsecond session-TZ TimestampType column so
    downstream code sees one type on ANY session, including the test
    driver's. Sessions run UTC (see get_spark), so the NTZ->LTZ cast is the
    identity mapping DuckDB's naive-timestamp oracle uses.
    """
    from pyspark.sql import functions as F

    if names is None:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    # SESSION-WIDE side effect, deliberate and documented: the flag must
    # stay set for the lifetime of any DataFrame read below (Spark
    # consults it at execution, not only at analysis), so it cannot be
    # scoped-and-restored around the read. Consequence: later unrelated
    # parquet reads in this session also surface TIMESTAMP(NANOS) columns
    # as bigint nanos instead of erroring — normalize them like the
    # events branch below if you read nanos parquet after load_tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        if n == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                # nanos -> floor to micros with integer division (a double
                # division would lose precision above 2^53; DuckDB's reader
                # does the same truncation). `ts DIV 1000` stays in exact
                # 64-bit integer math.
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
                )
            elif ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out[n] = df
    return out
