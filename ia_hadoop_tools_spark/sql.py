"""SQL surface: the engine's function layer as ``spark.sql``-callable names.

The reference's declarative entry point is Pig scripts calling registered
UDFs (``DEFINE toSURT org.archive.hadoop.pig.udf.toSURT(); FOREACH x
GENERATE toSURT(url)`` — SURVEY §3.2, pig/udf/*.java). One
:func:`register_sql_surface` call gives SQL users the same names:

    SELECT surt(original)            -- toSURT / Recanonicalize
         , url_resolve(r, b, v)      -- URLResolverFunc
         , ts14_to_ts(timestamp)     -- DateTime14ToTimestamp
         , ts14_to_ms(timestamp)
         , ts_to_ts14(ts)            -- DateUtils.get14DigitDate
         , day14(timestamp)          -- the day-limit grouping key
    FROM ...

plus the ``zipnum`` and ``sortedkv`` data sources for ``spark.read.format``
/ SQL ``USING`` clauses.

Mechanism: the timestamp helpers register as **SQL scalar functions**
(``CREATE TEMPORARY FUNCTION … RETURN <expr>``, Spark 4) whose bodies are
the same built-in expressions the DataFrame twins in
``functions/datetime14.py`` build — full codegen, no Python; tests pin SQL
== DataFrame equality so the two can't drift. ``surt`` and ``url_resolve``
are genuinely Python (pandas UDFs), matching the reference where they were
real UDFs too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name -> (signature, body). Bodies mirror functions/datetime14.py exactly;
#: test_sql_surface pins the equality.
_SQL_FUNCTIONS = {
    "ts14_to_ts": (
        "(s STRING) RETURNS TIMESTAMP",
        """
        CASE
          WHEN length(s) = 14 THEN
            try_to_timestamp(substring(s, 1, 14), 'yyyyMMddHHmmss')
          WHEN length(s) = 17 THEN
            timestamp_millis(
              unix_millis(
                try_to_timestamp(substring(s, 1, 14), 'yyyyMMddHHmmss'))
              + try_cast(substring(s, 15, 3) AS BIGINT))
          ELSE CAST(NULL AS TIMESTAMP)
        END
        """,
    ),
    # defined THROUGH ts14_to_ts (registered first) so the 14/17-digit
    # parse lives in exactly one body and cannot drift
    "ts14_to_ms": (
        "(s STRING) RETURNS BIGINT",
        "unix_millis(ts14_to_ts(s))",
    ),
    "ts_to_ts14": (
        "(t TIMESTAMP) RETURNS STRING",
        "date_format(t, 'yyyyMMddHHmmss')",
    ),
    "day14": (
        "(s STRING) RETURNS STRING",
        "substring(s, 1, 8)",
    ),
}


def register_sql_surface(spark: SparkSession) -> None:
    """Register the SQL-callable function and source names (see module doc).

    Idempotent (CREATE OR REPLACE / re-register); call once per session.
    """
    from ia_hadoop_tools_spark.functions.surt import surt_udf
    from ia_hadoop_tools_spark.functions.urlfns import url_resolve_udf
    from ia_hadoop_tools_spark.sources.kvstore import register_sortedkv
    from ia_hadoop_tools_spark.sources.zipnum_datasource import register_zipnum

    spark.udf.register("surt", surt_udf)
    spark.udf.register("url_resolve", url_resolve_udf)
    for name, (sig, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        )
    register_zipnum(spark)
    register_sortedkv(spark)
