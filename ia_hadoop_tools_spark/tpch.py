"""The remaining 12 TPC-H planner shapes (q2 q6 q7 q8 q9 q11 q15 q16 q17
q20 q21 q22), completing the 22-query suite started in driver_queries.py.

These are engine-upgrade breadth (SURVEY §2.5/§2.6): the reference's Pig
surface delegates general joins/aggregation to the engine, so the claim
"a reference user could run every query they run today" is only honest if
the engine's join/subquery planner handles the canonical decision-support
shapes — correlated scalar subqueries (q2 q17), EXISTS/NOT-EXISTS
multi-self-joins (q21 q22), scalar-aggregate thresholds (q11 q15 q22),
nested aggregate semi-joins (q18 q20), and multi-way snowflake joins with
two roles for one dimension (q7 q8 q9).

The driver's generator has no ``partsupp`` table and fewer columns than
spec (TESTDATA.md), so predicates adapt while preserving each query's
planner shape; the part–supplier association is DERIVED from lineitem
(``_partsupp``): ps_supplycost = min unit price ever charged,
ps_availqty = total quantity ever shipped.  Both engines compute that
CTE from the same parquet doubles with order-independent aggregates
(min; sum over integer-valued doubles), so downstream equality
comparisons are exact.

Float discipline (matches driver_queries.py): money accumulates as
DECIMAL(38,4) (exact, order-independent), comparisons against scalar
aggregates are rearranged to stay in decimal/integer arithmetic
(value*1000 > total; c_acctbal*n > sum), and doubles only appear at the
final projection via round(..., k).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ia_hadoop_tools_spark.session import load_tables

_DEC = "decimal(38,4)"


def _dec(col):
    return F.col(col).cast(_DEC)


def _rev():
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


def _partsupp(t):
    """Derived part-supplier association (the generator ships no partsupp).

    min() is a selection (no accumulation) and sum(l_quantity) sums
    integer-valued doubles — both bit-stable across engines and partition
    orders, so ps rows compare exactly between Spark and DuckDB.
    """
    return (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "ps_supplycost"
            ),
            F.sum("l_quantity").alias("ps_availqty"),
        )
    )


SQL_PS = """
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost,
         sum(l_quantity) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier: correlated scalar-min subquery over the
# region-scoped ps, decorrelated as (groupBy min -> broadcast join back).

Q2_SIZE = 15
Q2_TYPE = "SMALL"
Q2_REGION = "EUROPE"


def q_tpch_q2(spark, sf_dir):
    """For each part (size/type filtered), the supplier(s) in EUROPE whose
    cost equals the regional minimum. Shape: correlated MIN subquery ->
    skinny per-part min aggregate broadcast back into the candidate join;
    dims (nation, region, filtered part) broadcast into the ps scan."""
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "nation", "region", "lineitem")
    )
    ps = _partsupp(t)
    sup = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == Q2_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    p = t["part"].filter(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    # sup and p are SF-scaled (supplier/part slices, unlike nation/region)
    # so no FORCED broadcast anywhere in this module for them: forcing
    # bypasses autoBroadcastJoinThreshold and would build an arbitrarily
    # large broadcast table at high SF; AQE still chooses broadcast when
    # the runtime size is under the threshold (it is at bench scale)
    cand = ps.join(
        sup, F.col("ps_suppkey") == F.col("s_suppkey")
    ).join(p, F.col("ps_partkey") == F.col("p_partkey"))
    min_cost = (
        cand.groupBy(F.col("ps_partkey").alias("__mk"))
        .agg(F.min("ps_supplycost").alias("__min_cost"))
    )
    return (
        cand.join(
            min_cost,
            (F.col("ps_partkey") == F.col("__mk"))
            & (F.col("ps_supplycost") == F.col("__min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # floor-quantized, not round(): floor of the binary double is
            # engine-independent; round() can split on HALF_UP midpoints
            (F.floor(F.col("ps_supplycost") * 1e4).cast("long") / F.lit(1e4))
            .alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


SQL_TPCH_Q2 = f"""
WITH {SQL_PS},
cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = '{Q2_REGION}'
  JOIN part ON ps_partkey = p_partkey
           AND p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(floor(ps_supplycost * 10000) AS BIGINT) / 10000.0 AS supplycost
FROM cand
WHERE ps_supplycost = (
  SELECT min(c2.ps_supplycost) FROM cand c2
  WHERE c2.p_partkey = cand.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change: pure scan-side filter + one global sum.
# The whole query folds into a single parquet scan with pushed predicates.


def q_tpch_q6(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


SQL_TPCH_Q6 = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,4))
                      * CAST(l_discount AS DECIMAL(38,4))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations: the two-role dimension join
# (nation appears as supplier-nation AND customer-nation) with a
# symmetric pair predicate spanning both.

Q7_N1 = "NATION_3"
Q7_N2 = "NATION_7"


def q_tpch_q7(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("__sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("__cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    sn, cn = F.col("supp_nation"), F.col("cust_nation")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            # supplier scales with SF like customer below — same
            # discipline: no forced broadcast, AQE decides
            t["supplier"].join(n1, F.col("s_nationkey") == F.col("__sn_key")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales with SF (unlike nation/region): shuffle-join it,
        # matching the repo's other TPC-H shapes — only true dims broadcast
        .join(
            t["customer"].join(
                F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(
            ((sn == Q7_N1) & (cn == Q7_N2)) | ((sn == Q7_N2) & (cn == Q7_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,4))
             * (1 - CAST(l_discount AS DECIMAL(38,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
    OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q8 — national market share: conditional-sum ratio over a 7-table
# snowflake (nation twice, region on the customer side).

Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_NATION = "NATION_8"


def q_tpch_q8(spark, sf_dir):
    t = load_tables(
        spark,
        sf_dir,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("__sn_key"),
        F.col("n_name").alias("__supp_nation"),
    )
    cust_side = (
        t["customer"]
        .join(
            t["nation"].select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t["region"].filter(F.col("r_name") == Q8_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = _rev()
    base = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == Q8_TYPE),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t["supplier"].join(n_supp, F.col("s_nationkey") == F.col("__sn_key")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # cust_side is region-filtered but still O(customers) — scales with
        # SF, so no forced broadcast (AQE may still choose one when small)
        .join(cust_side, F.col("o_custkey") == F.col("c_custkey"))
    )
    agg = base.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("__supp_nation") == Q8_NATION, vol).otherwise(
                F.lit(0).cast(_DEC)
            )
        ).alias("__nat"),
        F.sum(vol).alias("__tot"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.col("__nat").cast("double") / F.col("__tot").cast("double"), 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


SQL_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(sum(CASE WHEN n1.n_name = '{Q8_NATION}'
                  THEN CAST(l_extendedprice AS DECIMAL(38,4))
                       * (1 - CAST(l_discount AS DECIMAL(38,4)))
                  ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))
                    * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q9 — product-type profit: fact joined to the derived ps on a COMPOSITE
# key (partkey, suppkey), profit = revenue − cost, by nation × year.

Q9_NAME_FRAG = "gear"


def q_tpch_q9(spark, sf_dir):
    # Cost term stays in INTEGER MICROS: floor(supplycost * 1e6) is a pure
    # function of the binary double (identical in both engines — no
    # decimal-string rounding, unlike casting the double product to
    # DECIMAL, which lands on HALF_UP-vs-binary midpoints). The micro sum
    # is an exact bigint; revenue keeps the proven per-row decimal cast;
    # the two exact sums combine only in the final per-group projection.
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "lineitem", "orders", "nation")
    )
    ps = _partsupp(t)
    cost_micro = F.floor(F.col("ps_supplycost") * 1e6).cast("long") * F.col(
        "l_quantity"
    ).cast("long")
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").contains(Q9_NAME_FRAG)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            t["supplier"],
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(_rev()).alias("__rev"),
            F.sum(cost_micro).alias("__cost_micro"),
        )
        .select(
            "nation",
            "o_year",
            F.round(
                F.col("__rev").cast("double")
                - F.col("__cost_micro").cast("double") / F.lit(1e6),
                2,
            ).alias("sum_profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


SQL_TPCH_Q9 = f"""
WITH {SQL_PS}
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))
                  * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE)
         - CAST(sum(CAST(floor(ps_supplycost * 1000000) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 1000000,
         2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%{Q9_NAME_FRAG}%'
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11 — important stock: per-part value vs a scalar fraction of the
# global total. The fraction compare is rearranged to value*1000 > total
# so both sides stay in exact decimal/integer arithmetic. Value metric =
# total traded value (sum of extended prices) rather than
# availqty*supplycost: casting the double PRODUCT to decimal(38,4) lands
# on rounding midpoints where Spark (shortest-repr HALF_UP) and DuckDB
# disagree, while the per-row price cast is the repo's proven-exact
# pattern — the planner shape (grouped agg + scalar threshold) is
# unchanged.

Q11_NATION = "NATION_4"


def q_tpch_q11(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "nation"))
    scoped = t["lineitem"].join(
        t["supplier"]
        .join(
            t["nation"].filter(F.col("n_name") == Q11_NATION),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = scoped.groupBy(
        F.col("l_partkey").alias("ps_partkey")
    ).agg(F.sum(_dec("l_extendedprice")).alias("__value"))
    total = per_part.agg(F.sum("__value").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__value") * 1000 > F.col("__total"))
        .select(
            "ps_partkey",
            F.col("__value").cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


SQL_TPCH_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey AS ps_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS value_d
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT ps_partkey, CAST(value_d AS DOUBLE) AS value
FROM per_part, (SELECT sum(value_d) AS total FROM per_part)
WHERE value_d * 1000 > total
ORDER BY value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# q15 — top supplier: a revenue "view" + scalar max + equality join back.
# Exact decimal revenue makes the max-equality robust across engines.


def q_tpch_q15(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("supplier", "lineitem"))
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("__rev"))
    )
    mx = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__max_rev"))
        .join(
            t["supplier"],
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("__rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(38,4))
             * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q16 — supplier count by part attributes: COUNT(DISTINCT) over the ps
# pairs with a NOT-IN supplier exclusion (anti-join on a broadcast list).

Q16_BRAND = "Brand#23"
Q16_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)


def q_tpch_q16(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("part", "supplier", "lineitem"))
    ps = _partsupp(t).select("ps_partkey", "ps_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != Q16_BRAND)
        & (F.col("p_type") != Q16_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            bad,
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


SQL_TPCH_Q16 = f"""
WITH {SQL_PS}
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND}' AND p_type <> '{Q16_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue: correlated per-part AVG subquery,
# decorrelated as a skinny per-part aggregate broadcast back into the
# fact. avg(l_quantity) divides an exact integer sum, so the 0.5*avg
# comparison is bit-stable.

Q17_BRAND = "Brand#5"
Q17_MAX_SIZE = 5


def q_tpch_q17(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    p = t["part"].filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") < Q17_MAX_SIZE)
    )
    li = t["lineitem"].join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    small = li.join(
        avg_qty, F.col("l_partkey") == F.col("__pk")
    ).filter(F.col("l_quantity") < 0.5 * F.col("__avg_qty"))
    return small.agg(
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


SQL_TPCH_Q17 = f"""
SELECT round(
  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0,
  2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{Q17_BRAND}' AND p_size < {Q17_MAX_SIZE}
  AND l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


# ---------------------------------------------------------------------------
# q20 — potential part promotion: nested semi-join chain — suppliers whose
# derived stock of name-filtered parts exceeds half of what they shipped
# in 1997 (the inner correlated-sum subquery becomes a grouped join).

Q20_NATION = "NATION_1"
Q20_PREFIX = "small"


def q_tpch_q20(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "lineitem", "nation")
    )
    ps = _partsupp(t)
    p = t["part"].filter(F.col("p_name").startswith(Q20_PREFIX)).select(
        "p_partkey"
    )
    shipped97 = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("__pk"),
            F.col("l_suppkey").alias("__sk"),
        )
        .agg(F.sum("l_quantity").alias("__qty97"))
    )
    qualifying = (
        ps.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped97,
            (F.col("ps_partkey") == F.col("__pk"))
            & (F.col("ps_suppkey") == F.col("__sk")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("__qty97"))
        .select("ps_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name") == Q20_NATION)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qualifying,
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


SQL_TPCH_Q20 = f"""
WITH {SQL_PS}
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = '{Q20_NATION}'
WHERE s_suppkey IN (
  SELECT ps_suppkey
  FROM ps
  JOIN part ON ps_partkey = p_partkey AND p_name LIKE '{Q20_PREFIX}%'
  JOIN (
    SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty97
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2
  ) ON ps_partkey = pk AND ps_suppkey = sk
  WHERE ps_availqty > 0.5 * qty97
)
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting: the EXISTS / NOT-EXISTS
# multi-self-join ("late" adapted to l_shipdate > o_orderdate as in q4,
# TESTDATA has no commit/receipt dates). Semi- and anti-joins carry a
# non-equi suppkey<>suppkey conjunct on top of the orderkey equi-key.

Q21_NATION = "NATION_2"


def q_tpch_q21(spark, sf_dir):
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "nation")
    )
    late = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("__l2_ok"),
        F.col("l_suppkey").alias("__l2_sk"),
    )
    l3 = late.select(
        F.col("l_orderkey").alias("__l3_ok"),
        F.col("l_suppkey").alias("__l3_sk"),
    )
    l1 = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("__l2_ok"))
            & (F.col("l_suppkey") != F.col("__l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__l3_ok"))
            & (F.col("l_suppkey") != F.col("__l3_sk")),
            "left_anti",
        )
    )
    return (
        l1.join(
            t["supplier"].join(
                t["nation"].filter(F.col("n_name") == Q21_NATION),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SQL_TPCH_Q21 = f"""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE l_shipdate > o_orderdate
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = '{Q21_NATION}'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q22 — global sales opportunity: scalar-average threshold + NOT-EXISTS
# anti-join. The avg compare is rearranged to c_acctbal * n > sum so both
# engines compare exact decimals (no division-rounding hazard); country
# code adapted to c_nationkey (TESTDATA has no c_phone), and "never
# ordered" adapted to "no orders since 1999" (the generator gives every
# customer at least one order, which would make the anti-join vacuous).

Q22_KEYS = (1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23)
Q22_CUTOFF = "1999-01-01"


def q_tpch_q22(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    scoped = t["customer"].filter(F.col("c_nationkey").isin(*Q22_KEYS))
    stats = scoped.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("__sum"),
        F.count("*").alias("__n"),
    )
    return (
        scoped.crossJoin(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("__n") > F.col("__sum"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= Q22_CUTOFF)
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_TPCH_Q22 = f"""
WITH stats AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(38,4))) AS s, count(*) AS n
  FROM customer
  WHERE c_nationkey IN {Q22_KEYS} AND c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,4))), 2) AS DOUBLE)
         AS totacctbal
FROM customer, stats
WHERE c_nationkey IN {Q22_KEYS}
  AND CAST(c_acctbal AS DECIMAL(38,4)) * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '{Q22_CUTOFF}'
  )
GROUP BY 1
ORDER BY 1
"""


TPCH_EXTRA_QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
}

TPCH_EXTRA_ORACLES = {
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q22": SQL_TPCH_Q22,
}
