"""SURVEY §2.A continued — joins, subqueries, set ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, money_sum, query

REV = 'CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))'


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# -- q4: EXISTS semi-join + agg ---------------------------------------

Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = c.lineitem
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# -- q5: 6-way star join (broadcast dims) ------------------------------

Q5_SQL = f"""
SELECT n_name, CAST(SUM({REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("q5_local_volume", oracle=Q5_SQL)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    orders = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    # region→nation chain restricted to ASIA, then broadcast into the
    # fact-side joins; the only shuffle is lineitem⋈orders on orderkey.
    nat = (
        c.nation.join(F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = c.supplier.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        c.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# -- q8: conditional aggregation over a wide join ----------------------

Q8_SQL = f"""
WITH flat AS (
  SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS o_year,
         {REV} AS volume,
         n_name
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM flat GROUP BY o_year
"""


@query("q8_market_share", oracle=Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    orders = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = c.part.filter(F.col("p_type") == "PROMO")
    flat = (
        c.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "n_name",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return flat.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# -- q10: join + agg + top-k by revenue --------------------------------

Q10_SQL = f"""
SELECT c_custkey, c_name, CAST(SUM({REV}) AS DOUBLE) AS revenue, c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    orders = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    line = c.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# -- q_top_suppliers: agg subquery + max-match (Q15 shape) -------------

QTOP_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q_top_suppliers", oracle=QTOP_SQL)
def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    # exact decimal sums make the equality-to-max deterministic
    best = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.max_rev)
        .join(F.broadcast(Catalog(spark, sf_dir).supplier),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -- q_avg_acctbal_subquery: scalar subquery in predicate --------------

QAVG_SQL = """
WITH cutoff AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY c_mktsegment
"""


@query("q_avg_acctbal_subquery", oracle=QAVG_SQL)
def q_avg_acctbal_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    cust = c.customer
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            c.orders.filter(F.col("o_orderstatus") == "P"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


# -- semi / anti / distinct / union ------------------------------------

QSEMI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


@query("q_semi_join", oracle=QSEMI_SQL)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    urgent = c.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


QANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@query("q_anti_join", oracle=QANTI_SQL)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join; against the rare P-status orders so the result
    is non-empty at small SF (every customer has *some* order)."""
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(
            c.orders.filter(F.col("o_orderstatus") == "P"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_acctbal")
    )


QDISTINCT_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


@query("q_distinct", oracle=QDISTINCT_SQL)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).customer.select("c_mktsegment", "c_nationkey").distinct()


QUNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


@query("q_union", oracle=QUNION_SQL)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(c.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


# -- q_set_ops: INTERSECT / EXCEPT -------------------------------------
#
# Set semantics over derived keysets: customers who bought in BOTH
# halves of the data (INTERSECT) and only-early customers (EXCEPT).
# Spark plans both as aggregated left-semi / left-anti joins — the
# distinct collapses before the join, so the shuffle carries keysets,
# not order rows.

QSETOPS_SQL = """
WITH early AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
), late AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1
)
SELECT 'both' AS cohort, COUNT(*) AS n_customers
FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
UNION ALL
SELECT 'early_only' AS cohort, COUNT(*) AS n_customers
FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
"""


@query("q_set_ops", oracle=QSETOPS_SQL)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    early = o.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey").distinct()
    late = o.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey").distinct()
    both = early.intersect(late).agg(
        F.lit("both").alias("cohort"), F.count(F.lit(1)).alias("n_customers")
    )
    early_only = early.exceptAll(late).agg(
        F.lit("early_only").alias("cohort"), F.count(F.lit(1)).alias("n_customers")
    )
    return both.unionByName(early_only)
