"""SURVEY §2.A completion — the last five TPC-H query *shapes*
(Q2, Q9, Q20, Q21, Q22), adapted to this schema (no partsupp table:
the supply catalog is derived from lineitem; no c_phone: country code
is derived from c_nationkey).

Each query demonstrates a distinct decorrelation strategy that Spark
executes scalably:
- Q2:  correlated MIN subquery → window-min over the part key (one
       shuffle, no self-join re-scan).
- Q9:  wide multiway join with exact decimal profit arithmetic.
- Q20: IN-subquery over a filtered aggregate → left-semi join.
- Q21: EXISTS + NOT EXISTS on the same fact table → per-order
       aggregate stats joined once (avoids two correlated re-scans
       of lineitem — the classic Spark rewrite).
- Q22: scalar subquery + NOT EXISTS → broadcast 1-row cross join +
       left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, money_sum, query

REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# -- q2: min-cost supplier per part (correlated MIN subquery) ----------

Q2_SQL = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, n_name, p_partkey, p_name, s_acctbal,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM part
JOIN supply ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size < 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM supply ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
"""


@query("q2_min_cost_supplier", oracle=Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape. The correlated MIN-per-part subquery is
    decorrelated into a window min over the already-joined rows: one
    pass over the supply catalog instead of a second correlated scan.
    At 100 TB the supply aggregate shuffles once on (partkey, suppkey)
    and the window re-uses the partkey clustering; dims broadcast."""
    c = Catalog(spark, sf_dir)
    supply = c.lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    eu_supp = (
        c.supplier.join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = c.part.filter((F.col("p_size") < 15) & (F.col("p_type") == "ECONOMY")).select(
        "p_partkey", "p_name"
    )
    joined = (
        supply.join(F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "s_acctbal",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


# -- q9: product-type profit by nation and year ------------------------

Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS l_year,
       CAST(SUM({REV}
            - CAST(p_retailprice AS DECIMAL(18,2))
              * CAST(l_quantity AS DECIMAL(18,2))
              * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, l_year
"""


@query("q9_product_profit", oracle=Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit = revenue − 10% holding cost, exact
    decimal arithmetic so the sum is partition-order independent.
    part/supplier/nation broadcast; lineitem aggregates map-side."""
    c = Catalog(spark, sf_dir)
    parts = c.part.filter(F.col("p_name").like("%bolt%")).select("p_partkey", "p_retailprice")
    amount = dec("l_extendedprice") * (1 - dec("l_discount")) - dec("p_retailprice") * dec(
        "l_quantity"
    ) * F.lit("0.1").cast("decimal(2,1)")
    return (
        c.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("l_shipdate", "yyyy").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# -- q20: suppliers with excess shipped volume (IN over aggregate) -----

Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%bolt%'
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
"""


@query("q20_excess_suppliers", oracle=Q20_SQL)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a filtered aggregate → left-semi join.
    The inner aggregate shuffles only qualifying lineitem rows (filters
    pushed to scan); the semi join against supplier broadcasts the
    small aggregated key set."""
    c = Catalog(spark, sf_dir)
    parts = c.part.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    heavy = (
        c.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        c.supplier.join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# -- q21: sole-returning supplier per multi-supplier order -------------

Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


@query("q21_sole_returner", oracle=Q21_SQL)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS on the same fact table).
    Spark rewrite: instead of two correlated re-scans of lineitem,
    ONE per-order aggregate computes (distinct suppliers, distinct
    returners, the sole returner's id, its line count); the EXISTS
    pair becomes the predicate nsupp > 1 AND nret = 1. Lineitem is
    scanned and shuffled exactly once at any scale."""
    c = Catalog(spark, sf_dir)
    is_r = F.col("l_returnflag") == "R"
    # ONE pass over lineitem: when nret == 1, max(R-supplier) IS the
    # sole returner and sum(R-lines) is its per-order contribution —
    # so no second lineitem scan and no fact-fact join are needed.
    per_order = c.lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("nret"),
        F.max(F.when(is_r, F.col("l_suppkey"))).alias("ret_supp"),
        F.sum(F.when(is_r, 1).otherwise(0)).alias("n_ret_lines"),
    )
    fl_orders = c.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        per_order.filter((F.col("nsupp") > 1) & (F.col("nret") == 1))
        .join(fl_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.supplier), F.col("ret_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_ret_lines").cast("long").alias("numwait"))
    )


# -- q22: positive-balance customers with no orders, by country code ---

Q22_SQL = """
SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey % 10 IN (1, 3, 5, 7)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY cntrycode
"""


@query("q22_global_sales", oracle=Q22_SQL)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg as a broadcast
    1-row cross join) + NOT EXISTS (left-anti join on orders;
    against rare P-status orders so the result is non-empty at small
    SF — every customer has *some* order in this dataset). The
    country code is derived from c_nationkey (schema has no c_phone)."""
    c = Catalog(spark, sf_dir)
    avg_bal = c.customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.customer.filter((F.col("c_nationkey") % 10).isin(1, 3, 5, 7))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            c.orders.filter(F.col("o_orderstatus") == "P"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 10).cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


# -- q11: important stock (scalar-subquery HAVING threshold) -----------
#
# TPC-H Q11 shape (no partsupp table: per-part supply value is
# SUM(price × qty) of lineitems shipped by the target nation's
# suppliers). The correlated HAVING threshold — value > 0.1% of the
# GLOBAL value — decorrelates into a 1-row aggregate broadcast: the
# per-part aggregate is computed once, the grand total reduces it to
# one row, and the filter is a broadcast nested-loop over that single
# row. Supplier filter broadcast; lineitem scanned exactly once.

Q11_SQL = """
WITH supply AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, CAST(val AS DOUBLE) AS value
FROM supply
WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM supply)
"""


@query("q11_important_stock", oracle=Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    sup = (
        c.supplier.join(
            F.broadcast(c.nation.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    per_part = (
        c.lineitem.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("val"))
    )
    total = per_part.agg((F.sum("val").cast("double") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("val").cast("double").alias("value"))
    )


# -- q15: top supplier (scalar-subquery MAX over a derived view) -------
#
# TPC-H Q15 shape: quarterly revenue per supplier, return the
# supplier(s) achieving the maximum. The REVENUE view is computed
# once (one lineitem scan, partial-aggregated groupBy); the MAX
# scalar subquery is a 1-row broadcast, and ties are kept exactly as
# the spec requires (equality on exact decimals, no FP drift). The
# supplier join broadcasts the (tiny by then) max-revenue rows.

Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


@query("q15_top_supplier", oracle=Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("mx"))
    return (
        c.supplier.join(F.broadcast(top), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )
