"""SURVEY §2.A continued — wider TPC-H-shape coverage plus string /
datetime / statistical function breadth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query

REV = 'CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))'


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# -- q7: bidirectional nation-pair volume ------------------------------

Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS l_year,
       CAST(SUM({REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", oracle=Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    n1 = c.nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = c.nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    line = c.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        line.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# -- q12: conditional agg over join (Q12 shape) ------------------------

Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@query("q12_priority_shipping", oracle=Q12_SQL)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    line = c.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        c.orders.join(line, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# -- q13: customer order-count distribution (left join incl. zeros) ----

Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM c_orders GROUP BY c_count
"""


@query("q13_order_distribution", oracle=Q13_SQL)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    per_cust = (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# -- q14: promo revenue share ------------------------------------------

Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({REV}) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@query("q14_promo_share", oracle=Q14_SQL)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    line = c.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        line.join(F.broadcast(c.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (100.0 * F.sum(promo).cast("double") / F.sum(_rev()).cast("double")).alias("promo_share")
        )
    )


# -- q16: supplier variety per part group ------------------------------

Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
"""


@query("q16_supplier_variety", oracle=Q16_SQL)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    part = c.part.filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        c.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -- q17: correlated avg-quantity subquery -----------------------------

Q17_SQL = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_cut
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < qty_cut
"""


@query("q17_small_qty_revenue", oracle=Q17_SQL)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    part_avg = (
        c.lineitem.groupBy(F.col("l_partkey").alias("pk"))
        .agg((0.2 * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))).alias("qty_cut"))
    )
    brand = c.part.filter(F.col("p_brand") == "Brand#3")
    return (
        c.lineitem.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# -- q18: large-volume orders (HAVING on exact sum) --------------------

Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


@query("q18_large_orders", oracle=Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("sum_qty"))
    )
    return (
        big.join(c.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c.customer), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# -- q19: disjunctive multi-attribute predicates -----------------------

Q19_SQL = f"""
SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 15 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 20 AND 40)
"""


@query("q19_disjunctive", oracle=Q19_SQL)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 15) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 25) & F.col("l_quantity").between(20, 40))
    )
    return (
        c.lineitem.join(F.broadcast(c.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# -- q_string_ops: string function breadth -----------------------------

QSTR_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       reverse(c_name) AS name_rev,
       CAST(levenshtein(c_name, 'Customer#1') AS BIGINT) AS lev,
       concat(c_mktsegment, '/', c_name) AS seg_name,
       replace(c_name, 'Customer', 'C') AS name_short
FROM customer WHERE c_custkey < 100
"""


@query("q_string_ops", oracle=QSTR_SQL)
def q_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.filter(F.col("c_custkey") < 100).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.reverse("c_name").alias("name_rev"),
        F.levenshtein("c_name", F.lit("Customer#1")).cast("long").alias("lev"),
        F.concat("c_mktsegment", F.lit("/"), "c_name").alias("seg_name"),
        F.replace("c_name", F.lit("Customer"), F.lit("C")).alias("name_short"),
    )


# -- q_datetime_ops: datetime function breadth -------------------------

QDT_SQL = """
SELECT o_orderkey,
       CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
       CAST(strftime(o_orderdate, '%m') AS BIGINT) AS mo,
       CAST(strftime(o_orderdate, '%d') AS BIGINT) AS dom,
       CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday_mon0,
       CAST(CEIL(CAST(strftime(o_orderdate, '%m') AS INTEGER) / 3.0) AS BIGINT) AS qtr,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
FROM orders WHERE o_orderkey < 500
"""


@query("q_datetime_ops", oracle=QDT_SQL)
def q_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.weekday(d).cast("long").alias("weekday_mon0"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
    )


# -- q_lateness_percentiles ----------------------------------------------
#
# Fulfillment-delay distribution per order priority: days from order
# date to line ship date, as order statistics p50/p90/max plus the
# slow share (> 90 days) — the SLA report q12 only thresholds.
# Delay is exact integer day arithmetic; percentiles are
# value-deterministic order stats (the value at rank ceil(q·m) = the
# smallest delay whose cumulative count reaches that rank). Shape:
# fact⋈fact join on orderkey, then ONE partial-aggregated groupBy to
# the tiny |priority × distinct-delay| grid (delays are bounded
# integer days, ~600 cells); the cumulative window and the rank
# lookups run over that grid only — never a per-priority sort of the
# fact rows (which would put the whole stream through 5 skewed
# window partitions at scale).

LATENESS_SQL = """
WITH l AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS delay_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
g AS (
  SELECT o_orderpriority, delay_days, CAST(COUNT(*) AS BIGINT) AS c
  FROM l GROUP BY 1, 2
),
cg AS (
  SELECT o_orderpriority, delay_days, c,
         SUM(c) OVER (PARTITION BY o_orderpriority
                      ORDER BY delay_days) AS cum,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS m
  FROM g
),
st AS (
  SELECT o_orderpriority,
         CAST(MAX(m) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN delay_days > 90 THEN c ELSE 0 END) AS BIGINT)
           AS n_slow,
         CAST(MIN(CASE WHEN cum >= CAST(ceil(0.5 * m) AS BIGINT)
                       THEN delay_days END) AS BIGINT) AS p50_delay,
         CAST(MIN(CASE WHEN cum >= CAST(ceil(0.9 * m) AS BIGINT)
                       THEN delay_days END) AS BIGINT) AS p90_delay,
         CAST(MAX(delay_days) AS BIGINT) AS max_delay
  FROM cg GROUP BY 1
)
SELECT o_orderpriority, n_lines, n_slow,
       round(n_slow / CAST(n_lines AS DOUBLE), 6) AS slow_share,
       p50_delay, p90_delay, max_delay
FROM st
"""


@query("q_lateness_percentiles", oracle=LATENESS_SQL)
def q_lateness_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li, o = c.lineitem, c.orders
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("delay_days"),
    )
    g = l.groupBy("o_orderpriority", "delay_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wp = Window.partitionBy("o_orderpriority")
    cg = g.select(
        "o_orderpriority", "delay_days", "c",
        F.sum("c").over(wp.orderBy("delay_days")).alias("cum"),
        F.sum("c").over(wp).alias("m"),
    )

    def at(q):
        return F.min(
            F.when(
                F.col("cum")
                >= F.ceil(F.lit(q) * F.col("m")).cast("bigint"),
                F.col("delay_days"),
            )
        ).cast("bigint")

    st = cg.groupBy("o_orderpriority").agg(
        F.max("m").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("delay_days") > 90, F.col("c")).otherwise(0))
        .cast("bigint").alias("n_slow"),
        at(0.5).alias("p50_delay"),
        at(0.9).alias("p90_delay"),
        F.max("delay_days").cast("bigint").alias("max_delay"),
    )
    return st.select(
        "o_orderpriority", "n_lines", "n_slow",
        F.round(F.col("n_slow") / F.col("n_lines").cast("double"), 6)
        .alias("slow_share"),
        "p50_delay", "p90_delay", "max_delay",
    )
