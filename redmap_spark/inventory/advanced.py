"""SURVEY §2.A additions (round 5, later session) — distribution,
concentration, sweep-line, and skyline analytics (oracle-verified).

All four follow the registry determinism rules: money through
DECIMAL(18,2), ratios as one double division rounded to 6, dates as
strings, ties broken on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import money_sum, query

# -- q_mode_per_group --------------------------------------------------
#
# Categorical mode per group: the most frequent order priority in each
# market segment, with its count and share. Scale shape: one
# customer⋈orders broadcast-dim join, one partial-aggregated groupBy
# to the tiny |segments|×|priorities| grid; both windows (top-1 pick,
# per-segment total) run over that grid only. Tie-break: lowest
# priority string wins (deterministic across engines).

MODE_SQL = """
WITH g AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_mktsegment, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, o_orderpriority) AS rk,
         SUM(n) OVER (PARTITION BY c_mktsegment) AS tot
  FROM g
)
SELECT c_mktsegment, o_orderpriority AS mode_priority,
       CAST(n AS BIGINT) AS n_orders,
       round(n / CAST(tot AS DOUBLE), 6) AS share
FROM r WHERE rk = 1
"""


@query("q_mode_per_group", oracle=MODE_SQL)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    g = (
        cat.orders.join(
            F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment")
    r = g.select(
        "c_mktsegment",
        "o_orderpriority",
        "n",
        F.row_number()
        .over(w.orderBy(F.col("n").desc(), "o_orderpriority"))
        .alias("rk"),
        F.sum("n").over(w).alias("tot"),
    )
    return r.filter(F.col("rk") == 1).select(
        "c_mktsegment",
        F.col("o_orderpriority").alias("mode_priority"),
        F.col("n").alias("n_orders"),
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("share"),
    )


# -- q_decile_lift -----------------------------------------------------
#
# Revenue-concentration decile table (the 80/20 report): customers
# ranked by lifetime revenue, cut into ntile(10) deciles; per decile
# the customer count, exact-decimal revenue, and share of total. Scale
# shape: the fact scan partial-aggregates to the |customers| grid; the
# ntile window sorts that grid (two-pass range-partitioned sort at
# cluster scale — the grid is orders of magnitude smaller than the
# fact table); the total is a 1-row broadcast join. Ties on equal
# revenue break by custkey so the ntile cut is engine-deterministic.

DECILE_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY 1
), cut AS (
  SELECT o_custkey, r, NTILE(10) OVER (ORDER BY r DESC, o_custkey) AS decile
  FROM rev
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS decile_rev,
       round(CAST(SUM(r) AS DOUBLE) /
             (SELECT CAST(SUM(r) AS DOUBLE) FROM rev), 6) AS rev_share
FROM cut GROUP BY 1
"""


@query("q_decile_lift", oracle=DECILE_SQL)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    cut = rev.select(
        "r",
        F.ntile(10)
        .over(Window.orderBy(F.col("r").desc(), "o_custkey"))
        .alias("decile"),
    )
    per = cut.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("r").alias("dr"),
    )
    total = rev.agg(F.sum("r").cast("double").alias("tot"))
    return per.join(F.broadcast(total)).select(
        "decile",
        "n_customers",
        F.col("dr").cast("double").alias("decile_rev"),
        F.round(F.col("dr").cast("double") / F.col("tot"), 6).alias("rev_share"),
    )


# -- q_interval_sweep --------------------------------------------------
#
# Sweep-line interval concurrency: treating each order as active for
# 30 days from its order date, find per nation the PEAK number of
# simultaneously-active orders and the first day it is reached — the
# classic max-concurrent-sessions shape (capacity planning, license
# counting). Scale shape: each order emits one +1 and one -1 delta
# (flat map, no blowup), deltas collapse by (nation, day) BEFORE the
# window, and the running sum partitions by nation — no global sort.
# Intra-day ordering is moot because deltas are pre-summed per day
# (half-open intervals: the -1 lands exactly on day+30, netted in the
# same per-day sum).

SWEEP_SQL = """
WITH deltas AS (
  SELECT n_name, date_trunc('day', o_orderdate) AS day, 1 AS delta
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT n_name, date_trunc('day', o_orderdate) + INTERVAL 30 DAY, -1
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
), byday AS (
  SELECT n_name, day, SUM(delta) AS d FROM deltas GROUP BY 1, 2
), run AS (
  SELECT n_name, day,
         SUM(d) OVER (PARTITION BY n_name ORDER BY day) AS active
  FROM byday
), peak AS (
  SELECT n_name, MAX(active) AS peak_active FROM run GROUP BY 1
)
SELECT r.n_name, CAST(p.peak_active AS BIGINT) AS peak_active,
       strftime(MIN(r.day), '%Y-%m-%d') AS peak_day
FROM run r JOIN peak p ON r.n_name = p.n_name AND r.active = p.peak_active
GROUP BY 1, 2
"""


@query("q_interval_sweep", oracle=SWEEP_SQL)
def q_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    base = cat.orders.join(
        F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    day = F.date_trunc("day", "o_orderdate")
    deltas = base.select(
        "n_name",
        F.explode(
            F.array(
                F.struct(day.alias("day"), F.lit(1).alias("delta")),
                F.struct(
                    (day + F.expr("INTERVAL 30 DAY")).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("n_name", "e.day", "e.delta")
    byday = deltas.groupBy("n_name", "day").agg(F.sum("delta").alias("d"))
    run = byday.select(
        "n_name",
        "day",
        F.sum("d").over(Window.partitionBy("n_name").orderBy("day")).alias("active"),
    )
    peak = run.groupBy("n_name").agg(F.max("active").alias("peak_active"))
    return (
        run.join(peak, ["n_name"])
        .filter(F.col("active") == F.col("peak_active"))
        .groupBy("n_name", "peak_active")
        .agg(F.date_format(F.min("day"), "yyyy-MM-dd").alias("peak_day"))
    )


# -- q_skyline ---------------------------------------------------------
#
# Pareto frontier (skyline): parts where no other part is both cheaper
# (<= price) and larger (>= size) with at least one strict — the
# multi-objective shortlist shape. Scale design: collapse to the
# DISTINCT (price, size) grid first (dominance is identical for
# duplicates), then one window pass over the grid sorted by
# (price ASC, size DESC): a point is dominated iff the running MAX of
# size over STRICT predecessors >= its size — predecessors in this
# order are exactly the cheaper-or-equal-and-larger candidates. The
# window sorts only the distinct grid (≪ table); the oracle states
# dominance independently as NOT EXISTS, so the window rewrite is
# verified against the definition, not against itself.

SKYLINE_SQL = """
WITH g AS (
  SELECT p_retailprice AS price, p_size AS sz, COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT a.price, a.sz AS size, CAST(a.n_parts AS BIGINT) AS n_parts
FROM g a
WHERE NOT EXISTS (
  SELECT 1 FROM g b
  WHERE b.price <= a.price AND b.sz >= a.sz
    AND (b.price < a.price OR b.sz > a.sz)
)
"""


@query("q_skyline", oracle=SKYLINE_SQL)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    g = p.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("sz")
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    # Strict predecessors under (price ASC, sz DESC) = all points with
    # price < mine, or price = mine and sz > mine; any of them with
    # sz >= mine dominates me.
    w = (
        Window.orderBy(F.col("price").asc(), F.col("sz").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = g.select(
        "price", "sz", "n_parts", F.max("sz").over(w).alias("pred_max_sz")
    )
    return sky.filter(
        F.col("pred_max_sz").isNull() | (F.col("pred_max_sz") < F.col("sz"))
    ).select("price", F.col("sz").alias("size"), "n_parts")
