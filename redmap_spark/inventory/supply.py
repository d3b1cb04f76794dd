"""SURVEY §2.A — operations, supply-chain and service analytics:
bullwhip, safety stock and risk pooling, procurement portfolios,
SPC charts (p-chart, Western Electric), reliability growth,
acceptance sampling, SLO burn rates, session sweeps, file/partition
planners and multi-criteria ranking. Split out of the former stats7
grab-bag (round 7), code unchanged. Determinism contract as
registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query
from redmap_spark.plans.prefix import two_phase_row_number


# -- q_bullwhip --------------------------------------------------------
#
# Bullwhip-effect ratio per brand: variance amplification of the
# shipment signal over the order signal, BW = CV^2(monthly shipped
# qty) / CV^2(monthly ordered qty) on a shared zero-filled calendar
# month grid (BW > 1 = the supply side amplifies demand noise — the
# Lee/Padmanabhan/Whang measure). One fact scan (lineitem ⋈ broadcast
# part ⋈ orders) feeds BOTH monthly signals as conditional aggregates
# over an exploded two-signal key, so order-month and ship-month
# series come from the same shuffle; moments are exact DECIMAL sums
# (n, Σq, Σq²) per brand and the CV algebra is the only double chain.

BULLWHIP_SQL = """
WITH f AS (
  SELECT p_brand,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS om,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS sm,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
), months AS (
  SELECT DISTINCT om AS m FROM f UNION SELECT DISTINCT sm FROM f
), brands AS (SELECT DISTINCT p_brand FROM f),
ord AS (
  SELECT p_brand, om AS m, CAST(SUM(q) AS DECIMAL(20,2)) AS q
  FROM f GROUP BY 1, 2
), shp AS (
  SELECT p_brand, sm AS m, CAST(SUM(q) AS DECIMAL(20,2)) AS q
  FROM f GROUP BY 1, 2
), grid AS (
  SELECT b.p_brand, mo.m,
         COALESCE(o.q, CAST(0 AS DECIMAL(20,2))) AS oq,
         COALESCE(s.q, CAST(0 AS DECIMAL(20,2))) AS sq
  FROM brands b CROSS JOIN months mo
  LEFT JOIN ord o ON o.p_brand = b.p_brand AND o.m = mo.m
  LEFT JOIN shp s ON s.p_brand = b.p_brand AND s.m = mo.m
), mom AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(oq) AS DECIMAL(28,2)) AS so,
         CAST(SUM(oq * oq) AS DECIMAL(38,4)) AS so2,
         CAST(SUM(sq) AS DECIMAL(28,2)) AS ss,
         CAST(SUM(sq * sq) AS DECIMAL(38,4)) AS ss2
  FROM grid GROUP BY 1
)
SELECT p_brand, CAST(n AS BIGINT) AS n_months,
       round(CAST(so AS DOUBLE) / n, 4) AS order_mean,
       round(CAST(ss AS DOUBLE) / n, 4) AS ship_mean,
       round(((CAST(so2 AS DOUBLE) - CAST(so AS DOUBLE) * CAST(so AS DOUBLE) / n)
              / (n - 1))
             / ((CAST(so AS DOUBLE) / n) * (CAST(so AS DOUBLE) / n)), 6)
         AS order_cv2,
       round(((CAST(ss2 AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n)
              / (n - 1))
             / ((CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n)), 6)
         AS ship_cv2,
       round((((CAST(ss2 AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n)
               / (n - 1))
              / ((CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n)))
             / (((CAST(so2 AS DOUBLE) - CAST(so AS DOUBLE) * CAST(so AS DOUBLE) / n)
                 / (n - 1))
                / ((CAST(so AS DOUBLE) / n) * (CAST(so AS DOUBLE) / n))), 6)
         AS bullwhip
FROM mom
ORDER BY p_brand
"""


@query("q_bullwhip", oracle=BULLWHIP_SQL)
def q_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    f = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("om"),
            F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
            .alias("sm"),
            dec("l_quantity").alias("q"),
        )
        .localCheckpoint()
    )
    months = (
        f.select(F.col("om").alias("m"))
        .union(f.select(F.col("sm").alias("m")))
        .distinct()
    )
    brands = f.select("p_brand").distinct()
    ord_ = f.groupBy("p_brand", F.col("om").alias("m")).agg(
        F.sum("q").cast("decimal(20,2)").alias("q")
    )
    shp = f.groupBy("p_brand", F.col("sm").alias("m")).agg(
        F.sum("q").cast("decimal(20,2)").alias("q")
    )
    zero = F.lit(0).cast("decimal(20,2)")
    grid = (
        brands.crossJoin(F.broadcast(months))
        .join(ord_.withColumnRenamed("q", "oq"), ["p_brand", "m"], "left")
        .join(shp.withColumnRenamed("q", "sq"), ["p_brand", "m"], "left")
        .select(
            "p_brand", "m",
            F.coalesce("oq", zero).alias("oq"),
            F.coalesce("sq", zero).alias("sq"),
        )
    )
    mom = grid.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("oq").cast("decimal(28,2)").alias("so"),
        F.sum(F.col("oq") * F.col("oq")).cast("decimal(38,4)").alias("so2"),
        F.sum("sq").cast("decimal(28,2)").alias("ss"),
        F.sum(F.col("sq") * F.col("sq")).cast("decimal(38,4)").alias("ss2"),
    )
    n = F.col("n")
    so, so2 = F.col("so").cast("double"), F.col("so2").cast("double")
    ss, ss2 = F.col("ss").cast("double"), F.col("ss2").cast("double")
    ocv2 = ((so2 - so * so / n) / (n - 1)) / ((so / n) * (so / n))
    scv2 = ((ss2 - ss * ss / n) / (n - 1)) / ((ss / n) * (ss / n))
    return mom.select(
        "p_brand",
        n.cast("bigint").alias("n_months"),
        F.round(so / n, 4).alias("order_mean"),
        F.round(ss / n, 4).alias("ship_mean"),
        F.round(ocv2, 6).alias("order_cv2"),
        F.round(scv2, 6).alias("ship_cv2"),
        F.round(scv2 / ocv2, 6).alias("bullwhip"),
    ).orderBy("p_brand")


# -- q_safety_stock ----------------------------------------------------
#
# Safety-stock and reorder-point policy per brand under demand AND
# lead-time uncertainty: SS = z * sqrt(Lbar * sigma_d^2 +
# dbar^2 * sigma_L^2) (z = 1.645 for a 95% cycle service level) with
# daily demand moments from a zero-filled calendar grid and lead-time
# moments from per-line order->ship day gaps — the standard
# formula (Silver-Pyck-Peterson) that q_newsvendor's single-period
# quantile answer doesn't give. Exact decimal demand sums and BIGINT
# day-gap sums; the sqrt chain is the only double algebra. Scale:
# two partial-aggregated fact scans to |brands| grids.

SAFETY_SQL = """
WITH f AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS sd,
         CAST(o_orderdate AS DATE) AS od,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
), bounds AS (
  SELECT MIN(sd) AS dmin, MAX(sd) AS dmax FROM f
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), brands AS (SELECT DISTINCT p_brand FROM f),
dd AS (
  SELECT p_brand, sd AS day, CAST(SUM(q) AS DECIMAL(24,2)) AS dq
  FROM f GROUP BY 1, 2
), grid AS (
  SELECT b.p_brand, d.day,
         COALESCE(dd.dq, CAST(0 AS DECIMAL(24,2))) AS dq
  FROM brands b CROSS JOIN days d
  LEFT JOIN dd ON dd.p_brand = b.p_brand AND dd.day = d.day
), dmom AS (
  SELECT p_brand, COUNT(*) AS nd,
         CAST(SUM(dq) AS DECIMAL(30,2)) AS s1,
         CAST(SUM(dq * dq) AS DECIMAL(38,4)) AS s2
  FROM grid GROUP BY 1
), lmom AS (
  SELECT p_brand, COUNT(*) AS nl,
         CAST(SUM(date_diff('day', od, sd)) AS BIGINT) AS l1,
         CAST(SUM(CAST(date_diff('day', od, sd) AS BIGINT)
                  * date_diff('day', od, sd)) AS BIGINT) AS l2
  FROM f GROUP BY 1
), fin AS (
  SELECT d.p_brand,
         CAST(d.s1 AS DOUBLE) / d.nd AS dbar,
         (CAST(d.s2 AS DOUBLE)
          - CAST(d.s1 AS DOUBLE) * CAST(d.s1 AS DOUBLE) / d.nd)
           / (d.nd - 1) AS var_d,
         CAST(l.l1 AS DOUBLE) / l.nl AS lbar,
         (CAST(l.l2 AS DOUBLE)
          - CAST(l.l1 AS DOUBLE) * CAST(l.l1 AS DOUBLE) / l.nl)
           / (l.nl - 1) AS var_l
  FROM dmom d JOIN lmom l ON l.p_brand = d.p_brand
)
SELECT p_brand,
       round(dbar, 4) AS daily_demand,
       round(sqrt(var_d), 4) AS sigma_demand,
       round(lbar, 4) AS lead_days,
       round(sqrt(var_l), 4) AS sigma_lead,
       round(1.645 * sqrt(lbar * var_d + dbar * dbar * var_l), 4)
         AS safety_stock,
       round(dbar * lbar
             + 1.645 * sqrt(lbar * var_d + dbar * dbar * var_l), 4)
         AS reorder_point
FROM fin
ORDER BY p_brand
"""


@query("q_safety_stock", oracle=SAFETY_SQL)
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.col("l_shipdate").cast("date").alias("sd"),
            F.col("o_orderdate").cast("date").alias("od"),
            dec("l_quantity").alias("q"),
        )
        .localCheckpoint()
    )
    # Grid-free (r11, the q_risk_pooling argument): the calendar grid
    # only reaches the moments through nd = |calendar days| — zero
    # cells add exactly 0 to the decimal sums — so nd collapses to
    # datediff(max, min) + 1 on a broadcast 1-row bounds aggregate
    # and the explode(sequence)/crossJoin/left-join build disappears.
    bounds = f.agg(
        (F.datediff(F.max("sd"), F.min("sd")) + 1)
        .cast("bigint")
        .alias("nd")
    )
    dd = f.groupBy("p_brand", F.col("sd").alias("day")).agg(
        F.sum("q").cast("decimal(24,2)").alias("dq")
    )
    dmom = (
        dd.groupBy("p_brand")
        .agg(
            F.sum("dq").cast("decimal(30,2)").alias("s1"),
            F.sum(F.col("dq") * F.col("dq")).cast("decimal(38,4)")
            .alias("s2"),
        )
        .crossJoin(F.broadcast(bounds))
    )
    gap = F.datediff("sd", "od").cast("bigint")
    lmom = f.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum(gap).cast("bigint").alias("l1"),
        F.sum(gap * gap).cast("bigint").alias("l2"),
    )
    j = dmom.join(lmom, "p_brand")
    nd, nl = F.col("nd"), F.col("nl")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    l1, l2 = F.col("l1").cast("double"), F.col("l2").cast("double")
    dbar = s1 / nd
    var_d = (s2 - s1 * s1 / nd) / (nd - 1)
    lbar = l1 / nl
    var_l = (l2 - l1 * l1 / nl) / (nl - 1)
    ss = 1.645 * F.sqrt(lbar * var_d + dbar * dbar * var_l)
    return j.select(
        "p_brand",
        F.round(dbar, 4).alias("daily_demand"),
        F.round(F.sqrt(var_d), 4).alias("sigma_demand"),
        F.round(lbar, 4).alias("lead_days"),
        F.round(F.sqrt(var_l), 4).alias("sigma_lead"),
        F.round(ss, 4).alias("safety_stock"),
        F.round(dbar * lbar + ss, 4).alias("reorder_point"),
    ).orderBy("p_brand")


# -- q_risk_pooling ----------------------------------------------------
#
# Square-root-law risk-pooling benefit per brand: hold inventory per
# nation and you buffer against each nation's daily demand sigma
# separately (sum of sigmas); pool it centrally and you buffer
# against the sigma of the SUM — benefit = 1 - sigma_pooled /
# sum(sigma_i), the closed-form argument for warehouse consolidation
# that q_safety_stock prices per location. Per-(brand, nation) and
# pooled daily demand moments come from the SAME zero-filled grid
# (exact decimal sums), so the two sigmas are consistent by
# construction; correlated national demands show up as a SMALLER
# benefit than the independent sqrt(n) ideal, which is the point of
# measuring it.

POOL_SQL = """
WITH f AS (
  SELECT p_brand, n_name, CAST(l_shipdate AS DATE) AS d,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN part ON p_partkey = l_partkey
), days AS (SELECT DISTINCT d FROM f),
bn AS (SELECT DISTINCT p_brand, n_name FROM f),
cell AS (
  SELECT p_brand, n_name, d, CAST(SUM(q) AS DECIMAL(24,2)) AS dq
  FROM f GROUP BY 1, 2, 3
), grid AS (
  SELECT b.p_brand, b.n_name, days.d,
         COALESCE(c.dq, CAST(0 AS DECIMAL(24,2))) AS dq
  FROM bn b CROSS JOIN days
  LEFT JOIN cell c ON c.p_brand = b.p_brand AND c.n_name = b.n_name
                  AND c.d = days.d
), permkt AS (
  SELECT p_brand, n_name, COUNT(*) AS nd,
         CAST(SUM(dq) AS DOUBLE) AS s1,
         CAST(SUM(CAST(dq * dq AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM grid GROUP BY 1, 2
), sig AS (
  SELECT p_brand,
         CAST(SUM(CAST(round(sqrt((s2 - s1 * s1 / nd) / (nd - 1)), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS sum_sigma,
         COUNT(*) AS n_markets
  FROM permkt GROUP BY 1
), pooled AS (
  SELECT p_brand, COUNT(*) AS nd,
         CAST(SUM(dq) AS DOUBLE) AS s1,
         CAST(SUM(CAST(dq2 * dq2 AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM (
    SELECT p_brand, d, CAST(SUM(dq) AS DECIMAL(26,2)) AS dq,
           CAST(SUM(dq) AS DECIMAL(26,2)) AS dq2
    FROM grid GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT s.p_brand,
       CAST(s.n_markets AS BIGINT) AS n_markets,
       round(s.sum_sigma, 4) AS sum_local_sigma,
       round(sqrt((p.s2 - p.s1 * p.s1 / p.nd) / (p.nd - 1)), 4)
         AS pooled_sigma,
       round(1 - sqrt((p.s2 - p.s1 * p.s1 / p.nd) / (p.nd - 1))
                 / s.sum_sigma, 6) AS pooling_benefit,
       round(1 - 1 / sqrt(CAST(s.n_markets AS DOUBLE)), 6)
         AS sqrt_law_ideal
FROM sig s JOIN pooled p ON p.p_brand = s.p_brand
ORDER BY s.p_brand
"""


@query("q_risk_pooling", oracle=POOL_SQL)
def q_risk_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grid-free (r11): the day-grid crossJoin only ever influenced the
    # moments through nd = |days| — a zero cell contributes exactly 0
    # to both decimal sums (decimal addition is exact), and every
    # (brand, nation) / (brand) group sees ALL days, so nd is one
    # global scalar. Aggregating the OBSERVED cells and broadcasting
    # the 1-row day count is bit-identical and drops the |bn|x|days|
    # grid build, its left join and one checkpoint.
    cat = Catalog(spark, sf_dir)
    f = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_brand", "n_name",
            F.col("l_shipdate").cast("date").alias("d"),
            dec("l_quantity").alias("q"),
        )
    )
    cell = (
        f.groupBy("p_brand", "n_name", "d")
        .agg(F.sum("q").cast("decimal(24,2)").alias("dq"))
        .localCheckpoint()  # feeds ndays, permkt AND daily
    )
    ndays = cell.select("d").distinct().agg(
        F.count(F.lit(1)).alias("nd")
    )
    dq = F.col("dq")
    nd = F.col("nd")
    permkt = (
        cell.groupBy("p_brand", "n_name")
        .agg(
            F.sum(dq).cast("double").alias("s1"),
            F.sum((dq * dq).cast("decimal(38,4)")).cast("double")
            .alias("s2"),
        )
        .crossJoin(F.broadcast(ndays))
    )
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / nd) / (nd - 1)
    )
    sig = permkt.groupBy("p_brand").agg(
        F.sum(F.round(sigma, 6).cast("decimal(18,6)")).cast("double")
        .alias("sum_sigma"),
        F.count(F.lit(1)).alias("n_markets"),
    )
    daily = cell.groupBy("p_brand", "d").agg(
        F.sum(dq).cast("decimal(26,2)").alias("tdq")
    )
    t = F.col("tdq")
    pooled = (
        daily.groupBy("p_brand")
        .agg(
            F.sum(t).cast("double").alias("s1"),
            F.sum((t * t).cast("decimal(38,4)")).cast("double").alias("s2"),
        )
        .crossJoin(F.broadcast(ndays))
    )
    psig = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / nd) / (nd - 1)
    )
    return (
        sig.join(pooled, "p_brand")
        .select(
            "p_brand",
            F.col("n_markets").cast("bigint").alias("n_markets"),
            F.round("sum_sigma", 4).alias("sum_local_sigma"),
            F.round(psig, 4).alias("pooled_sigma"),
            F.round(1 - psig / F.col("sum_sigma"), 6)
            .alias("pooling_benefit"),
            F.round(
                1 - 1 / F.sqrt(F.col("n_markets").cast("double")), 6
            ).alias("sqrt_law_ideal"),
        )
        .orderBy("p_brand")
    )


# -- q_kraljic ---------------------------------------------------------
#
# Kraljic procurement portfolio matrix per brand: profit impact =
# share of total purchase spend, supply risk = supplier-concentration
# HHI within the brand (sum of squared supplier shares — one supplier
# = 1.0, fully diversified -> 1/k), median-split into the four named
# quadrants (strategic / leverage / bottleneck / non-critical). The
# procurement counterpart of q_bcg_matrix's sales view. Exact decimal
# spend folds; shares/HHI are identical double chains; the quadrant
# split compares 6-rounded values to 6-rounded medians.

KRALJIC_SQL = """
WITH bs AS (
  SELECT p_brand, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), brand AS (
  SELECT p_brand,
         CAST(SUM(s) AS DECIMAL(30,2)) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE)
                              / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                     AS DOUBLE))
                             * (CAST(s AS DOUBLE)
                                / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                       AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bs GROUP BY p_brand
  QUALIFY FALSE
), bw AS (
  SELECT p_brand, s,
         CAST(SUM(s) OVER (PARTITION BY p_brand) AS DECIMAL(30,2)) AS bsp
  FROM bs
), brand2 AS (
  SELECT p_brand, MAX(bsp) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE) / CAST(bsp AS DOUBLE))
                             * (CAST(s AS DOUBLE) / CAST(bsp AS DOUBLE)),
                             12) AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bw GROUP BY 1
), tot AS (SELECT CAST(SUM(spend) AS DOUBLE) AS t FROM brand2),
med AS (
  SELECT round(quantile_cont(CAST(spend AS DOUBLE) / t, 0.5), 6) AS m_imp,
         round(quantile_cont(hhi, 0.5), 6) AS m_risk
  FROM brand2 CROSS JOIN tot
)
SELECT p_brand,
       CAST(spend AS DOUBLE) AS spend,
       round(CAST(spend AS DOUBLE) / t, 6) AS profit_impact,
       round(hhi, 6) AS supply_risk_hhi,
       CASE
         WHEN round(CAST(spend AS DOUBLE) / t, 6) > m_imp
              AND round(hhi, 6) > m_risk THEN 'strategic'
         WHEN round(CAST(spend AS DOUBLE) / t, 6) > m_imp THEN 'leverage'
         WHEN round(hhi, 6) > m_risk THEN 'bottleneck'
         ELSE 'non-critical' END AS quadrant
FROM brand2 CROSS JOIN tot CROSS JOIN med
ORDER BY p_brand
"""
KRALJIC_SQL = KRALJIC_SQL.replace(
    """), brand AS (
  SELECT p_brand,
         CAST(SUM(s) AS DECIMAL(30,2)) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE)
                              / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                     AS DOUBLE))
                             * (CAST(s AS DOUBLE)
                                / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                       AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bs GROUP BY p_brand
  QUALIFY FALSE
""",
    "",
)


@query("q_kraljic", oracle=KRALJIC_SQL)
def q_kraljic(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bs = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(28,2)").alias("s"))
    )
    bw = bs.select(
        "p_brand", "s",
        F.sum("s")
        .over(Window.partitionBy("p_brand"))
        .cast("decimal(30,2)")
        .alias("bsp"),
    )
    share = F.col("s").cast("double") / F.col("bsp").cast("double")
    brand2 = bw.groupBy("p_brand").agg(
        F.max("bsp").alias("spend"),
        F.sum(F.round(share * share, 12).cast("decimal(16,12)"))
        .cast("double")
        .alias("hhi"),
    ).localCheckpoint()
    tot = brand2.agg(F.sum("spend").cast("double").alias("t"))
    imp = F.round(F.col("spend").cast("double") / F.col("t"), 6)
    risk = F.round(F.col("hhi"), 6)
    med = (
        brand2.join(F.broadcast(tot))
        .agg(
            F.round(
                F.percentile(
                    F.col("spend").cast("double") / F.col("t"), F.lit(0.5)
                ),
                6,
            ).alias("m_imp"),
            F.round(F.percentile("hhi", F.lit(0.5)), 6).alias("m_risk"),
        )
    )
    return (
        brand2.join(F.broadcast(tot))
        .join(F.broadcast(med))
        .select(
            "p_brand",
            F.col("spend").cast("double").alias("spend"),
            imp.alias("profit_impact"),
            risk.alias("supply_risk_hhi"),
            F.when(
                (imp > F.col("m_imp")) & (risk > F.col("m_risk")),
                "strategic",
            )
            .when(imp > F.col("m_imp"), "leverage")
            .when(risk > F.col("m_risk"), "bottleneck")
            .otherwise("non-critical")
            .alias("quadrant"),
        )
        .orderBy("p_brand")
    )


# -- q_perfect_order ---------------------------------------------------
#
# Perfect-order KPI by order month: an order is ON TIME when every
# line ships within 30 days of the order date, CLEAN when no line
# comes back (returnflag 'R'), and PERFECT when both — the composite
# supply-chain service metric whose multiplicative decay explains why
# 95% x 95% is a mediocre 90%. One lineitem ⋈ orders scan collapses
# to order-level flags via MIN/MAX conditional aggregation, then to
# the month grid; all counts exact BIGINTs, rates 6-rounded doubles.

PERFECT_SQL = """
WITH ol AS (
  SELECT o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
         MIN(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) <= 30
                  THEN 1 ELSE 0 END) AS on_time,
         MIN(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS clean
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT mon,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(SUM(on_time) / CAST(COUNT(*) AS DOUBLE), 6) AS on_time_rate,
       round(SUM(clean) / CAST(COUNT(*) AS DOUBLE), 6) AS clean_rate,
       round(SUM(on_time * clean) / CAST(COUNT(*) AS DOUBLE), 6)
         AS perfect_rate
FROM ol
GROUP BY mon
ORDER BY mon
"""


@query("q_perfect_order", oracle=PERFECT_SQL)
def q_perfect_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    ol = (
        cat.orders.join(
            cat.lineitem.select("l_orderkey", "l_shipdate", "l_returnflag"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("mon"),
        )
        .agg(
            F.min(
                F.when(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                    <= 30,
                    1,
                ).otherwise(0)
            ).alias("on_time"),
            F.min(
                F.when(F.col("l_returnflag") == "R", 0).otherwise(1)
            ).alias("clean"),
        )
    )
    n = F.count(F.lit(1))
    return (
        ol.groupBy("mon")
        .agg(
            n.cast("bigint").alias("n_orders"),
            F.round(F.sum("on_time") / n.cast("double"), 6)
            .alias("on_time_rate"),
            F.round(F.sum("clean") / n.cast("double"), 6)
            .alias("clean_rate"),
            F.round(
                F.sum(F.col("on_time") * F.col("clean")) / n.cast("double"),
                6,
            ).alias("perfect_rate"),
        )
        .orderBy("mon")
    )


# -- q_eta_promise -----------------------------------------------------
#
# Delivery-promise table with hierarchical quantile backoff: the p90
# ship-delay promise per (supplier-nation -> customer-nation) lane,
# falling back to the supplier-nation origin p90 when the lane has
# under 30 shipments, and to the global p90 when the origin is thin
# too — the coverage-vs-sharpness tradeoff every real ETA system
# ships. Quantiles are EXACT rank selections (ceil(0.9 n)-th order
# statistic by (delay, orderkey, linenumber) — no interpolation, so
# cross-engine stable) computed at all three levels from the same
# scan; the output marks which level backed each lane. Scale: one
# fact scan partial-aggregates to the (origin, dest, delay) count
# grid — bounded by |nations|^2 x |distinct delays| (~100k rows at
# ANY scale factor) — and all three quantile levels are cumulative-
# count rank picks on that grid, so no window ever sees fact-width
# rows and the global quantile never funnels the fact through one
# partition (the r7 sf0.1 OOM shape).

ETA_SQL = """
WITH lanes AS (
  SELECT sn.n_name AS origin, cn.n_name AS dest,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS delay,
         l.l_orderkey AS ok, l.l_linenumber AS ln
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
), lane_q AS (
  SELECT origin, dest, MAX(n) AS n, MAX(q) AS p90
  FROM (
    SELECT origin, dest,
           COUNT(*) OVER w AS n,
           CASE WHEN ROW_NUMBER() OVER
                  (PARTITION BY origin, dest ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER w) AS BIGINT)
                THEN delay END AS q
    FROM lanes WINDOW w AS (PARTITION BY origin, dest)
  ) GROUP BY 1, 2
), orig_q AS (
  SELECT origin, MAX(n) AS n, MAX(q) AS p90
  FROM (
    SELECT origin,
           COUNT(*) OVER w AS n,
           CASE WHEN ROW_NUMBER() OVER
                  (PARTITION BY origin ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER w) AS BIGINT)
                THEN delay END AS q
    FROM lanes WINDOW w AS (PARTITION BY origin)
  ) GROUP BY 1
), glob_q AS (
  SELECT MAX(q) AS p90 FROM (
    SELECT CASE WHEN ROW_NUMBER() OVER (ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER ()) AS BIGINT)
                THEN delay END AS q
    FROM lanes
  )
)
SELECT l.origin, l.dest, CAST(l.n AS BIGINT) AS n_shipments,
       CAST(CASE WHEN l.n >= 30 THEN l.p90
                 WHEN o.n >= 30 THEN o.p90
                 ELSE g.p90 END AS BIGINT) AS promise_days,
       CASE WHEN l.n >= 30 THEN 'lane'
            WHEN o.n >= 30 THEN 'origin'
            ELSE 'global' END AS backoff_level
FROM lane_q l
JOIN orig_q o ON o.origin = l.origin
CROSS JOIN glob_q g
ORDER BY l.origin, l.dest
"""


@query("q_eta_promise", oracle=ETA_SQL)
def q_eta_promise(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lanes = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(
                cat.nation.select(
                    F.col("n_nationkey").alias("snk"),
                    F.col("n_name").alias("origin"),
                )
            ),
            F.col("snk") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(
                cat.nation.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_name").alias("dest"),
                )
            ),
            F.col("cnk") == F.col("c_nationkey"),
        )
        .select(
            "origin", "dest",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("delay"),
        )
    )
    # Partial-aggregate the fact to the (origin, dest, delay) count grid
    # BEFORE any quantile work. The oracle's ceil(0.9 n)-th order
    # statistic (ties broken by orderkey/linenumber) is a pure function
    # of the delay counts — the rank-k element is the smallest delay
    # whose cumulative count reaches k — so the grid loses nothing, and
    # the checkpoint that feeds all three levels is grid-sized, not
    # fact-sized.
    grid = (
        lanes.groupBy("origin", "dest", "delay")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )

    def grid_p90(df: DataFrame, keys: list) -> DataFrame:
        wp = Window.partitionBy(*keys) if keys else Window.partitionBy()
        cum = F.sum("cnt").over(
            wp.orderBy("delay").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        tot = F.sum("cnt").over(
            wp.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        inner = df.select(
            *keys, F.col("delay"), cum.alias("cum"), tot.alias("n")
        ).where(F.col("cum") >= F.ceil(0.9 * F.col("n")).cast("bigint"))
        if keys:
            return inner.groupBy(*keys).agg(
                F.max("n").alias("n"), F.min("delay").alias("p90")
            )
        return inner.agg(F.max("n").alias("n"), F.min("delay").alias("p90"))

    lane_q = grid_p90(grid, ["origin", "dest"])
    # Collapse the grid to the window's OWN keys before the wider
    # quantile passes: the origin pass needs only (origin, delay)
    # counts (~25 x |delays|) and the global pass only (delay) counts
    # (~|delays| ~ 120) — so the unpartitioned window sees a
    # domain-bounded frame, not the full 25x25x|delays| lane grid.
    orig_grid = grid.groupBy("origin", "delay").agg(
        F.sum("cnt").alias("cnt")
    )
    glob_grid = grid.groupBy("delay").agg(F.sum("cnt").alias("cnt"))
    orig_q = grid_p90(orig_grid, ["origin"]).select(
        F.col("origin").alias("o2"),
        F.col("n").alias("on"),
        F.col("p90").alias("op90"),
    )
    glob_q = grid_p90(glob_grid, []).select(F.col("p90").alias("gp90"))
    ln_, on = F.col("n"), F.col("on")
    return (
        # broadcast the <=|nations|-row origin quantiles: the
        # checkpoint-backed sides have no size estimate, so this was
        # planning as a sort-merge join of two tiny grids (r11)
        lane_q.join(F.broadcast(orig_q), F.col("origin") == F.col("o2"))
        .join(F.broadcast(glob_q))
        .select(
            "origin", "dest",
            ln_.cast("bigint").alias("n_shipments"),
            F.when(ln_ >= 30, F.col("p90"))
            .when(on >= 30, F.col("op90"))
            .otherwise(F.col("gp90"))
            .cast("bigint")
            .alias("promise_days"),
            F.when(ln_ >= 30, "lane")
            .when(on >= 30, "origin")
            .otherwise("global")
            .alias("backoff_level"),
        )
        .orderBy("origin", "dest")
    )


# -- q_slo_burn_rate ---------------------------------------------------
#
# SRE error-budget burn-rate table over the event stream: treating
# value > 450 as a "bad" request against a 95% SLO (5% budget), each
# day reports the trailing 1d / 7d / 28d bad-rate divided by the
# budget — the multi-window, multi-burn-rate alert rule (Google SRE
# workbook ch.5) where the fast window catches cliffs and the slow
# window filters blips. Day grid is zero-filled from one calendar
# sequence; window numerators/denominators are exact BIGINT sums
# over ROWS frames; the burn ratios are the only doubles, 6-rounded.
# Alert fires when BOTH the 1d and 7d burns exceed 2x. Scale: fact
# scan partial-aggregates to |days|; windows run on the tiny grid.

SLO_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
  FROM events
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), d0 AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         SUM(CASE WHEN value > 450 THEN 1 ELSE 0 END) AS bad
  FROM events GROUP BY 1
), grid AS (
  SELECT days.day,
         CAST(COALESCE(d0.n, 0) AS BIGINT) AS n,
         CAST(COALESCE(d0.bad, 0) AS BIGINT) AS bad
  FROM days LEFT JOIN d0 ON d0.day = days.day
), w AS (
  SELECT day, n, bad,
         CAST(SUM(n) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7,
         CAST(SUM(bad) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS b7,
         CAST(SUM(n) OVER (ORDER BY day
              ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS n28,
         CAST(SUM(bad) OVER (ORDER BY day
              ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS b28
  FROM grid
)
SELECT strftime(day, '%Y-%m-%d') AS day, n AS n_events, bad AS n_bad,
       round(CASE WHEN n > 0 THEN bad / (0.05 * n) END, 6) AS burn_1d,
       round(CASE WHEN n7 > 0 THEN b7 / (0.05 * n7) END, 6) AS burn_7d,
       round(CASE WHEN n28 > 0 THEN b28 / (0.05 * n28) END, 6)
         AS burn_28d,
       CAST(CASE WHEN n > 0 AND n7 > 0
                  AND bad / (0.05 * n) > 2 AND b7 / (0.05 * n7) > 2
            THEN 1 ELSE 0 END AS BIGINT) AS alert
FROM w
ORDER BY day
"""


@query("q_slo_burn_rate", oracle=SLO_SQL)
def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    day = F.col("ts").cast("date")
    bounds = e.agg(F.min(day).alias("dmin"), F.max(day).alias("dmax"))
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    d0 = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 450, 1).otherwise(0)).alias("bad"),
    )
    grid = days.join(d0, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("bad", F.lit(0)).cast("bigint").alias("bad"),
    )
    wo = Window.orderBy("day")
    w7 = wo.rowsBetween(-6, 0)
    w28 = wo.rowsBetween(-27, 0)
    w = grid.select(
        "day", "n", "bad",
        F.sum("n").over(w7).cast("bigint").alias("n7"),
        F.sum("bad").over(w7).cast("bigint").alias("b7"),
        F.sum("n").over(w28).cast("bigint").alias("n28"),
        F.sum("bad").over(w28).cast("bigint").alias("b28"),
    )
    n, bad = F.col("n"), F.col("bad")
    n7, b7 = F.col("n7"), F.col("b7")
    n28, b28 = F.col("n28"), F.col("b28")
    burn1 = F.when(n > 0, bad / (0.05 * n))
    burn7 = F.when(n7 > 0, b7 / (0.05 * n7))
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        n.alias("n_events"),
        bad.alias("n_bad"),
        F.round(burn1, 6).alias("burn_1d"),
        F.round(burn7, 6).alias("burn_7d"),
        F.round(F.when(n28 > 0, b28 / (0.05 * n28)), 6).alias("burn_28d"),
        F.when(
            (n > 0) & (n7 > 0) & (burn1 > 2) & (burn7 > 2), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("alert"),
    ).orderBy("day")


# -- q_output_file_planner ---------------------------------------------
#
# Writer planning table: per ship-year, the EXACT serialized-size
# estimate of the lineitem slice under a documented width model
# (8 B per BIGINT/DOUBLE, 4 B per INT/DATE-ish, octet_length + 4 per
# string) and the derived write plan — how many 128 MiB output files,
# rows per file, and the maxRecordsPerFile knob value. All integer
# arithmetic end to end (BIGINT byte sums, ceil via (x+M-1) DIV M), so
# the plan is bit-identical on both engines. The query-shaped twin of
# the §2.H writer knobs / compaction capabilities: the numbers a real
# pipeline would feed into sources/io.py's writer options. Scale: one
# scan, map-side partial agg to |years| rows.

FILEPLAN_SQL = """
WITH w AS (
  SELECT CAST(strftime(CAST(l_shipdate AS DATE), '%Y') AS BIGINT) AS yr,
         CAST(8 * 4 + 4 + 8 * 4 + 8
              + strlen(l_returnflag) + 4
              + strlen(l_linestatus) + 4 AS BIGINT) AS bytes
  FROM lineitem
), agg AS (
  SELECT yr, COUNT(*) AS rows_, SUM(bytes) AS total_bytes
  FROM w GROUP BY 1
)
SELECT yr AS ship_year,
       CAST(rows_ AS BIGINT) AS n_rows,
       CAST(total_bytes AS BIGINT) AS est_bytes,
       round(CAST(total_bytes AS DOUBLE) / rows_, 2) AS bytes_per_row,
       CAST((total_bytes + 134217727) // 134217728 AS BIGINT)
         AS files_128mb,
       CAST((rows_ + (total_bytes + 134217727) // 134217728 - 1)
            // ((total_bytes + 134217727) // 134217728) AS BIGINT)
         AS rows_per_file
FROM agg
ORDER BY ship_year
"""


@query("q_output_file_planner", oracle=FILEPLAN_SQL)
def q_output_file_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    bytes_ = (
        F.lit(8 * 4 + 4 + 8 * 4 + 8)
        + F.octet_length("l_returnflag") + 4
        + F.octet_length("l_linestatus") + 4
    ).cast("bigint")
    agg = (
        li.select(
            F.year(F.col("l_shipdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
            bytes_.alias("bytes"),
        )
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("rows_"),
            F.sum("bytes").alias("total_bytes"),
        )
    )
    m = F.lit(134217728).cast("bigint")
    files = F.expr("(total_bytes + 134217727) div 134217728")
    return agg.select(
        F.col("yr").alias("ship_year"),
        F.col("rows_").cast("bigint").alias("n_rows"),
        F.col("total_bytes").cast("bigint").alias("est_bytes"),
        F.round(
            F.col("total_bytes").cast("double") / F.col("rows_"), 2
        ).alias("bytes_per_row"),
        files.cast("bigint").alias("files_128mb"),
        F.expr(
            "(rows_ + (total_bytes + 134217727) div 134217728 - 1)"
            " div ((total_bytes + 134217727) div 134217728)"
        )
        .cast("bigint")
        .alias("rows_per_file"),
    ).orderBy("ship_year")


# -- q_range_partition_planner -----------------------------------------
#
# Range-partitioning plan for the order stream keyed by o_custkey:
# 16 equal-depth boundaries from EXACT rank selection (the
# repartitionByRange boundary table a writer would feed Spark),
# realized bucket row counts, and the max/mean skew ratio that says
# whether range partitioning beats hash for this key — the planner
# output beside q_output_file_planner's size plan and q_skew_report's
# diagnosis. Boundaries and counts are exact integers end to end.

RANGEPLAN_SQL = """
WITH r AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
), b2 AS (
  SELECT CAST(FLOOR(16.0 * (rn - 1) / n) AS BIGINT) AS bucket,
         o_custkey
  FROM r
), agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rows_,
         CAST(MIN(o_custkey) AS BIGINT) AS key_lo,
         CAST(MAX(o_custkey) AS BIGINT) AS key_hi
  FROM b2 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(rows_) AS BIGINT) AS n,
         CAST(MAX(rows_) AS BIGINT) AS mx
  FROM agg
)
SELECT CAST(bucket AS BIGINT) AS bucket, rows_, key_lo, key_hi,
       round(rows_ / (CAST(n AS DOUBLE) / 16), 6) AS depth_ratio,
       round(mx / (CAST(n AS DOUBLE) / 16), 6) AS max_skew
FROM agg CROSS JOIN tot
ORDER BY bucket
"""


@query("q_range_partition_planner", oracle=RANGEPLAN_SQL)
def q_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    # The equi-depth planner needs a GLOBAL rank over (custkey,
    # orderkey) — fact-scale, so it runs as the two-phase row_number
    # (plans/prefix.py): within floor(custkey/1024) buckets plus
    # broadcast count offsets; n comes from a broadcast agg instead
    # of an all-rows window. No fact-sized SinglePartition pass.
    r = two_phase_row_number(
        o.select("o_custkey", "o_orderkey"),
        ["o_custkey", "o_orderkey"],
        F.floor(F.col("o_custkey") / 1024).cast("bigint"), out="rn",
    ).join(F.broadcast(o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))))
    b2 = r.select(
        F.floor(16.0 * (F.col("rn") - 1) / F.col("n"))
        .cast("bigint")
        .alias("bucket"),
        "o_custkey",
    )
    agg = b2.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_"),
        F.min("o_custkey").cast("bigint").alias("key_lo"),
        F.max("o_custkey").cast("bigint").alias("key_hi"),
    )
    tot = agg.agg(
        F.sum("rows_").cast("bigint").alias("n"),
        F.max("rows_").cast("bigint").alias("mx"),
    )
    return (
        agg.join(F.broadcast(tot))
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "rows_", "key_lo", "key_hi",
            F.round(
                F.col("rows_") / (F.col("n").cast("double") / 16), 6
            ).alias("depth_ratio"),
            F.round(
                F.col("mx") / (F.col("n").cast("double") / 16), 6
            ).alias("max_skew"),
        )
        .orderBy("bucket")
    )


# -- q_selectivity_audit -----------------------------------------------
#
# Optimizer-statistics quality audit: a 10-bucket equi-width
# histogram on o_totalprice (the stats an optimizer keeps) estimates
# the selectivity of "totalprice > threshold" predicates under the
# uniform-within-bucket assumption, and the table reports estimated
# vs ACTUAL selectivity with the relative error per threshold — the
# measurement of when histogram stats mislead join/scan planning
# (the numbers behind q_join_size_estimate's estimates). Bucket
# boundaries and counts are exact; the interpolation is one double
# chain per threshold.

SELAUDIT_SQL = """
WITH mm AS (
  SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
         COUNT(*) AS n
  FROM orders
), hist AS (
  SELECT LEAST(CAST(FLOOR(10 * (CAST(o_totalprice AS DOUBLE) - lo)
                          / (hi - lo)) AS BIGINT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders CROSS JOIN mm
  GROUP BY 1
), th AS (
  SELECT lo + (hi - lo) * frac AS t, frac, lo, hi, n
  FROM mm CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75, 0.9]) AS frac)
), est AS (
  SELECT th.t, th.frac, th.n,
         CAST(SUM(CASE
           WHEN h.b > LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9)
           THEN CAST(h.c AS DECIMAL(24,4))
           WHEN h.b = LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9)
           THEN CAST(round(h.c * (1 - (10 * th.frac
                     - LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9))),
                     4) AS DECIMAL(24,4))
           ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) AS est_rows
  FROM th JOIN hist h ON TRUE
  GROUP BY 1, 2, 3
), act AS (
  SELECT th.t,
         CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) > th.t
                       THEN 1 ELSE 0 END) AS BIGINT) AS act_rows
  FROM orders CROSS JOIN th GROUP BY 1
)
SELECT round(e.frac, 2) AS threshold_frac,
       round(e.t, 2) AS threshold_value,
       round(e.est_rows / e.n, 6) AS est_selectivity,
       round(a.act_rows / CAST(e.n AS DOUBLE), 6) AS actual_selectivity,
       round(e.est_rows / e.n - a.act_rows / CAST(e.n AS DOUBLE), 6)
         + 0.0 AS estimation_error
FROM est e JOIN act a ON a.t = e.t
ORDER BY threshold_frac
"""


@query("q_selectivity_audit", oracle=SELAUDIT_SQL)
def q_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    mm = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    hist = (
        o.join(F.broadcast(mm))
        .select(
            F.least(
                F.floor(
                    10
                    * (F.col("o_totalprice").cast("double") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                ).cast("bigint"),
                F.lit(9).cast("bigint"),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    fracs = o.sparkSession.createDataFrame(
        [(0.25,), (0.5,), (0.75,), (0.9,)], ["frac"]
    )
    th = mm.crossJoin(F.broadcast(fracs)).select(
        (F.col("lo") + (F.col("hi") - F.col("lo")) * F.col("frac"))
        .alias("t"),
        "frac", "lo", "hi", "n",
    ).localCheckpoint()
    bcut = F.least(
        F.floor(10 * F.col("frac")).cast("bigint"),
        F.lit(9).cast("bigint"),
    )
    est = (
        th.crossJoin(F.broadcast(hist))
        .groupBy("t", "frac", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("b") > bcut, F.col("c").cast("decimal(24,4)")
                )
                .when(
                    F.col("b") == bcut,
                    F.round(
                        F.col("c") * (1 - (10 * F.col("frac") - bcut)), 4
                    ).cast("decimal(24,4)"),
                )
                .otherwise(F.lit(0).cast("decimal(24,4)"))
            )
            .cast("double")
            .alias("est_rows")
        )
    )
    act = (
        o.crossJoin(F.broadcast(th.select("t")))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(
                    F.col("o_totalprice").cast("double") > F.col("t"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("act_rows")
        )
    )
    return (
        est.join(act, "t")
        .select(
            F.round("frac", 2).alias("threshold_frac"),
            F.round("t", 2).alias("threshold_value"),
            F.round(F.col("est_rows") / F.col("n"), 6)
            .alias("est_selectivity"),
            F.round(F.col("act_rows") / F.col("n").cast("double"), 6)
            .alias("actual_selectivity"),
            (
                F.round(
                    F.col("est_rows") / F.col("n")
                    - F.col("act_rows") / F.col("n").cast("double"),
                    6,
                )
                + 0.0
            ).alias("estimation_error"),
        )
        .orderBy("threshold_frac")
    )


# -- q_session_gap_sweep -----------------------------------------------
#
# Sessionization sensitivity: how session count, events-per-session,
# mean session duration, and bounce rate move as the inactivity gap
# threshold sweeps 15m/30m/1h/2h/6h — the tuning study behind
# q_sessionize's fixed 6h gap. ONE window pass computes each event's
# gap-to-previous and gap-to-next (per user, (ts, event_id) order);
# every threshold's metrics are conditional sums over that same pass
# (a session's duration is the sum of its intra-session gaps, and a
# session is a bounce iff its opening event is also its last), so the
# whole sweep is one scan + one user_id shuffle + a 1-row wide
# aggregate unpivoted to 5 rows. Counts and micro-second sums are
# exact BIGINTs; the three ratios are the only doubles, rounded 6.

_GAPS_MIN = [15, 30, 60, 120, 360]

SWEEP_SQL = f"""
WITH g1 AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), gaps AS (
  SELECT user_id, gap,
         LEAD(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM g1
), wide AS (
  SELECT COUNT(*) AS cnt,
    {",".join(
      f'''SUM(CASE WHEN gap IS NULL OR gap > {g * 60_000_000}
              THEN 1 ELSE 0 END) AS st{g},
      SUM(CASE WHEN gap <= {g * 60_000_000} THEN gap ELSE 0 END) AS du{g},
      SUM(CASE WHEN (gap IS NULL OR gap > {g * 60_000_000})
               AND (nxt IS NULL OR nxt > {g * 60_000_000})
              THEN 1 ELSE 0 END) AS sg{g}'''
      for g in _GAPS_MIN
    )}
  FROM gaps
)
{" UNION ALL ".join(
  f'''SELECT CAST({g} AS BIGINT) AS gap_min,
       CAST(st{g} AS BIGINT) AS n_sessions,
       CAST(sg{g} AS BIGINT) AS singleton_sessions,
       round(CAST(cnt AS DOUBLE) / st{g}, 6) AS avg_events,
       round(CAST(du{g} AS DOUBLE) / st{g} / 1000000, 6)
         AS avg_duration_s,
       round(CAST(sg{g} AS DOUBLE) / st{g}, 6) AS bounce_rate
     FROM wide''' for g in _GAPS_MIN
)}
ORDER BY gap_min
"""


@query("q_session_gap_sweep", oracle=SWEEP_SQL)
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g1 = e.select(
        "user_id", "ts", "event_id", (us - F.lag(us).over(wo)).alias("gap")
    )
    gaps = g1.select("user_id", "gap", F.lead("gap").over(wo).alias("nxt"))
    gap, nxt = F.col("gap"), F.col("nxt")
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for g in _GAPS_MIN:
        gus = g * 60_000_000
        aggs += [
            F.sum(
                F.when(gap.isNull() | (gap > gus), 1).otherwise(0)
            ).alias(f"st{g}"),
            F.sum(F.when(gap <= gus, gap).otherwise(F.lit(0))).alias(
                f"du{g}"
            ),
            F.sum(
                F.when(
                    (gap.isNull() | (gap > gus))
                    & (nxt.isNull() | (nxt > gus)),
                    1,
                ).otherwise(0)
            ).alias(f"sg{g}"),
        ]
    wide = gaps.agg(*aggs)
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).cast("bigint").alias("gap_min"),
                        F.col(f"st{g}").cast("bigint").alias("n_sessions"),
                        F.col(f"sg{g}")
                        .cast("bigint")
                        .alias("singleton_sessions"),
                        F.round(
                            F.col("cnt").cast("double") / F.col(f"st{g}"), 6
                        ).alias("avg_events"),
                        F.round(
                            F.col(f"du{g}").cast("double")
                            / F.col(f"st{g}")
                            / 1_000_000,
                            6,
                        ).alias("avg_duration_s"),
                        F.round(
                            F.col(f"sg{g}").cast("double") / F.col(f"st{g}"),
                            6,
                        ).alias("bounce_rate"),
                    )
                    for g in _GAPS_MIN
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.orderBy("gap_min")


# -- q_p_chart ---------------------------------------------------------
#
# Attribute control chart (p-chart) for the monthly return-rate of
# shipped lines: centerline p-bar = total returns / total lines, and
# per-month 3-sigma limits p-bar +- 3*sqrt(p-bar(1-p-bar)/n_i) that
# WIDEN for thin months (the varying-n limits that make a p-chart a
# p-chart, vs q_xmr_chart's fixed individuals limits). Counts are
# exact BIGINTs off one scan; the limit algebra is one identical
# double chain, 6-rounded; out-of-control flags compare the exact
# monthly ratio to the rounded limits on both engines identically.

P_CHART_SQL = """
WITH m AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS pbar FROM m
)
SELECT mon,
       n AS n_lines, x AS n_returns,
       round(x / CAST(n AS DOUBLE), 6) AS p,
       round(pbar, 6) AS p_bar,
       round(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 6) AS ucl,
       round(GREATEST(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0.0), 6)
         AS lcl,
       CAST(CASE WHEN x / CAST(n AS DOUBLE)
                      > round(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 6)
                 OR x / CAST(n AS DOUBLE)
                      < round(GREATEST(pbar - 3 * sqrt(pbar * (1 - pbar)
                                       / n), 0.0), 6)
            THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM m CROSS JOIN tot
ORDER BY mon
"""


@query("q_p_chart", oracle=P_CHART_SQL)
def q_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    m = li.groupBy(
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
        .alias("mon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    tot = m.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("pbar")
    )
    n, x, pbar = F.col("n"), F.col("x"), F.col("pbar")
    sig = 3 * F.sqrt(pbar * (1 - pbar) / n)
    ucl = F.round(pbar + sig, 6)
    lcl = F.round(F.greatest(pbar - sig, F.lit(0.0)), 6)
    p = x / n.cast("double")
    return (
        m.join(F.broadcast(tot))
        .select(
            "mon",
            n.alias("n_lines"),
            x.alias("n_returns"),
            F.round(p, 6).alias("p"),
            F.round(pbar, 6).alias("p_bar"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            F.when((p > ucl) | (p < lcl), 1).otherwise(0).cast("bigint")
            .alias("out_of_control"),
        )
        .orderBy("mon")
    )


# -- q_crow_amsaa ------------------------------------------------------
#
# Crow-AMSAA (Duane) reliability-growth model on the return stream:
# cumulative returned lines N(t) vs operating days t on log-log
# axes; the slope beta of ln N = ln lambda + beta ln t says whether
# the return process is improving (beta < 1), stationary (= 1), or
# deteriorating (> 1), with the scale lambda as the day-one rate —
# the standard reliability-program tracking chart, fit by exact-
# moment OLS over the (ln t, ln N) grid of return days. The
# process-improvement counterpart to q_p_chart's control view.

CROW_SQL = """
WITH mx AS (SELECT MIN(CAST(l_shipdate AS DATE)) AS d0 FROM lineitem),
ret AS (
  SELECT date_diff('day', d0, CAST(l_shipdate AS DATE)) + 1 AS t
  FROM lineitem CROSS JOIN mx WHERE l_returnflag = 'R'
), cum AS (
  SELECT t, CAST(SUM(COUNT(*)) OVER (ORDER BY t) AS BIGINT) AS nt
  FROM ret GROUP BY t
), xy AS (
  SELECT CAST(round(ln(CAST(t AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(nt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM cum
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(24,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(24,9))) AS DOUBLE) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_return_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
       round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n), 6) AS lambda_scale,
       CAST(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) < 1
            THEN 1 ELSE 0 END AS BIGINT) AS improving
FROM m
"""


@query("q_crow_amsaa", oracle=CROW_SQL)
def q_crow_amsaa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    mx = li.agg(F.min(F.col("l_shipdate").cast("date")).alias("d0"))
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(mx))
        .select(
            (
                F.datediff(F.col("l_shipdate").cast("date"), F.col("d0"))
                + 1
            ).alias("t")
        )
    )
    cum = (
        ret.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "t",
            F.sum("c").over(Window.orderBy("t")).cast("bigint")
            .alias("nt"),
        )
    )
    xy = cum.select(
        F.round(F.log(F.col("t").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(F.log(F.col("nt").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(24,9)")
    ).cast("double")
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    beta = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return m.select(
        n.cast("bigint").alias("n_return_days"),
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((sy - beta * sx) / n), 6).alias("lambda_scale"),
        F.when(beta < 1, 1).otherwise(0).cast("bigint").alias("improving"),
    )


# -- q_acceptance_sampling ---------------------------------------------
#
# Acceptance-sampling OC evaluation of the n = 50, c = 2 single
# sampling plan against each month's actual return rate: P(accept) =
# sum_{k<=2} C(50,k) p^k (1-p)^(50-k) with the literal binomial
# coefficients (1, 50, 1225) — the operating-characteristic curve of
# the quality-engineering standard, flagging months whose defect
# level the plan would likely REJECT (P < 0.10, the consumer-risk
# point) — the lot-disposition view beside q_p_chart's monitoring
# view. Monthly rates are exact count ratios; the OC polynomial is
# one identical double chain.

ACCEPT_SQL = """
WITH m AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), oc AS (
  SELECT mon, n, x, x / CAST(n AS DOUBLE) AS p,
         pow(1 - x / CAST(n AS DOUBLE), 50)
         + 50 * (x / CAST(n AS DOUBLE))
              * pow(1 - x / CAST(n AS DOUBLE), 49)
         + 1225 * pow(x / CAST(n AS DOUBLE), 2)
                * pow(1 - x / CAST(n AS DOUBLE), 48) AS p_accept
  FROM m
)
SELECT mon, n AS n_lines, x AS n_returns,
       round(p, 6) AS defect_rate,
       round(p_accept, 6) AS p_accept,
       CAST(CASE WHEN p_accept < 0.10 THEN 1 ELSE 0 END AS BIGINT)
         AS plan_rejects
FROM oc
ORDER BY mon
"""


@query("q_acceptance_sampling", oracle=ACCEPT_SQL)
def q_acceptance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    m = li.groupBy(
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
        .alias("mon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    p = F.col("x") / F.col("n").cast("double")
    p_accept = (
        F.pow(1 - p, 50)
        + 50 * p * F.pow(1 - p, 49)
        + 1225 * F.pow(p, 2) * F.pow(1 - p, 48)
    )
    return m.select(
        "mon",
        F.col("n").alias("n_lines"),
        F.col("x").alias("n_returns"),
        F.round(p, 6).alias("defect_rate"),
        F.round(p_accept, 6).alias("p_accept"),
        F.when(p_accept < 0.10, 1).otherwise(0).cast("bigint")
        .alias("plan_rejects"),
    ).orderBy("mon")


# -- q_western_electric ------------------------------------------------
#
# Western Electric run rules over the daily-revenue individuals
# chart: rule 1 (one point beyond 3 sigma), rule 2 (2 of 3
# consecutive beyond 2 sigma, same side), rule 3 (4 of 5 beyond
# 1 sigma, same side), rule 4 (8 consecutive on one side of center)
# — the pattern tests that catch drifts and cycles q_xmr_chart's
# single-point limits miss. Center/sigma come from the exact moment
# folds; per-day z-scores are 6-rounded so the rule windows (ROWS
# frames of side/zone flags) branch identically on both engines.
# Output: the flagged days with which rules fired.

WE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS n, CAST(SUM(rev) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE),
                             2) AS DECIMAL(38,2))) AS DOUBLE) AS s2
  FROM daily
), z AS (
  SELECT day,
         round((CAST(rev AS DOUBLE) - s1 / n)
               / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
  FROM daily CROSS JOIN mom
), flags AS (
  SELECT day, z,
         CASE WHEN z > 0 THEN 1 ELSE -1 END AS side,
         CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END AS beyond3,
         CASE WHEN z > 2 THEN 1 WHEN z < -2 THEN -1 ELSE 0 END AS b2,
         CASE WHEN z > 1 THEN 1 WHEN z < -1 THEN -1 ELSE 0 END AS b1
  FROM z
), rules AS (
  SELECT day, z,
         beyond3 AS rule1,
         CASE WHEN SUM(CASE WHEN b2 = 1 THEN 1 ELSE 0 END)
                OVER w3 >= 2
               OR SUM(CASE WHEN b2 = -1 THEN 1 ELSE 0 END)
                OVER w3 >= 2 THEN 1 ELSE 0 END AS rule2,
         CASE WHEN SUM(CASE WHEN b1 = 1 THEN 1 ELSE 0 END)
                OVER w5 >= 4
               OR SUM(CASE WHEN b1 = -1 THEN 1 ELSE 0 END)
                OVER w5 >= 4 THEN 1 ELSE 0 END AS rule3,
         CASE WHEN ABS(SUM(side) OVER w8) = 8 THEN 1 ELSE 0 END AS rule4
  FROM flags
  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT strftime(day, '%Y-%m-%d') AS day, z,
       CAST(rule1 AS BIGINT) AS rule1,
       CAST(rule2 AS BIGINT) AS rule2,
       CAST(rule3 AS BIGINT) AS rule3,
       CAST(rule4 AS BIGINT) AS rule4
FROM rules
WHERE rule1 + rule2 + rule3 + rule4 > 0
ORDER BY day
"""


@query("q_western_electric", oracle=WE_SQL)
def q_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    revd = F.col("rev").cast("double")
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("double").alias("s1"),
        F.sum(F.round(revd * revd, 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n")
    zc = F.round(
        (revd - F.col("s1") / n)
        / F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
        ),
        6,
    )
    z = daily.join(F.broadcast(mom)).select("day", zc.alias("z"))
    zz = F.col("z")
    flags = z.select(
        "day", "z",
        F.when(zz > 0, 1).otherwise(-1).alias("side"),
        F.when(F.abs(zz) > 3, 1).otherwise(0).alias("beyond3"),
        F.when(zz > 2, 1).when(zz < -2, -1).otherwise(0).alias("b2"),
        F.when(zz > 1, 1).when(zz < -1, -1).otherwise(0).alias("b1"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    cnt = lambda col, v, w: F.sum(  # noqa: E731
        F.when(F.col(col) == v, 1).otherwise(0)
    ).over(w)
    rules = flags.select(
        "day", "z",
        F.col("beyond3").alias("rule1"),
        F.when(
            (cnt("b2", 1, w3) >= 2) | (cnt("b2", -1, w3) >= 2), 1
        ).otherwise(0).alias("rule2"),
        F.when(
            (cnt("b1", 1, w5) >= 4) | (cnt("b1", -1, w5) >= 4), 1
        ).otherwise(0).alias("rule3"),
        F.when(F.abs(F.sum("side").over(w8)) == 8, 1)
        .otherwise(0)
        .alias("rule4"),
    )
    r = [F.col(f"rule{i}") for i in range(1, 5)]
    return (
        rules.filter(sum(r[1:], r[0]) > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "z",
            *[rc.cast("bigint").alias(f"rule{i + 1}") for i, rc in enumerate(r)],
        )
        .orderBy("day")
    )


# -- q_threshold_opt ---------------------------------------------------
#
# Decision-threshold optimization for the q_auc_roc / q_calibration_ece
# propensity model: for every distinct score on the eval half, the
# confusion counts of "predict purchase iff score >= t" come from ONE
# descending suffix-sum window over the <=10-row score grid, and the
# table reports TPR/FPR/precision/F1/Youden-J per threshold with
# deterministic argmax flags (metric desc, threshold desc). AUC says
# the model ranks; this picks the operating point. Counts are exact
# BIGINTs; the ratio block is the only double chain, 6-rounded.

THRESH_SPLIT = "2024-01-16"

THRESH_SQL = f"""
WITH ev AS (
  SELECT LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS vbin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(ts AS DATE) < DATE '{THRESH_SPLIT}' THEN 1 ELSE 0
           END AS is_train
  FROM events WHERE value IS NOT NULL
), model AS (
  SELECT vbin,
         CAST(round(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(8,6))
           AS score
  FROM ev WHERE is_train = 1 GROUP BY 1
), scored AS (
  SELECT m.score, e.y FROM ev e JOIN model m ON m.vbin = e.vbin
  WHERE e.is_train = 0
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
), tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS p,
         CAST(SUM(cnt - pos) AS BIGINT) AS nneg
  FROM g
), sfx AS (
  SELECT score,
         CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
         CAST(SUM(cnt - pos) OVER (ORDER BY score DESC) AS BIGINT) AS fp
  FROM g
), m2 AS (
  SELECT CAST(score AS DOUBLE) AS threshold, tp, fp,
         p - tp AS fn, nneg - fp AS tn,
         tp / CAST(p AS DOUBLE) AS tpr,
         fp / CAST(nneg AS DOUBLE) AS fpr,
         CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) END
           AS prec,
         CASE WHEN 2 * tp + fp + p - tp > 0
              THEN 2 * tp / CAST(2 * tp + fp + (p - tp) AS DOUBLE) END
           AS f1,
         tp / CAST(p AS DOUBLE) - fp / CAST(nneg AS DOUBLE) AS j
  FROM sfx CROSS JOIN tot
), flagged AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY round(j, 6) DESC, threshold DESC)
           AS rj,
         ROW_NUMBER() OVER (ORDER BY round(COALESCE(f1, -1), 6) DESC,
                            threshold DESC) AS rf
  FROM m2
)
SELECT round(threshold, 6) AS threshold, tp, fp, fn, tn,
       round(tpr, 6) AS tpr, round(fpr, 6) AS fpr,
       round(prec, 6) AS precision_, round(f1, 6) AS f1,
       round(j, 6) AS youden_j,
       CAST(CASE WHEN rj = 1 THEN 1 ELSE 0 END AS BIGINT) AS best_j,
       CAST(CASE WHEN rf = 1 THEN 1 ELSE 0 END AS BIGINT) AS best_f1
FROM flagged
ORDER BY threshold
"""


@query("q_threshold_opt", oracle=THRESH_SQL)
def q_threshold_opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ev = e.filter(F.col("value").isNotNull()).select(
        F.least(
            F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)
        ).alias("vbin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (F.to_date("ts") < F.lit(THRESH_SPLIT)).cast("int").alias("is_train"),
    )
    model = (
        ev.filter(F.col("is_train") == 1)
        .groupBy("vbin")
        .agg(
            F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 6)
            .cast("decimal(8,6)")
            .alias("score")
        )
    )
    scored = (
        ev.filter(F.col("is_train") == 0)
        .join(F.broadcast(model), "vbin")
        .select("score", "y")
    )
    g = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("nneg"),
    )
    wd = Window.orderBy(F.col("score").desc())
    sfx = g.select(
        "score",
        F.sum("pos").over(wd).cast("bigint").alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(wd).cast("bigint")
        .alias("fp"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    p, nneg = F.col("p"), F.col("nneg")
    m2 = sfx.join(F.broadcast(tot)).select(
        F.col("score").cast("double").alias("threshold"),
        tp, fp,
        (p - tp).alias("fn"),
        (nneg - fp).alias("tn"),
        (tp / p.cast("double")).alias("tpr"),
        (fp / nneg.cast("double")).alias("fpr"),
        F.when(tp + fp > 0, tp / (tp + fp).cast("double")).alias("prec"),
        F.when(
            2 * tp + fp + (p - tp) > 0,
            2 * tp / (2 * tp + fp + (p - tp)).cast("double"),
        ).alias("f1"),
        (tp / p.cast("double") - fp / nneg.cast("double")).alias("j"),
    )
    flagged = m2.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.round("j", 6).desc(), F.col("threshold").desc()))
        .alias("rj"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round(F.coalesce("f1", F.lit(-1.0)), 6).desc(),
                F.col("threshold").desc(),
            )
        )
        .alias("rf"),
    )
    return flagged.select(
        F.round("threshold", 6).alias("threshold"),
        "tp", "fp", "fn", "tn",
        F.round("tpr", 6).alias("tpr"),
        F.round("fpr", 6).alias("fpr"),
        F.round("prec", 6).alias("precision_"),
        F.round("f1", 6).alias("f1"),
        F.round("j", 6).alias("youden_j"),
        F.when(F.col("rj") == 1, 1).otherwise(0).cast("bigint")
        .alias("best_j"),
        F.when(F.col("rf") == 1, 1).otherwise(0).cast("bigint")
        .alias("best_f1"),
    ).orderBy("threshold")


# -- q_apportionment ---------------------------------------------------
#
# Largest-remainder (Hamilton) apportionment of a fixed 100-slot
# budget across nations proportional to customer counts — the exact
# integer allocation problem behind sampling quotas, shard counts and
# seat assignment, where naive rounding over- or under-shoots. Quota
# q_i = 100 * n_i / N as an exact fraction (integer 100*n_i DIV N and
# remainder 100*n_i MOD N — no floating point anywhere), floor seats
# first, the R = 100 - sum(floor) leftover seats to the R largest
# remainders (tie-break: larger nation, then name). Fully BIGINT;
# bit-identical across engines by construction.

APPORTION_SQL = """
WITH pop AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM pop),
quota AS (
  SELECT n_name, n,
         (100 * n) // nt AS fl,
         (100 * n) % nt AS rem
  FROM pop CROSS JOIN tot
), leftover AS (
  SELECT CAST(100 - SUM(fl) AS BIGINT) AS r FROM quota
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, n DESC, n_name) AS rk
  FROM quota
)
SELECT n_name, n AS n_customers,
       round(100.0 * n / nt, 6) AS quota,
       CAST(fl AS BIGINT) AS floor_seats,
       CAST(fl + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM ranked CROSS JOIN leftover CROSS JOIN tot
ORDER BY n_name
"""


@query("q_apportionment", oracle=APPORTION_SQL)
def q_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pop = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pop.agg(F.sum("n").cast("bigint").alias("nt"))
    quota = pop.join(F.broadcast(tot)).select(
        "n_name", "n", "nt",
        F.expr("(100 * n) div nt").alias("fl"),
        ((100 * F.col("n")) % F.col("nt")).alias("rem"),
    ).localCheckpoint()
    leftover = quota.agg(
        (100 - F.sum("fl")).cast("bigint").alias("r")
    )
    ranked = quota.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("rem").desc(), F.col("n").desc(), "n_name"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(leftover))
        .select(
            "n_name",
            F.col("n").alias("n_customers"),
            F.round(100.0 * F.col("n") / F.col("nt"), 6).alias("quota"),
            F.col("fl").cast("bigint").alias("floor_seats"),
            (
                F.col("fl")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("seats"),
        )
        .orderBy("n_name")
    )


# -- q_ndr -------------------------------------------------------------
#
# Net and gross dollar retention per year-pair: of the customers who
# spent in year t, how much of that revenue base returns in t+1
# (GRR caps each customer at last year's level — pure shrinkage;
# NDR lets expansion offset churn), with the expanded / contracted /
# churned customer split — the SaaS revenue-quality metrics that
# q_growth_accounting's new/resurrected/churned counts price in
# dollars. Per-customer yearly spends are exact decimal folds;
# min() caps stay in decimal; the two ratios are the only doubles.

NDR_SQL = """
WITH yearly AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) AS yr,
         o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM orders GROUP BY 1, 2
), pair AS (
  SELECT a.yr AS base_year, a.o_custkey, a.s AS s0,
         COALESCE(b.s, CAST(0 AS DECIMAL(28,2))) AS s1
  FROM yearly a
  LEFT JOIN yearly b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
  WHERE a.yr < (SELECT MAX(yr) FROM yearly)
), agg AS (
  SELECT base_year,
         CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(SUM(s0) AS DOUBLE) AS base_rev,
         CAST(SUM(s1) AS DOUBLE) AS next_rev,
         CAST(SUM(CASE WHEN s1 < s0 THEN s1 ELSE s0 END) AS DOUBLE)
           AS capped_rev,
         CAST(SUM(CASE WHEN s1 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS churned,
         CAST(SUM(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS BIGINT)
           AS expanded,
         CAST(SUM(CASE WHEN s1 > 0 AND s1 < s0 THEN 1 ELSE 0 END)
              AS BIGINT) AS contracted
  FROM pair GROUP BY 1
)
SELECT base_year, n_base, churned, expanded, contracted,
       round(capped_rev / base_rev, 6) AS grr,
       round(next_rev / base_rev, 6) AS ndr
FROM agg
ORDER BY base_year
"""


@query("q_ndr", oracle=NDR_SQL)
def q_ndr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    yearly = cat.orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        "o_custkey",
    ).agg(
        F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("s")
    ).localCheckpoint()
    mx = yearly.agg(F.max("yr").alias("mxyr"))
    a = yearly.select(
        F.col("yr").alias("base_year"),
        F.col("o_custkey").alias("ck"),
        F.col("s").alias("s0"),
    )
    b = yearly.select(
        F.col("yr").alias("nyr"),
        F.col("o_custkey").alias("ck2"),
        F.col("s").alias("s1"),
    )
    zero = F.lit(0).cast("decimal(28,2)")
    pair = (
        a.join(F.broadcast(mx))
        .filter(F.col("base_year") < F.col("mxyr"))
        .join(
            b,
            (F.col("ck2") == F.col("ck"))
            & (F.col("nyr") == F.col("base_year") + 1),
            "left",
        )
        .select(
            "base_year", "s0", F.coalesce("s1", zero).alias("s1")
        )
    )
    s0, s1 = F.col("s0"), F.col("s1")
    agg = pair.groupBy("base_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        F.sum(s0).cast("double").alias("base_rev"),
        F.sum(s1).cast("double").alias("next_rev"),
        F.sum(F.when(s1 < s0, s1).otherwise(s0)).cast("double")
        .alias("capped_rev"),
        F.sum(F.when(s1 == zero, 1).otherwise(0)).cast("bigint")
        .alias("churned"),
        F.sum(F.when(s1 > s0, 1).otherwise(0)).cast("bigint")
        .alias("expanded"),
        F.sum(F.when((s1 > zero) & (s1 < s0), 1).otherwise(0))
        .cast("bigint")
        .alias("contracted"),
    )
    return agg.select(
        "base_year", "n_base", "churned", "expanded", "contracted",
        F.round(F.col("capped_rev") / F.col("base_rev"), 6).alias("grr"),
        F.round(F.col("next_rev") / F.col("base_rev"), 6).alias("ndr"),
    ).orderBy("base_year")


# -- q_cohort_payback --------------------------------------------------
#
# Cohort payback period: for each monthly acquisition cohort, the
# first age (months since first order) at which cumulative revenue
# per acquired customer reaches 2x the age-0 value — the "months to
# recover acquisition spend" growth metric that LTV curves
# (q_cohort_ltv) imply but don't state. Cumulative per-cohort revenue
# is an exact decimal window fold; the threshold comparison is exact
# decimal vs decimal (age-0 value doubled exactly), so the argmin age
# is cross-engine stable; cohorts that never pay back report NULL.

PAYBACK_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(strftime(CAST(o_orderdate AS DATE), '%Y-%m'))
           AS cohort
  FROM orders GROUP BY 1
), sized AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cust FROM firsts GROUP BY 1
), rev AS (
  SELECT f.cohort,
         (CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y') AS BIGINT) * 12
          + CAST(strftime(CAST(o.o_orderdate AS DATE), '%m') AS BIGINT))
         - (CAST(substr(f.cohort, 1, 4) AS BIGINT) * 12
            + CAST(substr(f.cohort, 6, 2) AS BIGINT)) AS age,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS r
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age,
         CAST(SUM(r) OVER (PARTITION BY cohort ORDER BY age)
              AS DECIMAL(30,2)) AS cr,
         CAST(FIRST_VALUE(r) OVER (PARTITION BY cohort ORDER BY age)
              AS DECIMAL(30,2)) AS r0
  FROM rev
), pb AS (
  SELECT cohort, MIN(CASE WHEN age > 0 AND cr >= 2 * r0 THEN age END)
           AS payback_age,
         MAX(CASE WHEN age = 0 THEN CAST(r0 AS DOUBLE) END) AS m0
  FROM cum GROUP BY 1
)
SELECT pb.cohort, s.n_cust,
       round(pb.m0 / s.n_cust, 2) AS month0_rev_per_cust,
       CAST(pb.payback_age AS BIGINT) AS payback_age_months
FROM pb JOIN sized s ON s.cohort = pb.cohort
ORDER BY pb.cohort
"""


@query("q_cohort_payback", oracle=PAYBACK_SQL)
def q_cohort_payback(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    firsts = cat.orders.groupBy("o_custkey").agg(
        F.min(F.date_format(od, "yyyy-MM")).alias("cohort")
    ).localCheckpoint()
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust")
    )
    midx = F.year(od).cast("bigint") * 12 + F.month(od).cast("bigint")
    cidx = (
        F.substring("cohort", 1, 4).cast("bigint") * 12
        + F.substring("cohort", 6, 2).cast("bigint")
    )
    rev = (
        cat.orders.join(
            firsts.select(F.col("o_custkey").alias("ck"), "cohort"),
            F.col("o_custkey") == F.col("ck"),
        )
        .groupBy("cohort", (midx - cidx).alias("age"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("r"))
    )
    wc = Window.partitionBy("cohort").orderBy("age")
    cum = rev.select(
        "cohort", "age",
        F.sum("r").over(wc).cast("decimal(30,2)").alias("cr"),
        F.first("r").over(wc).cast("decimal(30,2)").alias("r0"),
    )
    pb = cum.groupBy("cohort").agg(
        F.min(
            F.when(
                (F.col("age") > 0) & (F.col("cr") >= 2 * F.col("r0")),
                F.col("age"),
            )
        ).alias("payback_age"),
        F.max(
            F.when(F.col("age") == 0, F.col("r0").cast("double"))
        ).alias("m0"),
    )
    return (
        pb.join(sized, "cohort")
        .select(
            "cohort", "n_cust",
            F.round(F.col("m0") / F.col("n_cust"), 2)
            .alias("month0_rev_per_cust"),
            F.col("payback_age").cast("bigint")
            .alias("payback_age_months"),
        )
        .orderBy("cohort")
    )


# -- q_topsis ----------------------------------------------------------
#
# Entropy-weighted TOPSIS supplier ranking: three criteria per
# supplier (total revenue BENEFIT, mean order->ship lead time COST,
# return-rate COST) are min-max normalized with exact min/max window
# constants, weighted by the Shannon-entropy objective-weighting
# scheme (criteria that DIFFERENTIATE suppliers get more weight),
# and scored by TOPSIS closeness d-/(d+ + d-) to the ideal /
# anti-ideal points — the MCDM decision table absent from every
# single-metric supplier view (q_top_suppliers ranks by one column).
# Entropy/distance terms are 9-rounded decimal folds; ranking breaks
# ties on supplier key. Top 20 reported.

TOPSIS_SQL = """
WITH crit AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DOUBLE) AS rev,
         CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE))) AS DOUBLE)
           / COUNT(*) AS lead,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           / CAST(COUNT(*) AS DOUBLE) AS ret
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1
), mm AS (
  SELECT MIN(rev) AS rev_lo, MAX(rev) AS rev_hi,
         MIN(lead) AS lead_lo, MAX(lead) AS lead_hi,
         MIN(ret) AS ret_lo, MAX(ret) AS ret_hi,
         COUNT(*) AS k
  FROM crit
), norm AS (
  SELECT sk,
         round((rev - rev_lo) / (rev_hi - rev_lo), 9) AS v1,
         round((lead_hi - lead) / (lead_hi - lead_lo), 9) AS v2,
         round((ret_hi - ret) / (ret_hi - ret_lo), 9) AS v3
  FROM crit CROSS JOIN mm
), colsum AS (
  SELECT CAST(SUM(CAST(v1 AS DECIMAL(16,9))) AS DOUBLE) AS t1,
         CAST(SUM(CAST(v2 AS DECIMAL(16,9))) AS DOUBLE) AS t2,
         CAST(SUM(CAST(v3 AS DECIMAL(16,9))) AS DOUBLE) AS t3,
         COUNT(*) AS k
  FROM norm
), ent AS (
  SELECT
    1 + CAST(SUM(CASE WHEN v1 > 0 THEN
          CAST(round((v1 / t1) * ln(v1 / t1), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d1,
    1 + CAST(SUM(CASE WHEN v2 > 0 THEN
          CAST(round((v2 / t2) * ln(v2 / t2), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d2,
    1 + CAST(SUM(CASE WHEN v3 > 0 THEN
          CAST(round((v3 / t3) * ln(v3 / t3), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d3
  FROM norm CROSS JOIN colsum
  GROUP BY k
), w AS (
  SELECT round(d1 / (d1 + d2 + d3), 9) AS w1,
         round(d2 / (d1 + d2 + d3), 9) AS w2,
         round(d3 / (d1 + d2 + d3), 9) AS w3
  FROM ent
), scored AS (
  SELECT sk,
         sqrt(w1 * w1 * (1 - v1) * (1 - v1)
              + w2 * w2 * (1 - v2) * (1 - v2)
              + w3 * w3 * (1 - v3) * (1 - v3)) AS dplus,
         sqrt(w1 * w1 * v1 * v1 + w2 * w2 * v2 * v2
              + w3 * w3 * v3 * v3) AS dminus
  FROM norm CROSS JOIN w
), ranked AS (
  SELECT sk,
         round(dminus / (dplus + dminus), 6) AS closeness,
         ROW_NUMBER() OVER (ORDER BY round(dminus / (dplus + dminus), 6)
                            DESC, sk) AS rk
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rk, CAST(sk AS BIGINT) AS suppkey,
       closeness
FROM ranked WHERE rk <= 20
ORDER BY rk
"""


@query("q_topsis", oracle=TOPSIS_SQL)
def q_topsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    crit = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("rev"),
            (
                F.sum(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("lead"),
            (
                F.sum(
                    F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("ret"),
        )
        .localCheckpoint()
    )
    mm = crit.agg(
        F.min("rev").alias("rev_lo"), F.max("rev").alias("rev_hi"),
        F.min("lead").alias("lead_lo"), F.max("lead").alias("lead_hi"),
        F.min("ret").alias("ret_lo"), F.max("ret").alias("ret_hi"),
        F.count(F.lit(1)).alias("k"),
    )
    norm = crit.join(F.broadcast(mm)).select(
        "sk",
        F.round(
            (F.col("rev") - F.col("rev_lo"))
            / (F.col("rev_hi") - F.col("rev_lo")),
            9,
        ).alias("v1"),
        F.round(
            (F.col("lead_hi") - F.col("lead"))
            / (F.col("lead_hi") - F.col("lead_lo")),
            9,
        ).alias("v2"),
        F.round(
            (F.col("ret_hi") - F.col("ret"))
            / (F.col("ret_hi") - F.col("ret_lo")),
            9,
        ).alias("v3"),
    ).localCheckpoint()
    d9 = lambda e: F.sum(F.round(e, 9).cast("decimal(16,9)")).cast(  # noqa: E731
        "double"
    )
    colsum = norm.agg(
        F.sum(F.col("v1").cast("decimal(16,9)")).cast("double").alias("t1"),
        F.sum(F.col("v2").cast("decimal(16,9)")).cast("double").alias("t2"),
        F.sum(F.col("v3").cast("decimal(16,9)")).cast("double").alias("t3"),
        F.count(F.lit(1)).alias("k"),
    )
    def eterm(v, t):
        return F.sum(
            F.when(
                F.col(v) > 0,
                F.round(
                    (F.col(v) / F.col(t)) * F.log(F.col(v) / F.col(t)), 9
                ).cast("decimal(16,9)"),
            )
        ).cast("double")

    ent = (
        norm.join(F.broadcast(colsum))
        .groupBy("k")
        .agg(
            eterm("v1", "t1").alias("e1"),
            eterm("v2", "t2").alias("e2"),
            eterm("v3", "t3").alias("e3"),
        )
        .select(
            (1 + F.col("e1") / F.log(F.col("k").cast("double"))).alias("d1"),
            (1 + F.col("e2") / F.log(F.col("k").cast("double"))).alias("d2"),
            (1 + F.col("e3") / F.log(F.col("k").cast("double"))).alias("d3"),
        )
    )
    tot = F.col("d1") + F.col("d2") + F.col("d3")
    w = ent.select(
        F.round(F.col("d1") / tot, 9).alias("w1"),
        F.round(F.col("d2") / tot, 9).alias("w2"),
        F.round(F.col("d3") / tot, 9).alias("w3"),
    )
    v1, v2, v3 = F.col("v1"), F.col("v2"), F.col("v3")
    w1, w2, w3 = F.col("w1"), F.col("w2"), F.col("w3")
    dplus = F.sqrt(
        w1 * w1 * (1 - v1) * (1 - v1)
        + w2 * w2 * (1 - v2) * (1 - v2)
        + w3 * w3 * (1 - v3) * (1 - v3)
    )
    dminus = F.sqrt(
        w1 * w1 * v1 * v1 + w2 * w2 * v2 * v2 + w3 * w3 * v3 * v3
    )
    closeness = F.round(dminus / (dplus + dminus), 6)
    ranked = norm.join(F.broadcast(w)).select(
        "sk", closeness.alias("closeness")
    ).select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("closeness").desc(), "sk"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            F.col("sk").cast("bigint").alias("suppkey"),
            "closeness",
        )
        .orderBy("rk")
    )
