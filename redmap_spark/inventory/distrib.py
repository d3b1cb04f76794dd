"""SURVEY §2.A — distributional, inequality, spatial and demographic
analysis: segregation and concentration indexes, Lorenz-family
asymmetry, small-area estimation, standardized rates, mobility
matrices, diversity/anonymity audits, circular statistics and
count-model fits. Split out of the former stats7 grab-bag (round 7),
code unchanged. Determinism contract as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query
from redmap_spark.plans.prefix import two_phase_cumsum, two_phase_row_number


# -- q_dissimilarity_index ---------------------------------------------
#
# Residential-segregation indices applied to market segments across
# nations: Duncan dissimilarity D = 0.5*sum|a_i/A - b_i/B| between
# AUTOMOBILE and BUILDING customers, the exposure P*(A->B) and
# isolation P*(A->A) interaction indices, and the MULTIGROUP Theil
# information index H over all five segments (nation-entropy shortfall
# vs global entropy) — the standard toolkit for "is a segment
# concentrated in a few geographies". ONE scan collapses to the
# |nation x segment| grid; every share is a ratio of exact BIGINT
# counts, each |.|/ln term is 12-rounded decimal before the exact
# fold, and only the final divisions are unrounded doubles.

DISSIM_SQL = """
WITH g AS (
  SELECT n_name, c_mktsegment AS seg, COUNT(*) AS t
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), tots AS (
  SELECT SUM(t) AS tt,
         SUM(CASE WHEN seg = 'AUTOMOBILE' THEN t ELSE 0 END) AS ta,
         SUM(CASE WHEN seg = 'BUILDING' THEN t ELSE 0 END) AS tb
  FROM g
), segtot AS (
  SELECT seg, SUM(t) AS ts FROM g GROUP BY 1
), ent AS (
  SELECT CAST(SUM(CAST(round(-(ts / CAST(tt AS DOUBLE))
                             * ln(ts / CAST(tt AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS e_glob
  FROM segtot CROSS JOIN tots
), gw AS (
  SELECT n_name, seg, t,
         SUM(t) OVER (PARTITION BY n_name) AS tn_w
  FROM g
), nat AS (
  SELECT n_name, SUM(t) AS tn,
         SUM(CASE WHEN seg = 'AUTOMOBILE' THEN t ELSE 0 END) AS a,
         SUM(CASE WHEN seg = 'BUILDING' THEN t ELSE 0 END) AS b,
         CAST(SUM(CAST(round(
               -(t / CAST(tn_w AS DOUBLE))
               * ln(t / CAST(tn_w AS DOUBLE)),
               12) AS DECIMAL(16,12))) AS DOUBLE) AS e_i
  FROM gw GROUP BY 1
), terms AS (
  SELECT
    CAST(SUM(CAST(round(abs(a / CAST(ta AS DOUBLE)
                            - b / CAST(tb AS DOUBLE)), 12)
                  AS DECIMAL(16,12))) AS DOUBLE) AS d2,
    CAST(SUM(CASE WHEN a + b > 0 THEN
          CAST(round((a / CAST(ta AS DOUBLE)) * (b / CAST(a + b AS DOUBLE)),
                     12) AS DECIMAL(16,12)) END) AS DOUBLE) AS expo,
    CAST(SUM(CASE WHEN a + b > 0 THEN
          CAST(round((a / CAST(ta AS DOUBLE)) * (a / CAST(a + b AS DOUBLE)),
                     12) AS DECIMAL(16,12)) END) AS DOUBLE) AS iso,
    CAST(SUM(CAST(round(tn * (e_glob - e_i), 9) AS DECIMAL(24,9)))
         AS DOUBLE) AS h_num,
    COUNT(*) AS n_units
  FROM nat CROSS JOIN tots CROSS JOIN ent
)
SELECT CAST(n_units AS BIGINT) AS n_units,
       round(d2 / 2, 6) AS duncan_d,
       round(expo, 6) AS exposure_ab,
       round(iso, 6) AS isolation_a,
       round(h_num / (CAST(tt AS DOUBLE) * e_glob), 6) AS theil_h
FROM terms CROSS JOIN tots CROSS JOIN ent
"""


@query("q_dissimilarity_index", oracle=DISSIM_SQL)
def q_dissimilarity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    g = (
        c.customer.join(
            F.broadcast(c.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("t"))
        .localCheckpoint()
    )
    tots = g.agg(
        F.sum("t").alias("tt"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", F.col("t")).otherwise(0))
        .alias("ta"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("t")).otherwise(0))
        .alias("tb"),
    )
    segtot = g.groupBy("seg").agg(F.sum("t").alias("ts"))
    ts, tt = F.col("ts"), F.col("tt")
    ent = (
        segtot.join(F.broadcast(tots))
        .select(
            F.round(
                -(ts / tt.cast("double")) * F.log(ts / tt.cast("double")),
                12,
            )
            .cast("decimal(16,12)")
            .alias("term")
        )
        .agg(F.sum("term").cast("double").alias("e_glob"))
    )
    wn = Window.partitionBy("n_name")
    tn_w = F.sum("t").over(wn)
    nat = (
        g.select(
            "n_name", "seg", "t",
            F.round(
                -(F.col("t") / tn_w.cast("double"))
                * F.log(F.col("t") / tn_w.cast("double")),
                12,
            )
            .cast("decimal(16,12)")
            .alias("eterm"),
        )
        .groupBy("n_name")
        .agg(
            F.sum("t").alias("tn"),
            F.sum(
                F.when(F.col("seg") == "AUTOMOBILE", F.col("t")).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("seg") == "BUILDING", F.col("t")).otherwise(0)
            ).alias("b"),
            F.sum("eterm").cast("double").alias("e_i"),
        )
    )
    a, b = F.col("a"), F.col("b")
    ta, tb = F.col("ta"), F.col("tb")
    terms = (
        nat.join(F.broadcast(tots))
        .join(F.broadcast(ent))
        .agg(
            F.sum(
                F.round(
                    F.abs(
                        a / ta.cast("double") - b / tb.cast("double")
                    ),
                    12,
                ).cast("decimal(16,12)")
            )
            .cast("double")
            .alias("d2"),
            F.sum(
                F.when(
                    a + b > 0,
                    F.round(
                        (a / ta.cast("double"))
                        * (b / (a + b).cast("double")),
                        12,
                    ).cast("decimal(16,12)"),
                )
            )
            .cast("double")
            .alias("expo"),
            F.sum(
                F.when(
                    a + b > 0,
                    F.round(
                        (a / ta.cast("double"))
                        * (a / (a + b).cast("double")),
                        12,
                    ).cast("decimal(16,12)"),
                )
            )
            .cast("double")
            .alias("iso"),
            F.sum(
                F.round(
                    F.col("tn") * (F.col("e_glob") - F.col("e_i")), 9
                ).cast("decimal(24,9)")
            )
            .cast("double")
            .alias("h_num"),
            F.count(F.lit(1)).alias("n_units"),
        )
    )
    return terms.join(F.broadcast(tots)).join(F.broadcast(ent)).select(
        F.col("n_units").cast("bigint").alias("n_units"),
        F.round(F.col("d2") / 2, 6).alias("duncan_d"),
        F.round(F.col("expo"), 6).alias("exposure_ab"),
        F.round(F.col("iso"), 6).alias("isolation_a"),
        F.round(
            F.col("h_num") / (tt.cast("double") * F.col("e_glob")), 6
        ).alias("theil_h"),
    )


# -- q_location_quotient -----------------------------------------------
#
# Regional-economics concentration table: location quotient
# LQ(nation, segment) = local segment share / global segment share
# (LQ > 1 = the nation over-indexes on that segment) plus the
# per-nation Krugman specialization index K = sum_s |local share -
# global share| (0 = mirror of the world, 2 = fully specialized).
# Exact BIGINT counts from one scan; shares and LQ are identical
# double chains, 12-rounded Krugman terms folded exactly. The
# cell-level view that q_dissimilarity_index's global numbers
# summarize.

LQ_SQL = """
WITH g AS (
  SELECT n_name, c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), w AS (
  SELECT n_name, seg, c,
         SUM(c) OVER (PARTITION BY n_name) AS cn,
         SUM(c) OVER (PARTITION BY seg) AS cs,
         SUM(c) OVER () AS ct
  FROM g
), k AS (
  SELECT n_name,
         CAST(SUM(CAST(round(abs(c / CAST(cn AS DOUBLE)
                                 - cs / CAST(ct AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS krugman
  FROM w GROUP BY 1
)
SELECT w.n_name, w.seg,
       w.c AS n_customers,
       round(w.c / CAST(w.cn AS DOUBLE), 6) AS local_share,
       round(w.cs / CAST(w.ct AS DOUBLE), 6) AS global_share,
       round((w.c / CAST(w.cn AS DOUBLE))
             / (w.cs / CAST(w.ct AS DOUBLE)), 6) AS lq,
       round(k.krugman, 6) AS krugman_nation
FROM w JOIN k ON k.n_name = w.n_name
ORDER BY w.n_name, w.seg
"""


@query("q_location_quotient", oracle=LQ_SQL)
def q_location_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    g = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = g.select(
        "n_name", "seg", "c",
        F.sum("c").over(Window.partitionBy("n_name")).alias("cn"),
        F.sum("c").over(Window.partitionBy("seg")).alias("cs"),
        F.sum("c").over(
            Window.partitionBy().orderBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("ct"),
    ).localCheckpoint()
    c, cn, cs, ct = (F.col(x) for x in ["c", "cn", "cs", "ct"])
    k = (
        w.select(
            "n_name",
            F.round(
                F.abs(c / cn.cast("double") - cs / ct.cast("double")), 12
            )
            .cast("decimal(16,12)")
            .alias("t"),
        )
        .groupBy("n_name")
        .agg(F.sum("t").cast("double").alias("krugman"))
    )
    return (
        w.join(k, "n_name")
        .select(
            "n_name", "seg",
            c.alias("n_customers"),
            F.round(c / cn.cast("double"), 6).alias("local_share"),
            F.round(cs / ct.cast("double"), 6).alias("global_share"),
            F.round(
                (c / cn.cast("double")) / (cs / ct.cast("double")), 6
            ).alias("lq"),
            F.round(F.col("krugman"), 6).alias("krugman_nation"),
        )
        .orderBy("n_name", "seg")
    )


# -- q_lorenz_asymmetry ------------------------------------------------
#
# Lorenz asymmetry coefficient S = F(mu) + L(mu) per market segment on
# per-customer spend: F(mu) = share of customers at-or-below the mean,
# L(mu) = share of total spend they hold. S < 1 means inequality is
# driven by many small customers, S > 1 by a few whales — the SHAPE
# diagnostic that q_gini's single area number cannot distinguish
# (Damgaard & Weiner 2000). Spend is an exact per-customer decimal
# fold; the mean is one double; the below-mean partition compares
# exact decimals to it identically on both engines. Scale: fact scan
# -> |customers| grid -> |segments| rows.

LORENZ_ASYM_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), mu AS (
  SELECT seg, COUNT(*) AS n,
         CAST(SUM(s) AS DECIMAL(30,2)) AS tot,
         CAST(SUM(s) AS DOUBLE) / COUNT(*) AS m
  FROM spend GROUP BY 1
)
SELECT spend.seg,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       round(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN 1 ELSE 0 END)
             / CAST(MAX(n) AS DOUBLE), 6) AS f_mu,
       round(CAST(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN s
                           ELSE CAST(0 AS DECIMAL(24,2)) END) AS DOUBLE)
             / CAST(MAX(tot) AS DOUBLE), 6) AS l_mu,
       round(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN 1 ELSE 0 END)
             / CAST(MAX(n) AS DOUBLE)
             + CAST(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN s
                             ELSE CAST(0 AS DECIMAL(24,2)) END) AS DOUBLE)
               / CAST(MAX(tot) AS DOUBLE), 6) AS lorenz_s
FROM spend JOIN mu ON mu.seg = spend.seg
GROUP BY spend.seg
ORDER BY spend.seg
"""


@query("q_lorenz_asymmetry", oracle=LORENZ_ASYM_SQL)
def q_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s"))
    )
    mu = spend.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").cast("decimal(30,2)").alias("tot"),
        (F.sum("s").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    below = F.col("s").cast("double") <= F.col("m")
    zero = F.lit(0).cast("decimal(24,2)")
    j = spend.join(F.broadcast(mu), "seg")
    f_mu = F.sum(F.when(below, 1).otherwise(0)) / F.max("n").cast("double")
    l_mu = F.sum(F.when(below, F.col("s")).otherwise(zero)).cast(
        "double"
    ) / F.max("tot").cast("double")
    return (
        j.groupBy("seg")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.round(f_mu, 6).alias("f_mu"),
            F.round(l_mu, 6).alias("l_mu"),
            F.round(f_mu + l_mu, 6).alias("lorenz_s"),
        )
        .orderBy("seg")
    )


# -- q_hoover_index ----------------------------------------------------
#
# Hoover (Robin Hood) index of spend vs customer base across nations:
# H = 0.5 * sum_i |spend_share_i - customer_share_i| — the fraction of
# total revenue that would have to MOVE between nations for spend to
# mirror headcount, the most interpretable inequality number next to
# q_gini's area and q_lorenz_asymmetry's shape. Both share vectors
# come from exact counts/decimal sums; the 12-rounded |diff| terms
# fold exactly; one double finale. Also reports the largest
# over-served nation as the headline.

HOOVER_SQL = """
WITH nat AS (
  SELECT n_name,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ncust,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
                       CAST(0 AS DECIMAL(18,2))) AS DECIMAL(30,2))
           AS spend
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(ncust) AS BIGINT) AS tc,
         CAST(SUM(spend) AS DOUBLE) AS ts
  FROM nat
), terms AS (
  SELECT n_name,
         CAST(spend AS DOUBLE) / ts - ncust / CAST(tc AS DOUBLE) AS diff
  FROM nat CROSS JOIN tot
), agg AS (
  SELECT COUNT(*) AS n_units,
         CAST(SUM(CAST(round(abs(diff), 12) AS DECIMAL(16,12)))
              AS DOUBLE) AS sdiff
  FROM terms
), top AS (
  SELECT n_name, diff,
         ROW_NUMBER() OVER (ORDER BY diff DESC, n_name) AS rk
  FROM terms
)
SELECT CAST(n_units AS BIGINT) AS n_units,
       round(sdiff / 2, 6) AS hoover_index,
       (SELECT n_name FROM top WHERE rk = 1) AS most_overserved,
       (SELECT round(diff, 6) FROM top WHERE rk = 1) AS excess_share
FROM agg
"""


@query("q_hoover_index", oracle=HOOVER_SQL)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    nat = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            cat.orders.select("o_custkey", "o_totalprice"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("ncust"),
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(30,2)")
            .alias("spend"),
        )
    )
    tot = nat.agg(
        F.sum("ncust").cast("bigint").alias("tc"),
        F.sum("spend").cast("double").alias("ts"),
    )
    diff = (
        F.col("spend").cast("double") / F.col("ts")
        - F.col("ncust") / F.col("tc").cast("double")
    )
    terms = nat.join(F.broadcast(tot)).select(
        "n_name", diff.alias("diff")
    ).localCheckpoint()
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.round(F.abs("diff"), 12).cast("decimal(16,12)"))
        .cast("double")
        .alias("sdiff"),
    )
    top = (
        terms.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("diff").desc(), "n_name"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("n_name").alias("most_overserved"),
            F.round("diff", 6).alias("excess_share"),
        )
    )
    return agg.join(F.broadcast(top)).select(
        F.col("n_units").cast("bigint").alias("n_units"),
        F.round(F.col("sdiff") / 2, 6).alias("hoover_index"),
        "most_overserved",
        "excess_share",
    )


# -- q_palma -----------------------------------------------------------
#
# Palma ratio per market segment: spend share of the top 10% of
# customers divided by the share of the bottom 40% — the inequality
# number development economists now prefer to Gini because the
# middle 50% is empirically stable, so ALL the action is in the two
# tails this ratio isolates (q_gini compresses them together,
# q_lorenz_asymmetry says which tail, Palma prices the tails against
# each other). Exact rank cutoffs ceil(0.1n)/ceil(0.4n) with custkey
# ties; decimal tail sums; one double ratio.

PALMA_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
                       CAST(0 AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS s
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT seg, s,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY s DESC, c_custkey)
           AS rtop,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY s, c_custkey)
           AS rbot,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM spend
), agg AS (
  SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rtop <= CAST(ceil(0.1 * n) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DOUBLE) AS top10,
         CAST(SUM(CASE WHEN rbot <= CAST(ceil(0.4 * n) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DOUBLE) AS bot40,
         CAST(SUM(s) AS DOUBLE) AS tot
  FROM ranked GROUP BY 1
)
SELECT seg, n AS n_customers,
       round(top10 / tot, 6) AS top10_share,
       round(bot40 / tot, 6) AS bottom40_share,
       round(top10 / bot40, 6) AS palma_ratio
FROM agg
ORDER BY seg
"""


@query("q_palma", oracle=PALMA_SQL)
def q_palma(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.customer.join(
            cat.orders.select("o_custkey", "o_totalprice"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(24,2)")
            .alias("s")
        )
    )
    ws = Window.partitionBy("seg")
    ranked = spend.select(
        "seg", "s",
        F.row_number()
        .over(ws.orderBy(F.col("s").desc(), "c_custkey"))
        .alias("rtop"),
        F.row_number().over(ws.orderBy("s", "c_custkey")).alias("rbot"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    zero = F.lit(0).cast("decimal(24,2)")
    n = F.col("n")
    agg = ranked.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("nn"),
        F.sum(
            F.when(
                F.col("rtop") <= F.ceil(0.1 * n).cast("bigint"), F.col("s")
            ).otherwise(zero)
        )
        .cast("double")
        .alias("top10"),
        F.sum(
            F.when(
                F.col("rbot") <= F.ceil(0.4 * n).cast("bigint"), F.col("s")
            ).otherwise(zero)
        )
        .cast("double")
        .alias("bot40"),
        F.sum("s").cast("double").alias("tot"),
    )
    return agg.select(
        "seg",
        F.col("nn").alias("n_customers"),
        F.round(F.col("top10") / F.col("tot"), 6).alias("top10_share"),
        F.round(F.col("bot40") / F.col("tot"), 6).alias("bottom40_share"),
        F.round(F.col("top10") / F.col("bot40"), 6).alias("palma_ratio"),
    ).orderBy("seg")


# -- q_superstar_share -------------------------------------------------
#
# Superstar concentration trend: the revenue share of the top 1% of
# customers per YEAR (exact rank cutoff ceil(n/100), ties by
# custkey), with the Theil-Sen-style median of pairwise year-slope
# replaced by the simple OLS trend over the few yearly points —
# rising share = winner-take-most dynamics, the TIME dimension that
# q_gini and q_hoover_index report statically. Yearly spends are
# exact decimal folds; shares and the trend are one double chain.

SUPERSTAR_SQL = """
WITH yearly AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) AS yr,
         o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT yr, s,
         ROW_NUMBER() OVER (PARTITION BY yr ORDER BY s DESC, o_custkey)
           AS rn,
         COUNT(*) OVER (PARTITION BY yr) AS n
  FROM yearly
), shares AS (
  SELECT yr,
         CAST(SUM(CASE WHEN rn <= CAST(ceil(n / 100.0) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(28,2)) END)
              AS DOUBLE)
           / CAST(SUM(s) AS DOUBLE) AS top1_share,
         CAST(MAX(n) AS BIGINT) AS n_customers
  FROM ranked GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(yr) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(top1_share, 9) AS DECIMAL(12,9)))
              AS DOUBLE) AS sy,
         CAST(SUM(CAST(yr AS BIGINT) * yr) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(yr * top1_share, 6) AS DECIMAL(20,6)))
              AS DOUBLE) AS sxy
  FROM shares
)
SELECT s.yr AS year, s.n_customers,
       round(s.top1_share, 6) AS top1_share,
       round((m.k * m.sxy - m.sx * m.sy)
             / (m.k * m.sxx - m.sx * m.sx), 6) AS share_trend_per_year
FROM shares s CROSS JOIN mom m
ORDER BY year
"""


@query("q_superstar_share", oracle=SUPERSTAR_SQL)
def q_superstar_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    yearly = cat.orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        "o_custkey",
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("s"))
    wy = Window.partitionBy("yr")
    ranked = yearly.select(
        "yr", "s",
        F.row_number()
        .over(wy.orderBy(F.col("s").desc(), "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wy).alias("n"),
    )
    zero = F.lit(0).cast("decimal(28,2)")
    shares = ranked.groupBy("yr").agg(
        (
            F.sum(
                F.when(
                    F.col("rn")
                    <= F.ceil(F.col("n") / 100.0).cast("bigint"),
                    F.col("s"),
                ).otherwise(zero)
            ).cast("double")
            / F.sum("s").cast("double")
        ).alias("top1_share"),
        F.max("n").cast("bigint").alias("n_customers"),
    ).localCheckpoint()
    yr, sh = F.col("yr"), F.col("top1_share")
    mom = shares.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(yr).cast("double").alias("sx"),
        F.sum(F.round(sh, 9).cast("decimal(12,9)")).cast("double")
        .alias("sy"),
        F.sum(yr.cast("bigint") * yr).cast("double").alias("sxx"),
        F.sum(F.round(yr * sh, 6).cast("decimal(20,6)")).cast("double")
        .alias("sxy"),
    )
    k = F.col("k")
    trend = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        shares.join(F.broadcast(mom))
        .select(
            yr.alias("year"),
            "n_customers",
            F.round(sh, 6).alias("top1_share"),
            F.round(trend, 6).alias("share_trend_per_year"),
        )
        .orderBy("year")
    )


# -- q_whipple_index ---------------------------------------------------
#
# Whipple-style digit-preference audit on order quantities: the
# demography heaping index (share of terminal digits 0 and 5 scaled
# by 5/2 x 100; 100 = no preference, 500 = everything heaped) plus
# the full terminal-digit distribution chi-square — data-entry
# fabrication and eyeballed-measurement detection on QUANTITIES, the
# integer companion to q_round_number_bias's price-point view and
# q_benford's leading-digit law. Digits come from exact integer
# modulo; every statistic is a ratio of exact counts.

WHIPPLE_SQL = """
WITH d AS (
  SELECT CAST(CAST(l_quantity AS BIGINT) % 10 AS BIGINT) AS digit
  FROM lineitem
), cnt AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
  FROM d GROUP BY 1
), agg AS (
  SELECT MAX(n) AS n,
         CAST(SUM(CASE WHEN digit IN (0, 5) THEN c ELSE 0 END)
              AS BIGINT) AS heap,
         CAST(SUM(CAST(round((c - n / 10.0) * (c - n / 10.0)
                             / (n / 10.0), 6) AS DECIMAL(24,6)))
              AS DOUBLE) AS chi2
  FROM cnt
)
SELECT CAST(n AS BIGINT) AS n_lines,
       round(250.0 * heap / n, 4) AS whipple_index,
       round(chi2, 4) AS digit_chi2,
       CAST(CASE WHEN 250.0 * heap / n > 125 THEN 1 ELSE 0 END
            AS BIGINT) AS heaping_flag
FROM agg
"""


@query("q_whipple_index", oracle=WHIPPLE_SQL)
def q_whipple_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    d = li.select(
        (F.col("l_quantity").cast("bigint") % 10).cast("bigint")
        .alias("digit")
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cnt = (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "digit", "c", F.sum("c").over(wall).cast("bigint").alias("n")
        )
    )
    c, n = F.col("c"), F.col("n")
    chi_term = F.round(
        (c - n / 10.0) * (c - n / 10.0) / (n / 10.0), 6
    ).cast("decimal(24,6)")
    agg = cnt.agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("digit").isin(0, 5), c).otherwise(0))
        .cast("bigint")
        .alias("heap"),
        F.sum(chi_term).cast("double").alias("chi2"),
    )
    wi = 250.0 * F.col("heap") / F.col("n")
    return agg.select(
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(wi, 4).alias("whipple_index"),
        F.round("chi2", 4).alias("digit_chi2"),
        F.when(wi > 125, 1).otherwise(0).cast("bigint")
        .alias("heaping_flag"),
    )


# -- q_robust_shape ----------------------------------------------------
#
# Quantile-based robust shape panel per event type: Bowley skewness
# (Q3 + Q1 - 2*Q2)/(Q3 - Q1) and Moors kurtosis ((E7 - E5) +
# (E3 - E1))/(E6 - E2) from the octiles — bounded, outlier-immune
# counterparts of the moment skewness/kurtosis in q_stats_moments
# (one 10^9 outlier saturates a 4th moment; it moves an octile not
# at all). Octiles use the house interpolated-quantile + round
# pattern; the two ratios are single double chains.

ROBUST_SHAPE_SQL = """
WITH v AS (
  SELECT event_type, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
), q AS (
  SELECT event_type,
         round(quantile_cont(x, 0.125), 6) AS e1,
         round(quantile_cont(x, 0.25), 6) AS q1,
         round(quantile_cont(x, 0.375), 6) AS e3,
         round(quantile_cont(x, 0.5), 6) AS q2,
         round(quantile_cont(x, 0.625), 6) AS e5,
         round(quantile_cont(x, 0.75), 6) AS q3,
         round(quantile_cont(x, 0.875), 6) AS e7,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
)
SELECT event_type, n,
       round((q3 + q1 - 2 * q2) / (q3 - q1), 6) AS bowley_skew,
       round(((e7 - e5) + (e3 - e1)) / (q3 - q1), 6) AS moors_kurtosis,
       round(q3 - q1, 6) AS iqr
FROM q
ORDER BY event_type
"""


@query("q_robust_shape", oracle=ROBUST_SHAPE_SQL)
def q_robust_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("x")
    )
    qt = lambda p: F.round(F.percentile("x", F.lit(p)), 6)  # noqa: E731
    q = v.groupBy("event_type").agg(
        qt(0.125).alias("e1"),
        qt(0.25).alias("q1"),
        qt(0.375).alias("e3"),
        qt(0.5).alias("q2"),
        qt(0.625).alias("e5"),
        qt(0.75).alias("q3"),
        qt(0.875).alias("e7"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    q1, q2, q3 = F.col("q1"), F.col("q2"), F.col("q3")
    e1, e3, e5, e7 = (F.col(c) for c in ["e1", "e3", "e5", "e7"])
    return q.select(
        "event_type", "n",
        F.round((q3 + q1 - 2 * q2) / (q3 - q1), 6).alias("bowley_skew"),
        F.round(((e7 - e5) + (e3 - e1)) / (q3 - q1), 6)
        .alias("moors_kurtosis"),
        F.round(q3 - q1, 6).alias("iqr"),
    ).orderBy("event_type")


# -- q_energy_distance -------------------------------------------------
#
# Szekely energy-distance two-sample test between AUTOMOBILE and
# BUILDING per-customer spend — the E-statistic D^2 = 2E|X-Y| -
# E|X-X'| - E|Y-Y'| that detects ANY distributional difference (not
# just location like Mann-Whitney, nor max-gap like KS). The naive
# form is O(n*m) pairwise; here each double sum collapses to EXACT
# rank prefix algebra on the sorted pooled sample: within-sample
# sum|xi-xj| = 2*sum_k x_(k)*(2k-n-1), and cross-sample sum|xi-yj| =
# sum_i [x_i*(2c_i - m) + S_y - 2P_i] with c_i/P_i the cumulative
# count/sum of y-values <= x_i off ONE pooled window pass (y sorts
# before x at ties; tied pairs contribute 0 either way). Everything
# is decimal * integer-rank — exact until the three final divisions.
# T = nm/(n+m) * D^2 is the test statistic. Scale: fact scan ->
# |customers| grid -> pooled-grid windows.

ENERGY_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
  GROUP BY 1, 2
), xs AS (
  SELECT s, CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END AS is_x,
         o_custkey AS k
  FROM spend
), nn AS (
  SELECT SUM(is_x) AS n, SUM(1 - is_x) AS m,
         CAST(SUM(CASE WHEN is_x = 0 THEN s
                       ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DECIMAL(30,2)) AS sy
  FROM xs
), w2 AS (
  SELECT is_x,
         s * CAST(2 * ROW_NUMBER() OVER (PARTITION BY is_x ORDER BY s, k)
                  - COUNT(*) OVER (PARTITION BY is_x) - 1 AS BIGINT) AS t
  FROM xs
), wsum AS (
  SELECT CAST(SUM(CASE WHEN is_x = 1 THEN t END) AS DECIMAL(38,2)) AS sxx2,
         CAST(SUM(CASE WHEN is_x = 0 THEN t END) AS DECIMAL(38,2)) AS syy2
  FROM w2
), pooled AS (
  SELECT s, is_x,
         COALESCE(CAST(SUM(CASE WHEN is_x = 0 THEN 1 END) OVER
             (ORDER BY s, is_x, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT), 0) AS cy,
         COALESCE(CAST(SUM(CASE WHEN is_x = 0 THEN s END) OVER
             (ORDER BY s, is_x, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DECIMAL(30,2)), CAST(0 AS DECIMAL(30,2))) AS py
  FROM xs
), xonly AS (
  SELECT CAST(SUM(s * CAST(2 * cy AS BIGINT)) AS DECIMAL(38,2)) AS s2cy,
         CAST(SUM(s) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(2 AS BIGINT) * py) AS DECIMAL(38,2)) AS s2py
  FROM pooled WHERE is_x = 1
), fin AS (
  SELECT n, m,
         CAST(s2cy AS DOUBLE) - CAST(sx AS DOUBLE) * m
           + n * CAST(sy AS DOUBLE) - CAST(s2py AS DOUBLE) AS sxy,
         CAST(sxx2 AS DOUBLE) AS sxx2, CAST(syy2 AS DOUBLE) AS syy2
  FROM xonly CROSS JOIN nn CROSS JOIN wsum
)
SELECT CAST(n AS BIGINT) AS n_x, CAST(m AS BIGINT) AS n_y,
       round(sxy / (n * CAST(m AS DOUBLE)), 4) AS e_xy,
       round(sxx2 / (n * CAST(n AS DOUBLE)), 4) AS e_xx,
       round(syy2 / (m * CAST(m AS DOUBLE)), 4) AS e_yy,
       round(2 * sxy / (n * CAST(m AS DOUBLE))
             - sxx2 / (n * CAST(n AS DOUBLE))
             - syy2 / (m * CAST(m AS DOUBLE)), 4) AS energy_d2,
       round((n * CAST(m AS DOUBLE) / (n + m))
             * (2 * sxy / (n * CAST(m AS DOUBLE))
                - sxx2 / (n * CAST(n AS DOUBLE))
                - syy2 / (m * CAST(m AS DOUBLE))), 4) AS t_stat
FROM fin
"""


@query("q_energy_distance", oracle=ENERGY_SQL)
def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.orders.join(
            F.broadcast(
                cat.customer.filter(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
                ).select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s"))
    )
    xs = spend.select(
        "s",
        F.when(F.col("seg") == "AUTOMOBILE", 1).otherwise(0).alias("is_x"),
        F.col("o_custkey").alias("k"),
    ).localCheckpoint()
    zero2 = F.lit(0).cast("decimal(24,2)")
    nn = xs.agg(
        F.sum("is_x").alias("n"),
        F.sum(1 - F.col("is_x")).alias("m"),
        F.sum(F.when(F.col("is_x") == 0, F.col("s")).otherwise(zero2))
        .cast("decimal(30,2)")
        .alias("sy"),
    )
    # r11 (x4 third-scale sweep): the per-sample rank and the pooled
    # cumulative count/sum are |customers|-grid frames — 24k rows
    # through one executor at sf0.4, OOM shapes at SF100. All three
    # run as two-phase prefix kernels over a floor(s/4096) bucket
    # grid (per-customer spend domain is SF-independent, ~1.2k
    # buckets); is_x rides the bucket high bits for the rank so the
    # (is_x, s, k) order stays bucket-aligned. Exact integer/decimal
    # algebra regroups losslessly — oracle hash unchanged.
    sbucket = F.floor(F.col("s") / 4096).cast("bigint")
    ranked = two_phase_row_number(
        xs, ["is_x", "s", "k"],
        (F.col("is_x").cast("bigint") * 1048576 + sbucket),
        out="rn",
    )
    mm = F.broadcast(nn.select(
        F.col("n").alias("n_"), F.col("m").alias("m_")
    ))
    grp_n = F.when(F.col("is_x") == 1, F.col("n_")).otherwise(F.col("m_"))
    k_within = F.col("rn") - F.col("is_x").cast("bigint") * F.col("m_")
    t = F.col("s") * (2 * k_within - grp_n - 1).cast("bigint")
    w2 = ranked.join(mm).select("is_x", t.alias("t"))
    wsum = w2.agg(
        F.sum(F.when(F.col("is_x") == 1, F.col("t")))
        .cast("decimal(38,2)")
        .alias("sxx2"),
        F.sum(F.when(F.col("is_x") == 0, F.col("t")))
        .cast("decimal(38,2)")
        .alias("syy2"),
    )
    pooled = two_phase_cumsum(
        two_phase_cumsum(
            xs,
            ["s", "is_x", "k"],
            F.when(F.col("is_x") == 0, 1).otherwise(0).cast("bigint"),
            sbucket,
            out="cy",
        ),
        ["s", "is_x", "k"],
        F.when(F.col("is_x") == 0, F.col("s"))
        .otherwise(F.lit(0).cast("decimal(24,2)")),
        sbucket,
        out="py_raw",
    ).select(
        "s", "is_x", "cy",
        F.col("py_raw").cast("decimal(30,2)").alias("py"),
    )
    xonly = pooled.filter(F.col("is_x") == 1).agg(
        F.sum(F.col("s") * (2 * F.col("cy")).cast("bigint"))
        .cast("decimal(38,2)")
        .alias("s2cy"),
        F.sum("s").cast("decimal(38,2)").alias("sx"),
        F.sum(F.lit(2).cast("bigint") * F.col("py"))
        .cast("decimal(38,2)")
        .alias("s2py"),
    )
    n, m = F.col("n"), F.col("m")
    j = xonly.join(F.broadcast(nn)).join(F.broadcast(wsum))
    sxy = (
        F.col("s2cy").cast("double")
        - F.col("sx").cast("double") * m
        + n * F.col("sy").cast("double")
        - F.col("s2py").cast("double")
    )
    e_xy = sxy / (n * m.cast("double"))
    e_xx = F.col("sxx2").cast("double") / (n * n.cast("double"))
    e_yy = F.col("syy2").cast("double") / (m * m.cast("double"))
    d2 = 2 * e_xy - e_xx - e_yy
    return j.select(
        n.cast("bigint").alias("n_x"),
        m.cast("bigint").alias("n_y"),
        F.round(e_xy, 4).alias("e_xy"),
        F.round(e_xx, 4).alias("e_xx"),
        F.round(e_yy, 4).alias("e_yy"),
        F.round(d2, 4).alias("energy_d2"),
        F.round((n * m.cast("double") / (n + m)) * d2, 4).alias("t_stat"),
    )


# -- q_clumpiness ------------------------------------------------------
#
# Purchase-timing clumpiness per segment (Zhang-Bradlow-Small RFMC):
# for each customer with >= 3 orders, the normalized inter-event gaps
# x_i (including the boundary gaps to the observation window edges)
# give H = 1 + sum x ln x / ln(n+1), 0 = perfectly regular, 1 = one
# burst — the C that upgrades RFM to RFMC because two customers with
# identical frequency can be steady subscribers or one-weekend
# bingers. Gaps are exact day integers normalized by the window; the
# x ln x terms are 9-rounded decimals folded per customer; segment
# rows report the mean and the clumpy (H > 0.5) share.

CLUMPY_SQL = """
WITH mx AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS w0,
                   MAX(CAST(o_orderdate AS DATE)) AS w1 FROM orders),
ev AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d
  FROM orders
), gaps AS (
  SELECT o_custkey,
         date_diff('day', COALESCE(LAG(d) OVER w, w0), d) + 1 AS g,
         COUNT(*) OVER (PARTITION BY o_custkey) AS k,
         w1, w0, d,
         ROW_NUMBER() OVER w AS rn
  FROM ev CROSS JOIN mx
  WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
), withend AS (
  SELECT o_custkey, g, k FROM gaps
  UNION ALL
  SELECT o_custkey, date_diff('day', d, w1) + 1 AS g, k
  FROM gaps WHERE rn = k
), tot AS (
  SELECT o_custkey, MAX(k) AS k, CAST(SUM(g) AS BIGINT) AS tg
  FROM withend GROUP BY 1
), h AS (
  SELECT w.o_custkey, t.k,
         1 + CAST(SUM(CAST(round((w.g / CAST(t.tg AS DOUBLE))
                                 * ln(w.g / CAST(t.tg AS DOUBLE)), 9)
                           AS DECIMAL(16,9))) AS DOUBLE)
             / ln(t.k + 1.0) AS hc
  FROM withend w JOIN tot t ON t.o_custkey = w.o_custkey
  WHERE t.k >= 3
  GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment AS segment, h.hc
  FROM h JOIN customer ON c_custkey = o_custkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(CAST(round(hc, 9) AS DECIMAL(14,9))) AS DOUBLE)
             / COUNT(*), 6) AS mean_clumpiness,
       round(SUM(CASE WHEN hc > 0.5 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS clumpy_share
FROM seg
GROUP BY segment
ORDER BY segment
"""


@query("q_clumpiness", oracle=CLUMPY_SQL)
def q_clumpiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("w0"),
        F.max(F.col("o_orderdate").cast("date")).alias("w1"),
    )
    ev = cat.orders.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    wp = Window.partitionBy("o_custkey")
    gaps = ev.join(F.broadcast(mx)).select(
        "o_custkey",
        (
            F.datediff(
                F.col("d"), F.coalesce(F.lag("d").over(w), F.col("w0"))
            )
            + 1
        ).alias("g"),
        F.count(F.lit(1)).over(wp).alias("k"),
        "w1", "d",
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint()
    withend = gaps.select("o_custkey", "g", "k").union(
        gaps.filter(F.col("rn") == F.col("k")).select(
            "o_custkey",
            (F.datediff("w1", "d") + 1).alias("g"),
            "k",
        )
    )
    tot = withend.groupBy("o_custkey").agg(
        F.max("k").alias("k"), F.sum("g").cast("bigint").alias("tg")
    )
    j = withend.select(F.col("o_custkey").alias("ck"), "g").join(
        tot.filter(F.col("k") >= 3), F.col("ck") == F.col("o_custkey")
    )
    x = F.col("g") / F.col("tg").cast("double")
    term = F.round(x * F.log(x), 9).cast("decimal(16,9)")
    h = j.groupBy("o_custkey", "k").agg(
        (
            1
            + F.sum(term).cast("double") / F.log(F.col("k") + 1.0)
        ).alias("hc")
    )
    seg = h.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), "hc")
    n = F.count(F.lit(1))
    return (
        seg.groupBy("segment")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.round("hc", 9).cast("decimal(14,9)")).cast("double")
                / n,
                6,
            ).alias("mean_clumpiness"),
            F.round(
                F.sum(F.when(F.col("hc") > 0.5, 1).otherwise(0))
                / n.cast("double"),
                6,
            ).alias("clumpy_share"),
        )
        .orderBy("segment")
    )


# -- q_discovery_curve -------------------------------------------------
#
# Assortment discovery curve: for each order size m, the OBSERVED
# mean number of distinct brands per order vs the EXPECTED value
# under independent draws from the global brand mix, E[S_m] =
# sum_b (1 - (1 - p_b)^m) — observed below expected means baskets
# are brand-loyal within an order (substitutes cluster), above means
# deliberate variety-seeking; the coupon-collector lens on basket
# composition beside q_market_basket's pair lifts. Brand shares are
# exact count ratios; the (1-p)^m powers are 9-rounded decimal terms
# folded over the bounded |brands| x |size grid| cross.

DISCOVERY_SQL = """
WITH lines AS (
  SELECT l_orderkey AS ok, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), per_order AS (
  SELECT ok, COUNT(*) AS m, COUNT(DISTINCT p_brand) AS s
  FROM lines GROUP BY 1
), obs AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_distinct
  FROM per_order WHERE m <= 7 GROUP BY 1
), shares AS (
  SELECT p_brand, COUNT(*) AS c,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS t
  FROM lines GROUP BY 1
), expct AS (
  SELECT o.m,
         CAST(SUM(CAST(round(1 - pow(1 - c / CAST(t AS DOUBLE), o.m), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS e_s
  FROM shares CROSS JOIN (SELECT DISTINCT m FROM obs) o
  GROUP BY 1
)
SELECT obs.m AS order_size, obs.n_orders,
       round(obs.mean_distinct, 6) AS observed_distinct,
       round(e.e_s, 6) AS expected_distinct,
       round(obs.mean_distinct - e.e_s, 6) + 0.0 AS variety_gap
FROM obs JOIN expct e ON e.m = obs.m
ORDER BY order_size
"""


@query("q_discovery_curve", oracle=DISCOVERY_SQL)
def q_discovery_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lines = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(F.col("l_orderkey").alias("ok"), "p_brand").localCheckpoint()
    per_order = lines.groupBy("ok").agg(
        F.count(F.lit(1)).alias("m"),
        F.countDistinct("p_brand").alias("s"),
    )
    obs = (
        per_order.filter(F.col("m") <= 7)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            (F.sum("s").cast("double") / F.count(F.lit(1)))
            .alias("mean_distinct"),
        )
        .localCheckpoint()
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = (
        lines.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("p_brand", "c", F.sum("c").over(wall).cast("bigint").alias("t"))
    )
    sizes = obs.select("m").distinct()
    term = F.round(
        1 - F.pow(1 - F.col("c") / F.col("t").cast("double"), F.col("m")),
        9,
    ).cast("decimal(16,9)")
    expct = (
        shares.crossJoin(F.broadcast(sizes))
        .groupBy("m")
        .agg(F.sum(term).cast("double").alias("e_s"))
    )
    return (
        obs.join(expct, "m")
        .select(
            F.col("m").alias("order_size"),
            "n_orders",
            F.round("mean_distinct", 6).alias("observed_distinct"),
            F.round("e_s", 6).alias("expected_distinct"),
            (F.round(F.col("mean_distinct") - F.col("e_s"), 6) + 0.0)
            .alias("variety_gap"),
        )
        .orderBy("order_size")
    )


# -- q_circular_stats --------------------------------------------------
#
# Directional statistics of the hour-of-day profile per event type:
# each timestamp maps to an angle theta = 2*pi*(us-in-day)/86400e6, and
# ONE groupBy accumulates 12-rounded cos/sin terms as exact decimal
# sums (order-independent), giving the circular mean hour
# atan2(S,C) -> [0,24), the resultant length Rbar (0 = uniform,
# 1 = a single spike), circular variance, and the Rayleigh uniformity
# test z = n*Rbar^2 with the small-sample-corrected p-value. The
# directional complement to q_calendar_heatmap's bin counts. Scale:
# map-side partial aggregation straight to |types| rows.

CIRC_SQL = """
WITH pts AS (
  SELECT event_type,
         2 * pi() * ((epoch_us(ts) % 86400000000) / 86400000000.0)
           AS theta
  FROM events
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(cos(theta), 12) AS DECIMAL(14,12)))
              AS DECIMAL(38,12)) AS cs,
         CAST(SUM(CAST(round(sin(theta), 12) AS DECIMAL(14,12)))
              AS DECIMAL(38,12)) AS sn
  FROM pts GROUP BY 1
), r AS (
  SELECT event_type, n, CAST(cs AS DOUBLE) AS c, CAST(sn AS DOUBLE) AS s,
         sqrt(CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
              + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)) / n AS rbar
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(((atan2(s, c) + 2 * pi()) % (2 * pi())) / (2 * pi()) * 24, 4)
         AS mean_hour,
       round(rbar, 6) AS resultant,
       round(1 - rbar, 6) AS circ_variance,
       round(n * rbar * rbar, 6) AS rayleigh_z,
       round(exp(-n * rbar * rbar)
             * (1 + (2 * n * rbar * rbar
                     - n * rbar * rbar * n * rbar * rbar) / (4 * n)), 6)
         AS rayleigh_p
FROM r
ORDER BY event_type
"""


@query("q_circular_stats", oracle=CIRC_SQL)
def q_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    theta = (
        2
        * 3.141592653589793
        * ((F.unix_micros(F.col("ts")) % 86400000000) / 86400000000.0)
    )
    agg = (
        e.select("event_type", theta.alias("theta"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.cos("theta"), 12).cast("decimal(14,12)"))
            .cast("decimal(38,12)")
            .alias("cs"),
            F.sum(F.round(F.sin("theta"), 12).cast("decimal(14,12)"))
            .cast("decimal(38,12)")
            .alias("sn"),
        )
    )
    c, s = F.col("cs").cast("double"), F.col("sn").cast("double")
    n = F.col("n")
    rbar = F.sqrt(c * c + s * s) / n
    two_pi = F.lit(2 * 3.141592653589793)
    z = n * rbar * rbar
    return (
        agg.select(
            "event_type",
            n.cast("bigint").alias("n"),
            F.round(
                ((F.atan2(s, c) + two_pi) % two_pi) / two_pi * 24, 4
            ).alias("mean_hour"),
            F.round(rbar, 6).alias("resultant"),
            F.round(1 - rbar, 6).alias("circ_variance"),
            F.round(z, 6).alias("rayleigh_z"),
            F.round(
                F.exp(-z) * (1 + (2 * z - z * z) / (4 * n)), 6
            ).alias("rayleigh_p"),
        )
        .orderBy("event_type")
    )


# -- q_zt_poisson ------------------------------------------------------
#
# Zero-truncated Poisson fit of per-customer yearly order counts (we
# only observe customers who ordered at least once): the truncated
# mean identity m = lambda / (1 - exp(-lambda)) is solved by THREE
# unrolled fixed-point steps lambda <- m * (1 - exp(-lambda))
# (6-rounded per step so both engines branch identically), giving the
# implied zero-class share exp(-lambda) and the implied TOTAL market
# size N_obs / (1 - exp(-lambda)) — the "how many customers exist
# that we never see" estimate that q_capture_recapture answers with
# two lists and this answers with one truncated count distribution.

ZTP_SQL = """
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY 1
), m AS (
  SELECT COUNT(*) AS n_obs,
         CAST(SUM(k) AS DOUBLE) / COUNT(*) AS m
  FROM k
), l1 AS (SELECT n_obs, m, round(m * (1 - exp(-m)), 6) AS l FROM m),
l2 AS (SELECT n_obs, m, round(m * (1 - exp(-l)), 6) AS l FROM l1),
l3 AS (SELECT n_obs, m, round(m * (1 - exp(-l)), 6) AS l FROM l2)
SELECT CAST(n_obs AS BIGINT) AS n_observed,
       round(m, 6) AS truncated_mean,
       l AS lambda,
       round(exp(-l), 6) AS implied_zero_share,
       round(n_obs / (1 - exp(-l)), 2) AS implied_total_market
FROM l3
"""


@query("q_zt_poisson", oracle=ZTP_SQL)
def q_zt_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    k = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    m = k.agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    mm = F.col("m")
    l1 = m.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-mm)), 6).alias("l")
    )
    l2 = l1.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-F.col("l"))), 6).alias("l")
    )
    l3 = l2.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-F.col("l"))), 6).alias("l")
    )
    lam = F.col("l")
    return l3.select(
        F.col("n_obs").cast("bigint").alias("n_observed"),
        F.round(mm, 6).alias("truncated_mean"),
        lam.alias("lambda"),
        F.round(F.exp(-lam), 6).alias("implied_zero_share"),
        F.round(F.col("n_obs") / (1 - F.exp(-lam)), 2)
        .alias("implied_total_market"),
    )


# -- q_eb_poisson ------------------------------------------------------
#
# Gamma-Poisson empirical-Bayes shrinkage of per-customer yearly
# order RATES within each nation: method-of-moments gamma prior
# (alpha, beta) from the cross-customer mean and variance of raw
# rates (variance minus mean/exposure-bar = the between-customer
# component), posterior rate = (alpha + k_i-bar...) reported at the
# NATION level as prior strength and the shrinkage applied to a
# reference customer with 1 order — the count-data sibling of
# q_eb_binomial (rates with exposure, not proportions). Moments are
# 9-rounded decimal folds; degenerate nations (variance <= mean
# noise floor) report NULL prior (documented: no shrinkage basis).

EBPOIS_SQL = """
WITH span AS (
  SELECT (date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                    MAX(CAST(o_orderdate AS DATE))) + 1) / 365.25 AS yrs
  FROM orders
), k AS (
  SELECT c_nationkey, c_custkey, COUNT(o_orderkey) AS k
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_nationkey,
         CAST(round(k / yrs, 9) AS DECIMAL(16,9)) AS rate
  FROM k CROSS JOIN span
), mom AS (
  SELECT c_nationkey, COUNT(*) AS n,
         CAST(SUM(rate) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(CAST(rate AS DOUBLE) * CAST(rate AS DOUBLE),
                             9) AS DECIMAL(24,9))) AS DOUBLE) AS s2,
         MAX((SELECT yrs FROM span)) AS yrs
  FROM r GROUP BY 1
), fit AS (
  SELECT c_nationkey, n, s1 / n AS m,
         (s2 - s1 * s1 / n) / (n - 1) - (s1 / n) / yrs AS v_between,
         yrs
  FROM mom
), prior AS (
  SELECT n_name, n, m,
         CASE WHEN v_between > 0 THEN m * m / v_between END AS alpha,
         CASE WHEN v_between > 0 THEN m / v_between END AS beta
  FROM fit JOIN nation ON n_nationkey = c_nationkey
)
SELECT n_name, CAST(n AS BIGINT) AS n_customers,
       round(m, 6) AS mean_rate,
       round(alpha, 6) AS prior_alpha,
       round(beta, 6) AS prior_beta,
       round((alpha + 1) / (beta + 7.0), 6) AS posterior_rate_one_order
FROM prior
ORDER BY n_name
"""


@query("q_eb_poisson", oracle=EBPOIS_SQL)
def q_eb_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    span = cat.orders.agg(
        ((F.datediff(F.max(od), F.min(od)) + 1) / 365.25).alias("yrs")
    )
    k = (
        cat.customer.join(
            cat.orders.select("o_custkey", "o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count("o_orderkey").alias("k"))
    )
    r = k.join(F.broadcast(span)).select(
        "c_nationkey",
        F.round(F.col("k") / F.col("yrs"), 9)
        .cast("decimal(16,9)")
        .alias("rate"),
        "yrs",
    )
    rated = F.col("rate").cast("double")
    mom = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rate").cast("double").alias("s1"),
        F.sum(F.round(rated * rated, 9).cast("decimal(24,9)"))
        .cast("double")
        .alias("s2"),
        F.max("yrs").alias("yrs"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    v_between = (
        (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
        - m / F.col("yrs")
    )
    fit = mom.select(
        "c_nationkey", n.alias("n"), m.alias("m"),
        v_between.alias("v_between"),
    )
    alpha = F.when(
        F.col("v_between") > 0, F.col("m") * F.col("m") / F.col("v_between")
    )
    beta = F.when(
        F.col("v_between") > 0, F.col("m") / F.col("v_between")
    )
    prior = fit.join(
        F.broadcast(cat.nation.select("n_nationkey", "n_name")),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select(
        "n_name", "n", "m", alpha.alias("alpha"), beta.alias("beta")
    )
    return prior.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round("m", 6).alias("mean_rate"),
        F.round("alpha", 6).alias("prior_alpha"),
        F.round("beta", 6).alias("prior_beta"),
        F.round(
            (F.col("alpha") + 1) / (F.col("beta") + 7.0), 6
        ).alias("posterior_rate_one_order"),
    ).orderBy("n_name")


# -- q_smr_indirect ----------------------------------------------------
#
# Indirectly standardized morbidity ratio per nation: expected
# F-status orders from the GLOBAL priority-specific rates applied to
# each nation's priority mix, SMR = observed/expected with the Byar
# approximation 95% CI — the epidemiology answer to "is this nation's
# failure rate high, or does it just have a risky order mix", i.e.
# the standardization q_simpsons_detector flags the need for.
# Stratum counts are exact BIGINTs; expected counts are 9-rounded
# decimal folds; the Byar cube-root chain is one identical double
# expression.

SMR_SQL = """
WITH strat AS (
  SELECT n_name, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), grates AS (
  SELECT pri, SUM(d) / CAST(SUM(n) AS DOUBLE) AS rate
  FROM strat GROUP BY 1
), nat AS (
  SELECT s.n_name,
         CAST(SUM(s.d) AS BIGINT) AS obs,
         CAST(SUM(CAST(round(s.n * g.rate, 9) AS DECIMAL(20,9)))
              AS DOUBLE) AS exp_
  FROM strat s JOIN grates g ON g.pri = s.pri
  GROUP BY 1
)
SELECT n_name, obs AS observed, round(exp_, 4) AS expected,
       round(obs / exp_, 6) AS smr,
       round((obs * pow(1 - 1.0 / (9 * obs)
                        - 1.96 / (3 * sqrt(CAST(obs AS DOUBLE))), 3))
             / exp_, 6) AS smr_ci_lo,
       round(((obs + 1) * pow(1 - 1.0 / (9 * (obs + 1))
                              + 1.96 / (3 * sqrt(obs + 1.0)), 3))
             / exp_, 6) AS smr_ci_hi
FROM nat
ORDER BY n_name
"""


@query("q_smr_indirect", oracle=SMR_SQL)
def q_smr_indirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    strat = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()
    )
    glob = strat.groupBy("pri").agg(
        (F.sum("d") / F.sum("n").cast("double")).alias("rate")
    )
    nat = (
        strat.join(F.broadcast(glob), "pri")
        .groupBy("n_name")
        .agg(
            F.sum("d").cast("bigint").alias("obs"),
            F.sum(
                F.round(F.col("n") * F.col("rate"), 9).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("exp_"),
        )
    )
    obs, exp_ = F.col("obs"), F.col("exp_")
    lo = (
        obs
        * F.pow(
            1 - 1.0 / (9 * obs) - 1.96 / (3 * F.sqrt(obs.cast("double"))),
            3,
        )
    ) / exp_
    hi = (
        (obs + 1)
        * F.pow(
            1 - 1.0 / (9 * (obs + 1)) + 1.96 / (3 * F.sqrt(obs + 1.0)),
            3,
        )
    ) / exp_
    return nat.select(
        "n_name",
        obs.alias("observed"),
        F.round(exp_, 4).alias("expected"),
        F.round(obs / exp_, 6).alias("smr"),
        F.round(lo, 6).alias("smr_ci_lo"),
        F.round(hi, 6).alias("smr_ci_hi"),
    ).orderBy("n_name")


# -- q_direct_standardization ------------------------------------------
#
# DIRECT standardization companion to q_smr_indirect: each nation's
# priority-specific F-status rates are applied to the GLOBAL priority
# mix (the "standard population"), yielding the rate the nation WOULD
# show with an average order mix — comparable across nations where
# crude rates are not, and the converse adjustment to SMR's indirect
# form. Stratum weights w_s = global n_s / N; DSR = sum w_s * r_{i,s}
# over 9-rounded decimal terms; strata the nation never sees
# contribute their weight times zero (documented, matches the epi
# convention of treating unobserved strata as rate 0 only when truly
# absent — here every nation has all five priorities at tested SFs).

DSTD_SQL = """
WITH strat AS (
  SELECT n_name, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), std AS (
  SELECT pri, CAST(SUM(n) AS BIGINT) AS ns,
         CAST(SUM(SUM(n)) OVER () AS BIGINT) AS nt
  FROM strat GROUP BY 1
), dsr AS (
  SELECT s.n_name,
         CAST(SUM(s.d) AS BIGINT) AS obs,
         CAST(SUM(s.n) AS BIGINT) AS n,
         CAST(SUM(CAST(round((CAST(t.ns AS DOUBLE) / t.nt)
                             * (s.d / CAST(s.n AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS rate_std
  FROM strat s JOIN std t ON t.pri = s.pri
  GROUP BY 1
)
SELECT n_name,
       round(obs / CAST(n AS DOUBLE), 6) AS crude_rate,
       round(rate_std, 6) AS standardized_rate,
       round(rate_std - obs / CAST(n AS DOUBLE), 6) AS mix_effect
FROM dsr
ORDER BY n_name
"""


@query("q_direct_standardization", oracle=DSTD_SQL)
def q_direct_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    strat = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    std = (
        strat.groupBy("pri")
        .agg(F.sum("n").cast("bigint").alias("ns"))
        .select("pri", "ns", F.sum("ns").over(wall).cast("bigint").alias("nt"))
    )
    term = F.round(
        (F.col("ns").cast("double") / F.col("nt"))
        * (F.col("d") / F.col("n").cast("double")),
        9,
    ).cast("decimal(16,9)")
    dsr = (
        strat.join(F.broadcast(std), "pri")
        .groupBy("n_name")
        .agg(
            F.sum("d").cast("bigint").alias("obs"),
            F.sum("n").cast("bigint").alias("n"),
            F.sum(term).cast("double").alias("rate_std"),
        )
    )
    crude = F.col("obs") / F.col("n").cast("double")
    return dsr.select(
        "n_name",
        F.round(crude, 6).alias("crude_rate"),
        F.round(F.col("rate_std"), 6).alias("standardized_rate"),
        F.round(F.col("rate_std") - crude, 6).alias("mix_effect"),
    ).orderBy("n_name")


# -- q_fh_smallarea ----------------------------------------------------
#
# Fay-Herriot small-area estimation of per-customer spend by nation:
# the direct survey estimate ybar_i (sampling variance v_i = s_i^2 /
# n_i) is shrunk toward a synthetic regression on mean account
# balance, with gamma_i = tau2/(tau2 + v_i) and a simplified
# Prasad-Rao moment tau2 = max(0, mean residual^2 - mean v) — small
# nations borrow strength from the model, big nations keep their
# data. This is the named survey-statistics layer ABOVE
# q_james_stein's equal-variance shrinkage: heteroscedastic, with a
# covariate. Domain moments are exact decimal folds; the two-stage
# algebra runs on the 25-row grid with 9-rounded terms.

FH_SQL = """
WITH cust AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS ab
  FROM customer
), spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders GROUP BY 1
), dom AS (
  SELECT n_name, COUNT(*) AS n,
         CAST(SUM(COALESCE(s, CAST(0 AS DECIMAL(24,2))))
              AS DECIMAL(30,2)) AS s1,
         CAST(SUM(COALESCE(s, CAST(0 AS DECIMAL(24,2)))
                  * COALESCE(s, CAST(0 AS DECIMAL(24,2))))
              AS DECIMAL(38,4)) AS s2,
         CAST(SUM(ab) AS DECIMAL(28,2)) AS sab
  FROM cust
  LEFT JOIN spend ON o_custkey = c_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1
), direct AS (
  SELECT n_name, n,
         CAST(s1 AS DOUBLE) / n AS ybar,
         ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
          / (n - 1)) / n AS v,
         CAST(sab AS DOUBLE) / n AS x
  FROM dom
), ols AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(round(x, 9) AS DECIMAL(24,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(ybar, 9) AS DECIMAL(24,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(round(x * ybar, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sv
  FROM direct
), beta AS (
  SELECT k, sv,
         (k * sxy - sx * sy) / (k * sxx - sx * sx) AS b,
         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k AS a
  FROM ols
), tau AS (
  SELECT k, a, b,
         GREATEST(
           CAST(SUM(CAST(round((ybar - a - b * x) * (ybar - a - b * x), 6)
                         AS DECIMAL(28,6))) AS DOUBLE) / (k - 2)
           - sv / k, 0.0) AS tau2
  FROM direct CROSS JOIN beta
  GROUP BY k, a, b, sv
)
SELECT d.n_name, CAST(d.n AS BIGINT) AS n_customers,
       round(d.ybar, 4) AS direct_est,
       round(t.a + t.b * d.x, 4) AS synthetic_est,
       round(t.tau2 / (t.tau2 + d.v), 6) AS gamma,
       round((t.tau2 / (t.tau2 + d.v)) * d.ybar
             + (1 - t.tau2 / (t.tau2 + d.v)) * (t.a + t.b * d.x), 4)
         AS fh_estimate
FROM direct d CROSS JOIN tau t
ORDER BY d.n_name
"""


@query("q_fh_smallarea", oracle=FH_SQL)
def q_fh_smallarea(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    zero = F.lit(0).cast("decimal(24,2)")
    spend = cat.orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s")
    )
    s = F.coalesce("s", zero)
    dom = (
        cat.customer.join(
            spend, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s).cast("decimal(30,2)").alias("s1"),
            F.sum(s * s).cast("decimal(38,4)").alias("s2"),
            F.sum(dec("c_acctbal")).cast("decimal(28,2)").alias("sab"),
        )
    )
    n = F.col("n")
    direct = dom.select(
        "n_name", "n",
        (F.col("s1").cast("double") / n).alias("ybar"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / n
            )
            / (n - 1)
            / n
        ).alias("v"),
        (F.col("sab").cast("double") / n).alias("x"),
    ).localCheckpoint()
    x, ybar, v = F.col("x"), F.col("ybar"), F.col("v")
    ols = direct.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(x, 9).cast("decimal(24,9)")).cast("double")
        .alias("sx"),
        F.sum(F.round(ybar, 9).cast("decimal(24,9)")).cast("double")
        .alias("sy"),
        F.sum(F.round(x * x, 6).cast("decimal(28,6)")).cast("double")
        .alias("sxx"),
        F.sum(F.round(x * ybar, 6).cast("decimal(28,6)")).cast("double")
        .alias("sxy"),
        F.sum(F.round(v, 6).cast("decimal(28,6)")).cast("double")
        .alias("sv"),
    )
    k = F.col("k")
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    beta = ols.select(
        "k", "sv",
        slope.alias("b"),
        ((F.col("sy") - slope * F.col("sx")) / k).alias("a"),
    )
    res = ybar - F.col("a") - F.col("b") * x
    tau = (
        direct.join(F.broadcast(beta))
        .groupBy("k", "a", "b", "sv")
        .agg(
            F.greatest(
                F.sum(F.round(res * res, 6).cast("decimal(28,6)"))
                .cast("double")
                / (F.col("k") - 2)
                - F.col("sv") / F.col("k"),
                F.lit(0.0),
            ).alias("tau2")
        )
    )
    g = F.col("tau2") / (F.col("tau2") + v)
    synth = F.col("a") + F.col("b") * x
    return (
        direct.join(F.broadcast(tau))
        .select(
            "n_name",
            n.cast("bigint").alias("n_customers"),
            F.round(ybar, 4).alias("direct_est"),
            F.round(synth, 4).alias("synthetic_est"),
            F.round(g, 6).alias("gamma"),
            F.round(g * ybar + (1 - g) * synth, 4).alias("fh_estimate"),
        )
        .orderBy("n_name")
    )


# -- q_l_diversity -----------------------------------------------------
#
# l-diversity and t-closeness audit over the (nation, segment)
# quasi-identifier classes with order priority as the sensitive
# attribute: per class the distinct-sensitive count l, the entropy
# l-diversity exp(H(class)), and t-closeness as the 1-D earth-mover
# distance between the class's priority distribution and the global
# one (EMD = mean |cumulative share gap| over the ordered categories)
# — the two named refinements that close the re-identification gaps
# q_kanonymity's size-only check leaves (a large class that is 100%
# URGENT still leaks). Counts exact; entropy/EMD terms are 9-rounded
# decimal folds.

LDIV_SQL = """
WITH cells AS (
  SELECT n_name, c_mktsegment AS seg, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3
), cls AS (
  SELECT n_name, seg, SUM(c) AS n FROM cells GROUP BY 1, 2
), gdist AS (
  SELECT pri, SUM(c) AS g,
         SUM(SUM(c)) OVER () AS gt
  FROM cells GROUP BY 1
), grid AS (
  SELECT cl.n_name, cl.seg, g.pri, cl.n, g.g, g.gt,
         COALESCE(ce.c, 0) AS c
  FROM cls cl CROSS JOIN gdist g
  LEFT JOIN cells ce ON ce.n_name = cl.n_name AND ce.seg = cl.seg
                    AND ce.pri = g.pri
), cums AS (
  SELECT *,
         SUM(c) OVER (PARTITION BY n_name, seg ORDER BY pri) AS cc,
         SUM(g) OVER (PARTITION BY n_name, seg ORDER BY pri) AS cg
  FROM grid
), agg2 AS (
  SELECT n_name, seg, n,
         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS l,
         CAST(SUM(CASE WHEN c > 0 THEN
               CAST(round(-(c / CAST(n AS DOUBLE))
                          * ln(c / CAST(n AS DOUBLE)), 9)
                    AS DECIMAL(16,9)) END) AS DOUBLE) AS h,
         CAST(SUM(CAST(round(abs(cc / CAST(n AS DOUBLE)
                                 - cg / CAST(gt AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) / COUNT(*) AS t
  FROM cums GROUP BY n_name, seg, n, gt
)
SELECT n_name, seg, CAST(n AS BIGINT) AS class_size,
       l AS l_distinct,
       round(exp(h), 6) AS entropy_l,
       round(t, 6) AS t_closeness,
       CAST(CASE WHEN l < 3 OR round(t, 6) > 0.2 THEN 1 ELSE 0 END
            AS BIGINT) AS flagged
FROM agg2
ORDER BY n_name, seg
"""


@query("q_l_diversity", oracle=LDIV_SQL)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cells = (
        cat.orders.join(
            F.broadcast(
                cat.customer.select(
                    "c_custkey", "c_nationkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    cls = cells.groupBy("n_name", "seg").agg(F.sum("c").alias("n"))
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    glob = (
        cells.groupBy("pri")
        .agg(F.sum("c").alias("g"))
        .select("pri", "g", F.sum("g").over(wall).alias("gt"))
    )
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .join(cells, ["n_name", "seg", "pri"], "left")
        .select(
            "n_name", "seg", "pri", "n", "g", "gt",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wc = Window.partitionBy("n_name", "seg").orderBy("pri")
    cums = grid.select(
        "*",
        F.sum("c").over(wc).alias("cc"),
        F.sum("g").over(wc).alias("cg"),
    )
    c, n, gt = F.col("c"), F.col("n"), F.col("gt")
    hterm = F.when(
        c > 0,
        F.round(
            -(c / n.cast("double")) * F.log(c / n.cast("double")), 9
        ).cast("decimal(16,9)"),
    )
    tterm = F.round(
        F.abs(
            F.col("cc") / n.cast("double") - F.col("cg") / gt.cast("double")
        ),
        9,
    ).cast("decimal(16,9)")
    agg2 = cums.groupBy("n_name", "seg", "n", "gt").agg(
        F.sum(F.when(c > 0, 1).otherwise(0)).cast("bigint").alias("l"),
        F.sum(hterm).cast("double").alias("h"),
        (F.sum(tterm).cast("double") / F.count(F.lit(1))).alias("t"),
    )
    return agg2.select(
        "n_name", "seg",
        n.cast("bigint").alias("class_size"),
        F.col("l").alias("l_distinct"),
        F.round(F.exp("h"), 6).alias("entropy_l"),
        F.round("t", 6).alias("t_closeness"),
        F.when((F.col("l") < 3) | (F.round("t", 6) > 0.2), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("flagged"),
    ).orderBy("n_name", "seg")


# -- q_mover_stayer ----------------------------------------------------
#
# Blumen mover-stayer model on customers' spend-half state (above /
# below the period median) across three consecutive 2-year periods:
# a share s of "stayers" never leaves their state while movers follow
# a Markov chain with persistence p, identified in closed form from
# the one- and two-step diagonal shares P1 = s + (1-s)p and
# P2 = s + (1-s)p^2 (so p = (P2 - P1)/(P1 - 1) + 1 ... solved as
# p = (P2 - P1)/(P1 - 1) + 1 simplified below, s from back-
# substitution) — the classic heterogeneity correction showing a
# single Markov chain OVERSTATES mobility (q_markov_stationary's
# implicit assumption). Diagonal shares are exact counts over the
# median-split states; the closed-form solve is one double chain.

MOVER_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
per AS (
  SELECT o_custkey,
         CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), dmax)
                    / 730.0) AS BIGINT) AS back,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders CROSS JOIN mx
), spend AS (
  SELECT o_custkey, 2 - back AS period,
         CAST(SUM(x) AS DECIMAL(28,2)) AS s
  FROM per WHERE back <= 2 GROUP BY 1, 2
), med AS (
  SELECT period,
         round(quantile_cont(CAST(s AS DOUBLE), 0.5), 2) AS m
  FROM spend GROUP BY 1
), st AS (
  SELECT spend.o_custkey, spend.period,
         CASE WHEN CAST(s AS DOUBLE) > m THEN 1 ELSE 0 END AS hi
  FROM spend JOIN med ON med.period = spend.period
), wide AS (
  SELECT o_custkey,
         MAX(CASE WHEN period = 0 THEN hi END) AS s0,
         MAX(CASE WHEN period = 1 THEN hi END) AS s1,
         MAX(CASE WHEN period = 2 THEN hi END) AS s2
  FROM st GROUP BY 1
), c AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN s0 = s1 THEN 1 ELSE 0 END) AS BIGINT) AS d1a,
         CAST(SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS d1b,
         CAST(SUM(CASE WHEN s0 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM wide
  WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
), f AS (
  SELECT n,
         (d1a + d1b) / (2.0 * n) AS p1,
         d2 / CAST(n AS DOUBLE) AS p2
  FROM c
), solved AS (
  SELECT n, p1, p2,
         CASE WHEN p1 < 1 THEN (p2 - p1) / (p1 - 1) + 1 END AS pm
  FROM f
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(p1, 6) AS one_step_stay,
       round(p2, 6) AS two_step_stay,
       round(pm, 6) AS mover_persistence,
       round(CASE WHEN pm < 1 THEN (p1 - pm) / (1 - pm) END, 6)
         AS stayer_share
FROM solved
"""


@query("q_mover_stayer", oracle=MOVER_SQL)
def q_mover_stayer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax")
    )
    per = cat.orders.join(F.broadcast(mx)).select(
        "o_custkey",
        F.floor(
            F.datediff("dmax", F.col("o_orderdate").cast("date")) / 730.0
        )
        .cast("bigint")
        .alias("back"),
        dec("o_totalprice").alias("x"),
    )
    spend = (
        per.filter(F.col("back") <= 2)
        .groupBy("o_custkey", (2 - F.col("back")).alias("period"))
        .agg(F.sum("x").cast("decimal(28,2)").alias("s"))
    )
    med = spend.groupBy("period").agg(
        F.round(F.percentile(F.col("s").cast("double"), F.lit(0.5)), 2)
        .alias("m")
    )
    st = spend.join(F.broadcast(med), "period").select(
        "o_custkey", "period",
        F.when(F.col("s").cast("double") > F.col("m"), 1)
        .otherwise(0)
        .alias("hi"),
    )
    wide = st.groupBy("o_custkey").agg(
        F.max(F.when(F.col("period") == 0, F.col("hi"))).alias("s0"),
        F.max(F.when(F.col("period") == 1, F.col("hi"))).alias("s1"),
        F.max(F.when(F.col("period") == 2, F.col("hi"))).alias("s2"),
    )
    s0, s1, s2 = F.col("s0"), F.col("s1"), F.col("s2")
    c = wide.filter(
        s0.isNotNull() & s1.isNotNull() & s2.isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(s0 == s1, 1).otherwise(0)).cast("bigint").alias("d1a"),
        F.sum(F.when(s1 == s2, 1).otherwise(0)).cast("bigint").alias("d1b"),
        F.sum(F.when(s0 == s2, 1).otherwise(0)).cast("bigint").alias("d2"),
    )
    n = F.col("n")
    p1 = (F.col("d1a") + F.col("d1b")) / (2.0 * n)
    p2 = F.col("d2") / n.cast("double")
    f = c.select(n, p1.alias("p1"), p2.alias("p2"))
    pm = F.when(
        F.col("p1") < 1, (F.col("p2") - F.col("p1")) / (F.col("p1") - 1) + 1
    )
    solved = f.select("n", "p1", "p2", pm.alias("pm"))
    return solved.select(
        n.cast("bigint").alias("n_customers"),
        F.round("p1", 6).alias("one_step_stay"),
        F.round("p2", 6).alias("two_step_stay"),
        F.round("pm", 6).alias("mover_persistence"),
        F.round(
            F.when(
                F.col("pm") < 1,
                (F.col("p1") - F.col("pm")) / (1 - F.col("pm")),
            ),
            6,
        ).alias("stayer_share"),
    )


# -- q_shorrocks_mobility ----------------------------------------------
#
# Shorrocks mobility index of the customer spend-quintile transition
# matrix between the two data halves: M = (K - trace(P)) / (K - 1),
# where P's rows are the empirical quintile-to-quintile transition
# shares — 0 = a caste system (everyone stays), 1 = perfect mobility
# — the single-number summary of the matrix q_decile_transitions
# tabulates and q_mover_stayer decomposes. Quintiles are exact rank
# cuts (ceil(5r/n), ties by custkey); trace shares are exact count
# ratios; one double finale.

SHORROCKS_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax,
                   MIN(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
spend AS (
  SELECT o_custkey,
         CASE WHEN CAST(o_orderdate AS DATE)
                   < dmin + CAST((dmax - dmin) // 2 AS INTEGER)
              THEN 0 ELSE 1 END AS half,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders CROSS JOIN mx
), tot AS (
  SELECT o_custkey, half, CAST(SUM(x) AS DECIMAL(28,2)) AS s
  FROM spend GROUP BY 1, 2
), q AS (
  SELECT o_custkey, half,
         CAST(ceil(5.0 * ROW_NUMBER() OVER
                (PARTITION BY half ORDER BY s, o_custkey)
              / COUNT(*) OVER (PARTITION BY half)) AS BIGINT) AS quint
  FROM tot
), pair AS (
  SELECT a.quint AS q0, b.quint AS q1
  FROM q a JOIN q b ON b.o_custkey = a.o_custkey
  WHERE a.half = 0 AND b.half = 1
), rows_ AS (
  SELECT q0, COUNT(*) AS n,
         CAST(SUM(CASE WHEN q1 = q0 THEN 1 ELSE 0 END) AS BIGINT)
           AS stay
  FROM pair GROUP BY 1
), tr AS (
  SELECT CAST(SUM(CAST(round(stay / CAST(n AS DOUBLE), 9)
                       AS DECIMAL(12,9))) AS DOUBLE) AS trace_,
         COUNT(*) AS k,
         CAST(SUM(n) AS BIGINT) AS n_customers
  FROM rows_
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS k_states,
       round(trace_, 6) AS trace_p,
       round((k - trace_) / (k - 1.0), 6) AS shorrocks_m
FROM tr
"""


@query("q_shorrocks_mobility", oracle=SHORROCKS_SQL)
def q_shorrocks_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax"),
        F.min(F.col("o_orderdate").cast("date")).alias("dmin"),
    )
    half = F.when(
        F.col("o_orderdate").cast("date")
        < F.expr("dmin + CAST(datediff(dmax, dmin) div 2 AS INT)"),
        0,
    ).otherwise(1)
    tot = (
        cat.orders.join(F.broadcast(mx))
        .groupBy("o_custkey", half.alias("half"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("s"))
    )
    wh = Window.partitionBy("half")
    q = tot.select(
        "o_custkey", "half",
        F.ceil(
            5.0
            * F.row_number().over(wh.orderBy("s", "o_custkey"))
            / F.count(F.lit(1)).over(wh)
        )
        .cast("bigint")
        .alias("quint"),
    ).localCheckpoint()
    a = q.filter(F.col("half") == 0).select(
        F.col("o_custkey").alias("ck"), F.col("quint").alias("q0")
    )
    b = q.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck2"), F.col("quint").alias("q1")
    )
    pair = a.join(b, F.col("ck") == F.col("ck2")).select("q0", "q1")
    rows_ = pair.groupBy("q0").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("q1") == F.col("q0"), 1).otherwise(0))
        .cast("bigint")
        .alias("stay"),
    )
    tr = rows_.agg(
        F.sum(
            F.round(F.col("stay") / F.col("n").cast("double"), 9).cast(
                "decimal(12,9)"
            )
        )
        .cast("double")
        .alias("trace_"),
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("n_customers"),
    )
    k = F.col("k")
    return tr.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        k.cast("bigint").alias("k_states"),
        F.round("trace_", 6).alias("trace_p"),
        F.round((k - F.col("trace_")) / (k - 1.0), 6)
        .alias("shorrocks_m"),
    )


# -- q_double_jeopardy -------------------------------------------------
#
# Ehrenberg's double-jeopardy law across brands: small brands suffer
# twice — fewer buyers (penetration b) AND lighter buyers (purchase
# frequency w) — so w regressed on ln(b) across the brand portfolio
# should slope UP; a flat/negative slope marks a niche-brand anomaly
# worth a positioning look. Reports per-portfolio the correlation,
# the w-on-ln(b) slope, and the flagship marketing-science check
# beside q_share_of_wallet (within-customer) and q_bcg_matrix
# (share-vs-growth). Penetration and frequency are exact count
# ratios; the fit is the house moment chain over 9-rounded pairs.

DJ_SQL = """
WITH buyers AS (
  SELECT p_brand, o_custkey, COUNT(*) AS k
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM customer),
brand AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_buyers,
         CAST(SUM(k) AS BIGINT) AS n_purchases
  FROM buyers GROUP BY 1
), xy AS (
  SELECT p_brand,
         CAST(round(ln(n_buyers / CAST(nc AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS x,
         CAST(round(n_purchases / CAST(n_buyers AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS y
  FROM brand CROSS JOIN tot
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_brands,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS penetration_loyalty_corr,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS w_on_lnb_slope,
       CAST(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS double_jeopardy_holds
FROM mom
"""


@query("q_double_jeopardy", oracle=DJ_SQL)
def q_double_jeopardy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    buyers = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tot = cat.customer.agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    brand = buyers.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        F.sum("k").cast("bigint").alias("n_purchases"),
    )
    xy = brand.join(F.broadcast(tot)).select(
        F.round(
            F.log(F.col("n_buyers") / F.col("nc").cast("double")), 9
        )
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(
            F.col("n_purchases") / F.col("n_buyers").cast("double"), 9
        )
        .cast("decimal(18,9)")
        .alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(28,9)")
    ).cast("double")
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
        r9(yd * yd).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return mom.select(
        n.cast("bigint").alias("n_brands"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("penetration_loyalty_corr"),
        F.round(slope, 6).alias("w_on_lnb_slope"),
        F.when(slope > 0, 1).otherwise(0).cast("bigint")
        .alias("double_jeopardy_holds"),
    )


# -- q_brand_switching -------------------------------------------------
#
# Brand loyalty / switching table: each customer's FAVORITE brand
# (most lines, ties to lexicographically smaller brand) in the two
# halves of the data, then per brand the retention share (kept it as
# favorite), the churn-to leader (most common destination brand), and
# the inflow share — the brand-level transition summary on top of
# q_decile_transitions' spend-state machinery. Favorites are exact
# count argmax with deterministic ties; all rates are exact-count
# ratios.

SWITCH_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax,
                   MIN(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
lines AS (
  SELECT o_custkey, p_brand,
         CASE WHEN CAST(o_orderdate AS DATE)
                   < dmin + CAST((dmax - dmin) // 2 AS INTEGER)
              THEN 0 ELSE 1 END AS half
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  CROSS JOIN mx
), cnt AS (
  SELECT o_custkey, half, p_brand, COUNT(*) AS c
  FROM lines GROUP BY 1, 2, 3
), fav AS (
  SELECT o_custkey, half, p_brand,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, half
                            ORDER BY c DESC, p_brand) AS rk
  FROM cnt
), wide AS (
  SELECT a.o_custkey, a.p_brand AS b0, b.p_brand AS b1
  FROM fav a JOIN fav b ON b.o_custkey = a.o_custkey
  WHERE a.half = 0 AND b.half = 1 AND a.rk = 1 AND b.rk = 1
), per AS (
  SELECT b0, COUNT(*) AS n,
         CAST(SUM(CASE WHEN b1 = b0 THEN 1 ELSE 0 END) AS BIGINT)
           AS kept
  FROM wide GROUP BY 1
), dest AS (
  SELECT b0, b1, COUNT(*) AS c,
         ROW_NUMBER() OVER (PARTITION BY b0
                            ORDER BY COUNT(*) DESC, b1) AS rk
  FROM wide WHERE b1 <> b0 GROUP BY 1, 2
)
SELECT per.b0 AS brand,
       CAST(per.n AS BIGINT) AS n_customers,
       round(per.kept / CAST(per.n AS DOUBLE), 6) AS loyalty_rate,
       d.b1 AS top_destination,
       round(d.c / CAST(per.n AS DOUBLE), 6) AS top_destination_share
FROM per LEFT JOIN dest d ON d.b0 = per.b0 AND d.rk = 1
ORDER BY brand
"""


@query("q_brand_switching", oracle=SWITCH_SQL)
def q_brand_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax"),
        F.min(F.col("o_orderdate").cast("date")).alias("dmin"),
    )
    half = F.when(
        F.col("o_orderdate").cast("date")
        < F.expr("dmin + CAST(datediff(dmax, dmin) div 2 AS INT)"),
        0,
    ).otherwise(1)
    lines = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(mx))
        .select("o_custkey", "p_brand", half.alias("half"))
    )
    cnt = lines.groupBy("o_custkey", "half", "p_brand").agg(
        F.count(F.lit(1)).alias("c")
    )
    fav = cnt.select(
        "o_custkey", "half", "p_brand",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey", "half").orderBy(
                F.col("c").desc(), "p_brand"
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") == 1).localCheckpoint()
    a = fav.filter(F.col("half") == 0).select(
        F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b0")
    )
    b = fav.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck2"), F.col("p_brand").alias("b1")
    )
    wide = a.join(b, F.col("ck") == F.col("ck2")).select("b0", "b1")
    per = wide.groupBy("b0").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("b1") == F.col("b0"), 1).otherwise(0))
        .cast("bigint")
        .alias("kept"),
    )
    dest = (
        wide.filter(F.col("b1") != F.col("b0"))
        .groupBy("b0", "b1")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "b0", "b1", "c",
            F.row_number()
            .over(
                Window.partitionBy("b0").orderBy(F.col("c").desc(), "b1")
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    return (
        per.join(
            dest.select(
                F.col("b0").alias("db0"),
                F.col("b1").alias("top_destination"),
                F.col("c").alias("dc"),
            ),
            F.col("db0") == F.col("b0"),
            "left",
        )
        .select(
            F.col("b0").alias("brand"),
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(F.col("kept") / F.col("n").cast("double"), 6)
            .alias("loyalty_rate"),
            "top_destination",
            F.round(F.col("dc") / F.col("n").cast("double"), 6)
            .alias("top_destination_share"),
        )
        .orderBy("brand")
    )
