"""SURVEY §2 additions (round 6, ninth session) — statistics breadth,
second wave: categorical effect size (Cramér's V with the Bergsma
bias correction), inequality decomposition (Theil T within/between),
single-outlier testing (Grubbs), lagged incremental-information
F-testing (Granger-style), and sequential drift detection
(Page–Hinkley).

Shared determinism machinery (see registry docstring): contingency
and moment grids stay exact integers/decimals, every cross-engine
double fold rounds its per-row term to a DECIMAL first so the sum is
partition-order independent, and cumulative statistics fold exact
DECIMALS (never raw doubles) so running sums don't depend on the
window implementation's addition order (DuckDB's segment-tree
windowed SUM vs Spark's running accumulation would otherwise produce
different IEEE results on long grids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_cramers_v -------------------------------------------------------
#
# Cramér's V effect size for the nation × market-segment contingency
# table on customers (the STRENGTH companion to q_chi2_independence's
# yes/no: big-N chi² p-values saturate at 0 while V stays on a [0,1]
# scale). The full r×c grid (distinct-nation × distinct-segment cross
# join, ≤125 cells) restores structurally-absent cells, whose chi²
# contribution is exactly the expected count e. Includes the
# Bergsma (2013) bias-corrected V — the version that doesn't inflate
# on small samples. Scale: one scan → ≤125-cell grid → 1 row.

CRAMERS_SQL = """
WITH obs AS (
  SELECT c_nationkey AS r, c_mktsegment AS c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2
), rows_m AS (
  SELECT r, CAST(SUM(o) AS BIGINT) AS rs FROM obs GROUP BY 1
), cols_m AS (
  SELECT c, CAST(SUM(o) AS BIGINT) AS cs FROM obs GROUP BY 1
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
  FROM obs
), grid AS (
  SELECT rm.r, cm.c, rm.rs, cm.cs, COALESCE(ob.o, 0) AS o
  FROM rows_m rm CROSS JOIN cols_m cm
  LEFT JOIN obs ob ON ob.r = rm.r AND ob.c = cm.c
), chi AS (
  SELECT CAST(SUM(CAST(round(
           (o - rs * cs / CAST(n AS DOUBLE))
           * (o - rs * cs / CAST(n AS DOUBLE))
           / (rs * cs / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9)))
         AS DOUBLE) AS chi2
  FROM grid CROSS JOIN tot
)
SELECT n, nr AS n_rows, nc AS n_cols,
       round(chi2, 6) AS chi2,
       round(sqrt(chi2 / n / (CASE WHEN nr < nc THEN nr ELSE nc END - 1)),
             6) AS cramers_v,
       round(sqrt(
         (CASE WHEN chi2 / n - (nr - 1.0) * (nc - 1.0) / (n - 1.0) > 0
               THEN chi2 / n - (nr - 1.0) * (nc - 1.0) / (n - 1.0)
               ELSE 0 END)
         / (CASE WHEN nr - (nr - 1.0) * (nr - 1.0) / (n - 1.0)
                      < nc - (nc - 1.0) * (nc - 1.0) / (n - 1.0)
                 THEN nr - (nr - 1.0) * (nr - 1.0) / (n - 1.0)
                 ELSE nc - (nc - 1.0) * (nc - 1.0) / (n - 1.0) END - 1.0)),
         6) AS cramers_v_corrected
FROM chi CROSS JOIN tot
"""


@query("q_cramers_v", oracle=CRAMERS_SQL)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer
    obs = cust.groupBy(
        F.col("c_nationkey").alias("r"), F.col("c_mktsegment").alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    obs = obs.cache()
    rows_m = obs.groupBy("r").agg(F.sum("o").cast("bigint").alias("rs"))
    cols_m = obs.groupBy("c").agg(F.sum("o").cast("bigint").alias("cs"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("r").cast("bigint").alias("nr"),
        F.countDistinct("c").cast("bigint").alias("nc"),
    )
    # margins-cross-join grid restores absent cells (≤125 rows; the
    # cross join is margin×margin, never fact-sized)
    grid = (
        rows_m.crossJoin(F.broadcast(cols_m))
        .join(obs, ["r", "c"], "left")
        .select("r", "c", "rs", "cs", F.coalesce("o", F.lit(0)).alias("o"))
    )
    nd = F.col("n").cast("double")
    e = F.col("rs") * F.col("cs") / nd
    chi = (
        grid.join(F.broadcast(tot))
        .agg(
            F.sum(
                F.round((F.col("o") - e) * (F.col("o") - e) / e, 9)
                .cast("decimal(28,9)")
            ).cast("double").alias("chi2")
        )
    )
    phi2 = F.col("chi2") / F.col("n")
    nr, nc = F.col("nr"), F.col("nc")
    n1 = F.col("n") - F.lit(1.0)
    phi2c = F.greatest(
        phi2 - (nr - 1.0) * (nc - 1.0) / n1, F.lit(0.0)
    )
    rc = nr - (nr - 1.0) * (nr - 1.0) / n1
    cc = nc - (nc - 1.0) * (nc - 1.0) / n1
    return (
        chi.join(F.broadcast(tot))
        .select(
            "n",
            nr.alias("n_rows"),
            nc.alias("n_cols"),
            F.round(F.col("chi2"), 6).alias("chi2"),
            F.round(
                F.sqrt(phi2 / (F.least(nr, nc).cast("double") - 1.0)), 6
            ).alias("cramers_v"),
            F.round(F.sqrt(phi2c / (F.least(rc, cc) - 1.0)), 6)
            .alias("cramers_v_corrected"),
        )
    )


# -- q_theil_index -----------------------------------------------------
#
# Theil T inequality index of positive customer balances with the
# full within/between decomposition across market segments — the
# additively-decomposable inequality measure (Gini, already in
# q_gini, is not): T_total = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ), where
# s_g is the group's share of total balance. Answers "is balance
# concentration a within-segment or a between-segment phenomenon?".
# Per-row entropy terms (x/μ_g)·ln(x/μ_g) round to DECIMAL(28,9)
# before the group fold; the across-group folds (5 terms) round the
# same way for hash-stable order independence. μ's are single double
# divisions of exact decimal sums. Scale: one scan → |segments| grid.

THEIL_SQL = """
WITH v AS (
  SELECT c_mktsegment AS seg, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS x
  FROM customer WHERE c_acctbal > 0
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS s_g
  FROM v GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DECIMAL(28,2)) AS s
  FROM g
), w AS (
  SELECT v.seg,
         CAST(SUM(CAST(round(
           (x / (CAST(s_g AS DOUBLE) / n_g))
           * ln(x / (CAST(s_g AS DOUBLE) / n_g)), 9) AS DECIMAL(28,9)))
         AS DOUBLE) AS tw_sum
  FROM v JOIN g ON g.seg = v.seg
  GROUP BY 1
), per AS (
  SELECT g.seg, g.n_g,
         CAST(g.s_g AS DOUBLE) / g.n_g AS mean_g,
         CAST(g.s_g AS DOUBLE) / CAST(t.s AS DOUBLE) AS share_g,
         w.tw_sum / g.n_g AS t_g,
         (CAST(g.s_g AS DOUBLE) / g.n_g)
           / (CAST(t.s AS DOUBLE) / t.n) AS mu_ratio
  FROM g JOIN w ON w.seg = g.seg CROSS JOIN tot t
), gl AS (
  SELECT CAST(SUM(CAST(round(share_g * ln(mu_ratio), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS t_between,
         CAST(SUM(CAST(round(share_g * t_g, 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS t_within
  FROM per
)
SELECT p.seg AS segment, p.n_g AS n_cust,
       round(p.mean_g, 6) AS mean_bal,
       round(p.share_g, 6) AS income_share,
       round(p.t_g, 6) AS theil_within,
       round(g.t_between, 6) AS theil_between,
       round(g.t_within + g.t_between, 6) AS theil_total
FROM per p CROSS JOIN gl g
ORDER BY p.seg
"""


@query("q_theil_index", oracle=THEIL_SQL)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer
    v = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("x"),
    )
    v = v.cache()
    g = v.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("decimal(28,2)")
        .alias("s_g"),
    )
    g = g.cache()
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("decimal(28,2)").alias("s"),
    )
    mean_g = F.col("s_g").cast("double") / F.col("n_g")
    w = (
        v.join(F.broadcast(g), "seg")
        .groupBy("seg")
        .agg(
            F.sum(
                F.round(
                    (F.col("x") / mean_g) * F.log(F.col("x") / mean_g), 9
                ).cast("decimal(28,9)")
            ).cast("double").alias("tw_sum")
        )
    )
    per = (
        g.join(w, "seg")
        .join(F.broadcast(tot))
        .select(
            "seg", "n_g",
            mean_g.alias("mean_g"),
            (F.col("s_g").cast("double") / F.col("s").cast("double"))
            .alias("share_g"),
            (F.col("tw_sum") / F.col("n_g")).alias("t_g"),
            (mean_g / (F.col("s").cast("double") / F.col("n")))
            .alias("mu_ratio"),
        )
    )
    per = per.cache()
    glob = per.agg(
        F.sum(
            F.round(F.col("share_g") * F.log("mu_ratio"), 9)
            .cast("decimal(28,9)")
        ).cast("double").alias("t_between"),
        F.sum(
            F.round(F.col("share_g") * F.col("t_g"), 9).cast("decimal(28,9)")
        ).cast("double").alias("t_within"),
    )
    return (
        per.join(F.broadcast(glob))
        .select(
            F.col("seg").alias("segment"),
            F.col("n_g").alias("n_cust"),
            F.round("mean_g", 6).alias("mean_bal"),
            F.round("share_g", 6).alias("income_share"),
            F.round("t_g", 6).alias("theil_within"),
            F.round("t_between", 6).alias("theil_between"),
            F.round(F.col("t_within") + F.col("t_between"), 6)
            .alias("theil_total"),
        )
        .orderBy("segment")
    )


# -- q_grubbs_test -----------------------------------------------------
#
# Grubbs' maximum-normed-residual test on the per-nation mean account
# balances: is the single most extreme nation mean a statistical
# outlier among the k≈25 nation means, or within normal sampling
# variation? G_i = |m_i − m̄|/s with m̄ and s computed over the nation
# means (decimal-rounded deviation folds, k−1 denominator). The
# two-sided α=0.05 critical value is a k-indexed published-table
# lookup (k ∈ [20,30] covers any nation subset these tables produce);
# BOTH engines use the same constants, so the flag is hash-stable by
# construction. Scale: one scan → 25-row grid → 25 rows.

GRUBBS_SQL = """
WITH nm AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS s
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
), m AS (
  SELECT n_name, n_cust, CAST(s AS DOUBLE) / n_cust AS mean_bal FROM nm
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(round(mean_bal, 9) AS DECIMAL(28,9))) AS DOUBLE)
           AS sm
  FROM m
), ctr AS (
  SELECT m.n_name, m.n_cust, m.mean_bal, g.k,
         m.mean_bal - g.sm / g.k AS dev
  FROM m CROSS JOIN g
), sdev AS (
  SELECT CAST(SUM(CAST(round(dev * dev, 9) AS DECIMAL(28,9))) AS DOUBLE)
           AS ss
  FROM ctr
), scored AS (
  SELECT c.n_name, c.n_cust, c.mean_bal, c.k,
         abs(c.dev) / sqrt(s.ss / (c.k - 1)) AS gi
  FROM ctr c CROSS JOIN sdev s
), ranked AS (
  SELECT n_name, n_cust, mean_bal, k, gi,
         ROW_NUMBER() OVER (ORDER BY round(gi, 6) DESC, n_name) AS rn
  FROM scored
)
SELECT n_name, n_cust,
       round(mean_bal, 6) AS mean_bal,
       round(gi, 6) AS g_stat,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_max,
       CAST(CASE WHEN rn = 1 AND round(gi, 6) >
         CASE k WHEN 20 THEN 2.709 WHEN 21 THEN 2.733 WHEN 22 THEN 2.758
                WHEN 23 THEN 2.781 WHEN 24 THEN 2.802 WHEN 25 THEN 2.822
                WHEN 26 THEN 2.841 WHEN 27 THEN 2.859 WHEN 28 THEN 2.876
                WHEN 29 THEN 2.893 WHEN 30 THEN 2.908 ELSE 1e308 END
         THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM ranked
ORDER BY n_name
"""


@query("q_grubbs_test", oracle=GRUBBS_SQL)
def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    nm = (
        c.customer.join(
            F.broadcast(c.nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(28,2)").alias("s"),
        )
    )
    m = nm.select(
        "n_name", "n_cust",
        (F.col("s").cast("double") / F.col("n_cust")).alias("mean_bal"),
    )
    m = m.cache()
    g = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round("mean_bal", 9).cast("decimal(28,9)")).cast("double")
        .alias("sm"),
    )
    ctr = m.join(F.broadcast(g)).select(
        "n_name", "n_cust", "mean_bal", "k",
        (F.col("mean_bal") - F.col("sm") / F.col("k")).alias("dev"),
    )
    ctr = ctr.cache()
    sdev = ctr.agg(
        F.sum(F.round(F.col("dev") * F.col("dev"), 9).cast("decimal(28,9)"))
        .cast("double").alias("ss")
    )
    scored = ctr.join(F.broadcast(sdev)).select(
        "n_name", "n_cust", "mean_bal", "k",
        (F.abs("dev") / F.sqrt(F.col("ss") / (F.col("k") - 1))).alias("gi"),
    )
    # 25-row grid sort: documented bounded window
    rn = F.row_number().over(
        Window.orderBy(F.round("gi", 6).desc(), F.col("n_name"))
    )
    crit = (
        F.when(F.col("k") == 20, 2.709).when(F.col("k") == 21, 2.733)
        .when(F.col("k") == 22, 2.758).when(F.col("k") == 23, 2.781)
        .when(F.col("k") == 24, 2.802).when(F.col("k") == 25, 2.822)
        .when(F.col("k") == 26, 2.841).when(F.col("k") == 27, 2.859)
        .when(F.col("k") == 28, 2.876).when(F.col("k") == 29, 2.893)
        .when(F.col("k") == 30, 2.908).otherwise(F.lit(1e308))
    )
    return (
        scored.withColumn("rn", rn)
        .select(
            "n_name", "n_cust",
            F.round("mean_bal", 6).alias("mean_bal"),
            F.round("gi", 6).alias("g_stat"),
            F.when(F.col("rn") == 1, 1).otherwise(0).cast("bigint")
            .alias("is_max"),
            F.when((F.col("rn") == 1) & (F.round("gi", 6) > crit), 1)
            .otherwise(0).cast("bigint").alias("is_outlier"),
        )
        .orderBy("n_name")
    )


# -- q_granger_lite ----------------------------------------------------
#
# Granger-style incremental-information F-test on the daily order
# grid: does yesterday's ORDER COUNT improve today's REVENUE forecast
# beyond yesterday's revenue? Restricted model y_t ~ y_{t-1} vs
# unrestricted y_t ~ y_{t-1} + x_{t-1}; F = (SSR_r − SSR_u)/(SSR_u/
# (n−3)) against the χ²(1)≈F(1,∞) critical value 3.841 (n is
# thousands of days). All centered cross-moments fold per-day terms
# rounded to DECIMAL(38,4) (order-independent); the 2×2 normal
# equations solve in closed form. Lag = previous OBSERVED day on the
# unique-date grid (grid-sized window sort). Scale: one scan →
# |days| grid → 1 row.

GRANGER_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS rev,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), lagged AS (
  SELECT CAST(rev AS DOUBLE) AS y,
         CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE) AS yl,
         CAST(LAG(cnt) OVER (ORDER BY day) AS DOUBLE) AS xl
  FROM daily
), lr AS (
  SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL
), mn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS DECIMAL(19,2))) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(CAST(yl AS DECIMAL(19,2))) AS DECIMAL(28,2)) AS syl,
         CAST(SUM(CAST(xl AS DECIMAL(19,1)) ) AS DECIMAL(28,1)) AS sxl
  FROM lr
), dv AS (
  SELECT y - CAST(sy AS DOUBLE) / n AS dy,
         yl - CAST(syl AS DOUBLE) / n AS d1,
         xl - CAST(sxl AS DOUBLE) / n AS d2,
         n
  FROM lr CROSS JOIN mn
), mom AS (
  SELECT n,
    CAST(SUM(CAST(round(d1 * d1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s11,
    CAST(SUM(CAST(round(d1 * d2, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s12,
    CAST(SUM(CAST(round(d2 * d2, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s22,
    CAST(SUM(CAST(round(d1 * dy, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s1y,
    CAST(SUM(CAST(round(d2 * dy, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s2y,
    CAST(SUM(CAST(round(dy * dy, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM dv GROUP BY n
), fit AS (
  SELECT n, syy, syy - s1y * s1y / s11 AS ssr_r,
         (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
         (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2,
         syy - ((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12)) * s1y
             - ((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12)) * s2y
           AS ssr_u
  FROM mom
  WHERE s11 > 0 AND s11 * s22 - s12 * s12 <> 0 AND n > 3
)
SELECT n AS n_days,
       round(b1, 6) AS beta_rev_lag,
       round(b2, 6) AS beta_cnt_lag,
       round(1.0 - ssr_r / syy, 6) AS r2_restricted,
       round(1.0 - ssr_u / syy, 6) AS r2_unrestricted,
       round((ssr_r - ssr_u) / (ssr_u / (n - 3)), 6) AS f_stat,
       CAST(CASE WHEN (ssr_r - ssr_u) / (ssr_u / (n - 3)) > 3.841
                 THEN 1 ELSE 0 END AS BIGINT) AS granger_signif
FROM fit
"""


@query("q_granger_lite", oracle=GRANGER_SQL)
def q_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)").alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    w = Window.orderBy("day")  # grid-sized sort over unique days
    lr = daily.select(
        F.col("rev").cast("double").alias("y"),
        F.lag(F.col("rev")).over(w).cast("double").alias("yl"),
        F.lag(F.col("cnt")).over(w).cast("double").alias("xl"),
    ).filter(F.col("yl").isNotNull())
    lr = lr.cache()
    mn = lr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(19,2)")).cast("decimal(28,2)")
        .alias("sy"),
        F.sum(F.col("yl").cast("decimal(19,2)")).cast("decimal(28,2)")
        .alias("syl"),
        F.sum(F.col("xl").cast("decimal(19,1)")).cast("decimal(28,1)")
        .alias("sxl"),
    )
    n = F.col("n")
    dv = lr.join(F.broadcast(mn)).select(
        (F.col("y") - F.col("sy").cast("double") / n).alias("dy"),
        (F.col("yl") - F.col("syl").cast("double") / n).alias("d1"),
        (F.col("xl") - F.col("sxl").cast("double") / n).alias("d2"),
        "n",
    )

    def fold(a: str, b: str, name: str):
        return (
            F.sum(F.round(F.col(a) * F.col(b), 4).cast("decimal(38,4)"))
            .cast("double").alias(name)
        )

    mom = dv.groupBy("n").agg(
        fold("d1", "d1", "s11"), fold("d1", "d2", "s12"),
        fold("d2", "d2", "s22"), fold("d1", "dy", "s1y"),
        fold("d2", "dy", "s2y"), fold("dy", "dy", "syy"),
    )
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    ssr_r = syy - s1y * s1y / s11
    ssr_u = syy - b1 * s1y - b2 * s2y
    f_stat = (ssr_r - ssr_u) / (ssr_u / (n - 3))
    return (
        mom.filter((s11 > 0) & (det != 0) & (n > 3))
        .select(
            n.alias("n_days"),
            F.round(b1, 6).alias("beta_rev_lag"),
            F.round(b2, 6).alias("beta_cnt_lag"),
            F.round(F.lit(1.0) - ssr_r / syy, 6).alias("r2_restricted"),
            F.round(F.lit(1.0) - ssr_u / syy, 6).alias("r2_unrestricted"),
            F.round(f_stat, 6).alias("f_stat"),
            F.when(f_stat > 3.841, 1).otherwise(0).cast("bigint")
            .alias("granger_signif"),
        )
    )


# -- q_page_hinkley ----------------------------------------------------
#
# Page–Hinkley sequential drift detector on normalized daily revenue:
# z_t = rev_t / rev̄ (global mean), PH_t = Σ_{i≤t}(z_i − z̄_i − δ)
# with z̄_i the RUNNING mean, alarm when PH_t − min_{s≤t} PH_s > λ
# (δ=0.005 slack, λ=0.25 threshold on the ~1.0 z scale). The
# streaming-monitoring complement to q_cusum_control's fixed-target
# chart: PH tracks its own running mean, so it detects drifts with no
# pre-registered baseline. EVERY cumulative fold is an exact DECIMAL
# cumsum (running revenue, running term sum) — raw-double running
# sums would hash-differ across engines because DuckDB's segment-tree
# window can add in a different order than Spark's running frame.
# Scale: one scan → |days| grid → |days| rows.
#
# Decimal-headroom audit (r9): both cumsum operands are (28,x) — the
# q_rolling_beta pattern (risk.py:664) — so the running sums widen to
# (38,x) with ten digits of headroom; terms are O(1) z-scale over a
# |days| <= ~2466 SF-independent grid, so the folds peak near 1e4
# << 1e19 operand capacity, at ANY scale factor.

PH_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS rev
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(rev) AS DECIMAL(38,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily
), grid AS (
  SELECT day,
         CAST(rev AS DOUBLE) / (CAST(s AS DOUBLE) / nd) AS z,
         CAST(SUM(rev) OVER (ORDER BY day) AS DOUBLE)
           / (CAST(s AS DOUBLE) / nd)
           / ROW_NUMBER() OVER (ORDER BY day) AS zbar
  FROM daily CROSS JOIN tot
), terms AS (
  SELECT day, z,
         CAST(round(z - zbar - 0.005, 9) AS DECIMAL(28,9)) AS term
  FROM grid
), cum AS (
  SELECT day, z,
         CAST(SUM(term) OVER (ORDER BY day) AS DECIMAL(28,9)) AS ph_dec
  FROM terms
), ph AS (
  SELECT day, z,
         CAST(ph_dec AS DOUBLE) AS ph_t,
         CAST(MIN(ph_dec) OVER (ORDER BY day) AS DOUBLE) AS ph_min
  FROM cum
)
SELECT CAST(day AS VARCHAR) AS day,
       round(z, 6) AS z,
       round(ph_t, 6) AS ph,
       round(ph_min, 6) AS ph_min,
       CAST(CASE WHEN ph_t - ph_min > 0.25 THEN 1 ELSE 0 END AS BIGINT)
         AS drift
FROM ph
ORDER BY day
"""


@query("q_page_hinkley", oracle=PH_SQL)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)").alias("rev")
    )
    daily = daily.cache()
    tot = daily.agg(
        F.sum("rev").cast("decimal(38,2)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    w = Window.orderBy("day")  # grid-sized sort over unique days
    mu = F.col("s").cast("double") / F.col("nd")
    grid = daily.join(F.broadcast(tot)).select(
        "day",
        (F.col("rev").cast("double") / mu).alias("z"),
        (
            F.sum("rev").over(w).cast("double") / mu
            / F.row_number().over(w)
        ).alias("zbar"),
    )
    terms = grid.select(
        "day", "z",
        F.round(F.col("z") - F.col("zbar") - 0.005, 9).cast("decimal(28,9)")
        .alias("term"),
    )
    cum = terms.select(
        "day", "z",
        F.sum("term").over(w).cast("decimal(28,9)").alias("ph_dec"),
    )
    ph = cum.select(
        "day", "z",
        F.col("ph_dec").cast("double").alias("ph_t"),
        F.min("ph_dec").over(w).cast("double").alias("ph_min"),
    )
    return ph.select(
        F.col("day").cast("string").alias("day"),
        F.round("z", 6).alias("z"),
        F.round("ph_t", 6).alias("ph"),
        F.round("ph_min", 6).alias("ph_min"),
        F.when(F.col("ph_t") - F.col("ph_min") > 0.25, 1).otherwise(0)
        .cast("bigint").alias("drift"),
    ).orderBy("day")
