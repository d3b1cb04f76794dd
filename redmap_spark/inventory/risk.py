"""SURVEY §2.A — financial risk, volatility and insurance reserving:
VaR/ES backtesting (Kupiec, Christoffersen), rolling beta/Sharpe
panels, illiquidity and variance-ratio diagnostics, covariance
shrinkage, drawdown-family risk measures, EVT tails and chain-ladder
reserving. Split out of the former stats7 grab-bag (round 7), code
unchanged. Determinism contract as registry.py: exact decimal folds,
identical double chains on both engines, rounded outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query, spread


# -- q_var_backtest ----------------------------------------------------
#
# VaR backtesting with the Kupiec proportion-of-failures test: a
# rolling parametric 95% VaR (trailing 60-day mean - 1.645 * std of
# daily revenue log-changes) is scored against the NEXT day's actual
# change, violations are counted, and the Kupiec LR_pof = -2 ln of
# the binomial likelihood ratio says whether the violation rate is
# consistent with 5% — the Basel-style model-validation loop over
# q_var_cvar's static estimate. Rolling moments are exact decimal
# window folds (9-rounded log-changes); the VaR/LR chain is identical
# double algebra. Output: one summary row (days, violations, rate,
# kupiec LR, reject flag at chi2_1 95% = 3.841).

VARBT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), chg AS (
  SELECT day,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS r
  FROM daily
), roll AS (
  SELECT day, r,
         CAST(COUNT(r) OVER w AS BIGINT) AS n60,
         CAST(SUM(r) OVER w AS DECIMAL(28,9)) AS s1,
         CAST(SUM(CAST(r * r AS DECIMAL(28,9))) OVER w
              AS DECIMAL(38,9)) AS s2
  FROM chg
  WINDOW w AS (ORDER BY day ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT day, CAST(r AS DOUBLE) AS r,
         CAST(s1 AS DOUBLE) / n60
           - 1.645 * sqrt((CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n60)
                          / (n60 - 1)) AS var95
  FROM roll WHERE n60 >= 60 AND r IS NOT NULL
), agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN r < var95 THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM scored
)
SELECT CAST(n AS BIGINT) AS n_days, x AS violations,
       round(x / CAST(n AS DOUBLE), 6) AS violation_rate,
       round(-2 * ((n - x) * ln(0.95) + x * ln(0.05)
                   - (n - x) * ln(1 - x / CAST(n AS DOUBLE))
                   - x * ln(x / CAST(n AS DOUBLE))), 6) AS kupiec_lr,
       CAST(CASE WHEN -2 * ((n - x) * ln(0.95) + x * ln(0.05)
                            - (n - x) * ln(1 - x / CAST(n AS DOUBLE))
                            - x * ln(x / CAST(n AS DOUBLE))) > 3.841
            THEN 1 ELSE 0 END AS BIGINT) AS reject_model
FROM agg
"""


@query("q_var_backtest", oracle=VARBT_SQL)
def q_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    wd = Window.orderBy("day")
    chg = daily.select(
        "day",
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(wd).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("r"),
    )
    wroll = wd.rowsBetween(-60, -1)
    roll = chg.select(
        "day", "r",
        F.count("r").over(wroll).cast("bigint").alias("n60"),
        F.sum("r").over(wroll).cast("decimal(28,9)").alias("s1"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(28,9)"))
        .over(wroll)
        .cast("decimal(38,9)")
        .alias("s2"),
    )
    n60 = F.col("n60")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    var95 = s1 / n60 - 1.645 * F.sqrt(
        (s2 - s1 * s1 / n60) / (n60 - 1)
    )
    scored = roll.filter((n60 >= 60) & F.col("r").isNotNull()).select(
        F.col("r").cast("double").alias("r"), var95.alias("var95")
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("r") < F.col("var95"), 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    n, x = F.col("n"), F.col("x")
    lr = -2 * (
        (n - x) * F.log(F.lit(0.95))
        + x * F.log(F.lit(0.05))
        - (n - x) * F.log(1 - x / n.cast("double"))
        - x * F.log(x / n.cast("double"))
    )
    return agg.select(
        n.cast("bigint").alias("n_days"),
        x.alias("violations"),
        F.round(x / n.cast("double"), 6).alias("violation_rate"),
        F.round(lr, 6).alias("kupiec_lr"),
        F.when(lr > 3.841, 1).otherwise(0).cast("bigint")
        .alias("reject_model"),
    )


# -- q_es_backtest -----------------------------------------------------
#
# Expected-shortfall backtest (Acerbi-Szekely Z2) companion to
# q_var_backtest: the rolling parametric 97.5% ES_t = mu - sigma *
# phi(z_.025)/.025 (normal tail mean, phi(z_.025)/.025 = 2.337803
# documented constant) is scored against realized next-day
# log-changes; Z2 = sum(r_t * I[r_t < VaR_t] / (n * alpha * ES_t)) + 1
# should sit near 0 under a correct model, < 0 when tail losses are
# understated — the FRTB-era test that replaced pure VaR counting.
# Rolling moments are the same exact decimal window folds as
# q_var_backtest; Z2 terms are 9-rounded decimals folded exactly.

ESBT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), chg AS (
  SELECT day,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS r
  FROM daily
), roll AS (
  SELECT day, r,
         CAST(COUNT(r) OVER w AS BIGINT) AS n60,
         CAST(SUM(r) OVER w AS DECIMAL(28,9)) AS s1,
         CAST(SUM(CAST(r * r AS DECIMAL(28,9))) OVER w
              AS DECIMAL(38,9)) AS s2
  FROM chg
  WINDOW w AS (ORDER BY day ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT CAST(r AS DOUBLE) AS r,
         CAST(s1 AS DOUBLE) / n60
           - 1.96 * sqrt((CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n60)
                         / (n60 - 1)) AS var_t,
         CAST(s1 AS DOUBLE) / n60
           - 2.337803 * sqrt((CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                / n60)
                             / (n60 - 1)) AS es_t
  FROM roll WHERE n60 >= 60 AND r IS NOT NULL
), terms AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN r < var_t THEN 1 ELSE 0 END) AS BIGINT)
           AS viol,
         CAST(SUM(CASE WHEN r < var_t THEN
               CAST(round(r / es_t, 9) AS DECIMAL(20,9)) END) AS DOUBLE)
           AS sz
  FROM scored
)
SELECT CAST(n AS BIGINT) AS n_days, viol AS violations,
       round(COALESCE(sz, 0) / (n * 0.025) - 1, 6) AS z2,
       CAST(CASE WHEN COALESCE(sz, 0) / (n * 0.025) - 1 < -0.7
            THEN 1 ELSE 0 END AS BIGINT) AS reject_model
FROM terms
"""


@query("q_es_backtest", oracle=ESBT_SQL)
def q_es_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    wd = Window.orderBy("day")
    chg = daily.select(
        "day",
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(wd).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("r"),
    )
    wroll = wd.rowsBetween(-60, -1)
    roll = chg.select(
        "day", "r",
        F.count("r").over(wroll).cast("bigint").alias("n60"),
        F.sum("r").over(wroll).cast("decimal(28,9)").alias("s1"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(28,9)"))
        .over(wroll)
        .cast("decimal(38,9)")
        .alias("s2"),
    )
    n60 = F.col("n60")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    sd = F.sqrt((s2 - s1 * s1 / n60) / (n60 - 1))
    scored = roll.filter((n60 >= 60) & F.col("r").isNotNull()).select(
        F.col("r").cast("double").alias("r"),
        (s1 / n60 - 1.96 * sd).alias("var_t"),
        (s1 / n60 - 2.337803 * sd).alias("es_t"),
    )
    hit = F.col("r") < F.col("var_t")
    terms = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("viol"),
        F.sum(
            F.when(
                hit,
                F.round(F.col("r") / F.col("es_t"), 9).cast(
                    "decimal(20,9)"
                ),
            )
        )
        .cast("double")
        .alias("sz"),
    )
    n = F.col("n")
    z2 = F.coalesce(F.col("sz"), F.lit(0.0)) / (n * 0.025) - 1
    return terms.select(
        n.cast("bigint").alias("n_days"),
        F.col("viol").alias("violations"),
        F.round(z2, 6).alias("z2"),
        F.when(z2 < -0.7, 1).otherwise(0).cast("bigint")
        .alias("reject_model"),
    )


# -- q_christoffersen --------------------------------------------------
#
# Christoffersen independence test for the rolling-VaR violation
# sequence: Kupiec (q_var_backtest) only counts violations — a model
# can pass it while violations CLUSTER (one bad week), which is what
# kills desks. The 2-state Markov transition counts n00/n01/n10/n11
# give LR_ind = -2 ln[ L(pi) / L(pi01, pi11) ] ~ chi2_1; rejection
# means yesterday's breach predicts today's. Violation flags reuse
# the exact rolling-moment VaR; transition counts are exact integers;
# the likelihood ratio is one guarded double chain (log terms with
# zero counts contribute zero by the 0*ln(0)=0 convention).

CHRISTOF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), chg AS (
  SELECT day,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS r
  FROM daily
), roll AS (
  SELECT day, r,
         CAST(COUNT(r) OVER w AS BIGINT) AS n60,
         CAST(SUM(r) OVER w AS DECIMAL(28,9)) AS s1,
         CAST(SUM(CAST(r * r AS DECIMAL(28,9))) OVER w
              AS DECIMAL(38,9)) AS s2
  FROM chg
  WINDOW w AS (ORDER BY day ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
), viol AS (
  SELECT day,
         CASE WHEN CAST(r AS DOUBLE)
                   < CAST(s1 AS DOUBLE) / n60
                     - 1.645 * sqrt((CAST(s2 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE)
                                       * CAST(s1 AS DOUBLE) / n60)
                                    / (n60 - 1))
              THEN 1 ELSE 0 END AS v
  FROM roll WHERE n60 >= 60 AND r IS NOT NULL
), pairs AS (
  SELECT LAG(v) OVER (ORDER BY day) AS v0, v AS v1 FROM viol
), cnt AS (
  SELECT CAST(SUM(CASE WHEN v0 = 0 AND v1 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00,
         CAST(SUM(CASE WHEN v0 = 0 AND v1 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN v0 = 1 AND v1 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN v0 = 1 AND v1 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11
  FROM pairs WHERE v0 IS NOT NULL
), f AS (
  SELECT n00, n01, n10, n11,
         (n01 + n11) / CAST(n00 + n01 + n10 + n11 AS DOUBLE) AS pi,
         CASE WHEN n00 + n01 > 0
              THEN n01 / CAST(n00 + n01 AS DOUBLE) END AS pi01,
         CASE WHEN n10 + n11 > 0
              THEN n11 / CAST(n10 + n11 AS DOUBLE) END AS pi11
  FROM cnt
), lr AS (
  SELECT n00, n01, n10, n11, pi, pi01, pi11,
         -2 * ((CASE WHEN pi > 0 AND pi < 1
                THEN (n00 + n10) * ln(1 - pi) + (n01 + n11) * ln(pi)
                ELSE 0 END)
               - (CASE WHEN pi01 > 0 THEN n01 * ln(pi01) ELSE 0 END
                  + CASE WHEN pi01 < 1 THEN n00 * ln(1 - pi01)
                         ELSE 0 END
                  + CASE WHEN pi11 > 0 THEN n11 * ln(pi11) ELSE 0 END
                  + CASE WHEN pi11 IS NOT NULL AND pi11 < 1
                         THEN n10 * ln(1 - pi11) ELSE 0 END))
           AS lr_ind
  FROM f
)
SELECT n00, n01, n10, n11,
       round(pi01, 6) AS p_viol_after_calm,
       round(pi11, 6) AS p_viol_after_viol,
       round(lr_ind, 6) AS lr_independence,
       CAST(CASE WHEN lr_ind > 3.841 THEN 1 ELSE 0 END AS BIGINT)
         AS clustered_violations
FROM lr
"""


@query("q_christoffersen", oracle=CHRISTOF_SQL)
def q_christoffersen(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    wd = Window.orderBy("day")
    chg = daily.select(
        "day",
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(wd).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("r"),
    )
    wroll = wd.rowsBetween(-60, -1)
    roll = chg.select(
        "day", "r",
        F.count("r").over(wroll).cast("bigint").alias("n60"),
        F.sum("r").over(wroll).cast("decimal(28,9)").alias("s1"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(28,9)"))
        .over(wroll)
        .cast("decimal(38,9)")
        .alias("s2"),
    )
    n60 = F.col("n60")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    var95 = s1 / n60 - 1.645 * F.sqrt(
        (s2 - s1 * s1 / n60) / (n60 - 1)
    )
    viol = roll.filter((n60 >= 60) & F.col("r").isNotNull()).select(
        "day",
        F.when(F.col("r").cast("double") < var95, 1).otherwise(0)
        .alias("v"),
    )
    pairs = viol.select(
        F.lag("v").over(Window.orderBy("day")).alias("v0"),
        F.col("v").alias("v1"),
    ).filter(F.col("v0").isNotNull())
    cc = lambda a, b: F.sum(  # noqa: E731
        F.when((F.col("v0") == a) & (F.col("v1") == b), 1).otherwise(0)
    ).cast("bigint")
    cnt = pairs.agg(
        cc(0, 0).alias("n00"), cc(0, 1).alias("n01"),
        cc(1, 0).alias("n10"), cc(1, 1).alias("n11"),
    )
    n00, n01, n10, n11 = (F.col(x) for x in ["n00", "n01", "n10", "n11"])
    tot = (n00 + n01 + n10 + n11).cast("double")
    pi = (n01 + n11) / tot
    pi01 = F.when(n00 + n01 > 0, n01 / (n00 + n01).cast("double"))
    pi11 = F.when(n10 + n11 > 0, n11 / (n10 + n11).cast("double"))
    f = cnt.select(
        "n00", "n01", "n10", "n11",
        pi.alias("pi"), pi01.alias("pi01"), pi11.alias("pi11"),
    )
    pic, p01, p11 = F.col("pi"), F.col("pi01"), F.col("pi11")
    l0 = F.when(
        (pic > 0) & (pic < 1),
        (n00 + n10) * F.log(1 - pic) + (n01 + n11) * F.log(pic),
    ).otherwise(0)
    l1 = (
        F.when(p01 > 0, n01 * F.log(p01)).otherwise(0)
        + F.when(p01 < 1, n00 * F.log(1 - p01)).otherwise(0)
        + F.when(p11 > 0, n11 * F.log(p11)).otherwise(0)
        + F.when(p11.isNotNull() & (p11 < 1), n10 * F.log(1 - p11))
        .otherwise(0)
    )
    lr_ind = -2 * (l0 - l1)
    return f.select(
        "n00", "n01", "n10", "n11",
        F.round(p01, 6).alias("p_viol_after_calm"),
        F.round(p11, 6).alias("p_viol_after_viol"),
        F.round(lr_ind, 6).alias("lr_independence"),
        F.when(lr_ind > 3.841, 1).otherwise(0).cast("bigint")
        .alias("clustered_violations"),
    )


# -- q_sharpe_panel ----------------------------------------------------
#
# Risk-adjusted performance panel per brand on daily revenue
# log-changes: Sharpe ratio (mean/sd, rf = 0), market beta, Jensen's
# alpha (mean_b - beta * mean_mkt), Treynor ratio (mean/beta), and
# the information ratio (mean active return / tracking error vs the
# market) — the four numbers an allocator reads together, built from
# ONE set of exact decimal moment folds over the shared brand x day
# return grid (9-rounded log-changes, 4-rounded cross products). The
# panel view of what q_market_beta / q_rolling_beta report singly.

SHARPE_SQL = """
WITH bd AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(19,2)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), mkt AS (
  SELECT d, CAST(SUM(rev) AS DECIMAL(22,2)) AS mrev FROM bd GROUP BY 1
), ret AS (
  SELECT b.p_brand, b.d,
         CAST(round(ln(CAST(b.rev AS DOUBLE)
                       / CAST(LAG(b.rev) OVER
                              (PARTITION BY b.p_brand ORDER BY b.d)
                              AS DOUBLE)), 9) AS DECIMAL(18,9)) AS rb,
         CAST(round(ln(CAST(m.mrev AS DOUBLE)
                       / CAST(LAG(m.mrev) OVER
                              (PARTITION BY b.p_brand ORDER BY b.d)
                              AS DOUBLE)), 9) AS DECIMAL(18,9)) AS rm
  FROM bd b JOIN mkt m ON m.d = b.d
), mom AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(rb) AS DOUBLE) AS sb, CAST(SUM(rm) AS DOUBLE) AS sm,
         CAST(SUM(CAST(round(CAST(rb AS DOUBLE) * CAST(rb AS DOUBLE), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS sbb,
         CAST(SUM(CAST(round(CAST(rm AS DOUBLE) * CAST(rm AS DOUBLE), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS smm,
         CAST(SUM(CAST(round(CAST(rb AS DOUBLE) * CAST(rm AS DOUBLE), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS sbm,
         CAST(SUM(CAST(round((CAST(rb AS DOUBLE) - CAST(rm AS DOUBLE))
                             * (CAST(rb AS DOUBLE) - CAST(rm AS DOUBLE)),
                             4) AS DECIMAL(28,4))) AS DOUBLE) AS sdd
  FROM ret WHERE rb IS NOT NULL AND rm IS NOT NULL
  GROUP BY 1
), f AS (
  SELECT p_brand, n, sb / n AS mb, sm / n AS mm,
         sqrt((sbb - sb * sb / n) / (n - 1)) AS sdb,
         (n * sbm - sb * sm) / (n * smm - sm * sm) AS beta,
         sqrt((sdd - (sb - sm) * (sb - sm) / n) / (n - 1)) AS te
  FROM mom
)
SELECT p_brand, CAST(n AS BIGINT) AS n_days,
       round(mb / sdb, 6) AS sharpe,
       round(beta, 6) AS beta,
       round(mb - beta * mm, 6) AS jensen_alpha,
       round(mb / beta, 6) AS treynor,
       round((mb - mm) / te, 6) AS information_ratio
FROM f
ORDER BY p_brand
"""


@query("q_sharpe_panel", oracle=SHARPE_SQL)
def q_sharpe_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bd = (
        # no spread() heal here (r9 A/B): the partial agg collapses to
        # the small brand x day grid cheaply, so the added round-robin
        # shuffle LOSES (3.26 -> 3.89 s interleaved min-of-3)
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(19,2)").alias("rev"))
        .localCheckpoint()
    )
    mkt = bd.groupBy("d").agg(
        F.sum("rev").cast("decimal(22,2)").alias("mrev")
    )
    wb = Window.partitionBy("p_brand").orderBy("d")
    lr = lambda c: F.round(  # noqa: E731
        F.log(c.cast("double") / F.lag(c).over(wb).cast("double")), 9
    ).cast("decimal(18,9)")
    ret = bd.join(F.broadcast(mkt), "d").select(
        "p_brand", "d", lr(F.col("rev")).alias("rb"),
        lr(F.col("mrev")).alias("rm"),
    )
    rbd = F.col("rb").cast("double")
    rmd = F.col("rm").cast("double")
    r4 = lambda e: F.sum(F.round(e, 4).cast("decimal(28,4)")).cast(  # noqa: E731
        "double"
    )
    mom = (
        ret.filter(F.col("rb").isNotNull() & F.col("rm").isNotNull())
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rb").cast("double").alias("sb"),
            F.sum("rm").cast("double").alias("sm"),
            r4(rbd * rbd).alias("sbb"),
            r4(rmd * rmd).alias("smm"),
            r4(rbd * rmd).alias("sbm"),
            r4((rbd - rmd) * (rbd - rmd)).alias("sdd"),
        )
    )
    n = F.col("n")
    sb, sm = F.col("sb"), F.col("sm")
    mb, mm = sb / n, sm / n
    sdb = F.sqrt((F.col("sbb") - sb * sb / n) / (n - 1))
    beta = (n * F.col("sbm") - sb * sm) / (n * F.col("smm") - sm * sm)
    te = F.sqrt((F.col("sdd") - (sb - sm) * (sb - sm) / n) / (n - 1))
    return mom.select(
        "p_brand",
        n.cast("bigint").alias("n_days"),
        F.round(mb / sdb, 6).alias("sharpe"),
        F.round(beta, 6).alias("beta"),
        F.round(mb - beta * mm, 6).alias("jensen_alpha"),
        F.round(mb / beta, 6).alias("treynor"),
        F.round((mb - mm) / te, 6).alias("information_ratio"),
    ).orderBy("p_brand")


# -- q_rolling_beta ----------------------------------------------------
#
# Rolling 91-day market beta per brand, snapshotted at each month's
# last trading day: cov(brand, market)/var(market) over a trailing
# ROWS window on the zero-filled brand x day grid — the TIME-VARYING
# exposure q_market_beta's full-sample number averages away (a brand
# de-rating from beta 1.3 to 0.7 is invisible there). Window moments
# are exact decimal folds (4-rounded cross products); beta is one
# double division; the month-end snapshot picks rn = 1 per (brand,
# month) deterministically. Scale: |brands| x |days| grid windows.

ROLLBETA_SQL = """
WITH bd0 AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(19,2)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), days AS (
  SELECT d, CAST(SUM(rev) AS DECIMAL(22,2)) AS mkt FROM bd0 GROUP BY 1
), brands AS (SELECT DISTINCT p_brand FROM bd0),
grid AS (
  SELECT b.p_brand, d.d, d.mkt,
         COALESCE(bd0.rev, CAST(0 AS DECIMAL(19,2))) AS rev
  FROM brands b CROSS JOIN days d
  LEFT JOIN bd0 ON bd0.p_brand = b.p_brand AND bd0.d = d.d
), roll AS (
  SELECT p_brand, d,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(mkt) OVER w AS DECIMAL(30,2)) AS sx,
         CAST(SUM(rev) OVER w AS DECIMAL(30,2)) AS sy,
         CAST(SUM(CAST(round(CAST(mkt AS DOUBLE) * CAST(mkt AS DOUBLE), 4)
                       AS DECIMAL(38,4))) OVER w AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(round(CAST(mkt AS DOUBLE) * CAST(rev AS DOUBLE), 4)
                       AS DECIMAL(38,4))) OVER w AS DECIMAL(38,4)) AS sxy
  FROM grid
  WINDOW w AS (PARTITION BY p_brand ORDER BY d
               ROWS BETWEEN 90 PRECEDING AND CURRENT ROW)
), snap AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY p_brand, strftime(d, '%Y-%m')
                            ORDER BY d DESC) AS rn
  FROM roll
)
SELECT p_brand, strftime(d, '%Y-%m') AS month,
       round((n * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta
FROM snap
WHERE rn = 1 AND n = 91
ORDER BY p_brand, month
"""


@query("q_rolling_beta", oracle=ROLLBETA_SQL)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bd0 = (
        spread(
            cat.lineitem.select(
                "l_partkey", "l_shipdate", "l_extendedprice"
            )
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(19,2)").alias("rev"))
        .localCheckpoint()
    )
    days = bd0.groupBy("d").agg(
        F.sum("rev").cast("decimal(22,2)").alias("mkt")
    )
    # Grid build without the data-sized SortMergeJoin (r11): the day
    # axis is calendar-bounded, so it collapses to ONE broadcast row
    # of (d, mkt) structs, and each brand's revenue column becomes a
    # map lookup — bd0 groups to |brands| rows carrying a d->rev map,
    # the day array explodes per brand, and coalesce zero-fills
    # exactly like the old left join (same rows, same decimals). The
    # explode preserves the groupBy's HashPartitioning(p_brand), so
    # BOTH downstream windows run exchange-free on top of it.
    days_row = days.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("d", "mkt"))).alias("ds")
    )
    bmap = bd0.groupBy("p_brand").agg(
        F.map_from_entries(F.collect_list(F.struct("d", "rev"))).alias("rm")
    )
    grid = (
        bmap.join(F.broadcast(days_row))
        .select("p_brand", "rm", F.explode("ds").alias("dm"))
        .select(
            "p_brand",
            F.col("dm.d").alias("d"),
            F.col("dm.mkt").alias("mkt"),
            F.coalesce(
                F.element_at(F.col("rm"), F.col("dm.d")),
                F.lit(0).cast("decimal(19,2)"),
            ).alias("rev"),
        )
    )
    # Trailing 91-row sums as DIFFERENCES of running cumulative sums:
    # Spark's bounded sliding frame recomputes the whole frame per row
    # (sum has no inverse), so each decimal window was O(91) per row;
    # cum(current) - lag(cum, 91) is O(1) per row, shares ONE window
    # pass for every column (same partition/order spec), and — because
    # the cum sums are EXACT decimals — yields bit-identical values to
    # the direct frame sum (measured ~5x on the |brands|x|days| grid).
    wc = (
        Window.partitionBy("p_brand")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("p_brand").orderBy("d")
    mktd = F.col("mkt").cast("double")
    revd = F.col("rev").cast("double")

    def trail(expr, scale: str):
        cum = F.sum(expr).over(wc)
        return (
            cum - F.coalesce(F.lag(cum, 91).over(wl), F.lit(0))
        ).cast(scale)

    roll = grid.select(
        "p_brand", "d",
        (
            F.row_number().over(wl)
            - F.coalesce(F.lag(F.row_number().over(wl), 91).over(wl), F.lit(0))
        ).cast("bigint").alias("n"),
        trail(F.col("mkt"), "decimal(30,2)").alias("sx"),
        trail(F.col("rev"), "decimal(30,2)").alias("sy"),
        # terms are decimal(28,4), NOT (38,4): Spark widens a decimal
        # sum by 10 integer digits capped at precision 38, so (28,4)
        # terms give the running cumulative sums real headroom
        # (|term| < 1e24, cum < 1e34 before any overflow->NULL) while
        # (38,4) terms would leave the unbounded cum sums ZERO
        # headroom. Daily-revenue squares are ~1e18 at SF100, so the
        # 4-dp rounded term always fits (28,4) exactly — values are
        # bit-identical to the direct frame sum.
        trail(
            F.round(mktd * mktd, 4).cast("decimal(28,4)"), "decimal(38,4)"
        ).alias("sxx"),
        trail(
            F.round(mktd * revd, 4).cast("decimal(28,4)"), "decimal(38,4)"
        ).alias("sxy"),
    )
    snap = roll.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy(
                "p_brand", F.date_format("d", "yyyy-MM")
            ).orderBy(F.col("d").desc())
        )
        .alias("rn"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    return (
        snap.filter((F.col("rn") == 1) & (n == 91))
        .select(
            "p_brand",
            F.date_format("d", "yyyy-MM").alias("month"),
            F.round(
                (n * sxy - sx * sy) / (n * sxx - sx * sx), 6
            ).alias("beta"),
        )
        .orderBy("p_brand", "month")
    )


# -- q_amihud ----------------------------------------------------------
#
# Amihud illiquidity per brand: mean of |daily log revenue change| /
# daily quantity (x 1e6) — how much the "price" signal moves per unit
# of volume, the standard cross-sectional illiquidity ranking. Daily
# grids are exact decimals; each day's ratio is 9-rounded decimal
# before the exact fold; brands rank by the final double. The
# microstructure companion to q_sharpe_panel's risk-adjusted returns.

AMIHUD_SQL = """
WITH bd AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(19,2)) AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
              AS DECIMAL(19,2)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), r AS (
  SELECT p_brand, d, qty,
         CAST(round(abs(ln(CAST(rev AS DOUBLE)
                           / CAST(LAG(rev) OVER
                                  (PARTITION BY p_brand ORDER BY d)
                                  AS DOUBLE))), 9)
              AS DECIMAL(18,9)) AS aret
  FROM bd
), t AS (
  SELECT p_brand,
         CAST(round(1000000 * CAST(aret AS DOUBLE)
                    / CAST(qty AS DOUBLE), 9) AS DECIMAL(20,9)) AS illiq
  FROM r WHERE aret IS NOT NULL AND qty > 0
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
       round(CAST(SUM(illiq) AS DOUBLE) / COUNT(*), 6) AS amihud_illiq
FROM t
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q_amihud", oracle=AMIHUD_SQL)
def q_amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bd = (
        # no spread() heal here (r9 A/B): the partial agg collapses to
        # the small brand x day grid cheaply, so the added round-robin
        # shuffle LOSES (3.26 -> 3.89 s interleaved min-of-3)
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(dec("l_extendedprice")).cast("decimal(19,2)").alias("rev"),
            F.sum(dec("l_quantity")).cast("decimal(19,2)").alias("qty"),
        )
    )
    wb = Window.partitionBy("p_brand").orderBy("d")
    r = bd.select(
        "p_brand", "qty",
        F.round(
            F.abs(
                F.log(
                    F.col("rev").cast("double")
                    / F.lag("rev").over(wb).cast("double")
                )
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("aret"),
    )
    t = r.filter(F.col("aret").isNotNull() & (F.col("qty") > 0)).select(
        "p_brand",
        F.round(
            1000000 * F.col("aret").cast("double")
            / F.col("qty").cast("double"),
            9,
        )
        .cast("decimal(20,9)")
        .alias("illiq"),
    )
    return (
        t.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum("illiq").cast("double") / F.count(F.lit(1)), 6
            ).alias("amihud_illiq"),
        )
        .orderBy("p_brand")
    )


# -- q_variance_ratio --------------------------------------------------
#
# Lo-MacKinlay variance-ratio test (q = 5) on daily revenue
# log-changes: VR = Var(5-day overlapping returns) / (5 * Var(1-day)),
# with the homoskedastic z statistic z = (VR - 1) /
# sqrt(2(2q-1)(q-1)/(3qn)) — VR < 1 flags mean reversion, > 1
# momentum; the market-efficiency companion to q_hurst_exponent's
# rescaled-range view. Five-day sums are ROWS-window folds of the
# exact decimal returns; both variances use the house moment pattern.

VRATIO_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), r AS (
  SELECT day,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS ret
  FROM daily
), rr AS (SELECT day, ret FROM r WHERE ret IS NOT NULL),
r5 AS (
  SELECT day, ret,
         CAST(SUM(ret) OVER (ORDER BY day
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS DECIMAL(24,9)) AS s5,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM rr
), mom1 AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(ret) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(CAST(ret AS DOUBLE) * CAST(ret AS DOUBLE),
                             12) AS DECIMAL(20,12))) AS DOUBLE) AS s2
  FROM rr
), mom5 AS (
  SELECT COUNT(*) AS n5,
         CAST(SUM(s5) AS DOUBLE) AS t1,
         CAST(SUM(CAST(round(CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE), 12)
                       AS DECIMAL(24,12))) AS DOUBLE) AS t2
  FROM r5 WHERE rn >= 5
), f AS (
  SELECT n, n5,
         (s2 - s1 * s1 / n) / (n - 1) AS v1,
         (t2 - t1 * t1 / n5) / (n5 - 1) AS v5
  FROM mom1 CROSS JOIN mom5
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(v5 / (5 * v1), 6) AS variance_ratio,
       round((v5 / (5 * v1) - 1)
             / sqrt(2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5 * n)), 6)
         AS z_stat
FROM f
"""


@query("q_variance_ratio", oracle=VRATIO_SQL)
def q_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    wd = Window.orderBy("day")
    r = daily.select(
        "day",
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(wd).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("ret"),
    )
    rr = r.filter(F.col("ret").isNotNull()).localCheckpoint()
    r5 = rr.select(
        "ret",
        F.sum("ret").over(wd.rowsBetween(-4, 0)).cast("decimal(24,9)")
        .alias("s5"),
        F.row_number().over(wd).alias("rn"),
    )
    retd = F.col("ret").cast("double")
    mom1 = rr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ret").cast("double").alias("s1"),
        F.sum(F.round(retd * retd, 12).cast("decimal(20,12)"))
        .cast("double")
        .alias("s2"),
    )
    s5d = F.col("s5").cast("double")
    mom5 = r5.filter(F.col("rn") >= 5).agg(
        F.count(F.lit(1)).alias("n5"),
        F.sum("s5").cast("double").alias("t1"),
        F.sum(F.round(s5d * s5d, 12).cast("decimal(24,12)"))
        .cast("double")
        .alias("t2"),
    )
    n, n5 = F.col("n"), F.col("n5")
    v1 = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
    v5 = (F.col("t2") - F.col("t1") * F.col("t1") / n5) / (n5 - 1)
    vr = v5 / (5 * v1)
    return mom1.join(F.broadcast(mom5)).select(
        n.cast("bigint").alias("n_days"),
        F.round(vr, 6).alias("variance_ratio"),
        F.round(
            (vr - 1) / F.sqrt(2.0 * 9 * 4 / (15.0 * n)), 6
        ).alias("z_stat"),
    )


# -- q_arch_lm ---------------------------------------------------------
#
# Engle's ARCH LM test for volatility clustering in daily revenue
# log-changes: regress r_t^2 on r_{t-1}^2; LM = n * R^2 is chi2_1
# under homoskedasticity — q_ljung_box / q_durbin_watson test serial
# dependence in LEVELS, this tests it in VARIANCE, the signature of
# bursty series that invalidates iid-based intervals. Squared returns
# are 9-rounded-log-change squares folded as exact decimals; the
# regression is the house exact-moment chain.

ARCH_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), r AS (
  SELECT day,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS ret
  FROM daily
), r2 AS (
  SELECT day,
         CAST(round(CAST(ret AS DOUBLE) * CAST(ret AS DOUBLE), 12)
              AS DECIMAL(18,12)) AS y,
         CAST(round(CAST(LAG(ret) OVER (ORDER BY day) AS DOUBLE)
                    * CAST(LAG(ret) OVER (ORDER BY day) AS DOUBLE), 12)
              AS DECIMAL(18,12)) AS x
  FROM r WHERE ret IS NOT NULL
), clean AS (SELECT y, x FROM r2 WHERE x IS NOT NULL),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 18)
                       AS DECIMAL(24,18))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 18)
                       AS DECIMAL(24,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 18)
                       AS DECIMAL(24,18))) AS DOUBLE) AS syy
  FROM clean
)
SELECT CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS arch_coef,
       round(n * ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS lm_stat,
       CAST(CASE WHEN n * ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                      > 3.841 THEN 1 ELSE 0 END AS BIGINT)
         AS arch_present
FROM mom
"""


@query("q_arch_lm", oracle=ARCH_SQL)
def q_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    wd = Window.orderBy("day")
    r = daily.select(
        "day",
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(wd).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("ret"),
    )
    retd = F.col("ret").cast("double")
    lagd = F.lag("ret").over(wd).cast("double")
    r2 = r.filter(F.col("ret").isNotNull()).select(
        "day",
        F.round(retd * retd, 12).cast("decimal(18,12)").alias("y"),
        F.round(lagd * lagd, 12).cast("decimal(18,12)").alias("x"),
    )
    clean = r2.filter(F.col("x").isNotNull())
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r18 = lambda e: F.sum(  # noqa: E731
        F.round(e, 18).cast("decimal(24,18)")
    ).cast("double")
    mom = clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r18(xd * xd).alias("sxx"),
        r18(xd * yd).alias("sxy"),
        r18(yd * yd).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    coef = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lm = (
        n
        * ((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return mom.select(
        n.cast("bigint").alias("n_days"),
        F.round(coef, 6).alias("arch_coef"),
        F.round(lm, 6).alias("lm_stat"),
        F.when(lm > 3.841, 1).otherwise(0).cast("bigint")
        .alias("arch_present"),
    )


# -- q_ledoit_wolf -----------------------------------------------------
#
# Ledoit-Wolf shrinkage covariance of the five event-type daily count
# series (identity target scaled by the mean variance): the optimal
# shrinkage intensity rho = min(1, b2/d2) with d2 = ||S - m*I||^2 and
# b2 = (1/n^2) sum_t ||x_t x_t' - S||^2 estimated from the SAME
# (day, i, j) product grid that builds S — the estimator that makes
# covariance usable when p is not << n, one level above
# q_corr_matrix's raw S. Output: the upper-triangle cells with raw
# and shrunk values plus the shared (m, rho) columns. Demeaned
# products fold as 6-rounded decimals; the scalar algebra is one
# double chain.

LW_SQL = """
WITH daily AS (
  SELECT event_type AS et, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mu AS (
  SELECT et, CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m FROM daily GROUP BY 1
), x AS (
  SELECT d.day, d.et, d.c - mu.m AS xv
  FROM daily d JOIN mu ON mu.et = d.et
), grid AS (
  SELECT a.day, a.et AS i, b.et AS j,
         CAST(round(a.xv * b.xv, 6) AS DECIMAL(24,6)) AS xx
  FROM x a JOIN x b ON b.day = a.day AND a.et <= b.et
), s AS (
  SELECT i, j, COUNT(*) AS n,
         CAST(SUM(xx) AS DOUBLE) / COUNT(*) AS sij
  FROM grid GROUP BY 1, 2
), scal AS (
  SELECT CAST(SUM(CASE WHEN i = j THEN CAST(round(sij, 9)
                       AS DECIMAL(24,9)) END) AS DOUBLE)
           / SUM(CASE WHEN i = j THEN 1 ELSE 0 END) AS m,
         MAX(n) AS n
  FROM s
), d2 AS (
  SELECT CAST(SUM(CAST(round(
           CASE WHEN i = j THEN (sij - m) * (sij - m)
                ELSE 2 * sij * sij END, 9) AS DECIMAL(28,9)))
           AS DOUBLE) AS d2
  FROM s CROSS JOIN scal
), b2 AS (
  SELECT CAST(SUM(CAST(round(
           CASE WHEN g.i = g.j
                THEN (CAST(g.xx AS DOUBLE) - s.sij)
                     * (CAST(g.xx AS DOUBLE) - s.sij)
                ELSE 2 * (CAST(g.xx AS DOUBLE) - s.sij)
                      * (CAST(g.xx AS DOUBLE) - s.sij) END, 4)
           AS DECIMAL(38,4))) AS DOUBLE)
           / ((SELECT n FROM scal) * CAST((SELECT n FROM scal)
                                          AS DOUBLE)) AS b2
  FROM grid g JOIN s ON s.i = g.i AND s.j = g.j
), rho AS (
  SELECT LEAST(1.0, b2.b2 / d2.d2) AS rho FROM b2 CROSS JOIN d2
)
SELECT s.i, s.j,
       round(s.sij, 4) + 0.0 AS sample_cov,
       round(CASE WHEN s.i = s.j
                  THEN rho.rho * scal.m + (1 - rho.rho) * s.sij
                  ELSE (1 - rho.rho) * s.sij END, 4) + 0.0 AS shrunk_cov,
       round(scal.m, 4) AS mean_var,
       round(rho.rho, 6) AS shrinkage
FROM s CROSS JOIN scal CROSS JOIN rho
ORDER BY s.i, s.j
"""


@query("q_ledoit_wolf", oracle=LW_SQL)
def q_ledoit_wolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        F.col("event_type").alias("et"), F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mu = daily.groupBy("et").agg(
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("m")
    )
    x = daily.join(F.broadcast(mu), "et").select(
        "day", "et", (F.col("c") - F.col("m")).alias("xv")
    ).localCheckpoint()
    a = x.alias("a")
    b = x.alias("b")
    grid = (
        a.join(
            b,
            (F.col("b.day") == F.col("a.day"))
            & (F.col("a.et") <= F.col("b.et")),
        )
        .select(
            F.col("a.day").alias("day"),
            F.col("a.et").alias("i"),
            F.col("b.et").alias("j"),
            F.round(F.col("a.xv") * F.col("b.xv"), 6)
            .cast("decimal(24,6)")
            .alias("xx"),
        )
        .localCheckpoint()
    )
    s = grid.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("xx").cast("double") / F.count(F.lit(1))).alias("sij"),
    ).localCheckpoint()
    diag = F.col("i") == F.col("j")
    scal = s.agg(
        (
            F.sum(
                F.when(diag, F.round("sij", 9).cast("decimal(24,9)"))
            ).cast("double")
            / F.sum(F.when(diag, 1).otherwise(0))
        ).alias("m"),
        F.max("n").alias("n"),
    )
    sij, mcol = F.col("sij"), F.col("m")
    d2 = (
        s.join(F.broadcast(scal))
        .agg(
            F.sum(
                F.round(
                    F.when(diag, (sij - mcol) * (sij - mcol)).otherwise(
                        2 * sij * sij
                    ),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("d2")
        )
    )
    xxd = F.col("xx").cast("double")
    dev = xxd - sij
    b2 = (
        grid.join(s.select("i", "j", "sij"), ["i", "j"])
        .join(F.broadcast(scal))
        .agg(
            (
                F.sum(
                    F.round(
                        F.when(diag, dev * dev).otherwise(2 * dev * dev),
                        4,
                    ).cast("decimal(38,4)")
                ).cast("double")
                / (F.max("n") * F.max("n").cast("double"))
            ).alias("b2")
        )
    )
    rho = (
        b2.join(F.broadcast(d2))
        .select(
            F.least(F.lit(1.0), F.col("b2") / F.col("d2")).alias("rho")
        )
    )
    r = F.col("rho")
    return (
        s.join(F.broadcast(scal))
        .join(F.broadcast(rho))
        .select(
            "i", "j",
            (F.round(sij, 4) + 0.0).alias("sample_cov"),
            (
                F.round(
                    F.when(diag, r * mcol + (1 - r) * sij).otherwise(
                        (1 - r) * sij
                    ),
                    4,
                )
                + 0.0
            ).alias("shrunk_cov"),
            F.round(mcol, 4).alias("mean_var"),
            F.round(r, 6).alias("shrinkage"),
        )
        .orderBy("i", "j")
    )


# -- q_ulcer_index -----------------------------------------------------
#
# Ulcer index and Martin ratio per event type on the daily revenue
# curve: UI = sqrt(mean(pct-drawdown^2)) penalizes DEEP and LONG
# underwater stretches quadratically where q_drawdown's max-dd
# reports only the single worst point, and the Martin (Ulcer
# Performance) ratio divides mean daily log-return by UI — the
# risk-adjusted ranking for drawdown-sensitive consumers. Running
# peaks are exact decimal window maxes; squared drawdown shares are
# 9-rounded decimal folds; two double finales.

ULCER_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), dd AS (
  SELECT event_type, day, rev,
         CAST(MAX(rev) OVER (PARTITION BY event_type ORDER BY day)
              AS DECIMAL(24,2)) AS peak
  FROM daily
), t AS (
  SELECT event_type,
         CAST(round(pow(CAST(peak - rev AS DOUBLE)
                        / CAST(peak AS DOUBLE), 2), 9)
              AS DECIMAL(14,9)) AS dd2,
         CAST(round(ln(CAST(rev AS DOUBLE)
                       / CAST(LAG(rev) OVER
                              (PARTITION BY event_type ORDER BY day)
                              AS DOUBLE)), 9) AS DECIMAL(18,9)) AS r
  FROM dd
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(dd2) AS DOUBLE) AS sdd2,
         CAST(SUM(r) AS DOUBLE) AS sr,
         COUNT(r) AS nr
  FROM t GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(sqrt(sdd2 / n), 6) AS ulcer_index,
       round((sr / nr) / sqrt(sdd2 / n), 6) AS martin_ratio
FROM agg
ORDER BY event_type
"""


@query("q_ulcer_index", oracle=ULCER_SQL)
def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("decimal(24,2)")
            .alias("rev")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    dd = daily.select(
        "event_type", "day", "rev",
        F.max("rev").over(w).cast("decimal(24,2)").alias("peak"),
    )
    t = dd.select(
        "event_type",
        F.round(
            F.pow(
                (F.col("peak") - F.col("rev")).cast("double")
                / F.col("peak").cast("double"),
                2,
            ),
            9,
        )
        .cast("decimal(14,9)")
        .alias("dd2"),
        F.round(
            F.log(
                F.col("rev").cast("double")
                / F.lag("rev").over(w).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("r"),
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dd2").cast("double").alias("sdd2"),
        F.sum("r").cast("double").alias("sr"),
        F.count("r").alias("nr"),
    )
    ui = F.sqrt(F.col("sdd2") / F.col("n"))
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(ui, 6).alias("ulcer_index"),
        F.round((F.col("sr") / F.col("nr")) / ui, 6).alias("martin_ratio"),
    ).orderBy("event_type")


# -- q_gpd_tail --------------------------------------------------------
#
# Peaks-over-threshold generalized-Pareto tail fit per market segment:
# threshold u = the exact empirical p95 of order totals (rank-selected,
# not interpolated — deterministic), excesses y = price - u as exact
# DECIMAL, GPD method-of-moments xi = (1 - m^2/s^2)/2 and
# beta = m(m^2/s^2 + 1)/2, and the implied p99.9 POT quantile
# u + beta/xi * ((N/n_u * (1-p))^(-xi) - 1). The shape/scale view of
# the tail that q_hill_tail_index's log-rank slope summarizes with one
# number. All moments are exact decimal sums; one double finale.

GPD_SQL = """
WITH o AS (
  SELECT c_mktsegment AS seg, CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders JOIN customer ON o_custkey = c_custkey
), rk AS (
  SELECT seg, p,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY p, seg) AS r,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM o
), thr AS (
  SELECT seg, MAX(n) AS n,
         MAX(CASE WHEN r = CAST(ceil(0.95 * n) AS BIGINT) THEN p END) AS u
  FROM rk GROUP BY seg
), ex AS (
  SELECT o.seg, thr.n, thr.u, o.p - thr.u AS y
  FROM o JOIN thr ON thr.seg = o.seg
  WHERE o.p > thr.u
), mom AS (
  SELECT seg, MAX(n) AS n, MAX(u) AS u, COUNT(*) AS nu,
         CAST(SUM(CAST(y AS DECIMAL(19,2))) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS sy2
  FROM ex GROUP BY seg
), fit AS (
  SELECT seg, n, nu, CAST(u AS DOUBLE) AS u,
         CAST(sy AS DOUBLE) / nu AS m,
         (CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / nu)
           / (nu - 1) AS s2
  FROM mom
)
SELECT seg,
       round(u, 2) AS threshold,
       CAST(nu AS BIGINT) AS n_exceed,
       round(0.5 * (1 - m * m / s2), 6) AS xi,
       round(0.5 * m * (m * m / s2 + 1), 6) AS beta,
       round(u + (0.5 * m * (m * m / s2 + 1))
                 / (0.5 * (1 - m * m / s2))
                 * (pow(CAST(n AS DOUBLE) / nu * 0.001,
                        -(0.5 * (1 - m * m / s2))) - 1), 2) AS q999
FROM fit
ORDER BY seg
"""


@query("q_gpd_tail", oracle=GPD_SQL)
def q_gpd_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"), dec("o_totalprice").alias("p")
    )
    wseg = Window.partitionBy("seg")
    rk = o.select(
        "seg", "p",
        F.row_number().over(wseg.orderBy("p", "seg")).alias("r"),
        F.count(F.lit(1)).over(wseg).alias("n"),
    )
    thr = rk.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                F.col("r") == F.ceil(0.95 * F.col("n")).cast("bigint"),
                F.col("p"),
            )
        ).alias("u"),
    )
    ex = (
        o.join(F.broadcast(thr), "seg")
        .filter(F.col("p") > F.col("u"))
        .select(
            "seg", "n", "u", (F.col("p") - F.col("u")).alias("y")
        )
    )
    y19 = F.col("y").cast("decimal(19,2)")
    mom = ex.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max("u").alias("u"),
        F.count(F.lit(1)).alias("nu"),
        F.sum(y19).cast("decimal(28,2)").alias("sy"),
        F.sum(y19 * y19).cast("decimal(38,4)").alias("sy2"),
    )
    nu, n = F.col("nu"), F.col("n")
    u = F.col("u").cast("double")
    m = F.col("sy").cast("double") / nu
    s2 = (
        F.col("sy2").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / nu
    ) / (nu - 1)
    xi = 0.5 * (1 - m * m / s2)
    beta = 0.5 * m * (m * m / s2 + 1)
    return mom.select(
        "seg",
        F.round(u, 2).alias("threshold"),
        nu.cast("bigint").alias("n_exceed"),
        F.round(xi, 6).alias("xi"),
        F.round(beta, 6).alias("beta"),
        F.round(
            u
            + beta / xi * (F.pow(n.cast("double") / nu * 0.001, -xi) - 1),
            2,
        ).alias("q999"),
    ).orderBy("seg")


# -- q_chain_ladder ----------------------------------------------------
#
# Chain-ladder reserving on the order->ship development triangle:
# origin = order month, development age = months from order month to
# ship month, "claims" = shipped revenue. Cumulative triangle C(i,j)
# from one fact scan + a dev-ordered window cumsum; volume-weighted
# development factors f_j = sum_i C(i,j+1) / sum_i C(i,j) over origins
# old enough to have observed age j+1; each origin's ultimate =
# latest diagonal value * prod of remaining factors (product via an
# exact-decimal fold of 12-rounded ln f). The actuarial IBNR estimate
# ("how much revenue is still to ship for each order cohort"), exact
# decimal triangle end to end. Scale: triangle is |origins| x |ages|.

CHAINLADDER_SQL = """
WITH f AS (
  SELECT (CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) * 12
          + CAST(strftime(CAST(o_orderdate AS DATE), '%m') AS BIGINT)) AS om,
         (CAST(strftime(CAST(l_shipdate AS DATE), '%Y') AS BIGINT) * 12
          + CAST(strftime(CAST(l_shipdate AS DATE), '%m') AS BIGINT)) AS sm,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), mx AS (SELECT MAX(sm) AS maxm FROM f),
inc AS (
  SELECT om, sm - om AS dev, CAST(SUM(rev) AS DECIMAL(24,2)) AS rev
  FROM f GROUP BY 1, 2
), cum AS (
  SELECT om, dev,
         CAST(SUM(rev) OVER (PARTITION BY om ORDER BY dev)
              AS DECIMAL(28,2)) AS c
  FROM inc
), fac AS (
  SELECT a.dev AS j,
         round(CAST(SUM(b.c) AS DOUBLE) / CAST(SUM(a.c) AS DOUBLE), 9)
           AS fj
  FROM cum a
  JOIN cum b ON b.om = a.om AND b.dev = a.dev + 1
  CROSS JOIN mx
  WHERE a.om + a.dev + 1 <= maxm
  GROUP BY 1
), latest AS (
  SELECT om, MAX(dev) AS ldev FROM cum GROUP BY 1
), diag AS (
  SELECT cum.om, cum.dev AS ldev, cum.c
  FROM cum JOIN latest ON latest.om = cum.om AND latest.ldev = cum.dev
), fullfac AS (
  SELECT d.om,
         CAST(COALESCE(SUM(CAST(round(ln(fac.fj), 12)
                                AS DECIMAL(20,12))), 0)
              AS DOUBLE) AS lnprod
  FROM diag d
  LEFT JOIN fac ON fac.j >= d.ldev
  GROUP BY 1
)
SELECT d.om AS origin_month,
       CAST(d.ldev AS BIGINT) AS latest_dev,
       CAST(d.c AS DOUBLE) AS latest_cum,
       round(CAST(d.c AS DOUBLE) * exp(ff.lnprod), 2) AS ultimate,
       round(CAST(d.c AS DOUBLE) * exp(ff.lnprod)
             - CAST(d.c AS DOUBLE), 2) AS reserve
FROM diag d JOIN fullfac ff ON ff.om = d.om
ORDER BY origin_month
"""


@query("q_chain_ladder", oracle=CHAINLADDER_SQL)
def q_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    midx = lambda col: (  # noqa: E731
        F.year(F.col(col).cast("date")).cast("bigint") * 12
        + F.month(F.col(col).cast("date")).cast("bigint")
    )
    f = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            midx("o_orderdate").alias("om"),
            midx("l_shipdate").alias("sm"),
            dec("l_extendedprice").alias("rev"),
        )
    )
    mx = f.agg(F.max("sm").alias("maxm"))
    inc = f.groupBy(
        "om", (F.col("sm") - F.col("om")).alias("dev")
    ).agg(F.sum("rev").cast("decimal(24,2)").alias("rev"))
    cum = inc.select(
        "om", "dev",
        F.sum("rev")
        .over(Window.partitionBy("om").orderBy("dev"))
        .cast("decimal(28,2)")
        .alias("c"),
    ).localCheckpoint()
    a, b = cum.alias("a"), cum.alias("b")
    fac = (
        a.join(
            b,
            (F.col("b.om") == F.col("a.om"))
            & (F.col("b.dev") == F.col("a.dev") + 1),
        )
        .join(F.broadcast(mx))
        .filter(F.col("a.om") + F.col("a.dev") + 1 <= F.col("maxm"))
        .groupBy(F.col("a.dev").alias("j"))
        .agg(
            F.round(
                F.sum(F.col("b.c")).cast("double")
                / F.sum(F.col("a.c")).cast("double"),
                9,
            ).alias("fj")
        )
    )
    latest = cum.groupBy("om").agg(F.max("dev").alias("ldev"))
    c1, l1 = cum.alias("c1"), latest.alias("l1")
    diag = (
        c1.join(
            l1,
            (F.col("c1.om") == F.col("l1.om"))
            & (F.col("c1.dev") == F.col("l1.ldev")),
        )
        .select(F.col("c1.om").alias("om"), F.col("l1.ldev").alias("ldev"),
                F.col("c1.c").alias("c"))
        .localCheckpoint()
    )
    fullfac = (
        diag.join(F.broadcast(fac), F.col("j") >= F.col("ldev"), "left")
        .groupBy("om")
        .agg(
            F.coalesce(
                F.sum(
                    F.round(F.log("fj"), 12).cast("decimal(20,12)")
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("lnprod")
        )
    )
    d = diag.alias("d")
    cd = F.col("d.c").cast("double")
    return (
        d.join(fullfac.alias("ff"), F.col("ff.om") == F.col("d.om"))
        .select(
            F.col("d.om").alias("origin_month"),
            F.col("d.ldev").cast("bigint").alias("latest_dev"),
            cd.alias("latest_cum"),
            F.round(cd * F.exp(F.col("lnprod")), 2).alias("ultimate"),
            F.round(cd * F.exp(F.col("lnprod")) - cd, 2).alias("reserve"),
        )
        .orderBy("origin_month")
    )


# -- q_price_stickiness ------------------------------------------------
#
# Price-stickiness table per brand (Calvo framing): share of
# month-over-month moves where the average unit price changes by more
# than 1%, the implied Calvo expected price duration 1/freq (months),
# and the mean absolute change conditional on changing — the
# micro-pricing facts (Bils-Klenow) behind inflation persistence
# debates, computed on the monthly unit-price grid. Unit prices are
# exact-decimal revenue/qty doubles; the change flag compares a
# 6-rounded relative move to the 1% threshold identically on both
# engines.

STICKY_SQL = """
WITH m AS (
  SELECT p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), p AS (
  SELECT p_brand, mon,
         CAST(rev AS DOUBLE) / CAST(qty AS DOUBLE) AS up
  FROM m WHERE qty > 0
), chg AS (
  SELECT p_brand,
         round(abs(up / LAG(up) OVER (PARTITION BY p_brand ORDER BY mon)
                   - 1), 6) AS rel
  FROM p
), f AS (
  SELECT p_brand, COUNT(rel) AS n_moves,
         CAST(SUM(CASE WHEN rel > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes,
         CAST(SUM(CASE WHEN rel > 0.01 THEN
               CAST(rel AS DECIMAL(12,6)) END) AS DOUBLE) AS s_chg
  FROM chg GROUP BY 1
)
SELECT p_brand, CAST(n_moves AS BIGINT) AS n_months,
       round(n_changes / CAST(n_moves AS DOUBLE), 6) AS change_freq,
       round(CASE WHEN n_changes > 0
                  THEN CAST(n_moves AS DOUBLE) / n_changes END, 4)
         AS calvo_duration_months,
       round(CASE WHEN n_changes > 0 THEN s_chg / n_changes END, 6)
         AS mean_abs_change
FROM f
ORDER BY p_brand
"""


@query("q_price_stickiness", oracle=STICKY_SQL)
def q_price_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    m = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand",
            F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
            .alias("mon"),
        )
        .agg(
            F.sum(dec("l_extendedprice")).cast("decimal(28,2)").alias("rev"),
            F.sum(dec("l_quantity")).cast("decimal(24,2)").alias("qty"),
        )
    )
    p = m.filter(F.col("qty") > 0).select(
        "p_brand", "mon",
        (F.col("rev").cast("double") / F.col("qty").cast("double"))
        .alias("up"),
    )
    wb = Window.partitionBy("p_brand").orderBy("mon")
    chg = p.select(
        "p_brand",
        F.round(
            F.abs(F.col("up") / F.lag("up").over(wb) - 1), 6
        ).alias("rel"),
    )
    rel = F.col("rel")
    f = chg.groupBy("p_brand").agg(
        F.count("rel").alias("n_moves"),
        F.sum(F.when(rel > 0.01, 1).otherwise(0)).cast("bigint")
        .alias("n_changes"),
        F.sum(F.when(rel > 0.01, rel.cast("decimal(12,6)")))
        .cast("double")
        .alias("s_chg"),
    )
    nm, nc = F.col("n_moves"), F.col("n_changes")
    return f.select(
        "p_brand",
        nm.cast("bigint").alias("n_months"),
        F.round(nc / nm.cast("double"), 6).alias("change_freq"),
        F.round(
            F.when(nc > 0, nm.cast("double") / nc), 4
        ).alias("calvo_duration_months"),
        F.round(F.when(nc > 0, F.col("s_chg") / nc), 6)
        .alias("mean_abs_change"),
    ).orderBy("p_brand")
