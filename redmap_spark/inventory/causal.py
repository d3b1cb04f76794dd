"""SURVEY §2.A — causal inference, experimentation and clinical-style
analysis: exact tests, proportional-hazards estimation and diagnostics,
meta-analysis, sequential testing (mSPRT), bounds and sensitivity
(Lee, E-value), difference-in-differences, agreement and uplift
evaluation. Split out of the former stats7 grab-bag (round 7), code
unchanged. Determinism contract as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query


# -- q_fisher_exact ----------------------------------------------------
#
# Fisher's exact test of priority (URGENT/HIGH vs rest) against final
# status ('F') per nation — the small-sample independence test
# q_chi2_independence approximates. No factorial table and no lgamma
# (Spark has neither): the hypergeometric weights are built from the
# RECURRENCE pmf(k)/pmf(k-1) = (r1-k+1)(c1-k+1) / (k(n-r1-c1+k)), so
# log-weights are a window cumsum of 12-rounded ln increments — an
# EXACT DECIMAL per support point, identical on both engines. The
# two-sided tail includes k with logw(k) <= logw(k_obs) — an exact
# decimal comparison, immune to exp() ulp skew. Weights are
# max-normalized before exp (bounded in (0,1]), 12-rounded to decimal,
# and summed exactly; the only unrounded doubles are the two final
# divisions. Scale: the support enumeration is min(r1,c1)-kmin+1 rows
# per group — Fisher is a small-margin test by construction; production
# gates it behind min-margin <= 1e5 and falls back to
# q_chi2_independence beyond (documented, not enforced here).

FISHER_SQL = """
WITH cells AS (
  SELECT n_name,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n11,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS r1,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
         COUNT(*) AS n
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
), support AS (
  SELECT n_name, n11, r1, c1, n,
         UNNEST(generate_series(CAST(GREATEST(0, r1 + c1 - n) AS BIGINT),
                                CAST(LEAST(r1, c1) AS BIGINT))) AS k
  FROM cells
), inc AS (
  SELECT *,
         CASE WHEN k = GREATEST(0, r1 + c1 - n)
              THEN CAST(0 AS DECIMAL(24,12))
              ELSE CAST(round(ln(
                     (CAST(r1 - k + 1 AS DOUBLE) * (c1 - k + 1))
                     / (CAST(k AS DOUBLE) * (n - r1 - c1 + k))), 12)
                   AS DECIMAL(24,12)) END AS lr
  FROM support
), lw AS (
  SELECT *,
         SUM(lr) OVER (PARTITION BY n_name ORDER BY k) AS logw
  FROM inc
), norm AS (
  SELECT *,
         MAX(logw) OVER (PARTITION BY n_name) AS m,
         MAX(CASE WHEN k = n11 THEN logw END)
           OVER (PARTITION BY n_name) AS lw_obs
  FROM lw
), w AS (
  SELECT n_name, n11, r1, c1, n, k, logw, lw_obs,
         CAST(round(exp(CAST(logw - m AS DOUBLE)), 12)
              AS DECIMAL(14,12)) AS wt
  FROM norm
)
SELECT n_name,
       CAST(n11 AS BIGINT) AS n11,
       CAST(r1 - n11 AS BIGINT) AS n12,
       CAST(c1 - n11 AS BIGINT) AS n21,
       CAST(n - r1 - c1 + n11 AS BIGINT) AS n22,
       CASE WHEN (r1 - n11) * (c1 - n11) > 0
            THEN round((CAST(n11 AS DOUBLE) * (n - r1 - c1 + n11))
                       / (CAST(r1 - n11 AS DOUBLE) * (c1 - n11)), 6)
       END AS odds_ratio,
       round(CAST(SUM(CASE WHEN logw <= lw_obs THEN wt END) AS DOUBLE)
             / CAST(SUM(wt) AS DOUBLE), 6) AS p_two_sided,
       round(CAST(SUM(CASE WHEN k >= n11 THEN wt END) AS DOUBLE)
             / CAST(SUM(wt) AS DOUBLE), 6) AS p_upper
FROM w
GROUP BY n_name, n11, r1, c1, n
ORDER BY n_name
"""


@query("q_fisher_exact", oracle=FISHER_SQL)
def q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    exposed = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    outcome = F.col("o_orderstatus") == "F"
    cells = (
        c.orders.join(
            F.broadcast(c.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(c.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.when(exposed & outcome, 1).otherwise(0)).alias("n11"),
            F.sum(F.when(exposed, 1).otherwise(0)).alias("r1"),
            F.sum(F.when(outcome, 1).otherwise(0)).alias("c1"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    r1, c1, n, k = F.col("r1"), F.col("c1"), F.col("n"), F.col("k")
    kmin = F.greatest(F.lit(0).cast("bigint"), r1 + c1 - n)
    support = cells.select(
        "n_name", "n11", "r1", "c1", "n",
        F.explode(F.sequence(kmin, F.least(r1, c1))).alias("k"),
    )
    lr = (
        F.when(k == kmin, F.lit(0).cast("decimal(24,12)"))
        .otherwise(
            F.round(
                F.log(
                    ((r1 - k + 1).cast("double") * (c1 - k + 1))
                    / (k.cast("double") * (n - r1 - c1 + k))
                ),
                12,
            ).cast("decimal(24,12)")
        )
        .alias("lr")
    )
    wcum = Window.partitionBy("n_name").orderBy("k")
    wall = Window.partitionBy("n_name")
    lw = support.select("*", lr).select(
        "*", F.sum("lr").over(wcum).alias("logw")
    )
    norm = lw.select(
        "*",
        F.max("logw").over(wall).alias("m"),
        F.max(F.when(k == F.col("n11"), F.col("logw"))).over(wall).alias(
            "lw_obs"
        ),
    )
    w = norm.select(
        "n_name", "n11", "r1", "c1", "n", "k", "logw", "lw_obs",
        F.round(F.exp((F.col("logw") - F.col("m")).cast("double")), 12)
        .cast("decimal(14,12)")
        .alias("wt"),
    )
    n11 = F.col("n11")
    return (
        w.groupBy("n_name", "n11", "r1", "c1", "n")
        .agg(
            F.sum(F.when(F.col("logw") <= F.col("lw_obs"), F.col("wt")))
            .alias("s_two"),
            F.sum(F.when(k >= n11, F.col("wt"))).alias("s_up"),
            F.sum("wt").alias("s_all"),
        )
        .select(
            "n_name",
            n11.cast("bigint").alias("n11"),
            (r1 - n11).cast("bigint").alias("n12"),
            (c1 - n11).cast("bigint").alias("n21"),
            (n - r1 - c1 + n11).cast("bigint").alias("n22"),
            F.when(
                (r1 - n11) * (c1 - n11) > 0,
                F.round(
                    (n11.cast("double") * (n - r1 - c1 + n11))
                    / ((r1 - n11).cast("double") * (c1 - n11)),
                    6,
                ),
            ).alias("odds_ratio"),
            F.round(
                F.col("s_two").cast("double") / F.col("s_all").cast("double"), 6
            ).alias("p_two_sided"),
            F.round(
                F.col("s_up").cast("double") / F.col("s_all").cast("double"), 6
            ).alias("p_upper"),
        )
        .orderBy("n_name")
    )


# -- q_cox_onestep -----------------------------------------------------
#
# Cox proportional-hazards one-step estimator (single Newton step from
# beta = 0, Breslow ties) for the ASIA-region effect on time-to-repeat
# purchase: at the null the risk-set covariate mean is just the
# exposed-at-risk share p(t) = n1/n, so the score U = sum(d1 - d*p)
# and information I = sum(d*p*(1-p)) come straight off the same
# event-time grid q_survival_km builds — suffix at-risk counts from
# one prefix window per group, no per-event risk-set join. beta = U/I,
# HR = exp(beta), Wald 95% CI. Terms are 9-rounded decimals summed
# exactly; the finale is the only double chain. The companion ESTIMATE
# to q_logrank's TEST (different covariate: region, not segment).

COX_SQL = """
WITH obs0 AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
         MIN(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey) AS d1
  FROM orders
), fs AS (
  SELECT o_custkey, d1, MIN(CASE WHEN od > d1 THEN od END) AS d2
  FROM obs0 GROUP BY 1, 2
), endd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS de FROM orders),
obs AS (
  SELECT CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS grp,
         CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
              ELSE date_diff('day', d1, de) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM fs CROSS JOIN endd
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
), gtot AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng FROM obs GROUP BY 1
), tg AS (
  SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM obs GROUP BY 1, 2
), times AS (SELECT DISTINCT t FROM tg),
grid AS (
  SELECT g.grp, times.t,
         COALESCE(tg.d, 0) AS d, COALESCE(tg.c, 0) AS c
  FROM times CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
  LEFT JOIN tg ON tg.grp = g.grp AND tg.t = times.t
), atrisk AS (
  SELECT grp, t, d,
         ng - COALESCE(CAST(SUM(c) OVER (PARTITION BY grp ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS nr
  FROM grid JOIN gtot USING (grp)
), wide AS (
  SELECT t,
         MAX(CASE WHEN grp = 1 THEN d END) AS d1,
         MAX(CASE WHEN grp = 0 THEN d END) AS d0,
         MAX(CASE WHEN grp = 1 THEN nr END) AS n1,
         MAX(CASE WHEN grp = 0 THEN nr END) AS n0
  FROM wide_src
), terms AS (
  SELECT CAST(d1 AS BIGINT) AS d1, d1 + d0 AS d, n1 + n0 AS n,
         CAST(round((d1 + d0) * n1 / CAST(n1 + n0 AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS e1,
         CAST(round((d1 + d0)
                    * (n1 / CAST(n1 + n0 AS DOUBLE))
                    * (n0 / CAST(n1 + n0 AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS i_t
  FROM wide
  WHERE d1 + d0 > 0 AND n1 + n0 > 0
), m AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(e1) AS DECIMAL(28,9)) AS e1,
         CAST(SUM(i_t) AS DECIMAL(28,9)) AS inf,
         (SELECT COUNT(*) FROM obs) AS n_subjects,
         (SELECT SUM(ev) FROM obs) AS n_events,
         (SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) FROM obs)
           AS n_exposed
  FROM terms
)
SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_exposed AS BIGINT) AS n_exposed,
       round((o1 - CAST(e1 AS DOUBLE)) / CAST(inf AS DOUBLE), 6) AS beta,
       round(exp((o1 - CAST(e1 AS DOUBLE)) / CAST(inf AS DOUBLE)), 6)
         AS hazard_ratio,
       round(1 / sqrt(CAST(inf AS DOUBLE)), 6) AS se,
       round(exp((o1 - CAST(e1 AS DOUBLE)) / CAST(inf AS DOUBLE)
                 - 1.96 / sqrt(CAST(inf AS DOUBLE))), 6) AS hr_ci_lo,
       round(exp((o1 - CAST(e1 AS DOUBLE)) / CAST(inf AS DOUBLE)
                 + 1.96 / sqrt(CAST(inf AS DOUBLE))), 6) AS hr_ci_hi
FROM m
"""
COX_SQL = COX_SQL.replace("FROM wide_src", "FROM atrisk GROUP BY 1")


@query("q_cox_onestep", oracle=COX_SQL)
def q_cox_onestep(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    wc = Window.partitionBy("o_custkey")
    obs0 = c.orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.min(F.col("o_orderdate").cast("date")).over(wc).alias("d1"),
    )
    fs = obs0.groupBy("o_custkey", "d1").agg(
        F.min(F.when(F.col("od") > F.col("d1"), F.col("od"))).alias("d2")
    )
    endd = c.orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("de"))
    cust = (
        c.customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(c.nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(c.region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "c_custkey",
            F.when(F.col("r_name") == "ASIA", 1).otherwise(0).alias("grp"),
        )
    )
    obs = (
        fs.join(F.broadcast(endd))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "grp",
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("de", "d1"))
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
        .localCheckpoint()
    )
    gtot = obs.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("ng"))
    tg = obs.groupBy("grp", "t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    times = tg.select("t").distinct()
    groups = obs.sparkSession.createDataFrame([(0,), (1,)], ["grp"])
    grid = (
        times.crossJoin(F.broadcast(groups))
        .join(tg, ["grp", "t"], "left")
        .select(
            "grp", "t",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wpre = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    atrisk = grid.join(F.broadcast(gtot), "grp").select(
        "grp", "t", "d",
        (
            F.col("ng")
            - F.coalesce(F.sum("c").over(wpre).cast("bigint"), F.lit(0))
        ).alias("nr"),
    )
    wide = atrisk.groupBy("t").agg(
        F.max(F.when(F.col("grp") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("grp") == 0, F.col("d"))).alias("d0"),
        F.max(F.when(F.col("grp") == 1, F.col("nr"))).alias("n1"),
        F.max(F.when(F.col("grp") == 0, F.col("nr"))).alias("n0"),
    )
    d1, d0, n1, n0 = (F.col(x) for x in ["d1", "d0", "n1", "n0"])
    terms = wide.filter((d1 + d0 > 0) & (n1 + n0 > 0)).select(
        d1.cast("bigint").alias("d1"),
        F.round((d1 + d0) * n1 / (n1 + n0).cast("double"), 9)
        .cast("decimal(18,9)")
        .alias("e1"),
        F.round(
            (d1 + d0)
            * (n1 / (n1 + n0).cast("double"))
            * (n0 / (n1 + n0).cast("double")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("i_t"),
    )
    m = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1").cast("decimal(28,9)").alias("e1"),
        F.sum("i_t").cast("decimal(28,9)").alias("inf"),
    )
    tot = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum("ev").cast("bigint").alias("n_events"),
        F.sum("grp").cast("bigint").alias("n_exposed"),
    )
    beta = (F.col("o1") - F.col("e1").cast("double")) / F.col("inf").cast(
        "double"
    )
    half = 1.96 / F.sqrt(F.col("inf").cast("double"))
    return m.join(F.broadcast(tot)).select(
        "n_subjects",
        "n_events",
        "n_exposed",
        F.round(beta, 6).alias("beta"),
        F.round(F.exp(beta), 6).alias("hazard_ratio"),
        F.round(1 / F.sqrt(F.col("inf").cast("double")), 6).alias("se"),
        F.round(F.exp(beta - half), 6).alias("hr_ci_lo"),
        F.round(F.exp(beta + half), 6).alias("hr_ci_hi"),
    )


# -- q_ph_assumption ---------------------------------------------------
#
# Proportional-hazards assumption check (Grambsch-Therneau lite) for
# the q_cox_onestep model: the per-event-time Schoenfeld-style
# residual r(t) = d1(t) - d(t) * n1(t)/n(t) is correlated with event
# time — a nonzero trend means the ASIA effect grows or fades with
# tenure and the single hazard-ratio summary is misleading. The
# residual grid is the SAME suffix at-risk construction as
# q_cox_onestep/q_logrank; the correlation-with-time z uses the
# house exact-moment chain over 9-rounded residuals.

PH_SQL = """
WITH obs0 AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
         MIN(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey) AS d1
  FROM orders
), fs AS (
  SELECT o_custkey, d1, MIN(CASE WHEN od > d1 THEN od END) AS d2
  FROM obs0 GROUP BY 1, 2
), endd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS de FROM orders),
obs AS (
  SELECT CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS grp,
         CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
              ELSE date_diff('day', d1, de) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM fs CROSS JOIN endd
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
), gtot AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng FROM obs GROUP BY 1
), tg AS (
  SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM obs GROUP BY 1, 2
), times AS (SELECT DISTINCT t FROM tg),
grid AS (
  SELECT g.grp, times.t,
         COALESCE(tg.d, 0) AS d, COALESCE(tg.c, 0) AS c
  FROM times CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
  LEFT JOIN tg ON tg.grp = g.grp AND tg.t = times.t
), atrisk AS (
  SELECT grp, t, d,
         ng - COALESCE(CAST(SUM(c) OVER (PARTITION BY grp ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS nr
  FROM grid JOIN gtot USING (grp)
), wide AS (
  SELECT t,
         MAX(CASE WHEN grp = 1 THEN d END) AS d1,
         MAX(CASE WHEN grp = 0 THEN d END) AS d0,
         MAX(CASE WHEN grp = 1 THEN nr END) AS n1,
         MAX(CASE WHEN grp = 0 THEN nr END) AS n0
  FROM atrisk GROUP BY 1
), resid AS (
  SELECT CAST(t AS DOUBLE) AS x,
         CAST(round(d1 - (d1 + d0) * n1 / CAST(n1 + n0 AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS r
  FROM wide WHERE d1 + d0 > 0 AND n1 + n0 > 0
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(x, 4) AS DECIMAL(24,4))) AS DOUBLE) AS sx,
         CAST(SUM(r) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 4) AS DECIMAL(32,4))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(round(x * CAST(r AS DOUBLE), 6)
                       AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(r AS DOUBLE) * CAST(r AS DOUBLE), 9)
                       AS DECIMAL(24,9))) AS DOUBLE) AS syy
  FROM resid
)
SELECT CAST(n AS BIGINT) AS n_event_times,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS schoenfeld_time_corr,
       round(sqrt(CAST(n AS DOUBLE))
             * (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS z_stat,
       CAST(CASE WHEN abs(sqrt(CAST(n AS DOUBLE))
                          * (n * sxy - sx * sy)
                          / sqrt((n * sxx - sx * sx)
                                 * (n * syy - sy * sy))) > 1.96
            THEN 1 ELSE 0 END AS BIGINT) AS ph_violated
FROM mom
"""


@query("q_ph_assumption", oracle=PH_SQL)
def q_ph_assumption(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    wc = Window.partitionBy("o_custkey")
    obs0 = cat.orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.min(F.col("o_orderdate").cast("date")).over(wc).alias("d1"),
    )
    fs = obs0.groupBy("o_custkey", "d1").agg(
        F.min(F.when(F.col("od") > F.col("d1"), F.col("od"))).alias("d2")
    )
    endd = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("de")
    )
    cust = (
        cat.customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "c_custkey",
            F.when(F.col("r_name") == "ASIA", 1).otherwise(0).alias("grp"),
        )
    )
    obs = (
        fs.join(F.broadcast(endd))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "grp",
            F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
            .otherwise(F.datediff("de", "d1"))
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
        .localCheckpoint()
    )
    gtot = obs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng")
    )
    tg = obs.groupBy("grp", "t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    times = tg.select("t").distinct()
    groups = obs.sparkSession.createDataFrame([(0,), (1,)], ["grp"])
    grid = (
        times.crossJoin(F.broadcast(groups))
        .join(tg, ["grp", "t"], "left")
        .select(
            "grp", "t",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wpre = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    atrisk = grid.join(F.broadcast(gtot), "grp").select(
        "grp", "t", "d",
        (
            F.col("ng")
            - F.coalesce(F.sum("c").over(wpre).cast("bigint"), F.lit(0))
        ).alias("nr"),
    )
    wide = atrisk.groupBy("t").agg(
        F.max(F.when(F.col("grp") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("grp") == 0, F.col("d"))).alias("d0"),
        F.max(F.when(F.col("grp") == 1, F.col("nr"))).alias("n1"),
        F.max(F.when(F.col("grp") == 0, F.col("nr"))).alias("n0"),
    )
    d1, d0, n1, n0 = (F.col(x) for x in ["d1", "d0", "n1", "n0"])
    resid = wide.filter((d1 + d0 > 0) & (n1 + n0 > 0)).select(
        F.col("t").cast("double").alias("x"),
        F.round(
            d1 - (d1 + d0) * n1 / (n1 + n0).cast("double"), 9
        )
        .cast("decimal(18,9)")
        .alias("r"),
    )
    xd = F.col("x")
    rd = F.col("r").cast("double")
    mom = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(xd, 4).cast("decimal(24,4)")).cast("double")
        .alias("sx"),
        F.sum("r").cast("double").alias("sy"),
        F.sum(F.round(xd * xd, 4).cast("decimal(32,4)")).cast("double")
        .alias("sxx"),
        F.sum(F.round(xd * rd, 6).cast("decimal(28,6)")).cast("double")
        .alias("sxy"),
        F.sum(F.round(rd * rd, 9).cast("decimal(24,9)")).cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    z = F.sqrt(n.cast("double")) * corr
    return mom.select(
        n.cast("bigint").alias("n_event_times"),
        F.round(corr, 6).alias("schoenfeld_time_corr"),
        F.round(z, 6).alias("z_stat"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("bigint")
        .alias("ph_violated"),
    )


# -- q_meta_analysis ---------------------------------------------------
#
# Fixed- and random-effects meta-analysis (DerSimonian-Laird) pooling
# the per-nation URGENT/HIGH -> status-F log odds ratios: y_i = ln OR
# with variance v_i = 1/a + 1/b + 1/c + 1/d per nation "study",
# inverse-variance fixed pooling, Cochran Q heterogeneity, I^2, the
# DL tau^2 moment estimator, and the random-effects re-pool with
# widened weights — the method family that turns 25 per-nation
# q_fisher_exact tables into ONE defensible effect estimate. All
# weight/Q terms are 9-rounded decimals folded exactly; the grid is
# |nations| rows after one fact scan.

META_SQL = """
WITH cells AS (
  SELECT n_name,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
), yv AS (
  SELECT n_name,
         ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)) AS y,
         1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d AS v
  FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
), fe AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(round(1 / v, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(round(y / v, 9) AS DECIMAL(20,9))) AS DOUBLE) AS swy,
         CAST(SUM(CAST(round(1 / (v * v), 9) AS DECIMAL(24,9)))
              AS DOUBLE) AS sw2
  FROM yv
), q AS (
  SELECT k, sw, swy, sw2, swy / sw AS mu_fe,
         CAST(SUM(CAST(round((yv.y - swy / sw) * (yv.y - swy / sw) / yv.v,
                             9) AS DECIMAL(20,9))) AS DOUBLE) AS qstat
  FROM yv CROSS JOIN fe
  GROUP BY k, sw, swy, sw2
), tau AS (
  SELECT *,
         GREATEST((qstat - (k - 1)) / (sw - sw2 / sw), 0.0) AS tau2
  FROM q
), re AS (
  SELECT tau.k, tau.mu_fe, tau.sw, tau.qstat, tau.tau2,
         CAST(SUM(CAST(round(1 / (yv.v + tau.tau2), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS swr,
         CAST(SUM(CAST(round(yv.y / (yv.v + tau.tau2), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS swyr
  FROM yv CROSS JOIN tau
  GROUP BY 1, 2, 3, 4, 5
)
SELECT CAST(k AS BIGINT) AS k_studies,
       round(exp(mu_fe), 6) AS or_fixed,
       round(exp(mu_fe - 1.96 / sqrt(sw)), 6) AS or_fixed_lo,
       round(exp(mu_fe + 1.96 / sqrt(sw)), 6) AS or_fixed_hi,
       round(qstat, 6) AS cochran_q,
       round(GREATEST((qstat - (k - 1)) / qstat, 0.0), 6) AS i2,
       round(tau2, 6) AS tau2,
       round(exp(swyr / swr), 6) AS or_random,
       round(exp(swyr / swr - 1.96 / sqrt(swr)), 6) AS or_random_lo,
       round(exp(swyr / swr + 1.96 / sqrt(swr)), 6) AS or_random_hi
FROM re
"""


@query("q_meta_analysis", oracle=META_SQL)
def q_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    exposed = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    outcome = F.col("o_orderstatus") == "F"
    cells = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.when(exposed & outcome, 1).otherwise(0)).alias("a"),
            F.sum(F.when(exposed & ~outcome, 1).otherwise(0)).alias("b"),
            F.sum(F.when(~exposed & outcome, 1).otherwise(0)).alias("c"),
            F.sum(F.when(~exposed & ~outcome, 1).otherwise(0)).alias("d"),
        )
    )
    a, b, c, d = (F.col(x) for x in ["a", "b", "c", "d"])
    yv = (
        cells.filter((a > 0) & (b > 0) & (c > 0) & (d > 0))
        .select(
            "n_name",
            F.log((a.cast("double") * d) / (b.cast("double") * c))
            .alias("y"),
            (1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d).alias("v"),
        )
        .localCheckpoint()
    )
    y, v = F.col("y"), F.col("v")
    r9 = lambda e, p=20: F.round(e, 9).cast(f"decimal({p},9)")  # noqa: E731
    fe = yv.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(r9(1 / v)).cast("double").alias("sw"),
        F.sum(r9(y / v)).cast("double").alias("swy"),
        F.sum(r9(1 / (v * v), 24)).cast("double").alias("sw2"),
    )
    mu_fe = F.col("swy") / F.col("sw")
    q = (
        yv.join(F.broadcast(fe))
        .groupBy("k", "sw", "swy", "sw2")
        .agg(
            F.sum(r9((y - mu_fe) * (y - mu_fe) / v))
            .cast("double")
            .alias("qstat")
        )
    )
    tau = q.select(
        "*",
        F.greatest(
            (F.col("qstat") - (F.col("k") - 1))
            / (F.col("sw") - F.col("sw2") / F.col("sw")),
            F.lit(0.0),
        ).alias("tau2"),
        mu_fe.alias("mu_fe"),
    )
    re = (
        yv.join(F.broadcast(tau))
        .groupBy("k", "mu_fe", "sw", "qstat", "tau2")
        .agg(
            F.sum(r9(1 / (v + F.col("tau2")))).cast("double").alias("swr"),
            F.sum(r9(y / (v + F.col("tau2")))).cast("double").alias("swyr"),
        )
    )
    k, sw, qs, tau2 = (F.col(x) for x in ["k", "sw", "qstat", "tau2"])
    mu = F.col("mu_fe")
    mur = F.col("swyr") / F.col("swr")
    return re.select(
        k.cast("bigint").alias("k_studies"),
        F.round(F.exp(mu), 6).alias("or_fixed"),
        F.round(F.exp(mu - 1.96 / F.sqrt(sw)), 6).alias("or_fixed_lo"),
        F.round(F.exp(mu + 1.96 / F.sqrt(sw)), 6).alias("or_fixed_hi"),
        F.round(qs, 6).alias("cochran_q"),
        F.round(F.greatest((qs - (k - 1)) / qs, F.lit(0.0)), 6).alias("i2"),
        F.round(tau2, 6).alias("tau2"),
        F.round(F.exp(mur), 6).alias("or_random"),
        F.round(F.exp(mur - 1.96 / F.sqrt(F.col("swr"))), 6)
        .alias("or_random_lo"),
        F.round(F.exp(mur + 1.96 / F.sqrt(F.col("swr"))), 6)
        .alias("or_random_hi"),
    )


# -- q_msprt -----------------------------------------------------------
#
# Always-valid sequential inference (mSPRT, the Optimizely "always
# valid p-value"): the md5-split two-arm experiment monitored DAILY,
# with the normal-mixture likelihood ratio Lambda_n =
# sqrt(V/(V+tau2)) * exp(tau2 * d^2 / (2V(V+tau2))) at each day's
# cumulative arm means (V = sigma2(1/n_c + 1/n_t), plug-in pooled
# sigma2, tau2 = 400 documented), and p_n = 1/max_{k<=n} Lambda_k
# monotone non-increasing — the peeking-proof replacement for
# q_group_sequential's fixed looks. Cumulative counts/sums are exact
# decimal window folds; Lambda is one identical double chain,
# 9-rounded before the running max so the argmax is cross-engine
# stable. Scale: fact scan -> day grid; windows on the grid.

MSPRT_SQL = """
WITH t AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS arm,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL
), sig AS (
  SELECT (CAST(SUM(CAST(x AS DECIMAL(20,6)) * x) AS DOUBLE)
          - CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
            * CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1) AS s2
  FROM t
), d AS (
  SELECT day,
         CAST(SUM(arm) AS BIGINT) AS nt,
         CAST(SUM(1 - arm) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN arm = 1 THEN CAST(x AS DECIMAL(20,6))
                       ELSE CAST(0 AS DECIMAL(20,6)) END)
              AS DECIMAL(28,6)) AS st,
         CAST(SUM(CASE WHEN arm = 0 THEN CAST(x AS DECIMAL(20,6))
                       ELSE CAST(0 AS DECIMAL(20,6)) END)
              AS DECIMAL(28,6)) AS sc
  FROM t GROUP BY 1
), c AS (
  SELECT day,
         CAST(SUM(nt) OVER w AS BIGINT) AS cnt,
         CAST(SUM(nc) OVER w AS BIGINT) AS cnc,
         CAST(SUM(st) OVER w AS DECIMAL(32,6)) AS cst,
         CAST(SUM(sc) OVER w AS DECIMAL(32,6)) AS csc
  FROM d WINDOW w AS (ORDER BY day)
), lam AS (
  SELECT day, cnt, cnc,
         CAST(cst AS DOUBLE) / cnt - CAST(csc AS DOUBLE) / cnc AS diff,
         CAST(round(
           sqrt((s2 * (1.0 / cnt + 1.0 / cnc))
                / (s2 * (1.0 / cnt + 1.0 / cnc) + 400))
           * exp(400
                 * (CAST(cst AS DOUBLE) / cnt - CAST(csc AS DOUBLE) / cnc)
                 * (CAST(cst AS DOUBLE) / cnt - CAST(csc AS DOUBLE) / cnc)
                 / (2 * (s2 * (1.0 / cnt + 1.0 / cnc))
                    * (s2 * (1.0 / cnt + 1.0 / cnc) + 400))), 9)
           AS DECIMAL(28,9)) AS lambda_
  FROM c CROSS JOIN sig
  WHERE cnt > 0 AND cnc > 0
), run AS (
  SELECT day, cnt, cnc, diff, lambda_,
         MAX(lambda_) OVER (ORDER BY day) AS maxlam
  FROM lam
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       cnt AS n_treated, cnc AS n_control,
       round(diff, 6) AS diff,
       round(CAST(lambda_ AS DOUBLE), 6) AS lambda,
       round(LEAST(1.0, 1.0 / CAST(maxlam AS DOUBLE)), 6)
         AS always_valid_p,
       CAST(CASE WHEN 1.0 / CAST(maxlam AS DOUBLE) < 0.05
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM run
ORDER BY day
"""


@query("q_msprt", oracle=MSPRT_SQL)
def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    t = e.filter(F.col("value").isNotNull()).select(
        F.col("ts").cast("date").alias("day"),
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
            < "8",
            0,
        )
        .otherwise(1)
        .alias("arm"),
        F.round("value", 6).cast("decimal(18,6)").alias("x"),
    ).localCheckpoint()
    x20 = F.col("x").cast("decimal(20,6)")
    sig = t.agg(
        (
            (
                F.sum(x20 * F.col("x")).cast("double")
                - F.sum(x20).cast("double")
                * F.sum(x20).cast("double")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("s2")
    )
    zero = F.lit(0).cast("decimal(20,6)")
    arm = F.col("arm")
    d = t.groupBy("day").agg(
        F.sum(arm).cast("bigint").alias("nt"),
        F.sum(1 - arm).cast("bigint").alias("nc"),
        F.sum(F.when(arm == 1, x20).otherwise(zero))
        .cast("decimal(28,6)")
        .alias("st"),
        F.sum(F.when(arm == 0, x20).otherwise(zero))
        .cast("decimal(28,6)")
        .alias("sc"),
    )
    w = Window.orderBy("day")
    c = d.select(
        "day",
        F.sum("nt").over(w).cast("bigint").alias("cnt"),
        F.sum("nc").over(w).cast("bigint").alias("cnc"),
        F.sum("st").over(w).cast("decimal(32,6)").alias("cst"),
        F.sum("sc").over(w).cast("decimal(32,6)").alias("csc"),
    )
    cnt, cnc = F.col("cnt"), F.col("cnc")
    s2 = F.col("s2")
    diff = F.col("cst").cast("double") / cnt - F.col("csc").cast(
        "double"
    ) / cnc
    vv = s2 * (1.0 / cnt + 1.0 / cnc)
    tau2 = 400
    lam_expr = F.round(
        F.sqrt(vv / (vv + tau2))
        * F.exp(tau2 * diff * diff / (2 * vv * (vv + tau2))),
        9,
    ).cast("decimal(28,9)")
    lam = (
        c.join(F.broadcast(sig))
        .filter((cnt > 0) & (cnc > 0))
        .select(
            "day", "cnt", "cnc",
            diff.alias("diff"),
            lam_expr.alias("lambda_"),
        )
    )
    run = lam.select(
        "*", F.max("lambda_").over(Window.orderBy("day")).alias("maxlam")
    )
    ml = F.col("maxlam").cast("double")
    return run.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        cnt.alias("n_treated"),
        cnc.alias("n_control"),
        F.round("diff", 6).alias("diff"),
        F.round(F.col("lambda_").cast("double"), 6).alias("lambda"),
        F.round(F.least(F.lit(1.0), 1.0 / ml), 6).alias("always_valid_p"),
        F.when(1.0 / ml < 0.05, 1).otherwise(0).cast("bigint")
        .alias("significant"),
    ).orderBy("day")


# -- q_bayes_factor_bic ------------------------------------------------
#
# Bayes factor (BIC approximation) for the md5 two-arm experiment:
# BF10 ~= exp((BIC0 - BIC1)/2) comparing the one-mean null against
# the two-mean model, with BIC = n ln(RSS/n) + k ln n from EXACT
# decimal moment folds — the evidence statement ("data are X times
# more likely under a real difference") that q_ab_test's p-value
# cannot make, and the Bayesian sibling of q_group_sequential /
# q_msprt. Also reports ln BF (stable when BF overflows) and the
# Kass-Raftery verbal category thresholds as flags.

BFBIC_SQL = """
WITH t AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS arm,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), s AS (
  SELECT COUNT(*) AS n,
         SUM(arm) AS n1,
         CAST(SUM(x) AS DECIMAL(30,2)) AS sx,
         CAST(SUM(CASE WHEN arm = 1 THEN x
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(30,2)) AS sx1,
         CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sxx
  FROM t
), f AS (
  SELECT n, n1, n - n1 AS n0,
         CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS rss0,
         CAST(sxx AS DOUBLE)
           - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / n1
           - (CAST(sx AS DOUBLE) - CAST(sx1 AS DOUBLE))
             * (CAST(sx AS DOUBLE) - CAST(sx1 AS DOUBLE)) / (n - n1)
           AS rss1
  FROM s
), b AS (
  SELECT n, n1, n0,
         (n * ln(rss0 / n) + 2 * ln(CAST(n AS DOUBLE))
          - (n * ln(rss1 / n) + 3 * ln(CAST(n AS DOUBLE)))) / 2 AS lnbf
  FROM f
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n1 AS BIGINT) AS n_treated,
       round(lnbf, 6) AS ln_bf10,
       round(exp(lnbf), 6) AS bf10,
       CAST(CASE WHEN lnbf > ln(3.0) THEN 1 ELSE 0 END AS BIGINT)
         AS positive_evidence,
       CAST(CASE WHEN lnbf < -ln(3.0) THEN 1 ELSE 0 END AS BIGINT)
         AS supports_null
FROM b
"""


@query("q_bayes_factor_bic", oracle=BFBIC_SQL)
def q_bayes_factor_bic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    t = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8",
            0,
        )
        .otherwise(1)
        .alias("arm"),
        dec("o_totalprice").alias("x"),
    )
    x, arm = F.col("x"), F.col("arm")
    s = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(arm).alias("n1"),
        F.sum(x).cast("decimal(30,2)").alias("sx"),
        F.sum(F.when(arm == 1, x).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("decimal(30,2)")
        .alias("sx1"),
        F.sum((x * x).cast("decimal(28,4)")).cast("decimal(38,4)")
        .alias("sxx"),
    )
    n, n1 = F.col("n"), F.col("n1")
    sx = F.col("sx").cast("double")
    sx1 = F.col("sx1").cast("double")
    sxx = F.col("sxx").cast("double")
    rss0 = sxx - sx * sx / n
    rss1 = sxx - sx1 * sx1 / n1 - (sx - sx1) * (sx - sx1) / (n - n1)
    lnbf = (
        n * F.log(rss0 / n)
        + 2 * F.log(n.cast("double"))
        - (n * F.log(rss1 / n) + 3 * F.log(n.cast("double")))
    ) / 2
    import math

    ln3 = math.log(3.0)
    return s.select(
        n.cast("bigint").alias("n"),
        n1.cast("bigint").alias("n_treated"),
        F.round(lnbf, 6).alias("ln_bf10"),
        F.round(F.exp(lnbf), 6).alias("bf10"),
        F.when(lnbf > ln3, 1).otherwise(0).cast("bigint")
        .alias("positive_evidence"),
        F.when(lnbf < -ln3, 1).otherwise(0).cast("bigint")
        .alias("supports_null"),
    )


# -- q_evalue_sensitivity ----------------------------------------------
#
# VanderWeele-Ding E-value per nation for the URGENT/HIGH -> F-status
# risk ratio: the minimum strength of association an UNMEASURED
# confounder would need with both exposure and outcome to explain the
# observed RR away (E = RR + sqrt(RR(RR-1)) on the away-from-null
# scale; RR < 1 inverts first), plus the E-value for the CI bound
# closer to 1 (NULL when the CI crosses 1 — no confounding needed).
# The sensitivity-analysis layer q_rate_ratio's CI cannot express.
# Exact counts; log-RR CI via the standard delta-method SE.

EVALUE_SQL = """
WITH cells AS (
  SELECT n_name,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS n0
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
), rr AS (
  SELECT n_name, a, n1, c, n0,
         (a / CAST(n1 AS DOUBLE)) / (c / CAST(n0 AS DOUBLE)) AS rr,
         sqrt(1.0 / a - 1.0 / n1 + 1.0 / c - 1.0 / n0) AS se
  FROM cells WHERE a > 0 AND c > 0
), tx AS (
  SELECT n_name, rr,
         exp(ln(rr) - 1.96 * se) AS lo, exp(ln(rr) + 1.96 * se) AS hi,
         CASE WHEN rr >= 1 THEN rr ELSE 1 / rr END AS rstar,
         CASE WHEN rr >= 1 THEN exp(ln(rr) - 1.96 * se)
              ELSE 1 / exp(ln(rr) + 1.96 * se) END AS bstar
  FROM rr
)
SELECT n_name, round(rr, 6) AS risk_ratio,
       round(lo, 6) AS rr_ci_lo, round(hi, 6) AS rr_ci_hi,
       round(rstar + sqrt(rstar * (rstar - 1)), 6) AS evalue_point,
       CASE WHEN bstar > 1
            THEN round(bstar + sqrt(bstar * (bstar - 1)), 6) END
         AS evalue_ci
FROM tx
ORDER BY n_name
"""


@query("q_evalue_sensitivity", oracle=EVALUE_SQL)
def q_evalue_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    exposed = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    outcome = F.col("o_orderstatus") == "F"
    cells = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.when(exposed & outcome, 1).otherwise(0)).alias("a"),
            F.sum(F.when(exposed, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(~exposed & outcome, 1).otherwise(0)).alias("c"),
            F.sum(F.when(~exposed, 1).otherwise(0)).alias("n0"),
        )
    )
    a, n1, c, n0 = (F.col(k) for k in ["a", "n1", "c", "n0"])
    rr = (a / n1.cast("double")) / (c / n0.cast("double"))
    se = F.sqrt(1.0 / a - 1.0 / n1 + 1.0 / c - 1.0 / n0)
    base = cells.filter((a > 0) & (c > 0)).select(
        "n_name", rr.alias("rr"), se.alias("se")
    )
    rrc, sec = F.col("rr"), F.col("se")
    lo = F.exp(F.log(rrc) - 1.96 * sec)
    hi = F.exp(F.log(rrc) + 1.96 * sec)
    rstar = F.when(rrc >= 1, rrc).otherwise(1 / rrc)
    bstar = F.when(rrc >= 1, lo).otherwise(1 / hi)
    return base.select(
        "n_name",
        F.round(rrc, 6).alias("risk_ratio"),
        F.round(lo, 6).alias("rr_ci_lo"),
        F.round(hi, 6).alias("rr_ci_hi"),
        F.round(rstar + F.sqrt(rstar * (rstar - 1)), 6)
        .alias("evalue_point"),
        F.when(
            bstar > 1, F.round(bstar + F.sqrt(bstar * (bstar - 1)), 6)
        ).alias("evalue_ci"),
    ).orderBy("n_name")


# -- q_effect_sizes ----------------------------------------------------
#
# Standardized effect-size panel for the md5 two-arm experiment:
# Cohen's d (pooled sd), Hedges' g (small-sample corrected via the
# J = 1 - 3/(4df - 1) factor), Glass's delta (control-sd denominator,
# for unequal variances), and the common-language effect size
# Phi(d / sqrt(2)) under normality (reported via the house
# Zelen-Severo Phi approximation) — the reporting layer journals
# demand where q_ab_test stops at a p-value. All moments are exact
# decimal folds shared across the four statistics.

EFFSIZE_SQL = """
WITH t AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS arm,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), s AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(x) AS DECIMAL(30,2)) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sxx
  FROM t GROUP BY 1
), w AS (
  SELECT
    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
    MAX(CASE WHEN arm = 1 THEN CAST(sx AS DOUBLE) END) AS sx1,
    MAX(CASE WHEN arm = 0 THEN CAST(sx AS DOUBLE) END) AS sx0,
    MAX(CASE WHEN arm = 1 THEN CAST(sxx AS DOUBLE) END) AS sxx1,
    MAX(CASE WHEN arm = 0 THEN CAST(sxx AS DOUBLE) END) AS sxx0
  FROM s
), f AS (
  SELECT n1, n0,
         sx1 / n1 - sx0 / n0 AS diff,
         (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
         (sxx0 - sx0 * sx0 / n0) / (n0 - 1) AS v0
  FROM w
), d AS (
  SELECT n1, n0, diff, v1, v0,
         diff / sqrt(((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2))
           AS cohen_d
  FROM f
)
SELECT CAST(n1 AS BIGINT) AS n_treated, CAST(n0 AS BIGINT) AS n_control,
       round(diff, 4) AS mean_diff,
       round(cohen_d, 6) AS cohens_d,
       round(cohen_d * (1 - 3.0 / (4 * (n1 + n0 - 2) - 1)), 6)
         AS hedges_g,
       round(diff / sqrt(v0), 6) AS glass_delta,
       round(1 - 0.5 * pow(1 + 0.196854 * abs(cohen_d / sqrt(2.0))
                           + 0.115194 * pow(abs(cohen_d / sqrt(2.0)), 2)
                           + 0.000344 * pow(abs(cohen_d / sqrt(2.0)), 3)
                           + 0.019527 * pow(abs(cohen_d / sqrt(2.0)), 4),
                           -4), 6) AS cles
FROM d
"""


@query("q_effect_sizes", oracle=EFFSIZE_SQL)
def q_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    t = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8",
            0,
        )
        .otherwise(1)
        .alias("arm"),
        dec("o_totalprice").alias("x"),
    )
    x = F.col("x")
    s = t.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("decimal(30,2)").alias("sx"),
        F.sum((x * x).cast("decimal(28,4)")).cast("decimal(38,4)")
        .alias("sxx"),
    )
    pick = lambda a, c, dbl=True: F.max(  # noqa: E731
        F.when(
            F.col("arm") == a,
            F.col(c).cast("double") if dbl else F.col(c),
        )
    )
    w = s.agg(
        pick(1, "n", False).alias("n1"),
        pick(0, "n", False).alias("n0"),
        pick(1, "sx").alias("sx1"),
        pick(0, "sx").alias("sx0"),
        pick(1, "sxx").alias("sxx1"),
        pick(0, "sxx").alias("sxx0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    diff = F.col("sx1") / n1 - F.col("sx0") / n0
    v1 = (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1) / (n1 - 1)
    v0 = (F.col("sxx0") - F.col("sx0") * F.col("sx0") / n0) / (n0 - 1)
    d = diff / F.sqrt(((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2))
    z = F.abs(d / F.sqrt(F.lit(2.0)))
    cles = 1 - 0.5 * F.pow(
        1
        + 0.196854 * z
        + 0.115194 * F.pow(z, 2)
        + 0.000344 * F.pow(z, 3)
        + 0.019527 * F.pow(z, 4),
        -4,
    )
    return w.select(
        n1.cast("bigint").alias("n_treated"),
        n0.cast("bigint").alias("n_control"),
        F.round(diff, 4).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1 - 3.0 / (4 * (n1 + n0 - 2) - 1)), 6)
        .alias("hedges_g"),
        F.round(diff / F.sqrt(v0), 6).alias("glass_delta"),
        F.round(cles, 6).alias("cles"),
    )


# -- q_bland_altman ----------------------------------------------------
#
# Bland-Altman agreement analysis between the two independent
# measurements of each order's value that the schema actually
# carries: the header total o_totalprice vs the line-reconstructed
# sum(extendedprice * (1 - discount) * (1 + tax)) — bias and 95%
# limits of agreement expressed as a share of the mean order total
# (O(1)-normalized before rounding per the cross-engine round-safety
# rule), plus the share of orders outside the limits. The named method-comparison
# analysis behind every "do these two systems agree" reconciliation.
# Differences are exact decimals (per-line products rounded to cents
# before the fold); moments are exact; the limits are one double
# chain.

BLAND_SQL = """
WITH line AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax), 2) AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS m2
  FROM lineitem GROUP BY 1
), pairs AS (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS m1, line.m2,
         CAST(o_totalprice AS DECIMAL(18,2)) - line.m2 AS d
  FROM orders JOIN line ON l_orderkey = o_orderkey
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(d) AS DECIMAL(30,2)) AS sd1,
         CAST(SUM(CAST(d * d AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sd2,
         CAST(SUM(m1) AS DECIMAL(32,2)) AS sm1
  FROM pairs
), lim AS (
  SELECT n,
         (CAST(sd1 AS DOUBLE) / n) / (CAST(sm1 AS DOUBLE) / n) AS bias,
         sqrt((CAST(sd2 AS DOUBLE)
               - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE) / n)
              / (n - 1)) / (CAST(sm1 AS DOUBLE) / n) AS sdd,
         CAST(sm1 AS DOUBLE) / n AS mbar
  FROM mom
)
SELECT CAST(l.n AS BIGINT) AS n_orders,
       round(l.bias, 6) AS bias_pct_of_mean,
       round(l.bias - 1.96 * l.sdd, 6) AS loa_lo_pct,
       round(l.bias + 1.96 * l.sdd, 6) AS loa_hi_pct,
       round(SUM(CASE WHEN CAST(p.d AS DOUBLE) / l.mbar
                           < round(l.bias - 1.96 * l.sdd, 6)
                       OR CAST(p.d AS DOUBLE) / l.mbar
                           > round(l.bias + 1.96 * l.sdd, 6)
                      THEN 1 ELSE 0 END) / CAST(l.n AS DOUBLE), 6)
         AS outside_loa_rate
FROM pairs p CROSS JOIN lim l
GROUP BY l.n, l.bias, l.sdd, l.mbar
"""


@query("q_bland_altman", oracle=BLAND_SQL)
def q_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    line = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                2,
            ).cast("decimal(18,2)")
        )
        .cast("decimal(24,2)")
        .alias("m2")
    )
    pairs = (
        cat.orders.join(line, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (dec("o_totalprice") - F.col("m2")).alias("d"),
            dec("o_totalprice").alias("m1"),
        )
        .localCheckpoint()
    )
    d = F.col("d")
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("decimal(30,2)").alias("sd1"),
        F.sum((d * d).cast("decimal(28,4)")).cast("decimal(38,4)")
        .alias("sd2"),
        F.sum("m1").cast("decimal(32,2)").alias("sm1"),
    )
    n = F.col("n")
    sd1, sd2 = F.col("sd1").cast("double"), F.col("sd2").cast("double")
    mbar = F.col("sm1").cast("double") / n
    lim = mom.select(
        n,
        ((sd1 / n) / mbar).alias("bias"),
        (F.sqrt((sd2 - sd1 * sd1 / n) / (n - 1)) / mbar).alias("sdd"),
        mbar.alias("mbar"),
    )
    lo = F.round(F.col("bias") - 1.96 * F.col("sdd"), 6)
    hi = F.round(F.col("bias") + 1.96 * F.col("sdd"), 6)
    dp = d.cast("double") / F.col("mbar")
    return (
        pairs.join(F.broadcast(lim))
        .groupBy("n", "bias", "sdd", "mbar")
        .agg(
            F.round(
                F.sum(
                    F.when((dp < lo) | (dp > hi), 1).otherwise(0)
                )
                / n.cast("double"),
                6,
            ).alias("outside_loa_rate")
        )
        .select(
            n.cast("bigint").alias("n_orders"),
            F.round("bias", 6).alias("bias_pct_of_mean"),
            lo.alias("loa_lo_pct"),
            hi.alias("loa_hi_pct"),
            "outside_loa_rate",
        )
    )


# -- q_lee_bounds ------------------------------------------------------
#
# Lee (2009) bounds for the md5 pseudo-treatment effect on FIRST-YEAR
# spend under differential attrition: only customers who order at all
# have an outcome, so if the arms "retain" at different rates the
# naive conditional-on-ordering contrast is selection-biased. The
# treated outcome distribution is trimmed by the differential share
# p = (ret_t - ret_c)/ret_t from the top (lower bound) and bottom
# (upper bound) via EXACT rank cutoffs (floor(p*n) rows, ties broken
# on custkey), giving sharp bounds on the effect for always-takers.
# The bounds framing q_ips_policy_eval / q_cem_att assume away.
# Counts and trimmed decimal sums are exact; four double divisions.

LEE_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
cust AS (
  SELECT c_custkey,
         CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS arm
  FROM customer
), outc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS y
  FROM orders CROSS JOIN mx
  WHERE CAST(o_orderdate AS DATE) >= dmax - 365
  GROUP BY 1
), j AS (
  SELECT c.arm, o.y FROM cust c
  LEFT JOIN outc o ON o.o_custkey = c.c_custkey
), ret AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(CASE WHEN y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS resp
  FROM j GROUP BY 1
), p AS (
  SELECT GREATEST(
           ((SELECT resp / CAST(n AS DOUBLE) FROM ret WHERE arm = 1)
            - (SELECT resp / CAST(n AS DOUBLE) FROM ret WHERE arm = 0))
           / (SELECT resp / CAST(n AS DOUBLE) FROM ret WHERE arm = 1),
           0.0) AS trim
), tr AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY y, rowid_) AS r,
         COUNT(*) OVER () AS n
  FROM (SELECT c.c_custkey AS rowid_, o.y
        FROM cust c JOIN outc o ON o.o_custkey = c.c_custkey
        WHERE c.arm = 1)
), ctrl AS (
  SELECT CAST(SUM(o.y) AS DOUBLE) / COUNT(*) AS mu_c
  FROM cust c JOIN outc o ON o.o_custkey = c.c_custkey
  WHERE c.arm = 0
), cut AS (
  SELECT CAST(floor(trim * (SELECT MAX(n) FROM tr)) AS BIGINT) AS k,
         trim
  FROM p
), bounds AS (
  SELECT
    (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) FROM tr CROSS JOIN cut
     WHERE r <= (SELECT MAX(n) FROM tr) - k) AS mu_lo,
    (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) FROM tr CROSS JOIN cut
     WHERE r > k) AS mu_hi
)
SELECT round((SELECT trim FROM p), 6) AS trim_share,
       round((SELECT mu_c FROM ctrl), 4) AS control_mean,
       round(mu_lo - (SELECT mu_c FROM ctrl), 4) AS effect_lower,
       round(mu_hi - (SELECT mu_c FROM ctrl), 4) AS effect_upper
FROM bounds
"""


@query("q_lee_bounds", oracle=LEE_SQL)
def q_lee_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax")
    )
    cust = cat.customer.select(
        "c_custkey",
        F.when(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
            < "8",
            0,
        )
        .otherwise(1)
        .alias("arm"),
    )
    outc = (
        cat.orders.join(F.broadcast(mx))
        .filter(
            F.col("o_orderdate").cast("date")
            >= F.date_sub(F.col("dmax"), 365)
        )
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("y"))
    )
    j = cust.join(
        outc, F.col("o_custkey") == F.col("c_custkey"), "left"
    ).select("c_custkey", "arm", "y").localCheckpoint()
    ret = j.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("y").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("resp"),
    )
    rates = ret.agg(
        F.max(
            F.when(
                F.col("arm") == 1, F.col("resp") / F.col("n").cast("double")
            )
        ).alias("rt"),
        F.max(
            F.when(
                F.col("arm") == 0, F.col("resp") / F.col("n").cast("double")
            )
        ).alias("rc"),
    )
    p = rates.select(
        F.greatest(
            (F.col("rt") - F.col("rc")) / F.col("rt"), F.lit(0.0)
        ).alias("trim")
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tr = (
        j.filter((F.col("arm") == 1) & F.col("y").isNotNull())
        .select(
            "y",
            F.row_number().over(Window.orderBy("y", "c_custkey")).alias("r"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        .localCheckpoint()
    )
    ctrl = (
        j.filter((F.col("arm") == 0) & F.col("y").isNotNull())
        .agg(
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu_c")
        )
    )
    cut = tr.agg(F.max("n").alias("nt")).join(F.broadcast(p)).select(
        F.floor(F.col("trim") * F.col("nt")).cast("bigint").alias("k"),
        "trim", "nt",
    )
    lo = (
        tr.join(F.broadcast(cut))
        .filter(F.col("r") <= F.col("nt") - F.col("k"))
        .agg(
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu_lo")
        )
    )
    hi = (
        tr.join(F.broadcast(cut))
        .filter(F.col("r") > F.col("k"))
        .agg(
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu_hi")
        )
    )
    return (
        lo.join(F.broadcast(hi))
        .join(F.broadcast(ctrl))
        .join(F.broadcast(p))
        .select(
            F.round("trim", 6).alias("trim_share"),
            F.round("mu_c", 4).alias("control_mean"),
            F.round(F.col("mu_lo") - F.col("mu_c"), 4)
            .alias("effect_lower"),
            F.round(F.col("mu_hi") - F.col("mu_c"), 4)
            .alias("effect_upper"),
        )
    )


# -- q_berkson_logit ---------------------------------------------------
#
# Berkson minimum-chi-square (grouped) logit for brand choice: within
# each (nation, month) market, ln(share_j / share_base) is regressed
# on the price premium (avg unit price_j - price_base), weighting
# each cell by the Berkson weight n*s_j*(1-s_j) — the discrete-choice
# price coefficient WITHOUT iterative MLE, the aggregate-logit
# classic (and the shape of BLP's inner loop). Markets keep only
# cells with >= 5 orders of both brands so log-shares are stable.
# Counts/prices are exact decimals; weighted moments fold 6-rounded
# terms exactly; beta is one double division.

BERKSON_SQL = """
WITH f AS (
  SELECT n_name, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
         p_brand,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS qty
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2, 3
), base AS (
  SELECT n_name, mon, c AS c0, rev AS rev0, qty AS qty0
  FROM f WHERE p_brand = 'Brand#11'
), cells AS (
  SELECT f.n_name, f.mon, f.p_brand, f.c, b.c0,
         CAST(f.c AS DOUBLE) / (f.c + b.c0) AS s,
         CAST(f.rev AS DOUBLE) / CAST(f.qty AS DOUBLE)
           - CAST(b.rev0 AS DOUBLE) / CAST(b.qty0 AS DOUBLE) AS dp,
         ln(CAST(f.c AS DOUBLE) / b.c0) AS lo
  FROM f JOIN base b ON b.n_name = f.n_name AND b.mon = f.mon
  WHERE f.p_brand <> 'Brand#11' AND f.c >= 5 AND b.c0 >= 5
), wts AS (
  SELECT lo, dp,
         (f0.c + c0) * s * (1 - s) AS w
  FROM cells f0
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(w, 6) AS DECIMAL(24,6))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(round(w * dp, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS swx,
         CAST(SUM(CAST(round(w * lo, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS swy,
         CAST(SUM(CAST(round(w * dp * dp, 6) AS DECIMAL(32,6)))
              AS DOUBLE) AS swxx,
         CAST(SUM(CAST(round(w * dp * lo, 6) AS DECIMAL(32,6)))
              AS DOUBLE) AS swxy
  FROM wts
)
SELECT CAST(n AS BIGINT) AS n_cells,
       round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 6)
         AS price_beta,
       round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
                    * swx) / sw, 6) AS intercept
FROM mom
"""
BERKSON_SQL = BERKSON_SQL.replace(
    """), wts AS (
  SELECT lo, dp,
         (f0.c + c0) * s * (1 - s) AS w
  FROM cells f0
),""",
    """), wts AS (
  SELECT lo, dp, (c + c0) * s * (1 - s) AS w
  FROM cells
),""",
)


@query("q_berkson_logit", oracle=BERKSON_SQL)
def q_berkson_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy(
            "n_name",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("mon"),
            "p_brand",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(dec("l_extendedprice")).cast("decimal(28,2)").alias("rev"),
            F.sum(dec("l_quantity")).cast("decimal(24,2)").alias("qty"),
        )
    )
    # Single-pass base attach (r11): the Brand#11 reference row is
    # pinned per (nation, month) cell with max(when(...)) over a
    # window on the grid instead of a grid self-join — f is consumed
    # once, so its checkpoint drops too. Cells whose (nation, month)
    # has no Brand#11 row get NULL c0, which the c0 >= 5 filter
    # rejects exactly like the old inner join.
    wnm = Window.partitionBy("n_name", "mon")
    b11 = lambda col: F.max(  # noqa: E731
        F.when(F.col("p_brand") == "Brand#11", F.col(col))
    ).over(wnm)
    cells = (
        f.select(
            "n_name", "mon", "p_brand", "c", "rev", "qty",
            b11("c").alias("c0"),
            b11("rev").alias("rev0"),
            b11("qty").alias("qty0"),
        )
        .filter(F.col("p_brand") != "Brand#11")
        .filter((F.col("c") >= 5) & (F.col("c0") >= 5))
        .select(
            "c", "c0",
            (F.col("c").cast("double") / (F.col("c") + F.col("c0")))
            .alias("s"),
            (
                F.col("rev").cast("double") / F.col("qty").cast("double")
                - F.col("rev0").cast("double") / F.col("qty0").cast("double")
            ).alias("dp"),
            F.log(F.col("c").cast("double") / F.col("c0")).alias("lo"),
        )
    )
    w = (F.col("c") + F.col("c0")) * F.col("s") * (1 - F.col("s"))
    wts = cells.select("lo", "dp", w.alias("w"))
    r6 = lambda e, p: F.sum(F.round(e, 6).cast(f"decimal({p},6)")).cast(  # noqa: E731
        "double"
    )
    wv, dp, lo = F.col("w"), F.col("dp"), F.col("lo")
    mom = wts.agg(
        F.count(F.lit(1)).alias("n"),
        r6(wv, 24).alias("sw"),
        r6(wv * dp, 28).alias("swx"),
        r6(wv * lo, 28).alias("swy"),
        r6(wv * dp * dp, 32).alias("swxx"),
        r6(wv * dp * lo, 32).alias("swxy"),
    )
    sw, swx, swy = F.col("sw"), F.col("swx"), F.col("swy")
    swxx, swxy = F.col("swxx"), F.col("swxy")
    beta = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    return mom.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.round(beta, 6).alias("price_beta"),
        F.round((swy - beta * swx) / sw, 6).alias("intercept"),
    )


# -- q_twfe_did --------------------------------------------------------
#
# Two-way fixed-effects difference-in-differences on the nation x
# month revenue panel: treatment = ASIA nations from 1997-01 onward
# (the synthetic policy window), beta from the DOUBLE-DEMEANED
# regression y_it - ybar_i - ybar_t + ybar on the demeaned treatment
# dummy — unit AND time fixed effects absorbed without building
# dummies, the modern DiD workhorse one level above q_diff_in_diff's
# 2x2 means. Panel cells are exact decimal revenue; the demeaning
# constants are exact-sum/count doubles applied in one identical
# chain; moments fold 4-rounded products exactly.

TWFE_SQL = """
WITH panel AS (
  SELECT n_name, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS y,
         MAX(CASE WHEN r_name = 'ASIA'
                   AND strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                       >= '1997-01'
                  THEN 1 ELSE 0 END) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2
), mi AS (
  SELECT n_name, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS yi,
         CAST(SUM(d) AS DOUBLE) / COUNT(*) AS di
  FROM panel GROUP BY 1
), mt AS (
  SELECT mon, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS yt,
         CAST(SUM(d) AS DOUBLE) / COUNT(*) AS dt
  FROM panel GROUP BY 1
), mg AS (
  SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS yg,
         CAST(SUM(d) AS DOUBLE) / COUNT(*) AS dg
  FROM panel
), dd AS (
  SELECT CAST(p.y AS DOUBLE) - mi.yi - mt.yt + mg.yg AS yd,
         p.d - mi.di - mt.dt + mg.dg AS xd
  FROM panel p
  JOIN mi ON mi.n_name = p.n_name
  JOIN mt ON mt.mon = p.mon
  CROSS JOIN mg
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(xd * xd, 6) AS DECIMAL(24,6))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(round(xd * yd, 4) AS DECIMAL(34,4))) AS DOUBLE)
           AS sxy
  FROM dd
)
SELECT CAST(n AS BIGINT) AS n_cells,
       round(sxy / sxx, 4) AS twfe_beta
FROM mom
"""


@query("q_twfe_did", oracle=TWFE_SQL)
def q_twfe_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mon = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
    panel = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                cat.nation.select("n_nationkey", "n_name", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name", mon.alias("mon"))
        .agg(
            F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("y"),
            F.max(
                F.when(
                    (F.col("r_name") == "ASIA") & (mon >= "1997-01"), 1
                ).otherwise(0)
            ).alias("d"),
        )
        .localCheckpoint()
    )
    mi = panel.groupBy("n_name").agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("yi"),
        (F.sum("d").cast("double") / F.count(F.lit(1))).alias("di"),
    )
    mt = panel.groupBy("mon").agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("yt"),
        (F.sum("d").cast("double") / F.count(F.lit(1))).alias("dt"),
    )
    mg = panel.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("yg"),
        (F.sum("d").cast("double") / F.count(F.lit(1))).alias("dg"),
    )
    dd = (
        panel.join(F.broadcast(mi), "n_name")
        .join(F.broadcast(mt), "mon")
        .join(F.broadcast(mg))
        .select(
            (
                F.col("y").cast("double")
                - F.col("yi")
                - F.col("yt")
                + F.col("yg")
            ).alias("yd"),
            (
                F.col("d") - F.col("di") - F.col("dt") + F.col("dg")
            ).alias("xd"),
        )
    )
    xd, yd = F.col("xd"), F.col("yd")
    mom = dd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(xd * xd, 6).cast("decimal(24,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(xd * yd, 4).cast("decimal(34,4)"))
        .cast("double")
        .alias("sxy"),
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.round(F.col("sxy") / F.col("sxx"), 4).alias("twfe_beta"),
    )


# -- q_weighted_kappa --------------------------------------------------
#
# Quadratic-weighted Cohen's kappa between customers' spend quintiles
# in the two data halves: disagreement cells are penalized by
# (i - j)^2 / (K - 1)^2, so a one-step slip costs 1/16th of a
# four-step flip — the ordinal agreement metric (the Kaggle QWK)
# where q_cohens_kappa's unweighted form treats all confusion
# equally. Observed and chance-expected weighted disagreement come
# from exact cell counts and margin products; kappa_w = 1 - O/E is
# one double chain.

WKAPPA_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax,
                   MIN(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
tot AS (
  SELECT o_custkey,
         CASE WHEN CAST(o_orderdate AS DATE)
                   < dmin + CAST((dmax - dmin) // 2 AS INTEGER)
              THEN 0 ELSE 1 END AS half,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM orders CROSS JOIN mx GROUP BY 1, 2
), q AS (
  SELECT o_custkey, half,
         CAST(ceil(5.0 * ROW_NUMBER() OVER
                (PARTITION BY half ORDER BY s, o_custkey)
              / COUNT(*) OVER (PARTITION BY half)) AS BIGINT) AS quint
  FROM tot
), pair AS (
  SELECT a.quint AS i, b.quint AS j
  FROM q a JOIN q b ON b.o_custkey = a.o_custkey
  WHERE a.half = 0 AND b.half = 1
), cells AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS c FROM pair GROUP BY 1, 2
), margins AS (
  SELECT i, j, c,
         SUM(c) OVER (PARTITION BY i) AS ri,
         SUM(c) OVER (PARTITION BY j) AS cj,
         SUM(c) OVER () AS n
  FROM cells
), agg2 AS (
  SELECT n,
         CAST(SUM(CAST(round(((i - j) * (i - j) / 16.0)
                             * (c / CAST(n AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS o_,
         CAST(SUM(CAST(round(((i - j) * (i - j) / 16.0)
                             * ((ri / CAST(n AS DOUBLE))
                                * (cj / CAST(n AS DOUBLE))), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS e_
  FROM (SELECT i, j, c, ri, cj, MAX(n) OVER () AS n FROM margins)
  GROUP BY n
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(o_, 6) AS observed_disagreement,
       round(e_, 6) AS expected_disagreement,
       round(1 - o_ / e_, 6) AS weighted_kappa
FROM agg2
"""


@query("q_weighted_kappa", oracle=WKAPPA_SQL)
def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.col("o_custkey").alias("ck"), F.col("quint").alias("i")
    )
    b = q.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck2"), F.col("quint").alias("j")
    )
    pair = a.join(b, F.col("ck") == F.col("ck2")).select("i", "j")
    cells = pair.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    margins = cells.select(
        "i", "j", "c",
        F.sum("c").over(Window.partitionBy("i")).alias("ri"),
        F.sum("c").over(Window.partitionBy("j")).alias("cj"),
        F.sum("c").over(wall).alias("n"),
    )
    i, j, c, n = F.col("i"), F.col("j"), F.col("c"), F.col("n")
    wgt = (i - j) * (i - j) / 16.0
    oterm = F.round(wgt * (c / n.cast("double")), 9).cast("decimal(16,9)")
    eterm = F.round(
        wgt
        * (
            (F.col("ri") / n.cast("double"))
            * (F.col("cj") / n.cast("double"))
        ),
        9,
    ).cast("decimal(16,9)")
    agg2 = margins.groupBy("n").agg(
        F.sum(oterm).cast("double").alias("o_"),
        F.sum(eterm).cast("double").alias("e_"),
    )
    return agg2.select(
        n.cast("bigint").alias("n_customers"),
        F.round("o_", 6).alias("observed_disagreement"),
        F.round("e_", 6).alias("expected_disagreement"),
        F.round(1 - F.col("o_") / F.col("e_"), 6).alias("weighted_kappa"),
    )


# -- q_haberman_residuals ----------------------------------------------
#
# Haberman adjusted residuals for the nation x order-priority
# contingency table: cell residual (O - E)/sqrt(E) divided by
# sqrt((1 - row_share)(1 - col_share)) is asymptotically N(0,1), so
# |adj| > 2 marks WHICH cells drive a significant chi-square — the
# cell-level follow-up q_chi2_independence (table-level) and
# q_cramers_v (strength) leave open. Counts exact; E and the residual
# chain are identical double algebra; flags compare 6-rounded values.

HABERMAN_SQL = """
WITH cells AS (
  SELECT n_name, o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS o
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), w AS (
  SELECT n_name, pri, o,
         SUM(o) OVER (PARTITION BY n_name) AS ro,
         SUM(o) OVER (PARTITION BY pri) AS co,
         SUM(o) OVER () AS t
  FROM cells
), r AS (
  SELECT n_name, pri, o,
         ro * co / CAST(t AS DOUBLE) AS e,
         (o - ro * co / CAST(t AS DOUBLE))
           / sqrt(ro * co / CAST(t AS DOUBLE)) AS resid,
         (o - ro * co / CAST(t AS DOUBLE))
           / sqrt(ro * co / CAST(t AS DOUBLE)
                  * (1 - ro / CAST(t AS DOUBLE))
                  * (1 - co / CAST(t AS DOUBLE))) AS adj,
         ro, co, t
  FROM w
)
SELECT n_name, pri, o AS observed,
       round(e, 4) AS expected,
       round(resid, 6) AS pearson_residual,
       round(adj, 6) AS adjusted_residual,
       CAST(CASE WHEN abs(round(adj, 6)) > 2 THEN 1 ELSE 0 END AS BIGINT)
         AS flagged
FROM r
ORDER BY n_name, pri
"""


@query("q_haberman_residuals", oracle=HABERMAN_SQL)
def q_haberman_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cells = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = cells.select(
        "n_name", "pri", "o",
        F.sum("o").over(Window.partitionBy("n_name")).alias("ro"),
        F.sum("o").over(Window.partitionBy("pri")).alias("co"),
        F.sum("o").over(wall).alias("t"),
    )
    o, ro, co, t = (F.col(x) for x in ["o", "ro", "co", "t"])
    e = ro * co / t.cast("double")
    resid = (o - e) / F.sqrt(e)
    adj = (o - e) / F.sqrt(
        e * (1 - ro / t.cast("double")) * (1 - co / t.cast("double"))
    )
    return w.select(
        "n_name", "pri",
        o.alias("observed"),
        F.round(e, 4).alias("expected"),
        F.round(resid, 6).alias("pearson_residual"),
        F.round(adj, 6).alias("adjusted_residual"),
        F.when(F.abs(F.round(adj, 6)) > 2, 1).otherwise(0).cast("bigint")
        .alias("flagged"),
    ).orderBy("n_name", "pri")


# -- q_enrichment_ora --------------------------------------------------
#
# Over-representation analysis: is each market segment enriched among
# the top-1000 spenders? Hypergeometric upper-tail p via the SAME
# zero-lgamma recurrence machinery as q_fisher_exact (log-weight
# cumsum over the support, max-normalized exact-decimal weights; the
# tail sums k >= observed overlap) plus the fold-enrichment ratio —
# the GSEA-style ORA pattern applied to customer cohorts. Top-k
# membership ranks deterministically by (spend desc, custkey); the
# support enumeration is min(k, |segment|) rows per segment.

ORA_SQL = """
WITH spend AS (
  SELECT c_custkey, c_mktsegment AS seg,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
                       CAST(0 AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS s
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT seg,
         CASE WHEN ROW_NUMBER() OVER (ORDER BY s DESC, c_custkey) <= 1000
              THEN 1 ELSE 0 END AS topk
  FROM spend
), cells AS (
  SELECT seg,
         CAST(SUM(topk) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(SUM(topk)) OVER () AS BIGINT) AS k,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
  FROM ranked GROUP BY seg
), support AS (
  SELECT seg, x, m, k, n,
         UNNEST(generate_series(CAST(GREATEST(0, k + m - n) AS BIGINT),
                                CAST(LEAST(k, m) AS BIGINT))) AS j
  FROM cells
), inc AS (
  SELECT *,
         CASE WHEN j = GREATEST(0, k + m - n)
              THEN CAST(0 AS DECIMAL(24,12))
              ELSE CAST(round(ln(
                     (CAST(m - j + 1 AS DOUBLE) * (k - j + 1))
                     / (CAST(j AS DOUBLE) * (n - m - k + j))), 12)
                   AS DECIMAL(24,12)) END AS lr
  FROM support
), lw AS (
  SELECT *, SUM(lr) OVER (PARTITION BY seg ORDER BY j) AS logw
  FROM inc
), norm AS (
  SELECT *, MAX(logw) OVER (PARTITION BY seg) AS mx
  FROM lw
), w AS (
  SELECT seg, x, m, k, n, j,
         CAST(round(exp(CAST(logw - mx AS DOUBLE)), 12)
              AS DECIMAL(14,12)) AS wt
  FROM norm
)
SELECT seg,
       CAST(x AS BIGINT) AS in_topk,
       CAST(m AS BIGINT) AS segment_size,
       round((CAST(x AS DOUBLE) / k) / (CAST(m AS DOUBLE) / n), 6)
         AS fold_enrichment,
       round(CAST(SUM(CASE WHEN j >= x THEN wt END) AS DOUBLE)
             / CAST(SUM(wt) AS DOUBLE), 6) AS p_enriched
FROM w
GROUP BY seg, x, m, k, n
ORDER BY seg
"""


@query("q_enrichment_ora", oracle=ORA_SQL)
def q_enrichment_ora(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.customer.join(
            cat.orders.select("o_custkey", "o_totalprice"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(24,2)")
            .alias("s")
        )
    )
    ranked = spend.select(
        "seg",
        F.when(
            F.row_number().over(
                Window.orderBy(F.col("s").desc(), "c_custkey")
            )
            <= 1000,
            1,
        )
        .otherwise(0)
        .alias("topk"),
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cells = (
        ranked.groupBy("seg")
        .agg(
            F.sum("topk").cast("bigint").alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("m"),
        )
        .select(
            "seg", "x", "m",
            F.sum("x").over(wall).cast("bigint").alias("k"),
            F.sum("m").over(wall).cast("bigint").alias("n"),
        )
        .localCheckpoint()
    )
    m, k, n, j = F.col("m"), F.col("k"), F.col("n"), F.col("j")
    jmin = F.greatest(F.lit(0).cast("bigint"), k + m - n)
    support = cells.select(
        "seg", "x", "m", "k", "n",
        F.explode(F.sequence(jmin, F.least(k, m))).alias("j"),
    )
    lr = (
        F.when(j == jmin, F.lit(0).cast("decimal(24,12)"))
        .otherwise(
            F.round(
                F.log(
                    ((m - j + 1).cast("double") * (k - j + 1))
                    / (j.cast("double") * (n - m - k + j))
                ),
                12,
            ).cast("decimal(24,12)")
        )
        .alias("lr")
    )
    ws = Window.partitionBy("seg")
    lw = support.select("*", lr).select(
        "*", F.sum("lr").over(ws.orderBy("j")).alias("logw")
    )
    norm = lw.select("*", F.max("logw").over(ws).alias("mx"))
    w = norm.select(
        "seg", "x", "m", "k", "n", "j",
        F.round(F.exp((F.col("logw") - F.col("mx")).cast("double")), 12)
        .cast("decimal(14,12)")
        .alias("wt"),
    )
    x = F.col("x")
    return (
        w.groupBy("seg", "x", "m", "k", "n")
        .agg(
            F.sum(F.when(j >= x, F.col("wt"))).alias("s_tail"),
            F.sum("wt").alias("s_all"),
        )
        .select(
            "seg",
            x.cast("bigint").alias("in_topk"),
            m.cast("bigint").alias("segment_size"),
            F.round(
                (x.cast("double") / k) / (m.cast("double") / n), 6
            ).alias("fold_enrichment"),
            F.round(
                F.col("s_tail").cast("double")
                / F.col("s_all").cast("double"),
                6,
            ).alias("p_enriched"),
        )
        .orderBy("seg")
    )


# -- q_qini_auuc -------------------------------------------------------
#
# Qini curve / AUUC uplift evaluation: customers split into a
# reproducible md5 pseudo-treatment (the house A/B convention),
# outcome = ordered in the final 365 days, and the "uplift model"
# ranks customers by prior spend. Per cumulative decile the Qini
# value Y_t(k) - Y_c(k) * N_t(k)/N_c(k) is compared against the
# random-targeting diagonal; AUUC = mean Qini excess over deciles —
# the standard uplift-model acceptance metric (Radcliffe), one
# level up from q_decile_lift's response-rate view. Exact BIGINT
# counts, deterministic (score desc, custkey) decile assignment,
# double finale 6-rounded.

QINI_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
cust AS (
  SELECT c_custkey,
         CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS treated
  FROM customer
), pre AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < dmax - 365
                       THEN CAST(o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(24,2)) AS spend,
         MAX(CASE WHEN CAST(o_orderdate AS DATE) >= dmax - 365
                  THEN 1 ELSE 0 END) AS y
  FROM orders CROSS JOIN mx GROUP BY 1
), scored AS (
  SELECT c.c_custkey, c.treated,
         COALESCE(p.spend, CAST(0 AS DECIMAL(24,2))) AS spend,
         COALESCE(p.y, 0) AS y
  FROM cust c LEFT JOIN pre p ON p.o_custkey = c.c_custkey
), ranked AS (
  SELECT *,
         CAST(ceil(10.0 * ROW_NUMBER() OVER
                (ORDER BY spend DESC, c_custkey)
              / COUNT(*) OVER ()) AS BIGINT) AS decile
  FROM scored
), g AS (
  SELECT decile,
         CAST(SUM(treated) AS BIGINT) AS n_t,
         CAST(SUM(1 - treated) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
           AS y_t,
         CAST(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
           AS y_c
  FROM ranked GROUP BY 1
), cum AS (
  SELECT decile,
         CAST(SUM(n_t) OVER w AS BIGINT) AS cnt,
         CAST(SUM(n_c) OVER w AS BIGINT) AS cnc,
         CAST(SUM(y_t) OVER w AS BIGINT) AS cyt,
         CAST(SUM(y_c) OVER w AS BIGINT) AS cyc
  FROM g WINDOW w AS (ORDER BY decile)
), tot AS (
  SELECT MAX(cyt) AS tyt, MAX(cyc) AS tyc,
         MAX(cnt) AS tnt, MAX(cnc) AS tnc
  FROM cum
), q AS (
  SELECT decile, cnt, cnc,
         cyt - cyc * (cnt / CAST(cnc AS DOUBLE)) AS qini,
         (tyt - tyc * (tnt / CAST(tnc AS DOUBLE)))
           * ((cnt + cnc) / CAST(tnt + tnc AS DOUBLE)) AS random_qini
  FROM cum CROSS JOIN tot
)
SELECT decile, cnt AS cum_n_treated, cnc AS cum_n_control,
       round(qini, 6) AS qini,
       round(random_qini, 6) AS random_qini,
       round(qini - random_qini, 6) AS qini_excess,
       round(CAST(AVG(round(qini - random_qini, 6)) OVER () AS DOUBLE), 6)
         AS auuc
FROM q
ORDER BY decile
"""


@query("q_qini_auuc", oracle=QINI_SQL)
def q_qini_auuc(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax")
    )
    cust = cat.customer.select(
        "c_custkey",
        F.when(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
            < "8",
            0,
        )
        .otherwise(1)
        .alias("treated"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    od = F.col("o_orderdate").cast("date")
    pre = (
        cat.orders.join(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    od < F.date_sub(F.col("dmax"), 365),
                    dec("o_totalprice"),
                ).otherwise(zero)
            )
            .cast("decimal(24,2)")
            .alias("spend"),
            F.max(
                F.when(od >= F.date_sub(F.col("dmax"), 365), 1).otherwise(0)
            ).alias("y"),
        )
    )
    scored = cust.join(
        pre, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "c_custkey", "treated",
        F.coalesce("spend", F.lit(0).cast("decimal(24,2)")).alias("spend"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.select(
        "*",
        F.ceil(
            10.0
            * F.row_number().over(
                Window.orderBy(F.col("spend").desc(), "c_custkey")
            )
            / F.count(F.lit(1)).over(wall)
        )
        .cast("bigint")
        .alias("decile"),
    )
    t = F.col("treated")
    g = ranked.groupBy("decile").agg(
        F.sum(t).cast("bigint").alias("n_t"),
        F.sum(1 - t).cast("bigint").alias("n_c"),
        F.sum(F.when(t == 1, F.col("y")).otherwise(0)).cast("bigint")
        .alias("y_t"),
        F.sum(F.when(t == 0, F.col("y")).otherwise(0)).cast("bigint")
        .alias("y_c"),
    )
    wc = Window.orderBy("decile")
    cum = g.select(
        "decile",
        F.sum("n_t").over(wc).cast("bigint").alias("cnt"),
        F.sum("n_c").over(wc).cast("bigint").alias("cnc"),
        F.sum("y_t").over(wc).cast("bigint").alias("cyt"),
        F.sum("y_c").over(wc).cast("bigint").alias("cyc"),
    ).localCheckpoint()
    tot = cum.agg(
        F.max("cyt").alias("tyt"),
        F.max("cyc").alias("tyc"),
        F.max("cnt").alias("tnt"),
        F.max("cnc").alias("tnc"),
    )
    cnt, cnc = F.col("cnt"), F.col("cnc")
    qini = F.col("cyt") - F.col("cyc") * (cnt / cnc.cast("double"))
    rand = (
        F.col("tyt") - F.col("tyc") * (F.col("tnt") / F.col("tnc").cast("double"))
    ) * ((cnt + cnc) / (F.col("tnt") + F.col("tnc")).cast("double"))
    q = cum.join(F.broadcast(tot)).select(
        "decile", cnt.alias("cum_n_treated"), cnc.alias("cum_n_control"),
        F.round(qini, 6).alias("qini"),
        F.round(rand, 6).alias("random_qini"),
        F.round(qini - rand, 6).alias("qini_excess"),
    )
    return q.select(
        "*",
        F.round(F.avg("qini_excess").over(wall), 6).alias("auuc"),
    ).orderBy("decile")


# -- q_mcf_recurrent ---------------------------------------------------
#
# Mean cumulative function (Nelson estimator) for recurrent orders:
# at customer age t (days since first order), MCF(t) = sum over ages
# s <= t of d(s)/n(s), where d(s) counts repeat orders landing at age
# s and n(s) counts customers still under observation (followup =
# data end - first order >= s) — the reliability-engineering
# "expected cumulative repeat purchases per customer by tenure",
# censoring-aware where a naive cumulative average is not. At-risk
# counts come from ONE suffix window over the followup distribution
# (the q_survival_km shape applied to a RECURRENT process);
# increments are 12-rounded decimals cumulated exactly. Output: the
# age grid with d, n, MCF.

MCF_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS d1
  FROM orders GROUP BY 1
), endd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS de FROM orders),
fup AS (
  SELECT f.o_custkey, date_diff('day', f.d1, e.de) AS fu
  FROM firsts f CROSS JOIN endd e
), rec AS (
  SELECT date_diff('day', f.d1, CAST(o.o_orderdate AS DATE)) AS t
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  WHERE CAST(o.o_orderdate AS DATE) > f.d1
), d AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS d FROM rec GROUP BY 1
), fdist AS (
  SELECT fu, CAST(COUNT(*) AS BIGINT) AS c FROM fup GROUP BY 1
), ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM fup),
atrisk AS (
  SELECT d.t, d.d,
         n0 - COALESCE(CAST((SELECT SUM(c) FROM fdist
                             WHERE fdist.fu < d.t) AS BIGINT), 0) AS n
  FROM d CROSS JOIN ntot
), inc AS (
  SELECT t, d, n,
         CAST(round(d / CAST(n AS DOUBLE), 12) AS DECIMAL(16,12)) AS i
  FROM atrisk WHERE n > 0
)
SELECT CAST(t AS BIGINT) AS age_days, d AS n_events, n AS n_at_risk,
       round(CAST(SUM(i) OVER (ORDER BY t) AS DOUBLE), 6) AS mcf
FROM inc
ORDER BY age_days
"""


@query("q_mcf_recurrent", oracle=MCF_SQL)
def q_mcf_recurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    firsts = cat.orders.groupBy("o_custkey").agg(F.min(od).alias("d1"))
    endd = cat.orders.agg(F.max(od).alias("de"))
    fup = firsts.join(F.broadcast(endd)).select(
        "o_custkey", F.datediff("de", "d1").alias("fu")
    ).localCheckpoint()
    rec = (
        cat.orders.select("o_orderkey", "o_custkey", od.alias("odd"))
        .join(
            firsts.select(F.col("o_custkey").alias("ck"), "d1"),
            F.col("o_custkey") == F.col("ck"),
        )
        .filter(F.col("odd") > F.col("d1"))
        .select(F.datediff("odd", "d1").alias("t"))
    )
    d = rec.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    fdist = fup.groupBy("fu").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ntot = fup.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    # n(t) = n0 - #{fu < t}: join the d-grid against the cumulative
    # followup distribution via a range-style window over the union
    # of (t) and (fu) keys — grid-sized, no per-customer join.
    keys = d.select(F.col("t").alias("key")).union(
        fdist.select(F.col("fu").alias("key"))
    ).distinct()
    wk = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, -1)
    cume = (
        keys.join(fdist, F.col("key") == F.col("fu"), "left")
        .select("key", F.coalesce("c", F.lit(0)).alias("c"))
        .select(
            "key",
            F.coalesce(F.sum("c").over(wk).cast("bigint"), F.lit(0))
            .alias("below"),
        )
    )
    atrisk = (
        d.join(cume, d["t"] == cume["key"])
        .join(F.broadcast(ntot))
        .select("t", "d", (F.col("n0") - F.col("below")).alias("n"))
    )
    inc = atrisk.filter(F.col("n") > 0).select(
        "t", "d", "n",
        F.round(F.col("d") / F.col("n").cast("double"), 12)
        .cast("decimal(16,12)")
        .alias("i"),
    )
    return inc.select(
        F.col("t").cast("bigint").alias("age_days"),
        F.col("d").alias("n_events"),
        F.col("n").alias("n_at_risk"),
        F.round(
            F.sum("i").over(Window.orderBy("t")).cast("double"), 6
        ).alias("mcf"),
    ).orderBy("age_days")
