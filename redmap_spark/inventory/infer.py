"""SURVEY §2 additions (round 6, ninth session) — resampling and
ratio-metric inference for experimentation: md5-deterministic
permutation testing, leave-one-group-out jackknife, the delta-method
ratio-metric CI, and TOST equivalence testing.

These four close the inference gaps around q_ab_test/q_bootstrap_ci:
permutation gives the assumption-free p-value, jackknife the
group-robust SE, delta method the correct SE for RATIO metrics
(revenue per order — the metric naive z-tests get wrong), and TOST
answers "are they the SAME?", which a non-significant difference
test never does. All randomness is md5-derived (the q_hash_sample
rule), so every resample is cross-engine reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_permutation_test ------------------------------------------------
#
# Permutation test of the md5-parity A/B split's mean-order-total
# difference: 50 null reassignments, each flipping every order's
# group by the parity of md5(orderkey || ':' || b) — deterministic,
# engine-portable "randomness" (the q_hash_sample rule), so the null
# distribution is bit-identical everywhere. diff_b comes from exact
# decimal conditional sums in ONE pass over a 50-way broadcast
# expansion (map-side combined to a 50-row grid); p = (1 + #{|d_b| ≥
# |d_obs|})/(B+1) compares 9-rounded diffs. Scale: one scan × B
# expansion → B-row grid → 1 row.

PERM_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp
  FROM orders
), obs AS (
  SELECT round(
           CAST(SUM(CASE WHEN grp = 0 THEN x END) AS DOUBLE)
             / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
           - CAST(SUM(CASE WHEN grp = 1 THEN x END) AS DOUBLE)
             / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END), 9) AS d_obs
  FROM base
), perms AS (
  SELECT b.b,
         round(
           CAST(SUM(CASE WHEN substr(md5(CAST(k AS VARCHAR) || ':'
                                      || CAST(b.b AS VARCHAR)), 1, 1) < '8'
                         THEN x END) AS DOUBLE)
             / SUM(CASE WHEN substr(md5(CAST(k AS VARCHAR) || ':'
                                        || CAST(b.b AS VARCHAR)), 1, 1) < '8'
                        THEN 1 ELSE 0 END)
           - CAST(SUM(CASE WHEN substr(md5(CAST(k AS VARCHAR) || ':'
                                       || CAST(b.b AS VARCHAR)), 1, 1) >= '8'
                          THEN x END) AS DOUBLE)
             / SUM(CASE WHEN substr(md5(CAST(k AS VARCHAR) || ':'
                                        || CAST(b.b AS VARCHAR)), 1, 1) >= '8'
                        THEN 1 ELSE 0 END), 9) AS d_b
  FROM base CROSS JOIN (SELECT CAST(b AS INT) AS b FROM range(50) t(b)) b
  GROUP BY 1
)
SELECT round(o.d_obs, 6) AS diff_observed,
       CAST(COUNT(*) AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       round((1.0 + SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                             THEN 1 ELSE 0 END)) / (COUNT(*) + 1.0), 6)
         AS p_value
FROM perms p CROSS JOIN obs o
GROUP BY o.d_obs
"""


@query("q_permutation_test", oracle=PERM_SQL)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
    )
    base = base.cache()  # consumed by obs AND the permutation expansion

    def mean_diff(flag0, flag1):
        return F.round(
            F.sum(F.when(flag0, F.col("x"))).cast("double")
            / F.sum(F.when(flag0, 1).otherwise(0))
            - F.sum(F.when(flag1, F.col("x"))).cast("double")
            / F.sum(F.when(flag1, 1).otherwise(0)),
            9,
        )

    obs = base.agg(
        mean_diff(F.col("grp") == 0, F.col("grp") == 1).alias("d_obs")
    )
    bgrid = spark.range(50).select(F.col("id").cast("int").alias("b"))
    ph = F.substring(
        F.md5(
            F.concat(
                F.col("k").cast("string"), F.lit(":"),
                F.col("b").cast("string"),
            )
        ), 1, 1,
    )
    perms = (
        base.crossJoin(F.broadcast(bgrid))
        .groupBy("b")
        .agg(mean_diff(ph < "8", ph >= "8").alias("d_b"))
    )
    extreme = F.sum(
        F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    )
    return (
        perms.join(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            extreme.cast("bigint").alias("n_extreme"),
            F.round(
                (F.lit(1.0) + extreme) / (F.count(F.lit(1)) + 1.0), 6
            ).alias("p_value"),
        )
        .select(
            F.round("d_obs", 6).alias("diff_observed"),
            "n_perms", "n_extreme", "p_value",
        )
    )


# -- q_jackknife -------------------------------------------------------
#
# Leave-one-nation-out jackknife of the global mean account balance:
# each θ̂₍₋g₎ = (S−S_g)/(n−n_g) is PURE ALGEBRA on the exact decimal
# per-nation sums (no recomputation scans — the whole resample is
# one grid transform), giving the group-robust SE and the jackknife
# bias estimate that the iid SE misses when nations cluster. Scale:
# one partial-aggregated scan → 25-row grid.

JACKKNIFE_SQL = """
WITH per AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS s_g
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DECIMAL(38,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS g
  FROM per
), loo AS (
  SELECT p.n_name, p.n_g,
         (CAST(t.s AS DOUBLE) - CAST(p.s_g AS DOUBLE))
           / (t.n - p.n_g) AS theta_g,
         t.g, t.n,
         CAST(t.s AS DOUBLE) / t.n AS theta
  FROM per p CROSS JOIN tot t
), dot AS (
  SELECT CAST(SUM(CAST(round(theta_g, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / MAX(g) AS theta_dot,
         MAX(g) AS g, MAX(theta) AS theta
  FROM loo
), se AS (
  SELECT CAST(SUM(CAST(round((l.theta_g - d.theta_dot)
                             * (l.theta_g - d.theta_dot), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS ss
  FROM loo l CROSS JOIN dot d
)
SELECT l.n_name, l.n_g,
       round(l.theta_g, 6) AS theta_without,
       round(l.theta, 6) AS theta_full,
       round(sqrt((d.g - 1.0) / d.g * s.ss), 6) AS jackknife_se,
       round((d.g - 1.0) * (d.theta_dot - l.theta), 6) AS jackknife_bias
FROM loo l CROSS JOIN dot d CROSS JOIN se s
ORDER BY l.n_name
"""


@query("q_jackknife", oracle=JACKKNIFE_SQL)
def q_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    per = (
        c.customer.join(
            F.broadcast(c.nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(28,2)").alias("s_g"),
        )
    )
    per = per.cache()  # consumed by tot AND loo
    tot = per.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("decimal(38,2)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    loo = per.join(F.broadcast(tot)).select(
        "n_name", "n_g",
        (
            (F.col("s").cast("double") - F.col("s_g").cast("double"))
            / (F.col("n") - F.col("n_g"))
        ).alias("theta_g"),
        "g", "n",
        (F.col("s").cast("double") / F.col("n")).alias("theta"),
    )
    loo = loo.cache()  # consumed by dot, se AND the output
    dot = loo.agg(
        (
            F.sum(F.round("theta_g", 9).cast("decimal(28,9)"))
            .cast("double") / F.max("g")
        ).alias("theta_dot"),
        F.max("g").alias("g"),
        F.max("theta").alias("theta"),
    )
    se = loo.join(F.broadcast(dot)).agg(
        F.sum(
            F.round(
                (F.col("theta_g") - F.col("theta_dot"))
                * (F.col("theta_g") - F.col("theta_dot")), 9
            ).cast("decimal(28,9)")
        ).cast("double").alias("ss")
    )
    return (
        loo.join(F.broadcast(dot.select(
            F.col("theta_dot"), F.col("g").alias("gg")
        )))
        .join(F.broadcast(se))
        .select(
            "n_name", "n_g",
            F.round("theta_g", 6).alias("theta_without"),
            F.round("theta", 6).alias("theta_full"),
            F.round(
                F.sqrt(
                    (F.col("gg") - 1.0) / F.col("gg") * F.col("ss")
                ), 6
            ).alias("jackknife_se"),
            F.round(
                (F.col("gg") - 1.0)
                * (F.col("theta_dot") - F.col("theta")), 6
            ).alias("jackknife_bias"),
        )
        .orderBy("n_name")
    )


# -- q_ratio_metric_ci -------------------------------------------------
#
# Delta-method CI for the RATIO metric "revenue per order" compared
# across the md5-parity A/B split, with CUSTOMERS as the unit of
# randomization: R = Σrev/Σorders per group, var(R) ≈ (var(x) +
# R²·var(y) − 2R·cov(x,y)) / (n·ȳ²) over per-customer (rev, orders)
# pairs — the SE a naive per-order z-test gets wrong whenever
# customers contribute unequal order counts. Exact per-customer
# decimal sums, exact group moments, one double chain. Scale: two
# partial-aggregated scans (customer grid → 2-row group grid) → 1
# row.

RATIO_CI_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS cust,
         CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), gm AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(28,2)) * y) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_cust GROUP BY 1
), stats AS (
  SELECT grp, n,
         CAST(sx AS DOUBLE) / sy AS r,
         (
           (CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
           + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
             * (CAST(syy AS DOUBLE) / n
                - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
           - 2.0 * (CAST(sx AS DOUBLE) / sy)
             * (CAST(sxy AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
         ) / (n * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
           AS var_r
  FROM gm
), wide AS (
  SELECT MIN(CASE WHEN grp = 0 THEN n END) AS n_a,
         MIN(CASE WHEN grp = 1 THEN n END) AS n_b,
         MIN(CASE WHEN grp = 0 THEN r END) AS r_a,
         MIN(CASE WHEN grp = 1 THEN r END) AS r_b,
         MIN(CASE WHEN grp = 0 THEN var_r END) AS v_a,
         MIN(CASE WHEN grp = 1 THEN var_r END) AS v_b
  FROM stats
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(r_a, 6) AS rpo_a,
       round(r_b, 6) AS rpo_b,
       round(r_b - r_a, 6) AS diff,
       round(sqrt(v_a + v_b), 6) AS se,
       round((r_b - r_a) - 1.96 * sqrt(v_a + v_b), 6) AS ci_lo,
       round((r_b - r_a) + 1.96 * sqrt(v_a + v_b), 6) AS ci_hi,
       CAST(CASE WHEN abs(r_b - r_a) > 1.96 * sqrt(v_a + v_b)
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM wide
WHERE v_a IS NOT NULL AND v_b IS NOT NULL
"""


@query("q_ratio_metric_ci", oracle=RATIO_CI_SQL)
def q_ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    per_cust = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    gm = per_cust.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").alias("sxx"),
        F.sum(F.col("x").cast("decimal(28,2)") * F.col("y"))
        .cast("decimal(38,2)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n = F.col("n")
    r = F.col("sx").cast("double") / F.col("sy")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    var_x = F.col("sxx").cast("double") / n - mx * mx
    var_y = F.col("syy").cast("double") / n - my * my
    cov = F.col("sxy").cast("double") / n - mx * my
    var_r = (var_x + r * r * var_y - 2.0 * r * cov) / (n * my * my)
    stats = gm.select("grp", "n", r.alias("r"), var_r.alias("var_r"))
    wide = stats.agg(
        F.min(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.min(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.min(F.when(F.col("grp") == 0, F.col("r"))).alias("r_a"),
        F.min(F.when(F.col("grp") == 1, F.col("r"))).alias("r_b"),
        F.min(F.when(F.col("grp") == 0, F.col("var_r"))).alias("v_a"),
        F.min(F.when(F.col("grp") == 1, F.col("var_r"))).alias("v_b"),
    )
    diff = F.col("r_b") - F.col("r_a")
    se = F.sqrt(F.col("v_a") + F.col("v_b"))
    return (
        wide.filter(F.col("v_a").isNotNull() & F.col("v_b").isNotNull())
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round("r_a", 6).alias("rpo_a"),
            F.round("r_b", 6).alias("rpo_b"),
            F.round(diff, 6).alias("diff"),
            F.round(se, 6).alias("se"),
            F.round(diff - 1.96 * se, 6).alias("ci_lo"),
            F.round(diff + 1.96 * se, 6).alias("ci_hi"),
            F.when(F.abs(diff) > 1.96 * se, 1).otherwise(0).cast("bigint")
            .alias("significant"),
        )
    )


# -- q_tost_equivalence ------------------------------------------------
#
# TOST equivalence test on the md5-parity split's mean order totals:
# two one-sided z-tests against the ±1%-of-pooled-mean margin —
# "are the groups the SAME (within δ)?", which a non-significant
# difference test never establishes (absence of evidence ≠ evidence
# of absence; this is the A/A-validation and do-no-harm launch
# gate). Exact decimal moments, Welch-style SE, equivalence iff
# min(z₁, z₂) > 1.645. Scale: one partial-aggregated scan → 1 row.

TOST_SQL = """
WITH v AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx
  FROM v GROUP BY 1
), s AS (
  SELECT grp, n, CAST(sx AS DOUBLE) / n AS mu,
         (CAST(sxx AS DOUBLE) / n
          - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / n
           AS var_mu,
         CAST(sx AS DOUBLE) AS sxd
  FROM m
), wide AS (
  SELECT MIN(CASE WHEN grp = 0 THEN n END) AS n_a,
         MIN(CASE WHEN grp = 1 THEN n END) AS n_b,
         MIN(CASE WHEN grp = 0 THEN mu END) AS mu_a,
         MIN(CASE WHEN grp = 1 THEN mu END) AS mu_b,
         MIN(CASE WHEN grp = 0 THEN var_mu END) AS v_a,
         MIN(CASE WHEN grp = 1 THEN var_mu END) AS v_b,
         SUM(sxd) / SUM(n) AS mu_pool
  FROM s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(mu_b - mu_a, 6) AS diff,
       round(0.01 * mu_pool, 6) AS margin,
       round(sqrt(v_a + v_b), 6) AS se,
       round(((mu_b - mu_a) + 0.01 * mu_pool) / sqrt(v_a + v_b), 6) AS z_lower,
       round((0.01 * mu_pool - (mu_b - mu_a)) / sqrt(v_a + v_b), 6) AS z_upper,
       CAST(CASE WHEN ((mu_b - mu_a) + 0.01 * mu_pool) / sqrt(v_a + v_b)
                      > 1.645
                  AND (0.01 * mu_pool - (mu_b - mu_a)) / sqrt(v_a + v_b)
                      > 1.645
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM wide
WHERE v_a IS NOT NULL AND v_b IS NOT NULL AND v_a + v_b > 0
"""


@query("q_tost_equivalence", oracle=TOST_SQL)
def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    m = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").alias("sxx"),
    )
    n = F.col("n")
    mu = F.col("sx").cast("double") / n
    var_mu = (F.col("sxx").cast("double") / n - mu * mu) / n
    s = m.select(
        "grp", "n", mu.alias("mu"), var_mu.alias("var_mu"),
        F.col("sx").cast("double").alias("sxd"),
    )
    wide = s.agg(
        F.min(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.min(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.min(F.when(F.col("grp") == 0, F.col("mu"))).alias("mu_a"),
        F.min(F.when(F.col("grp") == 1, F.col("mu"))).alias("mu_b"),
        F.min(F.when(F.col("grp") == 0, F.col("var_mu"))).alias("v_a"),
        F.min(F.when(F.col("grp") == 1, F.col("var_mu"))).alias("v_b"),
        (F.sum("sxd") / F.sum("n")).alias("mu_pool"),
    )
    diff = F.col("mu_b") - F.col("mu_a")
    margin = F.lit(0.01) * F.col("mu_pool")
    se = F.sqrt(F.col("v_a") + F.col("v_b"))
    z1 = (diff + margin) / se
    z2 = (margin - diff) / se
    return (
        wide.filter(
            F.col("v_a").isNotNull() & F.col("v_b").isNotNull()
            & (F.col("v_a") + F.col("v_b") > 0)
        )
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(diff, 6).alias("diff"),
            F.round(margin, 6).alias("margin"),
            F.round(se, 6).alias("se"),
            F.round(z1, 6).alias("z_lower"),
            F.round(z2, 6).alias("z_upper"),
            F.when((z1 > 1.645) & (z2 > 1.645), 1).otherwise(0)
            .cast("bigint").alias("equivalent"),
        )
    )
