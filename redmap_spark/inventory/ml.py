"""SURVEY §2 additions (round 6, ninth session) — classical ML
primitives as exact-arithmetic DataFrame plans: Naive Bayes
classification with a temporal train/test split, and a single-split
decision stump chosen by Gini impurity over exact decile candidates.

Both are count-based models, so training IS aggregation: the
probability/impurity tables are grid-sized exact-integer artifacts,
scoring is a broadcast join, and every accuracy number is an exact
count ratio — the whole "train, score, evaluate" loop with zero
Python and zero iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query, spread
from redmap_spark.plans.prefix import two_phase_cumsum

# -- q_naive_bayes -----------------------------------------------------
#
# Laplace-smoothed Naive Bayes predicting URGENT/HIGH order priority
# from (customer market segment, ISO weekday), trained on the first
# half of the date range and scored on the second (the q_chow_test
# midpoint split — a real temporal holdout, not a random one).
# Class-conditional tables are exact integer counts; the per-row
# score is ln P(c) + ln P(seg|c) + ln P(dow|c) compared across the
# two classes — one identical double chain, so the prediction flag
# is hash-exact. Output: the holdout confusion matrix and the
# derived rates. Scale: one broadcast-dim join + two grid-sized
# probability tables broadcast back; no shuffle past the count aggs.

NB_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS seg,
         isodow(CAST(o.o_orderdate AS DATE)) AS dow,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         o.o_orderdate AS d
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), bounds AS (
  SELECT MIN(d) AS d0, MAX(d) AS d1 FROM base
), split AS (
  SELECT seg, dow, y,
         CASE WHEN 2 * date_diff('day', b.d0, base.d)
                   <= date_diff('day', b.d0, b.d1)
              THEN 0 ELSE 1 END AS is_test
  FROM base CROSS JOIN bounds b
), prior AS (
  SELECT CAST(SUM(y) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0
  FROM split WHERE is_test = 0
), pseg AS (
  SELECT seg,
         CAST(SUM(y) AS BIGINT) AS c1,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
  FROM split WHERE is_test = 0 GROUP BY 1
), kseg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM pseg),
pdow AS (
  SELECT dow,
         CAST(SUM(y) AS BIGINT) AS c1,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
  FROM split WHERE is_test = 0 GROUP BY 1
), kdow AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM pdow),
scored AS (
  SELECT t.y,
         CASE WHEN
           ln(CAST(p.n1 AS DOUBLE) / (p.n1 + p.n0))
           + ln((s.c1 + 1.0) / (p.n1 + ks.k))
           + ln((d.c1 + 1.0) / (p.n1 + kd.k))
           >
           ln(CAST(p.n0 AS DOUBLE) / (p.n1 + p.n0))
           + ln((s.c0 + 1.0) / (p.n0 + ks.k))
           + ln((d.c0 + 1.0) / (p.n0 + kd.k))
         THEN 1 ELSE 0 END AS pred
  FROM split t
  JOIN pseg s ON s.seg = t.seg
  JOIN pdow d ON d.dow = t.dow
  CROSS JOIN prior p CROSS JOIN kseg ks CROSS JOIN kdow kd
  WHERE t.is_test = 1
), cm AS (
  SELECT CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM scored
)
SELECT tp, fp, tn, fn,
       round(CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn), 6) AS accuracy,
       round(CASE WHEN tp + fp > 0
                  THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision_1,
       round(CASE WHEN tp + fn > 0
                  THEN CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall_1,
       round(CAST(tp + fn AS DOUBLE) / (tp + fp + tn + fn), 6) AS base_rate
FROM cm
"""


@query("q_naive_bayes", oracle=NB_SQL)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    iso = F.when(F.dayofweek("o_orderdate") == 1, F.lit(7)).otherwise(
        F.dayofweek("o_orderdate") - 1
    )
    base = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        iso.cast("bigint").alias("dow"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
        F.col("o_orderdate").alias("d"),
    )
    base = base.cache()  # consumed by bounds AND split
    bounds = base.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    t = F.datediff(F.col("d"), F.col("d0"))
    span = F.datediff(F.col("d1"), F.col("d0"))
    split = base.join(F.broadcast(bounds)).select(
        "seg", "dow", "y",
        F.when(2 * t <= span, 0).otherwise(1).alias("is_test"),
    )
    split = split.cache()  # consumed by train tables AND the holdout
    train = split.filter(F.col("is_test") == 0)
    prior = train.agg(
        F.sum("y").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n0"),
    )
    pseg = train.groupBy("seg").agg(
        F.sum("y").cast("bigint").alias("sc1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("sc0"),
    )
    pseg = pseg.cache()  # consumed by kseg AND scoring
    kseg = pseg.agg(F.count(F.lit(1)).cast("bigint").alias("ks"))
    pdow = train.groupBy("dow").agg(
        F.sum("y").cast("bigint").alias("dc1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("dc0"),
    )
    pdow = pdow.cache()  # consumed by kdow AND scoring
    kdow = pdow.agg(F.count(F.lit(1)).cast("bigint").alias("kd"))
    n1, n0 = F.col("n1"), F.col("n0")
    score1 = (
        F.log(n1.cast("double") / (n1 + n0))
        + F.log((F.col("sc1") + 1.0) / (n1 + F.col("ks")))
        + F.log((F.col("dc1") + 1.0) / (n1 + F.col("kd")))
    )
    score0 = (
        F.log(n0.cast("double") / (n1 + n0))
        + F.log((F.col("sc0") + 1.0) / (n0 + F.col("ks")))
        + F.log((F.col("dc0") + 1.0) / (n0 + F.col("kd")))
    )
    scored = (
        split.filter(F.col("is_test") == 1)
        .join(F.broadcast(pseg), "seg")
        .join(F.broadcast(pdow), "dow")
        .join(F.broadcast(prior))
        .join(F.broadcast(kseg))
        .join(F.broadcast(kdow))
        .select(
            "y", F.when(score1 > score0, 1).otherwise(0).alias("pred")
        )
    )
    cm = scored.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint").alias("tn"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint").alias("fn"),
    )
    tot = F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")
    return cm.select(
        "tp", "fp", "tn", "fn",
        F.round((F.col("tp") + F.col("tn")).cast("double") / tot, 6)
        .alias("accuracy"),
        F.round(
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
            ), 6
        ).alias("precision_1"),
        F.round(
            F.when(
                F.col("tp") + F.col("fn") > 0,
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
            ), 6
        ).alias("recall_1"),
        F.round((F.col("tp") + F.col("fn")).cast("double") / tot, 6)
        .alias("base_rate"),
    )


# -- q_decision_stump --------------------------------------------------
#
# Best single-split decision stump: among the 9 interior deciles of
# customer account balance (exact lower-quantile thresholds from the
# cumulative distinct-value grid), which split best separates
# high-value orders (total > 300k) by weighted Gini impurity? The
# candidate×order conditional counts come from ONE pass over a
# 9-way broadcast threshold expansion (the q_hurst_exponent shape);
# impurities are exact-count ratios in one double chain; the winner
# is the min-Gini row with threshold tiebreak. Scale: one scan →
# 9-row candidate grid.

STUMP_SQL = """
WITH ords AS (
  SELECT CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal,
         CASE WHEN o.o_totalprice > 300000 THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), balgrid AS (
  SELECT bal, CAST(COUNT(*) AS BIGINT) AS cnt FROM ords GROUP BY 1
), cumg AS (
  SELECT bal,
         CAST(SUM(cnt) OVER (ORDER BY bal) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM balgrid
), cands AS (
  SELECT CAST(d.d AS BIGINT) AS decile, MIN(bal) AS thr
  FROM cumg CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(d)
  WHERE 10 * cum >= d.d * n
  GROUP BY 1
), cond AS (
  SELECT c.decile, c.thr,
         CAST(SUM(CASE WHEN o.bal <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
           AS nl,
         CAST(SUM(CASE WHEN o.bal <= c.thr THEN o.y ELSE 0 END) AS BIGINT)
           AS pl,
         CAST(SUM(CASE WHEN o.bal > c.thr THEN 1 ELSE 0 END) AS BIGINT)
           AS nr,
         CAST(SUM(CASE WHEN o.bal > c.thr THEN o.y ELSE 0 END) AS BIGINT)
           AS pr
  FROM ords o CROSS JOIN cands c
  GROUP BY 1, 2
), gini AS (
  SELECT decile, CAST(thr AS DOUBLE) AS threshold, nl, nr,
         (nl * (2.0 * (pl / CAST(nl AS DOUBLE))
                * (1.0 - pl / CAST(nl AS DOUBLE)))
          + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                  * (1.0 - pr / CAST(nr AS DOUBLE))))
           / (nl + nr) AS g
  FROM cond WHERE nl > 0 AND nr > 0
), best AS (
  SELECT MIN(round(g, 9)) AS gmin FROM gini
)
SELECT g.decile, g.threshold, g.nl AS n_left, g.nr AS n_right,
       round(g.g, 6) AS weighted_gini,
       CAST(CASE WHEN round(g.g, 9) = b.gmin THEN 1 ELSE 0 END AS BIGINT)
         AS is_best
FROM gini g CROSS JOIN best b
ORDER BY g.decile
"""


@query("q_decision_stump", oracle=STUMP_SQL)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    ords = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_acctbal")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        F.when(F.col("o_totalprice") > 300000, 1).otherwise(0).alias("y"),
    )
    ords = ords.cache()  # consumed by the grid AND the conditional pass
    balgrid = ords.groupBy("bal").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # distinct balances scale with the data (continuous domain), so
    # the cumulative count is a TWO-PHASE prefix sum: within
    # floor(bal/256) buckets (acctbal domain -1000..10000 -> ~43
    # buckets, SF-independent) plus broadcast offsets — no
    # SinglePartition pass over the grid (plans/prefix.py).
    cumg = two_phase_cumsum(
        balgrid, ["bal"], F.col("cnt"),
        F.floor(F.col("bal") / 256).cast("bigint"), out="cum",
    ).join(
        F.broadcast(
            balgrid.agg(F.sum("cnt").cast("bigint").alias("n"))
        )
    )
    dd = spark.range(1, 10).select(F.col("id").cast("bigint").alias("d"))
    cands = (
        cumg.crossJoin(F.broadcast(dd))
        .filter(10 * F.col("cum") >= F.col("d") * F.col("n"))
        .groupBy(F.col("d").alias("decile"))
        .agg(F.min("bal").alias("thr"))
    )
    cond = (
        ords.crossJoin(F.broadcast(cands))
        .groupBy("decile", "thr")
        .agg(
            F.sum(F.when(F.col("bal") <= F.col("thr"), 1).otherwise(0))
            .cast("bigint").alias("nl"),
            F.sum(F.when(F.col("bal") <= F.col("thr"), F.col("y"))
                  .otherwise(0)).cast("bigint").alias("pl"),
            F.sum(F.when(F.col("bal") > F.col("thr"), 1).otherwise(0))
            .cast("bigint").alias("nr"),
            F.sum(F.when(F.col("bal") > F.col("thr"), F.col("y"))
                  .otherwise(0)).cast("bigint").alias("pr"),
        )
    )
    pl_rate = F.col("pl") / F.col("nl").cast("double")
    pr_rate = F.col("pr") / F.col("nr").cast("double")
    g = (
        F.col("nl") * (2.0 * pl_rate * (F.lit(1.0) - pl_rate))
        + F.col("nr") * (2.0 * pr_rate * (F.lit(1.0) - pr_rate))
    ) / (F.col("nl") + F.col("nr"))
    gini = (
        cond.filter((F.col("nl") > 0) & (F.col("nr") > 0))
        .select(
            "decile",
            F.col("thr").cast("double").alias("threshold"),
            "nl", "nr", g.alias("g"),
        )
    )
    gini = gini.cache()  # consumed by best AND the output
    best = gini.agg(F.min(F.round("g", 9)).alias("gmin"))
    return (
        gini.join(F.broadcast(best))
        .select(
            "decile", "threshold",
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.round("g", 6).alias("weighted_gini"),
            F.when(F.round("g", 9) == F.col("gmin"), 1).otherwise(0)
            .cast("bigint").alias("is_best"),
        )
        .orderBy("decile")
    )


# -- q_gmm_em ----------------------------------------------------------
#
# Two-component 1-D Gaussian mixture on order totals, fit by THREE
# unrolled EM iterations — iterative ML as a deterministic DataFrame
# plan. Init is exact (μ = P25/P75 lower quantiles off the
# cumulative distinct-value grid, σ = global, π = 0.5);
# responsibilities are computed in LOG space (r = σ(la−lb), so a
# point far from both means underflows to a deterministic 0/1
# instead of NaN); every M-step moment folds per-row terms rounded
# to DECIMAL (r→9, r·x→4, r·x²→2) so the refit is partition-order
# independent. Reports both components plus the final per-row
# average log-likelihood (log-sum-exp, shift by the larger
# exponent). Scale: init grid + 3 cached-scan M-steps + 1 loglik
# scan, params broadcast back each round — the standard distributed
# EM shape with k fixed.

GMM_SQL = """
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
  FROM orders
), g AS (
  SELECT CAST(x AS DECIMAL(18,2)) AS xv, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
), cum AS (
  SELECT xv, CAST(SUM(cnt) OVER (ORDER BY xv) AS BIGINT) AS c,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM g
), q25 AS (
  SELECT CAST(MIN(xv) AS DOUBLE) AS mu1 FROM cum WHERE 4 * c >= n
), q75 AS (
  SELECT CAST(MIN(xv) AS DOUBLE) AS mu2 FROM cum WHERE 4 * c >= 3 * n
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1,
         CAST(SUM(CAST(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))
                       AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
  FROM v
), p0 AS (
  SELECT q25.mu1, q75.mu2,
         sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           AS sg1,
         sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           AS sg2,
         0.5 AS pi1
  FROM q25 CROSS JOIN q75 CROSS JOIN mom
), e1 AS (
  SELECT x,
         round(1.0 / (1.0 + exp(
           (ln(1.0 - p.pi1) - ln(p.sg2)
            - (x - p.mu2) * (x - p.mu2) / (2.0 * p.sg2 * p.sg2))
           - (ln(p.pi1) - ln(p.sg1)
              - (x - p.mu1) * (x - p.mu1) / (2.0 * p.sg1 * p.sg1)))),
           9) AS r
  FROM v CROSS JOIN p0 p
), m1 AS (
  SELECT CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) AS n1,
         CAST(SUM(CAST(round(r * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sx1,
         CAST(SUM(CAST(round(r * x * x, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxx1,
         CAST(SUM(CAST(round((1.0 - r) * x, 4) AS DECIMAL(38,4)))
              AS DOUBLE) AS sx2,
         CAST(SUM(CAST(round((1.0 - r) * x * x, 2) AS DECIMAL(38,2)))
              AS DOUBLE) AS sxx2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e1
), p1 AS (
  SELECT sx1 / n1 AS mu1, sx2 / (n - n1) AS mu2,
         sqrt(GREATEST(sxx1 / n1 - (sx1 / n1) * (sx1 / n1), 1e-6)) AS sg1,
         sqrt(GREATEST(sxx2 / (n - n1) - (sx2 / (n - n1)) * (sx2 / (n - n1)),
                       1e-6)) AS sg2,
         n1 / n AS pi1
  FROM m1
), e2 AS (
  SELECT x,
         round(1.0 / (1.0 + exp(
           (ln(1.0 - p.pi1) - ln(p.sg2)
            - (x - p.mu2) * (x - p.mu2) / (2.0 * p.sg2 * p.sg2))
           - (ln(p.pi1) - ln(p.sg1)
              - (x - p.mu1) * (x - p.mu1) / (2.0 * p.sg1 * p.sg1)))),
           9) AS r
  FROM v CROSS JOIN p1 p
), m2 AS (
  SELECT CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) AS n1,
         CAST(SUM(CAST(round(r * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sx1,
         CAST(SUM(CAST(round(r * x * x, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxx1,
         CAST(SUM(CAST(round((1.0 - r) * x, 4) AS DECIMAL(38,4)))
              AS DOUBLE) AS sx2,
         CAST(SUM(CAST(round((1.0 - r) * x * x, 2) AS DECIMAL(38,2)))
              AS DOUBLE) AS sxx2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e2
), p2 AS (
  SELECT sx1 / n1 AS mu1, sx2 / (n - n1) AS mu2,
         sqrt(GREATEST(sxx1 / n1 - (sx1 / n1) * (sx1 / n1), 1e-6)) AS sg1,
         sqrt(GREATEST(sxx2 / (n - n1) - (sx2 / (n - n1)) * (sx2 / (n - n1)),
                       1e-6)) AS sg2,
         n1 / n AS pi1
  FROM m2
), e3 AS (
  SELECT x,
         round(1.0 / (1.0 + exp(
           (ln(1.0 - p.pi1) - ln(p.sg2)
            - (x - p.mu2) * (x - p.mu2) / (2.0 * p.sg2 * p.sg2))
           - (ln(p.pi1) - ln(p.sg1)
              - (x - p.mu1) * (x - p.mu1) / (2.0 * p.sg1 * p.sg1)))),
           9) AS r
  FROM v CROSS JOIN p2 p
), m3 AS (
  SELECT CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) AS n1,
         CAST(SUM(CAST(round(r * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sx1,
         CAST(SUM(CAST(round(r * x * x, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxx1,
         CAST(SUM(CAST(round((1.0 - r) * x, 4) AS DECIMAL(38,4)))
              AS DOUBLE) AS sx2,
         CAST(SUM(CAST(round((1.0 - r) * x * x, 2) AS DECIMAL(38,2)))
              AS DOUBLE) AS sxx2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e3
), p3 AS (
  SELECT sx1 / n1 AS mu1, sx2 / (n - n1) AS mu2,
         sqrt(GREATEST(sxx1 / n1 - (sx1 / n1) * (sx1 / n1), 1e-6)) AS sg1,
         sqrt(GREATEST(sxx2 / (n - n1) - (sx2 / (n - n1)) * (sx2 / (n - n1)),
                       1e-6)) AS sg2,
         n1 / n AS pi1, n
  FROM m3
), ll AS (
  SELECT CAST(SUM(CAST(round(
           GREATEST(ln(p.pi1) - ln(p.sg1) - 0.918938533204672741
                      - (x - p.mu1) * (x - p.mu1) / (2.0 * p.sg1 * p.sg1),
                    ln(1.0 - p.pi1) - ln(p.sg2) - 0.918938533204672741
                      - (x - p.mu2) * (x - p.mu2) / (2.0 * p.sg2 * p.sg2))
           + ln(1.0 + exp(
               -abs((ln(p.pi1) - ln(p.sg1)
                     - (x - p.mu1) * (x - p.mu1) / (2.0 * p.sg1 * p.sg1))
                    - (ln(1.0 - p.pi1) - ln(p.sg2)
                       - (x - p.mu2) * (x - p.mu2)
                         / (2.0 * p.sg2 * p.sg2))))), 6)
         AS DECIMAL(28,6))) AS DOUBLE) / MAX(p.n) AS avg_ll
  FROM v CROSS JOIN p3 p
)
SELECT c.k AS component,
       round(CASE WHEN c.k = 1 THEN p.pi1 ELSE 1.0 - p.pi1 END, 6)
         AS weight,
       round(CASE WHEN c.k = 1 THEN p.mu1 ELSE p.mu2 END, 6) AS mu,
       round(CASE WHEN c.k = 1 THEN p.sg1 ELSE p.sg2 END, 6) AS sigma,
       round(l.avg_ll, 6) AS avg_loglik
FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) c(k)
CROSS JOIN p3 p CROSS JOIN ll l
ORDER BY c.k
"""


def _gmm_init_mus(spark: SparkSession, sf_dir: str, v: DataFrame) -> DataFrame:
    """1-row (mu1, mu2) GMM init = P25/P75 of order totals, eagerly
    checkpointed so the E-step consumers don't recompute the grid
    within the run. ``v`` is the caller's cached (x) frame, reused so
    the build shares its scan with the caller's E-steps. (r12: the
    per-(application, sf_dir) memo that let repeat runs skip this
    pass entirely was removed — every invocation computes from the
    parquet inputs.)"""
    g = v.groupBy(F.col("x").cast("decimal(18,2)").alias("xv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # distinct prices scale with the data, so the quartile-init
    # cumulative count is a TWO-PHASE prefix sum: within
    # floor(xv/4096) buckets (totalprice domain ~1e3..5e5 -> ~122
    # buckets, SF-independent) plus broadcast offsets — no
    # SinglePartition pass over the grid (plans/prefix.py).
    cum = two_phase_cumsum(
        g, ["xv"], F.col("cnt"),
        F.floor(F.col("xv") / 4096).cast("bigint"), out="c",
    ).join(F.broadcast(g.agg(F.sum("cnt").cast("bigint").alias("n"))))
    cum = cum.cache()  # consumed by both quantile picks
    q25 = cum.filter(4 * F.col("c") >= F.col("n")).agg(
        F.min("xv").cast("double").alias("mu1")
    )
    q75 = cum.filter(4 * F.col("c") >= 3 * F.col("n")).agg(
        F.min("xv").cast("double").alias("mu2")
    )
    mus = q25.join(F.broadcast(q75)).localCheckpoint()
    cum.unpersist()
    return mus


@query("q_gmm_em", oracle=GMM_SQL)
def q_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("x")
    )
    # single-file scan = ONE input partition; spread rows so the 3
    # E-step scans and the loglik pass run on all cores, not one
    # (no-op on an already-wide cluster scan)
    v = spread(v).cache()  # init grid, 3 E-steps, loglik scan
    mus = _gmm_init_mus(spark, sf_dir, v)
    mom = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("decimal(38,2)")
        .alias("s1"),
        F.sum(
            (F.col("x").cast("decimal(18,2)") * F.col("x").cast("decimal(18,2)"))
            .cast("decimal(38,4)")
        ).cast("decimal(38,4)").alias("s2"),
    )
    mu_g = F.col("s1").cast("double") / F.col("nn")
    sg_g = F.sqrt(F.col("s2").cast("double") / F.col("nn") - mu_g * mu_g)
    p = (
        mus.join(F.broadcast(mom))
        .select(
            "mu1", "mu2",
            sg_g.alias("sg1"), sg_g.alias("sg2"),
            F.lit(0.5).alias("pi1"),
        )
    )

    def la_lb():
        la = (
            F.log("pi1") - F.log("sg1")
            - (F.col("x") - F.col("mu1")) * (F.col("x") - F.col("mu1"))
            / (2.0 * F.col("sg1") * F.col("sg1"))
        )
        lb = (
            F.log(F.lit(1.0) - F.col("pi1")) - F.log("sg2")
            - (F.col("x") - F.col("mu2")) * (F.col("x") - F.col("mu2"))
            / (2.0 * F.col("sg2") * F.col("sg2"))
        )
        return la, lb

    for _ in range(3):
        la, lb = la_lb()
        e = v.join(F.broadcast(p)).select(
            "x",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(lb - la)), 9)
            .alias("r"),
        )
        m = e.agg(
            F.sum(F.col("r").cast("decimal(18,9)")).cast("double")
            .alias("n1"),
            F.sum(F.round(F.col("r") * F.col("x"), 4).cast("decimal(38,4)"))
            .cast("double").alias("sx1"),
            F.sum(
                F.round(F.col("r") * F.col("x") * F.col("x"), 2)
                .cast("decimal(38,2)")
            ).cast("double").alias("sxx1"),
            F.sum(
                F.round((F.lit(1.0) - F.col("r")) * F.col("x"), 4)
                .cast("decimal(38,4)")
            ).cast("double").alias("sx2"),
            F.sum(
                F.round((F.lit(1.0) - F.col("r")) * F.col("x") * F.col("x"),
                        2).cast("decimal(38,2)")
            ).cast("double").alias("sxx2"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        n1, n = F.col("n1"), F.col("n")
        mu1 = F.col("sx1") / n1
        mu2 = F.col("sx2") / (n - n1)
        p = m.select(
            mu1.alias("mu1"), mu2.alias("mu2"),
            F.sqrt(
                F.greatest(F.col("sxx1") / n1 - mu1 * mu1, F.lit(1e-6))
            ).alias("sg1"),
            F.sqrt(
                F.greatest(
                    F.col("sxx2") / (n - n1) - mu2 * mu2, F.lit(1e-6)
                )
            ).alias("sg2"),
            (n1 / n).alias("pi1"),
            n.alias("n"),
        )

    la, lb = la_lb()
    lc = F.lit(0.918938533204672741)  # ln(sqrt(2*pi))
    lad, lbd = la - lc, lb - lc
    ll_term = F.greatest(lad, lbd) + F.log(
        F.lit(1.0) + F.exp(-F.abs(lad - lbd))
    )
    ll = v.join(F.broadcast(p)).agg(
        (
            F.sum(F.round(ll_term, 6).cast("decimal(28,6)")).cast("double")
            / F.max("n")
        ).alias("avg_ll")
    )
    comps = spark.createDataFrame([(1,), (2,)], "k bigint")
    return (
        comps.join(F.broadcast(p)).join(F.broadcast(ll))
        .select(
            F.col("k").alias("component"),
            F.round(
                F.when(F.col("k") == 1, F.col("pi1"))
                .otherwise(F.lit(1.0) - F.col("pi1")), 6
            ).alias("weight"),
            F.round(
                F.when(F.col("k") == 1, F.col("mu1")).otherwise(F.col("mu2")),
                6,
            ).alias("mu"),
            F.round(
                F.when(F.col("k") == 1, F.col("sg1")).otherwise(F.col("sg2")),
                6,
            ).alias("sigma"),
            F.round("avg_ll", 6).alias("avg_loglik"),
        )
        .orderBy("component")
    )


# -- q_brier_decomposition ---------------------------------------------
#
# Murphy decomposition of the Brier score for a day-of-week purchase
# forecaster: p̂(dow) from the FIRST half of the event window, scored
# on the second half. Brier = REL − RES + UNC, where REL (how far
# forecasts sit from their bin's observed rate — what q_calibration_
# ece sees), RES (how much the bins separate outcomes — the skill
# term ECE misses), and UNC (base-rate entropy ō(1−ō)) come from
# exact per-bin counts: the identity shows WHETHER a bad Brier is a
# calibration problem or a no-signal problem. Forecasts are
# 9-rounded count ratios; bin folds round to DECIMAL(28,9). Scale:
# two partial-aggregated scans → 7-bin grid → 7 rows.

BRIER_SQL = """
WITH base AS (
  SELECT isodow(CAST(ts AS DATE)) AS dow,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN 2 * date_diff('day', (SELECT MIN(CAST(ts AS DATE))
                                         FROM events), CAST(ts AS DATE))
                   <= date_diff('day', (SELECT MIN(CAST(ts AS DATE))
                                        FROM events),
                                       (SELECT MAX(CAST(ts AS DATE))
                                        FROM events))
              THEN 0 ELSE 1 END AS is_test
  FROM events
), fc AS (
  SELECT dow,
         round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 9) AS p_hat
  FROM base WHERE is_test = 0 GROUP BY 1
), te AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(y) AS BIGINT) AS o_k
  FROM base WHERE is_test = 1 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_k) AS BIGINT) AS n,
         CAST(SUM(o_k) AS BIGINT) AS o
  FROM te
), bins AS (
  SELECT te.dow, te.n_k, fc.p_hat,
         CAST(te.o_k AS DOUBLE) / te.n_k AS o_bar_k
  FROM te JOIN fc ON fc.dow = te.dow
), terms AS (
  SELECT CAST(SUM(CAST(round(n_k * (p_hat - o_bar_k)
                             * (p_hat - o_bar_k), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS rel_sum,
         CAST(SUM(CAST(round(n_k * (o_bar_k - CAST(t.o AS DOUBLE) / t.n)
                             * (o_bar_k - CAST(t.o AS DOUBLE) / t.n), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS res_sum,
         MAX(t.n) AS n, MAX(CAST(t.o AS DOUBLE) / t.n) AS o_bar
  FROM bins CROSS JOIN tot t
)
SELECT b.dow, b.n_k,
       round(b.p_hat, 6) AS forecast,
       round(b.o_bar_k, 6) AS observed,
       round(t.rel_sum / t.n, 6) AS reliability,
       round(t.res_sum / t.n, 6) AS resolution,
       round(t.o_bar * (1.0 - t.o_bar), 6) AS uncertainty,
       round(t.rel_sum / t.n - t.res_sum / t.n
             + t.o_bar * (1.0 - t.o_bar), 6) AS brier
FROM bins b CROSS JOIN terms t
ORDER BY b.dow
"""


@query("q_brier_decomposition", oracle=BRIER_SQL)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    day = F.col("ts").cast("date")
    iso = F.when(F.dayofweek(day) == 1, F.lit(7)).otherwise(
        F.dayofweek(day) - 1
    )
    raw = e.select(
        iso.cast("bigint").alias("dow"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        day.alias("d"),
    )
    raw = raw.cache()  # consumed by bounds AND the split
    bounds = raw.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    t = F.datediff(F.col("d"), F.col("d0"))
    span = F.datediff(F.col("d1"), F.col("d0"))
    base = raw.join(F.broadcast(bounds)).select(
        "dow", "y", F.when(2 * t <= span, 0).otherwise(1).alias("is_test")
    )
    base = base.cache()  # consumed by the train AND test halves
    fc = base.filter(F.col("is_test") == 0).groupBy("dow").agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 9)
        .alias("p_hat")
    )
    te = base.filter(F.col("is_test") == 1).groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("o_k"),
    )
    te = te.cache()  # consumed by tot AND bins
    tot = te.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("o_k").cast("bigint").alias("o"),
    )
    bins = te.join(fc, "dow").select(
        "dow", "n_k", "p_hat",
        (F.col("o_k").cast("double") / F.col("n_k")).alias("o_bar_k"),
    )
    bins = bins.cache()  # consumed by terms AND the output
    o_bar = F.col("o").cast("double") / F.col("n")
    terms = bins.join(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                F.col("n_k") * (F.col("p_hat") - F.col("o_bar_k"))
                * (F.col("p_hat") - F.col("o_bar_k")), 9
            ).cast("decimal(28,9)")
        ).cast("double").alias("rel_sum"),
        F.sum(
            F.round(
                F.col("n_k") * (F.col("o_bar_k") - o_bar)
                * (F.col("o_bar_k") - o_bar), 9
            ).cast("decimal(28,9)")
        ).cast("double").alias("res_sum"),
        F.max("n").alias("n"),
        F.max(o_bar).alias("o_bar"),
    )
    unc = F.col("o_bar") * (F.lit(1.0) - F.col("o_bar"))
    return (
        bins.join(F.broadcast(terms))
        .select(
            "dow", "n_k",
            F.round("p_hat", 6).alias("forecast"),
            F.round("o_bar_k", 6).alias("observed"),
            F.round(F.col("rel_sum") / F.col("n"), 6).alias("reliability"),
            F.round(F.col("res_sum") / F.col("n"), 6).alias("resolution"),
            F.round(unc, 6).alias("uncertainty"),
            F.round(
                F.col("rel_sum") / F.col("n")
                - F.col("res_sum") / F.col("n") + unc, 6
            ).alias("brier"),
        )
        .orderBy("dow")
    )


# -- q_poisson_irls ----------------------------------------------------
#
# Poisson GLM of daily order counts on time, fit by THREE unrolled
# IRLS iterations (the q_gmm_em pattern for the other workhorse
# iterative fit): ln μ = β₀ + β₁·(t/1000), init β₀ = ln ȳ, each
# round a weighted least squares of the working response z = η +
# (y−μ)/μ with weights μ — 1 regressor + intercept, so the WLS
# solve is closed-form 2×2. Weighted moments fold DECIMAL(28,6)-
# rounded terms; exp/ln chains are identical doubles. Reports the
# fitted rate curve endpoints and the Pearson overdispersion ratio
# (the q_overdispersion diagnostic, here measured against THIS
# model). Scale: init scan + 3 cached-scan IRLS rounds → 1 row.

POISSON_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           / 1000.0 AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
), init AS (
  SELECT ln(CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS b0, 0.0 AS b1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily
), it1 AS (
  SELECT
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x), 6) AS DECIMAL(28,6)))
         AS DOUBLE) AS sw,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x)
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swz,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxz
  FROM daily d CROSS JOIN init p
), p1 AS (
  SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
         (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
  FROM it1 WHERE sw * swxx - swx * swx <> 0
), it2 AS (
  SELECT
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x), 6) AS DECIMAL(28,6)))
         AS DOUBLE) AS sw,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x)
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swz,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxz
  FROM daily d CROSS JOIN p1 p
), p2 AS (
  SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
         (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
  FROM it2 WHERE sw * swxx - swx * swx <> 0
), it3 AS (
  SELECT
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x), 6) AS DECIMAL(28,6)))
         AS DOUBLE) AS sw,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x * d.x, 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxx,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x)
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swz,
    CAST(SUM(CAST(round(exp(p.b0 + p.b1 * d.x) * d.x
                        * ((p.b0 + p.b1 * d.x)
                           + (d.y - exp(p.b0 + p.b1 * d.x))
                             / exp(p.b0 + p.b1 * d.x)), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS swxz
  FROM daily d CROSS JOIN p2 p
), p3 AS (
  SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
         (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
  FROM it3 WHERE sw * swxx - swx * swx <> 0
), pearson AS (
  SELECT CAST(SUM(CAST(round(
           (d.y - exp(p.b0 + p.b1 * d.x))
           * (d.y - exp(p.b0 + p.b1 * d.x))
           / exp(p.b0 + p.b1 * d.x), 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS chi2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily d CROSS JOIN p3 p
)
SELECT pe.n AS n_days,
       round(p.b0, 6) AS beta0,
       round(p.b1, 6) AS beta1_per_1000d,
       round(exp(p.b0), 6) AS rate_at_epoch,
       round(exp(p.b0 + p.b1 * 2.0), 6) AS rate_at_day2000,
       round(pe.chi2 / (pe.n - 2), 6) AS pearson_dispersion
FROM p3 p CROSS JOIN pearson pe
WHERE pe.n > 2
"""


@query("q_poisson_irls", oracle=POISSON_SQL)
def q_poisson_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01")
            ) / 1000.0
        ).alias("x")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    daily = daily.cache()  # consumed by init AND 3 IRLS rounds + pearson
    init = daily.agg(
        F.log(F.sum("y").cast("double") / F.count(F.lit(1))).alias("b0"),
        F.lit(0.0).alias("b1"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    p = init.select("b0", "b1")

    def fold(expr, name):
        return (
            F.sum(F.round(expr, 6).cast("decimal(28,6)")).cast("double")
            .alias(name)
        )

    for _ in range(3):
        eta = F.col("b0") + F.col("b1") * F.col("x")
        mu = F.exp(eta)
        z = eta + (F.col("y") - mu) / mu
        it = daily.join(F.broadcast(p)).agg(
            fold(mu, "sw"), fold(mu * F.col("x"), "swx"),
            fold(mu * F.col("x") * F.col("x"), "swxx"),
            fold(mu * z, "swz"), fold(mu * F.col("x") * z, "swxz"),
        )
        det = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
        p = it.filter(det != 0).select(
            (
                (F.col("swz") * F.col("swxx") - F.col("swxz") * F.col("swx"))
                / det
            ).alias("b0"),
            (
                (F.col("sw") * F.col("swxz") - F.col("swx") * F.col("swz"))
                / det
            ).alias("b1"),
        )

    eta = F.col("b0") + F.col("b1") * F.col("x")
    mu = F.exp(eta)
    pearson = daily.join(F.broadcast(p)).agg(
        fold((F.col("y") - mu) * (F.col("y") - mu) / mu, "chi2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        p.join(F.broadcast(pearson))
        .filter(F.col("n") > 2)
        .select(
            F.col("n").alias("n_days"),
            F.round("b0", 6).alias("beta0"),
            F.round("b1", 6).alias("beta1_per_1000d"),
            F.round(F.exp(F.col("b0")), 6).alias("rate_at_epoch"),
            F.round(F.exp(F.col("b0") + F.col("b1") * 2.0), 6)
            .alias("rate_at_day2000"),
            F.round(F.col("chi2") / (F.col("n") - 2), 6)
            .alias("pearson_dispersion"),
        )
    )


# -- q_kfold_cv --------------------------------------------------------
#
# 5-fold cross-validated decision stump on a task with REAL signal
# (does order value predict whether the order contains a returned
# line? bigger orders carry more lines, so the link is genuinely
# monotone): md5-derived folds, shared 9-decile candidate grid, and
# the inclusion-exclusion trick — per-(candidate, fold) conditional
# counts from ONE scan, training counts for fold k = totals − cell_k,
# so 5 trainings cost one pass. Per-fold winner by min weighted Gini
# (threshold tie-break), majority-label sides, test accuracy from the
# same grid's fold-k cells. The CV spread is the generalization
# check q_decision_stump's single fit can't give. Scale: one fact
# scan → 45-cell grid → 5 rows.

KFOLD_SQL = """
WITH ret AS (
  SELECT l_orderkey, MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           AS y
  FROM lineitem GROUP BY 1
), rows_ AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS x, r.y,
         CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 6))
              ::BIGINT % 5 AS BIGINT) AS fold
  FROM orders o JOIN ret r ON r.l_orderkey = o.o_orderkey
), xgrid AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1
), cumg AS (
  SELECT x, CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM xgrid
), cands AS (
  SELECT CAST(d.d AS BIGINT) AS decile, MIN(x) AS thr
  FROM cumg CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(d)
  WHERE 10 * cum >= d.d * n
  GROUP BY 1
), cells AS MATERIALIZED (
  SELECT c.decile, c.thr, r.fold,
         CAST(SUM(CASE WHEN r.x <= c.thr THEN 1 ELSE 0 END) AS BIGINT)
           AS nl,
         CAST(SUM(CASE WHEN r.x <= c.thr THEN r.y ELSE 0 END) AS BIGINT)
           AS pl,
         CAST(SUM(CASE WHEN r.x > c.thr THEN 1 ELSE 0 END) AS BIGINT)
           AS nr,
         CAST(SUM(CASE WHEN r.x > c.thr THEN r.y ELSE 0 END) AS BIGINT)
           AS pr
  FROM rows_ r CROSS JOIN cands c
  GROUP BY 1, 2, 3
), tots AS (
  SELECT decile, CAST(SUM(nl) AS BIGINT) AS tnl,
         CAST(SUM(pl) AS BIGINT) AS tpl,
         CAST(SUM(nr) AS BIGINT) AS tnr,
         CAST(SUM(pr) AS BIGINT) AS tpr
  FROM cells GROUP BY 1
), train AS (
  SELECT c.fold, c.decile, c.thr,
         t.tnl - c.nl AS nl, t.tpl - c.pl AS pl,
         t.tnr - c.nr AS nr, t.tpr - c.pr AS pr,
         c.nl AS test_nl, c.pl AS test_pl,
         c.nr AS test_nr, c.pr AS test_pr
  FROM cells c JOIN tots t ON c.decile = t.decile
), scored AS (
  SELECT *,
         nl * (2.0 * (pl / CAST(nl AS DOUBLE))
               * (1.0 - pl / CAST(nl AS DOUBLE)))
         + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                 * (1.0 - pr / CAST(nr AS DOUBLE))) AS gini,
         CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS lab_l,
         CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END AS lab_r,
         ROW_NUMBER() OVER (PARTITION BY fold
                            ORDER BY nl * (2.0 * (pl / CAST(nl AS DOUBLE))
                                     * (1.0 - pl / CAST(nl AS DOUBLE)))
                                     + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                                     * (1.0 - pr / CAST(nr AS DOUBLE))) ASC,
                                     thr ASC) AS rn
  FROM train WHERE nl > 0 AND nr > 0
)
SELECT fold,
       CAST(nl + nr AS BIGINT) AS n_train,
       CAST(test_nl + test_nr AS BIGINT) AS n_test,
       CAST(thr AS DOUBLE) AS threshold,
       round((CASE WHEN lab_l = 1 THEN test_pl
                   ELSE test_nl - test_pl END
              + CASE WHEN lab_r = 1 THEN test_pr
                     ELSE test_nr - test_pr END)
             / CAST(test_nl + test_nr AS DOUBLE), 6) AS test_acc,
       round((test_pl + test_pr)
             / CAST(test_nl + test_nr AS DOUBLE), 6) AS test_base_rate
FROM scored WHERE rn = 1 AND test_nl + test_nr > 0
ORDER BY fold
"""


def _decile_thresholds(
    spark: SparkSession, sf_dir: str, rows_: DataFrame
) -> DataFrame:
    """9-row (decile, thr) grid of order-total decile thresholds over
    the orders⋈returned-label rows — IDENTICAL in shape for q_kfold_cv
    and q_learning_curve (their fold/bucket columns don't enter the x
    grid). Eagerly checkpointed so each caller's many fold/bucket
    consumers reuse the 9-row frame within the run. (r12: the
    per-(application, sf_dir) memo that let the second caller and
    repeat runs skip the grid + prefix kernel was removed — every
    invocation computes from the parquet inputs.) ``rows_`` is the
    caller's cached frame so the build shares its scan."""
    xgrid = rows_.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # distinct prices scale with the data: two-phase prefix sum over
    # floor(x/4096) buckets (~122, domain-bounded) — no
    # SinglePartition pass over the grid (plans/prefix.py).
    cumg = two_phase_cumsum(
        xgrid, ["x"], F.col("cnt"),
        F.floor(F.col("x") / 4096).cast("bigint"), out="cum",
    ).join(F.broadcast(xgrid.agg(F.sum("cnt").cast("bigint").alias("n"))))
    dd = spark.range(1, 10).select(F.col("id").cast("bigint").alias("d"))
    cands = (
        cumg.crossJoin(F.broadcast(dd))
        .filter(10 * F.col("cum") >= F.col("d") * F.col("n"))
        .groupBy(F.col("d").alias("decile"))
        .agg(F.min("x").alias("thr"))
    ).localCheckpoint()
    return cands


def _order_label_rows(cat: Catalog, mod: int, col: str) -> DataFrame:
    """(x, y, <hash-bucket>) base frame shared by q_kfold_cv (fold =
    hash % 5) and q_learning_curve (b = hash % 100)."""
    ret = cat.lineitem.groupBy("l_orderkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("y")
    )
    return cat.orders.join(
        ret, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        "y",
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6),
                16,
                10,
            ).cast("bigint")
            % mod
        ).alias(col),
    )


@query("q_kfold_cv", oracle=KFOLD_SQL)
def q_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rows_ = _order_label_rows(cat, 5, "fold")
    rows_ = rows_.cache()  # feeds the decile grid AND the cell pass
    cands = _decile_thresholds(spark, sf_dir, rows_)
    x, y, thr = F.col("x"), F.col("y"), F.col("thr")
    cells = (
        rows_.crossJoin(F.broadcast(cands))
        .groupBy("decile", "thr", "fold")
        .agg(
            F.sum(F.when(x <= thr, 1).otherwise(0)).cast("bigint").alias(
                "nl"
            ),
            F.sum(F.when(x <= thr, y).otherwise(0)).cast("bigint").alias(
                "pl"
            ),
            F.sum(F.when(x > thr, 1).otherwise(0)).cast("bigint").alias(
                "nr"
            ),
            F.sum(F.when(x > thr, y).otherwise(0)).cast("bigint").alias(
                "pr"
            ),
        )
    )
    cells = cells.cache()  # 45 cells feed the totals AND the train rows
    tots = cells.groupBy("decile").agg(
        F.sum("nl").cast("bigint").alias("tnl"),
        F.sum("pl").cast("bigint").alias("tpl"),
        F.sum("nr").cast("bigint").alias("tnr"),
        F.sum("pr").cast("bigint").alias("tpr"),
    )
    train = cells.join(F.broadcast(tots), "decile").select(
        "fold",
        "decile",
        "thr",
        (F.col("tnl") - F.col("nl")).alias("nl"),
        (F.col("tpl") - F.col("pl")).alias("pl"),
        (F.col("tnr") - F.col("nr")).alias("nr"),
        (F.col("tpr") - F.col("pr")).alias("pr"),
        F.col("nl").alias("test_nl"),
        F.col("pl").alias("test_pl"),
        F.col("nr").alias("test_nr"),
        F.col("pr").alias("test_pr"),
    )
    nl, pl, nr, pr = F.col("nl"), F.col("pl"), F.col("nr"), F.col("pr")
    plr = pl / nl.cast("double")
    prr = pr / nr.cast("double")
    gini = nl * (2.0 * plr * (1.0 - plr)) + nr * (2.0 * prr * (1.0 - prr))
    scored = (
        train.filter((nl > 0) & (nr > 0))
        .withColumn("gini", gini)
        .withColumn(
            "lab_l", F.when(2 * pl > nl, 1).otherwise(0)
        )
        .withColumn("lab_r", F.when(2 * pr > nr, 1).otherwise(0))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fold").orderBy(
                    F.asc("gini"), F.asc("thr")
                )
            ),
        )
    )
    tn = F.col("test_nl") + F.col("test_nr")
    correct = F.when(
        F.col("lab_l") == 1, F.col("test_pl")
    ).otherwise(F.col("test_nl") - F.col("test_pl")) + F.when(
        F.col("lab_r") == 1, F.col("test_pr")
    ).otherwise(
        F.col("test_nr") - F.col("test_pr")
    )
    return (
        scored.filter((F.col("rn") == 1) & (tn > 0))
        .select(
            "fold",
            (nl + nr).cast("bigint").alias("n_train"),
            tn.cast("bigint").alias("n_test"),
            thr.cast("double").alias("threshold"),
            F.round(correct / tn.cast("double"), 6).alias("test_acc"),
            F.round(
                (F.col("test_pl") + F.col("test_pr")) / tn.cast("double"),
                6,
            ).alias("test_base_rate"),
        )
        .orderBy("fold")
    )


# -- q_learning_curve --------------------------------------------------
#
# Learning curve of the return-prediction stump: holdout accuracy vs
# training-set size over NESTED md5 subsets (10% ⊂ 20% ⊂ 40% ⊂ 80%
# of orders; the fixed ≥80% bucket is the holdout) — the
# "do we need more data?" curve every training pipeline budgets
# against. All four trainings AND the holdout evaluation come from
# ONE conditional-aggregate pass per candidate threshold (20
# measures on the 9-row candidate grid); each size's winner is the
# min-Gini candidate (threshold tie-break) evaluated on the same
# grid row's holdout cells. Scale: one fact scan → 9-row grid →
# 4 rows.

LEARNING_CURVE_SQL = """
WITH ret AS (
  SELECT l_orderkey, MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           AS y
  FROM lineitem GROUP BY 1
), rows_ AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS x, r.y,
         CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 6))
              ::BIGINT % 100 AS BIGINT) AS b
  FROM orders o JOIN ret r ON r.l_orderkey = o.o_orderkey
), xgrid AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1
), cumg AS (
  SELECT x, CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM xgrid
), cands AS (
  SELECT CAST(d.d AS BIGINT) AS decile, MIN(x) AS thr
  FROM cumg CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(d)
  WHERE 10 * cum >= d.d * n
  GROUP BY 1
), grid AS MATERIALIZED (
  SELECT c.decile, c.thr, f.frac,
         CAST(SUM(CASE WHEN r.b < f.frac AND r.x <= c.thr
                       THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN r.b < f.frac AND r.x <= c.thr
                       THEN r.y ELSE 0 END) AS BIGINT) AS pl,
         CAST(SUM(CASE WHEN r.b < f.frac AND r.x > c.thr
                       THEN 1 ELSE 0 END) AS BIGINT) AS nr,
         CAST(SUM(CASE WHEN r.b < f.frac AND r.x > c.thr
                       THEN r.y ELSE 0 END) AS BIGINT) AS pr,
         CAST(SUM(CASE WHEN r.b >= 80 AND r.x <= c.thr
                       THEN 1 ELSE 0 END) AS BIGINT) AS hnl,
         CAST(SUM(CASE WHEN r.b >= 80 AND r.x <= c.thr
                       THEN r.y ELSE 0 END) AS BIGINT) AS hpl,
         CAST(SUM(CASE WHEN r.b >= 80 AND r.x > c.thr
                       THEN 1 ELSE 0 END) AS BIGINT) AS hnr,
         CAST(SUM(CASE WHEN r.b >= 80 AND r.x > c.thr
                       THEN r.y ELSE 0 END) AS BIGINT) AS hpr
  FROM rows_ r
  CROSS JOIN cands c
  CROSS JOIN (VALUES (10),(20),(40),(80)) f(frac)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT *,
         nl * (2.0 * (pl / CAST(nl AS DOUBLE))
               * (1.0 - pl / CAST(nl AS DOUBLE)))
         + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                 * (1.0 - pr / CAST(nr AS DOUBLE))) AS gini,
         CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS lab_l,
         CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END AS lab_r,
         ROW_NUMBER() OVER (PARTITION BY frac
                            ORDER BY nl * (2.0 * (pl / CAST(nl AS DOUBLE))
                                     * (1.0 - pl / CAST(nl AS DOUBLE)))
                                     + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                                     * (1.0 - pr / CAST(nr AS DOUBLE))) ASC,
                                     thr ASC) AS rn
  FROM grid WHERE nl > 0 AND nr > 0
)
SELECT CAST(frac AS BIGINT) AS train_pct,
       CAST(nl + nr AS BIGINT) AS n_train,
       CAST(thr AS DOUBLE) AS threshold,
       round((nl * (2.0 * (pl / CAST(nl AS DOUBLE))
              * (1.0 - pl / CAST(nl AS DOUBLE)))
              + nr * (2.0 * (pr / CAST(nr AS DOUBLE))
                * (1.0 - pr / CAST(nr AS DOUBLE))))
             / (nl + nr), 6) AS train_gini,
       round((CASE WHEN lab_l = 1 THEN hpl ELSE hnl - hpl END
              + CASE WHEN lab_r = 1 THEN hpr ELSE hnr - hpr END)
             / CAST(hnl + hnr AS DOUBLE), 6) AS holdout_acc
FROM scored
WHERE rn = 1 AND hnl + hnr > 0
ORDER BY train_pct
"""


@query("q_learning_curve", oracle=LEARNING_CURVE_SQL)
def q_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rows_ = _order_label_rows(cat, 100, "b")
    rows_ = rows_.cache()  # feeds the decile grid AND the big cell pass
    cands = _decile_thresholds(spark, sf_dir, rows_)
    fr = spark.createDataFrame(
        [(10,), (20,), (40,), (80,)], "frac long"
    )
    x, y, thr, b = F.col("x"), F.col("y"), F.col("thr"), F.col("b")
    frac = F.col("frac")
    tr = b < frac
    ho = b >= 80
    grid = (
        rows_.crossJoin(F.broadcast(cands))
        .crossJoin(F.broadcast(fr))
        .groupBy("decile", "thr", "frac")
        .agg(
            F.sum(F.when(tr & (x <= thr), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(F.when(tr & (x <= thr), y).otherwise(0))
            .cast("bigint")
            .alias("pl"),
            F.sum(F.when(tr & (x > thr), 1).otherwise(0))
            .cast("bigint")
            .alias("nr"),
            F.sum(F.when(tr & (x > thr), y).otherwise(0))
            .cast("bigint")
            .alias("pr"),
            F.sum(F.when(ho & (x <= thr), 1).otherwise(0))
            .cast("bigint")
            .alias("hnl"),
            F.sum(F.when(ho & (x <= thr), y).otherwise(0))
            .cast("bigint")
            .alias("hpl"),
            F.sum(F.when(ho & (x > thr), 1).otherwise(0))
            .cast("bigint")
            .alias("hnr"),
            F.sum(F.when(ho & (x > thr), y).otherwise(0))
            .cast("bigint")
            .alias("hpr"),
        )
    )
    nl, pl, nr, pr = F.col("nl"), F.col("pl"), F.col("nr"), F.col("pr")
    plr = pl / nl.cast("double")
    prr = pr / nr.cast("double")
    gini = nl * (2.0 * plr * (1.0 - plr)) + nr * (2.0 * prr * (1.0 - prr))
    scored = (
        grid.filter((nl > 0) & (nr > 0))
        .withColumn("gini", gini)
        .withColumn("lab_l", F.when(2 * pl > nl, 1).otherwise(0))
        .withColumn("lab_r", F.when(2 * pr > nr, 1).otherwise(0))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("frac").orderBy(
                    F.asc("gini"), F.asc("thr")
                )
            ),
        )
    )
    hn = F.col("hnl") + F.col("hnr")
    correct = F.when(F.col("lab_l") == 1, F.col("hpl")).otherwise(
        F.col("hnl") - F.col("hpl")
    ) + F.when(F.col("lab_r") == 1, F.col("hpr")).otherwise(
        F.col("hnr") - F.col("hpr")
    )
    return (
        scored.filter((F.col("rn") == 1) & (hn > 0))
        .select(
            frac.cast("bigint").alias("train_pct"),
            (nl + nr).cast("bigint").alias("n_train"),
            thr.cast("double").alias("threshold"),
            F.round(F.col("gini") / (nl + nr), 6).alias("train_gini"),
            F.round(correct / hn.cast("double"), 6).alias("holdout_acc"),
        )
        .orderBy("train_pct")
    )
