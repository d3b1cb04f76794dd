"""SURVEY §2 additions (round 6, eighth session) — statistics breadth:
rank-based k-sample comparison (Kruskal–Wallis), normality testing
(Jarque–Bera), regression-residual autocorrelation (Durbin–Watson),
inter-rater agreement (Cohen's kappa) and categorical dependence
strength (mutual information / NMI).

Shared determinism machinery (see registry docstring): rank algebra
stays exact-integer on the distinct-value midrank grid (the
q_mannwhitney shape — never a row-level global sort), moments are
width-safe exact decimal power sums (the q_bimodality shape), and
every cross-engine double fold first rounds its per-row term to a
DECIMAL so the sum is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_kruskal_wallis --------------------------------------------------
#
# Kruskal–Wallis rank-based one-way ANOVA across event types on the
# event value (the k-sample extension of q_mannwhitney, and the
# nonparametric sibling of q_anova_oneway: does ANY type's value
# distribution sit elsewhere?). Midranks come from ONE distinct-value
# grid (groupBy value → tie count, one grid-sized cumulative window),
# so 2·R_i = Σ ct·(2·cum − cnt + 1) is an exact BIGINT per group.
# H is assembled in NORMALIZED rank units u_i = R_i/(n_i·N) ∈ (0,1]
# so the per-group deviation terms n_i·(u_i − ū)² stay small-magnitude
# doubles; they round to DECIMAL(28,9) before the across-group fold
# (5 groups, but order-independence is still required for the hash).
# Tie correction C = 1 − Σ(t³−t)/(N³−N) uses double denominators (N³
# overflows BIGINT past ~sf1). df = k−1 maps to the classic α=0.05
# chi² critical-value table (df ≤ 6 covers any realistic type count).

KRUSKAL_SQL = """
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), g AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY 1
), rg AS (
  SELECT value, cnt,
         CAST(SUM(cnt) OVER (ORDER BY value) AS BIGINT) AS cum
  FROM g
), gstat AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
  FROM g
), tg AS (
  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS ct
  FROM vals GROUP BY 1, 2
), per AS (
  SELECT t.event_type,
         CAST(SUM(t.ct) AS BIGINT) AS n1,
         CAST(SUM(t.ct * (2 * r.cum - r.cnt + 1)) AS BIGINT) AS r2x
  FROM tg t JOIN rg r ON r.value = t.value
  GROUP BY 1
), terms AS (
  SELECT event_type, n1, r2x,
         CAST(round(n1 * (r2x / (2.0 * n1 * n) - (n + 1.0) / (2.0 * n))
                       * (r2x / (2.0 * n1 * n) - (n + 1.0) / (2.0 * n)), 9)
              AS DECIMAL(28,9)) AS term
  FROM per CROSS JOIN gstat
), hstat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(term) AS DOUBLE) AS st
  FROM terms
), hrow AS (
  SELECT k, 12.0 * n / (n + 1.0) * st AS h,
         12.0 * n / (n + 1.0) * st
           / (1.0 - ties / (CAST(n AS DOUBLE) * n * n - n)) AS h_adj
  FROM hstat CROSS JOIN gstat
)
SELECT p.event_type, p.n1 AS n,
       round(p.r2x / (2.0 * p.n1), 6) AS mean_rank,
       round(h.h, 6) AS h_stat,
       round(h.h_adj, 6) AS h_adj,
       CAST(h.k - 1 AS BIGINT) AS df,
       CAST(CASE WHEN h.h_adj >
         CASE h.k - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
                      WHEN 3 THEN 7.815 WHEN 4 THEN 9.488
                      WHEN 5 THEN 11.070 WHEN 6 THEN 12.592
                      ELSE 1e308 END
         THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM per p CROSS JOIN hrow h
ORDER BY p.event_type
"""


@query("q_kruskal_wallis", oracle=KRUSKAL_SQL)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    vals = e.filter(F.col("value").isNotNull()).select("event_type", "value")
    g = vals.groupBy("value").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # grid-sized cumulative window over distinct values (documented
    # grid sort — |grid| rows, never the row-level fact table)
    rg = g.select(
        "value", "cnt",
        F.sum("cnt").over(Window.orderBy("value")).cast("bigint").alias("cum"),
    )
    glob = g.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint").alias("ties"),
    )
    tg = vals.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    per = (
        tg.join(rg, "value")
        .groupBy("event_type")
        .agg(
            F.sum("ct").cast("bigint").alias("n1"),
            F.sum(F.col("ct") * (2 * F.col("cum") - F.col("cnt") + 1))
            .cast("bigint").alias("r2x"),
        )
        .localCheckpoint(eager=True)  # terms fold + output rows both consume
    )
    n, n1, r2x, ties = (F.col(c) for c in ("n", "n1", "r2x", "ties"))
    du = r2x / (2.0 * n1 * n) - (n + F.lit(1.0)) / (2.0 * n)
    terms = per.join(F.broadcast(glob)).select(
        "event_type", "n1", "r2x",
        F.round(n1 * du * du, 9).cast("decimal(28,9)").alias("term"),
    )
    hstat = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("term").cast("double").alias("st"),
    )
    h = F.lit(12.0) * n / (n + F.lit(1.0)) * F.col("st")
    h_adj = h / (
        F.lit(1.0) - ties / (n.cast("double") * n * n - n)
    )
    hrow = hstat.join(F.broadcast(glob)).select(
        F.col("k"), h.alias("h"), h_adj.alias("h_adj")
    )
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 5.991)
        .when(F.col("k") - 1 == 3, 7.815)
        .when(F.col("k") - 1 == 4, 9.488)
        .when(F.col("k") - 1 == 5, 11.070)
        .when(F.col("k") - 1 == 6, 12.592)
        .otherwise(F.lit(1e308))
    )
    return (
        per.join(F.broadcast(hrow))
        .select(
            "event_type",
            F.col("n1").alias("n"),
            F.round(F.col("r2x") / (2.0 * F.col("n1")), 6).alias("mean_rank"),
            F.round(F.col("h"), 6).alias("h_stat"),
            F.round(F.col("h_adj"), 6).alias("h_adj"),
            (F.col("k") - 1).cast("bigint").alias("df"),
            F.when(F.col("h_adj") > crit, 1).otherwise(0).cast("bigint")
            .alias("significant"),
        )
        .orderBy("event_type")
    )


# -- q_jarque_bera -----------------------------------------------------
#
# Jarque–Bera normality test per event type: JB = n/6·(S² + K²/4)
# from population skewness S = m₃/m₂^1.5 and excess kurtosis
# K = m₄/m₂² − 3. Values are bounded 2-decimal amounts, so all four
# power sums stay width-safe exact decimals (the q_bimodality lesson:
# ONE factor widened to (19,4) keeps DuckDB's decimal multiply off
# its overflowing int64 fast path while the 4th-power product stays
# ≤38 digits for Spark). JB ~ χ²(2) under normality, whose survival
# function is EXACTLY exp(−JB/2) — a closed-form p-value with no
# quantile table. Scale: one scan to the |types| moment grid.

JB_SQL = """
WITH v AS (
  SELECT event_type, CAST(value AS DECIMAL(8,2)) AS x
  FROM events WHERE value IS NOT NULL
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(28,2)) AS s1,
         CAST(SUM(CAST(x * x AS DECIMAL(19,4))) AS DECIMAL(36,4)) AS s2,
         CAST(SUM(CAST(CAST(x * x AS DECIMAL(19,4)) * x AS DECIMAL(27,6)))
              AS DECIMAL(38,6)) AS s3,
         CAST(SUM(CAST(CAST(x * x AS DECIMAL(19,4))
                       * CAST(x * x AS DECIMAL(15,4)) AS DECIMAL(35,8)))
              AS DECIMAL(38,8)) AS s4
  FROM v GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM m
), jb AS (
  SELECT event_type, n,
         m3 / (m2 * sqrt(m2)) AS s,
         m4 / (m2 * m2) - 3.0 AS k,
         n / 6.0 * (m3 / (m2 * sqrt(m2)) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                      / 4.0) AS jb
  FROM c WHERE m2 > 0
)
SELECT event_type, n,
       round(s, 6) AS skewness,
       round(k, 6) AS excess_kurtosis,
       round(jb, 6) AS jb_stat,
       round(exp(-jb / 2.0), 6) AS p_value,
       CAST(CASE WHEN exp(-jb / 2.0) < 0.05 THEN 1 ELSE 0 END AS BIGINT)
         AS non_normal
FROM jb
ORDER BY event_type
"""


@query("q_jarque_bera", oracle=JB_SQL)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    x = F.col("value").cast("decimal(8,2)")
    x2 = (x * x).cast("decimal(19,4)")
    x2n = (x * x).cast("decimal(15,4)")
    m = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(x).cast("decimal(28,2)").alias("s1"),
            F.sum(x2).cast("decimal(36,4)").alias("s2"),
            F.sum((x2 * x).cast("decimal(27,6)")).cast("decimal(38,6)")
            .alias("s3"),
            F.sum((x2 * x2n).cast("decimal(35,8)")).cast("decimal(38,8)")
            .alias("s4"),
        )
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    s2d = F.col("s2").cast("double") / n
    s3d = F.col("s3").cast("double") / n
    s4d = F.col("s4").cast("double") / n
    m2 = s2d - mu * mu
    m3 = s3d - 3.0 * mu * s2d + 2.0 * mu * mu * mu
    m4 = s4d - 4.0 * mu * s3d + 6.0 * mu * mu * s2d - 3.0 * mu * mu * mu * mu
    s = m3 / (m2 * F.sqrt(m2))
    k = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (s * s + k * k / F.lit(4.0))
    return (
        m.filter(m2 > 0)
        .select(
            "event_type", "n",
            F.round(s, 6).alias("skewness"),
            F.round(k, 6).alias("excess_kurtosis"),
            F.round(jb, 6).alias("jb_stat"),
            F.round(F.exp(-jb / 2.0), 6).alias("p_value"),
            F.when(F.exp(-jb / 2.0) < 0.05, 1).otherwise(0).cast("bigint")
            .alias("non_normal"),
        )
        .orderBy("event_type")
    )


# -- q_durbin_watson ---------------------------------------------------
#
# Durbin–Watson residual-autocorrelation diagnostic on the daily
# revenue linear trend (the q_forecast_linear OLS): DW ≈ 2 means the
# trend residuals are white, DW → 0 positive serial correlation —
# i.e. "a linear trend is NOT an adequate model and prediction
# intervals will be too narrow". Slope/intercept come from exact
# integer/decimal moments (single double division); residuals are one
# identical double chain per day row; the Σ(eₜ−eₜ₋₁)² and Σeₜ² folds
# round each term to DECIMAL(28,6) first (order-independent across
# the day grid). Shape: one scan → |days| grid → 1 row.

DW_SQL = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(19,2))
           AS rev
  FROM lineitem GROUP BY 1
), idx AS (
  SELECT date_diff('day', DATE '1992-01-01', day) AS t,
         CAST(rev AS DOUBLE) AS y
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(19,2))) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(t * CAST(y AS DECIMAL(19,2))) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(t * t) AS BIGINT) AS sxx
  FROM idx
), fit AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n AS a
  FROM m WHERE n * sxx - sx * sx <> 0
), resid AS (
  SELECT t, y - (a + b * t) AS e,
         LAG(y - (a + b * t)) OVER (ORDER BY t) AS ep
  FROM idx CROSS JOIN fit
), folds AS (
  SELECT CAST(SUM(CAST(round(e * e, 6) AS DECIMAL(28,6))) AS DOUBLE) AS den,
         CAST(SUM(CASE WHEN ep IS NOT NULL
                       THEN CAST(round((e - ep) * (e - ep), 6)
                                 AS DECIMAL(28,6)) END) AS DOUBLE) AS num
  FROM resid
)
SELECT f.n AS n_days,
       round(f.b, 6) AS slope,
       round(f.a, 6) AS intercept,
       round(o.num / o.den, 6) AS dw_stat,
       round(1.0 - o.num / o.den / 2.0, 6) AS rho_approx,
       CAST(CASE WHEN o.num / o.den < 1.5 THEN 1 ELSE 0 END AS BIGINT)
         AS positive_autocorr
FROM fit f CROSS JOIN folds o
"""


@query("q_durbin_watson", oracle=DW_SQL)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(19,2)").alias("rev")
    )
    idx = daily.select(
        F.datediff("day", F.lit("1992-01-01")).alias("t"),
        F.col("rev").cast("double").alias("y"),
    ).localCheckpoint(eager=True)  # moments + residual grid both consume
    m = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("sx"),
        F.sum(F.col("y").cast("decimal(19,2)")).cast("decimal(28,2)")
        .alias("sy"),
        F.sum(F.col("t") * F.col("y").cast("decimal(19,2)"))
        .cast("decimal(38,2)").alias("sxy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    b = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    a = (sy.cast("double") - b * sx) / n
    fit = m.filter(n * sxx - sx * sx != 0).select(
        n.alias("n"), b.alias("b"), a.alias("a")
    )
    ew = Window.orderBy("t")  # |days| grid — documented grid sort
    e_ = F.col("y") - (F.col("a") + F.col("b") * F.col("t"))
    resid = idx.join(F.broadcast(fit)).select(
        "t", e_.alias("e"), F.lag(e_).over(ew).alias("ep")
    )
    folds = resid.agg(
        F.sum(F.round(F.col("e") * F.col("e"), 6).cast("decimal(28,6)"))
        .cast("double").alias("den"),
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                F.round(
                    (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")), 6
                ).cast("decimal(28,6)"),
            )
        ).cast("double").alias("num"),
    )
    dw = F.col("num") / F.col("den")
    return fit.join(F.broadcast(folds)).select(
        F.col("n").alias("n_days"),
        F.round(F.col("b"), 6).alias("slope"),
        F.round(F.col("a"), 6).alias("intercept"),
        F.round(dw, 6).alias("dw_stat"),
        F.round(F.lit(1.0) - dw / 2.0, 6).alias("rho_approx"),
        F.when(dw < 1.5, 1).otherwise(0).cast("bigint")
        .alias("positive_autocorr"),
    )


# -- q_cohens_kappa ----------------------------------------------------
#
# Cohen's kappa agreement between two independent document quality
# "raters" — the length gate (n_chars ≥ 300) and an alphabetic-density
# gate (letters/length ≥ 0.70): the chance-corrected answer to "do two
# cheap corpus filters actually agree, or do they just both pass most
# docs?" — the standard sanity check before composing filters into a
# pipeline (two 90%-pass gates can still have κ ≈ 0). Confusion
# counts are exact integers off one scan; κ = (pₒ − pₑ)/(1 − pₑ) is a
# single double chain; the Landis–Koch band makes the verdict legible.

KAPPA_SQL = """
WITH r AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN length(text) > 0
                   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) >= 0.70
              THEN 1 ELSE 0 END AS b
  FROM documents
), cm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS both_pos,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS a_only,
         CAST(SUM((1 - a) * b) AS BIGINT) AS b_only,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS both_neg
  FROM r
), k AS (
  SELECT n, both_pos, a_only, b_only, both_neg,
         (both_pos + both_neg) / CAST(n AS DOUBLE) AS po,
         ((both_pos + a_only) / CAST(n AS DOUBLE))
           * ((both_pos + b_only) / CAST(n AS DOUBLE))
         + ((b_only + both_neg) / CAST(n AS DOUBLE))
           * ((a_only + both_neg) / CAST(n AS DOUBLE)) AS pe
  FROM cm
)
SELECT n, both_pos, a_only, b_only, both_neg,
       round(po, 6) AS po,
       round(pe, 6) AS pe,
       round((po - pe) / (1.0 - pe), 6) AS kappa,
       CASE WHEN (po - pe) / (1.0 - pe) < 0.2 THEN 'slight'
            WHEN (po - pe) / (1.0 - pe) < 0.4 THEN 'fair'
            WHEN (po - pe) / (1.0 - pe) < 0.6 THEN 'moderate'
            WHEN (po - pe) / (1.0 - pe) < 0.8 THEN 'substantial'
            ELSE 'almost_perfect' END AS agreement
FROM k
"""


@query("q_cohens_kappa", oracle=KAPPA_SQL)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    a = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    b = F.when(
        (F.length("text") > 0)
        & (alpha / F.length("text").cast("double") >= 0.70),
        1,
    ).otherwise(0)
    cm = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("both_pos"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("a_only"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("b_only"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint")
        .alias("both_neg"),
    )
    n = F.col("n").cast("double")
    po = (F.col("both_pos") + F.col("both_neg")) / n
    pe = ((F.col("both_pos") + F.col("a_only")) / n) * (
        (F.col("both_pos") + F.col("b_only")) / n
    ) + ((F.col("b_only") + F.col("both_neg")) / n) * (
        (F.col("a_only") + F.col("both_neg")) / n
    )
    kappa = (po - pe) / (F.lit(1.0) - pe)
    return cm.select(
        "n", "both_pos", "a_only", "b_only", "both_neg",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
        F.when(kappa < 0.2, "slight")
        .when(kappa < 0.4, "fair")
        .when(kappa < 0.6, "moderate")
        .when(kappa < 0.8, "substantial")
        .otherwise("almost_perfect")
        .alias("agreement"),
    )


# -- q_mutual_info -----------------------------------------------------
#
# Mutual information between event type and day-of-week, with both
# marginal entropies and the sqrt-normalized NMI ∈ [0,1] — the
# model-free dependence strength that chi²'s p-value can't give at
# scale (with N large EVERYTHING is "significant"; NMI answers "how
# MUCH dependence"). All probabilities derive from exact integer
# counts on the |types|×7 contingency grid; each p·ln(...) term
# rounds to DECIMAL(18,9) before its fold so the tiny-grid double
# sums are order-independent. Absent cells contribute exactly 0 (the
# txt_js_divergence closed-form-absent-term lesson), so only the
# observed grid materializes. Shape: one scan → ≤35-cell grid → 1 row.

MI_SQL = """
WITH obs AS (
  SELECT event_type, isodow(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs
), rows_m AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS cr FROM obs GROUP BY 1
), cols_m AS (
  SELECT dow, CAST(SUM(c) AS BIGINT) AS cc FROM obs GROUP BY 1
), mi AS (
  SELECT CAST(SUM(CAST(round(
           (o.c / CAST(t.n AS DOUBLE))
           * ln(o.c * CAST(t.n AS DOUBLE) / (r.cr * CAST(c.cc AS DOUBLE))),
           9) AS DECIMAL(18,9))) AS DOUBLE) AS mi_nats
  FROM obs o
  JOIN rows_m r ON r.event_type = o.event_type
  JOIN cols_m c ON c.dow = o.dow
  CROSS JOIN tot t
), hr AS (
  SELECT CAST(SUM(CAST(round(
           -(cr / CAST(n AS DOUBLE)) * ln(cr / CAST(n AS DOUBLE)), 9)
           AS DECIMAL(18,9))) AS DOUBLE) AS h_type,
         CAST(COUNT(*) AS BIGINT) AS k_types
  FROM rows_m CROSS JOIN tot
), hc AS (
  SELECT CAST(SUM(CAST(round(
           -(cc / CAST(n AS DOUBLE)) * ln(cc / CAST(n AS DOUBLE)), 9)
           AS DECIMAL(18,9))) AS DOUBLE) AS h_dow,
         CAST(COUNT(*) AS BIGINT) AS k_dows
  FROM cols_m CROSS JOIN tot
)
SELECT t.n, hr.k_types, hc.k_dows,
       round(mi.mi_nats, 6) AS mi_nats,
       round(hr.h_type, 6) AS h_type,
       round(hc.h_dow, 6) AS h_dow,
       round(mi.mi_nats / sqrt(hr.h_type * hc.h_dow), 6) AS nmi
FROM mi CROSS JOIN hr CROSS JOIN hc CROSS JOIN tot t
"""


@query("q_mutual_info", oracle=MI_SQL)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    iso = F.when(F.dayofweek("ts") == 1, F.lit(7)).otherwise(
        F.dayofweek("ts") - 1
    )
    obs = (
        e.groupBy("event_type", iso.alias("dow"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # 4 consumers: mi, marginals, total
    )
    tot = obs.agg(F.sum("c").cast("bigint").alias("n"))
    rows_m = obs.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("cr")
    )
    cols_m = obs.groupBy("dow").agg(F.sum("c").cast("bigint").alias("cc"))
    nd = F.col("n").cast("double")
    mi = (
        obs.join(rows_m, "event_type")
        .join(cols_m, "dow")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    (F.col("c") / nd)
                    * F.log(
                        F.col("c") * nd / (F.col("cr") * F.col("cc").cast("double"))
                    ),
                    9,
                ).cast("decimal(18,9)")
            ).cast("double").alias("mi_nats")
        )
    )
    hr = rows_m.join(F.broadcast(tot)).agg(
        F.sum(
            F.round(-(F.col("cr") / nd) * F.log(F.col("cr") / nd), 9)
            .cast("decimal(18,9)")
        ).cast("double").alias("h_type"),
        F.count(F.lit(1)).cast("bigint").alias("k_types"),
    )
    hc = cols_m.join(F.broadcast(tot)).agg(
        F.sum(
            F.round(-(F.col("cc") / nd) * F.log(F.col("cc") / nd), 9)
            .cast("decimal(18,9)")
        ).cast("double").alias("h_dow"),
        F.count(F.lit(1)).cast("bigint").alias("k_dows"),
    )
    return (
        mi.join(F.broadcast(hr))
        .join(F.broadcast(hc))
        .join(F.broadcast(tot))
        .select(
            "n", "k_types", "k_dows",
            F.round(F.col("mi_nats"), 6).alias("mi_nats"),
            F.round(F.col("h_type"), 6).alias("h_type"),
            F.round(F.col("h_dow"), 6).alias("h_dow"),
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("h_type") * F.col("h_dow")), 6
            ).alias("nmi"),
        )
    )
