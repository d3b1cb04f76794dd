"""SURVEY §2 additions (round 6, continued) — model-evaluation and
parametric-survival primitives: MCC-centred classifier metrics on an
operational rule, NDCG@10 ranking evaluation, and a Weibull fit on
top of the Kaplan-Meier curve.

All three are exact-count aggregations with one identical double
chain per output number — training/evaluation IS aggregation, the
same posture as ml.py (Naive Bayes / decision stump).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_mcc_confusion ---------------------------------------------------
#
# Full confusion-matrix metric panel per ship-year for the
# operational rule "deep discount (l_discount >= 0.06) predicts a
# return (l_returnflag = 'R')": MCC, F1, balanced accuracy and
# Youden's J from exact integer cells. MCC is the one single-number
# metric that survives class imbalance (accuracy and even F1 mislead
# when positives are ~25%); q_naive_bayes / q_decision_stump report
# accuracy-family numbers — this is the metric layer they feed.
# The sqrt denominator is computed in DOUBLE (the 4-factor product
# overflows BIGINT) with an explicit >0 guard (Spark's non-ANSI /0
# yields NULL while DuckDB yields inf — never rely on that). Scale:
# one fact scan partial-aggregated to |years| cells; no joins.

MCC_SQL = """
WITH base AS (
  SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(l_discount AS DECIMAL(4,2)) >= 0.06
              THEN 1 ELSE 0 END AS pred
  FROM lineitem
), cm AS (
  SELECT ship_year,
    CAST(SUM(y * pred) AS BIGINT) AS tp,
    CAST(SUM((1 - y) * pred) AS BIGINT) AS fp,
    CAST(SUM((1 - y) * (1 - pred)) AS BIGINT) AS tn,
    CAST(SUM(y * (1 - pred)) AS BIGINT) AS fn
  FROM base GROUP BY 1
)
SELECT ship_year, tp, fp, tn, fn,
  round(CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0 AND (tn+fp) > 0 AND (tn+fn) > 0
    THEN (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
         / sqrt(CAST(tp+fp AS DOUBLE) * (tp+fn) * (tn+fp) * (tn+fn))
    END, 6) AS mcc,
  round(CASE WHEN 2*tp + fp + fn > 0
    THEN 2.0 * tp / (2*tp + fp + fn) END, 6) AS f1,
  round(CASE WHEN (tp+fn) > 0 AND (tn+fp) > 0
    THEN (CAST(tp AS DOUBLE)/(tp+fn) + CAST(tn AS DOUBLE)/(tn+fp)) / 2.0
    END, 6) AS balanced_acc,
  round(CASE WHEN (tp+fn) > 0 AND (tn+fp) > 0
    THEN CAST(tp AS DOUBLE)/(tp+fn) + CAST(tn AS DOUBLE)/(tn+fp) - 1.0
    END, 6) AS youden_j,
  round(CAST(tp + fn AS DOUBLE) / (tp + fp + tn + fn), 6) AS prevalence
FROM cm ORDER BY ship_year
"""


@query("q_mcc_confusion", oracle=MCC_SQL)
def q_mcc_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select(
        F.year(F.to_date("l_shipdate")).cast("bigint").alias("ship_year"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.when(
            F.col("l_discount").cast("decimal(4,2)") >= 0.06, 1
        ).otherwise(0).alias("pred"),
    )
    cm = li.groupBy("ship_year").agg(
        F.sum(F.col("y") * F.col("pred")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("pred")).cast("bigint").alias("fp"),
        F.sum((1 - F.col("y")) * (1 - F.col("pred"))).cast("bigint").alias("tn"),
        F.sum(F.col("y") * (1 - F.col("pred"))).cast("bigint").alias("fn"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    tn, fn = F.col("tn"), F.col("fn")
    tpr = tp.cast("double") / (tp + fn)
    tnr = tn.cast("double") / (tn + fp)
    ok_rates = ((tp + fn) > 0) & ((tn + fp) > 0)
    return cm.select(
        "ship_year", "tp", "fp", "tn", "fn",
        F.round(
            F.when(
                ((tp + fp) > 0) & ((tp + fn) > 0)
                & ((tn + fp) > 0) & ((tn + fn) > 0),
                (tp.cast("double") * tn - fp.cast("double") * fn)
                / F.sqrt(
                    (tp + fp).cast("double") * (tp + fn) * (tn + fp) * (tn + fn)
                ),
            ),
            6,
        ).alias("mcc"),
        F.round(
            F.when((2 * tp + fp + fn) > 0, 2.0 * tp / (2 * tp + fp + fn)), 6
        ).alias("f1"),
        F.round(F.when(ok_rates, (tpr + tnr) / 2.0), 6).alias("balanced_acc"),
        F.round(F.when(ok_rates, tpr + tnr - 1.0), 6).alias("youden_j"),
        F.round((tp + fn).cast("double") / (tp + fp + tn + fn), 6)
        .alias("prevalence"),
    ).orderBy("ship_year")


# -- q_ndcg_eval -------------------------------------------------------
#
# NDCG@10 retrieval evaluation per market segment: the "model" ranks
# a segment's customers by account balance (the scoring proxy);
# graded relevance 3..0 is the customer's exact within-segment
# 1995-revenue quartile (no-1995-orders customers grade 0, from the
# left join). DCG@10 = Σ (2^g − 1)/log2(rank+1) over the model's top
# 10; IDCG re-ranks by grade itself — NDCG = DCG/IDCG is the
# standard search/recsys offline metric txt_bm25/txt_rank_fusion
# produce rankings FOR but nothing previously scored. Determinism:
# both rankings tie-break on custkey; each gain term is an identical
# double rounded to DECIMAL(28,9) so the 10-term fold is exact.
# Scale: facts collapse to the |customers| grid; the three windows
# run on that grid, range-partitioned by segment at cluster scale.

NDCG_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
  GROUP BY 1
), cust AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey AS ck, c.c_acctbal AS bal,
         COALESCE(rev.r, CAST(0 AS DECIMAL(18,2))) AS r
  FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey
), graded AS (
  SELECT seg, ck, bal, r,
         CASE WHEN r > 0 THEN 4 - NTILE(4) OVER
                (PARTITION BY seg, CASE WHEN r > 0 THEN 1 ELSE 0 END
                 ORDER BY r DESC, ck)
              ELSE 0 END AS g
  FROM cust
), ranked AS (
  SELECT seg, g,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY bal DESC, ck)
           AS model_rk,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY g DESC, ck)
           AS ideal_rk
  FROM graded
), terms AS (
  SELECT seg,
    SUM(CASE WHEN model_rk <= 10 THEN
      CAST(round((power(2.0, g) - 1.0) / log2(model_rk + 1.0), 9)
           AS DECIMAL(28,9)) END) AS dcg,
    SUM(CASE WHEN ideal_rk <= 10 THEN
      CAST(round((power(2.0, g) - 1.0) / log2(ideal_rk + 1.0), 9)
           AS DECIMAL(28,9)) END) AS idcg,
    CAST(SUM(CASE WHEN model_rk <= 10 AND g >= 2 THEN 1 ELSE 0 END)
         AS BIGINT) AS hits_at_10
  FROM ranked GROUP BY seg
)
SELECT seg, round(CAST(dcg AS DOUBLE), 6) AS dcg_10,
       round(CAST(idcg AS DOUBLE), 6) AS idcg_10,
       round(CASE WHEN CAST(idcg AS DOUBLE) > 0
                  THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) END, 6)
         AS ndcg_10,
       hits_at_10
FROM terms ORDER BY seg
"""


@query("q_ndcg_eval", oracle=NDCG_SQL)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.orders.filter(
            (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    cust = cat.customer.join(
        rev, F.col("o_custkey") == F.col("c_custkey"), "left"
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("ck"),
        F.col("c_acctbal").alias("bal"),
        F.coalesce(F.col("r"), F.lit(0).cast("decimal(18,2)")).alias("r"),
    )
    has_rev = F.when(F.col("r") > 0, 1).otherwise(0)
    graded = cust.select(
        "seg", "ck", "bal", "r",
        F.when(
            F.col("r") > 0,
            4 - F.ntile(4).over(
                Window.partitionBy("seg", has_rev)
                .orderBy(F.col("r").desc(), "ck")
            ),
        ).otherwise(0).alias("g"),
    )
    ranked = graded.select(
        "seg", "g",
        F.row_number().over(
            Window.partitionBy("seg").orderBy(F.col("bal").desc(), "ck")
        ).alias("model_rk"),
        F.row_number().over(
            Window.partitionBy("seg").orderBy(F.col("g").desc(), "ck")
        ).alias("ideal_rk"),
    )
    gain = F.pow(F.lit(2.0), F.col("g")) - 1.0
    terms = ranked.groupBy("seg").agg(
        F.sum(
            F.when(
                F.col("model_rk") <= 10,
                F.round(gain / F.log2(F.col("model_rk") + 1.0), 9)
                .cast("decimal(28,9)"),
            )
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_rk") <= 10,
                F.round(gain / F.log2(F.col("ideal_rk") + 1.0), 9)
                .cast("decimal(28,9)"),
            )
        ).alias("idcg"),
        F.sum(
            F.when((F.col("model_rk") <= 10) & (F.col("g") >= 2), 1)
            .otherwise(0)
        ).cast("bigint").alias("hits_at_10"),
    )
    dcg_d = F.col("dcg").cast("double")
    idcg_d = F.col("idcg").cast("double")
    return terms.select(
        "seg",
        F.round(dcg_d, 6).alias("dcg_10"),
        F.round(idcg_d, 6).alias("idcg_10"),
        F.round(F.when(idcg_d > 0, dcg_d / idcg_d), 6).alias("ndcg_10"),
        "hits_at_10",
    ).orderBy("seg")


# -- q_weibull_fit -----------------------------------------------------
#
# Weibull parametric fit of the time-to-second-order distribution,
# estimated by OLS on the linearized KM curve: for event times with
# 0 < S(t) < 1, ln(−ln S(t)) = k·ln t − k·ln λ, so the regression
# slope IS the shape k (k < 1 = decreasing repeat-purchase hazard,
# the classic "buy again soon or never" signature) and
# λ = exp(−intercept/k). Reports k, λ, the implied median and p90,
# and the fit R² — the parametric summary q_survival_km's
# nonparametric curve cannot extrapolate from. Determinism: S(t) is
# the 6-rounded KM survival (identical by construction), x/y moment
# folds round to DECIMAL(28,9). Scale: identical to q_survival_km —
# facts collapse to |customers| then to the day grid; the regression
# runs on ≤ day-span rows.

WEIBULL_SQL = """
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
  SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
              ELSE date_diff('day', d1, de) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM fs CROSS JOIN endd
), n_tot AS (SELECT COUNT(*) AS nt FROM obs),
grid AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS c FROM obs GROUP BY 1
), r AS (
  SELECT t, d,
         nt - COALESCE(CAST(SUM(c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS n
  FROM grid CROSS JOIN n_tot
), s AS (
  SELECT t, d, n,
         MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (ORDER BY t) AS dead,
         CAST(SUM(CASE WHEN d < n THEN
                CAST(ln((n - d) / CAST(n AS DOUBLE)) AS DECIMAL(18,9))
              END) OVER (ORDER BY t) AS DOUBLE) AS lsum
  FROM r
), pts AS (
  SELECT ln(CAST(t AS DOUBLE)) AS x,
         ln(-ln(round(exp(lsum), 6))) AS y
  FROM s
  WHERE d > 0 AND dead = 0 AND t > 0
    AND round(exp(lsum), 6) > 0 AND round(exp(lsum), 6) < 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(round(y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM pts
), fit AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b,
         (n * sxy - sx * sy) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
  FROM m WHERE n > 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
)
SELECT n AS n_points, round(k, 6) AS shape_k,
       round(exp(-b / k), 6) AS scale_lambda,
       round(exp(-b / k) * power(ln(2.0), 1.0 / k), 6) AS median_days,
       round(exp(-b / k) * power(ln(10.0), 1.0 / k), 6) AS p90_days,
       round(r2, 6) AS r_squared
FROM fit
"""


@query("q_weibull_fit", oracle=WEIBULL_SQL)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    wc = Window.partitionBy("o_custkey")
    obs0 = o.withColumn("d1", F.min("od").over(wc))
    fs = obs0.groupBy("o_custkey", "d1").agg(
        F.min(F.when(F.col("od") > F.col("d1"), F.col("od"))).alias("d2")
    )
    endd = o.agg(F.max("od").alias("de"))
    obs = fs.join(F.broadcast(endd)).select(
        F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
        .otherwise(F.datediff("de", "d1"))
        .alias("t"),
        F.when(F.col("d2").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    nt = obs.agg(F.count(F.lit(1)).alias("nt"))
    grid = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    wt = Window.orderBy("t")
    r = grid.join(F.broadcast(nt)).select(
        "t", "d",
        (
            F.col("nt")
            - F.coalesce(
                F.sum("c").over(wt.rowsBetween(Window.unboundedPreceding, -1))
                .cast("bigint"),
                F.lit(0),
            )
        ).alias("n"),
    )
    s = r.select(
        "t", "d", "n",
        F.max(F.when(F.col("d") >= F.col("n"), 1).otherwise(0))
        .over(wt).alias("dead"),
        F.sum(
            F.when(
                F.col("d") < F.col("n"),
                F.log((F.col("n") - F.col("d")) / F.col("n").cast("double"))
                .cast("decimal(18,9)"),
            )
        ).over(wt).cast("double").alias("lsum"),
    )
    surv = F.round(F.exp(F.col("lsum")), 6)
    pts = s.filter(
        (F.col("d") > 0) & (F.col("dead") == 0) & (F.col("t") > 0)
        & (surv > 0) & (surv < 1)
    ).select(
        F.log(F.col("t").cast("double")).alias("x"),
        F.log(-F.log(surv)).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("x", 9).cast("decimal(28,9)")).cast("double").alias("sx"),
        F.sum(F.round("y", 9).cast("decimal(28,9)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(28,9)"))
        .cast("double").alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(28,9)"))
        .cast("double").alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 9).cast("decimal(28,9)"))
        .cast("double").alias("syy"),
    )
    n = F.col("n")
    vxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    fit = m.filter((n > 2) & (vxx > 0) & (vyy > 0)).select(
        "n",
        (cxy / vxx).alias("k"),
        ((F.col("sy") - cxy / vxx * F.col("sx")) / n).alias("b"),
        (cxy * cxy / (vxx * vyy)).alias("r2"),
    )
    lam = F.exp(-F.col("b") / F.col("k"))
    return fit.select(
        F.col("n").alias("n_points"),
        F.round("k", 6).alias("shape_k"),
        F.round(lam, 6).alias("scale_lambda"),
        F.round(lam * F.pow(F.log(F.lit(2.0)), 1.0 / F.col("k")), 6)
        .alias("median_days"),
        F.round(lam * F.pow(F.log(F.lit(10.0)), 1.0 / F.col("k")), 6)
        .alias("p90_days"),
        F.round("r2", 6).alias("r_squared"),
    )


# -- q_fairness_audit --------------------------------------------------
#
# Group-fairness audit of a selection rule across market segments
# (the protected attribute): the rule "flag orders with
# o_totalprice >= 150000" is scored per segment for demographic
# parity (selection rate and its disparate-impact ratio vs the
# most-selected segment — the 80% rule), and for equalized odds
# (TPR/FPR gaps vs the pooled rates) against the outcome "order was
# URGENT/HIGH priority". All cells are exact integer counts; every
# rate is one identical double chain. The responsible-AI audit layer
# over the same confusion-cell machinery as q_mcc_confusion — but
# sliced by group, where the pooled numbers hide the disparity.
# Scale: one broadcast-dim join, one |segments| grid, one 1-row
# pooled agg broadcast back.

FAIRNESS_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS seg,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(o.o_totalprice AS DECIMAL(18,2)) >= 150000
              THEN 1 ELSE 0 END AS sel
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(sel) AS BIGINT) AS n_sel,
    CAST(SUM(y * sel) AS BIGINT) AS tp,
    CAST(SUM((1 - y) * sel) AS BIGINT) AS fp,
    CAST(SUM(y) AS BIGINT) AS n_pos
  FROM base GROUP BY 1
), pooled AS (
  SELECT CAST(SUM(tp) AS DOUBLE) / SUM(n_pos) AS tpr_all,
         CAST(SUM(fp) AS DOUBLE) / SUM(n - n_pos) AS fpr_all,
         MAX(CAST(n_sel AS DOUBLE) / n) AS max_rate
  FROM g
)
SELECT g.seg, g.n, g.n_sel,
  round(CAST(g.n_sel AS DOUBLE) / g.n, 6) AS sel_rate,
  round((CAST(g.n_sel AS DOUBLE) / g.n) / p.max_rate, 6) AS di_ratio,
  CAST(CASE WHEN (CAST(g.n_sel AS DOUBLE) / g.n) / p.max_rate < 0.8
            THEN 1 ELSE 0 END AS BIGINT) AS di_violation,
  round(CAST(g.tp AS DOUBLE) / g.n_pos, 6) AS tpr,
  round(CAST(g.fp AS DOUBLE) / (g.n - g.n_pos), 6) AS fpr,
  round(CAST(g.tp AS DOUBLE) / g.n_pos - p.tpr_all, 6) AS tpr_gap,
  round(CAST(g.fp AS DOUBLE) / (g.n - g.n_pos) - p.fpr_all, 6) AS fpr_gap
FROM g CROSS JOIN pooled p
ORDER BY g.seg
"""


@query("q_fairness_audit", oracle=FAIRNESS_SQL)
def q_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    base = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
        F.when(
            F.col("o_totalprice").cast("decimal(18,2)") >= 150000, 1
        ).otherwise(0).alias("sel"),
    )
    g = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sel").cast("bigint").alias("n_sel"),
        F.sum(F.col("y") * F.col("sel")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("sel")).cast("bigint").alias("fp"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    g = g.cache()  # consumed by the pooled agg AND the output rows
    pooled = g.agg(
        (F.sum("tp").cast("double") / F.sum("n_pos")).alias("tpr_all"),
        (
            F.sum("fp").cast("double") / F.sum(F.col("n") - F.col("n_pos"))
        ).alias("fpr_all"),
        F.max(F.col("n_sel").cast("double") / F.col("n")).alias("max_rate"),
    )
    rate = F.col("n_sel").cast("double") / F.col("n")
    tpr = F.col("tp").cast("double") / F.col("n_pos")
    fpr = F.col("fp").cast("double") / (F.col("n") - F.col("n_pos"))
    return (
        g.join(F.broadcast(pooled))
        .select(
            "seg", "n", "n_sel",
            F.round(rate, 6).alias("sel_rate"),
            F.round(rate / F.col("max_rate"), 6).alias("di_ratio"),
            F.when(rate / F.col("max_rate") < 0.8, 1).otherwise(0)
            .cast("bigint").alias("di_violation"),
            F.round(tpr, 6).alias("tpr"),
            F.round(fpr, 6).alias("fpr"),
            F.round(tpr - F.col("tpr_all"), 6).alias("tpr_gap"),
            F.round(fpr - F.col("fpr_all"), 6).alias("fpr_gap"),
        )
        .orderBy("seg")
    )


# -- q_item_cf ---------------------------------------------------------
#
# Item-item collaborative filtering at the brand grain: baskets =
# distinct (order, brand); co-occurrence counts from the bounded
# per-order self-join (orders hold ≤7 line items, so pair fan-out is
# ≤21 per order — Σk² over baskets, never |brands|² and never
# |orders|²); cosine similarity c_ij/√(c_i·c_j); top-3 neighbors per
# brand by (cosine, neighbor) with row_number. This is the
# normalized-similarity recsys primitive q_market_basket's
# support/confidence/lift table stops short of — cosine is what
# item-CF serving actually ranks by. Determinism: counts exact,
# cosine one double chain, ties broken on neighbor name. Scale: the
# basket table shuffles once on orderkey; the pair grid is
# |brands|²-bounded (625) so the window is trivial.

ITEMCF_SQL = """
WITH basket AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), cnt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM basket GROUP BY 1
), pairs AS (
  SELECT a.b AS b1, bb.b AS b2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM basket a JOIN basket bb ON bb.ok = a.ok AND a.b < bb.b
  GROUP BY 1, 2
), sym AS (
  SELECT b1 AS b, b2 AS nb, c12 FROM pairs
  UNION ALL
  SELECT b2 AS b, b1 AS nb, c12 FROM pairs
), scored AS (
  SELECT s.b, s.nb, s.c12,
         s.c12 / sqrt(CAST(c1.c AS DOUBLE) * c2.c) AS cosine
  FROM sym s JOIN cnt c1 ON c1.b = s.b JOIN cnt c2 ON c2.b = s.nb
), ranked AS (
  SELECT b, nb, c12, cosine,
         ROW_NUMBER() OVER (PARTITION BY b
                            ORDER BY cosine DESC, nb) AS rk
  FROM scored
)
SELECT b AS brand, nb AS neighbor, c12 AS n_co_orders,
       round(cosine, 6) AS cosine, CAST(rk AS BIGINT) AS rank
FROM ranked WHERE rk <= 3
ORDER BY brand, rank
"""


@query("q_item_cf", oracle=ITEMCF_SQL)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # In-row pair generation (r11, the q_bradley_terry duel pattern):
    # collect_set(b) per order replaces BOTH the distinct AND the
    # data-sized basket self-join — the per-order brand set is bounded
    # by |brands| = 25, so the i < j upper triangle of the SORTED set
    # generates each (b1 < b2) co-occurrence exactly once per order,
    # identical to the a.b < bb.b join condition over distinct rows.
    g = (
        cat.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    )
    g = g.cache()  # consumed by cnt AND the pair explode
    # checkpoint the <=|brands|-row appearance counts: cnt feeds TWO
    # broadcast builds (c1, c2) that otherwise race to execute the
    # basket lineage before g's cache is populated (r11, the
    # q_recsys_coverage structure)
    cnt = (
        g.select(F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    pair_expr = """
    flatten(
      transform(bs, (x, i) ->
        transform(slice(bs, i + 2, size(bs)), y ->
          named_struct('b1', x, 'b2', y))))
    """
    pairs = (
        g.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    sym = pairs.select(
        F.col("b1").alias("b"), F.col("b2").alias("nb"), "c12"
    ).union(pairs.select(F.col("b2").alias("b"), F.col("b1").alias("nb"), "c12"))
    c1 = cnt.select(F.col("b").alias("cb"), F.col("c").alias("c1"))
    c2 = cnt.select(F.col("b").alias("nbb"), F.col("c").alias("c2"))
    scored = (
        sym.join(F.broadcast(c1), F.col("cb") == F.col("b"))
        .join(F.broadcast(c2), F.col("nbb") == F.col("nb"))
        .select(
            "b", "nb", "c12",
            (
                F.col("c12") / F.sqrt(F.col("c1").cast("double") * F.col("c2"))
            ).alias("cosine"),
        )
    )
    ranked = scored.select(
        "b", "nb", "c12", "cosine",
        F.row_number().over(
            Window.partitionBy("b").orderBy(F.col("cosine").desc(), "nb")
        ).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select(
            F.col("b").alias("brand"),
            F.col("nb").alias("neighbor"),
            F.col("c12").alias("n_co_orders"),
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").cast("bigint").alias("rank"),
        )
        .orderBy("brand", "rank")
    )


# -- q_competing_risks -------------------------------------------------
#
# Aalen–Johansen cumulative incidence functions for two COMPETING
# first events after a user's arrival: first 'purchase' vs first
# 'error' (whichever strikes first claims the user; purchase wins
# exact ties deterministically). Naive per-cause 1−KM overstates
# risk when causes compete — CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s)
# with the OVERALL survival S is the correct decomposition, and
# CIF_A+CIF_B ≤ 1−S always holds. Determinism: the same
# exp-of-decimal-ln-fold S(s−) machinery as q_survival_km (6-rounded
# survival, collapse flag pins post-collapse terms to 0), CIF terms
# 9-rounded into exact decimal cumsums. Scale: events collapse to
# |users| observations on the user_id shuffle key, then to the
# bounded day grid; all windows run on that grid.

CRISK_SQL = """
WITH u AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY 1
), firsts AS (
  SELECT u.user_id, u.t0,
         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u.t0
                  THEN e.ts END) AS ta,
         MIN(CASE WHEN e.event_type = 'error' AND e.ts > u.t0
                  THEN e.ts END) AS tb
  FROM u JOIN events e ON e.user_id = u.user_id
  GROUP BY 1, 2
), horizon AS (SELECT MAX(ts) AS hz FROM events),
obs AS (
  SELECT CASE
           WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb)
             THEN date_diff('day', t0, ta)
           WHEN tb IS NOT NULL THEN date_diff('day', t0, tb)
           ELSE date_diff('day', t0, hz) END AS t,
         CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb) THEN 1
              ELSE 0 END AS ea,
         CASE WHEN (ta IS NULL OR (tb IS NOT NULL AND tb < ta))
                   AND tb IS NOT NULL THEN 1 ELSE 0 END AS eb
  FROM firsts CROSS JOIN horizon
), n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM obs),
grid AS (
  SELECT t, CAST(SUM(ea) AS BIGINT) AS da, CAST(SUM(eb) AS BIGINT) AS db,
         COUNT(*) AS c
  FROM obs GROUP BY 1
), r AS (
  SELECT t, da, db,
         nt - COALESCE(CAST(SUM(c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS n
  FROM grid CROSS JOIN n_tot
), s AS (
  SELECT t, da, db, n,
         COALESCE(MAX(CASE WHEN da + db >= n THEN 1 ELSE 0 END)
             OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS dead_prev,
         COALESCE(CAST(SUM(CASE WHEN da + db < n THEN
                CAST(ln((n - da - db) / CAST(n AS DOUBLE))
                     AS DECIMAL(18,9)) END)
             OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS DOUBLE), 0.0) AS lsum_prev
  FROM r
), terms AS (
  SELECT t, da, db, n,
    CASE WHEN dead_prev = 1 THEN CAST(0.0 AS DECIMAL(18,9))
         ELSE CAST(round(round(exp(lsum_prev), 6) * da / n, 9)
                   AS DECIMAL(18,9)) END AS ia,
    CASE WHEN dead_prev = 1 THEN CAST(0.0 AS DECIMAL(18,9))
         ELSE CAST(round(round(exp(lsum_prev), 6) * db / n, 9)
                   AS DECIMAL(18,9)) END AS ib
  FROM s
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_at_risk,
       da AS d_purchase, db AS d_error,
       round(CAST(SUM(ia) OVER (ORDER BY t) AS DOUBLE), 6) AS cif_purchase,
       round(CAST(SUM(ib) OVER (ORDER BY t) AS DOUBLE), 6) AS cif_error
FROM terms WHERE da + db > 0
ORDER BY t
"""


@query("q_competing_risks", oracle=CRISK_SQL)
def q_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_type")
    u = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    firsts = (
        u.join(ev.withColumnRenamed("user_id", "uid"),
               F.col("uid") == F.col("user_id"))
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t0")),
                    F.col("ts"),
                )
            ).alias("ta"),
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("ts") > F.col("t0")),
                    F.col("ts"),
                )
            ).alias("tb"),
        )
    )
    horizon = ev.agg(F.max("ts").alias("hz"))
    a_first = F.col("ta").isNotNull() & (
        F.col("tb").isNull() | (F.col("ta") <= F.col("tb"))
    )
    b_first = (
        F.col("ta").isNull() | (F.col("tb").isNotNull() & (F.col("tb") < F.col("ta")))
    ) & F.col("tb").isNotNull()
    obs = firsts.join(F.broadcast(horizon)).select(
        F.when(a_first, F.datediff(F.to_date("ta"), F.to_date("t0")))
        .when(F.col("tb").isNotNull(),
              F.datediff(F.to_date("tb"), F.to_date("t0")))
        .otherwise(F.datediff(F.to_date("hz"), F.to_date("t0")))
        .alias("t"),
        F.when(a_first, 1).otherwise(0).alias("ea"),
        F.when(b_first, 1).otherwise(0).alias("eb"),
    )
    obs = obs.cache()  # consumed by the total AND the grid agg
    nt = obs.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    grid = obs.groupBy("t").agg(
        F.sum("ea").cast("bigint").alias("da"),
        F.sum("eb").cast("bigint").alias("db"),
        F.count(F.lit(1)).alias("c"),
    )
    wt = Window.orderBy("t")
    wprev = wt.rowsBetween(Window.unboundedPreceding, -1)
    r = grid.join(F.broadcast(nt)).select(
        "t", "da", "db",
        (
            F.col("nt")
            - F.coalesce(
                F.sum("c").over(wprev).cast("bigint"), F.lit(0)
            )
        ).alias("n"),
    )
    d_all = F.col("da") + F.col("db")
    s = r.select(
        "t", "da", "db", "n",
        F.coalesce(
            F.max(F.when(d_all >= F.col("n"), 1).otherwise(0)).over(wprev),
            F.lit(0),
        ).alias("dead_prev"),
        F.coalesce(
            F.sum(
                F.when(
                    d_all < F.col("n"),
                    F.log(
                        (F.col("n") - d_all) / F.col("n").cast("double")
                    ).cast("decimal(18,9)"),
                )
            ).over(wprev).cast("double"),
            F.lit(0.0),
        ).alias("lsum_prev"),
    )
    s_prev = F.round(F.exp(F.col("lsum_prev")), 6)
    terms = s.select(
        "t", "da", "db", "n",
        F.when(F.col("dead_prev") == 1, F.lit(0.0).cast("decimal(18,9)"))
        .otherwise(
            F.round(s_prev * F.col("da") / F.col("n"), 9).cast("decimal(18,9)")
        ).alias("ia"),
        F.when(F.col("dead_prev") == 1, F.lit(0.0).cast("decimal(18,9)"))
        .otherwise(
            F.round(s_prev * F.col("db") / F.col("n"), 9).cast("decimal(18,9)")
        ).alias("ib"),
    )
    return (
        terms.select(
            F.col("t").cast("bigint").alias("t_days"),
            F.col("n").cast("bigint").alias("n_at_risk"),
            F.col("da").alias("d_purchase"),
            F.col("db").alias("d_error"),
            F.round(F.sum("ia").over(wt).cast("double"), 6)
            .alias("cif_purchase"),
            F.round(F.sum("ib").over(wt).cast("double"), 6).alias("cif_error"),
            (F.col("da") + F.col("db")).alias("_d"),
        )
        .filter(F.col("_d") > 0)
        .drop("_d")
        .orderBy("t_days")
    )


# -- q_life_table ------------------------------------------------------
#
# Actuarial life table of time-to-second-order in 30-day intervals:
# the grouped-data survival estimator (exposure n′ = n − c/2 credits
# within-interval censors half an interval — the demography/
# insurance convention) next to q_survival_km's exact-time KM and
# q_weibull_fit's parametric curve. Per interval: entrants, events,
# censors, conditional q̂ = d/n′, and the survival fold
# S = exp(Σ ln(1−q̂)) with DECIMAL(18,9) ln terms and a collapse
# guard, 6-rounded. Scale: the same |customers|→day-grid collapse
# as KM, then a 30-day floor-div regroup to ≤ span/30 rows; all
# windows run on that bounded grid.

LIFE_SQL = """
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
  SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
              ELSE date_diff('day', d1, de) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM fs CROSS JOIN endd
), n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM obs),
ivl AS (
  SELECT CAST(t // 30 AS BIGINT) AS k,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
  FROM obs GROUP BY 1
), r AS (
  SELECT k, d, c,
         nt - COALESCE(CAST(SUM(d + c) OVER (ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT), 0) AS n
  FROM ivl CROSS JOIN n_tot
), qk AS (
  SELECT k, d, c, n,
         CAST(n AS DOUBLE) - c / 2.0 AS n_prime,
         d / (CAST(n AS DOUBLE) - c / 2.0) AS q
  FROM r WHERE CAST(n AS DOUBLE) - c / 2.0 > 0
), s AS (
  SELECT k, d, c, n, n_prime, q,
         MAX(CASE WHEN q >= 1 THEN 1 ELSE 0 END)
           OVER (ORDER BY k) AS dead,
         CAST(SUM(CASE WHEN q < 1 THEN
                CAST(ln(1.0 - q) AS DECIMAL(18,9)) END)
           OVER (ORDER BY k) AS DOUBLE) AS lsum
  FROM qk
)
SELECT k AS interval_no, k * 30 AS t_start, n AS n_enter, d AS n_events,
       c AS n_censored, round(n_prime, 1) AS exposure,
       round(q, 6) AS q_hat,
       CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
         AS survival_end
FROM s ORDER BY k
"""


@query("q_life_table", oracle=LIFE_SQL)
def q_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    wc = Window.partitionBy("o_custkey")
    obs0 = o.withColumn("d1", F.min("od").over(wc))
    fs = obs0.groupBy("o_custkey", "d1").agg(
        F.min(F.when(F.col("od") > F.col("d1"), F.col("od"))).alias("d2")
    )
    endd = o.agg(F.max("od").alias("de"))
    obs = fs.join(F.broadcast(endd)).select(
        F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
        .otherwise(F.datediff("de", "d1"))
        .alias("t"),
        F.when(F.col("d2").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    obs = obs.cache()  # consumed by the total AND the interval agg
    nt = obs.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    ivl = obs.groupBy(F.floor(F.col("t") / 30).cast("bigint").alias("k")).agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("bigint").alias("c"),
    )
    wk = Window.orderBy("k")
    r = ivl.join(F.broadcast(nt)).select(
        "k", "d", "c",
        (
            F.col("nt")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c"))
                .over(wk.rowsBetween(Window.unboundedPreceding, -1))
                .cast("bigint"),
                F.lit(0),
            )
        ).alias("n"),
    )
    n_prime = F.col("n").cast("double") - F.col("c") / 2.0
    qk = r.filter(n_prime > 0).select(
        "k", "d", "c", "n",
        n_prime.alias("n_prime"),
        (F.col("d") / n_prime).alias("q"),
    )
    s = qk.select(
        "k", "d", "c", "n", "n_prime", "q",
        F.max(F.when(F.col("q") >= 1, 1).otherwise(0)).over(wk).alias("dead"),
        F.sum(
            F.when(F.col("q") < 1, F.log(1.0 - F.col("q")).cast("decimal(18,9)"))
        ).over(wk).cast("double").alias("lsum"),
    )
    return s.select(
        F.col("k").alias("interval_no"),
        (F.col("k") * 30).alias("t_start"),
        F.col("n").alias("n_enter"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round("n_prime", 1).alias("exposure"),
        F.round("q", 6).alias("q_hat"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lsum"), 6)).alias("survival_end"),
    ).orderBy("interval_no")


# -- q_nbd_fit ---------------------------------------------------------
#
# Negative-binomial (NBD) moment fit of per-user event counts — the
# count-mixture workhorse for activity modeling: p̂ = m/v, r̂ =
# m²/(v−m) from EXACT integer moments (Σk, Σk² over users), then
# the recurrence P(K=k+1) = P(K=k)·(r+k)/(k+1)·(1−p) unrolled for
# k = 0..4 (each step 9-rounded so both engines chain identical
# doubles), a 5+ tail bucket by complement, and the observed-vs-
# expected χ² — q_overdispersion DETECTS v>m, this FITS the model
# that explains it. Scale: one |users| grid agg, a 1-row moment
# fold, and a 6-row exploded frequency comparison (explode(array),
# not a union, so the fit row computes once).

NBD_SQL = """
WITH ku AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events GROUP BY 1
), kc AS (
  SELECT CASE WHEN k >= 5 THEN 5 ELSE k END AS kb,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM ku GROUP BY 1
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(k AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(k AS DECIMAL(38,0)) * k) AS DOUBLE) AS s2
  FROM ku
), fit AS (
  SELECT n, s1 / n AS m,
         s2 / n - (s1 / n) * (s1 / n) AS v,
         (s1 / n) / (s2 / n - (s1 / n) * (s1 / n)) AS p,
         (s1 / n) * (s1 / n)
           / ((s2 / n - (s1 / n) * (s1 / n)) - s1 / n) AS r
  FROM mom
  WHERE s2 / n - (s1 / n) * (s1 / n) > s1 / n
), probs AS (
  SELECT n, m, v, p, r,
         round(power(p, r), 9) AS p0
  FROM fit
), chain AS (
  SELECT n, m, v, p, r, p0,
         round(p0 * r * (1.0 - p) / 1.0, 9) AS p1,
         round(round(p0 * r * (1.0 - p) / 1.0, 9)
               * (r + 1.0) * (1.0 - p) / 2.0, 9) AS p2,
         round(round(round(p0 * r * (1.0 - p) / 1.0, 9)
               * (r + 1.0) * (1.0 - p) / 2.0, 9)
               * (r + 2.0) * (1.0 - p) / 3.0, 9) AS p3,
         round(round(round(round(p0 * r * (1.0 - p) / 1.0, 9)
               * (r + 1.0) * (1.0 - p) / 2.0, 9)
               * (r + 2.0) * (1.0 - p) / 3.0, 9)
               * (r + 3.0) * (1.0 - p) / 4.0, 9) AS p4
  FROM probs
), expgrid AS (
  SELECT c.n, c.r, c.p, g.kb,
         CASE g.kb
           WHEN 0 THEN c.p0 WHEN 1 THEN c.p1 WHEN 2 THEN c.p2
           WHEN 3 THEN c.p3 WHEN 4 THEN c.p4
           ELSE round(1.0 - c.p0 - c.p1 - c.p2 - c.p3 - c.p4, 9) END AS pk
  FROM chain c CROSS JOIN (SELECT r.range AS kb FROM range(0, 6) r) g
), cmp AS (
  SELECT e.kb, COALESCE(o.n_obs, 0) AS n_obs,
         round(e.n * e.pk, 4) AS n_exp,
         e.r, e.p,
         CASE WHEN e.n * e.pk > 0
              THEN CAST(round((COALESCE(o.n_obs, 0) - e.n * e.pk)
                              * (COALESCE(o.n_obs, 0) - e.n * e.pk)
                              / (e.n * e.pk), 9) AS DECIMAL(28,9))
              ELSE CAST(0 AS DECIMAL(28,9)) END AS chi_term
  FROM expgrid e LEFT JOIN kc o ON o.kb = e.kb
), chi AS (
  SELECT CAST(SUM(chi_term) AS DOUBLE) AS chi2 FROM cmp
)
SELECT cmp.kb AS k_bucket, cmp.n_obs, cmp.n_exp,
       round(cmp.r, 6) AS r_shape, round(cmp.p, 6) AS p_param,
       round(chi.chi2, 4) AS chi2_stat
FROM cmp CROSS JOIN chi ORDER BY cmp.kb
"""


@query("q_nbd_fit", oracle=NBD_SQL)
def q_nbd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    ku = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ku = ku.cache()  # consumed by the bucket counts AND the moment fold
    kc = ku.groupBy(
        F.when(F.col("k") >= 5, 5).otherwise(F.col("k")).alias("kb")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    mom = ku.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("k").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).cast("double")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    m = s1 / n
    v = s2 / n - m * m
    fit = mom.filter(v > m).select(
        "n", m.alias("m"), v.alias("v"),
        (m / v).alias("p"), (m * m / (v - m)).alias("r"),
    )
    p, r = F.col("p"), F.col("r")
    probs = fit.select(
        "n", "m", "v", "p", "r", F.round(F.pow(p, r), 9).alias("p0")
    )
    p1 = F.round(F.col("p0") * r * (1.0 - p) / 1.0, 9)
    p2 = F.round(p1 * (r + 1.0) * (1.0 - p) / 2.0, 9)
    p3 = F.round(p2 * (r + 2.0) * (1.0 - p) / 3.0, 9)
    p4 = F.round(p3 * (r + 3.0) * (1.0 - p) / 4.0, 9)
    chain = probs.select(
        "n", "m", "v", "p", "r", "p0",
        p1.alias("p1"), p2.alias("p2"), p3.alias("p3"), p4.alias("p4"),
    )
    # 6-way fan-out via explode(array) so the 1-row fit computes once
    # (no union-branch duplication of the upstream aggregates)
    expgrid = chain.select(
        "n", "r", "p",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kb).cast("bigint").alias("kb"),
                        (
                            F.col(f"p{kb}")
                            if kb < 5
                            else F.round(
                                1.0 - F.col("p0") - F.col("p1") - F.col("p2")
                                - F.col("p3") - F.col("p4"), 9
                            )
                        ).alias("pk"),
                    )
                    for kb in range(6)
                ]
            )
        ).alias("g"),
    ).select("n", "r", "p", F.col("g.kb").alias("kb"), F.col("g.pk").alias("pk"))
    cmp_df = expgrid.join(F.broadcast(kc), "kb", "left").select(
        "kb",
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        F.round(F.col("n") * F.col("pk"), 4).alias("n_exp"),
        "r", "p",
        F.when(
            F.col("n") * F.col("pk") > 0,
            F.round(
                (F.coalesce("n_obs", F.lit(0)) - F.col("n") * F.col("pk"))
                * (F.coalesce("n_obs", F.lit(0)) - F.col("n") * F.col("pk"))
                / (F.col("n") * F.col("pk")),
                9,
            ).cast("decimal(28,9)"),
        ).otherwise(F.lit(0).cast("decimal(28,9)")).alias("chi_term"),
    )
    cmp_df = cmp_df.cache()  # consumed by the chi2 fold AND the output rows
    chi = cmp_df.agg(F.sum("chi_term").cast("double").alias("chi2"))
    return (
        cmp_df.join(F.broadcast(chi))
        .select(
            F.col("kb").alias("k_bucket"), "n_obs", "n_exp",
            F.round("r", 6).alias("r_shape"),
            F.round("p", 6).alias("p_param"),
            F.round("chi2", 4).alias("chi2_stat"),
        )
        .orderBy("k_bucket")
    )


# -- q_absorbing_chain -------------------------------------------------
#
# Absorbing-Markov-chain funnel analysis with the closed-form 2×2
# fundamental matrix N = (I−Q)⁻¹: consecutive event pairs map to
# transient classes {browse = view|click, engage = signup} and
# absorbing classes {purchase, error}; transition probabilities are
# exact count ratios, and N·𝟙 / N·R give expected remaining touches
# and absorption probabilities per starting class — the quantities
# q_event_transitions' raw matrix and q_markov_stationary's
# long-run mix don't answer ("how many touches until conversion,
# and does it end in purchase or error?"). Determinism: the 2×2
# inverse is one literal double chain over exact ratios. Scale: one
# lag window on the user_id-partitioned event stream → a ≤16-cell
# transition grid; everything after is 1-row algebra.

ABSORB_SQL = """
WITH seq AS (
  SELECT CASE WHEN event_type IN ('view', 'click') THEN 'browse'
              WHEN event_type = 'signup' THEN 'engage'
              ELSE event_type END AS cls,
         LEAD(CASE WHEN event_type IN ('view', 'click') THEN 'browse'
                   WHEN event_type = 'signup' THEN 'engage'
                   ELSE event_type END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT cls, nxt FROM seq
  WHERE nxt IS NOT NULL AND cls IN ('browse', 'engage')
), cnt AS (
  SELECT cls, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2
), tot AS (
  SELECT cls, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), p AS (
  SELECT MAX(CASE WHEN cls = 'browse' AND nxt = 'browse' THEN pr END) AS qbb,
         MAX(CASE WHEN cls = 'browse' AND nxt = 'engage' THEN pr END) AS qbe,
         MAX(CASE WHEN cls = 'engage' AND nxt = 'browse' THEN pr END) AS qeb,
         MAX(CASE WHEN cls = 'engage' AND nxt = 'engage' THEN pr END) AS qee,
         MAX(CASE WHEN cls = 'browse' AND nxt = 'purchase' THEN pr END) AS rbp,
         MAX(CASE WHEN cls = 'browse' AND nxt = 'error' THEN pr END) AS rbx,
         MAX(CASE WHEN cls = 'engage' AND nxt = 'purchase' THEN pr END) AS rep,
         MAX(CASE WHEN cls = 'engage' AND nxt = 'error' THEN pr END) AS rex
  FROM (
    SELECT c.cls, c.nxt, c.c / CAST(t.t AS DOUBLE) AS pr
    FROM cnt c JOIN tot t ON t.cls = c.cls
  )
), f AS (
  SELECT COALESCE(qbb, 0.0) AS qbb, COALESCE(qbe, 0.0) AS qbe,
         COALESCE(qeb, 0.0) AS qeb, COALESCE(qee, 0.0) AS qee,
         COALESCE(rbp, 0.0) AS rbp, COALESCE(rbx, 0.0) AS rbx,
         COALESCE(rep, 0.0) AS rep, COALESCE(rex, 0.0) AS rex
  FROM p
), inv AS (
  SELECT *,
         (1.0 - qbb) * (1.0 - qee) - qbe * qeb AS det
  FROM f
), nmat AS (
  SELECT *,
         (1.0 - qee) / det AS nbb, qbe / det AS nbe,
         qeb / det AS neb, (1.0 - qbb) / det AS nee
  FROM inv WHERE det > 0
)
SELECT s.state,
  round(CASE s.state WHEN 'browse' THEN nbb + nbe ELSE neb + nee END, 6)
    AS expected_touches,
  round(CASE s.state WHEN 'browse' THEN nbb * rbp + nbe * rep
                     ELSE neb * rbp + nee * rep END, 6) AS p_purchase,
  round(CASE s.state WHEN 'browse' THEN nbb * rbx + nbe * rex
                     ELSE neb * rbx + nee * rex END, 6) AS p_error
FROM nmat CROSS JOIN (SELECT 'browse' AS state UNION ALL
                      SELECT 'engage') s
ORDER BY s.state
"""


@query("q_absorbing_chain", oracle=ABSORB_SQL)
def q_absorbing_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    cls = (
        F.when(F.col("event_type").isin("view", "click"), "browse")
        .when(F.col("event_type") == "signup", "engage")
        .otherwise(F.col("event_type"))
    )
    seq = ev.select(
        cls.alias("cls"),
        F.lead(cls).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("nxt"),
    )
    pairs = seq.filter(
        F.col("nxt").isNotNull() & F.col("cls").isin("browse", "engage")
    )
    cnt = pairs.groupBy("cls", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cnt = cnt.cache()  # consumed by the row totals AND the prob pivot
    tot = cnt.groupBy(F.col("cls").alias("tcls")).agg(
        F.sum("c").cast("bigint").alias("t")
    )
    pr = cnt.join(F.broadcast(tot), F.col("tcls") == F.col("cls")).select(
        "cls", "nxt", (F.col("c") / F.col("t").cast("double")).alias("pr")
    )

    def cell(c: str, nx: str):
        return F.max(
            F.when((F.col("cls") == c) & (F.col("nxt") == nx), F.col("pr"))
        )

    p = pr.agg(
        cell("browse", "browse").alias("qbb"),
        cell("browse", "engage").alias("qbe"),
        cell("engage", "browse").alias("qeb"),
        cell("engage", "engage").alias("qee"),
        cell("browse", "purchase").alias("rbp"),
        cell("browse", "error").alias("rbx"),
        cell("engage", "purchase").alias("rep"),
        cell("engage", "error").alias("rex"),
    )
    f = p.select(
        *[
            F.coalesce(F.col(c), F.lit(0.0)).alias(c)
            for c in ("qbb", "qbe", "qeb", "qee", "rbp", "rbx", "rep", "rex")
        ]
    )
    det = (1.0 - F.col("qbb")) * (1.0 - F.col("qee")) - F.col("qbe") * F.col("qeb")
    nmat = f.withColumn("det", det).filter(F.col("det") > 0).select(
        "*",
        ((1.0 - F.col("qee")) / F.col("det")).alias("nbb"),
        (F.col("qbe") / F.col("det")).alias("nbe"),
        (F.col("qeb") / F.col("det")).alias("neb"),
        ((1.0 - F.col("qbb")) / F.col("det")).alias("nee"),
    )
    states = nmat.select(
        "*",
        F.explode(F.array(F.lit("browse"), F.lit("engage"))).alias("state"),
    )
    is_b = F.col("state") == "browse"
    return states.select(
        "state",
        F.round(
            F.when(is_b, F.col("nbb") + F.col("nbe"))
            .otherwise(F.col("neb") + F.col("nee")), 6
        ).alias("expected_touches"),
        F.round(
            F.when(is_b, F.col("nbb") * F.col("rbp") + F.col("nbe") * F.col("rep"))
            .otherwise(F.col("neb") * F.col("rbp") + F.col("nee") * F.col("rep")),
            6,
        ).alias("p_purchase"),
        F.round(
            F.when(is_b, F.col("nbb") * F.col("rbx") + F.col("nbe") * F.col("rex"))
            .otherwise(F.col("neb") * F.col("rbx") + F.col("nee") * F.col("rex")),
            6,
        ).alias("p_error"),
    ).orderBy("state")


# -- q_markov_attribution ----------------------------------------------
#
# Markov removal-effect attribution (Anderl et al. 2014): user event
# journeys form a first-order chain over the touch channels
# {view, click, signup} with absorbing CONV (purchase) and DROP
# (error / journey end); each channel's credit is how much the
# START→CONV absorption probability falls when that channel's state
# is deleted (transitions into it lost to DROP). Absorption
# probabilities come from CLOSED-FORM solves — Cramer's rule on the
# full 3×3 (I−Q) system and a shared 2×2 formula for the three
# removal variants (a 3-row variant table over the 1-row scalar grid,
# the q_absorbing_chain fundamental-matrix pattern generalized) — so
# there is NO iteration and no checkpoint chain. Determinism: exact
# count ratios, identical double algebra both engines, 6-rounded
# outputs; attribution shares normalize GREATEST(effect, 0).
# Scale: one lag window over the user-partitioned stream → ≤20-cell
# transition grid + 5-cell start grid; everything after is 1-row
# algebra.

MARKOV_ATTR_SQL = """
WITH seq AS (
  SELECT user_id,
         CASE event_type WHEN 'purchase' THEN 'CONV'
                         WHEN 'error' THEN 'DROP'
                         ELSE event_type END AS cls,
         COALESCE(LEAD(CASE event_type WHEN 'purchase' THEN 'CONV'
                                       WHEN 'error' THEN 'DROP'
                                       ELSE event_type END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  'DROP') AS nxt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), cnt AS (
  SELECT cls, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM seq
  WHERE cls IN ('view', 'click', 'signup') GROUP BY 1, 2
), tot AS (
  SELECT cls, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), st AS (
  SELECT cls, CAST(COUNT(*) AS BIGINT) AS c FROM seq
  WHERE rn = 1 GROUP BY 1
), stt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM st),
f AS MATERIALIZED (
  SELECT
    COALESCE(MAX(CASE WHEN cls='view' AND nxt='view' THEN pr END),0.0) AS pvv,
    COALESCE(MAX(CASE WHEN cls='view' AND nxt='click' THEN pr END),0.0) AS pvc,
    COALESCE(MAX(CASE WHEN cls='view' AND nxt='signup' THEN pr END),0.0) AS pvg,
    COALESCE(MAX(CASE WHEN cls='view' AND nxt='CONV' THEN pr END),0.0) AS rv,
    COALESCE(MAX(CASE WHEN cls='click' AND nxt='view' THEN pr END),0.0) AS pcv,
    COALESCE(MAX(CASE WHEN cls='click' AND nxt='click' THEN pr END),0.0) AS pcc,
    COALESCE(MAX(CASE WHEN cls='click' AND nxt='signup' THEN pr END),0.0) AS pcg,
    COALESCE(MAX(CASE WHEN cls='click' AND nxt='CONV' THEN pr END),0.0) AS rc,
    COALESCE(MAX(CASE WHEN cls='signup' AND nxt='view' THEN pr END),0.0) AS pgv,
    COALESCE(MAX(CASE WHEN cls='signup' AND nxt='click' THEN pr END),0.0) AS pgc,
    COALESCE(MAX(CASE WHEN cls='signup' AND nxt='signup' THEN pr END),0.0) AS pgg,
    COALESCE(MAX(CASE WHEN cls='signup' AND nxt='CONV' THEN pr END),0.0) AS rg,
    COALESCE(MAX(CASE WHEN scls='view' THEN spr END),0.0) AS qv,
    COALESCE(MAX(CASE WHEN scls='click' THEN spr END),0.0) AS qc,
    COALESCE(MAX(CASE WHEN scls='signup' THEN spr END),0.0) AS qg,
    COALESCE(MAX(CASE WHEN scls='CONV' THEN spr END),0.0) AS qconv
  FROM (
    SELECT c.cls, c.nxt, c.c / CAST(t.t AS DOUBLE) AS pr,
           NULL AS scls, NULL AS spr
    FROM cnt c JOIN tot t ON t.cls = c.cls
    UNION ALL
    SELECT NULL, NULL, NULL, s.cls, s.c / CAST(stt.t AS DOUBLE)
    FROM st s CROSS JOIN stt
  )
), solve AS (
  SELECT *,
         (1.0-pvv) * ((1.0-pcc)*(1.0-pgg) - pcg*pgc)
         - (-pvc) * ((-pcv)*(1.0-pgg) - pcg*(-pgv))
         + (-pvg) * ((-pcv)*(-pgc) - (1.0-pcc)*(-pgv)) AS det3
  FROM f
), x3 AS (
  SELECT *,
         (rv * ((1.0-pcc)*(1.0-pgg) - pcg*pgc)
          - (-pvc) * (rc*(1.0-pgg) - pcg*rg)
          + (-pvg) * (rc*(-pgc) - (1.0-pcc)*rg)) / det3 AS xv,
         ((1.0-pvv) * (rc*(1.0-pgg) - pcg*rg)
          - rv * ((-pcv)*(1.0-pgg) - pcg*(-pgv))
          + (-pvg) * ((-pcv)*rg - rc*(-pgv))) / det3 AS xc,
         ((1.0-pvv) * ((1.0-pcc)*rg - rc*(-pgc))
          - (-pvc) * ((-pcv)*rg - rc*(-pgv))
          + rv * ((-pcv)*(-pgc) - (1.0-pcc)*(-pgv))) / det3 AS xg
  FROM solve WHERE det3 <> 0
), full_p AS (
  SELECT *, qconv + qv*xv + qc*xc + qg*xg AS pfull FROM x3
), rm AS (
  SELECT 'view' AS channel, pcc AS paa, pcg AS pab, pgc AS pba, pgg AS pbb,
         rc AS ra, rg AS rb, qc AS qa, qg AS qb, qconv, pfull
  FROM full_p
  UNION ALL
  SELECT 'click', pvv, pvg, pgv, pgg, rv, rg, qv, qg, qconv, pfull
  FROM full_p
  UNION ALL
  SELECT 'signup', pvv, pvc, pcv, pcc, rv, rc, qv, qc, qconv, pfull
  FROM full_p
), rm2 AS (
  SELECT channel, qconv, pfull,
         (1.0-paa)*(1.0-pbb) - pab*pba AS det2,
         qa * ((1.0-pbb)*ra + pab*rb) + qb * (pba*ra + (1.0-paa)*rb) AS wnum
  FROM rm
), rm3 AS (
  SELECT channel, pfull,
         qconv + wnum / det2 AS prm
  FROM rm2 WHERE det2 <> 0
), eff AS (
  SELECT channel, pfull, prm,
         GREATEST(1.0 - prm / pfull, 0.0) AS re
  FROM rm3 WHERE pfull > 0
), nrm AS (
  SELECT CAST(SUM(CAST(round(re, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sre
  FROM eff
)
SELECT e.channel,
       round(e.pfull, 6) AS p_conv_full,
       round(e.prm, 6) AS p_conv_removed,
       round(e.re, 6) AS removal_effect,
       round(CASE WHEN n.sre > 0 THEN e.re / n.sre ELSE 0.0 END, 6)
         AS attribution_share
FROM eff e CROSS JOIN nrm n
ORDER BY e.channel
"""


@query("q_markov_attribution", oracle=MARKOV_ATTR_SQL)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    cls = (
        F.when(F.col("event_type") == "purchase", "CONV")
        .when(F.col("event_type") == "error", "DROP")
        .otherwise(F.col("event_type"))
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        cls.alias("cls"),
        F.coalesce(F.lead(cls).over(wseq), F.lit("DROP")).alias("nxt"),
        F.row_number().over(wseq).alias("rn"),
    )
    seq = seq.cache()  # one window pass feeds transition AND start counts
    cnt = (
        seq.filter(F.col("cls").isin("view", "click", "signup"))
        .groupBy("cls", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cnt = cnt.cache()  # ≤20 cells feed per-row totals and the pivot
    tot = cnt.groupBy("cls").agg(F.sum("c").cast("bigint").alias("t"))
    pr = cnt.join(tot, "cls").select(
        "cls", "nxt", (F.col("c") / F.col("t").cast("double")).alias("pr")
    )
    st = seq.filter(F.col("rn") == 1).groupBy("cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = st.cache()  # ≤5 rows feed the total and the pivot
    stt = st.agg(F.sum("c").cast("bigint").alias("t"))
    spr = st.join(F.broadcast(stt)).select(
        F.col("cls").alias("scls"),
        (F.col("c") / F.col("t").cast("double")).alias("spr"),
    )

    trans = pr.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("cls") == a) & (F.col("nxt") == b),
                        F.col("pr"),
                    )
                ),
                F.lit(0.0),
            ).alias(nm)
            for a, b, nm in [
                ("view", "view", "pvv"), ("view", "click", "pvc"),
                ("view", "signup", "pvg"), ("view", "CONV", "rv"),
                ("click", "view", "pcv"), ("click", "click", "pcc"),
                ("click", "signup", "pcg"), ("click", "CONV", "rc"),
                ("signup", "view", "pgv"), ("signup", "click", "pgc"),
                ("signup", "signup", "pgg"), ("signup", "CONV", "rg"),
            ]
        ]
    )
    starts = spr.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("scls") == k, F.col("spr"))), F.lit(0.0)
            ).alias(nm)
            for k, nm in [
                ("view", "qv"), ("click", "qc"), ("signup", "qg"),
                ("CONV", "qconv"),
            ]
        ]
    )
    f = trans.join(F.broadcast(starts))
    f = f.cache()  # 1-row scalar grid: full solve + 3 removal variants
    c = F.col
    det3 = (
        (1.0 - c("pvv"))
        * ((1.0 - c("pcc")) * (1.0 - c("pgg")) - c("pcg") * c("pgc"))
        - (-c("pvc"))
        * ((-c("pcv")) * (1.0 - c("pgg")) - c("pcg") * (-c("pgv")))
        + (-c("pvg"))
        * ((-c("pcv")) * (-c("pgc")) - (1.0 - c("pcc")) * (-c("pgv")))
    )
    x3 = f.withColumn("det3", det3).filter(c("det3") != 0)
    xv = (
        c("rv") * ((1.0 - c("pcc")) * (1.0 - c("pgg")) - c("pcg") * c("pgc"))
        - (-c("pvc")) * (c("rc") * (1.0 - c("pgg")) - c("pcg") * c("rg"))
        + (-c("pvg")) * (c("rc") * (-c("pgc")) - (1.0 - c("pcc")) * c("rg"))
    ) / c("det3")
    xc = (
        (1.0 - c("pvv")) * (c("rc") * (1.0 - c("pgg")) - c("pcg") * c("rg"))
        - c("rv") * ((-c("pcv")) * (1.0 - c("pgg")) - c("pcg") * (-c("pgv")))
        + (-c("pvg")) * ((-c("pcv")) * c("rg") - c("rc") * (-c("pgv")))
    ) / c("det3")
    xg = (
        (1.0 - c("pvv")) * ((1.0 - c("pcc")) * c("rg") - c("rc") * (-c("pgc")))
        - (-c("pvc")) * ((-c("pcv")) * c("rg") - c("rc") * (-c("pgv")))
        + c("rv") * ((-c("pcv")) * (-c("pgc")) - (1.0 - c("pcc")) * (-c("pgv")))
    ) / c("det3")
    full_p = x3.withColumn(
        "pfull",
        c("qconv") + c("qv") * xv + c("qc") * xc + c("qg") * xg,
    )
    full_p = full_p.cache()  # 1 row consumed by 3 variant branches
    variants = [
        ("view", "pcc", "pcg", "pgc", "pgg", "rc", "rg", "qc", "qg"),
        ("click", "pvv", "pvg", "pgv", "pgg", "rv", "rg", "qv", "qg"),
        ("signup", "pvv", "pvc", "pcv", "pcc", "rv", "rc", "qv", "qc"),
    ]
    rm = None
    for ch, paa, pab, pba, pbb, ra, rb, qa, qb in variants:
        sel = full_p.select(
            F.lit(ch).alias("channel"),
            c(paa).alias("paa"), c(pab).alias("pab"),
            c(pba).alias("pba"), c(pbb).alias("pbb"),
            c(ra).alias("ra"), c(rb).alias("rb"),
            c(qa).alias("qa"), c(qb).alias("qb"),
            "qconv", "pfull",
        )
        rm = sel if rm is None else rm.unionAll(sel)
    det2 = (1.0 - c("paa")) * (1.0 - c("pbb")) - c("pab") * c("pba")
    wnum = c("qa") * (
        (1.0 - c("pbb")) * c("ra") + c("pab") * c("rb")
    ) + c("qb") * (c("pba") * c("ra") + (1.0 - c("paa")) * c("rb"))
    rm3 = (
        rm.withColumn("det2", det2)
        .filter(c("det2") != 0)
        .withColumn("prm", c("qconv") + wnum / c("det2"))
        .filter(c("pfull") > 0)
        .withColumn(
            "re", F.greatest(1.0 - c("prm") / c("pfull"), F.lit(0.0))
        )
    )
    rm3 = rm3.cache()  # 3 rows feed the share total and the output
    nrm = rm3.agg(
        F.sum(F.round("re", 9).cast("decimal(28,9)"))
        .cast("double")
        .alias("sre")
    )
    return (
        rm3.join(F.broadcast(nrm))
        .select(
            "channel",
            F.round("pfull", 6).alias("p_conv_full"),
            F.round("prm", 6).alias("p_conv_removed"),
            F.round("re", 6).alias("removal_effect"),
            F.round(
                F.when(c("sre") > 0, c("re") / c("sre")).otherwise(0.0), 6
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


# -- q_als_rank1 -------------------------------------------------------
#
# Rank-1 alternating least squares on the customer × brand quantity
# matrix — the Spark-native recommender factorization primitive
# (q_item_cf's model-based sibling): with a single latent factor the
# ALS subproblems are CLOSED FORM, u_i = Σ_b r_ib·v_b / Σ_b v_b² and
# v_b = Σ_i r_ib·u_i / Σ_i u_i², each one partial-aggregated pass over
# the ratings table (v broadcast into the u-step; the v-step is a
# key-shuffled fold). Two full alternations from v₀ = 1, factors
# ROUNDED TO 9 BEFORE REUSE (the iterative round-before-reuse
# contract), 6-rounded decimal numerator folds, plus the observed-cell
# RMSE of the final u·v reconstruction. Brand ranks tie-break on
# brand. Scale: ratings build is one fact join-aggregate; each ALS
# step shuffles only (key, partial-sum) pairs, never vectors; the
# oracle MATERIALIZEs every round.

ALS_SQL = """
WITH ratings AS MATERIALIZED (
  SELECT o_custkey AS cust, p_brand AS brand,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), u1 AS MATERIALIZED (
  SELECT cust,
         round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 9) AS u
  FROM ratings GROUP BY 1
), v1 AS MATERIALIZED (
  SELECT brand,
         round(CAST(SUM(CAST(round(CAST(r.r AS DOUBLE) * u1.u, 6)
                        AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(SUM(CAST(round(u1.u * u1.u, 9)
                          AS DECIMAL(28,9))) AS DOUBLE), 9) AS v
  FROM ratings r JOIN u1 ON r.cust = u1.cust
  GROUP BY 1
  HAVING CAST(SUM(CAST(round(u1.u * u1.u, 9) AS DECIMAL(28,9)))
              AS DOUBLE) > 0
), u2 AS MATERIALIZED (
  SELECT cust,
         round(CAST(SUM(CAST(round(CAST(r.r AS DOUBLE) * v1.v, 6)
                        AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(SUM(CAST(round(v1.v * v1.v, 9)
                          AS DECIMAL(28,9))) AS DOUBLE), 9) AS u
  FROM ratings r JOIN v1 ON r.brand = v1.brand
  GROUP BY 1
  HAVING CAST(SUM(CAST(round(v1.v * v1.v, 9) AS DECIMAL(28,9)))
              AS DOUBLE) > 0
), v2 AS MATERIALIZED (
  SELECT brand,
         round(CAST(SUM(CAST(round(CAST(r.r AS DOUBLE) * u2.u, 6)
                        AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(SUM(CAST(round(u2.u * u2.u, 9)
                          AS DECIMAL(28,9))) AS DOUBLE), 9) AS v
  FROM ratings r JOIN u2 ON r.cust = u2.cust
  GROUP BY 1
  HAVING CAST(SUM(CAST(round(u2.u * u2.u, 9) AS DECIMAL(28,9)))
              AS DOUBLE) > 0
), err AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         sqrt(CAST(SUM(CAST(round(
                 (CAST(r.r AS DOUBLE) - u2.u * v2.v)
                 * (CAST(r.r AS DOUBLE) - u2.u * v2.v), 6)
               AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)) AS rmse
  FROM ratings r
  JOIN u2 ON r.cust = u2.cust
  JOIN v2 ON r.brand = v2.brand
)
SELECT v2.brand, round(v2.v, 6) AS v_factor,
       CAST(ROW_NUMBER() OVER (ORDER BY v2.v DESC, v2.brand) AS BIGINT)
         AS rank,
       e.n_cells, round(e.rmse, 6) AS rmse
FROM v2 CROSS JOIN err e
ORDER BY rank
"""


@query("q_als_rank1", oracle=ALS_SQL)
def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ratings = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
            F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        )
        # ONE shuffle builds the pinned layout (r11 A/B, -0.6 s warm):
        # repartition("cust") FIRST, then the (cust, brand) groupBy —
        # HashPartitioning(cust) satisfies the aggregate's
        # ClusteredDistribution(cust, brand), so the grouping runs
        # exchange-free instead of shuffling twice (groupBy + repart).
        .repartition("cust")
        .groupBy("cust", "brand")
        .agg(F.sum("q").cast("decimal(18,2)").alias("r"))
    )
    # reused by every ALS step + RMSE; pinned hash-partitioned on CUST
    # so every u-step groupBy(cust) AND every ratings⋈u join runs
    # co-partitioned with no exchange (the v-side factor tables are
    # |brands| rows and broadcast; only their 25-row groupBy shuffles)
    ratings = ratings.localCheckpoint()

    rd = F.col("r").cast("double")

    def num(factor):
        return (
            F.sum(F.round(rd * factor, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("num")
        )

    def den(factor):
        return (
            F.sum(F.round(factor * factor, 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("den")
        )

    u1 = ratings.groupBy("cust").agg(
        F.round(
            F.sum("r").cast("double") / F.count(F.lit(1)), 9
        ).alias("u")
    )
    v1 = (
        ratings.join(u1, "cust")
        .groupBy("brand")
        .agg(num(F.col("u")), den(F.col("u")))
        .filter(F.col("den") > 0)
        .select("brand", F.round(F.col("num") / F.col("den"), 9).alias("v"))
    )
    v1 = v1.localCheckpoint()  # 25-row factor table: pin per-round lineage
    u2 = (
        ratings.join(F.broadcast(v1), "brand")
        .groupBy("cust")
        .agg(num(F.col("v")), den(F.col("v")))
        .filter(F.col("den") > 0)
        .select("cust", F.round(F.col("num") / F.col("den"), 9).alias("u"))
    )
    u2 = u2.localCheckpoint()  # consumed by v2 step AND the RMSE join
    v2 = (
        ratings.join(u2, "cust")
        .groupBy("brand")
        .agg(num(F.col("u")), den(F.col("u")))
        .filter(F.col("den") > 0)
        .select("brand", F.round(F.col("num") / F.col("den"), 9).alias("v"))
    )
    v2 = v2.localCheckpoint()
    resid = rd - F.col("u") * F.col("v")
    err = (
        ratings.join(u2, "cust")
        .join(F.broadcast(v2), "brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sqrt(
                F.sum(F.round(resid * resid, 6).cast("decimal(28,6)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("rmse"),
        )
    )
    return (
        v2.join(F.broadcast(err))
        .select(
            "brand",
            F.round("v", 6).alias("v_factor"),
            F.row_number()
            .over(Window.orderBy(F.desc("v"), "brand"))
            .cast("bigint")
            .alias("rank"),
            "n_cells",
            F.round("rmse", 6).alias("rmse"),
        )
        .orderBy("rank")
    )
