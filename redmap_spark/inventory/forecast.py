"""SURVEY §2.A — forecast construction and evaluation: combination
forecasts, STL strength, scaled errors (MASE), Diebold-Mariano and
Mincer-Zarnowitz rationality checks, directional accuracy, CRPS/PIT/
interval-score calibration, wavelet and transfer-entropy diagnostics,
adstock response and out-of-sample drift detection. Split out of the
former stats7 grab-bag (round 7), code unchanged. Determinism contract
as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query


# -- q_forecast_combo --------------------------------------------------
#
# Forecast combination on the daily revenue series: three base
# forecasters (naive last-value, drift line, seasonal-naive dow mean)
# are fit on train-minus-validation, weighted by inverse validation
# MSE (the Bates-Granger scheme the "forecast combination puzzle"
# literature benchmarks), refit on the full train span, and scored on
# a 28-day holdout. The combined forecast nearly always beats the
# single best at horizon — this entry MEASURES it per split rather
# than asserting it. Per-day squared/absolute errors are 4-rounded
# decimals folded exactly; weights and the final MAE/RMSE are the
# only double chains. Output: one row per model + 'combo' with
# weight, MAE, RMSE. Scale: fact scan -> |days| grid; everything
# after is grid algebra.

FCOMBO_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), nn AS (SELECT MAX(idx) AS nall FROM daily),
marks AS (
  SELECT nall, nall - 28 AS tr_end, nall - 56 AS tr2_end FROM nn
), fit2 AS (
  SELECT
    MAX(CASE WHEN idx = tr2_end THEN CAST(rev AS DOUBLE) END) AS last2,
    MAX(CASE WHEN idx = 1 THEN CAST(rev AS DOUBLE) END) AS first2,
    MAX(tr2_end) AS n2
  FROM daily CROSS JOIN marks WHERE idx <= tr2_end
), dow2 AS (
  SELECT dayofweek(day) AS dw,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS m
  FROM daily CROSS JOIN marks WHERE idx <= tr2_end
  GROUP BY 1
), val AS (
  SELECT d.idx - f.n2 AS h, CAST(d.rev AS DOUBLE) AS y,
         f.last2 AS f_naive,
         f.last2 + (f.last2 - f.first2) / (f.n2 - 1) * (d.idx - f.n2)
           AS f_drift,
         dow2.m AS f_seas
  FROM daily d CROSS JOIN fit2 f CROSS JOIN marks
  JOIN dow2 ON dow2.dw = dayofweek(d.day)
  WHERE d.idx > tr2_end AND d.idx <= tr_end
), mse AS (
  SELECT
    CAST(SUM(CAST(round((y - f_naive) * (y - f_naive), 4)
                  AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS m_naive,
    CAST(SUM(CAST(round((y - f_drift) * (y - f_drift), 4)
                  AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS m_drift,
    CAST(SUM(CAST(round((y - f_seas) * (y - f_seas), 4)
                  AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS m_seas
  FROM val
), wts AS (
  SELECT round((1 / m_naive) / (1 / m_naive + 1 / m_drift + 1 / m_seas), 6)
           AS w_naive,
         round((1 / m_drift) / (1 / m_naive + 1 / m_drift + 1 / m_seas), 6)
           AS w_drift,
         round((1 / m_seas) / (1 / m_naive + 1 / m_drift + 1 / m_seas), 6)
           AS w_seas
  FROM mse
), fit AS (
  SELECT
    MAX(CASE WHEN idx = tr_end THEN CAST(rev AS DOUBLE) END) AS last1,
    MAX(CASE WHEN idx = 1 THEN CAST(rev AS DOUBLE) END) AS first1,
    MAX(tr_end) AS n1
  FROM daily CROSS JOIN marks WHERE idx <= tr_end
), dow1 AS (
  SELECT dayofweek(day) AS dw,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS m
  FROM daily CROSS JOIN marks WHERE idx <= tr_end
  GROUP BY 1
), hold AS (
  SELECT CAST(d.rev AS DOUBLE) AS y,
         f.last1 AS f_naive,
         f.last1 + (f.last1 - f.first1) / (f.n1 - 1) * (d.idx - f.n1)
           AS f_drift,
         dow1.m AS f_seas,
         w.w_naive, w.w_drift, w.w_seas
  FROM daily d CROSS JOIN fit f CROSS JOIN marks CROSS JOIN wts w
  JOIN dow1 ON dow1.dw = dayofweek(d.day)
  WHERE d.idx > tr_end
), errs AS (
  SELECT 'combo' AS model,
         MAX(w_naive) AS weight,
         CAST(SUM(CAST(round(abs(y - (w_naive * f_naive + w_drift * f_drift
                                      + w_seas * f_seas)), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS mae,
         CAST(SUM(CAST(round((y - (w_naive * f_naive + w_drift * f_drift
                                   + w_seas * f_seas))
                             * (y - (w_naive * f_naive + w_drift * f_drift
                                     + w_seas * f_seas)), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS mse
  FROM hold
  UNION ALL
  SELECT 'naive', MAX(w_naive),
         CAST(SUM(CAST(round(abs(y - f_naive), 4) AS DECIMAL(28,4)))
              AS DOUBLE) / COUNT(*),
         CAST(SUM(CAST(round((y - f_naive) * (y - f_naive), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
  FROM hold
  UNION ALL
  SELECT 'drift', MAX(w_drift),
         CAST(SUM(CAST(round(abs(y - f_drift), 4) AS DECIMAL(28,4)))
              AS DOUBLE) / COUNT(*),
         CAST(SUM(CAST(round((y - f_drift) * (y - f_drift), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
  FROM hold
  UNION ALL
  SELECT 'seasonal', MAX(w_seas),
         CAST(SUM(CAST(round(abs(y - f_seas), 4) AS DECIMAL(28,4)))
              AS DOUBLE) / COUNT(*),
         CAST(SUM(CAST(round((y - f_seas) * (y - f_seas), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
  FROM hold
)
SELECT model,
       CASE WHEN model = 'combo' THEN NULL ELSE weight END AS weight,
       round(mae, 4) AS mae, round(sqrt(mse), 4) AS rmse
FROM errs
ORDER BY model
"""
FCOMBO_SQL = FCOMBO_SQL.replace(
    "SELECT 'naive', MAX(w_naive),",
    "SELECT 'naive' AS model, MAX(w_naive) AS weight,",
)


@query("q_forecast_combo", oracle=FCOMBO_SQL)
def q_forecast_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    marks = daily.agg(
        F.max("idx").alias("nall"),
        (F.max("idx") - 28).alias("tr_end"),
        (F.max("idx") - 56).alias("tr2_end"),
    )
    dw = F.dayofweek("day")

    def fit(upto_col: str):
        d = daily.join(F.broadcast(marks)).filter(F.col("idx") <= F.col(upto_col))
        consts = d.agg(
            F.max(
                F.when(
                    F.col("idx") == F.col(upto_col).cast("int"),
                    F.col("rev").cast("double"),
                )
            ).alias("last_"),
            F.max(
                F.when(F.col("idx") == 1, F.col("rev").cast("double"))
            ).alias("first_"),
            F.max(upto_col).alias("nfit"),
        )
        dows = d.groupBy(dw.alias("dw")).agg(
            (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("m")
        )
        return consts, dows

    consts2, dow2 = fit("tr2_end")
    val = (
        daily.join(F.broadcast(marks))
        .filter(
            (F.col("idx") > F.col("tr2_end"))
            & (F.col("idx") <= F.col("tr_end"))
        )
        .join(F.broadcast(consts2))
        .join(F.broadcast(dow2), dw == F.col("dw"))
        .select(
            F.col("rev").cast("double").alias("y"),
            F.col("last_").alias("f_naive"),
            (
                F.col("last_")
                + (F.col("last_") - F.col("first_"))
                / (F.col("nfit") - 1)
                * (F.col("idx") - F.col("nfit"))
            ).alias("f_drift"),
            F.col("m").alias("f_seas"),
        )
    )

    def mse_of(c):
        e = F.col("y") - F.col(c)
        return F.sum(
            F.round(e * e, 4).cast("decimal(38,4)")
        ).cast("double") / F.count(F.lit(1))

    mse = val.agg(
        mse_of("f_naive").alias("m_naive"),
        mse_of("f_drift").alias("m_drift"),
        mse_of("f_seas").alias("m_seas"),
    )
    tot_inv = 1 / F.col("m_naive") + 1 / F.col("m_drift") + 1 / F.col("m_seas")
    wts = mse.select(
        F.round((1 / F.col("m_naive")) / tot_inv, 6).alias("w_naive"),
        F.round((1 / F.col("m_drift")) / tot_inv, 6).alias("w_drift"),
        F.round((1 / F.col("m_seas")) / tot_inv, 6).alias("w_seas"),
    )
    consts1, dow1 = fit("tr_end")
    hold = (
        daily.join(F.broadcast(marks))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(consts1))
        .join(F.broadcast(dow1), dw == F.col("dw"))
        .join(F.broadcast(wts))
        .select(
            F.col("rev").cast("double").alias("y"),
            F.col("last_").alias("f_naive"),
            (
                F.col("last_")
                + (F.col("last_") - F.col("first_"))
                / (F.col("nfit") - 1)
                * (F.col("idx") - F.col("nfit"))
            ).alias("f_drift"),
            F.col("m").alias("f_seas"),
            "w_naive", "w_drift", "w_seas",
        )
        .localCheckpoint()
    )
    combo = (
        F.col("w_naive") * F.col("f_naive")
        + F.col("w_drift") * F.col("f_drift")
        + F.col("w_seas") * F.col("f_seas")
    )

    def row(model: str, pred, wcol):
        e = F.col("y") - pred
        return hold.agg(
            wcol.alias("weight"),
            (
                F.sum(F.round(F.abs(e), 4).cast("decimal(28,4)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("mae"),
            (
                F.sum(F.round(e * e, 4).cast("decimal(38,4)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("mse"),
        ).select(F.lit(model).alias("model"), "weight", "mae", "mse")

    errs = (
        row("combo", combo, F.max(F.lit(None).cast("double")))
        .union(row("naive", F.col("f_naive"), F.max("w_naive")))
        .union(row("drift", F.col("f_drift"), F.max("w_drift")))
        .union(row("seasonal", F.col("f_seas"), F.max("w_seas")))
    )
    return errs.select(
        "model",
        F.col("weight"),
        F.round("mae", 4).alias("mae"),
        F.round(F.sqrt("mse"), 4).alias("rmse"),
    ).orderBy("model")


# -- q_stl_strength ----------------------------------------------------
#
# Hyndman trend/seasonal strength features per event type over the
# q_stl_lite decomposition: F_trend = max(0, 1 - var(R)/var(T+R)) and
# F_seasonal = max(0, 1 - var(R)/var(S+R)) — the two numbers that
# compress a decomposition into "is this series trendy / seasonal
# enough to route to a seasonal model" (the feasts/M4 feature pair).
# Components are 6-rounded doubles folded as exact decimals; the
# variance ratios are the only unrounded doubles.

STL_STRENGTH_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), tr AS (
  SELECT event_type, day, rev,
         CAST(SUM(rev) OVER w AS DECIMAL(28,2)) AS wsum,
         CAST(COUNT(*) OVER w AS BIGINT) AS wn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dt AS (
  SELECT event_type, day, rev,
         CAST(wsum AS DOUBLE) / wn AS trend,
         round(CAST(rev AS DOUBLE) - CAST(wsum AS DOUBLE) / wn, 6)
           AS detrended,
         isodow(day) AS dow, wn
  FROM tr
), se AS (
  SELECT event_type, dow,
         round(CAST(SUM(CAST(detrended AS DECIMAL(18,6)))
                    AS DOUBLE) / COUNT(*), 6) AS seas
  FROM dt WHERE wn = 7 GROUP BY 1, 2
), comp AS (
  SELECT dt.event_type,
         CAST(round(dt.trend, 6) AS DECIMAL(18,6)) AS t,
         CAST(se.seas AS DECIMAL(18,6)) AS s,
         CAST(round(CAST(dt.rev AS DOUBLE) - dt.trend - se.seas, 6)
              AS DECIMAL(18,6)) AS r
  FROM dt JOIN se ON se.event_type = dt.event_type AND se.dow = dt.dow
  WHERE dt.wn = 7
), mom AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(r) AS DOUBLE) AS sr,
         CAST(SUM(CAST(round(CAST(r AS DOUBLE) * CAST(r AS DOUBLE), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS srr,
         CAST(SUM(t + r) AS DOUBLE) AS str_,
         CAST(SUM(CAST(round((CAST(t AS DOUBLE) + CAST(r AS DOUBLE))
                             * (CAST(t AS DOUBLE) + CAST(r AS DOUBLE)), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS strr,
         CAST(SUM(s + r) AS DOUBLE) AS ssr,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE) + CAST(r AS DOUBLE))
                             * (CAST(s AS DOUBLE) + CAST(r AS DOUBLE)), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS ssrr
  FROM comp GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(GREATEST(0.0, 1 - ((srr - sr * sr / n) / (n - 1))
                             / ((strr - str_ * str_ / n) / (n - 1))), 6)
         AS trend_strength,
       round(GREATEST(0.0, 1 - ((srr - sr * sr / n) / (n - 1))
                             / ((ssrr - ssr * ssr / n) / (n - 1))), 6)
         AS seasonal_strength
FROM mom
ORDER BY event_type
"""


@query("q_stl_strength", oracle=STL_STRENGTH_SQL)
def q_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type", "day", "rev",
        F.sum("rev").over(w).cast("decimal(28,2)").alias("wsum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("wn"),
    )
    trend = F.col("wsum").cast("double") / F.col("wn")
    dt = tr.select(
        "event_type", "day", "rev",
        trend.alias("trend"),
        F.round(F.col("rev").cast("double") - trend, 6).alias("detrended"),
        F.dayofweek("day").alias("dow"),
        "wn",
    ).localCheckpoint()
    se = (
        dt.filter(F.col("wn") == 7)
        .groupBy("event_type", "dow")
        .agg(
            F.round(
                F.sum(F.col("detrended").cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("seas")
        )
    )
    comp = (
        dt.filter(F.col("wn") == 7)
        .join(F.broadcast(se), ["event_type", "dow"])
        .select(
            "event_type",
            F.round("trend", 6).cast("decimal(18,6)").alias("t"),
            F.col("seas").cast("decimal(18,6)").alias("s"),
            F.round(
                F.col("rev").cast("double")
                - F.col("trend")
                - F.col("seas"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("r"),
        )
    )
    t, s, r = F.col("t"), F.col("s"), F.col("r")
    td, sd, rd = (c.cast("double") for c in (t, s, r))
    mom = comp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r).cast("double").alias("sr"),
        F.sum(F.round(rd * rd, 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("srr"),
        F.sum(t + r).cast("double").alias("str_"),
        F.sum(F.round((td + rd) * (td + rd), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("strr"),
        F.sum(s + r).cast("double").alias("ssr"),
        F.sum(F.round((sd + rd) * (sd + rd), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("ssrr"),
    )
    n = F.col("n")
    var_r = (F.col("srr") - F.col("sr") * F.col("sr") / n) / (n - 1)
    var_tr = (F.col("strr") - F.col("str_") * F.col("str_") / n) / (n - 1)
    var_sr = (F.col("ssrr") - F.col("ssr") * F.col("ssr") / n) / (n - 1)
    return mom.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_tr), 6)
        .alias("trend_strength"),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_sr), 6)
        .alias("seasonal_strength"),
    ).orderBy("event_type")


# -- q_mase ------------------------------------------------------------
#
# Mean absolute SCALED error (Hyndman-Koehler) for the seasonal-naive
# forecaster on the 56-day holdout: MAE(model) divided by the
# in-sample MAE of the one-step naive — the scale-free forecast error
# that lets accuracy compare across series where MAPE breaks on
# near-zero days. MASE < 1 = beats naive. Per-day absolute errors are
# exact decimals (the dow-mean forecast is 2-rounded before
# differencing); the scaling division is the one double.

MASE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
nv0 AS (
  SELECT CAST(abs(CAST(rev AS DOUBLE)
                  - CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE))
              AS DECIMAL(24,4)) AS ad
  FROM daily CROSS JOIN mark WHERE idx <= tr_end
), naive AS (
  SELECT CAST(SUM(ad) AS DOUBLE) / (COUNT(*) - 1) AS mae_naive
  FROM nv0
), dowm AS (
  SELECT dayofweek(day) AS dw,
         CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2)
              AS DECIMAL(24,2)) AS f
  FROM daily CROSS JOIN mark WHERE idx <= tr_end GROUP BY 1
), hold AS (
  SELECT CAST(abs(CAST(d.rev - w.f AS DOUBLE)) AS DECIMAL(24,4)) AS ae
  FROM daily d CROSS JOIN mark
  JOIN dowm w ON w.dw = dayofweek(d.day)
  WHERE d.idx > tr_end
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_holdout,
       round(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 4) AS mae_model,
       round((SELECT mae_naive FROM naive), 4) AS mae_naive_insample,
       round((CAST(SUM(ae) AS DOUBLE) / COUNT(*))
             / (SELECT mae_naive FROM naive), 6) AS mase
FROM hold
"""


@query("q_mase", oracle=MASE_SQL)
def q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    tr = daily.join(F.broadcast(mark)).filter(
        F.col("idx") <= F.col("tr_end")
    )
    lagrev = F.lag("rev").over(Window.orderBy("day"))
    naive = tr.select(
        F.abs(F.col("rev").cast("double") - lagrev.cast("double"))
        .cast("decimal(24,4)")
        .alias("ad")
    ).agg(
        (
            F.sum("ad").cast("double") / (F.count(F.lit(1)) - 1)
        ).alias("mae_naive")
    )
    dowm = tr.groupBy(F.dayofweek("day").alias("dw")).agg(
        F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 2)
        .cast("decimal(24,2)")
        .alias("f")
    )
    hold = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(dowm), F.dayofweek("day") == F.col("dw"))
        .select(
            F.abs((F.col("rev") - F.col("f")).cast("double"))
            .cast("decimal(24,4)")
            .alias("ae")
        )
    )
    n = F.count(F.lit(1))
    mae = F.sum("ae").cast("double") / n
    return hold.join(F.broadcast(naive)).agg(
        n.cast("bigint").alias("n_holdout"),
        F.round(mae, 4).alias("mae_model"),
        F.round(F.max("mae_naive"), 4).alias("mae_naive_insample"),
        F.round(mae / F.max("mae_naive"), 6).alias("mase"),
    )


# -- q_diebold_mariano -------------------------------------------------
#
# Diebold-Mariano test comparing the naive and seasonal-naive
# forecasters on the 56-day holdout: loss differential d_t = |e_naive|
# - |e_seasonal| per day, DM = dbar / sqrt((gamma0 + 2*gamma1)/n)
# with the lag-1 Newey-West (HAC) variance that forecast-error
# autocorrelation demands — the honest "is model A actually better"
# test that a paired t-test on autocorrelated errors fakes.
# Differentials are exact decimals; the autocovariances fold 4-rounded
# products exactly; DM is one double chain.

DM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
fit AS (
  SELECT MAX(CASE WHEN idx = tr_end THEN rev END) AS last_rev
  FROM daily CROSS JOIN mark WHERE idx <= tr_end
), dowm AS (
  SELECT dayofweek(day) AS dw,
         CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2)
              AS DECIMAL(24,2)) AS f
  FROM daily CROSS JOIN mark WHERE idx <= tr_end GROUP BY 1
), d AS (
  SELECT dd.day,
         CAST(abs(CAST(dd.rev - ft.last_rev AS DOUBLE))
              - abs(CAST(dd.rev - w.f AS DOUBLE)) AS DECIMAL(24,4)) AS dt
  FROM daily dd CROSS JOIN mark CROSS JOIN fit ft
  JOIN dowm w ON w.dw = dayofweek(dd.day)
  WHERE dd.idx > tr_end
), lagd AS (
  SELECT dt, LAG(dt) OVER (ORDER BY day) AS dtp FROM d
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dt) AS DECIMAL(32,4)) AS s1,
         CAST(SUM(CAST(round(CAST(dt AS DOUBLE) * CAST(dt AS DOUBLE), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS s2,
         CAST(SUM(CASE WHEN dtp IS NOT NULL THEN
               CAST(round(CAST(dt AS DOUBLE) * CAST(dtp AS DOUBLE), 4)
                    AS DECIMAL(38,4)) END) AS DOUBLE) AS s11
  FROM lagd
), f AS (
  SELECT n, CAST(s1 AS DOUBLE) / n AS dbar,
         s2 / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           AS g0,
         s11 / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           AS g1
  FROM mom
)
SELECT CAST(n AS BIGINT) AS n_holdout,
       round(dbar, 4) AS mean_loss_diff,
       round(g0, 4) AS gamma0,
       round(g1, 4) AS gamma1,
       round(dbar / sqrt(GREATEST(g0 + 2 * g1, g0 * 0.1) / n), 6)
         AS dm_stat
FROM f
"""


@query("q_diebold_mariano", oracle=DM_SQL)
def q_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    tr = daily.join(F.broadcast(mark)).filter(
        F.col("idx") <= F.col("tr_end")
    )
    fit = tr.agg(
        F.max(
            F.when(F.col("idx") == F.col("tr_end"), F.col("rev"))
        ).alias("last_rev")
    )
    dowm = tr.groupBy(F.dayofweek("day").alias("dw")).agg(
        F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 2)
        .cast("decimal(24,2)")
        .alias("f")
    )
    d = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(fit))
        .join(F.broadcast(dowm), F.dayofweek("day") == F.col("dw"))
        .select(
            "day",
            (
                F.abs((F.col("rev") - F.col("last_rev")).cast("double"))
                - F.abs((F.col("rev") - F.col("f")).cast("double"))
            )
            .cast("decimal(24,4)")
            .alias("dt"),
        )
    )
    lagd = d.select(
        "dt", F.lag("dt").over(Window.orderBy("day")).alias("dtp")
    )
    dtd = F.col("dt").cast("double")
    dtpd = F.col("dtp").cast("double")
    mom = lagd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dt").cast("decimal(32,4)").alias("s1"),
        F.sum(F.round(dtd * dtd, 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("s2"),
        F.sum(
            F.when(
                F.col("dtp").isNotNull(),
                F.round(dtd * dtpd, 4).cast("decimal(38,4)"),
            )
        )
        .cast("double")
        .alias("s11"),
    )
    n = F.col("n")
    dbar = F.col("s1").cast("double") / n
    g0 = F.col("s2") / n - dbar * dbar
    g1 = F.col("s11") / n - dbar * dbar
    return mom.select(
        n.cast("bigint").alias("n_holdout"),
        F.round(dbar, 4).alias("mean_loss_diff"),
        F.round(g0, 4).alias("gamma0"),
        F.round(g1, 4).alias("gamma1"),
        F.round(
            dbar / F.sqrt(F.greatest(g0 + 2 * g1, g0 * 0.1) / n), 6
        ).alias("dm_stat"),
    )


# -- q_theil_u_decomposition -------------------------------------------
#
# Theil inequality decomposition of the seasonal-naive forecast's
# holdout MSE into bias (U_M: wrong level), variance (U_S: wrong
# volatility) and covariance (U_C: phase noise — the only benign
# part) proportions: U_M = (fbar-ybar)^2/MSE, U_S = (sf-sy)^2/MSE,
# U_C = 2(1-r)sf*sy/MSE, summing to 1 — the diagnosis that says
# WHETHER to fix a forecast by recentering, rescaling, or accepting
# it, one level under q_mase's single number. All moments are the
# shared exact-decimal holdout folds.

THEILU_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
dowm AS (
  SELECT dayofweek(day) AS dw,
         CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2)
              AS DECIMAL(24,2)) AS f
  FROM daily CROSS JOIN mark WHERE idx <= tr_end GROUP BY 1
), hold AS (
  SELECT CAST(d.rev AS DECIMAL(24,2)) AS y, w.f
  FROM daily d CROSS JOIN mark
  JOIN dowm w ON w.dw = dayofweek(d.day)
  WHERE d.idx > tr_end
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(f) AS DOUBLE) AS sf,
         CAST(SUM(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 2)
                       AS DECIMAL(38,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(round(CAST(f AS DOUBLE) * CAST(f AS DOUBLE), 2)
                       AS DECIMAL(38,2))) AS DOUBLE) AS sff,
         CAST(SUM(CAST(round(CAST(f AS DOUBLE) * CAST(y AS DOUBLE), 2)
                       AS DECIMAL(38,2))) AS DOUBLE) AS sfy,
         CAST(SUM(CAST(round((CAST(f AS DOUBLE) - CAST(y AS DOUBLE))
                             * (CAST(f AS DOUBLE) - CAST(y AS DOUBLE)),
                             2) AS DECIMAL(38,2))) AS DOUBLE) AS sse
  FROM hold
), f2 AS (
  SELECT n, sse / n AS mse,
         sf / n - sy / n AS bias,
         sqrt((sff - sf * sf / n) / n) AS sdf,
         sqrt((syy - sy * sy / n) / n) AS sdy,
         (sfy / n - (sf / n) * (sy / n)) AS cov
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_holdout,
       round(mse, 2) AS mse,
       round(bias * bias / mse, 6) AS u_bias,
       round((sdf - sdy) * (sdf - sdy) / mse, 6) AS u_variance,
       round(2 * (1 - cov / (sdf * sdy)) * sdf * sdy / mse, 6)
         AS u_covariance
FROM f2
"""


@query("q_theil_u_decomposition", oracle=THEILU_SQL)
def q_theil_u_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    dowm = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") <= F.col("tr_end"))
        .groupBy(F.dayofweek("day").alias("dw"))
        .agg(
            F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 2)
            .cast("decimal(24,2)")
            .alias("f")
        )
    )
    hold = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(dowm), F.dayofweek("day") == F.col("dw"))
        .select(F.col("rev").alias("y"), "f")
    )
    yd, fd = F.col("y").cast("double"), F.col("f").cast("double")
    r2s = lambda e: F.sum(  # noqa: E731
        F.round(e, 2).cast("decimal(38,2)")
    ).cast("double")
    m = hold.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("f").cast("double").alias("sf"),
        r2s(yd * yd).alias("syy"),
        r2s(fd * fd).alias("sff"),
        r2s(fd * yd).alias("sfy"),
        r2s((fd - yd) * (fd - yd)).alias("sse"),
    )
    n = F.col("n")
    mse = F.col("sse") / n
    bias = F.col("sf") / n - F.col("sy") / n
    sdf = F.sqrt((F.col("sff") - F.col("sf") * F.col("sf") / n) / n)
    sdy = F.sqrt((F.col("syy") - F.col("sy") * F.col("sy") / n) / n)
    cov = F.col("sfy") / n - (F.col("sf") / n) * (F.col("sy") / n)
    return m.select(
        n.cast("bigint").alias("n_holdout"),
        F.round(mse, 2).alias("mse"),
        F.round(bias * bias / mse, 6).alias("u_bias"),
        F.round((sdf - sdy) * (sdf - sdy) / mse, 6).alias("u_variance"),
        F.round(2 * (1 - cov / (sdf * sdy)) * sdf * sdy / mse, 6)
        .alias("u_covariance"),
    )


# -- q_analogue_forecast -----------------------------------------------
#
# Analogue (empirical-dynamic / simplex-projection-lite) forecasting
# of daily revenue: each holdout day's 3-lag delay vector finds its
# k = 5 nearest TRAIN vectors by squared euclidean distance (exact
# decimal products, deterministic (dist, day) ties), the forecast is
# the mean of the neighbors' next-day values, and the skill is the
# out-of-sample correlation rho between forecast and actual — model-
# free nonlinear forecasting (Sugihara-May), a different family from
# every parametric q_forecast_* entry. The candidate join is
# holdout x train (56 x ~2300 rows) — an eval-sized broadcast, with
# the production framing being an ANN index over delay vectors.

ANALOG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
emb AS (
  SELECT idx, day, rev,
         LAG(rev, 1) OVER (ORDER BY idx) AS l1,
         LAG(rev, 2) OVER (ORDER BY idx) AS l2,
         LEAD(rev, 1) OVER (ORDER BY idx) AS nxt
  FROM daily
), tr AS (
  SELECT idx, rev, l1, l2, nxt FROM emb CROSS JOIN mark
  WHERE idx <= tr_end - 1 AND l2 IS NOT NULL AND nxt IS NOT NULL
), ho AS (
  SELECT idx, rev, l1, l2, nxt FROM emb CROSS JOIN mark
  WHERE idx > tr_end AND l2 IS NOT NULL AND nxt IS NOT NULL
), dist AS (
  SELECT h.idx AS hidx, t.idx AS tidx, t.nxt,
         CAST(round(
           (CAST(h.rev - t.rev AS DOUBLE) * CAST(h.rev - t.rev AS DOUBLE)
            + CAST(h.l1 - t.l1 AS DOUBLE) * CAST(h.l1 - t.l1 AS DOUBLE)
            + CAST(h.l2 - t.l2 AS DOUBLE) * CAST(h.l2 - t.l2 AS DOUBLE)),
           4) AS DECIMAL(38,4)) AS d2
  FROM ho h CROSS JOIN tr t
), knn AS (
  SELECT hidx, nxt,
         ROW_NUMBER() OVER (PARTITION BY hidx ORDER BY d2, tidx) AS rk
  FROM dist
), pred AS (
  SELECT k.hidx,
         CAST(SUM(k.nxt) AS DOUBLE) / 5 AS yhat,
         MAX(CAST(h.nxt AS DOUBLE)) AS y
  FROM knn k JOIN ho h ON h.idx = k.hidx
  WHERE k.rk <= 5 GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(yhat, 2) AS DECIMAL(24,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(y, 2) AS DECIMAL(24,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(yhat * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(round(yhat * yhat, 2) AS DECIMAL(38,2)))
              AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(y * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS syy
  FROM pred
)
SELECT CAST(n AS BIGINT) AS n_holdout,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS forecast_skill_rho,
       round(sx / n, 2) AS mean_forecast,
       round(sy / n, 2) AS mean_actual
FROM mom
"""


@query("q_analogue_forecast", oracle=ANALOG_SQL)
def q_analogue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    wd = Window.orderBy("idx")
    emb = daily.select(
        "idx", "rev",
        F.lag("rev", 1).over(wd).alias("l1"),
        F.lag("rev", 2).over(wd).alias("l2"),
        F.lead("rev", 1).over(wd).alias("nxt"),
    ).join(F.broadcast(mark)).localCheckpoint()
    ok = F.col("l2").isNotNull() & F.col("nxt").isNotNull()
    tr = emb.filter((F.col("idx") <= F.col("tr_end") - 1) & ok).select(
        F.col("idx").alias("tidx"),
        F.col("rev").alias("trev"),
        F.col("l1").alias("tl1"),
        F.col("l2").alias("tl2"),
        F.col("nxt").alias("tnxt"),
    )
    ho = emb.filter((F.col("idx") > F.col("tr_end")) & ok).select(
        F.col("idx").alias("hidx"),
        F.col("rev").alias("hrev"),
        F.col("l1").alias("hl1"),
        F.col("l2").alias("hl2"),
        F.col("nxt").alias("hnxt"),
    )
    dd = lambda a, b: (F.col(a) - F.col(b)).cast("double")  # noqa: E731
    d2 = F.round(
        dd("hrev", "trev") * dd("hrev", "trev")
        + dd("hl1", "tl1") * dd("hl1", "tl1")
        + dd("hl2", "tl2") * dd("hl2", "tl2"),
        4,
    ).cast("decimal(38,4)")
    dist = ho.crossJoin(F.broadcast(tr)).select(
        "hidx", "tidx", "tnxt", "hnxt", d2.alias("d2")
    )
    knn = dist.select(
        "hidx", "tnxt", "hnxt",
        F.row_number()
        .over(Window.partitionBy("hidx").orderBy("d2", "tidx"))
        .alias("rk"),
    )
    pred = (
        knn.filter(F.col("rk") <= 5)
        .groupBy("hidx")
        .agg(
            (F.sum("tnxt").cast("double") / 5).alias("yhat"),
            F.max(F.col("hnxt").cast("double")).alias("y"),
        )
    )
    yhat, y = F.col("yhat"), F.col("y")
    r2d = lambda e, p: F.sum(  # noqa: E731
        F.round(e, 2).cast(f"decimal({p},2)")
    ).cast("double")
    mom = pred.agg(
        F.count(F.lit(1)).alias("n"),
        r2d(yhat, 24).alias("sx"),
        r2d(y, 24).alias("sy"),
        r2d(yhat * y, 38).alias("sxy"),
        r2d(yhat * yhat, 38).alias("sxx"),
        r2d(y * y, 38).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return mom.select(
        n.cast("bigint").alias("n_holdout"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("forecast_skill_rho"),
        F.round(sx / n, 2).alias("mean_forecast"),
        F.round(sy / n, 2).alias("mean_actual"),
    )


# -- q_mincer_zarnowitz ------------------------------------------------
#
# Mincer-Zarnowitz forecast-rationality regression: actual holdout
# revenue on the seasonal-naive forecast; a rational forecast has
# intercept 0 and slope 1, so the reported t(a=0) and t(b=1) say
# whether the forecast is biased (level) or inefficient (slope) —
# the test that tells you WHETHER to recalibrate before q_theil_u
# tells you HOW the error decomposes. House exact-moment OLS with
# classical standard errors over 2-rounded pairs.

MZ_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
dowm AS (
  SELECT dayofweek(day) AS dw,
         CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2)
              AS DECIMAL(24,2)) AS f
  FROM daily CROSS JOIN mark WHERE idx <= tr_end GROUP BY 1
), hold AS (
  SELECT CAST(d.rev AS DOUBLE) AS y, CAST(w.f AS DOUBLE) AS x
  FROM daily d CROSS JOIN mark
  JOIN dowm w ON w.dw = dayofweek(d.day)
  WHERE d.idx > tr_end
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(x, 2) AS DECIMAL(30,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(y, 2) AS DECIMAL(30,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(round(x * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(round(y * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS syy
  FROM hold
), f AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
         ((n * syy - sy * sy)
          - pow(n * sxy - sx * sy, 2) / (n * sxx - sx * sx))
           / (n * (n - 2)) AS s2,
         (n * sxx - sx * sx) / n AS ssx,
         sxx / n AS mxx
  FROM mom
)
SELECT CAST(n AS BIGINT) AS n_holdout,
       round(a, 4) AS intercept,
       round(b, 6) AS slope,
       round(a / sqrt(s2 * mxx / ssx), 6) AS t_intercept_zero,
       round((b - 1) / sqrt(s2 / ssx), 6) AS t_slope_one,
       CAST(CASE WHEN abs(a / sqrt(s2 * mxx / ssx)) < 1.96
                  AND abs((b - 1) / sqrt(s2 / ssx)) < 1.96
            THEN 1 ELSE 0 END AS BIGINT) AS rational
FROM f
"""


@query("q_mincer_zarnowitz", oracle=MZ_SQL)
def q_mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # tr_end rides along as a window column on the (already
    # single-partition, |days|-sized) grid — no separate mark
    # aggregate, no broadcast joins, so the checkpointed grid has
    # exactly two consumers (dowm, hold) instead of five plan arms.
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
            (F.count(F.lit(1)).over(w_all) - 56).alias("tr_end"),
        )
        .localCheckpoint()
    )
    dowm = (
        daily.filter(F.col("idx") <= F.col("tr_end"))
        .groupBy(F.dayofweek("day").alias("dw"))
        .agg(
            F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 2)
            .cast("decimal(24,2)")
            .alias("f")
        )
    )
    hold = (
        daily.filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(dowm), F.dayofweek("day") == F.col("dw"))
        .select(
            F.col("rev").cast("double").alias("y"),
            F.col("f").cast("double").alias("x"),
        )
    )
    xd, yd = F.col("x"), F.col("y")
    r2s = lambda e, p: F.sum(  # noqa: E731
        F.round(e, 2).cast(f"decimal({p},2)")
    ).cast("double")
    mom = hold.agg(
        F.count(F.lit(1)).alias("n"),
        r2s(xd, 30).alias("sx"),
        r2s(yd, 30).alias("sy"),
        r2s(xd * xd, 38).alias("sxx"),
        r2s(xd * yd, 38).alias("sxy"),
        r2s(yd * yd, 38).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    s2 = (
        (n * syy - sy * sy)
        - F.pow(n * sxy - sx * sy, 2) / (n * sxx - sx * sx)
    ) / (n * (n - 2))
    ssx = (n * sxx - sx * sx) / n
    mxx = sxx / n
    ta = a / F.sqrt(s2 * mxx / ssx)
    tb = (b - 1) / F.sqrt(s2 / ssx)
    return mom.select(
        n.cast("bigint").alias("n_holdout"),
        F.round(a, 4).alias("intercept"),
        F.round(b, 6).alias("slope"),
        F.round(ta, 6).alias("t_intercept_zero"),
        F.round(tb, 6).alias("t_slope_one"),
        F.when((F.abs(ta) < 1.96) & (F.abs(tb) < 1.96), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rational"),
    )


# -- q_pesaran_timmermann ----------------------------------------------
#
# Pesaran-Timmermann directional-accuracy test on the seasonal-naive
# forecast: does the forecast predict the SIGN of tomorrow's change
# better than chance, where chance is the PT independence benchmark
# p* = py*px + (1-py)(1-px) — a forecast can have terrible MSE and
# still time directions (or vice versa), which is why trading desks
# run PT next to q_mase. Hit counts are exact integers; the PT z
# uses the independence variance, one double chain.

PT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
dowm AS (
  SELECT dayofweek(day) AS dw,
         CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2)
              AS DECIMAL(24,2)) AS f
  FROM daily CROSS JOIN mark WHERE idx <= tr_end GROUP BY 1
), seq AS (
  SELECT d.idx, CAST(d.rev AS DOUBLE) AS y, CAST(w.f AS DOUBLE) AS fc,
         CAST(LAG(d.rev) OVER (ORDER BY d.idx) AS DOUBLE) AS yl
  FROM daily d CROSS JOIN mark
  JOIN dowm w ON w.dw = dayofweek(d.day)
  WHERE d.idx > tr_end
), dirs AS (
  SELECT CASE WHEN y > yl THEN 1 ELSE 0 END AS up_act,
         CASE WHEN fc > yl THEN 1 ELSE 0 END AS up_pred
  FROM seq WHERE yl IS NOT NULL
), agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN up_act = up_pred THEN 1 ELSE 0 END)
              AS BIGINT) AS hits,
         CAST(SUM(up_act) AS BIGINT) AS na,
         CAST(SUM(up_pred) AS BIGINT) AS np
  FROM dirs
), f AS (
  SELECT n, hits,
         hits / CAST(n AS DOUBLE) AS phat,
         (na / CAST(n AS DOUBLE)) * (np / CAST(n AS DOUBLE))
         + (1 - na / CAST(n AS DOUBLE)) * (1 - np / CAST(n AS DOUBLE))
           AS pstar,
         na / CAST(n AS DOUBLE) AS py, np / CAST(n AS DOUBLE) AS px
  FROM agg
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(phat, 6) AS hit_rate,
       round(pstar, 6) AS chance_rate,
       round((phat - pstar)
             / sqrt(pstar * (1 - pstar) / n), 6) AS pt_z
FROM f
"""


@query("q_pesaran_timmermann", oracle=PT_SQL)
def q_pesaran_timmermann(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    dowm = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") <= F.col("tr_end"))
        .groupBy(F.dayofweek("day").alias("dw"))
        .agg(
            F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 2)
            .cast("decimal(24,2)")
            .alias("f")
        )
    )
    seq = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(dowm), F.dayofweek("day") == F.col("dw"))
        .select(
            "idx",
            F.col("rev").cast("double").alias("y"),
            F.col("f").cast("double").alias("fc"),
            F.lag(F.col("rev")).over(Window.orderBy("idx"))
            .cast("double")
            .alias("yl"),
        )
    )
    dirs = seq.filter(F.col("yl").isNotNull()).select(
        F.when(F.col("y") > F.col("yl"), 1).otherwise(0).alias("up_act"),
        F.when(F.col("fc") > F.col("yl"), 1).otherwise(0).alias("up_pred"),
    )
    agg = dirs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("up_act") == F.col("up_pred"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("hits"),
        F.sum("up_act").cast("bigint").alias("na"),
        F.sum("up_pred").cast("bigint").alias("np"),
    )
    n = F.col("n")
    phat = F.col("hits") / n.cast("double")
    py = F.col("na") / n.cast("double")
    px = F.col("np") / n.cast("double")
    pstar = py * px + (1 - py) * (1 - px)
    return agg.select(
        n.cast("bigint").alias("n_days"),
        F.round(phat, 6).alias("hit_rate"),
        F.round(pstar, 6).alias("chance_rate"),
        F.round(
            (phat - pstar) / F.sqrt(pstar * (1 - pstar) / n), 6
        ).alias("pt_z"),
    )


# -- q_turning_points --------------------------------------------------
#
# Turning-points randomness test per event type: count strict local
# peaks + troughs T in the daily revenue series; under randomness
# E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90, so z = (T-E)/sqrt(V)
# flags series that are too smooth (trend, z << 0) or too jagged
# (negative autocorrelation, z >> 0) — the extrema-based complement
# to q_runs_test's sign-based view. Daily revenue is an exact decimal
# so strict peak/trough comparisons are exact; T and n are BIGINTs
# and the z chain is the single double step, 6-rounded.

TURNING_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), lagged AS (
  SELECT event_type,
         LAG(rev) OVER w AS prv, rev,
         LEAD(rev) OVER w AS nxt
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CASE WHEN prv IS NOT NULL AND nxt IS NOT NULL
                        AND ((rev > prv AND rev > nxt)
                             OR (rev < prv AND rev < nxt))
                       THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM lagged GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, t AS turning_points,
       round(2.0 * (n - 2) / 3, 6) AS expected,
       round((t - 2.0 * (n - 2) / 3)
             / sqrt((16.0 * n - 29) / 90), 6) AS z
FROM agg
ORDER BY event_type
"""


@query("q_turning_points", oracle=TURNING_SQL)
def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lagged = daily.select(
        "event_type",
        F.lag("rev").over(w).alias("prv"),
        "rev",
        F.lead("rev").over(w).alias("nxt"),
    )
    rev, prv, nxt = F.col("rev"), F.col("prv"), F.col("nxt")
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                prv.isNotNull()
                & nxt.isNotNull()
                & (((rev > prv) & (rev > nxt)) | ((rev < prv) & (rev < nxt))),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("t"),
    )
    n, t = F.col("n"), F.col("t")
    return agg.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        t.alias("turning_points"),
        F.round(2.0 * (n - 2) / 3, 6).alias("expected"),
        F.round(
            (t - 2.0 * (n - 2) / 3) / F.sqrt((16.0 * n - 29) / 90), 6
        ).alias("z"),
    ).orderBy("event_type")


# -- q_ratio_to_ma -----------------------------------------------------
#
# Classical ratio-to-moving-average seasonal indices at MONTHLY
# grain (the X-11 ancestor): monthly revenue over a centered 12-month
# moving average (the 2x12 MA that splits the even window
# symmetrically), per-calendar-month MEDIAN ratio (robust to one-off
# spikes), normalized so the twelve indices average 1 — the
# annual-cycle complement to q_stl_lite's weekly decomposition and
# q_seasonality's dow means. Monthly sums are exact decimals; the
# centered MA is a ROWS-window decimal fold with the half-weight
# endpoints handled by the standard (m[-6]+m[+6])/2 correction;
# medians use the house interpolated quantile.

RATIO_MA_SQL = """
WITH m AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
         CAST(strftime(CAST(o_orderdate AS DATE), '%m') AS BIGINT) AS moy,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM orders GROUP BY 1, 2
), ma AS (
  SELECT mon, moy, rev,
         CAST(SUM(rev) OVER w11 AS DOUBLE) / 12
           + (CAST(LAG(rev, 6) OVER wo AS DOUBLE)
              + CAST(LEAD(rev, 6) OVER wo AS DOUBLE)) / 24 AS cma,
         COUNT(*) OVER w11 AS n11
  FROM m
  WINDOW wo AS (ORDER BY mon),
         w11 AS (ORDER BY mon ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
), ratio AS (
  SELECT moy, round(CAST(rev AS DOUBLE) / cma, 9) AS r
  FROM ma WHERE n11 = 11 AND cma IS NOT NULL
), med AS (
  SELECT moy, round(quantile_cont(r, 0.5), 6) AS mr,
         CAST(COUNT(*) AS BIGINT) AS n_years
  FROM ratio GROUP BY 1
), norm AS (
  SELECT moy, mr, n_years,
         CAST(SUM(CAST(mr AS DECIMAL(12,6))) OVER () AS DOUBLE) AS tot
  FROM med
)
SELECT CAST(moy AS BIGINT) AS month_of_year,
       n_years,
       round(mr, 6) AS raw_index,
       round(mr * 12 / tot, 6) AS seasonal_index
FROM norm
ORDER BY month_of_year
"""


@query("q_ratio_to_ma", oracle=RATIO_MA_SQL)
def q_ratio_to_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    m = cat.orders.groupBy(
        F.date_format(od, "yyyy-MM").alias("mon"),
        F.month(od).cast("bigint").alias("moy"),
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("rev"))
    wo = Window.orderBy("mon")
    w11 = wo.rowsBetween(-5, 5)
    cma = (
        F.sum("rev").over(w11).cast("double") / 12
        + (
            F.lag("rev", 6).over(wo).cast("double")
            + F.lead("rev", 6).over(wo).cast("double")
        )
        / 24
    )
    ma = m.select(
        "mon", "moy", "rev",
        cma.alias("cma"),
        F.count(F.lit(1)).over(w11).alias("n11"),
    )
    ratio = ma.filter(
        (F.col("n11") == 11) & F.col("cma").isNotNull()
    ).select(
        "moy",
        F.round(F.col("rev").cast("double") / F.col("cma"), 9).alias("r"),
    )
    med = ratio.groupBy("moy").agg(
        F.round(F.percentile("r", F.lit(0.5)), 6).alias("mr"),
        F.count(F.lit(1)).cast("bigint").alias("n_years"),
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    norm = med.select(
        "moy", "mr", "n_years",
        F.sum(F.col("mr").cast("decimal(12,6)")).over(wall).cast("double")
        .alias("tot"),
    )
    return norm.select(
        F.col("moy").alias("month_of_year"),
        "n_years",
        F.round("mr", 6).alias("raw_index"),
        F.round(F.col("mr") * 12 / F.col("tot"), 6)
        .alias("seasonal_index"),
    ).orderBy("month_of_year")


# -- q_haar_energy -----------------------------------------------------
#
# Haar wavelet multi-resolution energy decomposition of the daily
# revenue series: one groupBy collapses the fact stream to the day
# grid, dyadic blocks of 8 consecutive days yield the 7 orthonormal
# Haar detail coefficients per block at levels 1/2/3, and per-level
# energy E_l = sum (dS)^2 / 2^l separates day-over-day noise (level 1)
# from week-ish structure (level 3). Everything up to the final
# division is EXACT: daily revenue is DECIMAL(18,2), half-block delta
# sums and their squares stay decimal, and the per-level sums multiply
# by integer 2^(3-l) so shares come from one exact total. The dominant
# coefficient per level ties-break on earliest block. Scale: the fact
# scan partial-aggregates to |days| rows; all wavelet algebra runs on
# the tiny grid (trailing partial block dropped).

HAAR_SQL = """
WITH grid AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(20,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), nb AS (SELECT COUNT(*) // 8 AS nblocks FROM grid),
blk AS (
  SELECT (idx - 1) // 8 AS b, MIN(d) AS d0,
         SUM(CASE WHEN (idx - 1) % 8 = 0 THEN rev ELSE 0 END) AS s0,
         SUM(CASE WHEN (idx - 1) % 8 = 1 THEN rev ELSE 0 END) AS s1,
         SUM(CASE WHEN (idx - 1) % 8 = 2 THEN rev ELSE 0 END) AS s2,
         SUM(CASE WHEN (idx - 1) % 8 = 3 THEN rev ELSE 0 END) AS s3,
         SUM(CASE WHEN (idx - 1) % 8 = 4 THEN rev ELSE 0 END) AS s4,
         SUM(CASE WHEN (idx - 1) % 8 = 5 THEN rev ELSE 0 END) AS s5,
         SUM(CASE WHEN (idx - 1) % 8 = 6 THEN rev ELSE 0 END) AS s6,
         SUM(CASE WHEN (idx - 1) % 8 = 7 THEN rev ELSE 0 END) AS s7
  FROM grid CROSS JOIN nb
  WHERE idx <= nblocks * 8
  GROUP BY 1
), coef AS (
  SELECT b, d0, 1 AS lvl, 0 AS pos, s0 - s1 AS ds FROM blk
  UNION ALL SELECT b, d0, 1, 2, s2 - s3 FROM blk
  UNION ALL SELECT b, d0, 1, 4, s4 - s5 FROM blk
  UNION ALL SELECT b, d0, 1, 6, s6 - s7 FROM blk
  UNION ALL SELECT b, d0, 2, 0, (s0 + s1) - (s2 + s3) FROM blk
  UNION ALL SELECT b, d0, 2, 4, (s4 + s5) - (s6 + s7) FROM blk
  UNION ALL SELECT b, d0, 3, 0,
    (s0 + s1 + s2 + s3) - (s4 + s5 + s6 + s7) FROM blk
), e AS (
  SELECT *,
         CAST(ds AS DECIMAL(22,2)) * CAST(ds AS DECIMAL(22,2))
           * CAST(CASE lvl WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
                  AS DECIMAL(3,0)) AS e8,
         ROW_NUMBER() OVER (PARTITION BY lvl
           ORDER BY CAST(ds AS DECIMAL(22,2)) * CAST(ds AS DECIMAL(22,2))
                      DESC, b, pos) AS rk
  FROM coef
), tot AS (SELECT SUM(e8) AS t8 FROM e)
SELECT lvl AS level,
       COUNT(*) AS n_coef,
       round(CAST(SUM(e8) AS DOUBLE) / 8, 4) AS energy,
       round(CAST(SUM(e8) AS DOUBLE) / CAST(MAX(t8) AS DOUBLE), 6)
         AS energy_share,
       strftime(MAX(CASE WHEN rk = 1 THEN d0 END), '%Y-%m-%d')
         AS top_block_start,
       round(CAST(MAX(CASE WHEN rk = 1 THEN e8 END) AS DOUBLE) / 8, 4)
         AS top_energy
FROM e CROSS JOIN tot
GROUP BY lvl
ORDER BY lvl
"""


@query("q_haar_energy", oracle=HAAR_SQL)
def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    grid = (
        c.orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(20,2)").alias("rev"))
        .select(
            "d", "rev", F.row_number().over(Window.orderBy("d")).alias("idx")
        )
    )
    nb = grid.agg(
        (F.count(F.lit(1)) / 8).cast("bigint").alias("nblocks")
    )
    i = F.col("idx") - 1
    pos_sums = [
        F.sum(F.when(i % 8 == p, F.col("rev")).otherwise(F.lit(0))).alias(
            f"s{p}"
        )
        for p in range(8)
    ]
    blk = (
        grid.join(F.broadcast(nb))
        .filter(F.col("idx") <= F.col("nblocks") * 8)
        .groupBy((i / 8).cast("bigint").alias("b"))
        .agg(F.min("d").alias("d0"), *pos_sums)
    )
    s = [F.col(f"s{p}") for p in range(8)]
    coefs = [
        (1, 0, s[0] - s[1]), (1, 2, s[2] - s[3]),
        (1, 4, s[4] - s[5]), (1, 6, s[6] - s[7]),
        (2, 0, (s[0] + s[1]) - (s[2] + s[3])),
        (2, 4, (s[4] + s[5]) - (s[6] + s[7])),
        (3, 0, (s[0] + s[1] + s[2] + s[3]) - (s[4] + s[5] + s[6] + s[7])),
    ]
    coef = blk.select(
        "b", "d0",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lvl).alias("lvl"),
                        F.lit(pos).alias("pos"),
                        ds.cast("decimal(22,2)").alias("ds"),
                    )
                    for lvl, pos, ds in coefs
                ]
            )
        ).alias("c"),
    ).select("b", "d0", "c.lvl", "c.pos", "c.ds")
    ds = F.col("ds")
    mult = (
        F.when(F.col("lvl") == 1, 4)
        .when(F.col("lvl") == 2, 2)
        .otherwise(1)
        .cast("decimal(3,0)")
    )
    e = coef.select(
        "*",
        (ds * ds * mult).alias("e8"),
        F.row_number()
        .over(
            Window.partitionBy("lvl").orderBy(
                (ds * ds).desc(), "b", "pos"
            )
        )
        .alias("rk"),
    )
    tot = e.agg(F.sum("e8").alias("t8"))
    return (
        e.join(F.broadcast(tot))
        .groupBy(F.col("lvl").alias("level"))
        .agg(
            F.count(F.lit(1)).alias("n_coef"),
            F.round(F.sum("e8").cast("double") / 8, 4).alias("energy"),
            F.round(
                F.sum("e8").cast("double") / F.max("t8").cast("double"), 6
            ).alias("energy_share"),
            F.date_format(
                F.max(F.when(F.col("rk") == 1, F.col("d0"))), "yyyy-MM-dd"
            ).alias("top_block_start"),
            F.round(
                F.max(F.when(F.col("rk") == 1, F.col("e8"))).cast("double")
                / 8,
                4,
            ).alias("top_energy"),
        )
        .orderBy("level")
    )


# -- q_transfer_entropy ------------------------------------------------
#
# Pairwise lag-1 binary transfer entropy between event-type daily
# series: each type's calendar-day count collapses to an up/down state
# s_t = [cnt_t > cnt_{t-1}], and TE(X->Y) = sum p(y',y,x) *
# ln[ p(y'|y,x) / p(y'|y) ] over the 8 joint states measures how much
# knowing X's move today sharpens tomorrow's Y forecast beyond Y's own
# history — the DIRECTED, nonlinear counterpart to q_cross_correlation
# and q_granger_lite. All probabilities are ratios of exact integer
# triple counts over the shared day grid (zero-filled from one
# calendar sequence), marginals are window sums over the grouped
# triple table, and each c3*ln(...) term is 9-rounded decimal before
# the exact final fold. Scale: |days|x|types| grid, |types|^2 pairs —
# grid algebra only after one fact scan.

TE_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
  FROM events
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
cnts AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, d.day, COALESCE(c.cnt, 0) AS cnt
  FROM days d CROSS JOIN types t
  LEFT JOIN cnts c ON c.day = d.day AND c.event_type = t.event_type
), st AS (
  SELECT event_type, day,
         CASE WHEN cnt > LAG(cnt) OVER
                (PARTITION BY event_type ORDER BY day)
              THEN 1 ELSE 0 END AS s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM grid
), sy AS (
  SELECT event_type, day, s,
         LEAD(s) OVER (PARTITION BY event_type ORDER BY day) AS s_next,
         rn
  FROM st
), triple AS (
  SELECT x.event_type AS x_type, y.event_type AS y_type,
         y.s_next AS yn, y.s AS y, x.s AS x
  FROM sy y JOIN st x ON x.day = y.day
  WHERE y.rn >= 2 AND y.s_next IS NOT NULL
    AND x.event_type <> y.event_type
), c3 AS (
  SELECT x_type, y_type, yn, y, x, COUNT(*) AS c3
  FROM triple GROUP BY 1, 2, 3, 4, 5
), marg AS (
  SELECT *,
         SUM(c3) OVER (PARTITION BY x_type, y_type, y, x) AS c_yx,
         SUM(c3) OVER (PARTITION BY x_type, y_type, y, yn) AS c_yyn,
         SUM(c3) OVER (PARTITION BY x_type, y_type, y) AS c_y,
         SUM(c3) OVER (PARTITION BY x_type, y_type) AS n
  FROM c3
), terms AS (
  SELECT x_type, y_type, n,
         CAST(round(c3 * ln((CAST(c3 AS DOUBLE) * c_y)
                            / (CAST(c_yx AS DOUBLE) * c_yyn)), 9)
              AS DECIMAL(24,9)) AS term
  FROM marg
)
SELECT x_type, y_type, CAST(MAX(n) AS BIGINT) AS n,
       round(CAST(SUM(term) AS DOUBLE) / MAX(n), 6) AS te_nats
FROM terms
GROUP BY x_type, y_type
ORDER BY x_type, y_type
"""


@query("q_transfer_entropy", oracle=TE_SQL)
def q_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    day = F.col("ts").cast("date")
    bounds = e.agg(
        F.min(day).alias("dmin"), F.max(day).alias("dmax")
    )
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    types = e.select("event_type").distinct()
    cnts = e.groupBy(day.alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cnts, ["day", "event_type"], "left")
        .select(
            "event_type", "day", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    st = grid.select(
        "event_type", "day",
        F.when(F.col("cnt") > F.lag("cnt").over(wt), 1)
        .otherwise(0)
        .alias("s"),
        F.row_number().over(wt).alias("rn"),
    ).localCheckpoint()
    sy = st.select(
        "event_type", "day", "s",
        F.lead("s").over(wt).alias("s_next"), "rn",
    )
    triple = (
        sy.alias("y")
        .join(st.alias("x"), F.col("y.day") == F.col("x.day"))
        .filter(
            (F.col("y.rn") >= 2)
            & F.col("y.s_next").isNotNull()
            & (F.col("x.event_type") != F.col("y.event_type"))
        )
        .select(
            F.col("x.event_type").alias("x_type"),
            F.col("y.event_type").alias("y_type"),
            F.col("y.s_next").alias("yn"),
            F.col("y.s").alias("y"),
            F.col("x.s").alias("x"),
        )
    )
    c3 = triple.groupBy("x_type", "y_type", "yn", "y", "x").agg(
        F.count(F.lit(1)).alias("c3")
    )
    wp = Window.partitionBy("x_type", "y_type")
    marg = c3.select(
        "*",
        F.sum("c3").over(wp.partitionBy("x_type", "y_type", "y", "x"))
        .alias("c_yx"),
        F.sum("c3").over(wp.partitionBy("x_type", "y_type", "y", "yn"))
        .alias("c_yyn"),
        F.sum("c3").over(wp.partitionBy("x_type", "y_type", "y"))
        .alias("c_y"),
        F.sum("c3").over(wp).alias("n"),
    )
    term = F.round(
        F.col("c3")
        * F.log(
            (F.col("c3").cast("double") * F.col("c_y"))
            / (F.col("c_yx").cast("double") * F.col("c_yyn"))
        ),
        9,
    ).cast("decimal(24,9)")
    return (
        marg.select("x_type", "y_type", "n", term.alias("term"))
        .groupBy("x_type", "y_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(
                F.sum("term").cast("double") / F.max("n"), 6
            ).alias("te_nats"),
        )
        .orderBy("x_type", "y_type")
    )


# -- q_adstock_mmm -----------------------------------------------------
#
# Marketing-mix-model lite: geometric adstock of daily "promo
# pressure" (click+view event counts carry over with theta = 0.7 per
# day, truncated at 14 lags where the weight is < 1%) regressed
# log-log against next-day purchase revenue — carryover plus
# diminishing returns, the two effects a naive same-day correlation
# misses. Adstock is an EXACT decimal fold: the day grid joins a
# broadcast 14-row lag table with 6-rounded theta^k weights, so
# sum w_k * x_{t-k} is a decimal dot product, not a recursive state;
# the OLS uses the house exact-moment pattern. Output: elasticity
# (log-log slope), carryover share captured, r2, n. Scale: fact scan
# -> day grid; grid x 14 lag join.

ADSTOCK_SQL = """
WITH d0 AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS pressure
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
), rev AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS r
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1
), bounds AS (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM d0
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), lags AS (
  SELECT k, CAST(round(pow(0.7, k), 6) AS DECIMAL(8,6)) AS w
  FROM (SELECT UNNEST(generate_series(0, 13)) AS k)
), ad AS (
  SELECT d.day,
         CAST(SUM(COALESCE(p.pressure, 0) * l.w) AS DECIMAL(24,6))
           AS adstock
  FROM days d CROSS JOIN lags l
  LEFT JOIN d0 p ON p.day = d.day - CAST(l.k AS INTEGER)
  GROUP BY 1
), xy AS (
  SELECT CAST(round(ln(CAST(a.adstock AS DOUBLE)), 9) AS DECIMAL(18,9))
           AS x,
         CAST(round(ln(CAST(r.r AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM ad a JOIN rev r ON r.day = a.day + 1
  WHERE a.adstock > 0 AND r.r > 0
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
       round(1 - pow(0.7, 14), 6) AS carryover_captured
FROM m
"""


@query("q_adstock_mmm", oracle=ADSTOCK_SQL)
def q_adstock_mmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    day = F.col("ts").cast("date")
    d0 = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pressure"))
        .localCheckpoint()
    )
    rev = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(day.alias("day"))
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("decimal(24,2)")
            .alias("r")
        )
    )
    bounds = d0.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    lags = (
        e.sparkSession.range(0, 14)
        .select(
            F.col("id").alias("k"),
            F.round(F.pow(F.lit(0.7), F.col("id")), 6)
            .cast("decimal(8,6)")
            .alias("w"),
        )
    )
    ad = (
        days.crossJoin(F.broadcast(lags))
        .join(
            d0.select(F.col("day").alias("pday"), "pressure"),
            F.expr("pday = day - CAST(k AS INT)"),
            "left",
        )
        .groupBy("day")
        .agg(
            F.sum(F.coalesce("pressure", F.lit(0)) * F.col("w"))
            .cast("decimal(24,6)")
            .alias("adstock")
        )
    )
    xy = (
        ad.join(
            rev.select(F.col("day").alias("rday"), "r"),
            F.expr("rday = day + 1"),
        )
        .filter((F.col("adstock") > 0) & (F.col("r") > 0))
        .select(
            F.round(F.log(F.col("adstock").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("x"),
            F.round(F.log(F.col("r").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    p28 = lambda ex: F.sum(ex.cast("decimal(28,9)")).cast("double")  # noqa: E731
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        p28(x * x).alias("sxx"),
        p28(x * y).alias("sxy"),
        p28(y * y).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("elasticity"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
        F.round(1 - F.pow(F.lit(0.7), 14), 6).alias("carryover_captured"),
    )


# -- q_kernel_smoother -------------------------------------------------
#
# Nadaraya-Watson kernel regression of daily revenue evaluated at
# each month-end: yhat(t) = sum K((t - t_i)/h) y_i / sum K(.) with a
# Gaussian kernel (h = 14 days, truncated at |dt| <= 42 where the
# weight is < 1e-2 of the peak — the documented bandwidth-window
# bound that keeps the pair set |eval points| x 85 rows instead of
# x |days|) — the nonparametric smoother between q_stl_lite's fixed
# 7-day boxcar and q_forecast_*'s parametric fits. Kernel weights
# are 9-rounded decimals; weighted sums fold exactly.

NW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), evalp AS (
  SELECT day AS ed, idx AS eidx,
         ROW_NUMBER() OVER (PARTITION BY strftime(day, '%Y-%m')
                            ORDER BY day DESC) AS rn
  FROM daily
), ev AS (SELECT ed, eidx FROM evalp WHERE rn = 1),
pairs AS (
  SELECT e.ed, d.rev,
         CAST(round(exp(-((d.idx - e.eidx) * (d.idx - e.eidx))
                        / (2.0 * 14 * 14)), 9) AS DECIMAL(12,9)) AS w
  FROM ev e JOIN daily d ON abs(d.idx - e.eidx) <= 42
), agg AS (
  SELECT ed, COUNT(*) AS n_in_window,
         CAST(SUM(w) AS DOUBLE) AS sw,
         CAST(SUM(CAST(round(CAST(w AS DOUBLE) * CAST(rev AS DOUBLE), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS swy
  FROM pairs GROUP BY 1
)
SELECT strftime(ed, '%Y-%m-%d') AS eval_day,
       CAST(n_in_window AS BIGINT) AS n_in_window,
       round(swy / sw, 2) AS smoothed_revenue
FROM agg
ORDER BY eval_day
"""


@query("q_kernel_smoother", oracle=NW_SQL)
def q_kernel_smoother(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    ev = (
        daily.select(
            F.col("day").alias("ed"),
            F.col("idx").alias("eidx"),
            F.row_number()
            .over(
                Window.partitionBy(
                    F.date_format("day", "yyyy-MM")
                ).orderBy(F.col("day").desc())
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("ed", "eidx")
    )
    dt = F.col("idx") - F.col("eidx")
    w = F.round(
        F.exp(-(dt * dt) / (2.0 * 14 * 14)), 9
    ).cast("decimal(12,9)")
    pairs = (
        daily.join(F.broadcast(ev), F.abs(dt) <= 42)
        .select("ed", "rev", w.alias("w"))
    )
    agg = pairs.groupBy("ed").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.sum("w").cast("double").alias("sw"),
        F.sum(
            F.round(
                F.col("w").cast("double") * F.col("rev").cast("double"), 4
            ).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("swy"),
    )
    return agg.select(
        F.date_format("ed", "yyyy-MM-dd").alias("eval_day"),
        F.col("n_in_window").cast("bigint").alias("n_in_window"),
        F.round(F.col("swy") / F.col("sw"), 2).alias("smoothed_revenue"),
    ).orderBy("eval_day")


# -- q_interval_score --------------------------------------------------
#
# Winkler/interval score for an empirical 80% prediction interval:
# train-period daily revenue gives EXACT rank-selected q10/q90
# bounds, the last-56-day holdout is scored with
# IS = (u-l) + (2/alpha)(l-y)I(y<l) + (2/alpha)(y-u)I(y>u) — the
# proper scoring rule that punishes BOTH wide intervals and misses,
# the interval counterpart of q_brier_decomposition's point-
# probability score. Also reports empirical coverage vs the nominal
# 80%. Bounds are exact decimals, per-day scores 4-rounded decimals
# folded exactly; one double finale.

INTERVAL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
train AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, day) AS r,
         COUNT(*) OVER () AS n
  FROM daily CROSS JOIN mark WHERE idx <= tr_end
), bounds AS (
  SELECT MAX(CASE WHEN r = CAST(ceil(0.1 * n) AS BIGINT) THEN rev END)
           AS lo,
         MAX(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT) THEN rev END)
           AS hi
  FROM train
), scored AS (
  SELECT d.rev AS y, b.lo, b.hi,
         CAST(round(CAST(b.hi - b.lo AS DOUBLE)
                    + CASE WHEN d.rev < b.lo
                           THEN 10 * CAST(b.lo - d.rev AS DOUBLE)
                           ELSE 0 END
                    + CASE WHEN d.rev > b.hi
                           THEN 10 * CAST(d.rev - b.hi AS DOUBLE)
                           ELSE 0 END, 4) AS DECIMAL(24,4)) AS sc,
         CASE WHEN d.rev >= b.lo AND d.rev <= b.hi THEN 1 ELSE 0 END
           AS covered
  FROM daily d CROSS JOIN mark CROSS JOIN bounds b
  WHERE d.idx > tr_end
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_holdout,
       CAST(MAX(lo) AS DOUBLE) AS lo,
       CAST(MAX(hi) AS DOUBLE) AS hi,
       round(SUM(covered) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage,
       round(CAST(SUM(sc) AS DOUBLE) / COUNT(*), 4) AS mean_interval_score
FROM scored
"""


@query("q_interval_score", oracle=INTERVAL_SQL)
def q_interval_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
        .localCheckpoint()
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    train = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") <= F.col("tr_end"))
        .select(
            "rev",
            F.row_number().over(Window.orderBy("rev", "day")).alias("r"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
    )
    bounds = train.agg(
        F.max(
            F.when(
                F.col("r") == F.ceil(0.1 * F.col("n")).cast("bigint"),
                F.col("rev"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("r") == F.ceil(0.9 * F.col("n")).cast("bigint"),
                F.col("rev"),
            )
        ).alias("hi"),
    )
    y, lo, hi = F.col("rev"), F.col("lo"), F.col("hi")
    sc = F.round(
        (hi - lo).cast("double")
        + F.when(y < lo, 10 * (lo - y).cast("double")).otherwise(0)
        + F.when(y > hi, 10 * (y - hi).cast("double")).otherwise(0),
        4,
    ).cast("decimal(24,4)")
    scored = (
        daily.join(F.broadcast(mark))
        .filter(F.col("idx") > F.col("tr_end"))
        .join(F.broadcast(bounds))
        .select(
            sc.alias("sc"),
            F.when((y >= lo) & (y <= hi), 1).otherwise(0).alias("covered"),
            lo, hi,
        )
    )
    n = F.count(F.lit(1))
    return scored.agg(
        n.cast("bigint").alias("n_holdout"),
        F.max("lo").cast("double").alias("lo"),
        F.max("hi").cast("double").alias("hi"),
        F.round(F.sum("covered") / n.cast("double"), 6).alias("coverage"),
        F.round(F.sum("sc").cast("double") / n, 4)
        .alias("mean_interval_score"),
    )


# -- q_crps_empirical --------------------------------------------------
#
# Continuous ranked probability score of the train-period empirical
# distribution as a probabilistic forecast for holdout daily revenue:
# CRPS(F, y) = E|X - y| - 0.5 E|X - X'| with BOTH expectations
# collapsed to exact rank prefix algebra — E|X-X'| via the sorted
# 2*sum x_(k)(2k-n-1) identity (the q_energy_distance kernel) and
# E|X-y| per holdout point via the pooled train+holdout cumulative
# count/sum window (y(2c-n) + S - 2P). The proper scoring rule that
# grades the WHOLE predictive distribution where q_forecast_combo's
# MAE grades a point. Exact decimals until the final divisions.

CRPS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM daily_src GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
tagged AS (
  SELECT day, rev, CASE WHEN idx <= tr_end THEN 1 ELSE 0 END AS is_tr
  FROM daily CROSS JOIN mark
), trw AS (
  SELECT rev,
         rev * CAST(2 * ROW_NUMBER() OVER (ORDER BY rev, day)
                    - COUNT(*) OVER () - 1 AS BIGINT) AS t
  FROM tagged WHERE is_tr = 1
), tr AS (
  SELECT COUNT(*) AS n, CAST(SUM(rev) AS DECIMAL(32,2)) AS s,
         CAST(SUM(t) AS DECIMAL(38,2)) AS within2
  FROM trw
), pooled AS (
  SELECT day, rev, is_tr,
         COALESCE(CAST(SUM(CASE WHEN is_tr = 1 THEN 1 END) OVER
             (ORDER BY rev, is_tr DESC, day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT), 0) AS c,
         COALESCE(CAST(SUM(CASE WHEN is_tr = 1 THEN rev END) OVER
             (ORDER BY rev, is_tr DESC, day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DECIMAL(32,2)), CAST(0 AS DECIMAL(32,2))) AS p
  FROM tagged
), percy AS (
  SELECT day,
         CAST(round((CAST(rev AS DOUBLE) * (2 * c - (SELECT n FROM tr))
                     + CAST((SELECT s FROM tr) AS DOUBLE)
                     - 2 * CAST(p AS DOUBLE))
                    / (SELECT n FROM tr), 4) AS DECIMAL(24,4)) AS eabs
  FROM pooled WHERE is_tr = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_holdout,
       round(CAST(SUM(eabs) AS DOUBLE) / COUNT(*)
             - 0.5 * CAST((SELECT within2 FROM tr) AS DOUBLE)
               / (CAST((SELECT n FROM tr) AS DOUBLE)
                  * (SELECT n FROM tr)), 4) AS mean_crps,
       round(CAST(SUM(eabs) AS DOUBLE) / COUNT(*), 4) AS mean_eabs
FROM percy
"""
CRPS_SQL = CRPS_SQL.replace("FROM daily_src", "FROM orders").replace(
    "GROUP BY ()", ""
)


@query("q_crps_empirical", oracle=CRPS_SQL)
def q_crps_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    tagged = (
        daily.join(F.broadcast(mark))
        .select(
            "day", "rev",
            F.when(F.col("idx") <= F.col("tr_end"), 1)
            .otherwise(0)
            .alias("is_tr"),
        )
        .localCheckpoint()
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    trn = tagged.filter(F.col("is_tr") == 1)
    within = trn.select(
        "rev",
        (
            F.col("rev")
            * (
                2 * F.row_number().over(Window.orderBy("rev", "day"))
                - F.count(F.lit(1)).over(wall)
                - 1
            ).cast("bigint")
        ).alias("t"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("decimal(32,2)").alias("s"),
        F.sum("t").cast("decimal(38,2)").alias("within2"),
    )
    wp = Window.orderBy(
        "rev", F.col("is_tr").desc(), "day"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pooled = tagged.select(
        "day", "rev", "is_tr",
        F.coalesce(
            F.sum(F.when(F.col("is_tr") == 1, 1)).over(wp).cast("bigint"),
            F.lit(0),
        ).alias("c"),
        F.coalesce(
            F.sum(F.when(F.col("is_tr") == 1, F.col("rev")))
            .over(wp)
            .cast("decimal(32,2)"),
            F.lit(0).cast("decimal(32,2)"),
        ).alias("p"),
    )
    n, s = F.col("n"), F.col("s").cast("double")
    eabs = F.round(
        (
            F.col("rev").cast("double") * (2 * F.col("c") - n)
            + s
            - 2 * F.col("p").cast("double")
        )
        / n,
        4,
    ).cast("decimal(24,4)")
    percy = (
        pooled.filter(F.col("is_tr") == 0)
        .join(F.broadcast(within))
        .select(eabs.alias("eabs"), "n", "within2")
    )
    cnt = F.count(F.lit(1))
    return percy.groupBy("n", "within2").agg(
        cnt.cast("bigint").alias("n_holdout"),
        F.round(
            F.sum("eabs").cast("double") / cnt
            - 0.5
            * F.col("within2").cast("double")
            / (F.col("n").cast("double") * F.col("n")),
            4,
        ).alias("mean_crps"),
        F.round(F.sum("eabs").cast("double") / cnt, 4).alias("mean_eabs"),
    ).select("n_holdout", "mean_crps", "mean_eabs")


# -- q_pit_calibration -------------------------------------------------
#
# Probability-integral-transform calibration of the empirical
# forecast distribution that q_crps_empirical scores: PIT(y) =
# F_train(y) per holdout day (exact cumulative train counts from the
# SAME pooled rank window — no quantile inversion), binned into
# deciles with a chi-square uniformity statistic. U-shaped PIT =
# underdispersed forecasts, hump = overdispersed — the diagnosis CRPS
# compresses into one number. Exact integer bin counts; chi2 is the
# one double chain.

PIT_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS idx
  FROM orders GROUP BY 1
), mark AS (SELECT MAX(idx) - 56 AS tr_end FROM daily),
tagged AS (
  SELECT day, rev, CASE WHEN idx <= tr_end THEN 1 ELSE 0 END AS is_tr
  FROM daily CROSS JOIN mark
), ntr AS (SELECT COUNT(*) AS n FROM tagged WHERE is_tr = 1),
pooled AS (
  SELECT day, rev, is_tr,
         COALESCE(CAST(SUM(CASE WHEN is_tr = 1 THEN 1 END) OVER
             (ORDER BY rev, is_tr DESC, day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT), 0) AS c
  FROM tagged
), pit AS (
  SELECT LEAST(CAST(10 * c AS BIGINT) // (SELECT n FROM ntr),
               CAST(9 AS BIGINT)) AS bin
  FROM pooled WHERE is_tr = 0
), bins AS (
  SELECT b.bin, COALESCE(p.c, 0) AS c
  FROM (SELECT UNNEST(generate_series(CAST(0 AS BIGINT),
                                      CAST(9 AS BIGINT))) AS bin) b
  LEFT JOIN (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c
             FROM pit GROUP BY 1) p ON p.bin = b.bin
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM bins)
SELECT CAST(bin AS BIGINT) AS decile,
       CAST(c AS BIGINT) AS n_obs,
       round(c / CAST(m AS DOUBLE), 6) AS share,
       round(CAST(SUM(CAST(round((c - m / 10.0) * (c - m / 10.0)
                                 / (m / 10.0), 9) AS DECIMAL(20,9)))
                  OVER () AS DOUBLE), 6) AS chi2_uniformity
FROM bins CROSS JOIN tot
ORDER BY decile
"""


@query("q_pit_calibration", oracle=PIT_SQL)
def q_pit_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("idx"),
        )
    )
    mark = daily.agg((F.max("idx") - 56).alias("tr_end"))
    tagged = (
        daily.join(F.broadcast(mark))
        .select(
            "day", "rev",
            F.when(F.col("idx") <= F.col("tr_end"), 1)
            .otherwise(0)
            .alias("is_tr"),
        )
        .localCheckpoint()
    )
    ntr = tagged.filter(F.col("is_tr") == 1).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.orderBy(
        "rev", F.col("is_tr").desc(), "day"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pooled = tagged.select(
        "is_tr",
        F.coalesce(
            F.sum(F.when(F.col("is_tr") == 1, 1)).over(wp).cast("bigint"),
            F.lit(0),
        ).alias("c"),
    )
    pit = (
        pooled.filter(F.col("is_tr") == 0)
        .join(F.broadcast(ntr))
        .select(
            F.least(
                F.expr("CAST(10 * c AS BIGINT) div n"),
                F.lit(9).cast("bigint"),
            ).alias("bin")
        )
    )
    bins10 = pit.sparkSession.range(0, 10).select(
        F.col("id").cast("bigint").alias("bin")
    )
    counts = pit.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bins = bins10.join(counts, "bin", "left").select(
        "bin", F.coalesce("c", F.lit(0)).cast("bigint").alias("c")
    )
    tot = bins.agg(F.sum("c").cast("bigint").alias("m"))
    m, c = F.col("m"), F.col("c")
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chi_term = F.round(
        (c - m / 10.0) * (c - m / 10.0) / (m / 10.0), 9
    ).cast("decimal(20,9)")
    return (
        bins.join(F.broadcast(tot))
        .select(
            c.alias("n_obs"),
            F.col("bin").alias("decile"),
            F.round(c / m.cast("double"), 6).alias("share"),
            F.round(F.sum(chi_term).over(wall).cast("double"), 6)
            .alias("chi2_uniformity"),
        )
        .select("decile", "n_obs", "share", "chi2_uniformity")
        .orderBy("decile")
    )


# -- q_oos_detector ----------------------------------------------------
#
# Out-of-stock detector: per brand, the LONGEST run of zero-sales
# days on the zero-filled calendar grid vs the expected longest zero
# run under independence, E[L] ~ ln(n) / ln(1/q) with q the empirical
# zero-day share (the Erdos-Renyi longest-run law) — a zero streak
# far beyond expectation marks availability gaps, not demand noise,
# which no mean/variance monitor (q_p_chart, q_xmr_chart) can see.
# Runs come from the gaps-and-islands double-rank trick on exact
# integers; the expectation is one double chain; brands that never
# miss a day report NULL expectation (no zero days).

OOS_SQL = """
WITH f AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS d
  FROM lineitem JOIN part ON p_partkey = l_partkey
), days AS (
  SELECT UNNEST(generate_series((SELECT MIN(d) FROM f),
                                (SELECT MAX(d) FROM f),
                                INTERVAL 1 DAY))::DATE AS day
), brands AS (SELECT DISTINCT p_brand FROM f),
sold AS (SELECT DISTINCT p_brand, d FROM f),
grid AS (
  SELECT b.p_brand, dd.day,
         CASE WHEN s.d IS NULL THEN 1 ELSE 0 END AS zero
  FROM brands b CROSS JOIN days dd
  LEFT JOIN sold s ON s.p_brand = b.p_brand AND s.d = dd.day
), runs AS (
  SELECT p_brand, zero,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY day)
           - ROW_NUMBER() OVER (PARTITION BY p_brand, zero
                                ORDER BY day) AS grp
  FROM grid
), runlen AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS len
  FROM runs WHERE zero = 1 GROUP BY p_brand, grp
), agg AS (
  SELECT g.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(zero) AS BIGINT) AS zero_days,
         COALESCE((SELECT MAX(len) FROM runlen r
                   WHERE r.p_brand = g.p_brand), 0) AS longest_zero_run
  FROM grid g GROUP BY 1
)
SELECT p_brand, n_days, zero_days,
       CAST(longest_zero_run AS BIGINT) AS longest_zero_run,
       round(CASE WHEN zero_days > 0 AND zero_days < n_days
                  THEN ln(CAST(n_days AS DOUBLE))
                       / ln(CAST(n_days AS DOUBLE) / zero_days) END, 4)
         AS expected_longest_run,
       CAST(CASE WHEN zero_days > 0 AND zero_days < n_days
                  AND longest_zero_run
                      > 2 * ln(CAST(n_days AS DOUBLE))
                        / ln(CAST(n_days AS DOUBLE) / zero_days)
            THEN 1 ELSE 0 END AS BIGINT) AS oos_flag
FROM agg
ORDER BY p_brand
"""


@query("q_oos_detector", oracle=OOS_SQL)
def q_oos_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select("p_brand", F.col("l_shipdate").cast("date").alias("d"))
    bounds = f.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    brands = f.select("p_brand").distinct()
    sold = f.distinct().select("p_brand", F.col("d").alias("sd"))
    grid = (
        brands.crossJoin(F.broadcast(days))
        .join(
            sold,
            (sold["p_brand"] == brands["p_brand"])
            & (F.col("sd") == F.col("day")),
            "left",
        )
        .select(
            brands["p_brand"].alias("p_brand"),
            "day",
            F.when(F.col("sd").isNull(), 1).otherwise(0).alias("zero"),
        )
        .localCheckpoint()
    )
    wb = Window.partitionBy("p_brand").orderBy("day")
    wbz = Window.partitionBy("p_brand", "zero").orderBy("day")
    runs = grid.select(
        "p_brand", "zero",
        (F.row_number().over(wb) - F.row_number().over(wbz)).alias("grp"),
    )
    runlen = (
        runs.filter(F.col("zero") == 1)
        .groupBy("p_brand", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
        .groupBy("p_brand")
        .agg(F.max("len").alias("longest"))
    )
    agg = (
        grid.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("zero").cast("bigint").alias("zero_days"),
        )
        .join(runlen, "p_brand", "left")
        .select(
            "p_brand", "n_days", "zero_days",
            F.coalesce("longest", F.lit(0)).cast("bigint")
            .alias("longest_zero_run"),
        )
    )
    n, z = F.col("n_days"), F.col("zero_days")
    ok = (z > 0) & (z < n)
    exp_run = F.log(n.cast("double")) / F.log(n.cast("double") / z)
    return agg.select(
        "p_brand", "n_days", "zero_days", "longest_zero_run",
        F.round(F.when(ok, exp_run), 4).alias("expected_longest_run"),
        F.when(ok & (F.col("longest_zero_run") > 2 * exp_run), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("oos_flag"),
    ).orderBy("p_brand")
