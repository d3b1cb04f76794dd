"""SURVEY §2.A additions (round 5, fourth session) — time-series
analytics over the events stream: EWMA smoothing, lag/rolling feature
engineering, variance-band outlier flags, and CUSUM changepoint
detection (all oracle-verified).

Cross-engine determinism: every statistic here is computed in EXACT
decimal arithmetic end-to-end — EWMA weights are finite powers of 1/2
(exact decimals), the Bollinger-style band test is multiplied through
by n so it needs neither a division nor a sqrt, and the CUSUM statistic
is maximized in its n-scaled integer form |n·P_t − t·S|. The only
floating-point steps are single final divisions/rounds performed
identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query

# Shared daily grid: the events fact stream collapses to the tiny
# |event_type × day| grid with one partial-aggregated groupBy; every
# window below runs over that grid, never the raw stream. Revenue
# stays DECIMAL(18,2) (exact, order-independent) until final output.
_DAILY_SQL = """
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS rev
  FROM events GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )


# -- q_ewma ------------------------------------------------------------
#
# Exponentially weighted moving average of daily revenue per event
# type: finite-horizon EWMA (8 terms, alpha = 1/2), i.e.
# ewma_t = Σ_{j=0..7} (1/2)^j · x_{t−j} / Σ_{j present} (1/2)^j.
# Powers of 1/2 are EXACT decimals, so numerator and denominator are
# exact on both engines; one double division at the end. Scale shape:
# the 7 lags share one window sort over the daily grid.

# (1/2)^j as exact decimal literals: 1.0, 0.5, 0.25, ... 0.0078125
_EWMA_WEIGHTS = ["1.0000000", "0.5000000", "0.2500000", "0.1250000",
                 "0.0625000", "0.0312500", "0.0156250", "0.0078125"]

_EWMA_NUM = " + ".join(
    f"COALESCE(r{j}, CAST(0 AS DECIMAL(18,2))) * CAST({w} AS DECIMAL(9,7))"
    for j, w in enumerate(_EWMA_WEIGHTS)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN r{j} IS NULL THEN CAST(0 AS DECIMAL(9,7)) "
    f"ELSE CAST({w} AS DECIMAL(9,7)) END)"
    for j, w in enumerate(_EWMA_WEIGHTS)
)

def ewma_cols() -> tuple:
    """(numerator, denominator) columns of the finite-horizon EWMA
    fold — the exact-decimal kernel shared by q_ewma and the
    streaming EWMA state sink. Expects lag columns ``r0``..``r7``
    (r0 = current value) in scope; missing lags contribute nothing
    to either side."""
    return F.expr(_EWMA_NUM), F.expr(_EWMA_DEN)


EWMA_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
lagged AS (
  SELECT event_type, day, rev AS r0,
         {", ".join(f"LAG(rev, {j}) OVER (PARTITION BY event_type ORDER BY day) AS r{j}" for j in range(1, 8))}
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(r0 AS DOUBLE) AS revenue,
       round(CAST({_EWMA_NUM} AS DOUBLE) /
             CAST({_EWMA_DEN} AS DOUBLE), 6) AS ewma
FROM lagged
"""


@query("q_ewma", oracle=EWMA_SQL)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        F.col("rev").alias("r0"),
        *[F.lag("rev", j).over(w).alias(f"r{j}") for j in range(1, 8)],
    )
    return lagged.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("r0").cast("double").alias("revenue"),
        F.round(
            F.expr(_EWMA_NUM).cast("double") / F.expr(_EWMA_DEN).cast("double"),
            6,
        ).alias("ewma"),
    )


# -- q_lag_features ----------------------------------------------------
#
# Time-series feature engineering for model training: per event type
# and day, the revenue with 1-back and 7-back lag features (observed
# periods) plus a 28-calendar-day rolling sum/count via a RANGE window
# over the integer day index — the standard lag/rolling feature block
# a forecasting pipeline materializes. All sums exact decimal; dates
# anchor to the dataset epoch so the index is reproducible.

LAGF_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT event_type, day, rev,
         date_diff('day', DATE '2024-01-01', day) AS di
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(LAG(rev, 1) OVER w AS DOUBLE) AS lag_1,
       CAST(LAG(rev, 7) OVER w AS DOUBLE) AS lag_7,
       CAST(SUM(rev) OVER r28 AS DOUBLE) AS roll28_rev,
       CAST(COUNT(*) OVER r28 AS BIGINT) AS roll28_days
FROM idx
WINDOW w AS (PARTITION BY event_type ORDER BY di),
       r28 AS (PARTITION BY event_type ORDER BY di
               RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
"""


@query("q_lag_features", oracle=LAGF_SQL)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily(spark, sf_dir).withColumn(
        "di", F.datediff("day", F.lit("2024-01-01"))
    )
    w = Window.partitionBy("event_type").orderBy("di")
    r28 = w.rangeBetween(-27, 0)
    return idx.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.lag("rev", 1).over(w).cast("double").alias("lag_1"),
        F.lag("rev", 7).over(w).cast("double").alias("lag_7"),
        F.sum("rev").over(r28).cast("double").alias("roll28_rev"),
        F.count(F.lit(1)).over(r28).cast("bigint").alias("roll28_days"),
    )


# -- q_bollinger_flags -------------------------------------------------
#
# Rolling variance-band outlier flags (Bollinger-style, 7-day trailing
# window): flag days where |x − mean| > 2σ. The test is multiplied
# through by n² so it is pure exact-decimal integer arithmetic —
#   (n·x − S)² > 4·(n·Q − S²),  S = Σx, Q = Σx² over the frame —
# no division, no sqrt, hence bit-identical across engines and
# partition counts. (At petabyte daily magnitudes Q would outgrow
# DECIMAL(24,4); production would widen the cast or switch to a
# Welford double pass — the FLAG, not the variance, is the contract.)

BOLL_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
st AS (
  SELECT event_type, day, rev,
         CAST(SUM(rev) OVER f AS DECIMAL(19,2)) AS s,
         CAST(SUM(rev * rev) OVER f AS DECIMAL(24,4)) AS q,
         CAST(COUNT(*) OVER f AS DECIMAL(2,0)) AS nw
  FROM daily
  WINDOW f AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(nw AS BIGINT) AS window_days,
       CAST(CASE WHEN CAST(nw * rev - s AS DECIMAL(19,2))
                      * CAST(nw * rev - s AS DECIMAL(19,2))
                > 4 * (CAST(nw * q AS DECIMAL(26,4))
                       - CAST(s * s AS DECIMAL(26,4)))
            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM st
"""


@query("q_bollinger_flags", oracle=BOLL_SQL)
def q_bollinger_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    st = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        "rev",
        F.sum("rev").over(f).cast("decimal(18,2)").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).over(f)
        .cast("decimal(24,4)")
        .alias("q"),
        F.count(F.lit(1)).over(f).cast("decimal(2,0)").alias("nw"),
    )
    d = (F.col("nw") * F.col("rev") - F.col("s")).cast("decimal(18,2)")
    lhs = d * d
    rhs = 4 * (
        (F.col("nw") * F.col("q")).cast("decimal(26,4)")
        - (F.col("s") * F.col("s")).cast("decimal(26,4)")
    )
    return st.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.col("nw").cast("bigint").alias("window_days"),
        F.when(lhs > rhs, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_outlier"),
    )


# -- q_changepoint -----------------------------------------------------
#
# CUSUM changepoint detection per event type: the day t maximizing the
# cumulative deviation from the series mean, |Σ_{i≤t} x_i − t·μ|. The
# statistic is maximized in its n-scaled form |n·P_t − t·S| (P = prefix
# sum, S = total) — exact decimal, so the argmax and its tie-break
# (earliest day) are engine- and partition-deterministic; μ-scale
# CUSUM is recovered by one final double division. Scale shape: one
# grid groupBy, one window sort per event type, top-1 row filter.

CHG_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
st AS (
  SELECT event_type, day,
         CAST(SUM(rev) OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS DECIMAL(19,2)) AS p,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         CAST(SUM(rev) OVER (PARTITION BY event_type) AS DECIMAL(19,2)) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), scored AS (
  SELECT event_type, day, n,
         abs(CAST(n * p - t * s AS DECIMAL(28,2))) AS stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(CAST(n * p - t * s AS DECIMAL(28,2))) DESC,
                                     day) AS rk
  FROM st
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
       CAST(n AS BIGINT) AS n_days,
       round(CAST(stat AS DOUBLE) / n, 2) AS cusum
FROM scored WHERE rk = 1
"""


@query("q_changepoint", oracle=CHG_SQL)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    st = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        F.sum("rev")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(18,2)")
        .alias("p"),
        F.row_number().over(wo).alias("t"),
        F.sum("rev").over(wp).cast("decimal(18,2)").alias("s"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    stat = F.abs(
        (F.col("n") * F.col("p") - F.col("t") * F.col("s")).cast(
            "decimal(28,2)"
        )
    )
    scored = st.select(
        "event_type",
        "day",
        "n",
        stat.alias("stat"),
        F.row_number()
        .over(wp.orderBy(stat.desc(), "day"))
        .alias("rk"),
    )
    return scored.filter(F.col("rk") == 1).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("stat").cast("double") / F.col("n"), 2).alias("cusum"),
    )


# -- q_purchase_intervals ----------------------------------------------
#
# Inter-purchase interval distribution: per customer, the day gaps
# between consecutive orders (lag window keyed by customer — the
# natural shuffle key, millions of small partitions at scale), rolled
# into a weekly-bucket histogram with the exact mean gap per bucket.
# Pure integer arithmetic; ties inside a day break on order key so the
# sequence is engine-deterministic.

PURCH_SQL = """
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, o_orderkey,
         LAG(CAST(o_orderdate AS DATE)) OVER
           (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
            o_orderkey) AS prev_day
  FROM orders
), gaps AS (
  SELECT date_diff('day', prev_day, day) AS gap
  FROM seq WHERE prev_day IS NOT NULL
)
SELECT CAST(LEAST(gap // 7, 12) AS BIGINT) AS week_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       round(CAST(SUM(gap) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS avg_gap_days
FROM gaps GROUP BY 1
"""


@query("q_purchase_intervals", oracle=PURCH_SQL)
def q_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("day"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        o.select(F.datediff("day", F.lag("day").over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy(
            F.least(F.floor(F.col("gap") / 7), F.lit(12))
            .cast("bigint")
            .alias("week_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.sum("gap").cast("bigint")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_gap_days"),
        )
    )


# -- q_calendar_heatmap ------------------------------------------------
#
# Day-of-week × hour activity heatmap over events — the 7×24 usage
# grid behind every traffic dashboard. One scan partial-aggregates
# straight onto the fixed 168-cell grid; shares are single double
# divisions against a 1-row broadcast total. Day-of-week is ISO
# (1=Monday) via the same date arithmetic on both engines.

CAL_SQL = """
WITH g AS (
  SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM events GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow, hour, CAST(n AS BIGINT) AS n, revenue,
       round(n / CAST((SELECT SUM(n) FROM g) AS DOUBLE), 6) AS share
FROM g
"""


@query("q_calendar_heatmap", oracle=CAL_SQL)
def q_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    g = e.groupBy(
        F.dayofweek("ts").alias("_d"), F.hour("ts").cast("bigint").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
    # Spark dayofweek is 1=Sunday; normalize to ISO 1=Monday..7=Sunday
    iso = F.when(F.col("_d") == 1, F.lit(7)).otherwise(F.col("_d") - 1)
    total = g.agg(F.sum("n").cast("double").alias("tot"))
    return g.join(F.broadcast(total)).select(
        iso.cast("bigint").alias("dow"),
        "hour",
        F.col("n").cast("bigint").alias("n"),
        "revenue",
        F.round(F.col("n") / F.col("tot"), 6).alias("share"),
    )


# -- q_growth_accounting -----------------------------------------------
#
# Daily growth accounting over user activity — the new / retained /
# resurrected / churned decomposition every growth dashboard runs.
# Scale shape: the event stream collapses to distinct (user, day)
# once; the per-user lag window runs on the user shuffle key; the
# final grid is |days|. Churn on day d is yesterday's actives minus
# today's retained, reported only when the previous calendar day is
# in the grid (NULL otherwise — identical convention both engines).
# Pure integer arithmetic.

GROWTH_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), tagged AS (
  SELECT day,
         CASE WHEN LAG(day) OVER w IS NULL THEN 'new'
              WHEN LAG(day) OVER w = day - 1 THEN 'retained'
              ELSE 'resurrected' END AS kind
  FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)
), per AS (
  SELECT day,
         CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM tagged GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_new, n_retained,
       n_resurrected, n_active,
       CASE WHEN LAG(day) OVER (ORDER BY day) = day - 1
            THEN LAG(n_active) OVER (ORDER BY day) - n_retained
            END AS n_churned
FROM per
"""


@query("q_growth_accounting", oracle=GROWTH_SQL)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("day").over(w)
    tagged = ud.select(
        "day",
        F.when(prev.isNull(), F.lit("new"))
        .when(prev == F.date_sub("day", 1), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("kind"),
    )
    per = tagged.groupBy("day").agg(
        F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
        .cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("kind") == "retained", 1).otherwise(0))
        .cast("bigint").alias("n_retained"),
        F.sum(F.when(F.col("kind") == "resurrected", 1).otherwise(0))
        .cast("bigint").alias("n_resurrected"),
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
    )
    wd = Window.orderBy("day")
    return per.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_active",
        F.when(
            F.lag("day").over(wd) == F.date_sub("day", 1),
            F.lag("n_active").over(wd) - F.col("n_retained"),
        ).alias("n_churned"),
    )


# -- q_forecast_linear -------------------------------------------------
#
# Per-series linear-trend forecast: OLS of daily revenue on the day
# index from exact decimal/integer moments (the mlstats pattern),
# extrapolated 7 days past the series end. Only slope/intercept/
# forecast divisions are double, in identical expression shape on
# both engines. The den==0 NULL guard fires for single-observation
# series (constant revenue does NOT zero the denominator — it
# depends only on the day indices, so constants fit slope 0).

FCST_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT event_type, date_diff('day', DATE '2024-01-01', day) AS di, rev
  FROM daily
), m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(di) AS BIGINT) AS sx,
         CAST(SUM(rev) AS DECIMAL(19,2)) AS sy,
         CAST(SUM(di * rev) AS DECIMAL(30,2)) AS sxy,
         CAST(SUM(di * di) AS BIGINT) AS sxx,
         MAX(di) AS max_di
  FROM idx GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round((CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 6)
         END AS intercept,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         round(((CAST(sy AS DOUBLE)
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n)
               + (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) * (max_di + 7), 6)
         END AS forecast_7d
FROM m
"""


@query("q_forecast_linear", oracle=FCST_SQL)
def q_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily(spark, sf_dir).select(
        "event_type",
        F.datediff("day", F.lit("2024-01-01")).alias("di"),
        "rev",
    )
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("di").cast("bigint").alias("sx"),
        F.sum("rev").cast("decimal(19,2)").alias("sy"),
        F.sum(F.col("di") * F.col("rev")).cast("decimal(30,2)").alias("sxy"),
        F.sum(F.col("di") * F.col("di")).cast("bigint").alias("sxx"),
        F.max("di").alias("max_di"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_d = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / den.cast("double")
    )
    intercept_d = (
        F.col("sy").cast("double") - slope_d * F.col("sx")
    ) / F.col("n")
    ok = den != 0
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.when(ok, F.round(slope_d, 6)).alias("slope"),
        F.when(ok, F.round(intercept_d, 6)).alias("intercept"),
        F.when(
            ok, F.round(intercept_d + slope_d * (F.col("max_di") + 7), 6)
        ).alias("forecast_7d"),
    )


# -- q_seasonality -----------------------------------------------------
#
# Day-of-week seasonal indices per series: average daily revenue per
# ISO weekday over the overall average daily revenue — the seasonal
# decomposition a forecaster multiplies back into the trend. Both
# averages are exact-decimal-sum / count in one double division; the
# index is their ratio, rounded.

SEAS_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
tot AS (
  SELECT event_type,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS overall_avg
  FROM daily GROUP BY 1
)
SELECT daily.event_type, CAST(isodow(day) AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 6) AS dow_avg,
       round((CAST(SUM(rev) AS DOUBLE) / COUNT(*)) / MIN(overall_avg), 6)
         AS seasonal_idx
FROM daily JOIN tot ON daily.event_type = tot.event_type
GROUP BY 1, 2
"""


@query("q_seasonality", oracle=SEAS_SQL)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    tot = daily.groupBy("event_type").agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("overall_avg")
    )
    iso = F.when(F.dayofweek("day") == 1, F.lit(7)).otherwise(
        F.dayofweek("day") - 1
    )
    return (
        daily.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", iso.cast("bigint").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.sum("rev").cast("double") / F.count(F.lit(1)), 6)
            .alias("dow_avg"),
            F.round(
                (F.sum("rev").cast("double") / F.count(F.lit(1)))
                / F.min("overall_avg"),
                6,
            ).alias("seasonal_idx"),
        )
    )


# -- q_mad_outliers ----------------------------------------------------
#
# Robust (median-absolute-deviation) outlier flags per series: flag
# days whose daily revenue deviates from the series MEDIAN by more
# than 3×MAD — the outlier test that, unlike the z-score
# (q_anomaly_zscore) or variance bands (q_bollinger_flags), is itself
# immune to the outliers it hunts (50% breakdown point). Scale shape:
# two exact-percentile aggregations over the tiny |event_type × day|
# grid (never the raw stream), each broadcast back. Determinism:
# median/MAD are round(quantile_cont, 2) — F.percentile and DuckDB
# quantile_cont interpolate identically (the q_winsorize convention)
# — and the flag compares the same double expression on both engines.

MAD_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
m AS (
  SELECT event_type, round(quantile_cont(CAST(rev AS DOUBLE), 0.5), 2) AS med
  FROM daily GROUP BY 1
), d AS (
  SELECT daily.event_type, daily.day, daily.rev, m.med,
         abs(CAST(rev AS DOUBLE) - m.med) AS dev
  FROM daily JOIN m ON daily.event_type = m.event_type
), md AS (
  SELECT event_type, round(quantile_cont(dev, 0.5), 2) AS mad
  FROM d GROUP BY 1
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.rev AS DOUBLE) AS revenue, d.med, md.mad,
       CAST(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM d JOIN md ON d.event_type = md.event_type
"""


@query("q_mad_outliers", oracle=MAD_SQL)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    m = daily.groupBy("event_type").agg(
        F.round(F.percentile(F.col("rev").cast("double"), F.lit(0.5)), 2)
        .alias("med")
    )
    d = daily.join(F.broadcast(m), "event_type").withColumn(
        "dev", F.abs(F.col("rev").cast("double") - F.col("med"))
    )
    md = d.groupBy("event_type").agg(
        F.round(F.percentile("dev", F.lit(0.5)), 2).alias("mad")
    )
    return d.join(F.broadcast(md), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        "med",
        "mad",
        F.when(F.col("dev") > 3 * F.col("mad"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_outlier"),
    )


# -- q_rolling_actives -------------------------------------------------
#
# Trailing-7-day distinct active users per day (the WAU-by-day ops
# metric). Rolling DISTINCT cannot ride a plain window aggregate, so
# the scalable rewrite is coverage expansion: collapse the stream to
# the distinct (user, day) grid ONCE, explode each user-day to the ≤7
# calendar days it covers (a bounded 7× generate of the grid — far
# below the raw stream), and count distinct users per covered day,
# keeping only observed days (broadcast |days| list). All integer/date
# arithmetic — deterministic by construction.

ROLL_ACT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cover AS (
  SELECT user_id, day + CAST(off AS INTEGER) AS rday
  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS off) s
), days AS (SELECT DISTINCT day FROM ud)
SELECT strftime(c.rday, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS actives_7d
FROM cover c JOIN days d ON c.rday = d.day
GROUP BY 1
"""


@query("q_rolling_actives", oracle=ROLL_ACT_SQL)
def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    cover = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.date_add("day", F.col("off")).alias("rday"))
    days = ud.select("day").distinct()
    return (
        cover.join(F.broadcast(days), cover.rday == days.day)
        .groupBy(F.date_format("rday", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("actives_7d"))
    )


# -- q_dau_mau ---------------------------------------------------------
#
# DAU / MAU stickiness per day — the engagement ratio every growth
# dashboard tracks (what fraction of the trailing-28-day audience
# showed up today). Same bounded coverage-expansion rewrite as
# q_rolling_actives (rolling DISTINCT without a window): the distinct
# (user,day) grid expands ≤28× (still far below the raw stream),
# distinct-counts per covered observed day, and joins the per-day DAU
# off the same grid. All integer/date arithmetic; one final rounded
# division.

DAU_MAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
), cover AS (
  SELECT user_id, day + CAST(off AS INTEGER) AS rday
  FROM ud CROSS JOIN (SELECT unnest(range(0, 28)) AS off) s
), mau AS (
  SELECT c.rday AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
  FROM cover c JOIN (SELECT DISTINCT day FROM ud) d ON c.rday = d.day
  GROUP BY 1
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
       round(dau.dau / CAST(mau.mau AS DOUBLE), 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
"""


@query("q_dau_mau", oracle=DAU_MAU_SQL)
def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off"),
        "day",
    ).select("user_id", F.date_add("day", F.col("off")).alias("rday"))
    days = ud.select("day").distinct()
    mau = (
        cover.join(F.broadcast(days), cover.rday == days.day)
        .groupBy(F.col("rday").alias("mday"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return (
        dau.join(mau, dau.day == mau.mday)
        .select(
            F.date_format(dau.day, "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )


# -- q_runs_test -------------------------------------------------------
#
# Wald–Wolfowitz runs test per series: is daily revenue randomly
# scattered around its median, or does it trend/cluster? (The
# randomness diagnostic behind the ACF — too few runs = persistence,
# too many = oscillation.) Days equal to the median are excluded per
# the standard test. Scale shape: everything runs on the collapsed
# |event_type × day| grid — exact-percentile median broadcast back,
# one lag window per type for the run count, integer n/n1/n2/R.
# Determinism: counts are exact integers; μ, σ and z use identical
# double expression shapes on both engines with a single round(…,6);
# one-sided series (n1·n2 = 0) yield NULL z on both engines.

RUNS_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
med AS (
  SELECT event_type,
         round(quantile_cont(CAST(rev AS DOUBLE), 0.5), 2) AS med
  FROM daily GROUP BY 1
), s AS (
  SELECT daily.event_type, day,
         CASE WHEN CAST(rev AS DOUBLE) > med THEN 1
              WHEN CAST(rev AS DOUBLE) < med THEN 0 END AS sgn
  FROM daily JOIN med ON daily.event_type = med.event_type
  WHERE CAST(rev AS DOUBLE) != med
), r AS (
  SELECT event_type, sgn,
         CASE WHEN LAG(sgn) OVER (PARTITION BY event_type ORDER BY day)
                   IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS brk
  FROM s
), agg AS (
  SELECT event_type,
         CAST(SUM(brk) AS BIGINT) AS runs,
         CAST(SUM(sgn) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM r GROUP BY 1
)
SELECT event_type, runs, n1, n2,
       CASE WHEN n1 * n2 > 0 AND n > 1 AND 2.0 * n1 * n2 > n THEN
         round((runs - (1 + 2.0 * n1 * n2 / n))
               / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                      / (1.0 * n * n * (n - 1))), 6)
       END AS z
FROM agg
"""


@query("q_runs_test", oracle=RUNS_SQL)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    med = daily.groupBy("event_type").agg(
        F.round(F.percentile(F.col("rev").cast("double"), F.lit(0.5)), 2)
        .alias("med")
    )
    rev_d = F.col("rev").cast("double")
    s = (
        daily.join(F.broadcast(med), "event_type")
        .filter(rev_d != F.col("med"))
        .select(
            "event_type",
            "day",
            F.when(rev_d > F.col("med"), F.lit(1))
            .when(rev_d < F.col("med"), F.lit(0))
            .alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    # first row: LAG is NULL, IS DISTINCT FROM sgn → counts as a break,
    # so SUM(brk) directly equals the run count (no +1 needed)
    r = s.select(
        "event_type",
        "sgn",
        F.when(
            ~F.lag("sgn").over(w).eqNullSafe(F.col("sgn")), F.lit(1)
        ).otherwise(F.lit(0)).alias("brk"),
    )
    agg = r.groupBy("event_type").agg(
        F.sum("brk").cast("bigint").alias("runs"),
        F.sum("sgn").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("sgn")).cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    n, n1, n2, runs = (F.col(c) for c in ("n", "n1", "n2", "runs"))
    mu = 1 + 2.0 * n1 * n2 / n
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (1.0 * n * n * (n - 1))
    return agg.select(
        "event_type", "runs", "n1", "n2",
        # 2*n1*n2 > n keeps the variance strictly positive: at n1=n2=1
        # (n=2) it is exactly 0 and Spark's non-ANSI /0 → NULL while
        # DuckDB's IEEE /0 → inf would diverge from the oracle.
        F.when(
            (n1 * n2 > 0) & (n > 1) & (2.0 * n1 * n2 > n),
            F.round((runs - mu) / F.sqrt(var), 6),
        ).alias("z"),
    )


# -- q_cusum_control ---------------------------------------------------
#
# One-sided CUSUM control chart over daily revenue per event type —
# the sequential monitoring twin of q_changepoint's retrospective
# argmax: S_t = max(0, S_{t-1} + x_t − μ − κ) with allowance
# κ = 0.5σ and decision interval h = 4σ. The recursive fold has the
# closed form S_t = max(0, P_t − min(0, min_{j<t} P_j)) over the
# prefix sums P of the allowance-adjusted deviations, so it runs as
# two window passes — no iterative state. Determinism: deviations,
# prefix sums and running minima are EXACT DECIMAL end-to-end (μ and
# κ are rounded to 2 decimals before subtraction); σ comes from exact
# decimal moments with one sqrt. Shape: everything after the daily
# collapse is |types × days|-grid sized.
#
# Decimal-headroom audit (r9): the prefix-sum operand dv is
# (19,2)-(18,2)-(18,2) -> (21,2), so the unbounded running SUM widens
# to (31,2) — ten digits of headroom over |days| <= ~2466 terms of
# one-day revenue magnitude (~1e11 at SF1000): cumsum <= ~2.5e14
# << 1e29. Same shape as the q_rolling_beta fix (risk.py:664).

CUSUM_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
mom AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(rev) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS sxx
  FROM daily GROUP BY 1
),
params AS (
  SELECT event_type, n,
         CAST(round(CAST(sx AS DOUBLE) / n, 2) AS DECIMAL(18,2)) AS mu,
         CAST(round(0.5 * sqrt((n * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               / (CAST(n AS DOUBLE) * n)), 2)
              AS DECIMAL(18,2)) AS kappa,
         CAST(round(4.0 * sqrt((n * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               / (CAST(n AS DOUBLE) * n)), 2)
              AS DECIMAL(18,2)) AS h
  FROM mom
),
dev AS (
  SELECT d.event_type, d.day, p.h,
         CAST(d.rev AS DECIMAL(19,2)) - p.mu - p.kappa AS dv
  FROM daily d JOIN params p ON d.event_type = p.event_type
),
pre AS (
  SELECT event_type, day, h,
         SUM(dv) OVER (PARTITION BY event_type ORDER BY day) AS pt
  FROM dev
),
st AS (
  SELECT event_type, day, h, pt,
         COALESCE(MIN(pt) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING),
                  CAST(0 AS DECIMAL(38,2))) AS mp
  FROM pre
),
-- DuckDB least/greatest degrade DECIMAL to DOUBLE, so the clamps are
-- CASE expressions to keep the arithmetic exact end-to-end
sp AS (
  SELECT event_type, day, h,
         pt - (CASE WHEN mp < 0 THEN mp ELSE CAST(0 AS DECIMAL(38,2)) END)
           AS raw
  FROM st
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(CASE WHEN raw > 0 THEN raw
                 ELSE CAST(0 AS DECIMAL(38,2)) END AS DOUBLE) AS s_plus,
       CAST(CASE WHEN (CASE WHEN raw > 0 THEN raw
                            ELSE CAST(0 AS DECIMAL(38,2)) END) > h
                 THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM sp
"""


@query("q_cusum_control", oracle=CUSUM_SQL)
def q_cusum_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("decimal(38,2)").alias("sx"),
        F.sum(
            F.col("rev").cast("decimal(19,2)") * F.col("rev").cast("decimal(19,2)")
        ).cast("decimal(38,4)").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx").cast("double"), F.col("sxx").cast("double")
    sigma = F.sqrt((n * sxx - sx * sx) / (n.cast("double") * n))
    params = mom.select(
        "event_type", "n",
        F.round(sx / n, 2).cast("decimal(18,2)").alias("mu"),
        F.round(0.5 * sigma, 2).cast("decimal(18,2)").alias("kappa"),
        F.round(4.0 * sigma, 2).cast("decimal(18,2)").alias("h"),
    )
    dev = daily.join(params, "event_type").select(
        "event_type", "day", "h",
        (
            F.col("rev").cast("decimal(19,2)") - F.col("mu") - F.col("kappa")
        ).alias("dv"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    pre = dev.select(
        "event_type", "day", "h", F.sum("dv").over(wo).alias("pt")
    )
    zero = F.lit(0).cast("decimal(38,2)")
    mp = F.coalesce(
        F.min("pt").over(wo.rowsBetween(Window.unboundedPreceding, -1)), zero
    )
    st = pre.select("event_type", "day", "h", "pt", mp.alias("mp"))
    raw = F.col("pt") - F.when(F.col("mp") < 0, F.col("mp")).otherwise(zero)
    s_plus = F.when(raw > 0, raw).otherwise(zero)
    return st.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        s_plus.cast("double").alias("s_plus"),
        F.when(s_plus > F.col("h"), 1).otherwise(0).cast("bigint")
        .alias("alarm"),
    )


# -- q_trend_test ------------------------------------------------------
#
# Mann–Kendall trend test per event type over the daily revenue grid:
# S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance
# Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 and the
# continuity-corrected z — the standard nonparametric "is this series
# trending" gate (complements q_runs_test's randomness check and
# q_forecast_linear's parametric slope). Everything up to the final
# sqrt/division is EXACT integer arithmetic on exact-decimal
# comparisons; the pair join runs on the collapsed |days|-per-type
# grid (n² of ~30, never the raw stream).

MK_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
pairs AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tcorr
  FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, rev) g
  WHERE t > 1 GROUP BY 1
),
stat AS (
  SELECT nn.event_type, nn.n, p.s,
         (nn.n * (nn.n - 1) * (2 * nn.n + 5)
          - COALESCE(ties.tcorr, 0)) / 18.0 AS var_s
  FROM nn JOIN pairs p ON p.event_type = nn.event_type
  LEFT JOIN ties ON ties.event_type = nn.event_type
)
SELECT event_type, n, s,
       CASE WHEN var_s > 0 THEN
         round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                    WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                    ELSE 0.0 END, 6)
       END AS z,
       CAST(CASE WHEN var_s > 0
                  AND abs(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                               WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                               ELSE 0.0 END) > 1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS trending_95
FROM stat
"""


@query("q_trend_test", oracle=MK_SQL)
def q_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(t > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("bigint").alias("tcorr")
        )
    )
    n = F.col("n")
    stat = (
        nn.join(pairs, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type", "n", "s",
            (
                (n * (n - 1) * (2 * n + 5)
                 - F.coalesce(F.col("tcorr"), F.lit(0))) / 18.0
            ).alias("var_s"),
        )
    )
    s, var_s = F.col("s"), F.col("var_s")
    z_raw = (
        F.when(s > 0, (s - 1) / F.sqrt(var_s))
        .when(s < 0, (s + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return stat.select(
        "event_type", "n", "s",
        F.when(var_s > 0, F.round(z_raw, 6)).alias("z"),
        F.when((var_s > 0) & (F.abs(z_raw) > 1.96), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("trending_95"),
    )


# -- q_theilsen --------------------------------------------------------
#
# Theil–Sen robust slope per event type: the median of all pairwise
# day-slopes (x_j − x_i)/(day_j − day_i) — Mann–Kendall's standard
# companion estimator (q_trend_test decides IF there is a trend; this
# says HOW steep, immune to outlier days that wreck the OLS slope of
# q_forecast_linear). Each slope is one double division of an exact
# decimal difference by an exact integer day gap (identical
# cross-engine); the median is the order statistic at ceil(m/2)
# (value-deterministic under ties). Same n²-of-~30 pair grid as the
# trend test — grid-sized, never the raw stream.

THEILSEN_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
slopes AS (
  SELECT a.event_type,
         CAST(b.rev - a.rev AS DOUBLE)
           / date_diff('day', a.day, b.day) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
r AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM slopes
)
SELECT event_type,
       CAST(MAX(m) AS BIGINT) AS n_pairs,
       round(MAX(CASE WHEN rk = CAST(ceil(0.5 * m) AS BIGINT)
                      THEN slope END), 6) AS theilsen_slope
FROM r GROUP BY 1
"""


@query("q_theilsen", oracle=THEILSEN_SQL)
def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    wp = Window.partitionBy("event_type")
    r = slopes.select(
        "event_type", "slope",
        F.row_number().over(wp.orderBy("slope")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("m"),
    )
    return r.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_pairs"),
        F.round(
            F.max(
                F.when(
                    F.col("rk") == F.ceil(0.5 * F.col("m")).cast("bigint"),
                    F.col("slope"),
                )
            ),
            6,
        ).alias("theilsen_slope"),
    )


# -- q_sax_symbols -----------------------------------------------------
#
# SAX (Symbolic Aggregate approXimation, Lin et al. 2003) of the
# daily-revenue series: the time-series indexing/motif primitive that
# compresses a long series to a short symbol word. The daily series
# (exact DECIMAL(18,2) revenue per ship day) is z-normalized with
# population moments from exact decimal sums (Σr and Σr² as
# DECIMAL(37,4) — order-independent, so the only FP steps are the
# identical final divisions/sqrt), PAA-compressed into 16 equal-width
# segments (segment id = floor((i−1)·16/n) in exact double products
# ≪ 2^53), and each segment mean mapped to the 4-symbol alphabet at
# the standard N(0,1) quartile breakpoints ±0.6745. Scale shape: one
# fact scan partial-aggregates to the ~2500-day grid; the ROW_NUMBER
# ordering window is grid-sized (q_gini documented-grid-sort shape);
# everything after touches 16 rows.

SAX_SQL = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(21,4)) AS r
  FROM lineitem GROUP BY 1
), gstat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r) AS DECIMAL(30,4)) AS s,
         CAST(SUM(CAST(CAST(r AS DECIMAL(19,4)) * CAST(r AS DECIMAL(17,4))
                       AS DECIMAL(36,8))) AS DECIMAL(38,8)) AS ssq
  FROM daily
), seg AS (
  SELECT CAST(floor((ROW_NUMBER() OVER (ORDER BY d) - 1) * 16.0
                    / (SELECT n FROM gstat)) AS BIGINT) AS segment_id,
         r
  FROM daily
), paa AS (
  SELECT segment_id,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(r) AS DECIMAL(30,4)) AS sr
  FROM seg GROUP BY 1
)
SELECT segment_id, n_days,
       round((CAST(sr AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ssq AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n),
             6) AS paa_z,
       CASE
         WHEN (CAST(sr AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(ssq AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
              < -0.6745 THEN 'a'
         WHEN (CAST(sr AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(ssq AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
              < 0.0 THEN 'b'
         WHEN (CAST(sr AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(ssq AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
              < 0.6745 THEN 'c'
         ELSE 'd' END AS symbol
FROM paa CROSS JOIN gstat
ORDER BY segment_id
"""


@query("q_sax_symbols", oracle=SAX_SQL)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        # scale 4 preserved (a (.,2) cast would RE-ROUND half-cents
        # where Spark HALF_UP and DuckDB HALF_EVEN disagree); one
        # factor width-19 keeps DuckDB's square off its int64 path
        # while (19,4)×(17,4) stays ≤38 digits so Spark never
        # scale-rounds either
        .cast("decimal(21,4)").alias("r")
    )
    gstat = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("decimal(30,4)").alias("s"),
        F.sum(
            (F.col("r").cast("decimal(19,4)") * F.col("r").cast("decimal(17,4)"))
            .cast("decimal(36,8)")
        ).cast("decimal(38,8)").alias("ssq"),
    )
    seg = daily.join(F.broadcast(gstat)).select(
        F.floor(
            (F.row_number().over(Window.orderBy("d")) - 1)
            * F.lit(16.0) / F.col("n")
        ).cast("bigint").alias("segment_id"),
        "r",
    )
    paa = seg.groupBy("segment_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("r").cast("decimal(30,4)").alias("sr"),
    )
    j = paa.join(F.broadcast(gstat))
    sd = F.col("s").cast("double")
    z = (F.col("sr").cast("double") / F.col("n_days") - sd / F.col("n")) / F.sqrt(
        (F.col("ssq").cast("double") - sd * sd / F.col("n")) / F.col("n")
    )
    return j.select(
        "segment_id", "n_days",
        F.round(z, 6).alias("paa_z"),
        F.when(z < -0.6745, "a")
        .when(z < 0.0, "b")
        .when(z < 0.6745, "c")
        .otherwise("d").alias("symbol"),
    ).orderBy("segment_id")


# -- q_cross_correlation -----------------------------------------------
#
# Lagged cross-correlation between two daily series (does 'click'
# revenue lead 'purchase' revenue, and by how many days?): Pearson r
# of (click_t, purchase_{t+l}) for every lag l = 0..14, computed from
# EXACT decimal moments per lag (n, Σx, Σy, Σxy, Σx², Σy² — the
# q_corr_matrix determinism pattern), with the best lag flagged by
# max |r| (ties → smallest lag). Scale shape: the fact stream
# collapses to the per-type day grid once; the 15 lags come from one
# bounded 15× generate of the ~2500-row grid joined back to itself on
# the shifted day — never a re-scan of the stream per lag.

XCORR_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS rev
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
), x AS (
  SELECT day, rev FROM daily WHERE event_type = 'click'
), y AS (
  SELECT day, rev FROM daily WHERE event_type = 'purchase'
), lags AS (
  SELECT UNNEST(generate_series(0, 14)) AS lag
), m AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x.rev) AS DECIMAL(28,2)) AS sx,
         CAST(SUM(y.rev) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(x.rev * y.rev) AS DECIMAL(38,4)) AS sxy,
         CAST(SUM(x.rev * x.rev) AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(y.rev * y.rev) AS DECIMAL(38,4)) AS syy
  FROM lags l
  JOIN x ON TRUE
  JOIN y ON y.day = x.day + CAST(l.lag AS INTEGER)
  GROUP BY 1
), r AS (
  SELECT lag, n_days,
         round(
           (n_days * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(n_days * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(n_days * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS xcorr
  FROM m
)
SELECT lag AS lag_days, n_days, xcorr,
       CASE WHEN ROW_NUMBER() OVER (ORDER BY abs(xcorr) DESC, lag) = 1
            THEN 1 ELSE 0 END AS is_best_lag
FROM r
ORDER BY lag_days
"""


@query("q_cross_correlation", oracle=XCORR_SQL)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).cast("decimal(19,2)").alias("rev"))
        .localCheckpoint(eager=True)  # x and y both consume the grid
    )
    x = daily.filter(F.col("event_type") == "click").select(
        F.col("day").alias("xday"), F.col("rev").alias("xrev")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("rev").alias("yrev")
    )
    xl = x.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(14))).alias("lag")
    ).withColumn("jday", F.date_add("xday", F.col("lag")))
    m = (
        xl.join(y, xl.jday == y.yday)
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("xrev").cast("decimal(28,2)").alias("sx"),
            F.sum("yrev").cast("decimal(28,2)").alias("sy"),
            F.sum(F.col("xrev") * F.col("yrev")).cast("decimal(38,4)").alias("sxy"),
            F.sum(F.col("xrev") * F.col("xrev")).cast("decimal(38,4)").alias("sxx"),
            F.sum(F.col("yrev") * F.col("yrev")).cast("decimal(38,4)").alias("syy"),
        )
    )
    n = F.col("n_days")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = m.select(
        "lag", "n_days",
        F.round(
            (n * F.col("sxy").cast("double") - sx * sy)
            / (
                F.sqrt(n * F.col("sxx").cast("double") - sx * sx)
                * F.sqrt(n * F.col("syy").cast("double") - sy * sy)
            ),
            6,
        ).alias("xcorr"),
    )
    wb = Window.orderBy(F.desc(F.abs(F.col("xcorr"))), F.asc("lag"))
    return r.select(
        F.col("lag").alias("lag_days"), "n_days", "xcorr",
        F.when(F.row_number().over(wb) == 1, 1).otherwise(0).alias("is_best_lag"),
    ).orderBy("lag_days")


# -- q_stl_lite --------------------------------------------------------
#
# Classical additive decomposition of the daily revenue series per
# event type (the STL-shaped trend/seasonal/residual split behind
# anomaly baselines): trend = centered 7-day moving average (exact
# decimal sum / window count), seasonal = per-day-of-week mean of the
# detrended series, residual = value − trend − seasonal. Detrended
# values round to 6 before the seasonal mean so the per-dow average
# (decimal-cast sum of rounded terms, mr_adamic_adar style) is
# order-independent; every remaining step is one identical double
# expression. Scale shape: the fact stream collapses to the
# per-type day grid once; one ROWS-frame window + one |type × dow|
# groupBy; output trimmed to full 7-day trend windows.

STL_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
tr AS (
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
         CAST(SUM(CAST(detrended AS DECIMAL(18,6))) AS DECIMAL(28,6))
           AS dsum,
         CAST(COUNT(*) AS BIGINT) AS dn
  FROM dt WHERE wn = 7 GROUP BY 1, 2
)
SELECT dt.event_type, strftime(dt.day, '%Y-%m-%d') AS day,
       CAST(dt.rev AS DOUBLE) AS revenue,
       round(dt.trend, 6) AS trend,
       round(CAST(se.dsum AS DOUBLE) / se.dn, 6) AS seasonal,
       round(CAST(dt.rev AS DOUBLE) - dt.trend
             - CAST(se.dsum AS DOUBLE) / se.dn, 6) AS residual
FROM dt JOIN se ON se.event_type = dt.event_type AND se.dow = dt.dow
WHERE dt.wn = 7
ORDER BY dt.event_type, day
"""


@query("q_stl_lite", oracle=STL_SQL)
def q_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
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
    iso = F.when(F.dayofweek("day") == 1, F.lit(7)).otherwise(
        F.dayofweek("day") - 1
    )
    dt = tr.select(
        "event_type", "day", "rev",
        trend.alias("trend"),
        F.round(F.col("rev").cast("double") - trend, 6).alias("detrended"),
        iso.alias("dow"), "wn",
    ).localCheckpoint(eager=True)  # seasonal grid + output both consume
    se = (
        dt.filter(F.col("wn") == 7)
        .groupBy("event_type", "dow")
        .agg(
            F.sum(F.col("detrended").cast("decimal(18,6)"))
            .cast("decimal(28,6)").alias("dsum"),
            F.count(F.lit(1)).cast("bigint").alias("dn"),
        )
    )
    seasonal = F.col("dsum").cast("double") / F.col("dn")
    return (
        dt.filter(F.col("wn") == 7)
        .join(F.broadcast(se), ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("rev").cast("double").alias("revenue"),
            F.round("trend", 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(
                F.col("rev").cast("double") - F.col("trend") - seasonal, 6
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


# -- q_sprt_monitor ----------------------------------------------------
#
# Wald sequential probability-ratio monitor (SPRT) over each event
# type's daily share of traffic: H0 share = the type's pooled share
# p0, H1 = a 20% lift (p1 = 1.2·p0), daily binomial log-likelihood
# increments accumulated in day order, decision boundaries ±ln(19)
# (α = β = 0.05) — the always-valid sequential test a metrics
# platform runs instead of waiting for a fixed-horizon q_ab_test.
# Cross-engine: ln(1.2) and ln(19) are inlined literals; the one
# data-dependent log coefficient rounds to 12 decimals in both
# engines before use, and the cumulative sum is an ORDERED window
# (sequential evaluation order is pinned, so double addition is
# bit-identical). Scale shape: the stream collapses to the
# |type × day| grid; one window sort per type over that grid.

_SPRT_LN12 = 0.1823215567939546
_SPRT_LN19 = 2.9444389791664403

SPRT_SQL = f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
), n AS (
  SELECT day, CAST(SUM(k) AS BIGINT) AS n FROM d GROUP BY 1
), tot AS (
  SELECT event_type, CAST(SUM(k) AS BIGINT) AS kt FROM d GROUP BY 1
), g AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM n),
coef AS (
  SELECT event_type,
         round(ln((1.0 - 1.2 * (kt / CAST(nt AS DOUBLE)))
                  / (1.0 - kt / CAST(nt AS DOUBLE))), 12) AS c2
  FROM tot CROSS JOIN g
), llr AS (
  SELECT d.event_type, d.day,
         SUM(d.k * CAST({_SPRT_LN12} AS DOUBLE)
             + (n.n - d.k) * coef.c2)
           OVER (PARTITION BY d.event_type ORDER BY d.day) AS cum
  FROM d JOIN n ON n.day = d.day
  JOIN coef ON coef.event_type = d.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       round(MAX(CASE WHEN rn = mx THEN cum END), 6) AS final_llr,
       strftime(MIN(CASE WHEN cum >= CAST({_SPRT_LN19} AS DOUBLE)
                         THEN day END), '%Y-%m-%d') AS first_accept_h1,
       strftime(MIN(CASE WHEN cum <= -CAST({_SPRT_LN19} AS DOUBLE)
                         THEN day END), '%Y-%m-%d') AS first_accept_h0,
       CAST(CASE
         WHEN MIN(CASE WHEN cum <= -CAST({_SPRT_LN19} AS DOUBLE)
                       THEN day END) IS NOT NULL THEN 0
         WHEN MIN(CASE WHEN cum >= CAST({_SPRT_LN19} AS DOUBLE)
                       THEN day END) IS NOT NULL THEN 1
         ELSE -1 END AS BIGINT) AS decision
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS mx
  FROM llr
) GROUP BY 1
ORDER BY event_type
"""


@query("q_sprt_monitor", oracle=SPRT_SQL)
def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    ).localCheckpoint(eager=True)  # day totals + per-type joins consume
    n = d.groupBy("day").agg(F.sum("k").cast("bigint").alias("n"))
    tot = d.groupBy("event_type").agg(F.sum("k").cast("bigint").alias("kt"))
    g = n.agg(F.sum("n").cast("bigint").alias("nt"))
    share = F.col("kt") / F.col("nt").cast("double")
    coef = tot.join(F.broadcast(g)).select(
        "event_type",
        F.round(F.log((1.0 - 1.2 * share) / (1.0 - share)), 12).alias("c2"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    llr = (
        d.join(F.broadcast(n), "day")
        .join(F.broadcast(coef), "event_type")
        .select(
            "event_type", "day",
            F.sum(
                F.col("k") * F.lit(_SPRT_LN12)
                + (F.col("n") - F.col("k")) * F.col("c2")
            ).over(w).alias("cum"),
        )
    )
    x = llr.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("mx"),
    )
    up = F.min(
        F.when(F.col("cum") >= _SPRT_LN19, F.col("day"))
    )
    dn = F.min(
        F.when(F.col("cum") <= -_SPRT_LN19, F.col("day"))
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.max(F.when(F.col("rn") == F.col("mx"), F.col("cum"))), 6
            ).alias("final_llr"),
            F.date_format(up, "yyyy-MM-dd").alias("first_accept_h1"),
            F.date_format(dn, "yyyy-MM-dd").alias("first_accept_h0"),
            F.when(dn.isNotNull(), 0)
            .when(up.isNotNull(), 1)
            .otherwise(-1).cast("bigint").alias("decision"),
        )
        .orderBy("event_type")
    )


# -- q_peak_detection --------------------------------------------------
#
# Local-peak detection over the daily revenue series per event type:
# a day is a peak when its revenue STRICTLY exceeds each of the 3
# preceding and 3 following days AND its prominence over the ±3-day
# window floor exceeds 25% of the series' mean level — the
# spike-mining primitive behind promo/incident retrospectives.
# Strictness is 6 explicit lag/lead comparisons on exact decimals
# (ties ⇒ not a peak, deterministic); prominence/threshold are one
# identical double expression. Scale shape: per-type day grid, one
# window sort shared by the lags and the ROWS-frame min, broadcast
# per-type means.

PEAK_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
m AS (
  SELECT event_type,
         CAST(SUM(rev) AS DECIMAL(28,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily GROUP BY 1
), w AS (
  SELECT event_type, day, rev,
         LAG(rev, 1) OVER o AS l1, LAG(rev, 2) OVER o AS l2,
         LAG(rev, 3) OVER o AS l3,
         LEAD(rev, 1) OVER o AS d1, LEAD(rev, 2) OVER o AS d2,
         LEAD(rev, 3) OVER o AS d3,
         CAST(MIN(rev) OVER f AS DECIMAL(19,2)) AS wmin,
         CAST(COUNT(*) OVER f AS BIGINT) AS wn
  FROM daily
  WINDOW o AS (PARTITION BY event_type ORDER BY day),
         f AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT w.event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev - wmin AS DOUBLE), 6) AS prominence,
       CAST(CASE WHEN wn = 7
                      AND rev > l1 AND rev > l2 AND rev > l3
                      AND rev > d1 AND rev > d2 AND rev > d3
                      AND CAST(rev - wmin AS DOUBLE)
                          > 0.25 * (CAST(s AS DOUBLE) / n)
            THEN 1 ELSE 0 END AS BIGINT) AS is_peak
FROM w JOIN m ON m.event_type = w.event_type
ORDER BY w.event_type, day
"""


@query("q_peak_detection", oracle=PEAK_SQL)
def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    m = daily.groupBy("event_type").agg(
        F.sum("rev").cast("decimal(28,2)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    o = Window.partitionBy("event_type").orderBy("day")
    f = o.rowsBetween(-3, 3)
    w = daily.select(
        "event_type", "day", "rev",
        *[F.lag("rev", i).over(o).alias(f"l{i}") for i in (1, 2, 3)],
        *[F.lead("rev", i).over(o).alias(f"d{i}") for i in (1, 2, 3)],
        F.min("rev").over(f).cast("decimal(19,2)").alias("wmin"),
        F.count(F.lit(1)).over(f).cast("bigint").alias("wn"),
    )
    x = w.join(F.broadcast(m), "event_type")
    mean_rev = F.col("s").cast("double") / F.col("n")
    prom = (F.col("rev") - F.col("wmin")).cast("double")
    strict = (F.col("wn") == 7)
    for c in ("l1", "l2", "l3", "d1", "d2", "d3"):
        strict = strict & (F.col("rev") > F.col(c))
    return x.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(prom, 6).alias("prominence"),
        F.when(strict & (prom > 0.25 * mean_rev), 1)
        .otherwise(0).cast("bigint").alias("is_peak"),
    ).orderBy("event_type", "day")


# -- q_forecast_backtest -----------------------------------------------
#
# Rolling-origin forecast backtest (the honest accuracy number — the
# in-sample fit q_forecast_linear reports always flatters): for every
# day t with ≥ 7 prior observations, fit the OLS trend on days < t
# ONLY and score the 1-step-ahead prediction, then roll up MAPE /
# sMAPE / signed bias per series. The expanding-window fit needs no
# per-origin refit pass: all five OLS moments are CUMULATIVE window
# sums (exact — day indexes are integers, revenue is exact decimal)
# with a ROWS frame ending at -1 (strictly prior days), so the whole
# backtest is ONE window sort per series. Per-day error terms round
# to DECIMAL(18,6) before the exact rollup sum. Scale shape: grid
# windows only; nothing re-scans the stream per origin.

BACKTEST_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT event_type, day, rev,
         CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) AS x
  FROM daily
),
c AS (
  SELECT event_type, day, rev, x,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(rev) OVER w AS DECIMAL(28,2)) AS sy,
         CAST(SUM(x * rev) OVER w AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
pred AS (
  SELECT event_type, day, CAST(rev AS DOUBLE) AS actual,
         (CAST(sy AS DOUBLE) / n)
         + ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
           * (x - CAST(sx AS DOUBLE) / n) AS fc
  FROM c
  WHERE n >= 7 AND (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) > 0
),
terms AS (
  SELECT event_type,
         CAST(round(abs(fc - actual) / actual, 6) AS DECIMAL(18,6)) AS ape,
         CAST(round(2.0 * abs(fc - actual) / (abs(fc) + abs(actual)), 6)
              AS DECIMAL(18,6)) AS sape,
         CAST(round((fc - actual) / actual, 6) AS DECIMAL(18,6)) AS bias
  FROM pred
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_evals,
       round(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 6) AS mape,
       round(CAST(SUM(sape) AS DOUBLE) / COUNT(*), 6) AS smape,
       round(CAST(SUM(bias) AS DOUBLE) / COUNT(*), 6) AS mean_bias
FROM terms GROUP BY 1
ORDER BY event_type
"""


@query("q_forecast_backtest", oracle=BACKTEST_SQL)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily(spark, sf_dir).select(
        "event_type", "day", "rev",
        F.datediff("day", F.lit("2024-01-01")).cast("bigint").alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = idx.select(
        "event_type", "day", "rev", "x",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("rev").over(w).cast("decimal(28,2)").alias("sy"),
        F.sum(F.col("x") * F.col("rev")).over(w).cast("decimal(38,2)")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
    )
    n, x = F.col("n"), F.col("x")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = n * F.col("sxx").cast("double") - sxd * F.col("sx")
    slope = (n * F.col("sxy").cast("double") - sxd * syd) / den
    fc = syd / n + slope * (x - sxd / n)
    pred = c.filter((n >= 7) & (den > 0)).select(
        "event_type",
        F.col("rev").cast("double").alias("actual"),
        fc.alias("fc"),
    )
    a, f = F.col("actual"), F.col("fc")
    terms = pred.select(
        "event_type",
        F.round(F.abs(f - a) / a, 6).cast("decimal(18,6)").alias("ape"),
        F.round(2.0 * F.abs(f - a) / (F.abs(f) + F.abs(a)), 6)
        .cast("decimal(18,6)").alias("sape"),
        F.round((f - a) / a, 6).cast("decimal(18,6)").alias("bias"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_evals"),
            F.round(F.sum("ape").cast("double") / F.count(F.lit(1)), 6)
            .alias("mape"),
            F.round(F.sum("sape").cast("double") / F.count(F.lit(1)), 6)
            .alias("smape"),
            F.round(F.sum("bias").cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_bias"),
        )
        .orderBy("event_type")
    )


# -- q_group_sequential ------------------------------------------------
#
# Group-sequential monitoring with O'Brien–Fleming boundaries: the
# regulated-industry standard for peeking at an experiment 4 times
# (information fractions 25/50/75/100%, literal boundary z
# 4.333/2.963/2.359/2.014 — conservative early, near-fixed-sample
# late; the pre-registered-looks alternative to q_sprt_monitor's
# fully-sequential test). Monitored statistic: the purchase share
# vs its first-week baseline p₀, z computed at each look from exact
# cumulative integer counts (one ordered day grid pass → 4 look
# rows). All moments exact; one identical double z per look.

_OBF = [(1, "4.333"), (2, "2.963"), (3, "2.359"), (4, "2.014")]

GST_SQL = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events GROUP BY 1
), base AS (
  SELECT CAST(SUM(k) AS BIGINT) AS k0, CAST(SUM(n) AS BIGINT) AS n0
  FROM d WHERE day < DATE '2024-01-08'
), span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1,
         date_diff('day', MIN(day), MAX(day)) + 1 AS horizon
  FROM d
), looks AS (
  SELECT lk, CAST(CASE {" ".join(f"WHEN lk = {i} THEN {z}" for i, z in _OBF)}
              ELSE NULL END AS DOUBLE) AS boundary_z
  FROM (SELECT UNNEST([1, 2, 3, 4]) AS lk)
), cum AS (
  SELECT looks.lk, looks.boundary_z,
         CAST(SUM(d.n) AS BIGINT) AS n_cum,
         CAST(SUM(d.k) AS BIGINT) AS k_cum
  FROM looks CROSS JOIN span
  JOIN d ON date_diff('day', span.d0, d.day)
            < CAST(ceil(span.horizon * looks.lk / 4.0) AS BIGINT)
  GROUP BY 1, 2
)
SELECT lk AS look, n_cum, k_cum,
       round(k_cum / CAST(n_cum AS DOUBLE), 6) AS share,
       round((k_cum / CAST(n_cum AS DOUBLE) - k0 / CAST(n0 AS DOUBLE))
             / sqrt((k0 / CAST(n0 AS DOUBLE))
                    * (1.0 - k0 / CAST(n0 AS DOUBLE)) / n_cum), 6)
         AS z_look,
       round(boundary_z, 6) AS obf_boundary,
       CAST(CASE WHEN abs((k_cum / CAST(n_cum AS DOUBLE)
                           - k0 / CAST(n0 AS DOUBLE))
                          / sqrt((k0 / CAST(n0 AS DOUBLE))
                                 * (1.0 - k0 / CAST(n0 AS DOUBLE)) / n_cum))
                      > boundary_z
            THEN 1 ELSE 0 END AS BIGINT) AS boundary_crossed
FROM cum CROSS JOIN base
ORDER BY look
"""


@query("q_group_sequential", oracle=GST_SQL)
def q_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint").alias("k"),
    ).localCheckpoint(eager=True)  # baseline, span, looks all consume
    base = d.filter(F.col("day") < F.lit("2024-01-08")).agg(
        F.sum("k").cast("bigint").alias("k0"),
        F.sum("n").cast("bigint").alias("n0"),
    )
    span = d.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("horizon"),
    )
    looks = d.sparkSession.createDataFrame(
        [(i, float(z)) for i, z in _OBF], "lk int, boundary_z double"
    )
    cum = (
        looks.join(F.broadcast(span))
        .join(
            d,
            F.datediff(F.col("day"), F.col("d0"))
            < F.ceil(F.col("horizon") * F.col("lk") / 4.0).cast("bigint"),
        )
        .groupBy("lk", "boundary_z")
        .agg(
            F.sum("n").cast("bigint").alias("n_cum"),
            F.sum("k").cast("bigint").alias("k_cum"),
        )
    )
    j = cum.join(F.broadcast(base))
    p0 = F.col("k0") / F.col("n0").cast("double")
    share = F.col("k_cum") / F.col("n_cum").cast("double")
    z = (share - p0) / F.sqrt(p0 * (1.0 - p0) / F.col("n_cum"))
    return j.select(
        F.col("lk").alias("look"), "n_cum", "k_cum",
        F.round(share, 6).alias("share"),
        F.round(z, 6).alias("z_look"),
        F.round("boundary_z", 6).alias("obf_boundary"),
        F.when(F.abs(z) > F.col("boundary_z"), 1).otherwise(0).cast("bigint")
        .alias("boundary_crossed"),
    ).orderBy("look")


# -- q_xmr_chart -------------------------------------------------------
#
# Individuals / moving-range (XmR) control chart per series — the
# Shewhart SPC chart for one-observation-per-period processes, and
# the pre-CUSUM triage (CUSUM finds small persistent shifts; XmR
# flags single excursions): center = mean daily revenue, limits =
# X̄ ± 2.66·m̄R (the d₂-derived individuals constant), mR = |xₜ −
# xₜ₋₁|. All means from exact decimal sums (revenue and the |diff|
# moving ranges are exact decimals); the limit comparison is one
# identical double expression per day. One window sort per series.

XMR_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
mr AS (
  SELECT event_type, day, rev,
         CAST(abs(rev - LAG(rev) OVER (PARTITION BY event_type
                                       ORDER BY day)) AS DECIMAL(19,2))
           AS mrange
  FROM daily
), lim AS (
  SELECT event_type,
         CAST(SUM(rev) AS DECIMAL(28,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mrange) AS DECIMAL(28,2)) AS smr,
         CAST(COUNT(mrange) AS BIGINT) AS nmr
  FROM mr GROUP BY 1
)
SELECT mr.event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(s AS DOUBLE) / n, 6) AS center,
       round(CAST(s AS DOUBLE) / n
             + 2.66 * CAST(smr AS DOUBLE) / nmr, 6) AS ucl,
       round(CAST(s AS DOUBLE) / n
             - 2.66 * CAST(smr AS DOUBLE) / nmr, 6) AS lcl,
       CAST(CASE WHEN CAST(rev AS DOUBLE)
                      > CAST(s AS DOUBLE) / n
                        + 2.66 * CAST(smr AS DOUBLE) / nmr
                 OR CAST(rev AS DOUBLE)
                      < CAST(s AS DOUBLE) / n
                        - 2.66 * CAST(smr AS DOUBLE) / nmr
            THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM mr JOIN lim ON lim.event_type = mr.event_type
ORDER BY mr.event_type, day
"""


@query("q_xmr_chart", oracle=XMR_SQL)
def q_xmr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    mr = daily.select(
        "event_type", "day", "rev",
        F.abs(F.col("rev") - F.lag("rev").over(w)).cast("decimal(19,2)")
        .alias("mrange"),
    ).localCheckpoint(eager=True)  # limits + per-day rows both consume
    lim = mr.groupBy("event_type").agg(
        F.sum("rev").cast("decimal(28,2)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mrange").cast("decimal(28,2)").alias("smr"),
        F.count("mrange").cast("bigint").alias("nmr"),
    )
    j = mr.join(F.broadcast(lim), "event_type")
    center = F.col("s").cast("double") / F.col("n")
    width = 2.66 * F.col("smr").cast("double") / F.col("nmr")
    rd = F.col("rev").cast("double")
    return j.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        rd.alias("revenue"),
        F.round(center, 6).alias("center"),
        F.round(center + width, 6).alias("ucl"),
        F.round(center - width, 6).alias("lcl"),
        F.when((rd > center + width) | (rd < center - width), 1)
        .otherwise(0).cast("bigint").alias("out_of_control"),
    ).orderBy("event_type", "day")


# -- q_interrupted_ts --------------------------------------------------
#
# Interrupted time-series (segmented regression) around the Jan 16
# intervention: per event type, separate OLS trend fits on the pre
# and post segments of the daily-revenue series, the LEVEL and SLOPE
# changes at the intervention, and the Chow structural-break F
# comparing pooled vs segmented fits — the no-control-group causal
# design that complements q_diff_in_diff. Every segment's five
# moments are exact (day indexes integer, revenue exact decimal);
# slopes, intercepts, SSEs (centered forms from exact moments) and
# F are identical double chains. Scale: one scan to the day grid,
# one 3-way grouped moment pass (pre/post/pooled via a segment tag).

ITS_SPLIT = "2024-01-16"

ITS_SQL = f"""
WITH daily AS ({{_DAILY}}),
idx AS (
  SELECT event_type, rev,
         CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) AS x,
         CASE WHEN day < DATE '{ITS_SPLIT}' THEN 0 ELSE 1 END AS seg
  FROM daily
), m AS (
  SELECT event_type, seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(rev) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(x * rev) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(17,2)))
              AS DECIMAL(38,4)) AS syy
  FROM idx GROUP BY 1, 2
), f AS (
  SELECT event_type, seg, n,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b1,
         CAST(sy AS DOUBLE) / n
           - (n * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
             * (CAST(sx AS DOUBLE) / n) AS b0,
         ((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
          - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
           / CAST(n AS DOUBLE) AS sse
  FROM m
), p AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sx) AS BIGINT) AS sx,
         CAST(SUM(sy) AS DECIMAL(28,2)) AS sy,
         CAST(SUM(sxy) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(syy) AS DECIMAL(38,4)) AS syy
  FROM m GROUP BY 1
), pf AS (
  SELECT event_type,
         ((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
          - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
           / CAST(n AS DOUBLE) AS sse_pooled,
         n AS n_all
  FROM p
), w AS (
  SELECT f.event_type,
         MAX(CASE WHEN seg = 0 THEN b0 END) AS b0_pre,
         MAX(CASE WHEN seg = 0 THEN b1 END) AS b1_pre,
         MAX(CASE WHEN seg = 1 THEN b0 END) AS b0_post,
         MAX(CASE WHEN seg = 1 THEN b1 END) AS b1_post,
         SUM(f.sse) AS sse_seg,
         MAX(pf.sse_pooled) AS sse_pooled,
         MAX(pf.n_all) AS n_all
  FROM f JOIN pf ON pf.event_type = f.event_type
  GROUP BY 1
)
SELECT event_type,
       round(b1_pre, 6) AS slope_pre,
       round(b1_post, 6) AS slope_post,
       round(b1_post - b1_pre, 6) AS slope_change,
       round((b0_post + b1_post * 15.0) - (b0_pre + b1_pre * 15.0), 6)
         AS level_change_at_t0,
       round(((sse_pooled - sse_seg) / 2.0)
             / (sse_seg / (n_all - 4.0)), 6) AS chow_f,
       CAST(CASE WHEN ((sse_pooled - sse_seg) / 2.0)
                      / (sse_seg / (n_all - 4.0)) > 3.0
            THEN 1 ELSE 0 END AS BIGINT) AS structural_break
FROM w
ORDER BY event_type
"""


@query("q_interrupted_ts", oracle=ITS_SQL.replace("{_DAILY}", _DAILY_SQL))
def q_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _daily(spark, sf_dir).select(
        "event_type", "rev",
        F.datediff("day", F.lit("2024-01-01")).cast("bigint").alias("x"),
        (F.col("day") >= F.lit(ITS_SPLIT)).cast("int").alias("seg"),
    )
    ry19 = F.col("rev").cast("decimal(19,2)")
    ry17 = F.col("rev").cast("decimal(17,2)")
    m = idx.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("rev").cast("decimal(28,2)").alias("sy"),
        F.sum(F.col("x") * F.col("rev")).cast("decimal(38,2)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(ry19 * ry17).cast("decimal(38,4)").alias("syy"),
    ).localCheckpoint(eager=True)  # segment fits + pooled both consume

    def fit(df):
        n = F.col("n")
        sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
        sxyd = F.col("sxy").cast("double")
        cxy = n * sxyd - sxd * syd
        cxx = n * F.col("sxx").cast("double") - sxd * F.col("sx")
        cyy = n * F.col("syy").cast("double") - syd * syd
        b1 = cxy / cxx
        b0 = syd / n - b1 * (sxd / n)
        sse = (cyy - cxy * cxy / cxx) / n.cast("double")
        return df.select(
            "*", b1.alias("b1"), b0.alias("b0"), sse.alias("sse")
        )

    f = fit(m)
    p = m.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sy").cast("decimal(28,2)").alias("sy"),
        F.sum("sxy").cast("decimal(38,2)").alias("sxy"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum("syy").cast("decimal(38,4)").alias("syy"),
    )
    pf = fit(p).select(
        "event_type", F.col("sse").alias("sse_pooled"),
        F.col("n").alias("n_all"),
    )
    w = (
        f.join(F.broadcast(pf), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("seg") == 0, F.col("b0"))).alias("b0_pre"),
            F.max(F.when(F.col("seg") == 0, F.col("b1"))).alias("b1_pre"),
            F.max(F.when(F.col("seg") == 1, F.col("b0"))).alias("b0_post"),
            F.max(F.when(F.col("seg") == 1, F.col("b1"))).alias("b1_post"),
            F.sum("sse").alias("sse_seg"),
            F.max("sse_pooled").alias("sse_pooled"),
            F.max("n_all").alias("n_all"),
        )
    )
    chow = ((F.col("sse_pooled") - F.col("sse_seg")) / 2.0) / (
        F.col("sse_seg") / (F.col("n_all") - F.lit(4.0))
    )
    return w.select(
        "event_type",
        F.round("b1_pre", 6).alias("slope_pre"),
        F.round("b1_post", 6).alias("slope_post"),
        F.round(F.col("b1_post") - F.col("b1_pre"), 6).alias("slope_change"),
        F.round(
            (F.col("b0_post") + F.col("b1_post") * 15.0)
            - (F.col("b0_pre") + F.col("b1_pre") * 15.0),
            6,
        ).alias("level_change_at_t0"),
        F.round(chow, 6).alias("chow_f"),
        F.when(chow > 3.0, 1).otherwise(0).cast("bigint")
        .alias("structural_break"),
    ).orderBy("event_type")


# -- q_rolling_corr ----------------------------------------------------
#
# Rolling 14-day correlation between the click and purchase daily
# series: does their coupling DRIFT over time (q_cross_correlation
# gives one global number; regime changes show up only in the
# rolling view)? All five Pearson moments are ROWS-frame window sums
# over the joined day grid — exact decimal/integer, so each day's r
# is one identical double expression; full-window days only. ONE
# window sort over the ~|days| grid.

ROLLCORR_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS rev
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
), j AS (
  SELECT x.day, x.rev AS xv, y.rev AS yv
  FROM (SELECT day, rev FROM daily WHERE event_type = 'click') x
  JOIN (SELECT day, rev FROM daily WHERE event_type = 'purchase') y
    ON y.day = x.day
), c AS (
  SELECT day,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(xv) OVER w AS DECIMAL(28,2)) AS sx,
         CAST(SUM(yv) OVER w AS DECIMAL(28,2)) AS sy,
         CAST(SUM(CAST(xv AS DECIMAL(19,2)) * CAST(yv AS DECIMAL(17,2)))
              OVER w AS DECIMAL(38,4)) AS sxy,
         CAST(SUM(CAST(xv AS DECIMAL(19,2)) * CAST(xv AS DECIMAL(17,2)))
              OVER w AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(yv AS DECIMAL(19,2)) * CAST(yv AS DECIMAL(17,2)))
              OVER w AS DECIMAL(38,4)) AS syy
  FROM j
  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT strftime(day, '%Y-%m-%d') AS day, n AS window_days,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(n * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS rolling_corr
FROM c WHERE n = 14
ORDER BY day
"""


@query("q_rolling_corr", oracle=ROLLCORR_SQL)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).cast("decimal(19,2)").alias("rev"))
        .localCheckpoint(eager=True)
    )
    x = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("rev").alias("xv")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("rev").alias("yv")
    )
    j = x.join(y, x.day == y.yday).select("day", "xv", "yv")
    w = Window.orderBy("day").rowsBetween(-13, 0)
    x19, x17 = F.col("xv").cast("decimal(19,2)"), F.col("xv").cast("decimal(17,2)")
    y19, y17 = F.col("yv").cast("decimal(19,2)"), F.col("yv").cast("decimal(17,2)")
    c = j.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("xv").over(w).cast("decimal(28,2)").alias("sx"),
        F.sum("yv").over(w).cast("decimal(28,2)").alias("sy"),
        F.sum(x19 * y17).over(w).cast("decimal(38,4)").alias("sxy"),
        F.sum(x19 * x17).over(w).cast("decimal(38,4)").alias("sxx"),
        F.sum(y19 * y17).over(w).cast("decimal(38,4)").alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = (n * F.col("sxy").cast("double") - sx * sy) / (
        F.sqrt(n * F.col("sxx").cast("double") - sx * sx)
        * F.sqrt(n * F.col("syy").cast("double") - sy * sy)
    )
    return (
        c.filter(n == 14)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            n.alias("window_days"),
            F.round(r, 6).alias("rolling_corr"),
        )
        .orderBy("day")
    )


# -- q_cointegration ---------------------------------------------------
#
# Engle–Granger two-step cointegration check between the BUILDING
# and MACHINERY segments' daily revenue series: step 1 fits the
# long-run relation y = α + βx by OLS (exact DECIMAL(18,2) daily
# sums, decimal-rounded moment folds); step 2 runs the
# Dickey–Fuller regression Δe_t = ρ·e_{t−1} on the residuals (no
# intercept, no augmentation) and compares the t-statistic to the
# −3.34 Engle–Granger 5% critical value (2 variables, large n).
# q_granger_lite asks who predicts whom at short lags; this asks
# whether the two series share a long-run equilibrium at all — the
# pairs-trading / deflator-choice prerequisite. Determinism: daily
# revenues are exact decimals, residuals one double chain rounded
# to 9 before the lag/diff folds. Scale: facts collapse to the
# |days| grid; the two regressions are grid-sized folds, the lag
# runs on the ordered day grid.

COINT_SQL = """
WITH daily AS (
  SELECT CAST(o.o_orderdate AS DATE) AS d, c.c_mktsegment AS seg,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1, 2
), wide AS (
  SELECT d,
         CAST(MIN(CASE WHEN seg = 'BUILDING' THEN rev END) AS DOUBLE) AS y,
         CAST(MIN(CASE WHEN seg = 'MACHINERY' THEN rev END) AS DOUBLE) AS x
  FROM daily GROUP BY 1
  HAVING MIN(CASE WHEN seg = 'BUILDING' THEN rev END) IS NOT NULL
     AND MIN(CASE WHEN seg = 'MACHINERY' THEN rev END) IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(round(y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx
  FROM wide
), ols AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS alpha
  FROM m WHERE n * sxx - sx * sx > 0
), resid AS (
  SELECT d, round(y - (o.alpha + o.beta * x), 9) AS e
  FROM wide CROSS JOIN ols o
), lagged AS (
  SELECT e - LAG(e) OVER (ORDER BY d) AS de,
         LAG(e) OVER (ORDER BY d) AS el
  FROM resid
), df AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
    CAST(SUM(CAST(round(de * el, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sde,
    CAST(SUM(CAST(round(el * el, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sll
  FROM lagged WHERE el IS NOT NULL
), rho AS (
  SELECT nd, sde / sll AS rho, sll FROM df WHERE sll > 0
), sse AS (
  SELECT r.nd, r.rho, r.sll,
    CAST(SUM(CAST(round((l.de - r.rho * l.el) * (l.de - r.rho * l.el), 6)
         AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM lagged l CROSS JOIN rho r
  WHERE l.el IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT o.n AS n_days, round(o.alpha, 4) AS alpha, round(o.beta, 6) AS beta,
       round(s.rho, 6) AS rho,
       round(s.rho / sqrt((s.s2 / (s.nd - 1)) / s.sll), 6) AS df_stat,
       CAST(CASE WHEN s.rho / sqrt((s.s2 / (s.nd - 1)) / s.sll) < -3.34
                 THEN 1 ELSE 0 END AS BIGINT) AS cointegrated
FROM ols o CROSS JOIN sse s
"""


@query("q_cointegration", oracle=COINT_SQL)
def q_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(
            F.to_date("o_orderdate").alias("d"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    wide = (
        daily.groupBy("d")
        .agg(
            F.min(F.when(F.col("seg") == "BUILDING", F.col("rev")))
            .cast("double").alias("y"),
            F.min(F.when(F.col("seg") == "MACHINERY", F.col("rev")))
            .cast("double").alias("x"),
        )
        .filter(F.col("y").isNotNull() & F.col("x").isNotNull())
    )
    wide = wide.cache()  # consumed by the OLS fold AND the residual pass
    m = wide.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("x", 9).cast("decimal(28,9)")).cast("double").alias("sx"),
        F.sum(F.round("y", 9).cast("decimal(28,9)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double").alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(38,6)"))
        .cast("double").alias("sxx"),
    )
    n = F.col("n")
    vxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / vxx
    ols = m.filter(vxx > 0).select(
        "n",
        slope.alias("beta"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("alpha"),
    )
    resid = wide.join(F.broadcast(ols)).select(
        "d",
        F.round(
            F.col("y") - (F.col("alpha") + F.col("beta") * F.col("x")), 9
        ).alias("e"),
    )
    wd = Window.orderBy("d")
    lagged = resid.select(
        (F.col("e") - F.lag("e").over(wd)).alias("de"),
        F.lag("e").over(wd).alias("el"),
    ).filter(F.col("el").isNotNull())
    lagged = lagged.cache()  # consumed by the rho fold AND the SSE pass
    df = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(F.round(F.col("de") * F.col("el"), 6).cast("decimal(38,6)"))
        .cast("double").alias("sde"),
        F.sum(F.round(F.col("el") * F.col("el"), 6).cast("decimal(38,6)"))
        .cast("double").alias("sll"),
    )
    rho = df.filter(F.col("sll") > 0).select(
        "nd", (F.col("sde") / F.col("sll")).alias("rho"), "sll"
    )
    err = F.col("de") - F.col("rho") * F.col("el")
    sse = (
        lagged.join(F.broadcast(rho))
        .groupBy("nd", "rho", "sll")
        .agg(
            F.sum(F.round(err * err, 6).cast("decimal(38,6)"))
            .cast("double").alias("s2")
        )
    )
    dfstat = F.col("rho") / F.sqrt(
        (F.col("s2") / (F.col("nd") - 1)) / F.col("sll")
    )
    return ols.join(F.broadcast(sse)).select(
        F.col("n").alias("n_days"),
        F.round("alpha", 4).alias("alpha"),
        F.round("beta", 6).alias("beta"),
        F.round("rho", 6).alias("rho"),
        F.round(dfstat, 6).alias("df_stat"),
        F.when(dfstat < -3.34, 1).otherwise(0).cast("bigint")
        .alias("cointegrated"),
    )


# -- q_lead_lag_matrix -------------------------------------------------
#
# Lead-lag network across ALL event-type pairs: q_cross_correlation
# resolves one pair (click→purchase); this sweeps every unordered
# pair over lags −7…+7 and reports each pair's best alignment and
# WHO LEADS (best lag > 0 ⇒ the first series' today predicts the
# second's future). Pearson r per (pair, lag) from exact decimal
# moments (the q_corr_matrix pattern); the winner per pair picks by
# (round(|r|,6) DESC, lag ASC) so ties are pinned. Scale: the daily
# grid joins to itself on the lag-shifted day through one bounded
# 15× lag explode — |types|²·15 grid cells, never a stream re-scan.

LEADLAG_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
  FROM events GROUP BY 1, 2
), lags AS (SELECT UNNEST(generate_series(-7, 7)) AS lag),
cells AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.rev) AS DOUBLE) AS sx,
         CAST(SUM(b.rev) AS DOUBLE) AS sy,
         CAST(SUM(CAST(a.rev * b.rev AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(a.rev * a.rev AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(b.rev * b.rev AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b
    ON b.event_type > a.event_type
   AND b.day = a.day + CAST(l.lag AS INT)
  GROUP BY 1, 2, 3
), r AS (
  SELECT type_a, type_b, lag, n,
         round((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
  FROM cells
  WHERE n > 2 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
), best AS (
  SELECT type_a, type_b, lag, n, r,
         ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                            ORDER BY abs(r) DESC, lag ASC) AS rn
  FROM r
)
SELECT type_a, type_b, CAST(lag AS BIGINT) AS best_lag, n AS n_days,
       r AS best_r,
       CASE WHEN lag > 0 THEN type_a
            WHEN lag < 0 THEN type_b
            ELSE 'simultaneous' END AS leader
FROM best WHERE rn = 1
ORDER BY type_a, type_b
"""


@query("q_lead_lag_matrix", oracle=LEADLAG_SQL)
def q_lead_lag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    daily = daily.cache()  # both join sides of the lag sweep
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("da"),
        F.col("rev").alias("ra"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("db"),
        F.col("rev").alias("rb"),
    )
    cells = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("type_b") > F.col("type_a"))
            & (F.col("db") == F.date_add(F.col("da"), F.col("lag"))),
        )
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("ra").cast("double").alias("sx"),
            F.sum("rb").cast("double").alias("sy"),
            F.sum((F.col("ra") * F.col("rb")).cast("decimal(38,4)"))
            .cast("double")
            .alias("sxy"),
            F.sum((F.col("ra") * F.col("ra")).cast("decimal(38,4)"))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("rb") * F.col("rb")).cast("decimal(38,4)"))
            .cast("double")
            .alias("syy"),
        )
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    det = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r = (
        cells.filter((n > 2) & (det > 0))
        .select(
            "type_a",
            "type_b",
            "lag",
            "n",
            F.round((n * sxy - sx * sy) / F.sqrt(det), 6).alias("r"),
        )
    )
    best = r.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("type_a", "type_b").orderBy(
                F.abs(F.col("r")).desc(), F.asc("lag")
            )
        ),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            "type_a",
            "type_b",
            F.col("lag").cast("bigint").alias("best_lag"),
            F.col("n").alias("n_days"),
            F.col("r").alias("best_r"),
            F.when(F.col("lag") > 0, F.col("type_a"))
            .when(F.col("lag") < 0, F.col("type_b"))
            .otherwise(F.lit("simultaneous"))
            .alias("leader"),
        )
        .orderBy("type_a", "type_b")
    )


# -- q_changepoint_binseg ----------------------------------------------
#
# Two-level binary-segmentation changepoints per event type:
# q_changepoint finds the single strongest CUSUM break; binary
# segmentation then RECURSES into the left and right segments and
# finds each side's own strongest break — the standard multiple-
# changepoint scheme, unrolled to depth 2 (three breaks per series).
# Each level reuses the exact n-scaled statistic |n·P_t − t·S| on
# SEGMENT-LOCAL prefix sums (p − p_offset, windows re-partitioned by
# (type, side)), so every argmax and tie-break (earliest day) stays
# exact-decimal deterministic. Scale: the daily grid sorts once per
# level — two bounded window passes, no stream re-scan.

BINSEG_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
  FROM events GROUP BY 1, 2
), st AS MATERIALIZED (
  SELECT event_type, day, rev,
         CAST(SUM(rev) OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING)
              AS DECIMAL(19,2)) AS p,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         CAST(SUM(rev) OVER (PARTITION BY event_type)
              AS DECIMAL(19,2)) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM st0
), cp1 AS (
  SELECT event_type, day AS cp_day, p AS p_cp, t AS t_cp, n
  FROM (
    SELECT event_type, day, p, t, n,
           ROW_NUMBER() OVER (
             PARTITION BY event_type
             ORDER BY abs(CAST(n * p - t * s AS DECIMAL(28,2))) DESC,
                      day) AS rk
    FROM st
  ) WHERE rk = 1
), sided AS (
  SELECT st.event_type,
         CASE WHEN st.day <= c.cp_day THEN 'L' ELSE 'R' END AS side,
         st.day,
         CASE WHEN st.day <= c.cp_day THEN st.p
              ELSE CAST(st.p - c.p_cp AS DECIMAL(19,2)) END AS lp,
         CASE WHEN st.day <= c.cp_day THEN st.t
              ELSE st.t - c.t_cp END AS lt,
         CASE WHEN st.day <= c.cp_day THEN c.p_cp
              ELSE CAST(st.s - c.p_cp AS DECIMAL(19,2)) END AS ls,
         CASE WHEN st.day <= c.cp_day THEN c.t_cp
              ELSE st.n - c.t_cp END AS ln_
  FROM st JOIN cp1 c ON st.event_type = c.event_type
), lvl2 AS (
  SELECT event_type, side, day, ln_,
         abs(CAST(ln_ * lp - lt * ls AS DECIMAL(38,2))) AS stat,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, side
           ORDER BY abs(CAST(ln_ * lp - lt * ls AS DECIMAL(38,2))) DESC,
                    day) AS rk
  FROM sided WHERE ln_ > 2
)
SELECT event_type, 1 AS level, 'C' AS side,
       strftime(cp_day, '%Y-%m-%d') AS change_day,
       CAST(n AS BIGINT) AS seg_days
FROM cp1
UNION ALL
SELECT event_type, 2, side, strftime(day, '%Y-%m-%d'),
       CAST(ln_ AS BIGINT)
FROM lvl2 WHERE rk = 1
ORDER BY event_type, level, side
"""

BINSEG_SQL = BINSEG_SQL.replace(
    "FROM st0",
    "FROM daily",
)


@query("q_changepoint_binseg", oracle=BINSEG_SQL)
def q_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    daily = daily.cache()
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    st = daily.select(
        "event_type",
        "day",
        "rev",
        F.sum("rev")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(19,2)")
        .alias("p"),
        F.row_number().over(wo).alias("t"),
        F.sum("rev").over(wp).cast("decimal(19,2)").alias("s"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    st = st.localCheckpoint()  # level-1 grid reused by level 2
    stat1 = F.abs(
        (F.col("n") * F.col("p") - F.col("t") * F.col("s")).cast(
            "decimal(28,2)"
        )
    )
    cp1 = (
        st.withColumn(
            "rk",
            F.row_number().over(
                wp.orderBy(stat1.desc(), F.asc("day"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            F.col("p").alias("p_cp"),
            F.col("t").alias("t_cp"),
            F.col("n").alias("n1"),
        )
    )
    cp1 = cp1.cache()  # ≤|types| rows: level-1 output + level-2 offsets
    j = st.join(F.broadcast(cp1), "event_type")
    is_l = F.col("day") <= F.col("cp_day")
    sided = j.select(
        "event_type",
        F.when(is_l, "L").otherwise("R").alias("side"),
        "day",
        F.when(is_l, F.col("p"))
        .otherwise((F.col("p") - F.col("p_cp")).cast("decimal(19,2)"))
        .alias("lp"),
        F.when(is_l, F.col("t")).otherwise(F.col("t") - F.col("t_cp")).alias(
            "lt"
        ),
        F.when(is_l, F.col("p_cp"))
        .otherwise((F.col("s") - F.col("p_cp")).cast("decimal(19,2)"))
        .alias("ls"),
        F.when(is_l, F.col("t_cp")).otherwise(F.col("n") - F.col("t_cp")).alias(
            "ln_"
        ),
    )
    stat2 = F.abs(
        (F.col("ln_") * F.col("lp") - F.col("lt") * F.col("ls")).cast(
            "decimal(38,2)"
        )
    )
    lvl2 = (
        sided.filter(F.col("ln_") > 2)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type", "side").orderBy(
                    stat2.desc(), F.asc("day")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    out1 = cp1.select(
        "event_type",
        F.lit(1).alias("level"),
        F.lit("C").alias("side"),
        F.date_format("cp_day", "yyyy-MM-dd").alias("change_day"),
        F.col("n1").cast("bigint").alias("seg_days"),
    )
    out2 = lvl2.select(
        "event_type",
        F.lit(2).alias("level"),
        "side",
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        F.col("ln_").cast("bigint").alias("seg_days"),
    )
    return out1.unionAll(out2).orderBy("event_type", "level", "side")
