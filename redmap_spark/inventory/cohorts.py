"""SURVEY §2.A additions — cohort retention, anomaly detection, and
deterministic hash sampling over the events/orders tables (all
oracle-verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_retention_cohorts ----------------------------------------------
#
# Classic cohort-retention matrix: cohort = a user's first active day,
# cell (cohort_day, day_offset) = how many of that cohort's users were
# active day_offset days later. Scale shape: the raw event stream is
# collapsed to distinct (user, day) pairs FIRST (one shuffle, and the
# only one proportional to |events|); everything after operates on the
# much smaller user-day set, and the first-day join is a same-key
# self-join that AQE plans as a local join after the groupBy.

RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM ud JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


@query("q_retention_cohorts", oracle=RETENTION_SQL)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        ud.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# -- q_anomaly_zscore --------------------------------------------------
#
# Volume-anomaly detection: per event type, z-score each day's event
# count against that type's own daily distribution; |z| > 2 flags the
# day. One fact-table scan into a partial-aggregated daily rollup; the
# window runs over the tiny (type, day) grid, so the stddev/avg pass
# shuffles only |types|×|days| rows, never the fact table.

ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       round((n - AVG(n) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(n) OVER (PARTITION BY event_type), 6) AS z,
       abs(round((n - AVG(n) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(n) OVER (PARTITION BY event_type), 6)) > 2.0
         AS is_anomaly
FROM daily
"""


@query("q_anomaly_zscore", oracle=ANOMALY_SQL)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    z = F.round((F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 6)
    return daily.select("event_type", "day", "n", z.alias("z")).withColumn(
        "is_anomaly", F.abs(F.col("z")) > F.lit(2.0)
    )


# -- q_hash_sample -----------------------------------------------------
#
# Deterministic ~5% Bernoulli sample keyed on md5(o_orderkey): the
# reproducible-sampling primitive a training-data pipeline needs
# (same subset on every run, every engine, any partitioning — unlike
# rand()/TABLESAMPLE). Partition-local predicate: zero shuffle, and
# the scan prunes to the three projected columns.

HASH_SAMPLE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
"""


@query("q_hash_sample", oracle=HASH_SAMPLE_SQL)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    keep = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "0d"
    return o.filter(keep).select("o_orderkey", "o_custkey", "o_totalprice")


# -- q_group_sample ----------------------------------------------------
#
# Deterministic per-group k-sample: rank rows inside each group by
# md5(key) — a uniform, engine-independent, re-run-stable shuffle
# order — and keep the first k. The reproducible form of per-class
# downsampling in a training-mixture pipeline (rand()-based sampling
# changes membership every run/plan). One window sort per group
# partition; no global ordering.

GROUP_SAMPLE_SQL = """
SELECT event_type, event_id, user_id
FROM (
  SELECT event_type, event_id, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
)
WHERE rn <= 100
"""


@query("q_group_sample", oracle=GROUP_SAMPLE_SQL)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        e.select("event_type", "event_id", "user_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )


# -- q_stats_moments ---------------------------------------------------
#
# Bivariate statistics breadth: per-type Pearson correlation and
# sample covariance of event value vs hour-of-day (is the metric
# time-of-day dependent?). Single partial-aggregated scan — corr and
# covar carry mergeable (n, Σx, Σy, Σxy, Σx², Σy²) state, so the
# shuffle is |types| rows of moments. Rounded to 6: the moment sums
# are order-dependent in their last bits.

STATS_MOMENTS_SQL = """
SELECT event_type,
       round(corr(value, CAST(extract(hour from ts) AS DOUBLE)), 6) AS hour_corr,
       round(covar_samp(value, CAST(extract(hour from ts) AS DOUBLE)), 6) AS hour_covar,
       round(stddev_samp(value), 6) AS value_stddev,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


@query("q_stats_moments", oracle=STATS_MOMENTS_SQL)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    hr = F.hour("ts").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.corr("value", hr), 6).alias("hour_corr"),
        F.round(F.covar_samp("value", hr), 6).alias("hour_covar"),
        F.round(F.stddev_samp("value"), 6).alias("value_stddev"),
        F.count(F.lit(1)).alias("n"),
    )


# -- q_gap_fill --------------------------------------------------------
#
# Time-series regularization: build the full (type × day) date spine
# and zero-fill days with no events — the step every downstream
# forecasting/anomaly consumer needs (missing days are DATA, not
# absent rows). The spine is generated (sequence+explode over the
# 1-row min/max bounds crossed with the distinct type set — both
# broadcast-sized), so the only fact-proportional work is the daily
# rollup's one scan.

GAP_FILL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT t.event_type, CAST(u.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT unnest(generate_series(
                 CAST((SELECT MIN(day) FROM daily) AS DATE),
                 CAST((SELECT MAX(day) FROM daily) AS DATE),
                 INTERVAL 1 DAY)) AS day) u
)
SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n, 0) AS n,
       COALESCE(d.sv, 0.0) AS sum_value
FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
"""


@query("q_gap_fill", oracle=GAP_FILL_SQL)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = daily.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        )
    )


# -- q_period_over_period ----------------------------------------------
#
# Period-over-period reporting: daily revenue with previous-day and
# 7-day-back comparisons off a lag window — the dashboard staple.
# One fact scan collapses to the daily grid (partial-aggregated);
# both lags share the single ORDER BY day window sort over that tiny
# grid. Ratios are guarded against zero denominators and rounded.

POP_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM events GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, revenue,
       round(revenue - LAG(revenue, 1) OVER (ORDER BY day), 2) AS dod_delta,
       CASE WHEN LAG(revenue, 7) OVER (ORDER BY day) > 0
            THEN round(revenue / LAG(revenue, 7) OVER (ORDER BY day) - 1.0, 6)
       END AS wow_ratio
FROM daily
"""


@query("q_period_over_period", oracle=POP_SQL)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("day")
    lag1, lag7 = F.lag("revenue", 1).over(w), F.lag("revenue", 7).over(w)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "revenue",
        F.round(F.col("revenue") - lag1, 2).alias("dod_delta"),
        F.when(lag7 > 0, F.round(F.col("revenue") / lag7 - 1.0, 6)).alias("wow_ratio"),
    )


# -- q_weighted_sample -------------------------------------------------
#
# Weight-proportional sampling without replacement (Efraimidis &
# Spirtes 2006, A-ES): key_i = ln(u_i)/w_i with u_i uniform(0,1),
# keep the top-k keys — P(selected) ∝ weight, one pass, mergeable
# (per-partition top-k then global top-k: exactly Spark's
# TakeOrderedAndProject). u_i is an md5-derived uniform (first 8 hex
# digits / 2³²) so the sample is deterministic, engine-independent,
# and re-run-stable — same posture as q_hash_sample/q_group_sample,
# which rand()-based sampling can't give. The training-mixture use:
# sample documents ∝ quality score or domain weight.

WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         ln(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0 + 1e-12) / o_totalprice AS k
  FROM orders WHERE o_totalprice > 0
)
SELECT o_orderkey, o_totalprice, round(k, 9) + 0.0 AS sample_key
FROM keyed ORDER BY k DESC, o_orderkey LIMIT 100
"""


@query("q_weighted_sample", oracle=WEIGHTED_SAMPLE_SQL)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    k = F.log(u + F.lit(1e-12)) / F.col("o_totalprice")
    return (
        o.filter(F.col("o_totalprice") > 0)
        .select("o_orderkey", "o_totalprice", k.alias("k"))
        .orderBy(F.desc("k"), "o_orderkey")
        .limit(100)
        .select(
            "o_orderkey", "o_totalprice",
            # + 0.0 collapses IEEE -0.0 to 0.0 (u=1 rows) on both engines
            (F.round("k", 9) + F.lit(0.0)).alias("sample_key"),
        )
    )


# -- q_cohort_ltv ------------------------------------------------------
#
# Cohort LTV curves: customers grouped by first-order month, revenue
# accumulated by months-since-first — the money companion to
# q_retention_cohorts (which counts activity, not value). Scale
# shape: first-order month is one groupBy over orders; the facts
# join that per-customer table on the customer key (co-keyed
# shuffle); revenue collapses to the tiny |cohorts|×|offsets| grid
# BEFORE the cumulative window, which partitions by cohort. Month
# offsets are pure integer arithmetic (year*12+month), never
# months_between floats.

COHORT_LTV_SQL = """
WITH f AS (
  SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
  FROM orders GROUP BY 1
), sz AS (
  SELECT cohort, COUNT(*) AS n_customers FROM f GROUP BY 1
), r AS (
  SELECT f.cohort,
         (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate))
           - (YEAR(f.cohort) * 12 + MONTH(f.cohort)) AS month_offset,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
)
SELECT strftime(r.cohort, '%Y-%m') AS cohort_month,
       CAST(r.month_offset AS BIGINT) AS month_offset,
       CAST(sz.n_customers AS BIGINT) AS n_customers,
       CAST(r.rev AS DOUBLE) AS rev,
       round(CAST(SUM(r.rev) OVER (PARTITION BY r.cohort ORDER BY r.month_offset)
                  AS DOUBLE) / sz.n_customers, 6) AS ltv_per_customer
FROM r JOIN sz ON r.cohort = sz.cohort
"""


@query("q_cohort_ltv", oracle=COHORT_LTV_SQL)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    f = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    sz = f.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_customers"))
    mo = (F.year("o_orderdate") * 12 + F.month("o_orderdate")) - (
        F.year("cohort") * 12 + F.month("cohort")
    )
    r = (
        o.join(f, "o_custkey")
        .groupBy("cohort", mo.alias("month_offset"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    cum = F.sum("rev").over(
        Window.partitionBy("cohort").orderBy("month_offset")
    )
    return (
        r.join(F.broadcast(sz), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            F.col("month_offset").cast("bigint").alias("month_offset"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("rev").cast("double").alias("rev"),
            F.round(cum.cast("double") / F.col("n_customers"), 6).alias(
                "ltv_per_customer"
            ),
        )
    )


# -- q_ess -------------------------------------------------------------
#
# Effective sample size of importance weights per segment:
# ESS = (Σw)² / Σw² over order totalprice as the weight column — the
# diagnostic that says how many "real" samples a weighted/temperature
# mixture (q_weighted_sample, txt_temperature_sample) actually
# carries; ESS/n near 1 means weights are flat, near 0 means a few
# heavy rows dominate and the sample degenerates. Moments are exact
# decimal (w through DECIMAL(18,2), w² through DECIMAL(38,4)); ESS is
# one double division, the ratio a second. Shape: one fact scan
# partial-aggregating to the |segments| grid.

ESS_SQL = """
WITH w AS (
  SELECT c_mktsegment,
         CAST(o_totalprice AS DECIMAL(18,2)) AS w
  FROM orders JOIN customer ON o_custkey = c_custkey
),
m AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(w) AS DECIMAL(38,2)) AS sw,
         CAST(SUM(CAST(w AS DECIMAL(19,2)) * CAST(w AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS sww
  FROM w GROUP BY 1
)
SELECT c_mktsegment, n,
       round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE), 4) AS ess,
       round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE) / n, 6) AS ess_ratio
FROM m
"""


@query("q_ess", oracle=ESS_SQL)
def q_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    o, cust = c.orders, c.customer
    w = o.join(cust, o.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(18,2)").alias("w"),
    )
    m = w.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("decimal(38,2)").alias("sw"),
        F.sum(
            F.col("w").cast("decimal(19,2)") * F.col("w").cast("decimal(19,2)")
        ).cast("decimal(38,4)").alias("sww"),
    )
    sw, sww = F.col("sw").cast("double"), F.col("sww").cast("double")
    ess = (sw * sw) / sww
    return m.select(
        "c_mktsegment", "n",
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n"), 6).alias("ess_ratio"),
    )


# -- q_time_to_value ---------------------------------------------------
#
# First-passage "time to value": for each user, the days from their
# first event until their CUMULATIVE event value first crosses the
# activation bar (500) — the onboarding metric product teams steer
# by. The crossing is an ordered cumulative window over each user's
# exact-decimal value stream (ties broken by event_id); the rollup
# reports conversion share and the exact p50/p90 of days-to-value
# over converters via the distinct-value cumulative grid (the
# q_lateness_percentiles shape). Scale: ONE user-partitioned window
# pass, then grid work only.

TTV_BAR = 500

TTV_SQL = f"""
WITH c AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum,
         MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS d0
  FROM events WHERE value IS NOT NULL
), fp AS (
  SELECT user_id,
         MIN(CASE WHEN cum >= {TTV_BAR}
                  THEN date_diff('day', d0, day) END) AS days_to_value
  FROM c GROUP BY 1
), g AS (
  SELECT days_to_value AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM fp WHERE days_to_value IS NOT NULL GROUP BY 1
), cg AS (
  SELECT d, c, SUM(c) OVER (ORDER BY d) AS cum, SUM(c) OVER () AS m
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN days_to_value IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_converted
  FROM fp
)
SELECT n_users, n_converted,
       round(n_converted / CAST(n_users AS DOUBLE), 6) AS conversion_share,
       CAST((SELECT MIN(CASE WHEN cum >= CAST(ceil(0.5 * m) AS BIGINT)
                             THEN d END) FROM cg) AS BIGINT) AS p50_days,
       CAST((SELECT MIN(CASE WHEN cum >= CAST(ceil(0.9 * m) AS BIGINT)
                             THEN d END) FROM cg) AS BIGINT) AS p90_days,
       CAST((SELECT MAX(d) FROM cg) AS BIGINT) AS max_days
FROM tot
"""


@query("q_time_to_value", oracle=TTV_SQL)
def q_time_to_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    c = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("cum"),
        F.min(F.to_date("ts")).over(wp).alias("d0"),
    )
    fp = c.groupBy("user_id").agg(
        F.min(
            F.when(
                F.col("cum") >= TTV_BAR, F.datediff("day", F.col("d0"))
            )
        ).alias("days_to_value")
    ).localCheckpoint(eager=True)  # grid + totals both consume
    g = (
        fp.filter(F.col("days_to_value").isNotNull())
        .groupBy(F.col("days_to_value").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cg = g.select(
        "d", "c",
        F.sum("c").over(Window.orderBy("d")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("m"),
    )

    def at(q):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("m")).cast("bigint"),
                F.col("d"),
            )
        ).cast("bigint")

    qs = cg.agg(
        at(0.5).alias("p50_days"),
        at(0.9).alias("p90_days"),
        F.max("d").cast("bigint").alias("max_days"),
    )
    tot = fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            F.when(F.col("days_to_value").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_converted"),
    )
    return tot.join(F.broadcast(qs)).select(
        "n_users", "n_converted",
        F.round(F.col("n_converted") / F.col("n_users").cast("double"), 6)
        .alias("conversion_share"),
        "p50_days", "p90_days", "max_days",
    )


# -- q_retention_decay_fit ---------------------------------------------
#
# Which decay law does retention follow? The pooled retention curve
# (share of users active at offset t ≥ 1, cohorts pooled) is fit
# log-linearly two ways — exponential (ln r ~ t) vs power law
# (ln r ~ ln t, the "retention smile" hypothesis) — and the better
# R² wins; power-law retention means late cohort-life revenue
# projections from an exponential fit are badly pessimistic (the
# growth-modeling decision this diagnostic feeds). Retention shares
# are exact count ratios; ln terms round to DECIMAL(18,9) before
# exact moment sums; both fits are identical double chains. Scale:
# the q_retention_cohorts grid pooled to ≤|offsets| rows.

RET_DECAY_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
), total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM firsts),
curve AS (
  SELECT CAST(date_diff('day', cohort, day) AS BIGINT) AS t,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
  FROM ud JOIN firsts USING (user_id)
  WHERE day > cohort GROUP BY 1
), pts AS (
  SELECT t,
         CAST(round(ln(n / CAST(n0 AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly,
         CAST(round(ln(CAST(t AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lt
  FROM curve CROSS JOIN total WHERE n > 0 AND t >= 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(t) AS BIGINT) AS sx1,
         CAST(SUM(t * t) AS BIGINT) AS sxx1,
         CAST(SUM(lt) AS DECIMAL(28,9)) AS sx2,
         CAST(SUM(lt * lt) AS DECIMAL(38,18)) AS sxx2,
         CAST(SUM(ly) AS DECIMAL(28,9)) AS sy,
         CAST(SUM(ly * ly) AS DECIMAL(38,18)) AS syy,
         CAST(SUM(t * ly) AS DECIMAL(38,9)) AS sxy1,
         CAST(SUM(lt * ly) AS DECIMAL(38,18)) AS sxy2
  FROM pts
)
SELECT k AS n_points,
       round((k * CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE))
             / (k * CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1), 6)
         AS exp_decay_rate,
       round(POW(k * CAST(sxy1 AS DOUBLE)
                 - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE), 2)
             / ((k * CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1)
                * (k * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS exp_r2,
       round((k * CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE))
             / (k * CAST(sxx2 AS DOUBLE)
                - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)), 6)
         AS power_exponent,
       round(POW(k * CAST(sxy2 AS DOUBLE)
                 - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE), 2)
             / ((k * CAST(sxx2 AS DOUBLE)
                 - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
                * (k * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS power_r2,
       CASE WHEN POW(k * CAST(sxy2 AS DOUBLE)
                     - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((k * CAST(sxx2 AS DOUBLE)
                     - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
                    * (k * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 > POW(k * CAST(sxy1 AS DOUBLE)
                       - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                   / ((k * CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1)
                      * (k * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
            THEN 'power_law' ELSE 'exponential' END AS better_fit
FROM m
"""


@query("q_retention_decay_fit", oracle=RET_DECAY_SQL)
def q_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("cohort"))
    total = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    curve = (
        ud.join(firsts, "user_id")
        .filter(F.col("day") > F.col("cohort"))
        .groupBy(F.datediff("day", "cohort").cast("bigint").alias("t"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n"))
    )
    pts = (
        curve.join(F.broadcast(total))
        .filter((F.col("n") > 0) & (F.col("t") >= 1))
        .select(
            "t",
            F.round(F.log(F.col("n") / F.col("n0").cast("double")), 9)
            .cast("decimal(18,9)").alias("ly"),
            F.round(F.log(F.col("t").cast("double")), 9)
            .cast("decimal(18,9)").alias("lt"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("t").cast("bigint").alias("sx1"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx1"),
        F.sum("lt").cast("decimal(28,9)").alias("sx2"),
        F.sum(F.col("lt") * F.col("lt")).cast("decimal(38,18)").alias("sxx2"),
        F.sum("ly").cast("decimal(28,9)").alias("sy"),
        F.sum(F.col("ly") * F.col("ly")).cast("decimal(38,18)").alias("syy"),
        F.sum(F.col("t") * F.col("ly")).cast("decimal(38,9)").alias("sxy1"),
        F.sum(F.col("lt") * F.col("ly")).cast("decimal(38,18)").alias("sxy2"),
    )
    k = F.col("k")
    sx1, sy = F.col("sx1").cast("double"), F.col("sy").cast("double")
    sx2 = F.col("sx2").cast("double")
    c1 = k * F.col("sxy1").cast("double") - sx1 * sy
    v1 = k * F.col("sxx1").cast("double") - sx1 * F.col("sx1")
    c2 = k * F.col("sxy2").cast("double") - sx2 * sy
    v2 = k * F.col("sxx2").cast("double") - sx2 * sx2
    vy = k * F.col("syy").cast("double") - sy * sy
    r2_1 = F.pow(c1, 2) / (v1 * vy)
    r2_2 = F.pow(c2, 2) / (v2 * vy)
    return m.select(
        k.alias("n_points"),
        F.round(c1 / v1, 6).alias("exp_decay_rate"),
        F.round(r2_1, 6).alias("exp_r2"),
        F.round(c2 / v2, 6).alias("power_exponent"),
        F.round(r2_2, 6).alias("power_r2"),
        F.when(r2_2 > r2_1, "power_law").otherwise("exponential")
        .alias("better_fit"),
    )
