"""Risk & operations inventory batch: max-drawdown report, Erlang-C
staffing table, and the Anderson-Darling normality audit.

Reference parity: the reference's fold/reduce-by-key surface computes
grouped running folds and closed-form per-group algebra; these entries
re-express three operations-analytics workhorses as window passes over
tiny per-group grids (SURVEY §2 stats/ops block). Determinism contract
as registry.py: exact decimal folds, identical double chains on both
engines, 6-rounded outputs, unique-key tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_drawdown --------------------------------------------------------
#
# Maximum drawdown of daily revenue per event type: the classic
# risk-curve summary (running peak, deepest percentage decline, peak
# and trough dates). The events fact stream collapses to the
# |event_type × day| grid in ONE partial-aggregated scan; the running
# peak is a window max over EXACT DECIMAL(18,2) daily revenue, so the
# peak and the (peak − rev) gap are exact on both engines and the only
# double op is the final division. Trough ties break on earliest day;
# the peak day is the EARLIEST day attaining the trough's running peak
# (decimal-equality join against the ≤|types|-row trough table).
# Scale: grouped windows over the tiny daily grid, never the raw
# stream; the grid is MATERIALIZED/cached once for both consumers.

DRAWDOWN_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
  FROM events GROUP BY 1, 2
), dd AS (
  SELECT event_type, day, rev,
         MAX(rev) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
  FROM daily
), scored AS (
  SELECT event_type, day, rev, peak, n_days,
         CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE) AS ddp,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE) DESC,
                    day ASC) AS rn
  FROM dd
), trough AS (
  SELECT event_type, n_days, day AS trough_day, rev AS trough_rev,
         peak AS peak_rev, ddp
  FROM scored WHERE rn = 1
)
SELECT t.event_type, t.n_days,
       strftime(MIN(d.day), '%Y-%m-%d') AS peak_day,
       CAST(t.peak_rev AS DOUBLE) AS peak_value,
       strftime(t.trough_day, '%Y-%m-%d') AS trough_day,
       CAST(t.trough_rev AS DOUBLE) AS trough_value,
       round(t.ddp, 6) AS max_drawdown_pct
FROM trough t
JOIN daily d
  ON d.event_type = t.event_type
 AND d.rev = t.peak_rev AND d.day <= t.trough_day
GROUP BY t.event_type, t.n_days, t.peak_rev, t.trough_day, t.trough_rev,
         t.ddp
ORDER BY t.event_type
"""


@query("q_drawdown", oracle=DRAWDOWN_SQL)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    daily = daily.cache()  # tiny grid, consumed by trough scan + peak-day join
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "event_type",
        "day",
        "rev",
        F.max("rev").over(wrun).alias("peak"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("n_days"),
    )
    ddp = (F.col("peak") - F.col("rev")).cast("double") / F.col("peak").cast(
        "double"
    )
    scored = dd.withColumn("ddp", ddp).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("ddp").desc(), F.col("day").asc()
            )
        ),
    )
    trough = scored.filter(F.col("rn") == 1).select(
        "event_type",
        "n_days",
        F.col("day").alias("trough_day"),
        F.col("rev").alias("trough_rev"),
        F.col("peak").alias("peak_rev"),
        "ddp",
    )
    return (
        trough.join(
            daily.select(
                F.col("event_type").alias("de"), F.col("day").alias("dday"),
                F.col("rev").alias("drev"),
            ),
            (F.col("de") == F.col("event_type"))
            & (F.col("drev") == F.col("peak_rev"))
            & (F.col("dday") <= F.col("trough_day")),
        )
        .groupBy(
            "event_type", "n_days", "peak_rev", "trough_day", "trough_rev",
            "ddp",
        )
        .agg(F.min("dday").alias("pk"))
        .select(
            "event_type",
            "n_days",
            F.date_format("pk", "yyyy-MM-dd").alias("peak_day"),
            F.col("peak_rev").cast("double").alias("peak_value"),
            F.date_format("trough_day", "yyyy-MM-dd").alias("trough_day"),
            F.col("trough_rev").cast("double").alias("trough_value"),
            F.round("ddp", 6).alias("max_drawdown_pct"),
        )
        .orderBy("event_type")
    )


# -- q_erlang_c --------------------------------------------------------
#
# Erlang-C staffing table per event type: arrival rate λ (events/hour
# over the observed day span), fixed service rate μ = 12/hour (5-min
# mean handle), offered load a = λ/μ, and for each candidate server
# count c = ⌈a⌉+1 … ⌈a⌉+5 the wait probability
# P_W = T_c / ((1−ρ)·S_{c−1} + T_c) with T_k = a^k/k!,
# S_{c−1} = Σ_{k<c} T_k, ρ = a/c, plus average speed of answer
# ASA = P_W/(cμ−λ) in minutes. The factorial terms come from ONE
# exploded k-grid per type: ln k! is a running window SUM of ln k
# (sequential, order-pinned), T_k = exp(k·ln a − ln k!), and the
# partial sums S are a 9-rounded DECIMAL(28,9) running fold over the
# same window — every reduction is ordered, so partition order cannot
# perturb either engine. Scale: one fact scan to the per-type rate
# row; the k-grid is ≤ ~40 rows per type.

ERLANG_SQL = """
WITH rate AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS DOUBLE)
           / ((date_diff('day', MIN(CAST(ts AS DATE)),
                         MAX(CAST(ts AS DATE))) + 1) * 24.0) AS lam
  FROM events GROUP BY 1
), base AS (
  SELECT event_type, n_events, lam, lam / 12.0 AS a,
         CAST(ceil(lam / 12.0) AS BIGINT) AS c0
  FROM rate WHERE lam > 0
), kg AS (
  SELECT b.event_type, b.n_events, b.lam, b.a, b.c0, g.k
  FROM base b, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(b.c0 + 5 AS BIGINT))) AS k) g
), terms AS (
  SELECT event_type, n_events, lam, a, c0, k,
         exp(k * ln(a)
             - SUM(ln(GREATEST(k, 1))) OVER (
                 PARTITION BY event_type ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS t_k
  FROM kg
), folded AS (
  SELECT event_type, n_events, lam, a, c0, k, t_k,
         CAST(COALESCE(SUM(CAST(round(t_k, 9) AS DECIMAL(28,9))) OVER (
                 PARTITION BY event_type ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(28,9))) AS DOUBLE) AS s_prev
  FROM terms
)
SELECT event_type, n_events,
       round(lam, 6) AS arrivals_per_hour,
       round(a, 6) AS offered_load,
       k AS servers,
       round(a / k, 6) AS occupancy,
       round(t_k / ((1.0 - a / k) * s_prev + t_k), 6) AS p_wait,
       round(t_k / ((1.0 - a / k) * s_prev + t_k)
             / (k * 12.0 - lam) * 60.0, 6) AS asa_minutes
FROM folded
WHERE k > c0 AND k <= c0 + 5
ORDER BY event_type, k
"""


@query("q_erlang_c", oracle=ERLANG_SQL)
def q_erlang_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    rate = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.count(F.lit(1)).cast("double")
            / (
                (
                    F.datediff(
                        F.max(F.to_date("ts")), F.min(F.to_date("ts"))
                    )
                    + 1
                )
                * 24.0
            )
        ).alias("lam"),
    )
    base = rate.filter(F.col("lam") > 0).select(
        "event_type",
        "n_events",
        "lam",
        (F.col("lam") / 12.0).alias("a"),
        F.ceil(F.col("lam") / 12.0).cast("bigint").alias("c0"),
    )
    kg = base.select(
        "event_type",
        "n_events",
        "lam",
        "a",
        "c0",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("c0") + 5)
        ).alias("k"),
    )
    wk = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    terms = kg.withColumn(
        "t_k",
        F.exp(
            F.col("k") * F.log(F.col("a"))
            - F.sum(F.log(F.greatest(F.col("k"), F.lit(1)))).over(wk)
        ),
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    folded = terms.withColumn(
        "s_prev",
        F.coalesce(
            F.sum(F.round("t_k", 9).cast("decimal(28,9)")).over(wprev),
            F.lit(0).cast("decimal(28,9)"),
        ).cast("double"),
    )
    a, k, t_k, s_prev, lam = (
        F.col("a"),
        F.col("k"),
        F.col("t_k"),
        F.col("s_prev"),
        F.col("lam"),
    )
    pw = t_k / ((1.0 - a / k) * s_prev + t_k)
    return (
        folded.filter((k > F.col("c0")) & (k <= F.col("c0") + 5))
        .select(
            "event_type",
            "n_events",
            F.round(lam, 6).alias("arrivals_per_hour"),
            F.round(a, 6).alias("offered_load"),
            k.alias("servers"),
            F.round(a / k, 6).alias("occupancy"),
            F.round(pw, 6).alias("p_wait"),
            F.round(pw / (k * 12.0 - lam) * 60.0, 6).alias("asa_minutes"),
        )
        .orderBy("event_type", "servers")
    )


# -- q_anderson_darling ------------------------------------------------
#
# Anderson-Darling normality audit of account balances per market
# segment: the EDF test most sensitive in the tails, computed in the
# single-pass reindexed form
#   A² = −n − (1/n)·Σ_i [(2i−1)·lnΦ(z_i) + (2n−2i+1)·lnΦ(−z_i)]
# (the j = n+1−i substitution folds both tail sums into ONE ordered
# scan — no reverse-rank self-join). Moments are exact: decimal-sum
# mean, cancellation-safe Σ(x−m)² with 6-rounded decimal terms; Φ is
# the house A&S 7.1.26 erfc chain (identical double ops both engines,
# clamped at 1e-300 before ln). Ranks order by (acctbal, custkey) so
# ties are pinned. Small-sample correction A*² = A²(1+0.75/n+2.25/n²)
# against the 5% critical value 0.787. Scale: two fact scans plus one
# grouped window sort — the standard distributed per-key order-stat
# shape.


def _phi_sql(x: str) -> str:
    """SQL for Φ(x) via the house A&S 7.1.26 erfc chain (any-sign x)."""

    def half_erfc(u: str) -> str:
        # 0.5*erfc(u/sqrt(2)) for u >= 0
        t = f"(1.0 / (1.0 + 0.3275911 * (({u}) / sqrt(2.0))))"
        poly = (
            f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * "
            f"(1.421413741 + {t} * (-1.453152027 + {t} * 1.061405429)))))"
        )
        return (
            f"(0.5 * {poly} * exp(-(({u}) / sqrt(2.0)) "
            f"* (({u}) / sqrt(2.0))))"
        )

    return (
        f"(CASE WHEN ({x}) >= 0 THEN 1.0 - {half_erfc(x)} "
        f"ELSE {half_erfc(f'-({x})')} END)"
    )


AD_SQL = f"""
WITH m1 AS (
  SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS mu
  FROM customer GROUP BY 1
), m2 AS (
  SELECT c.c_mktsegment AS segment, m.n, m.mu,
         sqrt(CAST(SUM(CAST(round(
                (c.c_acctbal - m.mu) * (c.c_acctbal - m.mu), 6)
              AS DECIMAL(28,6))) AS DOUBLE) / (m.n - 1)) AS sd
  FROM customer c JOIN m1 m ON c.c_mktsegment = m.segment
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT c.c_mktsegment AS segment, m.n, m.mu, m.sd,
         (c.c_acctbal - m.mu) / m.sd AS z,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY c.c_acctbal, c.c_custkey) AS i
  FROM customer c JOIN m2 m ON c.c_mktsegment = m.segment
  WHERE m.sd > 0
), terms AS (
  SELECT segment, n, mu, sd,
         round((2 * i - 1) * ln(GREATEST({_phi_sql('z')}, 1e-300))
               + (2 * n - 2 * i + 1)
                 * ln(GREATEST({_phi_sql('-z')}, 1e-300)), 6) AS term
  FROM ranked
), a2 AS (
  SELECT segment, n, mu, sd,
         -CAST(n AS DOUBLE)
           - CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE) / n AS a2
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT segment, n, round(mu, 2) AS mean_bal, round(sd, 6) AS std_bal,
       round(a2, 6) AS a2,
       round(a2 * (1.0 + 0.75 / n + 2.25 / (n * n)), 6) AS a2_star,
       CAST(CASE WHEN a2 * (1.0 + 0.75 / n + 2.25 / (n * n)) > 0.787
                 THEN 1 ELSE 0 END AS INT) AS reject_5pct
FROM a2
ORDER BY segment
"""


def _phi_col(x):
    """Φ(x) via the house A&S 7.1.26 erfc chain (any-sign Column)."""

    def half_erfc(u):
        t = 1.0 / (1.0 + 0.3275911 * (u / F.sqrt(F.lit(2.0))))
        poly = t * (
            0.254829592
            + t
            * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
        return (
            0.5
            * poly
            * F.exp(-(u / F.sqrt(F.lit(2.0))) * (u / F.sqrt(F.lit(2.0))))
        )

    return F.when(x >= 0, 1.0 - half_erfc(x)).otherwise(half_erfc(-x))


@query("q_anderson_darling", oracle=AD_SQL)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    m1 = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
    )
    j1 = c.join(
        F.broadcast(m1), c["c_mktsegment"] == m1["segment"]
    )
    m2 = (
        j1.groupBy("segment", "n", "mu")
        .agg(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("c_acctbal") - F.col("mu"))
                        * (F.col("c_acctbal") - F.col("mu")),
                        6,
                    ).cast("decimal(28,6)")
                ).cast("double")
                / (F.col("n") - 1)
            ).alias("sd")
        )
    )
    j2 = c.join(
        F.broadcast(m2), c["c_mktsegment"] == m2["segment"]
    ).filter(F.col("sd") > 0)
    ranked = j2.select(
        "segment",
        "n",
        "mu",
        "sd",
        ((F.col("c_acctbal") - F.col("mu")) / F.col("sd")).alias("z"),
        F.row_number()
        .over(
            Window.partitionBy("c_mktsegment").orderBy(
                "c_acctbal", "c_custkey"
            )
        )
        .alias("i"),
    )
    z, n, i = F.col("z"), F.col("n"), F.col("i")
    term = F.round(
        (2 * i - 1) * F.log(F.greatest(_phi_col(z), F.lit(1e-300)))
        + (2 * n - 2 * i + 1)
        * F.log(F.greatest(_phi_col(-z), F.lit(1e-300))),
        6,
    )
    a2 = (
        ranked.select("segment", "n", "mu", "sd", term.alias("term"))
        .groupBy("segment", "n", "mu", "sd")
        .agg(
            (
                -n.cast("double")
                - F.sum(F.col("term").cast("decimal(28,6)")).cast("double")
                / n
            ).alias("a2")
        )
    )
    corr = F.col("a2") * (1.0 + 0.75 / n + 2.25 / (n * n))
    return a2.select(
        "segment",
        "n",
        F.round("mu", 2).alias("mean_bal"),
        F.round("sd", 6).alias("std_bal"),
        F.round("a2", 6).alias("a2"),
        F.round(corr, 6).alias("a2_star"),
        F.when(corr > 0.787, 1).otherwise(0).cast("int").alias(
            "reject_5pct"
        ),
    ).orderBy("segment")
