"""SURVEY §2.A additions (round 6, continuation session) — exact
small-sample inference and multi-resolution diagnostics: Fisher's
exact test without a factorial table, a Haar wavelet energy
decomposition of the daily revenue curve, and a sessionization
gap-threshold sensitivity sweep.

Reference parity: the reference's fold/reduce surface computes grouped
folds over sorted runs; these re-express three analyst workhorses as
single-scan window/aggregate passes (SURVEY §2 stats/ops block).
Determinism contract as registry.py: exact decimal folds, identical
double chains on both engines, rounded outputs, unique-key tie-breaks.
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


# -- q_session_gap_sweep -----------------------------------------------
#
# Sessionization sensitivity: how session count, events-per-session,
# mean session duration, and bounce rate move as the inactivity gap
# threshold sweeps 15m/30m/1h/2h/6h — the tuning study behind
# q_sessionize's fixed 6h gap. ONE window pass computes each event's
# gap-to-previous and gap-to-next (per user, (ts, event_id) order);
# every threshold's metrics are conditional sums over that same pass
# (a session's duration is the sum of its intra-session gaps, and a
# session is a bounce iff its opening event is also its last), so the
# whole sweep is one scan + one user_id shuffle + a 1-row wide
# aggregate unpivoted to 5 rows. Counts and micro-second sums are
# exact BIGINTs; the three ratios are the only doubles, rounded 6.

_GAPS_MIN = [15, 30, 60, 120, 360]

SWEEP_SQL = f"""
WITH g1 AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), gaps AS (
  SELECT user_id, gap,
         LEAD(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM g1
), wide AS (
  SELECT COUNT(*) AS cnt,
    {",".join(
      f'''SUM(CASE WHEN gap IS NULL OR gap > {g * 60_000_000}
              THEN 1 ELSE 0 END) AS st{g},
      SUM(CASE WHEN gap <= {g * 60_000_000} THEN gap ELSE 0 END) AS du{g},
      SUM(CASE WHEN (gap IS NULL OR gap > {g * 60_000_000})
               AND (nxt IS NULL OR nxt > {g * 60_000_000})
              THEN 1 ELSE 0 END) AS sg{g}'''
      for g in _GAPS_MIN
    )}
  FROM gaps
)
{" UNION ALL ".join(
  f'''SELECT CAST({g} AS BIGINT) AS gap_min,
       CAST(st{g} AS BIGINT) AS n_sessions,
       CAST(sg{g} AS BIGINT) AS singleton_sessions,
       round(CAST(cnt AS DOUBLE) / st{g}, 6) AS avg_events,
       round(CAST(du{g} AS DOUBLE) / st{g} / 1000000, 6)
         AS avg_duration_s,
       round(CAST(sg{g} AS DOUBLE) / st{g}, 6) AS bounce_rate
     FROM wide''' for g in _GAPS_MIN
)}
ORDER BY gap_min
"""


@query("q_session_gap_sweep", oracle=SWEEP_SQL)
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g1 = e.select(
        "user_id", "ts", "event_id", (us - F.lag(us).over(wo)).alias("gap")
    )
    gaps = g1.select("user_id", "gap", F.lead("gap").over(wo).alias("nxt"))
    gap, nxt = F.col("gap"), F.col("nxt")
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for g in _GAPS_MIN:
        gus = g * 60_000_000
        aggs += [
            F.sum(
                F.when(gap.isNull() | (gap > gus), 1).otherwise(0)
            ).alias(f"st{g}"),
            F.sum(F.when(gap <= gus, gap).otherwise(F.lit(0))).alias(
                f"du{g}"
            ),
            F.sum(
                F.when(
                    (gap.isNull() | (gap > gus))
                    & (nxt.isNull() | (nxt > gus)),
                    1,
                ).otherwise(0)
            ).alias(f"sg{g}"),
        ]
    wide = gaps.agg(*aggs)
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).cast("bigint").alias("gap_min"),
                        F.col(f"st{g}").cast("bigint").alias("n_sessions"),
                        F.col(f"sg{g}")
                        .cast("bigint")
                        .alias("singleton_sessions"),
                        F.round(
                            F.col("cnt").cast("double") / F.col(f"st{g}"), 6
                        ).alias("avg_events"),
                        F.round(
                            F.col(f"du{g}").cast("double")
                            / F.col(f"st{g}")
                            / 1_000_000,
                            6,
                        ).alias("avg_duration_s"),
                        F.round(
                            F.col(f"sg{g}").cast("double") / F.col(f"st{g}"),
                            6,
                        ).alias("bounce_rate"),
                    )
                    for g in _GAPS_MIN
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.orderBy("gap_min")


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


# -- q_circular_stats --------------------------------------------------
#
# Directional statistics of the hour-of-day profile per event type:
# each timestamp maps to an angle theta = 2*pi*(us-in-day)/86400e6, and
# ONE groupBy accumulates 12-rounded cos/sin terms as exact decimal
# sums (order-independent), giving the circular mean hour
# atan2(S,C) -> [0,24), the resultant length Rbar (0 = uniform,
# 1 = a single spike), circular variance, and the Rayleigh uniformity
# test z = n*Rbar^2 with the small-sample-corrected p-value. The
# directional complement to q_calendar_heatmap's bin counts. Scale:
# map-side partial aggregation straight to |types| rows.

CIRC_SQL = """
WITH pts AS (
  SELECT event_type,
         2 * pi() * ((epoch_us(ts) % 86400000000) / 86400000000.0)
           AS theta
  FROM events
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(cos(theta), 12) AS DECIMAL(14,12)))
              AS DECIMAL(38,12)) AS cs,
         CAST(SUM(CAST(round(sin(theta), 12) AS DECIMAL(14,12)))
              AS DECIMAL(38,12)) AS sn
  FROM pts GROUP BY 1
), r AS (
  SELECT event_type, n, CAST(cs AS DOUBLE) AS c, CAST(sn AS DOUBLE) AS s,
         sqrt(CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
              + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)) / n AS rbar
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(((atan2(s, c) + 2 * pi()) % (2 * pi())) / (2 * pi()) * 24, 4)
         AS mean_hour,
       round(rbar, 6) AS resultant,
       round(1 - rbar, 6) AS circ_variance,
       round(n * rbar * rbar, 6) AS rayleigh_z,
       round(exp(-n * rbar * rbar)
             * (1 + (2 * n * rbar * rbar
                     - n * rbar * rbar * n * rbar * rbar) / (4 * n)), 6)
         AS rayleigh_p
FROM r
ORDER BY event_type
"""


@query("q_circular_stats", oracle=CIRC_SQL)
def q_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    theta = (
        2
        * 3.141592653589793
        * ((F.unix_micros(F.col("ts")) % 86400000000) / 86400000000.0)
    )
    agg = (
        e.select("event_type", theta.alias("theta"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.cos("theta"), 12).cast("decimal(14,12)"))
            .cast("decimal(38,12)")
            .alias("cs"),
            F.sum(F.round(F.sin("theta"), 12).cast("decimal(14,12)"))
            .cast("decimal(38,12)")
            .alias("sn"),
        )
    )
    c, s = F.col("cs").cast("double"), F.col("sn").cast("double")
    n = F.col("n")
    rbar = F.sqrt(c * c + s * s) / n
    two_pi = F.lit(2 * 3.141592653589793)
    z = n * rbar * rbar
    return (
        agg.select(
            "event_type",
            n.cast("bigint").alias("n"),
            F.round(
                ((F.atan2(s, c) + two_pi) % two_pi) / two_pi * 24, 4
            ).alias("mean_hour"),
            F.round(rbar, 6).alias("resultant"),
            F.round(1 - rbar, 6).alias("circ_variance"),
            F.round(z, 6).alias("rayleigh_z"),
            F.round(
                F.exp(-z) * (1 + (2 * z - z * z) / (4 * n)), 6
            ).alias("rayleigh_p"),
        )
        .orderBy("event_type")
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


# -- q_dissimilarity_index ---------------------------------------------
#
# Residential-segregation indices applied to market segments across
# nations: Duncan dissimilarity D = 0.5*sum|a_i/A - b_i/B| between
# AUTOMOBILE and BUILDING customers, the exposure P*(A->B) and
# isolation P*(A->A) interaction indices, and the MULTIGROUP Theil
# information index H over all five segments (nation-entropy shortfall
# vs global entropy) — the standard toolkit for "is a segment
# concentrated in a few geographies". ONE scan collapses to the
# |nation x segment| grid; every share is a ratio of exact BIGINT
# counts, each |.|/ln term is 12-rounded decimal before the exact
# fold, and only the final divisions are unrounded doubles.

DISSIM_SQL = """
WITH g AS (
  SELECT n_name, c_mktsegment AS seg, COUNT(*) AS t
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), tots AS (
  SELECT SUM(t) AS tt,
         SUM(CASE WHEN seg = 'AUTOMOBILE' THEN t ELSE 0 END) AS ta,
         SUM(CASE WHEN seg = 'BUILDING' THEN t ELSE 0 END) AS tb
  FROM g
), segtot AS (
  SELECT seg, SUM(t) AS ts FROM g GROUP BY 1
), ent AS (
  SELECT CAST(SUM(CAST(round(-(ts / CAST(tt AS DOUBLE))
                             * ln(ts / CAST(tt AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS e_glob
  FROM segtot CROSS JOIN tots
), gw AS (
  SELECT n_name, seg, t,
         SUM(t) OVER (PARTITION BY n_name) AS tn_w
  FROM g
), nat AS (
  SELECT n_name, SUM(t) AS tn,
         SUM(CASE WHEN seg = 'AUTOMOBILE' THEN t ELSE 0 END) AS a,
         SUM(CASE WHEN seg = 'BUILDING' THEN t ELSE 0 END) AS b,
         CAST(SUM(CAST(round(
               -(t / CAST(tn_w AS DOUBLE))
               * ln(t / CAST(tn_w AS DOUBLE)),
               12) AS DECIMAL(16,12))) AS DOUBLE) AS e_i
  FROM gw GROUP BY 1
), terms AS (
  SELECT
    CAST(SUM(CAST(round(abs(a / CAST(ta AS DOUBLE)
                            - b / CAST(tb AS DOUBLE)), 12)
                  AS DECIMAL(16,12))) AS DOUBLE) AS d2,
    CAST(SUM(CASE WHEN a + b > 0 THEN
          CAST(round((a / CAST(ta AS DOUBLE)) * (b / CAST(a + b AS DOUBLE)),
                     12) AS DECIMAL(16,12)) END) AS DOUBLE) AS expo,
    CAST(SUM(CASE WHEN a + b > 0 THEN
          CAST(round((a / CAST(ta AS DOUBLE)) * (a / CAST(a + b AS DOUBLE)),
                     12) AS DECIMAL(16,12)) END) AS DOUBLE) AS iso,
    CAST(SUM(CAST(round(tn * (e_glob - e_i), 9) AS DECIMAL(24,9)))
         AS DOUBLE) AS h_num,
    COUNT(*) AS n_units
  FROM nat CROSS JOIN tots CROSS JOIN ent
)
SELECT CAST(n_units AS BIGINT) AS n_units,
       round(d2 / 2, 6) AS duncan_d,
       round(expo, 6) AS exposure_ab,
       round(iso, 6) AS isolation_a,
       round(h_num / (CAST(tt AS DOUBLE) * e_glob), 6) AS theil_h
FROM terms CROSS JOIN tots CROSS JOIN ent
"""


@query("q_dissimilarity_index", oracle=DISSIM_SQL)
def q_dissimilarity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    g = (
        c.customer.join(
            F.broadcast(c.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("t"))
        .localCheckpoint()
    )
    tots = g.agg(
        F.sum("t").alias("tt"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", F.col("t")).otherwise(0))
        .alias("ta"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("t")).otherwise(0))
        .alias("tb"),
    )
    segtot = g.groupBy("seg").agg(F.sum("t").alias("ts"))
    ts, tt = F.col("ts"), F.col("tt")
    ent = (
        segtot.join(F.broadcast(tots))
        .select(
            F.round(
                -(ts / tt.cast("double")) * F.log(ts / tt.cast("double")),
                12,
            )
            .cast("decimal(16,12)")
            .alias("term")
        )
        .agg(F.sum("term").cast("double").alias("e_glob"))
    )
    wn = Window.partitionBy("n_name")
    tn_w = F.sum("t").over(wn)
    nat = (
        g.select(
            "n_name", "seg", "t",
            F.round(
                -(F.col("t") / tn_w.cast("double"))
                * F.log(F.col("t") / tn_w.cast("double")),
                12,
            )
            .cast("decimal(16,12)")
            .alias("eterm"),
        )
        .groupBy("n_name")
        .agg(
            F.sum("t").alias("tn"),
            F.sum(
                F.when(F.col("seg") == "AUTOMOBILE", F.col("t")).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("seg") == "BUILDING", F.col("t")).otherwise(0)
            ).alias("b"),
            F.sum("eterm").cast("double").alias("e_i"),
        )
    )
    a, b = F.col("a"), F.col("b")
    ta, tb = F.col("ta"), F.col("tb")
    terms = (
        nat.join(F.broadcast(tots))
        .join(F.broadcast(ent))
        .agg(
            F.sum(
                F.round(
                    F.abs(
                        a / ta.cast("double") - b / tb.cast("double")
                    ),
                    12,
                ).cast("decimal(16,12)")
            )
            .cast("double")
            .alias("d2"),
            F.sum(
                F.when(
                    a + b > 0,
                    F.round(
                        (a / ta.cast("double"))
                        * (b / (a + b).cast("double")),
                        12,
                    ).cast("decimal(16,12)"),
                )
            )
            .cast("double")
            .alias("expo"),
            F.sum(
                F.when(
                    a + b > 0,
                    F.round(
                        (a / ta.cast("double"))
                        * (a / (a + b).cast("double")),
                        12,
                    ).cast("decimal(16,12)"),
                )
            )
            .cast("double")
            .alias("iso"),
            F.sum(
                F.round(
                    F.col("tn") * (F.col("e_glob") - F.col("e_i")), 9
                ).cast("decimal(24,9)")
            )
            .cast("double")
            .alias("h_num"),
            F.count(F.lit(1)).alias("n_units"),
        )
    )
    return terms.join(F.broadcast(tots)).join(F.broadcast(ent)).select(
        F.col("n_units").cast("bigint").alias("n_units"),
        F.round(F.col("d2") / 2, 6).alias("duncan_d"),
        F.round(F.col("expo"), 6).alias("exposure_ab"),
        F.round(F.col("iso"), 6).alias("isolation_a"),
        F.round(
            F.col("h_num") / (tt.cast("double") * F.col("e_glob")), 6
        ).alias("theil_h"),
    )


# -- q_bullwhip --------------------------------------------------------
#
# Bullwhip-effect ratio per brand: variance amplification of the
# shipment signal over the order signal, BW = CV^2(monthly shipped
# qty) / CV^2(monthly ordered qty) on a shared zero-filled calendar
# month grid (BW > 1 = the supply side amplifies demand noise — the
# Lee/Padmanabhan/Whang measure). One fact scan (lineitem ⋈ broadcast
# part ⋈ orders) feeds BOTH monthly signals as conditional aggregates
# over an exploded two-signal key, so order-month and ship-month
# series come from the same shuffle; moments are exact DECIMAL sums
# (n, Σq, Σq²) per brand and the CV algebra is the only double chain.

BULLWHIP_SQL = """
WITH f AS (
  SELECT p_brand,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS om,
         strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS sm,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
), months AS (
  SELECT DISTINCT om AS m FROM f UNION SELECT DISTINCT sm FROM f
), brands AS (SELECT DISTINCT p_brand FROM f),
ord AS (
  SELECT p_brand, om AS m, CAST(SUM(q) AS DECIMAL(20,2)) AS q
  FROM f GROUP BY 1, 2
), shp AS (
  SELECT p_brand, sm AS m, CAST(SUM(q) AS DECIMAL(20,2)) AS q
  FROM f GROUP BY 1, 2
), grid AS (
  SELECT b.p_brand, mo.m,
         COALESCE(o.q, CAST(0 AS DECIMAL(20,2))) AS oq,
         COALESCE(s.q, CAST(0 AS DECIMAL(20,2))) AS sq
  FROM brands b CROSS JOIN months mo
  LEFT JOIN ord o ON o.p_brand = b.p_brand AND o.m = mo.m
  LEFT JOIN shp s ON s.p_brand = b.p_brand AND s.m = mo.m
), mom AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(oq) AS DECIMAL(28,2)) AS so,
         CAST(SUM(oq * oq) AS DECIMAL(38,4)) AS so2,
         CAST(SUM(sq) AS DECIMAL(28,2)) AS ss,
         CAST(SUM(sq * sq) AS DECIMAL(38,4)) AS ss2
  FROM grid GROUP BY 1
)
SELECT p_brand, CAST(n AS BIGINT) AS n_months,
       round(CAST(so AS DOUBLE) / n, 4) AS order_mean,
       round(CAST(ss AS DOUBLE) / n, 4) AS ship_mean,
       round(((CAST(so2 AS DOUBLE) - CAST(so AS DOUBLE) * CAST(so AS DOUBLE) / n)
              / (n - 1))
             / ((CAST(so AS DOUBLE) / n) * (CAST(so AS DOUBLE) / n)), 6)
         AS order_cv2,
       round(((CAST(ss2 AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n)
              / (n - 1))
             / ((CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n)), 6)
         AS ship_cv2,
       round((((CAST(ss2 AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / n)
               / (n - 1))
              / ((CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n)))
             / (((CAST(so2 AS DOUBLE) - CAST(so AS DOUBLE) * CAST(so AS DOUBLE) / n)
                 / (n - 1))
                / ((CAST(so AS DOUBLE) / n) * (CAST(so AS DOUBLE) / n))), 6)
         AS bullwhip
FROM mom
ORDER BY p_brand
"""


@query("q_bullwhip", oracle=BULLWHIP_SQL)
def q_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    f = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("om"),
            F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
            .alias("sm"),
            dec("l_quantity").alias("q"),
        )
        .localCheckpoint()
    )
    months = (
        f.select(F.col("om").alias("m"))
        .union(f.select(F.col("sm").alias("m")))
        .distinct()
    )
    brands = f.select("p_brand").distinct()
    ord_ = f.groupBy("p_brand", F.col("om").alias("m")).agg(
        F.sum("q").cast("decimal(20,2)").alias("q")
    )
    shp = f.groupBy("p_brand", F.col("sm").alias("m")).agg(
        F.sum("q").cast("decimal(20,2)").alias("q")
    )
    zero = F.lit(0).cast("decimal(20,2)")
    grid = (
        brands.crossJoin(F.broadcast(months))
        .join(ord_.withColumnRenamed("q", "oq"), ["p_brand", "m"], "left")
        .join(shp.withColumnRenamed("q", "sq"), ["p_brand", "m"], "left")
        .select(
            "p_brand", "m",
            F.coalesce("oq", zero).alias("oq"),
            F.coalesce("sq", zero).alias("sq"),
        )
    )
    mom = grid.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("oq").cast("decimal(28,2)").alias("so"),
        F.sum(F.col("oq") * F.col("oq")).cast("decimal(38,4)").alias("so2"),
        F.sum("sq").cast("decimal(28,2)").alias("ss"),
        F.sum(F.col("sq") * F.col("sq")).cast("decimal(38,4)").alias("ss2"),
    )
    n = F.col("n")
    so, so2 = F.col("so").cast("double"), F.col("so2").cast("double")
    ss, ss2 = F.col("ss").cast("double"), F.col("ss2").cast("double")
    ocv2 = ((so2 - so * so / n) / (n - 1)) / ((so / n) * (so / n))
    scv2 = ((ss2 - ss * ss / n) / (n - 1)) / ((ss / n) * (ss / n))
    return mom.select(
        "p_brand",
        n.cast("bigint").alias("n_months"),
        F.round(so / n, 4).alias("order_mean"),
        F.round(ss / n, 4).alias("ship_mean"),
        F.round(ocv2, 6).alias("order_cv2"),
        F.round(scv2, 6).alias("ship_cv2"),
        F.round(scv2 / ocv2, 6).alias("bullwhip"),
    ).orderBy("p_brand")


# -- q_output_file_planner ---------------------------------------------
#
# Writer planning table: per ship-year, the EXACT serialized-size
# estimate of the lineitem slice under a documented width model
# (8 B per BIGINT/DOUBLE, 4 B per INT/DATE-ish, octet_length + 4 per
# string) and the derived write plan — how many 128 MiB output files,
# rows per file, and the maxRecordsPerFile knob value. All integer
# arithmetic end to end (BIGINT byte sums, ceil via (x+M-1) DIV M), so
# the plan is bit-identical on both engines. The query-shaped twin of
# the §2.H writer knobs / compaction capabilities: the numbers a real
# pipeline would feed into sources/io.py's writer options. Scale: one
# scan, map-side partial agg to |years| rows.

FILEPLAN_SQL = """
WITH w AS (
  SELECT CAST(strftime(CAST(l_shipdate AS DATE), '%Y') AS BIGINT) AS yr,
         CAST(8 * 4 + 4 + 8 * 4 + 8
              + strlen(l_returnflag) + 4
              + strlen(l_linestatus) + 4 AS BIGINT) AS bytes
  FROM lineitem
), agg AS (
  SELECT yr, COUNT(*) AS rows_, SUM(bytes) AS total_bytes
  FROM w GROUP BY 1
)
SELECT yr AS ship_year,
       CAST(rows_ AS BIGINT) AS n_rows,
       CAST(total_bytes AS BIGINT) AS est_bytes,
       round(CAST(total_bytes AS DOUBLE) / rows_, 2) AS bytes_per_row,
       CAST((total_bytes + 134217727) // 134217728 AS BIGINT)
         AS files_128mb,
       CAST((rows_ + (total_bytes + 134217727) // 134217728 - 1)
            // ((total_bytes + 134217727) // 134217728) AS BIGINT)
         AS rows_per_file
FROM agg
ORDER BY ship_year
"""


@query("q_output_file_planner", oracle=FILEPLAN_SQL)
def q_output_file_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    bytes_ = (
        F.lit(8 * 4 + 4 + 8 * 4 + 8)
        + F.octet_length("l_returnflag") + 4
        + F.octet_length("l_linestatus") + 4
    ).cast("bigint")
    agg = (
        li.select(
            F.year(F.col("l_shipdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
            bytes_.alias("bytes"),
        )
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("rows_"),
            F.sum("bytes").alias("total_bytes"),
        )
    )
    m = F.lit(134217728).cast("bigint")
    files = F.expr("(total_bytes + 134217727) div 134217728")
    return agg.select(
        F.col("yr").alias("ship_year"),
        F.col("rows_").cast("bigint").alias("n_rows"),
        F.col("total_bytes").cast("bigint").alias("est_bytes"),
        F.round(
            F.col("total_bytes").cast("double") / F.col("rows_"), 2
        ).alias("bytes_per_row"),
        files.cast("bigint").alias("files_128mb"),
        F.expr(
            "(rows_ + (total_bytes + 134217727) div 134217728 - 1)"
            " div ((total_bytes + 134217727) div 134217728)"
        )
        .cast("bigint")
        .alias("rows_per_file"),
    ).orderBy("ship_year")


# -- mr_betweenness ----------------------------------------------------
#
# Sampled-source Brandes betweenness centrality on the customer ⋈
# supplier bipartite graph (the same edge set as mr_bfs): from each
# sampled source (suppliers with key % 50 = 0) a 3-level BFS computes
# shortest-path counts sigma level by level (bipartite alternation
# means the only de-dup needed is the source itself at level 2 and
# level-1 customers at level 3), then the dependency accumulation
# delta(v) = sum_w sigma(v)/sigma(w) * (1 + delta(w)) runs backward
# over the SAME level tables; bc(v) = sum over sources of delta(v).
# Every delta term is 9-rounded decimal before the exact per-node
# fold, so the accumulation is order-independent and cross-engine
# identical. Depth-3 truncation is the documented estimator (it is
# exact for all pairs within 3 hops of a source) — the same fixed-
# round contract as mr_bfs. Scale: each round is one join of the
# frontier against the edge table; pair state is |sources| x |reached|.

MRBETW_SQL = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), l0 AS (
  SELECT DISTINCT src AS s, src AS node, CAST(1 AS BIGINT) AS sigma
  FROM edges
  WHERE src LIKE 's%' AND CAST(substr(src, 2) AS BIGINT) % 50 = 0
    AND CAST(substr(src, 2) AS BIGINT) <= 500
), l1 AS (
  SELECT l0.s, e.dst AS node, CAST(SUM(l0.sigma) AS BIGINT) AS sigma
  FROM l0 JOIN edges e ON e.src = l0.node
  GROUP BY 1, 2
), l2 AS (
  SELECT l1.s, e.dst AS node, CAST(SUM(l1.sigma) AS BIGINT) AS sigma
  FROM l1 JOIN edges e ON e.src = l1.node
  WHERE e.dst <> l1.s
  GROUP BY 1, 2
), l3 AS (
  SELECT l2.s, e.dst AS node, CAST(SUM(l2.sigma) AS BIGINT) AS sigma
  FROM l2 JOIN edges e ON e.src = l2.node
  LEFT JOIN l1 seen ON seen.s = l2.s AND seen.node = e.dst
  WHERE seen.node IS NULL
  GROUP BY 1, 2
), d2 AS (
  SELECT l2.s, l2.node,
         CAST(SUM(CAST(round(l2.sigma / CAST(w.sigma AS DOUBLE), 9)
                       AS DECIMAL(20,9))) AS DECIMAL(28,9)) AS delta
  FROM l2 JOIN edges e ON e.src = l2.node
  JOIN l3 w ON w.s = l2.s AND w.node = e.dst
  GROUP BY 1, 2
), d1 AS (
  SELECT l1.s, l1.node,
         CAST(SUM(CAST(round(l1.sigma / CAST(w.sigma AS DOUBLE)
                             * (1 + CAST(COALESCE(d2.delta, 0) AS DOUBLE)),
                             9) AS DECIMAL(20,9))) AS DECIMAL(28,9)) AS delta
  FROM l1 JOIN edges e ON e.src = l1.node
  JOIN l2 w ON w.s = l1.s AND w.node = e.dst
  LEFT JOIN d2 ON d2.s = w.s AND d2.node = w.node
  GROUP BY 1, 2
), alldelta AS (
  SELECT s, node, delta FROM d1
  UNION ALL SELECT s, node, delta FROM d2
), bc AS (
  SELECT node, CAST(SUM(delta) AS DECIMAL(38,9)) AS bc,
         COUNT(*) AS n_sources
  FROM alldelta GROUP BY 1
), ranked AS (
  SELECT node, bc, n_sources,
         ROW_NUMBER() OVER (ORDER BY bc DESC, node) AS rk
  FROM bc
)
SELECT CAST(rk AS BIGINT) AS rk, node,
       round(CAST(bc AS DOUBLE), 6) AS betweenness,
       CAST(n_sources AS BIGINT) AS n_sources
FROM ranked WHERE rk <= 15
ORDER BY rk
"""


@query("mr_betweenness", oracle=MRBETW_SQL)
def mr_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    e0 = (
        c.orders.join(
            c.lineitem.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    l0 = (
        edges.filter(
            F.col("src").startswith("s")
            & (F.expr("CAST(substr(src, 2) AS BIGINT)") % 50 == 0)
            & (F.expr("CAST(substr(src, 2) AS BIGINT)") <= 500)
        )
        .select(F.col("src").alias("s"), F.col("src").alias("node"))
        .distinct()
        .withColumn("sigma", F.lit(1).cast("bigint"))
        .localCheckpoint()
    )

    def expand(level: DataFrame) -> DataFrame:
        # Frontier broadcasts to the (unshuffled) edge table — the
        # mr_bfs scale shape: edges never re-sort, only the expansion
        # output shuffles for its groupBy.
        lv, e = F.broadcast(level.alias("lv")), edges.alias("e")
        return (
            lv.join(e, F.col("lv.node") == F.col("e.src"))
            .groupBy(F.col("lv.s").alias("s"), F.col("e.dst").alias("node"))
            .agg(F.sum(F.col("lv.sigma")).cast("bigint").alias("sigma"))
        )

    l1 = expand(l0).localCheckpoint()
    l2 = (
        l0.select(F.col("s").alias("s0"))
        .distinct()
        .join(expand(l1), F.col("s0") == F.col("s"))
        .filter(F.col("node") != F.col("s0"))
        .select("s", "node", "sigma")
        .localCheckpoint()
    )
    l3 = (
        expand(l2)
        .join(
            F.broadcast(
                l1.select(
                    F.col("s").alias("s_"), F.col("node").alias("node_")
                )
            ),
            (F.col("s") == F.col("s_")) & (F.col("node") == F.col("node_")),
            "left_anti",
        )
        .localCheckpoint()
    )

    def accumulate(level: DataFrame, nxt: DataFrame) -> DataFrame:
        v = level.alias("v")
        w = nxt.alias("w")
        joined = (
            F.broadcast(v)
            .join(edges.alias("e"), F.col("v.node") == F.col("e.src"))
            .join(
                F.broadcast(w),
                (F.col("w.s") == F.col("v.s"))
                & (F.col("w.node") == F.col("e.dst")),
            )
        )
        term = F.round(
            F.col("v.sigma") / F.col("w.sigma").cast("double")
            * (
                1
                + F.coalesce(F.col("w.delta"), F.lit(0)).cast("double")
            ),
            9,
        ).cast("decimal(20,9)")
        return joined.groupBy(
            F.col("v.s").alias("s"), F.col("v.node").alias("node")
        ).agg(F.sum(term).cast("decimal(28,9)").alias("delta"))

    d2 = accumulate(
        l2, l3.withColumn("delta", F.lit(None).cast("decimal(28,9)"))
    ).localCheckpoint()
    l2d = l2.join(d2.select("s", "node", "delta"), ["s", "node"], "left")
    d1 = accumulate(l1, l2d)
    alldelta = d1.select("s", "node", "delta").union(
        d2.select("s", "node", "delta")
    )
    bc = alldelta.groupBy("node").agg(
        F.sum("delta").cast("decimal(38,9)").alias("bc"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    ranked = bc.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("bc").desc(), "node"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 15)
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            "node",
            F.round(F.col("bc").cast("double"), 6).alias("betweenness"),
            F.col("n_sources").cast("bigint").alias("n_sources"),
        )
        .orderBy("rk")
    )


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


# -- q_lorenz_asymmetry ------------------------------------------------
#
# Lorenz asymmetry coefficient S = F(mu) + L(mu) per market segment on
# per-customer spend: F(mu) = share of customers at-or-below the mean,
# L(mu) = share of total spend they hold. S < 1 means inequality is
# driven by many small customers, S > 1 by a few whales — the SHAPE
# diagnostic that q_gini's single area number cannot distinguish
# (Damgaard & Weiner 2000). Spend is an exact per-customer decimal
# fold; the mean is one double; the below-mean partition compares
# exact decimals to it identically on both engines. Scale: fact scan
# -> |customers| grid -> |segments| rows.

LORENZ_ASYM_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), mu AS (
  SELECT seg, COUNT(*) AS n,
         CAST(SUM(s) AS DECIMAL(30,2)) AS tot,
         CAST(SUM(s) AS DOUBLE) / COUNT(*) AS m
  FROM spend GROUP BY 1
)
SELECT spend.seg,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       round(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN 1 ELSE 0 END)
             / CAST(MAX(n) AS DOUBLE), 6) AS f_mu,
       round(CAST(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN s
                           ELSE CAST(0 AS DECIMAL(24,2)) END) AS DOUBLE)
             / CAST(MAX(tot) AS DOUBLE), 6) AS l_mu,
       round(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN 1 ELSE 0 END)
             / CAST(MAX(n) AS DOUBLE)
             + CAST(SUM(CASE WHEN CAST(s AS DOUBLE) <= m THEN s
                             ELSE CAST(0 AS DECIMAL(24,2)) END) AS DOUBLE)
               / CAST(MAX(tot) AS DOUBLE), 6) AS lorenz_s
FROM spend JOIN mu ON mu.seg = spend.seg
GROUP BY spend.seg
ORDER BY spend.seg
"""


@query("q_lorenz_asymmetry", oracle=LORENZ_ASYM_SQL)
def q_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s"))
    )
    mu = spend.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").cast("decimal(30,2)").alias("tot"),
        (F.sum("s").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    below = F.col("s").cast("double") <= F.col("m")
    zero = F.lit(0).cast("decimal(24,2)")
    j = spend.join(F.broadcast(mu), "seg")
    f_mu = F.sum(F.when(below, 1).otherwise(0)) / F.max("n").cast("double")
    l_mu = F.sum(F.when(below, F.col("s")).otherwise(zero)).cast(
        "double"
    ) / F.max("tot").cast("double")
    return (
        j.groupBy("seg")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.round(f_mu, 6).alias("f_mu"),
            F.round(l_mu, 6).alias("l_mu"),
            F.round(f_mu + l_mu, 6).alias("lorenz_s"),
        )
        .orderBy("seg")
    )


# -- q_energy_distance -------------------------------------------------
#
# Szekely energy-distance two-sample test between AUTOMOBILE and
# BUILDING per-customer spend — the E-statistic D^2 = 2E|X-Y| -
# E|X-X'| - E|Y-Y'| that detects ANY distributional difference (not
# just location like Mann-Whitney, nor max-gap like KS). The naive
# form is O(n*m) pairwise; here each double sum collapses to EXACT
# rank prefix algebra on the sorted pooled sample: within-sample
# sum|xi-xj| = 2*sum_k x_(k)*(2k-n-1), and cross-sample sum|xi-yj| =
# sum_i [x_i*(2c_i - m) + S_y - 2P_i] with c_i/P_i the cumulative
# count/sum of y-values <= x_i off ONE pooled window pass (y sorts
# before x at ties; tied pairs contribute 0 either way). Everything
# is decimal * integer-rank — exact until the three final divisions.
# T = nm/(n+m) * D^2 is the test statistic. Scale: fact scan ->
# |customers| grid -> pooled-grid windows.

ENERGY_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
  GROUP BY 1, 2
), xs AS (
  SELECT s, CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END AS is_x,
         o_custkey AS k
  FROM spend
), nn AS (
  SELECT SUM(is_x) AS n, SUM(1 - is_x) AS m,
         CAST(SUM(CASE WHEN is_x = 0 THEN s
                       ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DECIMAL(30,2)) AS sy
  FROM xs
), w2 AS (
  SELECT is_x,
         s * CAST(2 * ROW_NUMBER() OVER (PARTITION BY is_x ORDER BY s, k)
                  - COUNT(*) OVER (PARTITION BY is_x) - 1 AS BIGINT) AS t
  FROM xs
), wsum AS (
  SELECT CAST(SUM(CASE WHEN is_x = 1 THEN t END) AS DECIMAL(38,2)) AS sxx2,
         CAST(SUM(CASE WHEN is_x = 0 THEN t END) AS DECIMAL(38,2)) AS syy2
  FROM w2
), pooled AS (
  SELECT s, is_x,
         COALESCE(CAST(SUM(CASE WHEN is_x = 0 THEN 1 END) OVER
             (ORDER BY s, is_x, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT), 0) AS cy,
         COALESCE(CAST(SUM(CASE WHEN is_x = 0 THEN s END) OVER
             (ORDER BY s, is_x, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DECIMAL(30,2)), CAST(0 AS DECIMAL(30,2))) AS py
  FROM xs
), xonly AS (
  SELECT CAST(SUM(s * CAST(2 * cy AS BIGINT)) AS DECIMAL(38,2)) AS s2cy,
         CAST(SUM(s) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(2 AS BIGINT) * py) AS DECIMAL(38,2)) AS s2py
  FROM pooled WHERE is_x = 1
), fin AS (
  SELECT n, m,
         CAST(s2cy AS DOUBLE) - CAST(sx AS DOUBLE) * m
           + n * CAST(sy AS DOUBLE) - CAST(s2py AS DOUBLE) AS sxy,
         CAST(sxx2 AS DOUBLE) AS sxx2, CAST(syy2 AS DOUBLE) AS syy2
  FROM xonly CROSS JOIN nn CROSS JOIN wsum
)
SELECT CAST(n AS BIGINT) AS n_x, CAST(m AS BIGINT) AS n_y,
       round(sxy / (n * CAST(m AS DOUBLE)), 4) AS e_xy,
       round(sxx2 / (n * CAST(n AS DOUBLE)), 4) AS e_xx,
       round(syy2 / (m * CAST(m AS DOUBLE)), 4) AS e_yy,
       round(2 * sxy / (n * CAST(m AS DOUBLE))
             - sxx2 / (n * CAST(n AS DOUBLE))
             - syy2 / (m * CAST(m AS DOUBLE)), 4) AS energy_d2,
       round((n * CAST(m AS DOUBLE) / (n + m))
             * (2 * sxy / (n * CAST(m AS DOUBLE))
                - sxx2 / (n * CAST(n AS DOUBLE))
                - syy2 / (m * CAST(m AS DOUBLE))), 4) AS t_stat
FROM fin
"""


@query("q_energy_distance", oracle=ENERGY_SQL)
def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.orders.join(
            F.broadcast(
                cat.customer.filter(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
                ).select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s"))
    )
    xs = spend.select(
        "s",
        F.when(F.col("seg") == "AUTOMOBILE", 1).otherwise(0).alias("is_x"),
        F.col("o_custkey").alias("k"),
    ).localCheckpoint()
    zero2 = F.lit(0).cast("decimal(24,2)")
    nn = xs.agg(
        F.sum("is_x").alias("n"),
        F.sum(1 - F.col("is_x")).alias("m"),
        F.sum(F.when(F.col("is_x") == 0, F.col("s")).otherwise(zero2))
        .cast("decimal(30,2)")
        .alias("sy"),
    )
    ww = Window.partitionBy("is_x")
    t = F.col("s") * (
        2 * F.row_number().over(ww.orderBy("s", "k"))
        - F.count(F.lit(1)).over(ww)
        - 1
    ).cast("bigint")
    w2 = xs.select("is_x", t.alias("t"))
    wsum = w2.agg(
        F.sum(F.when(F.col("is_x") == 1, F.col("t")))
        .cast("decimal(38,2)")
        .alias("sxx2"),
        F.sum(F.when(F.col("is_x") == 0, F.col("t")))
        .cast("decimal(38,2)")
        .alias("syy2"),
    )
    wp = Window.orderBy("s", "is_x", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pooled = xs.select(
        "s", "is_x",
        F.coalesce(
            F.sum(F.when(F.col("is_x") == 0, 1)).over(wp).cast("bigint"),
            F.lit(0),
        ).alias("cy"),
        F.coalesce(
            F.sum(F.when(F.col("is_x") == 0, F.col("s")))
            .over(wp)
            .cast("decimal(30,2)"),
            F.lit(0).cast("decimal(30,2)"),
        ).alias("py"),
    )
    xonly = pooled.filter(F.col("is_x") == 1).agg(
        F.sum(F.col("s") * (2 * F.col("cy")).cast("bigint"))
        .cast("decimal(38,2)")
        .alias("s2cy"),
        F.sum("s").cast("decimal(38,2)").alias("sx"),
        F.sum(F.lit(2).cast("bigint") * F.col("py"))
        .cast("decimal(38,2)")
        .alias("s2py"),
    )
    n, m = F.col("n"), F.col("m")
    j = xonly.join(F.broadcast(nn)).join(F.broadcast(wsum))
    sxy = (
        F.col("s2cy").cast("double")
        - F.col("sx").cast("double") * m
        + n * F.col("sy").cast("double")
        - F.col("s2py").cast("double")
    )
    e_xy = sxy / (n * m.cast("double"))
    e_xx = F.col("sxx2").cast("double") / (n * n.cast("double"))
    e_yy = F.col("syy2").cast("double") / (m * m.cast("double"))
    d2 = 2 * e_xy - e_xx - e_yy
    return j.select(
        n.cast("bigint").alias("n_x"),
        m.cast("bigint").alias("n_y"),
        F.round(e_xy, 4).alias("e_xy"),
        F.round(e_xx, 4).alias("e_xx"),
        F.round(e_yy, 4).alias("e_yy"),
        F.round(d2, 4).alias("energy_d2"),
        F.round((n * m.cast("double") / (n + m)) * d2, 4).alias("t_stat"),
    )


# -- q_threshold_opt ---------------------------------------------------
#
# Decision-threshold optimization for the q_auc_roc / q_calibration_ece
# propensity model: for every distinct score on the eval half, the
# confusion counts of "predict purchase iff score >= t" come from ONE
# descending suffix-sum window over the <=10-row score grid, and the
# table reports TPR/FPR/precision/F1/Youden-J per threshold with
# deterministic argmax flags (metric desc, threshold desc). AUC says
# the model ranks; this picks the operating point. Counts are exact
# BIGINTs; the ratio block is the only double chain, 6-rounded.

THRESH_SPLIT = "2024-01-16"

THRESH_SQL = f"""
WITH ev AS (
  SELECT LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS vbin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(ts AS DATE) < DATE '{THRESH_SPLIT}' THEN 1 ELSE 0
           END AS is_train
  FROM events WHERE value IS NOT NULL
), model AS (
  SELECT vbin,
         CAST(round(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(8,6))
           AS score
  FROM ev WHERE is_train = 1 GROUP BY 1
), scored AS (
  SELECT m.score, e.y FROM ev e JOIN model m ON m.vbin = e.vbin
  WHERE e.is_train = 0
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
), tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS p,
         CAST(SUM(cnt - pos) AS BIGINT) AS nneg
  FROM g
), sfx AS (
  SELECT score,
         CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
         CAST(SUM(cnt - pos) OVER (ORDER BY score DESC) AS BIGINT) AS fp
  FROM g
), m2 AS (
  SELECT CAST(score AS DOUBLE) AS threshold, tp, fp,
         p - tp AS fn, nneg - fp AS tn,
         tp / CAST(p AS DOUBLE) AS tpr,
         fp / CAST(nneg AS DOUBLE) AS fpr,
         CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) END
           AS prec,
         CASE WHEN 2 * tp + fp + p - tp > 0
              THEN 2 * tp / CAST(2 * tp + fp + (p - tp) AS DOUBLE) END
           AS f1,
         tp / CAST(p AS DOUBLE) - fp / CAST(nneg AS DOUBLE) AS j
  FROM sfx CROSS JOIN tot
), flagged AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY round(j, 6) DESC, threshold DESC)
           AS rj,
         ROW_NUMBER() OVER (ORDER BY round(COALESCE(f1, -1), 6) DESC,
                            threshold DESC) AS rf
  FROM m2
)
SELECT round(threshold, 6) AS threshold, tp, fp, fn, tn,
       round(tpr, 6) AS tpr, round(fpr, 6) AS fpr,
       round(prec, 6) AS precision_, round(f1, 6) AS f1,
       round(j, 6) AS youden_j,
       CAST(CASE WHEN rj = 1 THEN 1 ELSE 0 END AS BIGINT) AS best_j,
       CAST(CASE WHEN rf = 1 THEN 1 ELSE 0 END AS BIGINT) AS best_f1
FROM flagged
ORDER BY threshold
"""


@query("q_threshold_opt", oracle=THRESH_SQL)
def q_threshold_opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ev = e.filter(F.col("value").isNotNull()).select(
        F.least(
            F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)
        ).alias("vbin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (F.to_date("ts") < F.lit(THRESH_SPLIT)).cast("int").alias("is_train"),
    )
    model = (
        ev.filter(F.col("is_train") == 1)
        .groupBy("vbin")
        .agg(
            F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 6)
            .cast("decimal(8,6)")
            .alias("score")
        )
    )
    scored = (
        ev.filter(F.col("is_train") == 0)
        .join(F.broadcast(model), "vbin")
        .select("score", "y")
    )
    g = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("nneg"),
    )
    wd = Window.orderBy(F.col("score").desc())
    sfx = g.select(
        "score",
        F.sum("pos").over(wd).cast("bigint").alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(wd).cast("bigint")
        .alias("fp"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    p, nneg = F.col("p"), F.col("nneg")
    m2 = sfx.join(F.broadcast(tot)).select(
        F.col("score").cast("double").alias("threshold"),
        tp, fp,
        (p - tp).alias("fn"),
        (nneg - fp).alias("tn"),
        (tp / p.cast("double")).alias("tpr"),
        (fp / nneg.cast("double")).alias("fpr"),
        F.when(tp + fp > 0, tp / (tp + fp).cast("double")).alias("prec"),
        F.when(
            2 * tp + fp + (p - tp) > 0,
            2 * tp / (2 * tp + fp + (p - tp)).cast("double"),
        ).alias("f1"),
        (tp / p.cast("double") - fp / nneg.cast("double")).alias("j"),
    )
    flagged = m2.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.round("j", 6).desc(), F.col("threshold").desc()))
        .alias("rj"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round(F.coalesce("f1", F.lit(-1.0)), 6).desc(),
                F.col("threshold").desc(),
            )
        )
        .alias("rf"),
    )
    return flagged.select(
        F.round("threshold", 6).alias("threshold"),
        "tp", "fp", "fn", "tn",
        F.round("tpr", 6).alias("tpr"),
        F.round("fpr", 6).alias("fpr"),
        F.round("prec", 6).alias("precision_"),
        F.round("f1", 6).alias("f1"),
        F.round("j", 6).alias("youden_j"),
        F.when(F.col("rj") == 1, 1).otherwise(0).cast("bigint")
        .alias("best_j"),
        F.when(F.col("rf") == 1, 1).otherwise(0).cast("bigint")
        .alias("best_f1"),
    ).orderBy("threshold")


# -- q_p_chart ---------------------------------------------------------
#
# Attribute control chart (p-chart) for the monthly return-rate of
# shipped lines: centerline p-bar = total returns / total lines, and
# per-month 3-sigma limits p-bar +- 3*sqrt(p-bar(1-p-bar)/n_i) that
# WIDEN for thin months (the varying-n limits that make a p-chart a
# p-chart, vs q_xmr_chart's fixed individuals limits). Counts are
# exact BIGINTs off one scan; the limit algebra is one identical
# double chain, 6-rounded; out-of-control flags compare the exact
# monthly ratio to the rounded limits on both engines identically.

P_CHART_SQL = """
WITH m AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS pbar FROM m
)
SELECT mon,
       n AS n_lines, x AS n_returns,
       round(x / CAST(n AS DOUBLE), 6) AS p,
       round(pbar, 6) AS p_bar,
       round(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 6) AS ucl,
       round(GREATEST(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0.0), 6)
         AS lcl,
       CAST(CASE WHEN x / CAST(n AS DOUBLE)
                      > round(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 6)
                 OR x / CAST(n AS DOUBLE)
                      < round(GREATEST(pbar - 3 * sqrt(pbar * (1 - pbar)
                                       / n), 0.0), 6)
            THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM m CROSS JOIN tot
ORDER BY mon
"""


@query("q_p_chart", oracle=P_CHART_SQL)
def q_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    m = li.groupBy(
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
        .alias("mon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    tot = m.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("pbar")
    )
    n, x, pbar = F.col("n"), F.col("x"), F.col("pbar")
    sig = 3 * F.sqrt(pbar * (1 - pbar) / n)
    ucl = F.round(pbar + sig, 6)
    lcl = F.round(F.greatest(pbar - sig, F.lit(0.0)), 6)
    p = x / n.cast("double")
    return (
        m.join(F.broadcast(tot))
        .select(
            "mon",
            n.alias("n_lines"),
            x.alias("n_returns"),
            F.round(p, 6).alias("p"),
            F.round(pbar, 6).alias("p_bar"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            F.when((p > ucl) | (p < lcl), 1).otherwise(0).cast("bigint")
            .alias("out_of_control"),
        )
        .orderBy("mon")
    )


# -- q_huber_m ---------------------------------------------------------
#
# One-step Huber M-estimator of location per event type (k = 1.345,
# MAD scale): start at the median, clip residuals at +-k*1.4826*MAD,
# and average the clipped sample — the 95%-efficient robust center
# that q_winsorize's fixed-percentile trim approximates without a
# breakdown guarantee. Median/MAD via the house interpolated-quantile
# + round pattern (identical on both engines); each clipped value is
# 8-rounded decimal so the mean's numerator folds exactly. Reports
# the clipped-tail count as the contamination diagnostic. Scale: one
# scan -> per-type quantiles -> one conditional aggregate.

HUBER_SQL = """
WITH v AS (
  SELECT event_type, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_type, round(quantile_cont(x, 0.5), 6) AS med
  FROM v GROUP BY 1
), d AS (
  SELECT v.event_type, v.x, med.med, abs(v.x - med.med) AS dev
  FROM v JOIN med ON v.event_type = med.event_type
), s AS (
  SELECT event_type, round(1.4826 * quantile_cont(dev, 0.5), 6) AS scale
  FROM d GROUP BY 1
), clip AS (
  SELECT d.event_type, d.med, s.scale,
         CAST(round(d.med + LEAST(GREATEST(d.x - d.med,
                                           -1.345 * s.scale),
                                  1.345 * s.scale), 8)
              AS DECIMAL(18,8)) AS cx,
         CASE WHEN abs(d.x - d.med) > 1.345 * s.scale THEN 1 ELSE 0 END
           AS clipped
  FROM d JOIN s ON d.event_type = s.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(med) AS median,
       MAX(scale) AS scale,
       round(CAST(SUM(cx) AS DOUBLE) / COUNT(*), 6) AS huber_mu,
       CAST(SUM(clipped) AS BIGINT) AS n_clipped
FROM clip
GROUP BY event_type
ORDER BY event_type
"""


@query("q_huber_m", oracle=HUBER_SQL)
def q_huber_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("x")
    )
    med = v.groupBy("event_type").agg(
        F.round(F.percentile("x", F.lit(0.5)), 6).alias("med")
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type", "x", "med",
        F.abs(F.col("x") - F.col("med")).alias("dev"),
    )
    s = d.groupBy("event_type").agg(
        F.round(1.4826 * F.percentile("dev", F.lit(0.5)), 6).alias("scale")
    )
    k = 1.345
    clip = d.join(F.broadcast(s), "event_type").select(
        "event_type", "med", "scale",
        F.round(
            F.col("med")
            + F.least(
                F.greatest(
                    F.col("x") - F.col("med"), -k * F.col("scale")
                ),
                k * F.col("scale"),
            ),
            8,
        )
        .cast("decimal(18,8)")
        .alias("cx"),
        F.when(
            F.abs(F.col("x") - F.col("med")) > k * F.col("scale"), 1
        )
        .otherwise(0)
        .alias("clipped"),
    )
    return (
        clip.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("med").alias("median"),
            F.max("scale").alias("scale"),
            F.round(
                F.sum("cx").cast("double") / F.count(F.lit(1)), 6
            ).alias("huber_mu"),
            F.sum("clipped").cast("bigint").alias("n_clipped"),
        )
        .orderBy("event_type")
    )


# -- q_location_quotient -----------------------------------------------
#
# Regional-economics concentration table: location quotient
# LQ(nation, segment) = local segment share / global segment share
# (LQ > 1 = the nation over-indexes on that segment) plus the
# per-nation Krugman specialization index K = sum_s |local share -
# global share| (0 = mirror of the world, 2 = fully specialized).
# Exact BIGINT counts from one scan; shares and LQ are identical
# double chains, 12-rounded Krugman terms folded exactly. The
# cell-level view that q_dissimilarity_index's global numbers
# summarize.

LQ_SQL = """
WITH g AS (
  SELECT n_name, c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), w AS (
  SELECT n_name, seg, c,
         SUM(c) OVER (PARTITION BY n_name) AS cn,
         SUM(c) OVER (PARTITION BY seg) AS cs,
         SUM(c) OVER () AS ct
  FROM g
), k AS (
  SELECT n_name,
         CAST(SUM(CAST(round(abs(c / CAST(cn AS DOUBLE)
                                 - cs / CAST(ct AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS krugman
  FROM w GROUP BY 1
)
SELECT w.n_name, w.seg,
       w.c AS n_customers,
       round(w.c / CAST(w.cn AS DOUBLE), 6) AS local_share,
       round(w.cs / CAST(w.ct AS DOUBLE), 6) AS global_share,
       round((w.c / CAST(w.cn AS DOUBLE))
             / (w.cs / CAST(w.ct AS DOUBLE)), 6) AS lq,
       round(k.krugman, 6) AS krugman_nation
FROM w JOIN k ON k.n_name = w.n_name
ORDER BY w.n_name, w.seg
"""


@query("q_location_quotient", oracle=LQ_SQL)
def q_location_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    g = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = g.select(
        "n_name", "seg", "c",
        F.sum("c").over(Window.partitionBy("n_name")).alias("cn"),
        F.sum("c").over(Window.partitionBy("seg")).alias("cs"),
        F.sum("c").over(
            Window.partitionBy().orderBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("ct"),
    ).localCheckpoint()
    c, cn, cs, ct = (F.col(x) for x in ["c", "cn", "cs", "ct"])
    k = (
        w.select(
            "n_name",
            F.round(
                F.abs(c / cn.cast("double") - cs / ct.cast("double")), 12
            )
            .cast("decimal(16,12)")
            .alias("t"),
        )
        .groupBy("n_name")
        .agg(F.sum("t").cast("double").alias("krugman"))
    )
    return (
        w.join(k, "n_name")
        .select(
            "n_name", "seg",
            c.alias("n_customers"),
            F.round(c / cn.cast("double"), 6).alias("local_share"),
            F.round(cs / ct.cast("double"), 6).alias("global_share"),
            F.round(
                (c / cn.cast("double")) / (cs / ct.cast("double")), 6
            ).alias("lq"),
            F.round(F.col("krugman"), 6).alias("krugman_nation"),
        )
        .orderBy("n_name", "seg")
    )


# -- q_slo_burn_rate ---------------------------------------------------
#
# SRE error-budget burn-rate table over the event stream: treating
# value > 450 as a "bad" request against a 95% SLO (5% budget), each
# day reports the trailing 1d / 7d / 28d bad-rate divided by the
# budget — the multi-window, multi-burn-rate alert rule (Google SRE
# workbook ch.5) where the fast window catches cliffs and the slow
# window filters blips. Day grid is zero-filled from one calendar
# sequence; window numerators/denominators are exact BIGINT sums
# over ROWS frames; the burn ratios are the only doubles, 6-rounded.
# Alert fires when BOTH the 1d and 7d burns exceed 2x. Scale: fact
# scan partial-aggregates to |days|; windows run on the tiny grid.

SLO_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax
  FROM events
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), d0 AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         SUM(CASE WHEN value > 450 THEN 1 ELSE 0 END) AS bad
  FROM events GROUP BY 1
), grid AS (
  SELECT days.day,
         CAST(COALESCE(d0.n, 0) AS BIGINT) AS n,
         CAST(COALESCE(d0.bad, 0) AS BIGINT) AS bad
  FROM days LEFT JOIN d0 ON d0.day = days.day
), w AS (
  SELECT day, n, bad,
         CAST(SUM(n) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7,
         CAST(SUM(bad) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS b7,
         CAST(SUM(n) OVER (ORDER BY day
              ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS n28,
         CAST(SUM(bad) OVER (ORDER BY day
              ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS b28
  FROM grid
)
SELECT strftime(day, '%Y-%m-%d') AS day, n AS n_events, bad AS n_bad,
       round(CASE WHEN n > 0 THEN bad / (0.05 * n) END, 6) AS burn_1d,
       round(CASE WHEN n7 > 0 THEN b7 / (0.05 * n7) END, 6) AS burn_7d,
       round(CASE WHEN n28 > 0 THEN b28 / (0.05 * n28) END, 6)
         AS burn_28d,
       CAST(CASE WHEN n > 0 AND n7 > 0
                  AND bad / (0.05 * n) > 2 AND b7 / (0.05 * n7) > 2
            THEN 1 ELSE 0 END AS BIGINT) AS alert
FROM w
ORDER BY day
"""


@query("q_slo_burn_rate", oracle=SLO_SQL)
def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    day = F.col("ts").cast("date")
    bounds = e.agg(F.min(day).alias("dmin"), F.max(day).alias("dmax"))
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    d0 = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 450, 1).otherwise(0)).alias("bad"),
    )
    grid = days.join(d0, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("bad", F.lit(0)).cast("bigint").alias("bad"),
    )
    wo = Window.orderBy("day")
    w7 = wo.rowsBetween(-6, 0)
    w28 = wo.rowsBetween(-27, 0)
    w = grid.select(
        "day", "n", "bad",
        F.sum("n").over(w7).cast("bigint").alias("n7"),
        F.sum("bad").over(w7).cast("bigint").alias("b7"),
        F.sum("n").over(w28).cast("bigint").alias("n28"),
        F.sum("bad").over(w28).cast("bigint").alias("b28"),
    )
    n, bad = F.col("n"), F.col("bad")
    n7, b7 = F.col("n7"), F.col("b7")
    n28, b28 = F.col("n28"), F.col("b28")
    burn1 = F.when(n > 0, bad / (0.05 * n))
    burn7 = F.when(n7 > 0, b7 / (0.05 * n7))
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        n.alias("n_events"),
        bad.alias("n_bad"),
        F.round(burn1, 6).alias("burn_1d"),
        F.round(burn7, 6).alias("burn_7d"),
        F.round(F.when(n28 > 0, b28 / (0.05 * n28)), 6).alias("burn_28d"),
        F.when(
            (n > 0) & (n7 > 0) & (burn1 > 2) & (burn7 > 2), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("alert"),
    ).orderBy("day")


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


# -- q_safety_stock ----------------------------------------------------
#
# Safety-stock and reorder-point policy per brand under demand AND
# lead-time uncertainty: SS = z * sqrt(Lbar * sigma_d^2 +
# dbar^2 * sigma_L^2) (z = 1.645 for a 95% cycle service level) with
# daily demand moments from a zero-filled calendar grid and lead-time
# moments from per-line order->ship day gaps — the standard
# formula (Silver-Pyck-Peterson) that q_newsvendor's single-period
# quantile answer doesn't give. Exact decimal demand sums and BIGINT
# day-gap sums; the sqrt chain is the only double algebra. Scale:
# two partial-aggregated fact scans to |brands| grids.

SAFETY_SQL = """
WITH f AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS sd,
         CAST(o_orderdate AS DATE) AS od,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
), bounds AS (
  SELECT MIN(sd) AS dmin, MAX(sd) AS dmax FROM f
), days AS (
  SELECT UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), brands AS (SELECT DISTINCT p_brand FROM f),
dd AS (
  SELECT p_brand, sd AS day, CAST(SUM(q) AS DECIMAL(24,2)) AS dq
  FROM f GROUP BY 1, 2
), grid AS (
  SELECT b.p_brand, d.day,
         COALESCE(dd.dq, CAST(0 AS DECIMAL(24,2))) AS dq
  FROM brands b CROSS JOIN days d
  LEFT JOIN dd ON dd.p_brand = b.p_brand AND dd.day = d.day
), dmom AS (
  SELECT p_brand, COUNT(*) AS nd,
         CAST(SUM(dq) AS DECIMAL(30,2)) AS s1,
         CAST(SUM(dq * dq) AS DECIMAL(38,4)) AS s2
  FROM grid GROUP BY 1
), lmom AS (
  SELECT p_brand, COUNT(*) AS nl,
         CAST(SUM(date_diff('day', od, sd)) AS BIGINT) AS l1,
         CAST(SUM(CAST(date_diff('day', od, sd) AS BIGINT)
                  * date_diff('day', od, sd)) AS BIGINT) AS l2
  FROM f GROUP BY 1
), fin AS (
  SELECT d.p_brand,
         CAST(d.s1 AS DOUBLE) / d.nd AS dbar,
         (CAST(d.s2 AS DOUBLE)
          - CAST(d.s1 AS DOUBLE) * CAST(d.s1 AS DOUBLE) / d.nd)
           / (d.nd - 1) AS var_d,
         CAST(l.l1 AS DOUBLE) / l.nl AS lbar,
         (CAST(l.l2 AS DOUBLE)
          - CAST(l.l1 AS DOUBLE) * CAST(l.l1 AS DOUBLE) / l.nl)
           / (l.nl - 1) AS var_l
  FROM dmom d JOIN lmom l ON l.p_brand = d.p_brand
)
SELECT p_brand,
       round(dbar, 4) AS daily_demand,
       round(sqrt(var_d), 4) AS sigma_demand,
       round(lbar, 4) AS lead_days,
       round(sqrt(var_l), 4) AS sigma_lead,
       round(1.645 * sqrt(lbar * var_d + dbar * dbar * var_l), 4)
         AS safety_stock,
       round(dbar * lbar
             + 1.645 * sqrt(lbar * var_d + dbar * dbar * var_l), 4)
         AS reorder_point
FROM fin
ORDER BY p_brand
"""


@query("q_safety_stock", oracle=SAFETY_SQL)
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.col("l_shipdate").cast("date").alias("sd"),
            F.col("o_orderdate").cast("date").alias("od"),
            dec("l_quantity").alias("q"),
        )
        .localCheckpoint()
    )
    bounds = f.agg(F.min("sd").alias("dmin"), F.max("sd").alias("dmax"))
    days = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    brands = f.select("p_brand").distinct()
    dd = f.groupBy("p_brand", F.col("sd").alias("day")).agg(
        F.sum("q").cast("decimal(24,2)").alias("dq")
    )
    zero = F.lit(0).cast("decimal(24,2)")
    grid = (
        brands.crossJoin(F.broadcast(days))
        .join(dd, ["p_brand", "day"], "left")
        .select("p_brand", "day", F.coalesce("dq", zero).alias("dq"))
    )
    dmom = grid.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dq").cast("decimal(30,2)").alias("s1"),
        F.sum(F.col("dq") * F.col("dq")).cast("decimal(38,4)").alias("s2"),
    )
    gap = F.datediff("sd", "od").cast("bigint")
    lmom = f.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum(gap).cast("bigint").alias("l1"),
        F.sum(gap * gap).cast("bigint").alias("l2"),
    )
    j = dmom.join(lmom, "p_brand")
    nd, nl = F.col("nd"), F.col("nl")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    l1, l2 = F.col("l1").cast("double"), F.col("l2").cast("double")
    dbar = s1 / nd
    var_d = (s2 - s1 * s1 / nd) / (nd - 1)
    lbar = l1 / nl
    var_l = (l2 - l1 * l1 / nl) / (nl - 1)
    ss = 1.645 * F.sqrt(lbar * var_d + dbar * dbar * var_l)
    return j.select(
        "p_brand",
        F.round(dbar, 4).alias("daily_demand"),
        F.round(F.sqrt(var_d), 4).alias("sigma_demand"),
        F.round(lbar, 4).alias("lead_days"),
        F.round(F.sqrt(var_l), 4).alias("sigma_lead"),
        F.round(ss, 4).alias("safety_stock"),
        F.round(dbar * lbar + ss, 4).alias("reorder_point"),
    ).orderBy("p_brand")


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


# -- q_ridge_path ------------------------------------------------------
#
# Ridge regularization path for the two-feature revenue model
# (extendedprice ~ quantity + retailprice): closed-form 2x2 solve
# (X'X + lambda*n*I)^{-1} X'y on centered exact-decimal moments for
# lambda in {0, 0.01, 0.1, 1, 10} — the shrinkage trace that shows
# which coefficient survives regularization (q_vif tells you the
# collinearity; this shows the consequence). One fact scan builds the
# six moments; the path is 5 rows of identical double algebra off a
# broadcast 1-row aggregate, unpivoted via explode.

RIDGE_SQL = """
WITH f AS (
  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
         CAST(p_retailprice AS DECIMAL(18,2)) AS x2,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x1) AS DOUBLE) AS sx1, CAST(SUM(x2) AS DOUBLE) AS sx2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 * y AS DECIMAL(28,4))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 * y AS DECIMAL(28,4))) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
  FROM f
), cen AS (
  SELECT n, sy / n AS ybar,
         s11 - sx1 * sx1 / n AS c11,
         s12 - sx1 * sx2 / n AS c12,
         s22 - sx2 * sx2 / n AS c22,
         s1y - sx1 * sy / n AS c1y,
         s2y - sx2 * sy / n AS c2y,
         syy - sy * sy / n AS cyy,
         sx1 / n AS x1bar, sx2 / n AS x2bar
  FROM m
), lambdas AS (
  SELECT UNNEST([0.0, 0.01, 0.1, 1.0, 10.0]) AS lam
), solved AS (
  SELECT lam, n, ybar, x1bar, x2bar, cyy, c1y, c2y,
         (c1y * (c22 + lam * n) - c2y * c12)
           / ((c11 + lam * n) * (c22 + lam * n) - c12 * c12) AS b1,
         (c2y * (c11 + lam * n) - c1y * c12)
           / ((c11 + lam * n) * (c22 + lam * n) - c12 * c12) AS b2
  FROM cen CROSS JOIN lambdas
)
SELECT lam AS lambda,
       round(b1, 6) AS beta_quantity,
       round(b2, 6) AS beta_retailprice,
       round(ybar - b1 * x1bar - b2 * x2bar, 4) AS intercept,
       round((b1 * c1y + b2 * c2y) / cyy, 6) AS r2_train
FROM solved
ORDER BY lambda
"""


@query("q_ridge_path", oracle=RIDGE_SQL)
def q_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_retailprice")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        dec("l_quantity").alias("x1"),
        dec("p_retailprice").alias("x2"),
        dec("l_extendedprice").alias("y"),
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    p28 = lambda e: F.sum(e.cast("decimal(28,4)")).cast("double")  # noqa: E731
    m = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("double").alias("sx1"),
        F.sum(x2).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        p28(x1 * x2).alias("s12"),
        p28(x2 * x2).alias("s22"),
        p28(x1 * y).alias("s1y"),
        p28(x2 * y).alias("s2y"),
        p28(y * y).alias("syy"),
    )
    n = F.col("n")
    cen = m.select(
        n,
        (F.col("sy") / n).alias("ybar"),
        (F.col("s11") - F.col("sx1") * F.col("sx1") / n).alias("c11"),
        (F.col("s12") - F.col("sx1") * F.col("sx2") / n).alias("c12"),
        (F.col("s22") - F.col("sx2") * F.col("sx2") / n).alias("c22"),
        (F.col("s1y") - F.col("sx1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("sx2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
        (F.col("sx1") / n).alias("x1bar"),
        (F.col("sx2") / n).alias("x2bar"),
    )
    lambdas = cen.sparkSession.createDataFrame(
        [(0.0,), (0.01,), (0.1,), (1.0,), (10.0,)], ["lam"]
    )
    j = cen.join(F.broadcast(lambdas))
    lam = F.col("lam")
    c11, c12, c22 = F.col("c11"), F.col("c12"), F.col("c22")
    c1y, c2y = F.col("c1y"), F.col("c2y")
    det = (c11 + lam * n) * (c22 + lam * n) - c12 * c12
    b1 = (c1y * (c22 + lam * n) - c2y * c12) / det
    b2 = (c2y * (c11 + lam * n) - c1y * c12) / det
    return j.select(
        lam.alias("lambda"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_retailprice"),
        F.round(
            F.col("ybar") - b1 * F.col("x1bar") - b2 * F.col("x2bar"), 4
        ).alias("intercept"),
        F.round((b1 * c1y + b2 * c2y) / F.col("cyy"), 6).alias("r2_train"),
    ).orderBy("lambda")


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


# -- q_fh_smallarea ----------------------------------------------------
#
# Fay-Herriot small-area estimation of per-customer spend by nation:
# the direct survey estimate ybar_i (sampling variance v_i = s_i^2 /
# n_i) is shrunk toward a synthetic regression on mean account
# balance, with gamma_i = tau2/(tau2 + v_i) and a simplified
# Prasad-Rao moment tau2 = max(0, mean residual^2 - mean v) — small
# nations borrow strength from the model, big nations keep their
# data. This is the named survey-statistics layer ABOVE
# q_james_stein's equal-variance shrinkage: heteroscedastic, with a
# covariate. Domain moments are exact decimal folds; the two-stage
# algebra runs on the 25-row grid with 9-rounded terms.

FH_SQL = """
WITH cust AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS ab
  FROM customer
), spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS s
  FROM orders GROUP BY 1
), dom AS (
  SELECT n_name, COUNT(*) AS n,
         CAST(SUM(COALESCE(s, CAST(0 AS DECIMAL(24,2))))
              AS DECIMAL(30,2)) AS s1,
         CAST(SUM(COALESCE(s, CAST(0 AS DECIMAL(24,2)))
                  * COALESCE(s, CAST(0 AS DECIMAL(24,2))))
              AS DECIMAL(38,4)) AS s2,
         CAST(SUM(ab) AS DECIMAL(28,2)) AS sab
  FROM cust
  LEFT JOIN spend ON o_custkey = c_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1
), direct AS (
  SELECT n_name, n,
         CAST(s1 AS DOUBLE) / n AS ybar,
         ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
          / (n - 1)) / n AS v,
         CAST(sab AS DOUBLE) / n AS x
  FROM dom
), ols AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(round(x, 9) AS DECIMAL(24,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(ybar, 9) AS DECIMAL(24,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(round(x * ybar, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sv
  FROM direct
), beta AS (
  SELECT k, sv,
         (k * sxy - sx * sy) / (k * sxx - sx * sx) AS b,
         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k AS a
  FROM ols
), tau AS (
  SELECT k, a, b,
         GREATEST(
           CAST(SUM(CAST(round((ybar - a - b * x) * (ybar - a - b * x), 6)
                         AS DECIMAL(28,6))) AS DOUBLE) / (k - 2)
           - sv / k, 0.0) AS tau2
  FROM direct CROSS JOIN beta
  GROUP BY k, a, b, sv
)
SELECT d.n_name, CAST(d.n AS BIGINT) AS n_customers,
       round(d.ybar, 4) AS direct_est,
       round(t.a + t.b * d.x, 4) AS synthetic_est,
       round(t.tau2 / (t.tau2 + d.v), 6) AS gamma,
       round((t.tau2 / (t.tau2 + d.v)) * d.ybar
             + (1 - t.tau2 / (t.tau2 + d.v)) * (t.a + t.b * d.x), 4)
         AS fh_estimate
FROM direct d CROSS JOIN tau t
ORDER BY d.n_name
"""


@query("q_fh_smallarea", oracle=FH_SQL)
def q_fh_smallarea(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    zero = F.lit(0).cast("decimal(24,2)")
    spend = cat.orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("s")
    )
    s = F.coalesce("s", zero)
    dom = (
        cat.customer.join(
            spend, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s).cast("decimal(30,2)").alias("s1"),
            F.sum(s * s).cast("decimal(38,4)").alias("s2"),
            F.sum(dec("c_acctbal")).cast("decimal(28,2)").alias("sab"),
        )
    )
    n = F.col("n")
    direct = dom.select(
        "n_name", "n",
        (F.col("s1").cast("double") / n).alias("ybar"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / n
            )
            / (n - 1)
            / n
        ).alias("v"),
        (F.col("sab").cast("double") / n).alias("x"),
    ).localCheckpoint()
    x, ybar, v = F.col("x"), F.col("ybar"), F.col("v")
    ols = direct.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(x, 9).cast("decimal(24,9)")).cast("double")
        .alias("sx"),
        F.sum(F.round(ybar, 9).cast("decimal(24,9)")).cast("double")
        .alias("sy"),
        F.sum(F.round(x * x, 6).cast("decimal(28,6)")).cast("double")
        .alias("sxx"),
        F.sum(F.round(x * ybar, 6).cast("decimal(28,6)")).cast("double")
        .alias("sxy"),
        F.sum(F.round(v, 6).cast("decimal(28,6)")).cast("double")
        .alias("sv"),
    )
    k = F.col("k")
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    beta = ols.select(
        "k", "sv",
        slope.alias("b"),
        ((F.col("sy") - slope * F.col("sx")) / k).alias("a"),
    )
    res = ybar - F.col("a") - F.col("b") * x
    tau = (
        direct.join(F.broadcast(beta))
        .groupBy("k", "a", "b", "sv")
        .agg(
            F.greatest(
                F.sum(F.round(res * res, 6).cast("decimal(28,6)"))
                .cast("double")
                / (F.col("k") - 2)
                - F.col("sv") / F.col("k"),
                F.lit(0.0),
            ).alias("tau2")
        )
    )
    g = F.col("tau2") / (F.col("tau2") + v)
    synth = F.col("a") + F.col("b") * x
    return (
        direct.join(F.broadcast(tau))
        .select(
            "n_name",
            n.cast("bigint").alias("n_customers"),
            F.round(ybar, 4).alias("direct_est"),
            F.round(synth, 4).alias("synthetic_est"),
            F.round(g, 6).alias("gamma"),
            F.round(g * ybar + (1 - g) * synth, 4).alias("fh_estimate"),
        )
        .orderBy("n_name")
    )


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


# -- q_kraljic ---------------------------------------------------------
#
# Kraljic procurement portfolio matrix per brand: profit impact =
# share of total purchase spend, supply risk = supplier-concentration
# HHI within the brand (sum of squared supplier shares — one supplier
# = 1.0, fully diversified -> 1/k), median-split into the four named
# quadrants (strategic / leverage / bottleneck / non-critical). The
# procurement counterpart of q_bcg_matrix's sales view. Exact decimal
# spend folds; shares/HHI are identical double chains; the quadrant
# split compares 6-rounded values to 6-rounded medians.

KRALJIC_SQL = """
WITH bs AS (
  SELECT p_brand, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), brand AS (
  SELECT p_brand,
         CAST(SUM(s) AS DECIMAL(30,2)) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE)
                              / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                     AS DOUBLE))
                             * (CAST(s AS DOUBLE)
                                / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                       AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bs GROUP BY p_brand
  QUALIFY FALSE
), bw AS (
  SELECT p_brand, s,
         CAST(SUM(s) OVER (PARTITION BY p_brand) AS DECIMAL(30,2)) AS bsp
  FROM bs
), brand2 AS (
  SELECT p_brand, MAX(bsp) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE) / CAST(bsp AS DOUBLE))
                             * (CAST(s AS DOUBLE) / CAST(bsp AS DOUBLE)),
                             12) AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bw GROUP BY 1
), tot AS (SELECT CAST(SUM(spend) AS DOUBLE) AS t FROM brand2),
med AS (
  SELECT round(quantile_cont(CAST(spend AS DOUBLE) / t, 0.5), 6) AS m_imp,
         round(quantile_cont(hhi, 0.5), 6) AS m_risk
  FROM brand2 CROSS JOIN tot
)
SELECT p_brand,
       CAST(spend AS DOUBLE) AS spend,
       round(CAST(spend AS DOUBLE) / t, 6) AS profit_impact,
       round(hhi, 6) AS supply_risk_hhi,
       CASE
         WHEN round(CAST(spend AS DOUBLE) / t, 6) > m_imp
              AND round(hhi, 6) > m_risk THEN 'strategic'
         WHEN round(CAST(spend AS DOUBLE) / t, 6) > m_imp THEN 'leverage'
         WHEN round(hhi, 6) > m_risk THEN 'bottleneck'
         ELSE 'non-critical' END AS quadrant
FROM brand2 CROSS JOIN tot CROSS JOIN med
ORDER BY p_brand
"""
KRALJIC_SQL = KRALJIC_SQL.replace(
    """), brand AS (
  SELECT p_brand,
         CAST(SUM(s) AS DECIMAL(30,2)) AS spend,
         CAST(SUM(CAST(round((CAST(s AS DOUBLE)
                              / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                     AS DOUBLE))
                             * (CAST(s AS DOUBLE)
                                / CAST(SUM(s) OVER (PARTITION BY p_brand)
                                       AS DOUBLE)), 12)
                       AS DECIMAL(16,12))) AS DOUBLE) AS hhi
  FROM bs GROUP BY p_brand
  QUALIFY FALSE
""",
    "",
)


@query("q_kraljic", oracle=KRALJIC_SQL)
def q_kraljic(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bs = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(28,2)").alias("s"))
    )
    bw = bs.select(
        "p_brand", "s",
        F.sum("s")
        .over(Window.partitionBy("p_brand"))
        .cast("decimal(30,2)")
        .alias("bsp"),
    )
    share = F.col("s").cast("double") / F.col("bsp").cast("double")
    brand2 = bw.groupBy("p_brand").agg(
        F.max("bsp").alias("spend"),
        F.sum(F.round(share * share, 12).cast("decimal(16,12)"))
        .cast("double")
        .alias("hhi"),
    ).localCheckpoint()
    tot = brand2.agg(F.sum("spend").cast("double").alias("t"))
    imp = F.round(F.col("spend").cast("double") / F.col("t"), 6)
    risk = F.round(F.col("hhi"), 6)
    med = (
        brand2.join(F.broadcast(tot))
        .agg(
            F.round(
                F.percentile(
                    F.col("spend").cast("double") / F.col("t"), F.lit(0.5)
                ),
                6,
            ).alias("m_imp"),
            F.round(F.percentile("hhi", F.lit(0.5)), 6).alias("m_risk"),
        )
    )
    return (
        brand2.join(F.broadcast(tot))
        .join(F.broadcast(med))
        .select(
            "p_brand",
            F.col("spend").cast("double").alias("spend"),
            imp.alias("profit_impact"),
            risk.alias("supply_risk_hhi"),
            F.when(
                (imp > F.col("m_imp")) & (risk > F.col("m_risk")),
                "strategic",
            )
            .when(imp > F.col("m_imp"), "leverage")
            .when(risk > F.col("m_risk"), "bottleneck")
            .otherwise("non-critical")
            .alias("quadrant"),
        )
        .orderBy("p_brand")
    )


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
        cat.lineitem.join(
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
    brands = bd0.select("p_brand").distinct()
    grid = (
        brands.crossJoin(F.broadcast(days))
        .join(bd0, ["p_brand", "d"], "left")
        .select(
            "p_brand", "d", "mkt",
            F.coalesce("rev", F.lit(0).cast("decimal(19,2)")).alias("rev"),
        )
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("d")
        .rowsBetween(-90, 0)
    )
    mktd = F.col("mkt").cast("double")
    revd = F.col("rev").cast("double")
    roll = grid.select(
        "p_brand", "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("mkt").over(w).cast("decimal(30,2)").alias("sx"),
        F.sum("rev").over(w).cast("decimal(30,2)").alias("sy"),
        F.sum(F.round(mktd * mktd, 4).cast("decimal(38,4)"))
        .over(w)
        .cast("decimal(38,4)")
        .alias("sxx"),
        F.sum(F.round(mktd * revd, 4).cast("decimal(38,4)"))
        .over(w)
        .cast("decimal(38,4)")
        .alias("sxy"),
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


# -- q_cohort_payback --------------------------------------------------
#
# Cohort payback period: for each monthly acquisition cohort, the
# first age (months since first order) at which cumulative revenue
# per acquired customer reaches 2x the age-0 value — the "months to
# recover acquisition spend" growth metric that LTV curves
# (q_cohort_ltv) imply but don't state. Cumulative per-cohort revenue
# is an exact decimal window fold; the threshold comparison is exact
# decimal vs decimal (age-0 value doubled exactly), so the argmin age
# is cross-engine stable; cohorts that never pay back report NULL.

PAYBACK_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(strftime(CAST(o_orderdate AS DATE), '%Y-%m'))
           AS cohort
  FROM orders GROUP BY 1
), sized AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cust FROM firsts GROUP BY 1
), rev AS (
  SELECT f.cohort,
         (CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y') AS BIGINT) * 12
          + CAST(strftime(CAST(o.o_orderdate AS DATE), '%m') AS BIGINT))
         - (CAST(substr(f.cohort, 1, 4) AS BIGINT) * 12
            + CAST(substr(f.cohort, 6, 2) AS BIGINT)) AS age,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS r
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age,
         CAST(SUM(r) OVER (PARTITION BY cohort ORDER BY age)
              AS DECIMAL(30,2)) AS cr,
         CAST(FIRST_VALUE(r) OVER (PARTITION BY cohort ORDER BY age)
              AS DECIMAL(30,2)) AS r0
  FROM rev
), pb AS (
  SELECT cohort, MIN(CASE WHEN age > 0 AND cr >= 2 * r0 THEN age END)
           AS payback_age,
         MAX(CASE WHEN age = 0 THEN CAST(r0 AS DOUBLE) END) AS m0
  FROM cum GROUP BY 1
)
SELECT pb.cohort, s.n_cust,
       round(pb.m0 / s.n_cust, 2) AS month0_rev_per_cust,
       CAST(pb.payback_age AS BIGINT) AS payback_age_months
FROM pb JOIN sized s ON s.cohort = pb.cohort
ORDER BY pb.cohort
"""


@query("q_cohort_payback", oracle=PAYBACK_SQL)
def q_cohort_payback(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    firsts = cat.orders.groupBy("o_custkey").agg(
        F.min(F.date_format(od, "yyyy-MM")).alias("cohort")
    ).localCheckpoint()
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust")
    )
    midx = F.year(od).cast("bigint") * 12 + F.month(od).cast("bigint")
    cidx = (
        F.substring("cohort", 1, 4).cast("bigint") * 12
        + F.substring("cohort", 6, 2).cast("bigint")
    )
    rev = (
        cat.orders.join(
            firsts.select(F.col("o_custkey").alias("ck"), "cohort"),
            F.col("o_custkey") == F.col("ck"),
        )
        .groupBy("cohort", (midx - cidx).alias("age"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("r"))
    )
    wc = Window.partitionBy("cohort").orderBy("age")
    cum = rev.select(
        "cohort", "age",
        F.sum("r").over(wc).cast("decimal(30,2)").alias("cr"),
        F.first("r").over(wc).cast("decimal(30,2)").alias("r0"),
    )
    pb = cum.groupBy("cohort").agg(
        F.min(
            F.when(
                (F.col("age") > 0) & (F.col("cr") >= 2 * F.col("r0")),
                F.col("age"),
            )
        ).alias("payback_age"),
        F.max(
            F.when(F.col("age") == 0, F.col("r0").cast("double"))
        ).alias("m0"),
    )
    return (
        pb.join(sized, "cohort")
        .select(
            "cohort", "n_cust",
            F.round(F.col("m0") / F.col("n_cust"), 2)
            .alias("month0_rev_per_cust"),
            F.col("payback_age").cast("bigint")
            .alias("payback_age_months"),
        )
        .orderBy("cohort")
    )


# -- q_perfect_order ---------------------------------------------------
#
# Perfect-order KPI by order month: an order is ON TIME when every
# line ships within 30 days of the order date, CLEAN when no line
# comes back (returnflag 'R'), and PERFECT when both — the composite
# supply-chain service metric whose multiplicative decay explains why
# 95% x 95% is a mediocre 90%. One lineitem ⋈ orders scan collapses
# to order-level flags via MIN/MAX conditional aggregation, then to
# the month grid; all counts exact BIGINTs, rates 6-rounded doubles.

PERFECT_SQL = """
WITH ol AS (
  SELECT o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
         MIN(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) <= 30
                  THEN 1 ELSE 0 END) AS on_time,
         MIN(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS clean
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT mon,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(SUM(on_time) / CAST(COUNT(*) AS DOUBLE), 6) AS on_time_rate,
       round(SUM(clean) / CAST(COUNT(*) AS DOUBLE), 6) AS clean_rate,
       round(SUM(on_time * clean) / CAST(COUNT(*) AS DOUBLE), 6)
         AS perfect_rate
FROM ol
GROUP BY mon
ORDER BY mon
"""


@query("q_perfect_order", oracle=PERFECT_SQL)
def q_perfect_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    ol = (
        cat.orders.join(
            cat.lineitem.select("l_orderkey", "l_shipdate", "l_returnflag"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")
            .alias("mon"),
        )
        .agg(
            F.min(
                F.when(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                    <= 30,
                    1,
                ).otherwise(0)
            ).alias("on_time"),
            F.min(
                F.when(F.col("l_returnflag") == "R", 0).otherwise(1)
            ).alias("clean"),
        )
    )
    n = F.count(F.lit(1))
    return (
        ol.groupBy("mon")
        .agg(
            n.cast("bigint").alias("n_orders"),
            F.round(F.sum("on_time") / n.cast("double"), 6)
            .alias("on_time_rate"),
            F.round(F.sum("clean") / n.cast("double"), 6)
            .alias("clean_rate"),
            F.round(
                F.sum(F.col("on_time") * F.col("clean")) / n.cast("double"),
                6,
            ).alias("perfect_rate"),
        )
        .orderBy("mon")
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


# -- q_apportionment ---------------------------------------------------
#
# Largest-remainder (Hamilton) apportionment of a fixed 100-slot
# budget across nations proportional to customer counts — the exact
# integer allocation problem behind sampling quotas, shard counts and
# seat assignment, where naive rounding over- or under-shoots. Quota
# q_i = 100 * n_i / N as an exact fraction (integer 100*n_i DIV N and
# remainder 100*n_i MOD N — no floating point anywhere), floor seats
# first, the R = 100 - sum(floor) leftover seats to the R largest
# remainders (tie-break: larger nation, then name). Fully BIGINT;
# bit-identical across engines by construction.

APPORTION_SQL = """
WITH pop AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM pop),
quota AS (
  SELECT n_name, n,
         (100 * n) // nt AS fl,
         (100 * n) % nt AS rem
  FROM pop CROSS JOIN tot
), leftover AS (
  SELECT CAST(100 - SUM(fl) AS BIGINT) AS r FROM quota
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, n DESC, n_name) AS rk
  FROM quota
)
SELECT n_name, n AS n_customers,
       round(100.0 * n / nt, 6) AS quota,
       CAST(fl AS BIGINT) AS floor_seats,
       CAST(fl + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM ranked CROSS JOIN leftover CROSS JOIN tot
ORDER BY n_name
"""


@query("q_apportionment", oracle=APPORTION_SQL)
def q_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pop = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pop.agg(F.sum("n").cast("bigint").alias("nt"))
    quota = pop.join(F.broadcast(tot)).select(
        "n_name", "n", "nt",
        F.expr("(100 * n) div nt").alias("fl"),
        ((100 * F.col("n")) % F.col("nt")).alias("rem"),
    ).localCheckpoint()
    leftover = quota.agg(
        (100 - F.sum("fl")).cast("bigint").alias("r")
    )
    ranked = quota.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("rem").desc(), F.col("n").desc(), "n_name"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(leftover))
        .select(
            "n_name",
            F.col("n").alias("n_customers"),
            F.round(100.0 * F.col("n") / F.col("nt"), 6).alias("quota"),
            F.col("fl").cast("bigint").alias("floor_seats"),
            (
                F.col("fl")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("seats"),
        )
        .orderBy("n_name")
    )


# -- q_smr_indirect ----------------------------------------------------
#
# Indirectly standardized morbidity ratio per nation: expected
# F-status orders from the GLOBAL priority-specific rates applied to
# each nation's priority mix, SMR = observed/expected with the Byar
# approximation 95% CI — the epidemiology answer to "is this nation's
# failure rate high, or does it just have a risky order mix", i.e.
# the standardization q_simpsons_detector flags the need for.
# Stratum counts are exact BIGINTs; expected counts are 9-rounded
# decimal folds; the Byar cube-root chain is one identical double
# expression.

SMR_SQL = """
WITH strat AS (
  SELECT n_name, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), grates AS (
  SELECT pri, SUM(d) / CAST(SUM(n) AS DOUBLE) AS rate
  FROM strat GROUP BY 1
), nat AS (
  SELECT s.n_name,
         CAST(SUM(s.d) AS BIGINT) AS obs,
         CAST(SUM(CAST(round(s.n * g.rate, 9) AS DECIMAL(20,9)))
              AS DOUBLE) AS exp_
  FROM strat s JOIN grates g ON g.pri = s.pri
  GROUP BY 1
)
SELECT n_name, obs AS observed, round(exp_, 4) AS expected,
       round(obs / exp_, 6) AS smr,
       round((obs * pow(1 - 1.0 / (9 * obs)
                        - 1.96 / (3 * sqrt(CAST(obs AS DOUBLE))), 3))
             / exp_, 6) AS smr_ci_lo,
       round(((obs + 1) * pow(1 - 1.0 / (9 * (obs + 1))
                              + 1.96 / (3 * sqrt(obs + 1.0)), 3))
             / exp_, 6) AS smr_ci_hi
FROM nat
ORDER BY n_name
"""


@query("q_smr_indirect", oracle=SMR_SQL)
def q_smr_indirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    strat = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()
    )
    glob = strat.groupBy("pri").agg(
        (F.sum("d") / F.sum("n").cast("double")).alias("rate")
    )
    nat = (
        strat.join(F.broadcast(glob), "pri")
        .groupBy("n_name")
        .agg(
            F.sum("d").cast("bigint").alias("obs"),
            F.sum(
                F.round(F.col("n") * F.col("rate"), 9).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("exp_"),
        )
    )
    obs, exp_ = F.col("obs"), F.col("exp_")
    lo = (
        obs
        * F.pow(
            1 - 1.0 / (9 * obs) - 1.96 / (3 * F.sqrt(obs.cast("double"))),
            3,
        )
    ) / exp_
    hi = (
        (obs + 1)
        * F.pow(
            1 - 1.0 / (9 * (obs + 1)) + 1.96 / (3 * F.sqrt(obs + 1.0)),
            3,
        )
    ) / exp_
    return nat.select(
        "n_name",
        obs.alias("observed"),
        F.round(exp_, 4).alias("expected"),
        F.round(obs / exp_, 6).alias("smr"),
        F.round(lo, 6).alias("smr_ci_lo"),
        F.round(hi, 6).alias("smr_ci_hi"),
    ).orderBy("n_name")


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


# -- q_direct_standardization ------------------------------------------
#
# DIRECT standardization companion to q_smr_indirect: each nation's
# priority-specific F-status rates are applied to the GLOBAL priority
# mix (the "standard population"), yielding the rate the nation WOULD
# show with an average order mix — comparable across nations where
# crude rates are not, and the converse adjustment to SMR's indirect
# form. Stratum weights w_s = global n_s / N; DSR = sum w_s * r_{i,s}
# over 9-rounded decimal terms; strata the nation never sees
# contribute their weight times zero (documented, matches the epi
# convention of treating unobserved strata as rate 0 only when truly
# absent — here every nation has all five priorities at tested SFs).

DSTD_SQL = """
WITH strat AS (
  SELECT n_name, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), std AS (
  SELECT pri, CAST(SUM(n) AS BIGINT) AS ns,
         CAST(SUM(SUM(n)) OVER () AS BIGINT) AS nt
  FROM strat GROUP BY 1
), dsr AS (
  SELECT s.n_name,
         CAST(SUM(s.d) AS BIGINT) AS obs,
         CAST(SUM(s.n) AS BIGINT) AS n,
         CAST(SUM(CAST(round((CAST(t.ns AS DOUBLE) / t.nt)
                             * (s.d / CAST(s.n AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS rate_std
  FROM strat s JOIN std t ON t.pri = s.pri
  GROUP BY 1
)
SELECT n_name,
       round(obs / CAST(n AS DOUBLE), 6) AS crude_rate,
       round(rate_std, 6) AS standardized_rate,
       round(rate_std - obs / CAST(n AS DOUBLE), 6) AS mix_effect
FROM dsr
ORDER BY n_name
"""


@query("q_direct_standardization", oracle=DSTD_SQL)
def q_direct_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    strat = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("o_orderpriority").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    std = (
        strat.groupBy("pri")
        .agg(F.sum("n").cast("bigint").alias("ns"))
        .select("pri", "ns", F.sum("ns").over(wall).cast("bigint").alias("nt"))
    )
    term = F.round(
        (F.col("ns").cast("double") / F.col("nt"))
        * (F.col("d") / F.col("n").cast("double")),
        9,
    ).cast("decimal(16,9)")
    dsr = (
        strat.join(F.broadcast(std), "pri")
        .groupBy("n_name")
        .agg(
            F.sum("d").cast("bigint").alias("obs"),
            F.sum("n").cast("bigint").alias("n"),
            F.sum(term).cast("double").alias("rate_std"),
        )
    )
    crude = F.col("obs") / F.col("n").cast("double")
    return dsr.select(
        "n_name",
        F.round(crude, 6).alias("crude_rate"),
        F.round(F.col("rate_std"), 6).alias("standardized_rate"),
        F.round(F.col("rate_std") - crude, 6).alias("mix_effect"),
    ).orderBy("n_name")


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


# -- txt_lmir_dirichlet ------------------------------------------------
#
# Dirichlet-smoothed language-model retrieval (LMIR.DIR, mu = 2000)
# over the same 4-term query as txt_bm25: score(q, d) = sum_t
# ln((tf + mu * p(t|C)) / (dl + mu)) — including the ZERO-tf terms a
# sparse hits table misses, via a docs x query-terms grid left-joined
# against term hits (|q| = 4 rows broadcast, so the grid costs one
# map-side expansion). Collection LM p(t|C) from exact token counts.
# The probabilistic-IR counterpart to txt_bm25's heuristic scoring;
# ranks can and do differ on short docs, which is the point.

_LMIR_TERMS = ("spark", "join", "fast", "data")
_LMIR_SQL_TERMS = "('" + "', '".join(_LMIR_TERMS) + "')"

LMIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
), docs AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), coll AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total_tokens FROM toks
), cf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
  FROM toks WHERE term IN {_LMIR_SQL_TERMS} GROUP BY 1
), qterms AS (
  SELECT UNNEST(['spark', 'join', 'fast', 'data']) AS term
), hits AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN {_LMIR_SQL_TERMS} GROUP BY 1, 2
), grid AS (
  SELECT d.doc_id, d.dl, q.term,
         COALESCE(h.tf, 0) AS tf, c.cf, coll.total_tokens
  FROM docs d CROSS JOIN qterms q
  JOIN cf c ON c.term = q.term
  CROSS JOIN coll
  LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.term = q.term
)
SELECT doc_id,
       round(CAST(SUM(CAST(round(
         ln((tf + 2000.0 * cf / total_tokens) / (dl + 2000.0)), 9)
         AS DECIMAL(18,9))) AS DOUBLE), 6) AS score
FROM grid
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 20
"""


@query("txt_lmir_dirichlet", oracle=LMIR_SQL)
def txt_lmir_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).localCheckpoint()
    docs = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("dl")
    )
    coll = toks.agg(F.count(F.lit(1)).cast("bigint").alias("total_tokens"))
    inq = toks.filter(F.col("term").isin(*_LMIR_TERMS))
    cf = inq.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    qterms = d.sparkSession.createDataFrame(
        [(t,) for t in _LMIR_TERMS], ["term"]
    )
    hits = inq.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    grid = (
        docs.crossJoin(F.broadcast(qterms))
        .join(F.broadcast(cf), "term")
        .join(F.broadcast(coll))
        .join(hits, ["doc_id", "term"], "left")
        .select(
            "doc_id", "dl", "term",
            F.coalesce("tf", F.lit(0)).alias("tf"),
            "cf", "total_tokens",
        )
    )
    term_score = F.round(
        F.log(
            (F.col("tf") + 2000.0 * F.col("cf") / F.col("total_tokens"))
            / (F.col("dl") + 2000.0)
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        grid.groupBy("doc_id")
        .agg(F.round(F.sum(term_score).cast("double"), 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


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


# -- q_eta_promise -----------------------------------------------------
#
# Delivery-promise table with hierarchical quantile backoff: the p90
# ship-delay promise per (supplier-nation -> customer-nation) lane,
# falling back to the supplier-nation origin p90 when the lane has
# under 30 shipments, and to the global p90 when the origin is thin
# too — the coverage-vs-sharpness tradeoff every real ETA system
# ships. Quantiles are EXACT rank selections (ceil(0.9 n)-th order
# statistic by (delay, orderkey, linenumber) — no interpolation, so
# cross-engine stable) computed at all three levels from the same
# scan; the output marks which level backed each lane. Scale: one
# fact scan; quantile windows partition by lane / origin.

ETA_SQL = """
WITH lanes AS (
  SELECT sn.n_name AS origin, cn.n_name AS dest,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS delay,
         l.l_orderkey AS ok, l.l_linenumber AS ln
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
), lane_q AS (
  SELECT origin, dest, MAX(n) AS n, MAX(q) AS p90
  FROM (
    SELECT origin, dest,
           COUNT(*) OVER w AS n,
           CASE WHEN ROW_NUMBER() OVER
                  (PARTITION BY origin, dest ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER w) AS BIGINT)
                THEN delay END AS q
    FROM lanes WINDOW w AS (PARTITION BY origin, dest)
  ) GROUP BY 1, 2
), orig_q AS (
  SELECT origin, MAX(n) AS n, MAX(q) AS p90
  FROM (
    SELECT origin,
           COUNT(*) OVER w AS n,
           CASE WHEN ROW_NUMBER() OVER
                  (PARTITION BY origin ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER w) AS BIGINT)
                THEN delay END AS q
    FROM lanes WINDOW w AS (PARTITION BY origin)
  ) GROUP BY 1
), glob_q AS (
  SELECT MAX(q) AS p90 FROM (
    SELECT CASE WHEN ROW_NUMBER() OVER (ORDER BY delay, ok, ln)
                = CAST(ceil(0.9 * COUNT(*) OVER ()) AS BIGINT)
                THEN delay END AS q
    FROM lanes
  )
)
SELECT l.origin, l.dest, CAST(l.n AS BIGINT) AS n_shipments,
       CAST(CASE WHEN l.n >= 30 THEN l.p90
                 WHEN o.n >= 30 THEN o.p90
                 ELSE g.p90 END AS BIGINT) AS promise_days,
       CASE WHEN l.n >= 30 THEN 'lane'
            WHEN o.n >= 30 THEN 'origin'
            ELSE 'global' END AS backoff_level
FROM lane_q l
JOIN orig_q o ON o.origin = l.origin
CROSS JOIN glob_q g
ORDER BY l.origin, l.dest
"""


@query("q_eta_promise", oracle=ETA_SQL)
def q_eta_promise(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lanes = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(
                cat.nation.select(
                    F.col("n_nationkey").alias("snk"),
                    F.col("n_name").alias("origin"),
                )
            ),
            F.col("snk") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(
                cat.nation.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_name").alias("dest"),
                )
            ),
            F.col("cnk") == F.col("c_nationkey"),
        )
        .select(
            "origin", "dest",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("delay"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
        )
        .localCheckpoint()
    )

    def rank_p90(df: DataFrame, keys: list) -> DataFrame:
        if keys:
            wp = Window.partitionBy(*keys)
            wo = wp.orderBy("delay", "ok", "ln")
        else:
            wp = Window.partitionBy()
            wo = Window.orderBy("delay", "ok", "ln")
        cnt = F.count(F.lit(1)).over(
            wp.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        q = F.when(
            F.row_number().over(wo)
            == F.ceil(0.9 * cnt).cast("bigint"),
            F.col("delay"),
        )
        inner = df.select(*keys, cnt.alias("n"), q.alias("q"))
        if keys:
            return inner.groupBy(*keys).agg(
                F.max("n").alias("n"), F.max("q").alias("p90")
            )
        return inner.agg(F.max("n").alias("n"), F.max("q").alias("p90"))

    lane_q = rank_p90(lanes, ["origin", "dest"])
    orig_q = rank_p90(lanes, ["origin"]).select(
        F.col("origin").alias("o2"),
        F.col("n").alias("on"),
        F.col("p90").alias("op90"),
    )
    glob_q = rank_p90(lanes, []).select(F.col("p90").alias("gp90"))
    ln_, on = F.col("n"), F.col("on")
    return (
        lane_q.join(orig_q, F.col("origin") == F.col("o2"))
        .join(F.broadcast(glob_q))
        .select(
            "origin", "dest",
            ln_.cast("bigint").alias("n_shipments"),
            F.when(ln_ >= 30, F.col("p90"))
            .when(on >= 30, F.col("op90"))
            .otherwise(F.col("gp90"))
            .cast("bigint")
            .alias("promise_days"),
            F.when(ln_ >= 30, "lane")
            .when(on >= 30, "origin")
            .otherwise("global")
            .alias("backoff_level"),
        )
        .orderBy("origin", "dest")
    )


# -- q_recsys_coverage -------------------------------------------------
#
# Beyond-accuracy evaluation of the q_item_cf recommender: catalog
# coverage (share of brands that ever appear in a top-3 list),
# recommendation-concentration Gini over appearance counts (0 = every
# item recommended equally, 1 = one blockbuster), and popularity bias
# (mean popularity percentile of recommended slots — near 1.0 means
# the model just recommends bestsellers). The Castells/Vargas metric
# trio that accuracy-only evals (q_ndcg_eval) miss. Same basket ->
# cosine top-3 construction as q_item_cf; every metric is exact
# integer rank algebra with one double finale per metric.

RECSYS_COV_SQL = """
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
  UNION ALL SELECT b2, b1, c12 FROM pairs
), ranked AS (
  SELECT s.b, s.nb,
         ROW_NUMBER() OVER (PARTITION BY s.b
           ORDER BY s.c12 / sqrt(CAST(c1.c AS DOUBLE) * c2.c) DESC, s.nb)
           AS rk
  FROM sym s JOIN cnt c1 ON c1.b = s.b JOIN cnt c2 ON c2.b = s.nb
), recs AS (SELECT b, nb FROM ranked WHERE rk <= 3),
appear AS (
  SELECT nb, CAST(COUNT(*) AS BIGINT) AS a FROM recs GROUP BY 1
), gini AS (
  SELECT CAST(SUM((2 * ROW_NUMBER() OVER (ORDER BY a, nb)
                   - COUNT(*) OVER () - 1) * a) AS DOUBLE)
           / (COUNT(*) OVER () * 1.0) AS gnum_over_n,
         CAST(SUM(a) OVER () AS BIGINT) AS atot,
         ROW_NUMBER() OVER (ORDER BY a, nb) AS rn
  FROM appear QUALIFY rn = 1
), pop AS (
  SELECT b, CAST(ROW_NUMBER() OVER (ORDER BY c, b) AS DOUBLE)
              / COUNT(*) OVER () AS pct
  FROM cnt
), bias AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS slots,
         CAST(SUM(CAST(round(p.pct, 9) AS DECIMAL(12,9))) AS DOUBLE)
           AS spct
  FROM recs r JOIN pop p ON p.b = r.nb
), agg AS (
  SELECT (SELECT COUNT(*) FROM cnt) AS n_items,
         (SELECT COUNT(*) FROM appear) AS n_recommended,
         (SELECT CAST(SUM((2 * rn - n - 1) * a) AS DOUBLE)
          FROM (SELECT a, ROW_NUMBER() OVER (ORDER BY a, nb) AS rn,
                       COUNT(*) OVER () AS n
                FROM appear)) AS gnum,
         (SELECT CAST(SUM(a) AS BIGINT) FROM appear) AS atot,
         (SELECT COUNT(*) FROM appear) AS k
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(n_recommended AS BIGINT) AS n_recommended,
       round(n_recommended / CAST(n_items AS DOUBLE), 6) AS coverage,
       round(gnum / (CAST(k AS DOUBLE) * atot), 6) AS rec_gini,
       (SELECT round(spct / slots, 6) FROM bias) AS popularity_bias
FROM agg
"""
# drop the unused exploratory `gini` CTE (QUALIFY kept it inert)
RECSYS_COV_SQL = RECSYS_COV_SQL.replace(
    """), gini AS (
  SELECT CAST(SUM((2 * ROW_NUMBER() OVER (ORDER BY a, nb)
                   - COUNT(*) OVER () - 1) * a) AS DOUBLE)
           / (COUNT(*) OVER () * 1.0) AS gnum_over_n,
         CAST(SUM(a) OVER () AS BIGINT) AS atot,
         ROW_NUMBER() OVER (ORDER BY a, nb) AS rn
  FROM appear QUALIFY rn = 1
""",
    "",
)


@query("q_recsys_coverage", oracle=RECSYS_COV_SQL)
def q_recsys_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    basket = (
        cat.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    cnt = basket.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()
    a, bb = basket.alias("a"), basket.alias("bb")
    pairs = (
        a.join(
            bb,
            (F.col("bb.ok") == F.col("a.ok"))
            & (F.col("a.b") < F.col("bb.b")),
        )
        .groupBy(F.col("a.b").alias("b1"), F.col("bb.b").alias("b2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    sym = pairs.select(
        F.col("b1").alias("b"), F.col("b2").alias("nb"), "c12"
    ).union(
        pairs.select(
            F.col("b2").alias("b"), F.col("b1").alias("nb"), "c12"
        )
    )
    c1 = cnt.select(F.col("b").alias("cb"), F.col("c").alias("cc1"))
    c2 = cnt.select(F.col("b").alias("nb2"), F.col("c").alias("cc2"))
    scored = (
        sym.join(F.broadcast(c1), F.col("b") == F.col("cb"))
        .join(F.broadcast(c2), F.col("nb") == F.col("nb2"))
        .select(
            "b", "nb",
            (
                F.col("c12")
                / F.sqrt(F.col("cc1").cast("double") * F.col("cc2"))
            ).alias("cosine"),
        )
    )
    ranked = scored.select(
        "b", "nb",
        F.row_number()
        .over(
            Window.partitionBy("b").orderBy(F.col("cosine").desc(), "nb")
        )
        .alias("rk"),
    )
    recs = ranked.filter(F.col("rk") <= 3).select("b", "nb")
    appear = recs.groupBy("nb").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    ).localCheckpoint()
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gtab = appear.select(
        (
            (
                2 * F.row_number().over(Window.orderBy("a", "nb"))
                - F.count(F.lit(1)).over(wall)
                - 1
            )
            * F.col("a")
        ).alias("gterm"),
        "a",
    ).agg(
        F.sum("gterm").cast("double").alias("gnum"),
        F.sum("a").cast("bigint").alias("atot"),
        F.count(F.lit(1)).alias("k"),
    )
    pop = cnt.select(
        "b",
        (
            F.row_number().over(Window.orderBy("c", "b")).cast("double")
            / F.count(F.lit(1)).over(wall)
        ).alias("pct"),
    )
    bias = (
        recs.join(F.broadcast(pop), recs["nb"] == pop["b"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("slots"),
            F.sum(F.round("pct", 9).cast("decimal(12,9)"))
            .cast("double")
            .alias("spct"),
        )
    )
    n_items = cnt.agg(F.count(F.lit(1)).alias("n_items"))
    n_rec = appear.agg(F.count(F.lit(1)).alias("n_recommended"))
    return (
        n_items.join(F.broadcast(n_rec))
        .join(F.broadcast(gtab))
        .join(F.broadcast(bias))
        .select(
            F.col("n_items").cast("bigint").alias("n_items"),
            F.col("n_recommended").cast("bigint").alias("n_recommended"),
            F.round(
                F.col("n_recommended") / F.col("n_items").cast("double"), 6
            ).alias("coverage"),
            F.round(
                F.col("gnum")
                / (F.col("k").cast("double") * F.col("atot")),
                6,
            ).alias("rec_gini"),
            F.round(F.col("spct") / F.col("slots"), 6)
            .alias("popularity_bias"),
        )
    )


# -- q_hoover_index ----------------------------------------------------
#
# Hoover (Robin Hood) index of spend vs customer base across nations:
# H = 0.5 * sum_i |spend_share_i - customer_share_i| — the fraction of
# total revenue that would have to MOVE between nations for spend to
# mirror headcount, the most interpretable inequality number next to
# q_gini's area and q_lorenz_asymmetry's shape. Both share vectors
# come from exact counts/decimal sums; the 12-rounded |diff| terms
# fold exactly; one double finale. Also reports the largest
# over-served nation as the headline.

HOOVER_SQL = """
WITH nat AS (
  SELECT n_name,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ncust,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
                       CAST(0 AS DECIMAL(18,2))) AS DECIMAL(30,2))
           AS spend
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(ncust) AS BIGINT) AS tc,
         CAST(SUM(spend) AS DOUBLE) AS ts
  FROM nat
), terms AS (
  SELECT n_name,
         CAST(spend AS DOUBLE) / ts - ncust / CAST(tc AS DOUBLE) AS diff
  FROM nat CROSS JOIN tot
), agg AS (
  SELECT COUNT(*) AS n_units,
         CAST(SUM(CAST(round(abs(diff), 12) AS DECIMAL(16,12)))
              AS DOUBLE) AS sdiff
  FROM terms
), top AS (
  SELECT n_name, diff,
         ROW_NUMBER() OVER (ORDER BY diff DESC, n_name) AS rk
  FROM terms
)
SELECT CAST(n_units AS BIGINT) AS n_units,
       round(sdiff / 2, 6) AS hoover_index,
       (SELECT n_name FROM top WHERE rk = 1) AS most_overserved,
       (SELECT round(diff, 6) FROM top WHERE rk = 1) AS excess_share
FROM agg
"""


@query("q_hoover_index", oracle=HOOVER_SQL)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    nat = (
        cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            cat.orders.select("o_custkey", "o_totalprice"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("ncust"),
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(30,2)")
            .alias("spend"),
        )
    )
    tot = nat.agg(
        F.sum("ncust").cast("bigint").alias("tc"),
        F.sum("spend").cast("double").alias("ts"),
    )
    diff = (
        F.col("spend").cast("double") / F.col("ts")
        - F.col("ncust") / F.col("tc").cast("double")
    )
    terms = nat.join(F.broadcast(tot)).select(
        "n_name", diff.alias("diff")
    ).localCheckpoint()
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.round(F.abs("diff"), 12).cast("decimal(16,12)"))
        .cast("double")
        .alias("sdiff"),
    )
    top = (
        terms.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("diff").desc(), "n_name"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("n_name").alias("most_overserved"),
            F.round("diff", 6).alias("excess_share"),
        )
    )
    return agg.join(F.broadcast(top)).select(
        F.col("n_units").cast("bigint").alias("n_units"),
        F.round(F.col("sdiff") / 2, 6).alias("hoover_index"),
        "most_overserved",
        "excess_share",
    )


# -- sim_knn_classifier ------------------------------------------------
#
# Leave-one-out 5-NN cosine label classification on the embeddings
# table, evaluated on the deterministic vec_id % 10 = 0 probe subset
# (50 queries x 500 corpus — the bounded eval shape; the production
# retrieval path is the persisted partition-pruned IVF index, this
# entry measures LABEL QUALITY of the space itself). Cosines are
# 4-rounded before ranking (ties break on vec_id), majority vote
# breaks ties on the smaller label, and per-label accuracy comes out
# as exact counts — the "are these embeddings any good" acceptance
# check beside sim_silhouette's geometric view.

KNN_CLS_SQL = """
WITH w AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS nrm
  FROM embeddings
), q AS (SELECT * FROM w WHERE vec_id % 10 = 0),
scored AS (
  SELECT q.vec_id AS qid, q.label AS true_label,
         b.vec_id AS nid, b.label AS nlabel,
         round(list_sum(list_transform(range(1, 65),
                                       i -> b.v[i] * q.v[i]))
               / (b.nrm * q.nrm), 4) AS score
  FROM q JOIN w b ON b.vec_id <> q.vec_id
), topk AS (
  SELECT qid, true_label, nlabel,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, nid) AS rk
  FROM scored
), votes AS (
  SELECT qid, true_label, nlabel, COUNT(*) AS c
  FROM topk WHERE rk <= 5 GROUP BY 1, 2, 3
), pred AS (
  SELECT qid, true_label, nlabel AS pred_label,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nlabel)
           AS vr
  FROM votes
)
SELECT CAST(true_label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM pred WHERE vr = 1
GROUP BY true_label
ORDER BY label
"""


@query("sim_knn_classifier", oracle=KNN_CLS_SQL)
def sim_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    w = emb.select(
        "vec_id", "label", v.alias("v"), nrm.alias("nrm")
    ).localCheckpoint()
    q = w.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        w.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "true_label",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            F.round(dot / (F.col("nrm") * F.col("qn")), 4).alias("score"),
        )
    )
    topk = scored.select(
        "qid", "true_label", "nlabel",
        F.row_number()
        .over(
            Window.partitionBy("qid").orderBy(F.col("score").desc(), "nid")
        )
        .alias("rk"),
    )
    votes = (
        topk.filter(F.col("rk") <= 5)
        .groupBy("qid", "true_label", "nlabel")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pred = votes.select(
        "qid", "true_label",
        F.col("nlabel").alias("pred_label"),
        F.row_number()
        .over(
            Window.partitionBy("qid").orderBy(F.col("c").desc(), "nlabel")
        )
        .alias("vr"),
    ).filter(F.col("vr") == 1)
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy(F.col("true_label").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)).cast("double"), 6)
            .alias("accuracy"),
        )
        .orderBy("label")
    )


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


# -- txt_self_bleu -----------------------------------------------------
#
# Self-BLEU-2 corpus diversity (Zhu et al.): each document is scored
# against a deterministic partner (consecutive docs in md5(doc_id)
# order — the house no-rand pairing), with modified bigram precision
# sum min(tf_cand, tf_ref) / len_cand and the brevity penalty
# exp(1 - ref/cand) when the candidate is shorter; HIGH mean
# self-BLEU = the corpus repeats itself (mode collapse in generated
# data), complementing dedup's binary verdicts with a graded
# diversity number. Clipped counts are exact integers off one bigram
# groupBy + pair join; per-pair scores are 6-rounded decimals folded
# exactly.

SELF_BLEU_SQL = """
WITH ordered AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
), pairs AS (
  SELECT a.doc_id AS cand, b.doc_id AS ref
  FROM ordered a JOIN ordered b ON b.rn = a.rn + 1
  WHERE a.rn % 2 = 1
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
), cnt AS (
  SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2
), dlen AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb FROM cnt GROUP BY 1
), clipped AS (
  SELECT p.cand, p.ref,
         CAST(SUM(LEAST(cc.c, cr.c)) AS BIGINT) AS clip
  FROM pairs p
  JOIN cnt cc ON cc.doc_id = p.cand
  JOIN cnt cr ON cr.doc_id = p.ref AND cr.bigram = cc.bigram
  GROUP BY 1, 2
), scored AS (
  SELECT p.cand,
         COALESCE(cl.clip, 0) / CAST(dc.nb AS DOUBLE) AS prec,
         CASE WHEN dc.nb < dr.nb
              THEN exp(1 - dr.nb / CAST(dc.nb AS DOUBLE)) ELSE 1.0 END
           AS bp
  FROM pairs p
  JOIN dlen dc ON dc.doc_id = p.cand
  JOIN dlen dr ON dr.doc_id = p.ref
  LEFT JOIN clipped cl ON cl.cand = p.cand AND cl.ref = p.ref
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(SUM(CAST(round(bp * prec, 6) AS DECIMAL(10,6)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_self_bleu2,
       round(CAST(SUM(CAST(round(prec, 6) AS DECIMAL(10,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_bigram_precision
FROM scored
"""


@query("txt_self_bleu", oracle=SELF_BLEU_SQL)
def txt_self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    ordered = d.select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        )
        .alias("rn"),
    ).localCheckpoint()
    a = ordered.alias("a")
    b = ordered.alias("b")
    pairs = (
        a.join(b, F.col("b.rn") == F.col("a.rn") + 1)
        .filter(F.col("a.rn") % 2 == 1)
        .select(
            F.col("a.doc_id").alias("cand"), F.col("b.doc_id").alias("ref")
        )
        .localCheckpoint()
    )
    ws = F.split("text", " ")
    toks = d.select("doc_id", ws.alias("ws"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(ws[i - 1], ' ', ws[i]))"
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()
    dlen = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("nb")
    )
    cc = cnt.select(
        F.col("doc_id").alias("cdoc"), "bigram", F.col("c").alias("c1")
    )
    cr = cnt.select(
        F.col("doc_id").alias("rdoc"),
        F.col("bigram").alias("rbigram"),
        F.col("c").alias("c2"),
    )
    clipped = (
        pairs.join(cc, F.col("cdoc") == F.col("cand"))
        .join(
            cr,
            (F.col("rdoc") == F.col("ref"))
            & (F.col("rbigram") == F.col("bigram")),
        )
        .groupBy("cand", "ref")
        .agg(
            F.sum(F.least(F.col("c1"), F.col("c2")))
            .cast("bigint")
            .alias("clip")
        )
    )
    dc = dlen.select(F.col("doc_id").alias("cd"), F.col("nb").alias("ncb"))
    dr = dlen.select(F.col("doc_id").alias("rd"), F.col("nb").alias("nrb"))
    scored = (
        pairs.join(F.broadcast(dc), F.col("cd") == F.col("cand"))
        .join(F.broadcast(dr), F.col("rd") == F.col("ref"))
        .join(clipped, ["cand", "ref"], "left")
        .select(
            (
                F.coalesce("clip", F.lit(0)) / F.col("ncb").cast("double")
            ).alias("prec"),
            F.when(
                F.col("ncb") < F.col("nrb"),
                F.exp(1 - F.col("nrb") / F.col("ncb").cast("double")),
            )
            .otherwise(1.0)
            .alias("bp"),
        )
    )
    n = F.count(F.lit(1))
    return scored.agg(
        n.cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(
                F.round(F.col("bp") * F.col("prec"), 6).cast("decimal(10,6)")
            ).cast("double")
            / n,
            6,
        ).alias("mean_self_bleu2"),
        F.round(
            F.sum(F.round("prec", 6).cast("decimal(10,6)")).cast("double")
            / n,
            6,
        ).alias("mean_bigram_precision"),
    )


# -- mr_rich_club ------------------------------------------------------
#
# Rich-club coefficient on the customer ⋈ supplier graph: for each
# degree threshold k in {2, 4, 8, 16, 32}, phi(k) = observed edges
# among nodes of degree > k divided by the bipartite maximum
# n_c(k) * n_s(k) — do the best-connected customers concentrate on
# the best-connected suppliers? (Colizza et al., adapted to the
# bipartite maximum.) Degrees come from one groupBy of the edge
# table; each threshold is a broadcast-semi-join filter, and the
# density ratio is exact-integer / exact-integer. Completes the
# macro-structure family beside mr_assortativity / mr_modularity.

RICHCLUB_SQL = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), deg AS (
  SELECT node, CAST(SUM(c) AS BIGINT) AS d FROM (
    SELECT src AS node, COUNT(*) AS c FROM e0 GROUP BY 1
    UNION ALL
    SELECT dst, COUNT(*) FROM e0 GROUP BY 1
  ) GROUP BY 1
), ks AS (SELECT UNNEST([2, 4, 8, 16, 32]) AS k),
rich AS (
  SELECT ks.k, deg.node, substr(deg.node, 1, 1) AS side
  FROM ks JOIN deg ON deg.d > ks.k
), side_counts AS (
  SELECT k,
         CAST(SUM(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS BIGINT)
           AS nc,
         CAST(SUM(CASE WHEN side = 's' THEN 1 ELSE 0 END) AS BIGINT)
           AS ns
  FROM rich GROUP BY 1
), rich_edges AS (
  SELECT r1.k, CAST(COUNT(*) AS BIGINT) AS ec
  FROM e0
  JOIN rich r1 ON r1.node = e0.src
  JOIN rich r2 ON r2.node = e0.dst AND r2.k = r1.k
  GROUP BY 1
)
SELECT s.k AS degree_threshold, s.nc AS n_rich_customers,
       s.ns AS n_rich_suppliers,
       COALESCE(re.ec, 0) AS rich_edges,
       round(CASE WHEN s.nc * s.ns > 0
                  THEN COALESCE(re.ec, 0)
                       / (CAST(s.nc AS DOUBLE) * s.ns) END, 6)
         AS phi
FROM side_counts s LEFT JOIN rich_edges re ON re.k = s.k
ORDER BY degree_threshold
"""


@query("mr_rich_club", oracle=RICHCLUB_SQL)
def mr_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    e0 = (
        cat.orders.join(
            cat.lineitem.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e0.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("c"))
        .union(
            e0.groupBy(F.col("dst").alias("node")).agg(
                F.count(F.lit(1)).alias("c")
            )
        )
        .groupBy("node")
        .agg(F.sum("c").cast("bigint").alias("d"))
    )
    ks = e0.sparkSession.createDataFrame(
        [(2,), (4,), (8,), (16,), (32,)], ["k"]
    )
    rich = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("d") > F.col("k"))
        .select("k", "node", F.substring("node", 1, 1).alias("side"))
        .localCheckpoint()
    )
    side_counts = rich.groupBy("k").agg(
        F.sum(F.when(F.col("side") == "c", 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("side") == "s", 1).otherwise(0))
        .cast("bigint")
        .alias("ns"),
    )
    r1 = rich.select(F.col("k").alias("k1"), F.col("node").alias("n1"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("node").alias("n2"))
    rich_edges = (
        e0.join(F.broadcast(r1), F.col("n1") == F.col("src"))
        .join(
            F.broadcast(r2),
            (F.col("n2") == F.col("dst")) & (F.col("k2") == F.col("k1")),
        )
        .groupBy(F.col("k1").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ec"))
    )
    nc, ns = F.col("nc"), F.col("ns")
    ec = F.coalesce("ec", F.lit(0))
    return (
        side_counts.join(rich_edges, "k", "left")
        .select(
            F.col("k").alias("degree_threshold"),
            nc.alias("n_rich_customers"),
            ns.alias("n_rich_suppliers"),
            ec.cast("bigint").alias("rich_edges"),
            F.round(
                F.when(
                    nc * ns > 0, ec / (nc.cast("double") * ns)
                ),
                6,
            ).alias("phi"),
        )
        .orderBy("degree_threshold")
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


# -- q_mover_stayer ----------------------------------------------------
#
# Blumen mover-stayer model on customers' spend-half state (above /
# below the period median) across three consecutive 2-year periods:
# a share s of "stayers" never leaves their state while movers follow
# a Markov chain with persistence p, identified in closed form from
# the one- and two-step diagonal shares P1 = s + (1-s)p and
# P2 = s + (1-s)p^2 (so p = (P2 - P1)/(P1 - 1) + 1 ... solved as
# p = (P2 - P1)/(P1 - 1) + 1 simplified below, s from back-
# substitution) — the classic heterogeneity correction showing a
# single Markov chain OVERSTATES mobility (q_markov_stationary's
# implicit assumption). Diagonal shares are exact counts over the
# median-split states; the closed-form solve is one double chain.

MOVER_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
per AS (
  SELECT o_custkey,
         CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), dmax)
                    / 730.0) AS BIGINT) AS back,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders CROSS JOIN mx
), spend AS (
  SELECT o_custkey, 2 - back AS period,
         CAST(SUM(x) AS DECIMAL(28,2)) AS s
  FROM per WHERE back <= 2 GROUP BY 1, 2
), med AS (
  SELECT period,
         round(quantile_cont(CAST(s AS DOUBLE), 0.5), 2) AS m
  FROM spend GROUP BY 1
), st AS (
  SELECT spend.o_custkey, spend.period,
         CASE WHEN CAST(s AS DOUBLE) > m THEN 1 ELSE 0 END AS hi
  FROM spend JOIN med ON med.period = spend.period
), wide AS (
  SELECT o_custkey,
         MAX(CASE WHEN period = 0 THEN hi END) AS s0,
         MAX(CASE WHEN period = 1 THEN hi END) AS s1,
         MAX(CASE WHEN period = 2 THEN hi END) AS s2
  FROM st GROUP BY 1
), c AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN s0 = s1 THEN 1 ELSE 0 END) AS BIGINT) AS d1a,
         CAST(SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS d1b,
         CAST(SUM(CASE WHEN s0 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM wide
  WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
), f AS (
  SELECT n,
         (d1a + d1b) / (2.0 * n) AS p1,
         d2 / CAST(n AS DOUBLE) AS p2
  FROM c
), solved AS (
  SELECT n, p1, p2,
         CASE WHEN p1 < 1 THEN (p2 - p1) / (p1 - 1) + 1 END AS pm
  FROM f
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(p1, 6) AS one_step_stay,
       round(p2, 6) AS two_step_stay,
       round(pm, 6) AS mover_persistence,
       round(CASE WHEN pm < 1 THEN (p1 - pm) / (1 - pm) END, 6)
         AS stayer_share
FROM solved
"""


@query("q_mover_stayer", oracle=MOVER_SQL)
def q_mover_stayer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("dmax")
    )
    per = cat.orders.join(F.broadcast(mx)).select(
        "o_custkey",
        F.floor(
            F.datediff("dmax", F.col("o_orderdate").cast("date")) / 730.0
        )
        .cast("bigint")
        .alias("back"),
        dec("o_totalprice").alias("x"),
    )
    spend = (
        per.filter(F.col("back") <= 2)
        .groupBy("o_custkey", (2 - F.col("back")).alias("period"))
        .agg(F.sum("x").cast("decimal(28,2)").alias("s"))
    )
    med = spend.groupBy("period").agg(
        F.round(F.percentile(F.col("s").cast("double"), F.lit(0.5)), 2)
        .alias("m")
    )
    st = spend.join(F.broadcast(med), "period").select(
        "o_custkey", "period",
        F.when(F.col("s").cast("double") > F.col("m"), 1)
        .otherwise(0)
        .alias("hi"),
    )
    wide = st.groupBy("o_custkey").agg(
        F.max(F.when(F.col("period") == 0, F.col("hi"))).alias("s0"),
        F.max(F.when(F.col("period") == 1, F.col("hi"))).alias("s1"),
        F.max(F.when(F.col("period") == 2, F.col("hi"))).alias("s2"),
    )
    s0, s1, s2 = F.col("s0"), F.col("s1"), F.col("s2")
    c = wide.filter(
        s0.isNotNull() & s1.isNotNull() & s2.isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(s0 == s1, 1).otherwise(0)).cast("bigint").alias("d1a"),
        F.sum(F.when(s1 == s2, 1).otherwise(0)).cast("bigint").alias("d1b"),
        F.sum(F.when(s0 == s2, 1).otherwise(0)).cast("bigint").alias("d2"),
    )
    n = F.col("n")
    p1 = (F.col("d1a") + F.col("d1b")) / (2.0 * n)
    p2 = F.col("d2") / n.cast("double")
    f = c.select(n, p1.alias("p1"), p2.alias("p2"))
    pm = F.when(
        F.col("p1") < 1, (F.col("p2") - F.col("p1")) / (F.col("p1") - 1) + 1
    )
    solved = f.select("n", "p1", "p2", pm.alias("pm"))
    return solved.select(
        n.cast("bigint").alias("n_customers"),
        F.round("p1", 6).alias("one_step_stay"),
        F.round("p2", 6).alias("two_step_stay"),
        F.round("pm", 6).alias("mover_persistence"),
        F.round(
            F.when(
                F.col("pm") < 1,
                (F.col("p1") - F.col("pm")) / (1 - F.col("pm")),
            ),
            6,
        ).alias("stayer_share"),
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
        .localCheckpoint()
    )
    base = f.filter(F.col("p_brand") == "Brand#11").select(
        "n_name", "mon",
        F.col("c").alias("c0"),
        F.col("rev").alias("rev0"),
        F.col("qty").alias("qty0"),
    )
    cells = (
        f.filter(F.col("p_brand") != "Brand#11")
        .join(base, ["n_name", "mon"])
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


# -- txt_umass_coherence -----------------------------------------------
#
# UMass topic coherence over the corpus's top-12 content words
# (stopword-filtered document frequencies): C(wi, wj) =
# ln((D(wi, wj) + 1) / D(wj)) summed over ordered frequent-word pairs
# — the standard intrinsic score for whether a word cluster "hangs
# together" (Mimno et al.), here applied to the global top words as a
# corpus-cohesion diagnostic beside txt_collocations' PMI pairs.
# Document frequencies and co-occurrence counts are exact integers
# from one distinct-(doc, word) table; pair terms are 9-rounded
# decimals folded exactly. The pair set is top-k × top-k — bounded.

UMASS_STOP = (
    "a", "the", "and", "of", "to", "in", "is", "on", "for", "with",
)
_UMASS_STOP_SQL = "('" + "', '".join(UMASS_STOP) + "')"

UMASS_SQL = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
), filt AS (
  SELECT doc_id, w FROM dw
  WHERE w NOT IN {_UMASS_STOP_SQL} AND len(w) >= 3
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS d FROM filt GROUP BY 1
), topw AS (
  SELECT w, d, ROW_NUMBER() OVER (ORDER BY d DESC, w) AS rk
  FROM df QUALIFY rk <= 12
), pairs AS (
  SELECT a.w AS wi, b.w AS wj, a.d AS di, b.d AS dj
  FROM topw a JOIN topw b ON a.rk > b.rk
), co AS (
  SELECT p.wi, p.wj, p.dj,
         CAST(COUNT(*) AS BIGINT) AS dij
  FROM pairs p
  JOIN filt f1 ON f1.w = p.wi
  JOIN filt f2 ON f2.w = p.wj AND f2.doc_id = f1.doc_id
  GROUP BY 1, 2, 3
), terms AS (
  SELECT p.wi, p.wj,
         CAST(round(ln((COALESCE(co.dij, 0) + 1.0) / p.dj), 9)
              AS DECIMAL(16,9)) AS t
  FROM pairs p
  LEFT JOIN co ON co.wi = p.wi AND co.wj = p.wj
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(SUM(t) AS DOUBLE), 6) AS umass_coherence,
       round(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS mean_pair_score
FROM terms
"""
UMASS_SQL = UMASS_SQL.replace(
    """  FROM df QUALIFY rk <= 12
)""",
    """  FROM df
), topw2 AS (
  SELECT * FROM topw WHERE rk <= 12
)""",
).replace("FROM topw a JOIN topw b", "FROM topw2 a JOIN topw2 b")


@query("txt_umass_coherence", oracle=UMASS_SQL)
def txt_umass_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    dw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    filt = dw.filter(
        ~F.col("w").isin(*UMASS_STOP) & (F.length("w") >= 3)
    ).localCheckpoint()
    df = filt.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    topw = df.select(
        "w", "d",
        F.row_number()
        .over(Window.orderBy(F.col("d").desc(), "w"))
        .alias("rk"),
    ).filter(F.col("rk") <= 12).localCheckpoint()
    a, b = topw.alias("a"), topw.alias("b")
    pairs = a.join(b, F.col("a.rk") > F.col("b.rk")).select(
        F.col("a.w").alias("wi"),
        F.col("b.w").alias("wj"),
        F.col("b.d").alias("dj"),
    )
    f1 = filt.select(F.col("doc_id").alias("d1"), F.col("w").alias("w1"))
    f2 = filt.select(F.col("doc_id").alias("d2"), F.col("w").alias("w2"))
    co = (
        pairs.join(F.broadcast(f1).hint("broadcast"), F.col("w1") == F.col("wi"))
        .join(
            f2,
            (F.col("w2") == F.col("wj")) & (F.col("d2") == F.col("d1")),
        )
        .groupBy("wi", "wj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dij"))
    )
    terms = pairs.join(co, ["wi", "wj"], "left").select(
        F.round(
            F.log(
                (F.coalesce("dij", F.lit(0)) + 1.0) / F.col("dj")
            ),
            9,
        )
        .cast("decimal(16,9)")
        .alias("t")
    )
    n = F.count(F.lit(1))
    return terms.agg(
        n.cast("bigint").alias("n_pairs"),
        F.round(F.sum("t").cast("double"), 6).alias("umass_coherence"),
        F.round(F.sum("t").cast("double") / n, 6).alias("mean_pair_score"),
    )


# -- q_brand_switching -------------------------------------------------
#
# Brand loyalty / switching table: each customer's FAVORITE brand
# (most lines, ties to lexicographically smaller brand) in the two
# halves of the data, then per brand the retention share (kept it as
# favorite), the churn-to leader (most common destination brand), and
# the inflow share — the brand-level transition summary on top of
# q_decile_transitions' spend-state machinery. Favorites are exact
# count argmax with deterministic ties; all rates are exact-count
# ratios.

SWITCH_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax,
                   MIN(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
lines AS (
  SELECT o_custkey, p_brand,
         CASE WHEN CAST(o_orderdate AS DATE)
                   < dmin + CAST((dmax - dmin) // 2 AS INTEGER)
              THEN 0 ELSE 1 END AS half
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  CROSS JOIN mx
), cnt AS (
  SELECT o_custkey, half, p_brand, COUNT(*) AS c
  FROM lines GROUP BY 1, 2, 3
), fav AS (
  SELECT o_custkey, half, p_brand,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, half
                            ORDER BY c DESC, p_brand) AS rk
  FROM cnt
), wide AS (
  SELECT a.o_custkey, a.p_brand AS b0, b.p_brand AS b1
  FROM fav a JOIN fav b ON b.o_custkey = a.o_custkey
  WHERE a.half = 0 AND b.half = 1 AND a.rk = 1 AND b.rk = 1
), per AS (
  SELECT b0, COUNT(*) AS n,
         CAST(SUM(CASE WHEN b1 = b0 THEN 1 ELSE 0 END) AS BIGINT)
           AS kept
  FROM wide GROUP BY 1
), dest AS (
  SELECT b0, b1, COUNT(*) AS c,
         ROW_NUMBER() OVER (PARTITION BY b0
                            ORDER BY COUNT(*) DESC, b1) AS rk
  FROM wide WHERE b1 <> b0 GROUP BY 1, 2
)
SELECT per.b0 AS brand,
       CAST(per.n AS BIGINT) AS n_customers,
       round(per.kept / CAST(per.n AS DOUBLE), 6) AS loyalty_rate,
       d.b1 AS top_destination,
       round(d.c / CAST(per.n AS DOUBLE), 6) AS top_destination_share
FROM per LEFT JOIN dest d ON d.b0 = per.b0 AND d.rk = 1
ORDER BY brand
"""


@query("q_brand_switching", oracle=SWITCH_SQL)
def q_brand_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lines = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(mx))
        .select("o_custkey", "p_brand", half.alias("half"))
    )
    cnt = lines.groupBy("o_custkey", "half", "p_brand").agg(
        F.count(F.lit(1)).alias("c")
    )
    fav = cnt.select(
        "o_custkey", "half", "p_brand",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey", "half").orderBy(
                F.col("c").desc(), "p_brand"
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") == 1).localCheckpoint()
    a = fav.filter(F.col("half") == 0).select(
        F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b0")
    )
    b = fav.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck2"), F.col("p_brand").alias("b1")
    )
    wide = a.join(b, F.col("ck") == F.col("ck2")).select("b0", "b1")
    per = wide.groupBy("b0").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("b1") == F.col("b0"), 1).otherwise(0))
        .cast("bigint")
        .alias("kept"),
    )
    dest = (
        wide.filter(F.col("b1") != F.col("b0"))
        .groupBy("b0", "b1")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "b0", "b1", "c",
            F.row_number()
            .over(
                Window.partitionBy("b0").orderBy(F.col("c").desc(), "b1")
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    return (
        per.join(
            dest.select(
                F.col("b0").alias("db0"),
                F.col("b1").alias("top_destination"),
                F.col("c").alias("dc"),
            ),
            F.col("db0") == F.col("b0"),
            "left",
        )
        .select(
            F.col("b0").alias("brand"),
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(F.col("kept") / F.col("n").cast("double"), 6)
            .alias("loyalty_rate"),
            "top_destination",
            F.round(F.col("dc") / F.col("n").cast("double"), 6)
            .alias("top_destination_share"),
        )
        .orderBy("brand")
    )


# -- q_l_diversity -----------------------------------------------------
#
# l-diversity and t-closeness audit over the (nation, segment)
# quasi-identifier classes with order priority as the sensitive
# attribute: per class the distinct-sensitive count l, the entropy
# l-diversity exp(H(class)), and t-closeness as the 1-D earth-mover
# distance between the class's priority distribution and the global
# one (EMD = mean |cumulative share gap| over the ordered categories)
# — the two named refinements that close the re-identification gaps
# q_kanonymity's size-only check leaves (a large class that is 100%
# URGENT still leaks). Counts exact; entropy/EMD terms are 9-rounded
# decimal folds.

LDIV_SQL = """
WITH cells AS (
  SELECT n_name, c_mktsegment AS seg, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3
), cls AS (
  SELECT n_name, seg, SUM(c) AS n FROM cells GROUP BY 1, 2
), gdist AS (
  SELECT pri, SUM(c) AS g,
         SUM(SUM(c)) OVER () AS gt
  FROM cells GROUP BY 1
), grid AS (
  SELECT cl.n_name, cl.seg, g.pri, cl.n, g.g, g.gt,
         COALESCE(ce.c, 0) AS c
  FROM cls cl CROSS JOIN gdist g
  LEFT JOIN cells ce ON ce.n_name = cl.n_name AND ce.seg = cl.seg
                    AND ce.pri = g.pri
), cums AS (
  SELECT *,
         SUM(c) OVER (PARTITION BY n_name, seg ORDER BY pri) AS cc,
         SUM(g) OVER (PARTITION BY n_name, seg ORDER BY pri) AS cg
  FROM grid
), agg2 AS (
  SELECT n_name, seg, n,
         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS l,
         CAST(SUM(CASE WHEN c > 0 THEN
               CAST(round(-(c / CAST(n AS DOUBLE))
                          * ln(c / CAST(n AS DOUBLE)), 9)
                    AS DECIMAL(16,9)) END) AS DOUBLE) AS h,
         CAST(SUM(CAST(round(abs(cc / CAST(n AS DOUBLE)
                                 - cg / CAST(gt AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) / COUNT(*) AS t
  FROM cums GROUP BY n_name, seg, n, gt
)
SELECT n_name, seg, CAST(n AS BIGINT) AS class_size,
       l AS l_distinct,
       round(exp(h), 6) AS entropy_l,
       round(t, 6) AS t_closeness,
       CAST(CASE WHEN l < 3 OR round(t, 6) > 0.2 THEN 1 ELSE 0 END
            AS BIGINT) AS flagged
FROM agg2
ORDER BY n_name, seg
"""


@query("q_l_diversity", oracle=LDIV_SQL)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cells = (
        cat.orders.join(
            F.broadcast(
                cat.customer.select(
                    "c_custkey", "c_nationkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    cls = cells.groupBy("n_name", "seg").agg(F.sum("c").alias("n"))
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    glob = (
        cells.groupBy("pri")
        .agg(F.sum("c").alias("g"))
        .select("pri", "g", F.sum("g").over(wall).alias("gt"))
    )
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .join(cells, ["n_name", "seg", "pri"], "left")
        .select(
            "n_name", "seg", "pri", "n", "g", "gt",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wc = Window.partitionBy("n_name", "seg").orderBy("pri")
    cums = grid.select(
        "*",
        F.sum("c").over(wc).alias("cc"),
        F.sum("g").over(wc).alias("cg"),
    )
    c, n, gt = F.col("c"), F.col("n"), F.col("gt")
    hterm = F.when(
        c > 0,
        F.round(
            -(c / n.cast("double")) * F.log(c / n.cast("double")), 9
        ).cast("decimal(16,9)"),
    )
    tterm = F.round(
        F.abs(
            F.col("cc") / n.cast("double") - F.col("cg") / gt.cast("double")
        ),
        9,
    ).cast("decimal(16,9)")
    agg2 = cums.groupBy("n_name", "seg", "n", "gt").agg(
        F.sum(F.when(c > 0, 1).otherwise(0)).cast("bigint").alias("l"),
        F.sum(hterm).cast("double").alias("h"),
        (F.sum(tterm).cast("double") / F.count(F.lit(1))).alias("t"),
    )
    return agg2.select(
        "n_name", "seg",
        n.cast("bigint").alias("class_size"),
        F.col("l").alias("l_distinct"),
        F.round(F.exp("h"), 6).alias("entropy_l"),
        F.round("t", 6).alias("t_closeness"),
        F.when((F.col("l") < 3) | (F.round("t", 6) > 0.2), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("flagged"),
    ).orderBy("n_name", "seg")


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


# -- q_lmg_importance --------------------------------------------------
#
# LMG / Shapley relative importance for the two-predictor revenue
# model (quantity, retailprice): each predictor's contribution
# averaged over both entry orders — LMG(x1) = (R2(x1) + (R2(both) -
# R2(x2))) / 2 — the decomposition that answers "which feature
# matters more" when q_vif says the two overlap. All four R2 values
# come from ONE set of exact decimal moments (the q_ridge_path
# block); output sums to R2(both) by construction.

LMG_SQL = """
WITH f AS (
  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
         CAST(p_retailprice AS DECIMAL(18,2)) AS x2,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x1) AS DOUBLE) AS sx1, CAST(SUM(x2) AS DOUBLE) AS sx2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 * y AS DECIMAL(28,4))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 * y AS DECIMAL(28,4))) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
  FROM f
), cen AS (
  SELECT n,
         s11 - sx1 * sx1 / n AS c11, s12 - sx1 * sx2 / n AS c12,
         s22 - sx2 * sx2 / n AS c22, s1y - sx1 * sy / n AS c1y,
         s2y - sx2 * sy / n AS c2y, syy - sy * sy / n AS cyy
  FROM m
), r2 AS (
  SELECT (c1y * c1y) / (c11 * cyy) AS r1,
         (c2y * c2y) / (c22 * cyy) AS r2_,
         ((c1y * (c22) - c2y * c12) * c1y
          + (c2y * (c11) - c1y * c12) * c2y)
           / ((c11 * c22 - c12 * c12) * cyy) AS rboth
  FROM cen
)
SELECT round(r1, 6) AS r2_quantity_alone,
       round(r2_, 6) AS r2_retailprice_alone,
       round(rboth, 6) AS r2_both,
       round((r1 + (rboth - r2_)) / 2, 6) AS lmg_quantity,
       round((r2_ + (rboth - r1)) / 2, 6) AS lmg_retailprice
FROM r2
"""


@query("q_lmg_importance", oracle=LMG_SQL)
def q_lmg_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_retailprice")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        dec("l_quantity").alias("x1"),
        dec("p_retailprice").alias("x2"),
        dec("l_extendedprice").alias("y"),
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    p28 = lambda e: F.sum(e.cast("decimal(28,4)")).cast("double")  # noqa: E731
    m = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("double").alias("sx1"),
        F.sum(x2).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        p28(x1 * x2).alias("s12"),
        p28(x2 * x2).alias("s22"),
        p28(x1 * y).alias("s1y"),
        p28(x2 * y).alias("s2y"),
        p28(y * y).alias("syy"),
    )
    n = F.col("n")
    cen = m.select(
        (F.col("s11") - F.col("sx1") * F.col("sx1") / n).alias("c11"),
        (F.col("s12") - F.col("sx1") * F.col("sx2") / n).alias("c12"),
        (F.col("s22") - F.col("sx2") * F.col("sx2") / n).alias("c22"),
        (F.col("s1y") - F.col("sx1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("sx2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
    )
    c11, c12, c22 = F.col("c11"), F.col("c12"), F.col("c22")
    c1y, c2y, cyy = F.col("c1y"), F.col("c2y"), F.col("cyy")
    r1 = (c1y * c1y) / (c11 * cyy)
    r2_ = (c2y * c2y) / (c22 * cyy)
    rboth = (
        (c1y * c22 - c2y * c12) * c1y + (c2y * c11 - c1y * c12) * c2y
    ) / ((c11 * c22 - c12 * c12) * cyy)
    return cen.select(
        F.round(r1, 6).alias("r2_quantity_alone"),
        F.round(r2_, 6).alias("r2_retailprice_alone"),
        F.round(rboth, 6).alias("r2_both"),
        F.round((r1 + (rboth - r2_)) / 2, 6).alias("lmg_quantity"),
        F.round((r2_ + (rboth - r1)) / 2, 6).alias("lmg_retailprice"),
    )


# -- q_topsis ----------------------------------------------------------
#
# Entropy-weighted TOPSIS supplier ranking: three criteria per
# supplier (total revenue BENEFIT, mean order->ship lead time COST,
# return-rate COST) are min-max normalized with exact min/max window
# constants, weighted by the Shannon-entropy objective-weighting
# scheme (criteria that DIFFERENTIATE suppliers get more weight),
# and scored by TOPSIS closeness d-/(d+ + d-) to the ideal /
# anti-ideal points — the MCDM decision table absent from every
# single-metric supplier view (q_top_suppliers ranks by one column).
# Entropy/distance terms are 9-rounded decimal folds; ranking breaks
# ties on supplier key. Top 20 reported.

TOPSIS_SQL = """
WITH crit AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DOUBLE) AS rev,
         CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE))) AS DOUBLE)
           / COUNT(*) AS lead,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           / CAST(COUNT(*) AS DOUBLE) AS ret
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1
), mm AS (
  SELECT MIN(rev) AS rev_lo, MAX(rev) AS rev_hi,
         MIN(lead) AS lead_lo, MAX(lead) AS lead_hi,
         MIN(ret) AS ret_lo, MAX(ret) AS ret_hi,
         COUNT(*) AS k
  FROM crit
), norm AS (
  SELECT sk,
         round((rev - rev_lo) / (rev_hi - rev_lo), 9) AS v1,
         round((lead_hi - lead) / (lead_hi - lead_lo), 9) AS v2,
         round((ret_hi - ret) / (ret_hi - ret_lo), 9) AS v3
  FROM crit CROSS JOIN mm
), colsum AS (
  SELECT CAST(SUM(CAST(v1 AS DECIMAL(16,9))) AS DOUBLE) AS t1,
         CAST(SUM(CAST(v2 AS DECIMAL(16,9))) AS DOUBLE) AS t2,
         CAST(SUM(CAST(v3 AS DECIMAL(16,9))) AS DOUBLE) AS t3,
         COUNT(*) AS k
  FROM norm
), ent AS (
  SELECT
    1 + CAST(SUM(CASE WHEN v1 > 0 THEN
          CAST(round((v1 / t1) * ln(v1 / t1), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d1,
    1 + CAST(SUM(CASE WHEN v2 > 0 THEN
          CAST(round((v2 / t2) * ln(v2 / t2), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d2,
    1 + CAST(SUM(CASE WHEN v3 > 0 THEN
          CAST(round((v3 / t3) * ln(v3 / t3), 9) AS DECIMAL(16,9)) END)
        AS DOUBLE) / ln(CAST(k AS DOUBLE)) AS d3
  FROM norm CROSS JOIN colsum
  GROUP BY k
), w AS (
  SELECT round(d1 / (d1 + d2 + d3), 9) AS w1,
         round(d2 / (d1 + d2 + d3), 9) AS w2,
         round(d3 / (d1 + d2 + d3), 9) AS w3
  FROM ent
), scored AS (
  SELECT sk,
         sqrt(w1 * w1 * (1 - v1) * (1 - v1)
              + w2 * w2 * (1 - v2) * (1 - v2)
              + w3 * w3 * (1 - v3) * (1 - v3)) AS dplus,
         sqrt(w1 * w1 * v1 * v1 + w2 * w2 * v2 * v2
              + w3 * w3 * v3 * v3) AS dminus
  FROM norm CROSS JOIN w
), ranked AS (
  SELECT sk,
         round(dminus / (dplus + dminus), 6) AS closeness,
         ROW_NUMBER() OVER (ORDER BY round(dminus / (dplus + dminus), 6)
                            DESC, sk) AS rk
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rk, CAST(sk AS BIGINT) AS suppkey,
       closeness
FROM ranked WHERE rk <= 20
ORDER BY rk
"""


@query("q_topsis", oracle=TOPSIS_SQL)
def q_topsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    crit = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("rev"),
            (
                F.sum(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("lead"),
            (
                F.sum(
                    F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("ret"),
        )
        .localCheckpoint()
    )
    mm = crit.agg(
        F.min("rev").alias("rev_lo"), F.max("rev").alias("rev_hi"),
        F.min("lead").alias("lead_lo"), F.max("lead").alias("lead_hi"),
        F.min("ret").alias("ret_lo"), F.max("ret").alias("ret_hi"),
        F.count(F.lit(1)).alias("k"),
    )
    norm = crit.join(F.broadcast(mm)).select(
        "sk",
        F.round(
            (F.col("rev") - F.col("rev_lo"))
            / (F.col("rev_hi") - F.col("rev_lo")),
            9,
        ).alias("v1"),
        F.round(
            (F.col("lead_hi") - F.col("lead"))
            / (F.col("lead_hi") - F.col("lead_lo")),
            9,
        ).alias("v2"),
        F.round(
            (F.col("ret_hi") - F.col("ret"))
            / (F.col("ret_hi") - F.col("ret_lo")),
            9,
        ).alias("v3"),
    ).localCheckpoint()
    d9 = lambda e: F.sum(F.round(e, 9).cast("decimal(16,9)")).cast(  # noqa: E731
        "double"
    )
    colsum = norm.agg(
        F.sum(F.col("v1").cast("decimal(16,9)")).cast("double").alias("t1"),
        F.sum(F.col("v2").cast("decimal(16,9)")).cast("double").alias("t2"),
        F.sum(F.col("v3").cast("decimal(16,9)")).cast("double").alias("t3"),
        F.count(F.lit(1)).alias("k"),
    )
    def eterm(v, t):
        return F.sum(
            F.when(
                F.col(v) > 0,
                F.round(
                    (F.col(v) / F.col(t)) * F.log(F.col(v) / F.col(t)), 9
                ).cast("decimal(16,9)"),
            )
        ).cast("double")

    ent = (
        norm.join(F.broadcast(colsum))
        .groupBy("k")
        .agg(
            eterm("v1", "t1").alias("e1"),
            eterm("v2", "t2").alias("e2"),
            eterm("v3", "t3").alias("e3"),
        )
        .select(
            (1 + F.col("e1") / F.log(F.col("k").cast("double"))).alias("d1"),
            (1 + F.col("e2") / F.log(F.col("k").cast("double"))).alias("d2"),
            (1 + F.col("e3") / F.log(F.col("k").cast("double"))).alias("d3"),
        )
    )
    tot = F.col("d1") + F.col("d2") + F.col("d3")
    w = ent.select(
        F.round(F.col("d1") / tot, 9).alias("w1"),
        F.round(F.col("d2") / tot, 9).alias("w2"),
        F.round(F.col("d3") / tot, 9).alias("w3"),
    )
    v1, v2, v3 = F.col("v1"), F.col("v2"), F.col("v3")
    w1, w2, w3 = F.col("w1"), F.col("w2"), F.col("w3")
    dplus = F.sqrt(
        w1 * w1 * (1 - v1) * (1 - v1)
        + w2 * w2 * (1 - v2) * (1 - v2)
        + w3 * w3 * (1 - v3) * (1 - v3)
    )
    dminus = F.sqrt(
        w1 * w1 * v1 * v1 + w2 * w2 * v2 * v2 + w3 * w3 * v3 * v3
    )
    closeness = F.round(dminus / (dplus + dminus), 6)
    ranked = norm.join(F.broadcast(w)).select(
        "sk", closeness.alias("closeness")
    ).select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("closeness").desc(), "sk"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            F.col("sk").cast("bigint").alias("suppkey"),
            "closeness",
        )
        .orderBy("rk")
    )


# -- q_huber_regression ------------------------------------------------
#
# One-step Huber IRLS regression of extendedprice on quantity per
# brand: the OLS fit supplies residuals, the MAD of residuals sets
# the robustness scale, Huber weights w = min(1, 1.345*s/|r|)
# downweight outlying lines, and ONE reweighted least-squares pass
# yields the robust slope — q_huber_m's location idea lifted to the
# regression q_regression fits non-robustly, with the OLS-vs-robust
# slope gap as the outlier-influence diagnostic. Weighted moments
# fold 4-rounded terms exactly; the MAD uses the house interpolated
# quantile.

HUBERREG_SQL = """
WITH f AS (
  SELECT p_brand, CAST(l_quantity AS DECIMAL(18,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), m AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy
  FROM f GROUP BY 1
), ols AS (
  SELECT p_brand,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
  FROM m
), res AS (
  SELECT f.p_brand, f.x, f.y,
         CAST(f.y AS DOUBLE) - o.a - o.b * CAST(f.x AS DOUBLE) AS r,
         o.b AS b_ols
  FROM f JOIN ols o ON o.p_brand = f.p_brand
), scale AS (
  SELECT p_brand,
         round(1.4826 * quantile_cont(abs(r), 0.5), 6) AS s
  FROM res GROUP BY 1
), wts AS (
  SELECT r.p_brand, r.x, r.y, r.b_ols,
         round(LEAST(1.0, 1.345 * sc.s / GREATEST(abs(r.r), 1e-12)), 9)
           AS w
  FROM res r JOIN scale sc ON sc.p_brand = r.p_brand
), wm AS (
  SELECT p_brand, MAX(b_ols) AS b_ols,
         CAST(SUM(CAST(round(w, 9) AS DECIMAL(14,9))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(round(w * CAST(x AS DOUBLE), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS swx,
         CAST(SUM(CAST(round(w * CAST(y AS DOUBLE), 4)
                       AS DECIMAL(28,4))) AS DOUBLE) AS swy,
         CAST(SUM(CAST(round(w * CAST(x AS DOUBLE) * CAST(x AS DOUBLE),
                             4) AS DECIMAL(32,4))) AS DOUBLE) AS swxx,
         CAST(SUM(CAST(round(w * CAST(x AS DOUBLE) * CAST(y AS DOUBLE),
                             4) AS DECIMAL(38,4))) AS DOUBLE) AS swxy
  FROM wts GROUP BY 1
)
SELECT p_brand,
       round(b_ols, 6) AS slope_ols,
       round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 6)
         AS slope_huber,
       round((sw * swxy - swx * swy) / (sw * swxx - swx * swx)
             - b_ols, 6) AS robust_shift
FROM wm
ORDER BY p_brand
"""


@query("q_huber_regression", oracle=HUBERREG_SQL)
def q_huber_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand", dec("l_quantity").alias("x"),
        dec("l_extendedprice").alias("y"),
    ).localCheckpoint()
    x, y = F.col("x"), F.col("y")
    m = f.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    b = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    ols = m.select(
        "p_brand", b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / n).alias("a"),
    )
    res = f.join(F.broadcast(ols), "p_brand").select(
        "p_brand", "x", "y",
        (
            y.cast("double") - F.col("a") - F.col("b") * x.cast("double")
        ).alias("r"),
        F.col("b").alias("b_ols"),
    ).localCheckpoint()
    scale = res.groupBy("p_brand").agg(
        F.round(1.4826 * F.percentile(F.abs("r"), F.lit(0.5)), 6)
        .alias("s")
    )
    w = F.round(
        F.least(
            F.lit(1.0),
            1.345 * F.col("s") / F.greatest(F.abs("r"), F.lit(1e-12)),
        ),
        9,
    )
    wts = res.join(F.broadcast(scale), "p_brand").select(
        "p_brand", "x", "y", "b_ols", w.alias("w")
    )
    xd, yd, wv = x.cast("double"), y.cast("double"), F.col("w")
    r4 = lambda e, p: F.sum(  # noqa: E731
        F.round(e, 4).cast(f"decimal({p},4)")
    ).cast("double")
    wm = wts.groupBy("p_brand").agg(
        F.max("b_ols").alias("b_ols"),
        F.sum(F.round(wv, 9).cast("decimal(14,9)")).cast("double")
        .alias("sw"),
        r4(wv * xd, 28).alias("swx"),
        r4(wv * yd, 28).alias("swy"),
        r4(wv * xd * xd, 32).alias("swxx"),
        r4(wv * xd * yd, 38).alias("swxy"),
    )
    sw, swx, swy = F.col("sw"), F.col("swx"), F.col("swy")
    swxx, swxy = F.col("swxx"), F.col("swxy")
    bh = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    return wm.select(
        "p_brand",
        F.round("b_ols", 6).alias("slope_ols"),
        F.round(bh, 6).alias("slope_huber"),
        F.round(bh - F.col("b_ols"), 6).alias("robust_shift"),
    ).orderBy("p_brand")


# -- q_risk_pooling ----------------------------------------------------
#
# Square-root-law risk-pooling benefit per brand: hold inventory per
# nation and you buffer against each nation's daily demand sigma
# separately (sum of sigmas); pool it centrally and you buffer
# against the sigma of the SUM — benefit = 1 - sigma_pooled /
# sum(sigma_i), the closed-form argument for warehouse consolidation
# that q_safety_stock prices per location. Per-(brand, nation) and
# pooled daily demand moments come from the SAME zero-filled grid
# (exact decimal sums), so the two sigmas are consistent by
# construction; correlated national demands show up as a SMALLER
# benefit than the independent sqrt(n) ideal, which is the point of
# measuring it.

POOL_SQL = """
WITH f AS (
  SELECT p_brand, n_name, CAST(l_shipdate AS DATE) AS d,
         CAST(l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN part ON p_partkey = l_partkey
), days AS (SELECT DISTINCT d FROM f),
bn AS (SELECT DISTINCT p_brand, n_name FROM f),
cell AS (
  SELECT p_brand, n_name, d, CAST(SUM(q) AS DECIMAL(24,2)) AS dq
  FROM f GROUP BY 1, 2, 3
), grid AS (
  SELECT b.p_brand, b.n_name, days.d,
         COALESCE(c.dq, CAST(0 AS DECIMAL(24,2))) AS dq
  FROM bn b CROSS JOIN days
  LEFT JOIN cell c ON c.p_brand = b.p_brand AND c.n_name = b.n_name
                  AND c.d = days.d
), permkt AS (
  SELECT p_brand, n_name, COUNT(*) AS nd,
         CAST(SUM(dq) AS DOUBLE) AS s1,
         CAST(SUM(CAST(dq * dq AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM grid GROUP BY 1, 2
), sig AS (
  SELECT p_brand,
         CAST(SUM(CAST(round(sqrt((s2 - s1 * s1 / nd) / (nd - 1)), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS sum_sigma,
         COUNT(*) AS n_markets
  FROM permkt GROUP BY 1
), pooled AS (
  SELECT p_brand, COUNT(*) AS nd,
         CAST(SUM(dq) AS DOUBLE) AS s1,
         CAST(SUM(CAST(dq2 * dq2 AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM (
    SELECT p_brand, d, CAST(SUM(dq) AS DECIMAL(26,2)) AS dq,
           CAST(SUM(dq) AS DECIMAL(26,2)) AS dq2
    FROM grid GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT s.p_brand,
       CAST(s.n_markets AS BIGINT) AS n_markets,
       round(s.sum_sigma, 4) AS sum_local_sigma,
       round(sqrt((p.s2 - p.s1 * p.s1 / p.nd) / (p.nd - 1)), 4)
         AS pooled_sigma,
       round(1 - sqrt((p.s2 - p.s1 * p.s1 / p.nd) / (p.nd - 1))
                 / s.sum_sigma, 6) AS pooling_benefit,
       round(1 - 1 / sqrt(CAST(s.n_markets AS DOUBLE)), 6)
         AS sqrt_law_ideal
FROM sig s JOIN pooled p ON p.p_brand = s.p_brand
ORDER BY s.p_brand
"""


@query("q_risk_pooling", oracle=POOL_SQL)
def q_risk_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_brand", "n_name",
            F.col("l_shipdate").cast("date").alias("d"),
            dec("l_quantity").alias("q"),
        )
        .localCheckpoint()
    )
    days = f.select("d").distinct()
    bn = f.select("p_brand", "n_name").distinct()
    cell = f.groupBy("p_brand", "n_name", "d").agg(
        F.sum("q").cast("decimal(24,2)").alias("dq")
    )
    grid = (
        bn.crossJoin(F.broadcast(days))
        .join(cell, ["p_brand", "n_name", "d"], "left")
        .select(
            "p_brand", "n_name", "d",
            F.coalesce("dq", F.lit(0).cast("decimal(24,2)")).alias("dq"),
        )
        .localCheckpoint()
    )
    dq = F.col("dq")
    permkt = grid.groupBy("p_brand", "n_name").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(dq).cast("double").alias("s1"),
        F.sum((dq * dq).cast("decimal(38,4)")).cast("double").alias("s2"),
    )
    nd = F.col("nd")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / nd) / (nd - 1)
    )
    sig = permkt.groupBy("p_brand").agg(
        F.sum(F.round(sigma, 6).cast("decimal(18,6)")).cast("double")
        .alias("sum_sigma"),
        F.count(F.lit(1)).alias("n_markets"),
    )
    daily = grid.groupBy("p_brand", "d").agg(
        F.sum(dq).cast("decimal(26,2)").alias("tdq")
    )
    t = F.col("tdq")
    pooled = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(t).cast("double").alias("s1"),
        F.sum((t * t).cast("decimal(38,4)")).cast("double").alias("s2"),
    )
    psig = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nd"))
        / (F.col("nd") - 1)
    )
    return (
        sig.join(pooled, "p_brand")
        .select(
            "p_brand",
            F.col("n_markets").cast("bigint").alias("n_markets"),
            F.round("sum_sigma", 4).alias("sum_local_sigma"),
            F.round(psig, 4).alias("pooled_sigma"),
            F.round(1 - psig / F.col("sum_sigma"), 6)
            .alias("pooling_benefit"),
            F.round(
                1 - 1 / F.sqrt(F.col("n_markets").cast("double")), 6
            ).alias("sqrt_law_ideal"),
        )
        .orderBy("p_brand")
    )


# -- q_shorrocks_mobility ----------------------------------------------
#
# Shorrocks mobility index of the customer spend-quintile transition
# matrix between the two data halves: M = (K - trace(P)) / (K - 1),
# where P's rows are the empirical quintile-to-quintile transition
# shares — 0 = a caste system (everyone stays), 1 = perfect mobility
# — the single-number summary of the matrix q_decile_transitions
# tabulates and q_mover_stayer decomposes. Quintiles are exact rank
# cuts (ceil(5r/n), ties by custkey); trace shares are exact count
# ratios; one double finale.

SHORROCKS_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax,
                   MIN(CAST(o_orderdate AS DATE)) AS dmin FROM orders),
spend AS (
  SELECT o_custkey,
         CASE WHEN CAST(o_orderdate AS DATE)
                   < dmin + CAST((dmax - dmin) // 2 AS INTEGER)
              THEN 0 ELSE 1 END AS half,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders CROSS JOIN mx
), tot AS (
  SELECT o_custkey, half, CAST(SUM(x) AS DECIMAL(28,2)) AS s
  FROM spend GROUP BY 1, 2
), q AS (
  SELECT o_custkey, half,
         CAST(ceil(5.0 * ROW_NUMBER() OVER
                (PARTITION BY half ORDER BY s, o_custkey)
              / COUNT(*) OVER (PARTITION BY half)) AS BIGINT) AS quint
  FROM tot
), pair AS (
  SELECT a.quint AS q0, b.quint AS q1
  FROM q a JOIN q b ON b.o_custkey = a.o_custkey
  WHERE a.half = 0 AND b.half = 1
), rows_ AS (
  SELECT q0, COUNT(*) AS n,
         CAST(SUM(CASE WHEN q1 = q0 THEN 1 ELSE 0 END) AS BIGINT)
           AS stay
  FROM pair GROUP BY 1
), tr AS (
  SELECT CAST(SUM(CAST(round(stay / CAST(n AS DOUBLE), 9)
                       AS DECIMAL(12,9))) AS DOUBLE) AS trace_,
         COUNT(*) AS k,
         CAST(SUM(n) AS BIGINT) AS n_customers
  FROM rows_
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS k_states,
       round(trace_, 6) AS trace_p,
       round((k - trace_) / (k - 1.0), 6) AS shorrocks_m
FROM tr
"""


@query("q_shorrocks_mobility", oracle=SHORROCKS_SQL)
def q_shorrocks_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.col("o_custkey").alias("ck"), F.col("quint").alias("q0")
    )
    b = q.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck2"), F.col("quint").alias("q1")
    )
    pair = a.join(b, F.col("ck") == F.col("ck2")).select("q0", "q1")
    rows_ = pair.groupBy("q0").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("q1") == F.col("q0"), 1).otherwise(0))
        .cast("bigint")
        .alias("stay"),
    )
    tr = rows_.agg(
        F.sum(
            F.round(F.col("stay") / F.col("n").cast("double"), 9).cast(
                "decimal(12,9)"
            )
        )
        .cast("double")
        .alias("trace_"),
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("n_customers"),
    )
    k = F.col("k")
    return tr.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        k.cast("bigint").alias("k_states"),
        F.round("trace_", 6).alias("trace_p"),
        F.round((k - F.col("trace_")) / (k - 1.0), 6)
        .alias("shorrocks_m"),
    )


# -- txt_gries_dp ------------------------------------------------------
#
# Gries' Deviation of Proportions (DP) corpus dispersion for the
# top-10 content words: DP(w) = 0.5 * sum_parts |share of w's tokens
# in part - part's share of all tokens| over the source partition —
# 0 = the word spreads exactly like the corpus, 1 = confined to one
# source; the dispersion axis that raw frequency (txt_zipf) and
# cohesion (txt_umass_coherence) both miss, and the standard
# corpus-linguistics replacement for juilland's D. Exact token
# counts; 12-rounded |.| terms folded exactly.

GRIES_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
), filt AS (
  SELECT source, w FROM toks WHERE len(w) >= 3
), parts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS pt,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tt
  FROM filt GROUP BY 1
), wf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM filt GROUP BY 1
), topw AS (
  SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rk FROM wf
), topw10 AS (SELECT * FROM topw WHERE rk <= 10),
wp AS (
  SELECT f.w, f.source, CAST(COUNT(*) AS BIGINT) AS c
  FROM filt f JOIN topw10 t ON t.w = f.w
  GROUP BY 1, 2
), grid AS (
  SELECT t.w, t.f, p.source, p.pt, p.tt, COALESCE(wp.c, 0) AS c
  FROM topw10 t CROSS JOIN parts p
  LEFT JOIN wp ON wp.w = t.w AND wp.source = p.source
)
SELECT w AS word, CAST(f AS BIGINT) AS freq,
       round(0.5 * CAST(SUM(CAST(round(
           abs(c / CAST(f AS DOUBLE) - pt / CAST(tt AS DOUBLE)), 12)
         AS DECIMAL(16,12))) AS DOUBLE), 6) AS gries_dp
FROM grid
GROUP BY w, f
ORDER BY word
"""


@query("txt_gries_dp", oracle=GRIES_SQL)
def txt_gries_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    filt = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 3).localCheckpoint()
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    parts = (
        filt.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pt"))
        .select("source", "pt", F.sum("pt").over(wall).cast("bigint").alias("tt"))
    )
    wf = filt.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    topw = wf.select(
        "w", "f",
        F.row_number().over(Window.orderBy(F.col("f").desc(), "w"))
        .alias("rk"),
    ).filter(F.col("rk") <= 10).localCheckpoint()
    wp = (
        filt.join(F.broadcast(topw.select("w")), "w")
        .groupBy("w", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = (
        topw.crossJoin(F.broadcast(parts))
        .join(wp, ["w", "source"], "left")
        .select(
            "w", "f", "source", "pt", "tt",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    term = F.round(
        F.abs(
            F.col("c") / F.col("f").cast("double")
            - F.col("pt") / F.col("tt").cast("double")
        ),
        12,
    ).cast("decimal(16,12)")
    return (
        grid.select("w", "f", term.alias("t"))
        .groupBy("w")
        .agg(
            F.max("f").cast("bigint").alias("freq"),
            F.round(0.5 * F.sum("t").cast("double"), 6).alias("gries_dp"),
        )
        .select(F.col("w").alias("word"), "freq", "gries_dp")
        .orderBy("word")
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


# -- q_eb_poisson ------------------------------------------------------
#
# Gamma-Poisson empirical-Bayes shrinkage of per-customer yearly
# order RATES within each nation: method-of-moments gamma prior
# (alpha, beta) from the cross-customer mean and variance of raw
# rates (variance minus mean/exposure-bar = the between-customer
# component), posterior rate = (alpha + k_i-bar...) reported at the
# NATION level as prior strength and the shrinkage applied to a
# reference customer with 1 order — the count-data sibling of
# q_eb_binomial (rates with exposure, not proportions). Moments are
# 9-rounded decimal folds; degenerate nations (variance <= mean
# noise floor) report NULL prior (documented: no shrinkage basis).

EBPOIS_SQL = """
WITH span AS (
  SELECT (date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                    MAX(CAST(o_orderdate AS DATE))) + 1) / 365.25 AS yrs
  FROM orders
), k AS (
  SELECT c_nationkey, c_custkey, COUNT(o_orderkey) AS k
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_nationkey,
         CAST(round(k / yrs, 9) AS DECIMAL(16,9)) AS rate
  FROM k CROSS JOIN span
), mom AS (
  SELECT c_nationkey, COUNT(*) AS n,
         CAST(SUM(rate) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(CAST(rate AS DOUBLE) * CAST(rate AS DOUBLE),
                             9) AS DECIMAL(24,9))) AS DOUBLE) AS s2,
         MAX((SELECT yrs FROM span)) AS yrs
  FROM r GROUP BY 1
), fit AS (
  SELECT c_nationkey, n, s1 / n AS m,
         (s2 - s1 * s1 / n) / (n - 1) - (s1 / n) / yrs AS v_between,
         yrs
  FROM mom
), prior AS (
  SELECT n_name, n, m,
         CASE WHEN v_between > 0 THEN m * m / v_between END AS alpha,
         CASE WHEN v_between > 0 THEN m / v_between END AS beta
  FROM fit JOIN nation ON n_nationkey = c_nationkey
)
SELECT n_name, CAST(n AS BIGINT) AS n_customers,
       round(m, 6) AS mean_rate,
       round(alpha, 6) AS prior_alpha,
       round(beta, 6) AS prior_beta,
       round((alpha + 1) / (beta + 7.0), 6) AS posterior_rate_one_order
FROM prior
ORDER BY n_name
"""


@query("q_eb_poisson", oracle=EBPOIS_SQL)
def q_eb_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    span = cat.orders.agg(
        ((F.datediff(F.max(od), F.min(od)) + 1) / 365.25).alias("yrs")
    )
    k = (
        cat.customer.join(
            cat.orders.select("o_custkey", "o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count("o_orderkey").alias("k"))
    )
    r = k.join(F.broadcast(span)).select(
        "c_nationkey",
        F.round(F.col("k") / F.col("yrs"), 9)
        .cast("decimal(16,9)")
        .alias("rate"),
        "yrs",
    )
    rated = F.col("rate").cast("double")
    mom = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rate").cast("double").alias("s1"),
        F.sum(F.round(rated * rated, 9).cast("decimal(24,9)"))
        .cast("double")
        .alias("s2"),
        F.max("yrs").alias("yrs"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    v_between = (
        (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
        - m / F.col("yrs")
    )
    fit = mom.select(
        "c_nationkey", n.alias("n"), m.alias("m"),
        v_between.alias("v_between"),
    )
    alpha = F.when(
        F.col("v_between") > 0, F.col("m") * F.col("m") / F.col("v_between")
    )
    beta = F.when(
        F.col("v_between") > 0, F.col("m") / F.col("v_between")
    )
    prior = fit.join(
        F.broadcast(cat.nation.select("n_nationkey", "n_name")),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select(
        "n_name", "n", "m", alpha.alias("alpha"), beta.alias("beta")
    )
    return prior.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round("m", 6).alias("mean_rate"),
        F.round("alpha", 6).alias("prior_alpha"),
        F.round("beta", 6).alias("prior_beta"),
        F.round(
            (F.col("alpha") + 1) / (F.col("beta") + 7.0), 6
        ).alias("posterior_rate_one_order"),
    ).orderBy("n_name")


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


# -- q_expectile -------------------------------------------------------
#
# 0.9-expectile of event value per event type via three UNROLLED
# asymmetric-least-squares reweighting steps from the mean: at each
# step points above the current estimate weigh tau = 0.9 and points
# below weigh 0.1, and the next estimate is the weighted mean — the
# fixed-point iteration that converges geometrically and is exactly
# reproducible because each step is two conditional exact-decimal
# sums (no sorting, no interpolation). Expectiles are the
# coherent-risk alternative to quantiles (EVaR); the gap to the
# q_percentiles p90 measures tail heaviness. Step estimates are
# 6-rounded so both engines branch identically at every iteration.

EXPECTILE_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL
), m0 AS (
  SELECT event_type,
         round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS e0
  FROM v GROUP BY 1
), s1 AS (
  SELECT v.event_type,
         round(CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e0
                        THEN CAST(0.9 * x AS DECIMAL(20,6))
                        ELSE CAST(0.1 * x AS DECIMAL(20,6)) END)
                    AS DOUBLE)
               / CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e0
                          THEN 0.9 ELSE 0.1 END) AS DOUBLE), 6) AS e1
  FROM v JOIN m0 ON m0.event_type = v.event_type
  GROUP BY v.event_type
), s2 AS (
  SELECT v.event_type,
         round(CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e1
                        THEN CAST(0.9 * x AS DECIMAL(20,6))
                        ELSE CAST(0.1 * x AS DECIMAL(20,6)) END)
                    AS DOUBLE)
               / CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e1
                          THEN 0.9 ELSE 0.1 END) AS DOUBLE), 6) AS e2
  FROM v JOIN s1 ON s1.event_type = v.event_type
  GROUP BY v.event_type
), s3 AS (
  SELECT v.event_type,
         round(CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e2
                        THEN CAST(0.9 * x AS DECIMAL(20,6))
                        ELSE CAST(0.1 * x AS DECIMAL(20,6)) END)
                    AS DOUBLE)
               / CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > e2
                          THEN 0.9 ELSE 0.1 END) AS DOUBLE), 6) AS e3
  FROM v JOIN s2 ON s2.event_type = v.event_type
  GROUP BY v.event_type
)
SELECT m0.event_type,
       m0.e0 AS mean_value,
       s3.e3 AS expectile_90,
       round(s3.e3 - s2.e2, 6) AS last_step_delta
FROM m0 JOIN s2 ON s2.event_type = m0.event_type
JOIN s3 ON s3.event_type = m0.event_type
ORDER BY m0.event_type
"""


@query("q_expectile", oracle=EXPECTILE_SQL)
def q_expectile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round("value", 6).cast("decimal(18,6)").alias("x"),
    ).localCheckpoint()
    xd = F.col("x").cast("double")

    def step(prev: DataFrame, col: str, out: str) -> DataFrame:
        j = v.join(F.broadcast(prev), "event_type")
        above = xd > F.col(col)
        num = F.sum(
            F.when(above, (0.9 * F.col("x")).cast("decimal(20,6)"))
            .otherwise((0.1 * F.col("x")).cast("decimal(20,6)"))
        ).cast("double")
        den = F.sum(F.when(above, 0.9).otherwise(0.1)).cast("double")
        return j.groupBy("event_type").agg(
            F.round(num / den, 6).alias(out)
        )

    m0 = v.groupBy("event_type").agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 6)
        .alias("e0")
    )
    s1 = step(m0, "e0", "e1")
    s2 = step(s1, "e1", "e2")
    s3 = step(s2, "e2", "e3")
    return (
        m0.join(s2, "event_type")
        .join(s3, "event_type")
        .select(
            "event_type",
            F.col("e0").alias("mean_value"),
            F.col("e3").alias("expectile_90"),
            F.round(F.col("e3") - F.col("e2"), 6)
            .alias("last_step_delta"),
        )
        .orderBy("event_type")
    )


# -- q_crow_amsaa ------------------------------------------------------
#
# Crow-AMSAA (Duane) reliability-growth model on the return stream:
# cumulative returned lines N(t) vs operating days t on log-log
# axes; the slope beta of ln N = ln lambda + beta ln t says whether
# the return process is improving (beta < 1), stationary (= 1), or
# deteriorating (> 1), with the scale lambda as the day-one rate —
# the standard reliability-program tracking chart, fit by exact-
# moment OLS over the (ln t, ln N) grid of return days. The
# process-improvement counterpart to q_p_chart's control view.

CROW_SQL = """
WITH mx AS (SELECT MIN(CAST(l_shipdate AS DATE)) AS d0 FROM lineitem),
ret AS (
  SELECT date_diff('day', d0, CAST(l_shipdate AS DATE)) + 1 AS t
  FROM lineitem CROSS JOIN mx WHERE l_returnflag = 'R'
), cum AS (
  SELECT t, CAST(SUM(COUNT(*)) OVER (ORDER BY t) AS BIGINT) AS nt
  FROM ret GROUP BY t
), xy AS (
  SELECT CAST(round(ln(CAST(t AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(nt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM cum
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(24,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(24,9))) AS DOUBLE) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_return_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
       round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n), 6) AS lambda_scale,
       CAST(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) < 1
            THEN 1 ELSE 0 END AS BIGINT) AS improving
FROM m
"""


@query("q_crow_amsaa", oracle=CROW_SQL)
def q_crow_amsaa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    mx = li.agg(F.min(F.col("l_shipdate").cast("date")).alias("d0"))
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(mx))
        .select(
            (
                F.datediff(F.col("l_shipdate").cast("date"), F.col("d0"))
                + 1
            ).alias("t")
        )
    )
    cum = (
        ret.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "t",
            F.sum("c").over(Window.orderBy("t")).cast("bigint")
            .alias("nt"),
        )
    )
    xy = cum.select(
        F.round(F.log(F.col("t").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(F.log(F.col("nt").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(24,9)")
    ).cast("double")
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    beta = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return m.select(
        n.cast("bigint").alias("n_return_days"),
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((sy - beta * sx) / n), 6).alias("lambda_scale"),
        F.when(beta < 1, 1).otherwise(0).cast("bigint").alias("improving"),
    )


# -- q_whipple_index ---------------------------------------------------
#
# Whipple-style digit-preference audit on order quantities: the
# demography heaping index (share of terminal digits 0 and 5 scaled
# by 5/2 x 100; 100 = no preference, 500 = everything heaped) plus
# the full terminal-digit distribution chi-square — data-entry
# fabrication and eyeballed-measurement detection on QUANTITIES, the
# integer companion to q_round_number_bias's price-point view and
# q_benford's leading-digit law. Digits come from exact integer
# modulo; every statistic is a ratio of exact counts.

WHIPPLE_SQL = """
WITH d AS (
  SELECT CAST(CAST(l_quantity AS BIGINT) % 10 AS BIGINT) AS digit
  FROM lineitem
), cnt AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
  FROM d GROUP BY 1
), agg AS (
  SELECT MAX(n) AS n,
         CAST(SUM(CASE WHEN digit IN (0, 5) THEN c ELSE 0 END)
              AS BIGINT) AS heap,
         CAST(SUM(CAST(round((c - n / 10.0) * (c - n / 10.0)
                             / (n / 10.0), 6) AS DECIMAL(24,6)))
              AS DOUBLE) AS chi2
  FROM cnt
)
SELECT CAST(n AS BIGINT) AS n_lines,
       round(250.0 * heap / n, 4) AS whipple_index,
       round(chi2, 4) AS digit_chi2,
       CAST(CASE WHEN 250.0 * heap / n > 125 THEN 1 ELSE 0 END
            AS BIGINT) AS heaping_flag
FROM agg
"""


@query("q_whipple_index", oracle=WHIPPLE_SQL)
def q_whipple_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    d = li.select(
        (F.col("l_quantity").cast("bigint") % 10).cast("bigint")
        .alias("digit")
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cnt = (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "digit", "c", F.sum("c").over(wall).cast("bigint").alias("n")
        )
    )
    c, n = F.col("c"), F.col("n")
    chi_term = F.round(
        (c - n / 10.0) * (c - n / 10.0) / (n / 10.0), 6
    ).cast("decimal(24,6)")
    agg = cnt.agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("digit").isin(0, 5), c).otherwise(0))
        .cast("bigint")
        .alias("heap"),
        F.sum(chi_term).cast("double").alias("chi2"),
    )
    wi = 250.0 * F.col("heap") / F.col("n")
    return agg.select(
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(wi, 4).alias("whipple_index"),
        F.round("chi2", 4).alias("digit_chi2"),
        F.when(wi > 125, 1).otherwise(0).cast("bigint")
        .alias("heaping_flag"),
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


# -- q_discovery_curve -------------------------------------------------
#
# Assortment discovery curve: for each order size m, the OBSERVED
# mean number of distinct brands per order vs the EXPECTED value
# under independent draws from the global brand mix, E[S_m] =
# sum_b (1 - (1 - p_b)^m) — observed below expected means baskets
# are brand-loyal within an order (substitutes cluster), above means
# deliberate variety-seeking; the coupon-collector lens on basket
# composition beside q_market_basket's pair lifts. Brand shares are
# exact count ratios; the (1-p)^m powers are 9-rounded decimal terms
# folded over the bounded |brands| x |size grid| cross.

DISCOVERY_SQL = """
WITH lines AS (
  SELECT l_orderkey AS ok, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), per_order AS (
  SELECT ok, COUNT(*) AS m, COUNT(DISTINCT p_brand) AS s
  FROM lines GROUP BY 1
), obs AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_distinct
  FROM per_order WHERE m <= 7 GROUP BY 1
), shares AS (
  SELECT p_brand, COUNT(*) AS c,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS t
  FROM lines GROUP BY 1
), expct AS (
  SELECT o.m,
         CAST(SUM(CAST(round(1 - pow(1 - c / CAST(t AS DOUBLE), o.m), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS e_s
  FROM shares CROSS JOIN (SELECT DISTINCT m FROM obs) o
  GROUP BY 1
)
SELECT obs.m AS order_size, obs.n_orders,
       round(obs.mean_distinct, 6) AS observed_distinct,
       round(e.e_s, 6) AS expected_distinct,
       round(obs.mean_distinct - e.e_s, 6) + 0.0 AS variety_gap
FROM obs JOIN expct e ON e.m = obs.m
ORDER BY order_size
"""


@query("q_discovery_curve", oracle=DISCOVERY_SQL)
def q_discovery_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lines = cat.lineitem.join(
        F.broadcast(cat.part.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(F.col("l_orderkey").alias("ok"), "p_brand").localCheckpoint()
    per_order = lines.groupBy("ok").agg(
        F.count(F.lit(1)).alias("m"),
        F.countDistinct("p_brand").alias("s"),
    )
    obs = (
        per_order.filter(F.col("m") <= 7)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            (F.sum("s").cast("double") / F.count(F.lit(1)))
            .alias("mean_distinct"),
        )
        .localCheckpoint()
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = (
        lines.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("p_brand", "c", F.sum("c").over(wall).cast("bigint").alias("t"))
    )
    sizes = obs.select("m").distinct()
    term = F.round(
        1 - F.pow(1 - F.col("c") / F.col("t").cast("double"), F.col("m")),
        9,
    ).cast("decimal(16,9)")
    expct = (
        shares.crossJoin(F.broadcast(sizes))
        .groupBy("m")
        .agg(F.sum(term).cast("double").alias("e_s"))
    )
    return (
        obs.join(expct, "m")
        .select(
            F.col("m").alias("order_size"),
            "n_orders",
            F.round("mean_distinct", 6).alias("observed_distinct"),
            F.round("e_s", 6).alias("expected_distinct"),
            (F.round(F.col("mean_distinct") - F.col("e_s"), 6) + 0.0)
            .alias("variety_gap"),
        )
        .orderBy("order_size")
    )


# -- txt_good_turing ---------------------------------------------------
#
# Good-Turing unseen-mass estimation per source: the frequency-of-
# frequencies table N_r gives P0 = N_1 / N (the probability the NEXT
# token is a never-seen word — the missing-mass estimate behind
# every smoothed LM, including the Kneser-Ney entry) plus the
# Turing-discounted count r* = (r+1) N_{r+1} / N_r for r = 1..3 —
# vocabulary-growth forecasting from exact integer count-of-count
# tables, the probabilistic layer above txt_chao1_richness's
# abundance estimate. Everything is exact integers until the final
# ratios.

GT_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
), wf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS r
  FROM toks GROUP BY 1, 2
), nr AS (
  SELECT source, r, CAST(COUNT(*) AS BIGINT) AS n_r
  FROM wf GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
         CAST(SUM(n_r) AS BIGINT) AS v
  FROM nr GROUP BY 1
), wide AS (
  SELECT t.source, t.n_tokens, t.v,
         MAX(CASE WHEN r = 1 THEN n_r END) AS n1,
         MAX(CASE WHEN r = 2 THEN n_r END) AS n2,
         MAX(CASE WHEN r = 3 THEN n_r END) AS n3,
         MAX(CASE WHEN r = 4 THEN n_r END) AS n4
  FROM nr JOIN tot t ON t.source = nr.source
  GROUP BY 1, 2, 3
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(v AS BIGINT) AS vocab,
       round(n1 / CAST(n_tokens AS DOUBLE), 6) AS p_unseen,
       round(2.0 * n2 / n1, 6) AS r_star_1,
       round(3.0 * n3 / n2, 6) AS r_star_2,
       round(4.0 * n4 / n3, 6) AS r_star_3
FROM wide
ORDER BY source
"""


@query("txt_good_turing", oracle=GT_SQL)
def txt_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    wf = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    nr = wf.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    ).localCheckpoint()
    tot = nr.groupBy("source").agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"),
        F.sum("n_r").cast("bigint").alias("v"),
    )
    pick = lambda rv: F.max(  # noqa: E731
        F.when(F.col("r") == rv, F.col("n_r"))
    )
    wide = (
        nr.join(tot, "source")
        .groupBy("source", "n_tokens", "v")
        .agg(
            pick(1).alias("n1"), pick(2).alias("n2"),
            pick(3).alias("n3"), pick(4).alias("n4"),
        )
    )
    return wide.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("v").cast("bigint").alias("vocab"),
        F.round(
            F.col("n1") / F.col("n_tokens").cast("double"), 6
        ).alias("p_unseen"),
        F.round(2.0 * F.col("n2") / F.col("n1"), 6).alias("r_star_1"),
        F.round(3.0 * F.col("n3") / F.col("n2"), 6).alias("r_star_2"),
        F.round(4.0 * F.col("n4") / F.col("n3"), 6).alias("r_star_3"),
    ).orderBy("source")


# -- q_zt_poisson ------------------------------------------------------
#
# Zero-truncated Poisson fit of per-customer yearly order counts (we
# only observe customers who ordered at least once): the truncated
# mean identity m = lambda / (1 - exp(-lambda)) is solved by THREE
# unrolled fixed-point steps lambda <- m * (1 - exp(-lambda))
# (6-rounded per step so both engines branch identically), giving the
# implied zero-class share exp(-lambda) and the implied TOTAL market
# size N_obs / (1 - exp(-lambda)) — the "how many customers exist
# that we never see" estimate that q_capture_recapture answers with
# two lists and this answers with one truncated count distribution.

ZTP_SQL = """
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY 1
), m AS (
  SELECT COUNT(*) AS n_obs,
         CAST(SUM(k) AS DOUBLE) / COUNT(*) AS m
  FROM k
), l1 AS (SELECT n_obs, m, round(m * (1 - exp(-m)), 6) AS l FROM m),
l2 AS (SELECT n_obs, m, round(m * (1 - exp(-l)), 6) AS l FROM l1),
l3 AS (SELECT n_obs, m, round(m * (1 - exp(-l)), 6) AS l FROM l2)
SELECT CAST(n_obs AS BIGINT) AS n_observed,
       round(m, 6) AS truncated_mean,
       l AS lambda,
       round(exp(-l), 6) AS implied_zero_share,
       round(n_obs / (1 - exp(-l)), 2) AS implied_total_market
FROM l3
"""


@query("q_zt_poisson", oracle=ZTP_SQL)
def q_zt_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    k = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    m = k.agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    mm = F.col("m")
    l1 = m.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-mm)), 6).alias("l")
    )
    l2 = l1.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-F.col("l"))), 6).alias("l")
    )
    l3 = l2.select(
        "n_obs", "m", F.round(mm * (1 - F.exp(-F.col("l"))), 6).alias("l")
    )
    lam = F.col("l")
    return l3.select(
        F.col("n_obs").cast("bigint").alias("n_observed"),
        F.round(mm, 6).alias("truncated_mean"),
        lam.alias("lambda"),
        F.round(F.exp(-lam), 6).alias("implied_zero_share"),
        F.round(F.col("n_obs") / (1 - F.exp(-lam)), 2)
        .alias("implied_total_market"),
    )


# -- q_clumpiness ------------------------------------------------------
#
# Purchase-timing clumpiness per segment (Zhang-Bradlow-Small RFMC):
# for each customer with >= 3 orders, the normalized inter-event gaps
# x_i (including the boundary gaps to the observation window edges)
# give H = 1 + sum x ln x / ln(n+1), 0 = perfectly regular, 1 = one
# burst — the C that upgrades RFM to RFMC because two customers with
# identical frequency can be steady subscribers or one-weekend
# bingers. Gaps are exact day integers normalized by the window; the
# x ln x terms are 9-rounded decimals folded per customer; segment
# rows report the mean and the clumpy (H > 0.5) share.

CLUMPY_SQL = """
WITH mx AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS w0,
                   MAX(CAST(o_orderdate AS DATE)) AS w1 FROM orders),
ev AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d
  FROM orders
), gaps AS (
  SELECT o_custkey,
         date_diff('day', COALESCE(LAG(d) OVER w, w0), d) + 1 AS g,
         COUNT(*) OVER (PARTITION BY o_custkey) AS k,
         w1, w0, d,
         ROW_NUMBER() OVER w AS rn
  FROM ev CROSS JOIN mx
  WINDOW w AS (PARTITION BY o_custkey ORDER BY d)
), withend AS (
  SELECT o_custkey, g, k FROM gaps
  UNION ALL
  SELECT o_custkey, date_diff('day', d, w1) + 1 AS g, k
  FROM gaps WHERE rn = k
), tot AS (
  SELECT o_custkey, MAX(k) AS k, CAST(SUM(g) AS BIGINT) AS tg
  FROM withend GROUP BY 1
), h AS (
  SELECT w.o_custkey, t.k,
         1 + CAST(SUM(CAST(round((w.g / CAST(t.tg AS DOUBLE))
                                 * ln(w.g / CAST(t.tg AS DOUBLE)), 9)
                           AS DECIMAL(16,9))) AS DOUBLE)
             / ln(t.k + 1.0) AS hc
  FROM withend w JOIN tot t ON t.o_custkey = w.o_custkey
  WHERE t.k >= 3
  GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment AS segment, h.hc
  FROM h JOIN customer ON c_custkey = o_custkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(CAST(round(hc, 9) AS DECIMAL(14,9))) AS DOUBLE)
             / COUNT(*), 6) AS mean_clumpiness,
       round(SUM(CASE WHEN hc > 0.5 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS clumpy_share
FROM seg
GROUP BY segment
ORDER BY segment
"""


@query("q_clumpiness", oracle=CLUMPY_SQL)
def q_clumpiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("w0"),
        F.max(F.col("o_orderdate").cast("date")).alias("w1"),
    )
    ev = cat.orders.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    wp = Window.partitionBy("o_custkey")
    gaps = ev.join(F.broadcast(mx)).select(
        "o_custkey",
        (
            F.datediff(
                F.col("d"), F.coalesce(F.lag("d").over(w), F.col("w0"))
            )
            + 1
        ).alias("g"),
        F.count(F.lit(1)).over(wp).alias("k"),
        "w1", "d",
        F.row_number().over(w).alias("rn"),
    ).localCheckpoint()
    withend = gaps.select("o_custkey", "g", "k").union(
        gaps.filter(F.col("rn") == F.col("k")).select(
            "o_custkey",
            (F.datediff("w1", "d") + 1).alias("g"),
            "k",
        )
    )
    tot = withend.groupBy("o_custkey").agg(
        F.max("k").alias("k"), F.sum("g").cast("bigint").alias("tg")
    )
    j = withend.select(F.col("o_custkey").alias("ck"), "g").join(
        tot.filter(F.col("k") >= 3), F.col("ck") == F.col("o_custkey")
    )
    x = F.col("g") / F.col("tg").cast("double")
    term = F.round(x * F.log(x), 9).cast("decimal(16,9)")
    h = j.groupBy("o_custkey", "k").agg(
        (
            1
            + F.sum(term).cast("double") / F.log(F.col("k") + 1.0)
        ).alias("hc")
    )
    seg = h.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), "hc")
    n = F.count(F.lit(1))
    return (
        seg.groupBy("segment")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.round("hc", 9).cast("decimal(14,9)")).cast("double")
                / n,
                6,
            ).alias("mean_clumpiness"),
            F.round(
                F.sum(F.when(F.col("hc") > 0.5, 1).otherwise(0))
                / n.cast("double"),
                6,
            ).alias("clumpy_share"),
        )
        .orderBy("segment")
    )


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


# -- txt_yule_k --------------------------------------------------------
#
# Yule's K vocabulary-richness characteristic per source: K =
# 1e4 * (sum r^2 N_r - N) / N^2 over the count-of-counts table —
# length-invariant repetitiveness (high K = a few words dominate),
# the classical stylometry constant beside txt_burrows_delta's
# distance and txt_good_turing's unseen mass, computed from the SAME
# exact frequency-of-frequencies integers. Also reports Simpson's D
# for words (K/1e4 asymptotically) as the cross-check column.

YULE_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
), wf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS r
  FROM toks GROUP BY 1, 2
), nr AS (
  SELECT source, r, CAST(COUNT(*) AS BIGINT) AS n_r
  FROM wf GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(SUM(r * n_r) AS BIGINT) AS n,
         CAST(SUM(r * r * n_r) AS BIGINT) AS s2
  FROM nr GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_tokens,
       round(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n), 6) AS yule_k,
       round((s2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 9) AS simpson_d
FROM agg
ORDER BY source
"""


@query("txt_yule_k", oracle=YULE_SQL)
def txt_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    wf = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    nr = wf.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    agg = nr.groupBy("source").agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n"),
        F.sum(F.col("r") * F.col("r") * F.col("n_r")).cast("bigint")
        .alias("s2"),
    )
    n, s2 = F.col("n"), F.col("s2")
    return agg.select(
        "source",
        n.cast("bigint").alias("n_tokens"),
        F.round(10000.0 * (s2 - n) / (n.cast("double") * n), 6)
        .alias("yule_k"),
        F.round((s2 - n) / (n.cast("double") * (n - 1)), 9)
        .alias("simpson_d"),
    ).orderBy("source")


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


# -- txt_char_entropy --------------------------------------------------
#
# Character-level entropy profile per source: unigram entropy H1,
# bigram entropy H2, the conditional entropy H(c2|c1) = H2 - H1 (the
# compressibility proxy — gzip-ratio without gzip), and redundancy
# 1 - H1/log2|alphabet| — encoding/quality fingerprints that word-
# level measures (txt_word_entropy) cannot see because they tokenize
# first. All probabilities are exact character/bigram count ratios;
# p log2 p terms are 9-rounded decimal folds.

CHAR_ENT_SQL = """
WITH uni0 AS (
  SELECT source, substr(text, i, 1) AS c1
  FROM documents, UNNEST(generate_series(1, len(text))) AS t(i)
), bi0 AS (
  SELECT source, substr(text, i, 2) AS bg
  FROM documents, UNNEST(generate_series(1, len(text) - 1)) AS t(i)
), uni AS (
  SELECT source, c1, CAST(COUNT(*) AS BIGINT) AS c FROM uni0 GROUP BY 1, 2
), utot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS alpha
  FROM uni GROUP BY 1
), h1 AS (
  SELECT u.source,
         CAST(SUM(CAST(round(-(c / CAST(n AS DOUBLE))
                             * log2(c / CAST(n AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS h1,
         MAX(alpha) AS alpha
  FROM uni u JOIN utot ON utot.source = u.source
  GROUP BY 1
), bi AS (
  SELECT source, bg, CAST(COUNT(*) AS BIGINT) AS c FROM bi0 GROUP BY 1, 2
), btot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM bi GROUP BY 1
), h2 AS (
  SELECT b.source,
         CAST(SUM(CAST(round(-(c / CAST(n AS DOUBLE))
                             * log2(c / CAST(n AS DOUBLE)), 9)
                       AS DECIMAL(16,9))) AS DOUBLE) AS h2
  FROM bi b JOIN btot ON btot.source = b.source
  GROUP BY 1
)
SELECT h1.source,
       round(h1.h1, 6) AS h1_bits,
       round(h2.h2 - h1.h1, 6) AS cond_entropy_bits,
       round(1 - h1.h1 / log2(CAST(h1.alpha AS DOUBLE)), 6)
         AS redundancy
FROM h1 JOIN h2 ON h2.source = h1.source
ORDER BY h1.source
"""


@query("txt_char_entropy", oracle=CHAR_ENT_SQL)
def txt_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    uni0 = d.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> substring(text, i, 1))"
            )
        ).alias("c1"),
    )
    bi0 = d.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    uni = uni0.groupBy("source", "c1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    utot = uni.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("alpha"),
    )
    ent_term = lambda n: F.round(  # noqa: E731
        -(F.col("c") / n.cast("double"))
        * F.log2(F.col("c") / n.cast("double")),
        9,
    ).cast("decimal(16,9)")
    h1 = (
        uni.join(utot, "source")
        .groupBy("source")
        .agg(
            F.sum(ent_term(F.col("n"))).cast("double").alias("h1"),
            F.max("alpha").alias("alpha"),
        )
    )
    bi = bi0.groupBy("source", "bg").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    btot = bi.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    h2 = (
        bi.join(btot, "source")
        .groupBy("source")
        .agg(F.sum(ent_term(F.col("n"))).cast("double").alias("h2"))
    )
    return (
        h1.join(h2, "source")
        .select(
            "source",
            F.round("h1", 6).alias("h1_bits"),
            F.round(F.col("h2") - F.col("h1"), 6)
            .alias("cond_entropy_bits"),
            F.round(
                1 - F.col("h1") / F.log2(F.col("alpha").cast("double")), 6
            ).alias("redundancy"),
        )
        .orderBy("source")
    )


# -- q_gibrat_law ------------------------------------------------------
#
# Gibrat's law test on brand monthly revenue: regress log growth
# ln(rev_{t+1}/rev_t) on log size ln(rev_t) across all brand-months;
# slope = 0 means growth is independent of size (Gibrat holds, and
# the size distribution drifts lognormal), slope < 0 means mean
# reversion (small brands catch up) — the firm-dynamics law behind
# q_lognormal_fit's distributional finding. Log pairs are 9-rounded
# decimals; the OLS is the house exact-moment chain with the t-stat
# for the slope against zero.

GIBRAT_SQL = """
WITH m AS (
  SELECT p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), pairs AS (
  SELECT CAST(round(ln(CAST(rev AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(LEAD(rev) OVER w AS DOUBLE)
                       / CAST(rev AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM m WINDOW w AS (PARTITION BY p_brand ORDER BY mon)
), clean AS (SELECT x, y FROM pairs WHERE y IS NOT NULL),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM clean
), f AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         ((n * syy - sy * sy)
          - ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / (n * sxx - sx * sx)) / (n * (n - 2)) AS mse_over_n,
         (n * sxx - sx * sx) / n AS ssx
  FROM mom
)
SELECT CAST(n AS BIGINT) AS n_brand_months,
       round(b, 6) AS gibrat_slope,
       round(b / sqrt(mse_over_n * n / ssx / n), 6) AS t_stat,
       CAST(CASE WHEN abs(b / sqrt(mse_over_n * n / ssx / n)) < 1.96
            THEN 1 ELSE 0 END AS BIGINT) AS gibrat_holds
FROM f
"""


@query("q_gibrat_law", oracle=GIBRAT_SQL)
def q_gibrat_law(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(28,2)").alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy("mon")
    pairs = m.select(
        F.round(F.log(F.col("rev").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(
            F.log(
                F.lead("rev").over(w).cast("double")
                / F.col("rev").cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("y"),
    )
    clean = pairs.filter(F.col("y").isNotNull())
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(28,9)")
    ).cast("double")
    mom = clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
        r9(yd * yd).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mse_over_n = (
        (n * syy - sy * sy)
        - ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (n * sxx - sx * sx)
    ) / (n * (n - 2))
    ssx = (n * sxx - sx * sx) / n
    t = b / F.sqrt(mse_over_n * n / ssx / n)
    return mom.select(
        n.cast("bigint").alias("n_brand_months"),
        F.round(b, 6).alias("gibrat_slope"),
        F.round(t, 6).alias("t_stat"),
        F.when(F.abs(t) < 1.96, 1).otherwise(0).cast("bigint")
        .alias("gibrat_holds"),
    )


# -- q_engel_curve -----------------------------------------------------
#
# Working-Leser Engel curve: each customer's budget SHARE on the
# "basics" brand family (Brand#1x) regressed on ln(total spend) —
# slope < 0 marks basics as a necessity (its share falls as budgets
# grow), > 0 a luxury; the Engel coefficient framing of spending
# composition beside q_elasticity's price response. Shares and log
# totals are 9-rounded decimals from exact per-customer folds; the
# OLS is the shared moment chain.

ENGEL_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS total,
         CAST(SUM(CASE WHEN p_brand LIKE 'Brand#1%'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(28,2)) AS basics
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  GROUP BY 1
), xy AS (
  SELECT CAST(round(ln(CAST(total AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(CAST(basics AS DOUBLE) / CAST(total AS DOUBLE), 9)
              AS DECIMAL(12,9)) AS y
  FROM cust WHERE total > 0
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(sy / n, 6) AS mean_basics_share,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS engel_slope,
       CAST(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) < 0
            THEN 1 ELSE 0 END AS BIGINT) AS necessity
FROM mom
"""


@query("q_engel_curve", oracle=ENGEL_SQL)
def q_engel_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    zero = F.lit(0).cast("decimal(18,2)")
    cust = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(dec("l_extendedprice")).cast("decimal(28,2)")
            .alias("total"),
            F.sum(
                F.when(
                    F.col("p_brand").startswith("Brand#1"),
                    dec("l_extendedprice"),
                ).otherwise(zero)
            )
            .cast("decimal(28,2)")
            .alias("basics"),
        )
    )
    xy = cust.filter(F.col("total") > 0).select(
        F.round(F.log(F.col("total").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(
            F.col("basics").cast("double") / F.col("total").cast("double"),
            9,
        )
        .cast("decimal(12,9)")
        .alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(28,9)")
    ).cast("double")
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
    )
    n = F.col("n")
    b = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        n.cast("bigint").alias("n_customers"),
        F.round(F.col("sy") / n, 6).alias("mean_basics_share"),
        F.round(b, 6).alias("engel_slope"),
        F.when(b < 0, 1).otherwise(0).cast("bigint").alias("necessity"),
    )


# -- q_range_partition_planner -----------------------------------------
#
# Range-partitioning plan for the order stream keyed by o_custkey:
# 16 equal-depth boundaries from EXACT rank selection (the
# repartitionByRange boundary table a writer would feed Spark),
# realized bucket row counts, and the max/mean skew ratio that says
# whether range partitioning beats hash for this key — the planner
# output beside q_output_file_planner's size plan and q_skew_report's
# diagnosis. Boundaries and counts are exact integers end to end.

RANGEPLAN_SQL = """
WITH r AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
), b2 AS (
  SELECT CAST(FLOOR(16.0 * (rn - 1) / n) AS BIGINT) AS bucket,
         o_custkey
  FROM r
), agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rows_,
         CAST(MIN(o_custkey) AS BIGINT) AS key_lo,
         CAST(MAX(o_custkey) AS BIGINT) AS key_hi
  FROM b2 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(rows_) AS BIGINT) AS n,
         CAST(MAX(rows_) AS BIGINT) AS mx
  FROM agg
)
SELECT CAST(bucket AS BIGINT) AS bucket, rows_, key_lo, key_hi,
       round(rows_ / (CAST(n AS DOUBLE) / 16), 6) AS depth_ratio,
       round(mx / (CAST(n AS DOUBLE) / 16), 6) AS max_skew
FROM agg CROSS JOIN tot
ORDER BY bucket
"""


@query("q_range_partition_planner", oracle=RANGEPLAN_SQL)
def q_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = o.select(
        "o_custkey",
        F.row_number()
        .over(Window.orderBy("o_custkey", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    b2 = r.select(
        F.floor(16.0 * (F.col("rn") - 1) / F.col("n"))
        .cast("bigint")
        .alias("bucket"),
        "o_custkey",
    )
    agg = b2.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_"),
        F.min("o_custkey").cast("bigint").alias("key_lo"),
        F.max("o_custkey").cast("bigint").alias("key_hi"),
    )
    tot = agg.agg(
        F.sum("rows_").cast("bigint").alias("n"),
        F.max("rows_").cast("bigint").alias("mx"),
    )
    return (
        agg.join(F.broadcast(tot))
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "rows_", "key_lo", "key_hi",
            F.round(
                F.col("rows_") / (F.col("n").cast("double") / 16), 6
            ).alias("depth_ratio"),
            F.round(
                F.col("mx") / (F.col("n").cast("double") / 16), 6
            ).alias("max_skew"),
        )
        .orderBy("bucket")
    )


# -- q_selectivity_audit -----------------------------------------------
#
# Optimizer-statistics quality audit: a 10-bucket equi-width
# histogram on o_totalprice (the stats an optimizer keeps) estimates
# the selectivity of "totalprice > threshold" predicates under the
# uniform-within-bucket assumption, and the table reports estimated
# vs ACTUAL selectivity with the relative error per threshold — the
# measurement of when histogram stats mislead join/scan planning
# (the numbers behind q_join_size_estimate's estimates). Bucket
# boundaries and counts are exact; the interpolation is one double
# chain per threshold.

SELAUDIT_SQL = """
WITH mm AS (
  SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
         COUNT(*) AS n
  FROM orders
), hist AS (
  SELECT LEAST(CAST(FLOOR(10 * (CAST(o_totalprice AS DOUBLE) - lo)
                          / (hi - lo)) AS BIGINT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders CROSS JOIN mm
  GROUP BY 1
), th AS (
  SELECT lo + (hi - lo) * frac AS t, frac, lo, hi, n
  FROM mm CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75, 0.9]) AS frac)
), est AS (
  SELECT th.t, th.frac, th.n,
         CAST(SUM(CASE
           WHEN h.b > LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9)
           THEN CAST(h.c AS DECIMAL(24,4))
           WHEN h.b = LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9)
           THEN CAST(round(h.c * (1 - (10 * th.frac
                     - LEAST(CAST(FLOOR(10 * th.frac) AS BIGINT), 9))),
                     4) AS DECIMAL(24,4))
           ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) AS est_rows
  FROM th JOIN hist h ON TRUE
  GROUP BY 1, 2, 3
), act AS (
  SELECT th.t,
         CAST(SUM(CASE WHEN CAST(o_totalprice AS DOUBLE) > th.t
                       THEN 1 ELSE 0 END) AS BIGINT) AS act_rows
  FROM orders CROSS JOIN th GROUP BY 1
)
SELECT round(e.frac, 2) AS threshold_frac,
       round(e.t, 2) AS threshold_value,
       round(e.est_rows / e.n, 6) AS est_selectivity,
       round(a.act_rows / CAST(e.n AS DOUBLE), 6) AS actual_selectivity,
       round(e.est_rows / e.n - a.act_rows / CAST(e.n AS DOUBLE), 6)
         + 0.0 AS estimation_error
FROM est e JOIN act a ON a.t = e.t
ORDER BY threshold_frac
"""


@query("q_selectivity_audit", oracle=SELAUDIT_SQL)
def q_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    mm = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    hist = (
        o.join(F.broadcast(mm))
        .select(
            F.least(
                F.floor(
                    10
                    * (F.col("o_totalprice").cast("double") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                ).cast("bigint"),
                F.lit(9).cast("bigint"),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    fracs = o.sparkSession.createDataFrame(
        [(0.25,), (0.5,), (0.75,), (0.9,)], ["frac"]
    )
    th = mm.crossJoin(F.broadcast(fracs)).select(
        (F.col("lo") + (F.col("hi") - F.col("lo")) * F.col("frac"))
        .alias("t"),
        "frac", "lo", "hi", "n",
    ).localCheckpoint()
    bcut = F.least(
        F.floor(10 * F.col("frac")).cast("bigint"),
        F.lit(9).cast("bigint"),
    )
    est = (
        th.crossJoin(F.broadcast(hist))
        .groupBy("t", "frac", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("b") > bcut, F.col("c").cast("decimal(24,4)")
                )
                .when(
                    F.col("b") == bcut,
                    F.round(
                        F.col("c") * (1 - (10 * F.col("frac") - bcut)), 4
                    ).cast("decimal(24,4)"),
                )
                .otherwise(F.lit(0).cast("decimal(24,4)"))
            )
            .cast("double")
            .alias("est_rows")
        )
    )
    act = (
        o.crossJoin(F.broadcast(th.select("t")))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(
                    F.col("o_totalprice").cast("double") > F.col("t"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("act_rows")
        )
    )
    return (
        est.join(act, "t")
        .select(
            F.round("frac", 2).alias("threshold_frac"),
            F.round("t", 2).alias("threshold_value"),
            F.round(F.col("est_rows") / F.col("n"), 6)
            .alias("est_selectivity"),
            F.round(F.col("act_rows") / F.col("n").cast("double"), 6)
            .alias("actual_selectivity"),
            (
                F.round(
                    F.col("est_rows") / F.col("n")
                    - F.col("act_rows") / F.col("n").cast("double"),
                    6,
                )
                + 0.0
            ).alias("estimation_error"),
        )
        .orderBy("threshold_frac")
    )


# -- q_western_electric ------------------------------------------------
#
# Western Electric run rules over the daily-revenue individuals
# chart: rule 1 (one point beyond 3 sigma), rule 2 (2 of 3
# consecutive beyond 2 sigma, same side), rule 3 (4 of 5 beyond
# 1 sigma, same side), rule 4 (8 consecutive on one side of center)
# — the pattern tests that catch drifts and cycles q_xmr_chart's
# single-point limits miss. Center/sigma come from the exact moment
# folds; per-day z-scores are 6-rounded so the rule windows (ROWS
# frames of side/zone flags) branch identically on both engines.
# Output: the flagged days with which rules fired.

WE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS n, CAST(SUM(rev) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE),
                             2) AS DECIMAL(38,2))) AS DOUBLE) AS s2
  FROM daily
), z AS (
  SELECT day,
         round((CAST(rev AS DOUBLE) - s1 / n)
               / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
  FROM daily CROSS JOIN mom
), flags AS (
  SELECT day, z,
         CASE WHEN z > 0 THEN 1 ELSE -1 END AS side,
         CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END AS beyond3,
         CASE WHEN z > 2 THEN 1 WHEN z < -2 THEN -1 ELSE 0 END AS b2,
         CASE WHEN z > 1 THEN 1 WHEN z < -1 THEN -1 ELSE 0 END AS b1
  FROM z
), rules AS (
  SELECT day, z,
         beyond3 AS rule1,
         CASE WHEN SUM(CASE WHEN b2 = 1 THEN 1 ELSE 0 END)
                OVER w3 >= 2
               OR SUM(CASE WHEN b2 = -1 THEN 1 ELSE 0 END)
                OVER w3 >= 2 THEN 1 ELSE 0 END AS rule2,
         CASE WHEN SUM(CASE WHEN b1 = 1 THEN 1 ELSE 0 END)
                OVER w5 >= 4
               OR SUM(CASE WHEN b1 = -1 THEN 1 ELSE 0 END)
                OVER w5 >= 4 THEN 1 ELSE 0 END AS rule3,
         CASE WHEN ABS(SUM(side) OVER w8) = 8 THEN 1 ELSE 0 END AS rule4
  FROM flags
  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT strftime(day, '%Y-%m-%d') AS day, z,
       CAST(rule1 AS BIGINT) AS rule1,
       CAST(rule2 AS BIGINT) AS rule2,
       CAST(rule3 AS BIGINT) AS rule3,
       CAST(rule4 AS BIGINT) AS rule4
FROM rules
WHERE rule1 + rule2 + rule3 + rule4 > 0
ORDER BY day
"""


@query("q_western_electric", oracle=WE_SQL)
def q_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = cat.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
    revd = F.col("rev").cast("double")
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("double").alias("s1"),
        F.sum(F.round(revd * revd, 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n")
    zc = F.round(
        (revd - F.col("s1") / n)
        / F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
        ),
        6,
    )
    z = daily.join(F.broadcast(mom)).select("day", zc.alias("z"))
    zz = F.col("z")
    flags = z.select(
        "day", "z",
        F.when(zz > 0, 1).otherwise(-1).alias("side"),
        F.when(F.abs(zz) > 3, 1).otherwise(0).alias("beyond3"),
        F.when(zz > 2, 1).when(zz < -2, -1).otherwise(0).alias("b2"),
        F.when(zz > 1, 1).when(zz < -1, -1).otherwise(0).alias("b1"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    cnt = lambda col, v, w: F.sum(  # noqa: E731
        F.when(F.col(col) == v, 1).otherwise(0)
    ).over(w)
    rules = flags.select(
        "day", "z",
        F.col("beyond3").alias("rule1"),
        F.when(
            (cnt("b2", 1, w3) >= 2) | (cnt("b2", -1, w3) >= 2), 1
        ).otherwise(0).alias("rule2"),
        F.when(
            (cnt("b1", 1, w5) >= 4) | (cnt("b1", -1, w5) >= 4), 1
        ).otherwise(0).alias("rule3"),
        F.when(F.abs(F.sum("side").over(w8)) == 8, 1)
        .otherwise(0)
        .alias("rule4"),
    )
    r = [F.col(f"rule{i}") for i in range(1, 5)]
    return (
        rules.filter(sum(r[1:], r[0]) > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "z",
            *[rc.cast("bigint").alias(f"rule{i + 1}") for i, rc in enumerate(r)],
        )
        .orderBy("day")
    )


# -- q_segmented_regression --------------------------------------------
#
# Broken-stick (segmented) regression of daily revenue on time with
# an UNKNOWN knot: every 64th day is a candidate breakpoint, and ONE
# prefix-sum pass (cumulative n, sum x, sum y, sum xy, sum x2, sum y2
# by day index) prices each candidate's two-segment SSE in O(1) from
# prefix differences — the Muggeo-style knot search without
# re-scanning, where q_chow_test assumes the break is KNOWN. The
# winning knot minimizes 6-rounded total SSE (ties to the earliest
# knot); output reports the knot date, both slopes, and the
# SSE improvement over the single-line fit.

SEGREG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS rev,
         ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE)) AS i
  FROM orders GROUP BY 1
), pre AS (
  SELECT day, i,
         CAST(SUM(i) OVER w AS DOUBLE) AS sx,
         CAST(SUM(rev) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(i AS BIGINT) * i) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(i * CAST(rev AS DOUBLE), 2)
                       AS DECIMAL(38,2))) OVER w AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE),
                             2) AS DECIMAL(38,2))) OVER w AS DOUBLE)
           AS syy,
         COUNT(*) OVER () AS n
  FROM daily
  WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), tot AS (
  SELECT n, sx AS tx, sy AS ty, sxx AS txx, sxy AS txy, syy AS tyy,
         day AS last_day
  FROM pre WHERE i = n
), cand AS (
  SELECT p.day AS knot_day, p.i AS k,
         p.sx, p.sy, p.sxx, p.sxy, p.syy,
         t.n, t.tx, t.ty, t.txx, t.txy, t.tyy
  FROM pre p CROSS JOIN tot t
  WHERE p.i % 64 = 0 AND p.i >= 64 AND p.i <= t.n - 64
), sse AS (
  SELECT knot_day, k, n,
         round(
           (syy - sy * sy / k
            - pow(sxy - sx * sy / k, 2) / (sxx - sx * sx / k))
           + ((tyy - syy) - (ty - sy) * (ty - sy) / (n - k)
              - pow((txy - sxy) - (tx - sx) * (ty - sy) / (n - k), 2)
                / ((txx - sxx) - (tx - sx) * (tx - sx) / (n - k))), 6)
           AS sse2,
         (sxy - sx * sy / k) / (sxx - sx * sx / k) AS b_left,
         ((txy - sxy) - (tx - sx) * (ty - sy) / (n - k))
           / ((txx - sxx) - (tx - sx) * (tx - sx) / (n - k)) AS b_right,
         tyy - ty * ty / n - pow(txy - tx * ty / n, 2)
           / (txx - tx * tx / n) AS sse1
  FROM cand
), best AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sse2, knot_day) AS rk
  FROM sse
)
SELECT strftime(knot_day, '%Y-%m-%d') AS knot_day,
       CAST(k AS BIGINT) AS knot_index,
       round(b_left, 4) AS slope_before,
       round(b_right, 4) AS slope_after,
       round(1 - sse2 / sse1, 6) AS sse_improvement
FROM best WHERE rk = 1
"""


@query("q_segmented_regression", oracle=SEGREG_SQL)
def q_segmented_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(24,2)").alias("rev"))
        .select(
            "day", "rev",
            F.row_number().over(Window.orderBy("day")).alias("i"),
        )
    )
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy().orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    i = F.col("i")
    revd = F.col("rev").cast("double")
    pre = daily.select(
        "day", "i",
        F.sum(i).over(w).cast("double").alias("sx"),
        F.sum("rev").over(w).cast("double").alias("sy"),
        F.sum(i.cast("bigint") * i).over(w).cast("double").alias("sxx"),
        F.sum(F.round(i * revd, 2).cast("decimal(38,2)"))
        .over(w)
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(revd * revd, 2).cast("decimal(38,2)"))
        .over(w)
        .cast("double")
        .alias("syy"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).localCheckpoint()
    tot = pre.filter(i == F.col("n")).select(
        F.col("sx").alias("tx"), F.col("sy").alias("ty"),
        F.col("sxx").alias("txx"), F.col("sxy").alias("txy"),
        F.col("syy").alias("tyy"), F.col("n").alias("nn"),
    )
    cand = (
        pre.join(F.broadcast(tot))
        .filter(
            (i % 64 == 0) & (i >= 64) & (i <= F.col("nn") - 64)
        )
        .select(
            F.col("day").alias("knot_day"), i.alias("k"),
            "sx", "sy", "sxx", "sxy", "syy",
            F.col("nn").alias("n"), "tx", "ty", "txx", "txy", "tyy",
        )
    )
    k, n = F.col("k"), F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    tx, ty = F.col("tx"), F.col("ty")
    txx, txy, tyy = F.col("txx"), F.col("txy"), F.col("tyy")
    sse_l = syy - sy * sy / k - F.pow(sxy - sx * sy / k, 2) / (
        sxx - sx * sx / k
    )
    rx2 = (txx - sxx) - (tx - sx) * (tx - sx) / (n - k)
    rxy = (txy - sxy) - (tx - sx) * (ty - sy) / (n - k)
    sse_r = (tyy - syy) - (ty - sy) * (ty - sy) / (n - k) - F.pow(
        rxy, 2
    ) / rx2
    b_left = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    b_right = rxy / rx2
    sse1 = tyy - ty * ty / n - F.pow(txy - tx * ty / n, 2) / (
        txx - tx * tx / n
    )
    sse = cand.select(
        "knot_day", "k", "n",
        F.round(sse_l + sse_r, 6).alias("sse2"),
        b_left.alias("b_left"),
        b_right.alias("b_right"),
        sse1.alias("sse1"),
    )
    best = sse.select(
        "*",
        F.row_number()
        .over(Window.orderBy("sse2", "knot_day"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.date_format("knot_day", "yyyy-MM-dd").alias("knot_day"),
        F.col("k").cast("bigint").alias("knot_index"),
        F.round("b_left", 4).alias("slope_before"),
        F.round("b_right", 4).alias("slope_after"),
        F.round(1 - F.col("sse2") / F.col("sse1"), 6)
        .alias("sse_improvement"),
    )


# -- txt_fishers_alpha -------------------------------------------------
#
# Fisher's alpha per source — THE classical diversity index, the
# log-series parameter solving S = alpha * ln(1 + N/alpha) for
# tokens N and vocabulary S, found by three UNROLLED fixed-point
# steps alpha <- S / ln(1 + N/alpha) from the alpha = S seed
# (6-rounded per step, both engines branch identically) — sample-
# size-robust where raw type-token ratios (txt_segment_ttr) shrink
# with length, and the abundance-model sibling of txt_chao1_richness
# and txt_good_turing. Counts exact; three double steps.

FISHER_ALPHA_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS s
  FROM toks GROUP BY 1
), a0 AS (
  SELECT source, n, s, round(s / ln(1 + n / CAST(s AS DOUBLE)), 6) AS a
  FROM agg
), a1 AS (
  SELECT source, n, s, round(s / ln(1 + n / a), 6) AS a FROM a0
), a2 AS (
  SELECT source, n, s, round(s / ln(1 + n / a), 6) AS a FROM a1
)
SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(s AS BIGINT) AS vocab,
       a AS fishers_alpha,
       round(s / ln(1 + n / a) - a, 6) AS convergence_gap
FROM a2
ORDER BY source
"""


@query("txt_fishers_alpha", oracle=FISHER_ALPHA_SQL)
def txt_fishers_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    agg = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("w").cast("bigint").alias("s"),
    )
    n, s = F.col("n"), F.col("s")
    step = lambda prev: F.round(  # noqa: E731
        s / F.log(1 + n / prev), 6
    )
    a0 = agg.select(
        "source", "n", "s", step(s.cast("double")).alias("a")
    )
    a1 = a0.select("source", "n", "s", step(F.col("a")).alias("a"))
    a2 = a1.select("source", "n", "s", step(F.col("a")).alias("a"))
    return a2.select(
        "source",
        n.cast("bigint").alias("n_tokens"),
        s.cast("bigint").alias("vocab"),
        F.col("a").alias("fishers_alpha"),
        F.round(s / F.log(1 + n / F.col("a")) - F.col("a"), 6)
        .alias("convergence_gap"),
    ).orderBy("source")


# -- q_superstar_share -------------------------------------------------
#
# Superstar concentration trend: the revenue share of the top 1% of
# customers per YEAR (exact rank cutoff ceil(n/100), ties by
# custkey), with the Theil-Sen-style median of pairwise year-slope
# replaced by the simple OLS trend over the few yearly points —
# rising share = winner-take-most dynamics, the TIME dimension that
# q_gini and q_hoover_index report statically. Yearly spends are
# exact decimal folds; shares and the trend are one double chain.

SUPERSTAR_SQL = """
WITH yearly AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) AS yr,
         o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT yr, s,
         ROW_NUMBER() OVER (PARTITION BY yr ORDER BY s DESC, o_custkey)
           AS rn,
         COUNT(*) OVER (PARTITION BY yr) AS n
  FROM yearly
), shares AS (
  SELECT yr,
         CAST(SUM(CASE WHEN rn <= CAST(ceil(n / 100.0) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(28,2)) END)
              AS DOUBLE)
           / CAST(SUM(s) AS DOUBLE) AS top1_share,
         CAST(MAX(n) AS BIGINT) AS n_customers
  FROM ranked GROUP BY 1
), mom AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(yr) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(top1_share, 9) AS DECIMAL(12,9)))
              AS DOUBLE) AS sy,
         CAST(SUM(CAST(yr AS BIGINT) * yr) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(yr * top1_share, 6) AS DECIMAL(20,6)))
              AS DOUBLE) AS sxy
  FROM shares
)
SELECT s.yr AS year, s.n_customers,
       round(s.top1_share, 6) AS top1_share,
       round((m.k * m.sxy - m.sx * m.sy)
             / (m.k * m.sxx - m.sx * m.sx), 6) AS share_trend_per_year
FROM shares s CROSS JOIN mom m
ORDER BY year
"""


@query("q_superstar_share", oracle=SUPERSTAR_SQL)
def q_superstar_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    yearly = cat.orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        "o_custkey",
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("s"))
    wy = Window.partitionBy("yr")
    ranked = yearly.select(
        "yr", "s",
        F.row_number()
        .over(wy.orderBy(F.col("s").desc(), "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wy).alias("n"),
    )
    zero = F.lit(0).cast("decimal(28,2)")
    shares = ranked.groupBy("yr").agg(
        (
            F.sum(
                F.when(
                    F.col("rn")
                    <= F.ceil(F.col("n") / 100.0).cast("bigint"),
                    F.col("s"),
                ).otherwise(zero)
            ).cast("double")
            / F.sum("s").cast("double")
        ).alias("top1_share"),
        F.max("n").cast("bigint").alias("n_customers"),
    ).localCheckpoint()
    yr, sh = F.col("yr"), F.col("top1_share")
    mom = shares.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(yr).cast("double").alias("sx"),
        F.sum(F.round(sh, 9).cast("decimal(12,9)")).cast("double")
        .alias("sy"),
        F.sum(yr.cast("bigint") * yr).cast("double").alias("sxx"),
        F.sum(F.round(yr * sh, 6).cast("decimal(20,6)")).cast("double")
        .alias("sxy"),
    )
    k = F.col("k")
    trend = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        shares.join(F.broadcast(mom))
        .select(
            yr.alias("year"),
            "n_customers",
            F.round(sh, 6).alias("top1_share"),
            F.round(trend, 6).alias("share_trend_per_year"),
        )
        .orderBy("year")
    )


# -- q_ndr -------------------------------------------------------------
#
# Net and gross dollar retention per year-pair: of the customers who
# spent in year t, how much of that revenue base returns in t+1
# (GRR caps each customer at last year's level — pure shrinkage;
# NDR lets expansion offset churn), with the expanded / contracted /
# churned customer split — the SaaS revenue-quality metrics that
# q_growth_accounting's new/resurrected/churned counts price in
# dollars. Per-customer yearly spends are exact decimal folds;
# min() caps stay in decimal; the two ratios are the only doubles.

NDR_SQL = """
WITH yearly AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) AS yr,
         o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s
  FROM orders GROUP BY 1, 2
), pair AS (
  SELECT a.yr AS base_year, a.o_custkey, a.s AS s0,
         COALESCE(b.s, CAST(0 AS DECIMAL(28,2))) AS s1
  FROM yearly a
  LEFT JOIN yearly b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
  WHERE a.yr < (SELECT MAX(yr) FROM yearly)
), agg AS (
  SELECT base_year,
         CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(SUM(s0) AS DOUBLE) AS base_rev,
         CAST(SUM(s1) AS DOUBLE) AS next_rev,
         CAST(SUM(CASE WHEN s1 < s0 THEN s1 ELSE s0 END) AS DOUBLE)
           AS capped_rev,
         CAST(SUM(CASE WHEN s1 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS churned,
         CAST(SUM(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS BIGINT)
           AS expanded,
         CAST(SUM(CASE WHEN s1 > 0 AND s1 < s0 THEN 1 ELSE 0 END)
              AS BIGINT) AS contracted
  FROM pair GROUP BY 1
)
SELECT base_year, n_base, churned, expanded, contracted,
       round(capped_rev / base_rev, 6) AS grr,
       round(next_rev / base_rev, 6) AS ndr
FROM agg
ORDER BY base_year
"""


@query("q_ndr", oracle=NDR_SQL)
def q_ndr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    yearly = cat.orders.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        "o_custkey",
    ).agg(
        F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("s")
    ).localCheckpoint()
    mx = yearly.agg(F.max("yr").alias("mxyr"))
    a = yearly.select(
        F.col("yr").alias("base_year"),
        F.col("o_custkey").alias("ck"),
        F.col("s").alias("s0"),
    )
    b = yearly.select(
        F.col("yr").alias("nyr"),
        F.col("o_custkey").alias("ck2"),
        F.col("s").alias("s1"),
    )
    zero = F.lit(0).cast("decimal(28,2)")
    pair = (
        a.join(F.broadcast(mx))
        .filter(F.col("base_year") < F.col("mxyr"))
        .join(
            b,
            (F.col("ck2") == F.col("ck"))
            & (F.col("nyr") == F.col("base_year") + 1),
            "left",
        )
        .select(
            "base_year", "s0", F.coalesce("s1", zero).alias("s1")
        )
    )
    s0, s1 = F.col("s0"), F.col("s1")
    agg = pair.groupBy("base_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        F.sum(s0).cast("double").alias("base_rev"),
        F.sum(s1).cast("double").alias("next_rev"),
        F.sum(F.when(s1 < s0, s1).otherwise(s0)).cast("double")
        .alias("capped_rev"),
        F.sum(F.when(s1 == zero, 1).otherwise(0)).cast("bigint")
        .alias("churned"),
        F.sum(F.when(s1 > s0, 1).otherwise(0)).cast("bigint")
        .alias("expanded"),
        F.sum(F.when((s1 > zero) & (s1 < s0), 1).otherwise(0))
        .cast("bigint")
        .alias("contracted"),
    )
    return agg.select(
        "base_year", "n_base", "churned", "expanded", "contracted",
        F.round(F.col("capped_rev") / F.col("base_rev"), 6).alias("grr"),
        F.round(F.col("next_rev") / F.col("base_rev"), 6).alias("ndr"),
    ).orderBy("base_year")


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


# -- q_palma -----------------------------------------------------------
#
# Palma ratio per market segment: spend share of the top 10% of
# customers divided by the share of the bottom 40% — the inequality
# number development economists now prefer to Gini because the
# middle 50% is empirically stable, so ALL the action is in the two
# tails this ratio isolates (q_gini compresses them together,
# q_lorenz_asymmetry says which tail, Palma prices the tails against
# each other). Exact rank cutoffs ceil(0.1n)/ceil(0.4n) with custkey
# ties; decimal tail sums; one double ratio.

PALMA_SQL = """
WITH spend AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
                       CAST(0 AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS s
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT seg, s,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY s DESC, c_custkey)
           AS rtop,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY s, c_custkey)
           AS rbot,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM spend
), agg AS (
  SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN rtop <= CAST(ceil(0.1 * n) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DOUBLE) AS top10,
         CAST(SUM(CASE WHEN rbot <= CAST(ceil(0.4 * n) AS BIGINT)
                       THEN s ELSE CAST(0 AS DECIMAL(24,2)) END)
              AS DOUBLE) AS bot40,
         CAST(SUM(s) AS DOUBLE) AS tot
  FROM ranked GROUP BY 1
)
SELECT seg, n AS n_customers,
       round(top10 / tot, 6) AS top10_share,
       round(bot40 / tot, 6) AS bottom40_share,
       round(top10 / bot40, 6) AS palma_ratio
FROM agg
ORDER BY seg
"""


@query("q_palma", oracle=PALMA_SQL)
def q_palma(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.customer.join(
            cat.orders.select("o_custkey", "o_totalprice"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(
            F.coalesce(
                F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(24,2)")
            .alias("s")
        )
    )
    ws = Window.partitionBy("seg")
    ranked = spend.select(
        "seg", "s",
        F.row_number()
        .over(ws.orderBy(F.col("s").desc(), "c_custkey"))
        .alias("rtop"),
        F.row_number().over(ws.orderBy("s", "c_custkey")).alias("rbot"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    zero = F.lit(0).cast("decimal(24,2)")
    n = F.col("n")
    agg = ranked.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("nn"),
        F.sum(
            F.when(
                F.col("rtop") <= F.ceil(0.1 * n).cast("bigint"), F.col("s")
            ).otherwise(zero)
        )
        .cast("double")
        .alias("top10"),
        F.sum(
            F.when(
                F.col("rbot") <= F.ceil(0.4 * n).cast("bigint"), F.col("s")
            ).otherwise(zero)
        )
        .cast("double")
        .alias("bot40"),
        F.sum("s").cast("double").alias("tot"),
    )
    return agg.select(
        "seg",
        F.col("nn").alias("n_customers"),
        F.round(F.col("top10") / F.col("tot"), 6).alias("top10_share"),
        F.round(F.col("bot40") / F.col("tot"), 6).alias("bottom40_share"),
        F.round(F.col("top10") / F.col("bot40"), 6).alias("palma_ratio"),
    ).orderBy("seg")


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


# -- q_acceptance_sampling ---------------------------------------------
#
# Acceptance-sampling OC evaluation of the n = 50, c = 2 single
# sampling plan against each month's actual return rate: P(accept) =
# sum_{k<=2} C(50,k) p^k (1-p)^(50-k) with the literal binomial
# coefficients (1, 50, 1225) — the operating-characteristic curve of
# the quality-engineering standard, flagging months whose defect
# level the plan would likely REJECT (P < 0.10, the consumer-risk
# point) — the lot-disposition view beside q_p_chart's monitoring
# view. Monthly rates are exact count ratios; the OC polynomial is
# one identical double chain.

ACCEPT_SQL = """
WITH m AS (
  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), oc AS (
  SELECT mon, n, x, x / CAST(n AS DOUBLE) AS p,
         pow(1 - x / CAST(n AS DOUBLE), 50)
         + 50 * (x / CAST(n AS DOUBLE))
              * pow(1 - x / CAST(n AS DOUBLE), 49)
         + 1225 * pow(x / CAST(n AS DOUBLE), 2)
                * pow(1 - x / CAST(n AS DOUBLE), 48) AS p_accept
  FROM m
)
SELECT mon, n AS n_lines, x AS n_returns,
       round(p, 6) AS defect_rate,
       round(p_accept, 6) AS p_accept,
       CAST(CASE WHEN p_accept < 0.10 THEN 1 ELSE 0 END AS BIGINT)
         AS plan_rejects
FROM oc
ORDER BY mon
"""


@query("q_acceptance_sampling", oracle=ACCEPT_SQL)
def q_acceptance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    m = li.groupBy(
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM")
        .alias("mon")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    p = F.col("x") / F.col("n").cast("double")
    p_accept = (
        F.pow(1 - p, 50)
        + 50 * p * F.pow(1 - p, 49)
        + 1225 * F.pow(p, 2) * F.pow(1 - p, 48)
    )
    return m.select(
        "mon",
        F.col("n").alias("n_lines"),
        F.col("x").alias("n_returns"),
        F.round(p, 6).alias("defect_rate"),
        F.round(p_accept, 6).alias("p_accept"),
        F.when(p_accept < 0.10, 1).otherwise(0).cast("bigint")
        .alias("plan_rejects"),
    ).orderBy("mon")


# -- q_robust_shape ----------------------------------------------------
#
# Quantile-based robust shape panel per event type: Bowley skewness
# (Q3 + Q1 - 2*Q2)/(Q3 - Q1) and Moors kurtosis ((E7 - E5) +
# (E3 - E1))/(E6 - E2) from the octiles — bounded, outlier-immune
# counterparts of the moment skewness/kurtosis in q_stats_moments
# (one 10^9 outlier saturates a 4th moment; it moves an octile not
# at all). Octiles use the house interpolated-quantile + round
# pattern; the two ratios are single double chains.

ROBUST_SHAPE_SQL = """
WITH v AS (
  SELECT event_type, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
), q AS (
  SELECT event_type,
         round(quantile_cont(x, 0.125), 6) AS e1,
         round(quantile_cont(x, 0.25), 6) AS q1,
         round(quantile_cont(x, 0.375), 6) AS e3,
         round(quantile_cont(x, 0.5), 6) AS q2,
         round(quantile_cont(x, 0.625), 6) AS e5,
         round(quantile_cont(x, 0.75), 6) AS q3,
         round(quantile_cont(x, 0.875), 6) AS e7,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
)
SELECT event_type, n,
       round((q3 + q1 - 2 * q2) / (q3 - q1), 6) AS bowley_skew,
       round(((e7 - e5) + (e3 - e1)) / (q3 - q1), 6) AS moors_kurtosis,
       round(q3 - q1, 6) AS iqr
FROM q
ORDER BY event_type
"""


@query("q_robust_shape", oracle=ROBUST_SHAPE_SQL)
def q_robust_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("x")
    )
    qt = lambda p: F.round(F.percentile("x", F.lit(p)), 6)  # noqa: E731
    q = v.groupBy("event_type").agg(
        qt(0.125).alias("e1"),
        qt(0.25).alias("q1"),
        qt(0.375).alias("e3"),
        qt(0.5).alias("q2"),
        qt(0.625).alias("e5"),
        qt(0.75).alias("q3"),
        qt(0.875).alias("e7"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    q1, q2, q3 = F.col("q1"), F.col("q2"), F.col("q3")
    e1, e3, e5, e7 = (F.col(c) for c in ["e1", "e3", "e5", "e7"])
    return q.select(
        "event_type", "n",
        F.round((q3 + q1 - 2 * q2) / (q3 - q1), 6).alias("bowley_skew"),
        F.round(((e7 - e5) + (e3 - e1)) / (q3 - q1), 6)
        .alias("moors_kurtosis"),
        F.round(q3 - q1, 6).alias("iqr"),
    ).orderBy("event_type")


# -- q_double_jeopardy -------------------------------------------------
#
# Ehrenberg's double-jeopardy law across brands: small brands suffer
# twice — fewer buyers (penetration b) AND lighter buyers (purchase
# frequency w) — so w regressed on ln(b) across the brand portfolio
# should slope UP; a flat/negative slope marks a niche-brand anomaly
# worth a positioning look. Reports per-portfolio the correlation,
# the w-on-ln(b) slope, and the flagship marketing-science check
# beside q_share_of_wallet (within-customer) and q_bcg_matrix
# (share-vs-growth). Penetration and frequency are exact count
# ratios; the fit is the house moment chain over 9-rounded pairs.

DJ_SQL = """
WITH buyers AS (
  SELECT p_brand, o_custkey, COUNT(*) AS k
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM customer),
brand AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_buyers,
         CAST(SUM(k) AS BIGINT) AS n_purchases
  FROM buyers GROUP BY 1
), xy AS (
  SELECT p_brand,
         CAST(round(ln(n_buyers / CAST(nc AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS x,
         CAST(round(n_purchases / CAST(n_buyers AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS y
  FROM brand CROSS JOIN tot
), mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_brands,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS penetration_loyalty_corr,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS w_on_lnb_slope,
       CAST(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS double_jeopardy_holds
FROM mom
"""


@query("q_double_jeopardy", oracle=DJ_SQL)
def q_double_jeopardy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    buyers = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tot = cat.customer.agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    brand = buyers.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        F.sum("k").cast("bigint").alias("n_purchases"),
    )
    xy = brand.join(F.broadcast(tot)).select(
        F.round(
            F.log(F.col("n_buyers") / F.col("nc").cast("double")), 9
        )
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(
            F.col("n_purchases") / F.col("n_buyers").cast("double"), 9
        )
        .cast("decimal(18,9)")
        .alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    r9 = lambda e: F.sum(  # noqa: E731
        F.round(e, 9).cast("decimal(28,9)")
    ).cast("double")
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        r9(xd * xd).alias("sxx"),
        r9(xd * yd).alias("sxy"),
        r9(yd * yd).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return mom.select(
        n.cast("bigint").alias("n_brands"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("penetration_loyalty_corr"),
        F.round(slope, 6).alias("w_on_lnb_slope"),
        F.when(slope > 0, 1).otherwise(0).cast("bigint")
        .alias("double_jeopardy_holds"),
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


# -- q_fisher_ideal ----------------------------------------------------
#
# Index-number completion beside q_price_index's Laspeyres: per month
# (vs the first month as base, matched brands only) the Paasche index
# (current-quantity weights), the Fisher IDEAL index (geometric mean
# of the two — the superlative index national accounts use), and the
# Tornqvist index exp(sum of avg-revenue-share-weighted log price
# relatives). Laspeyres overstates inflation under substitution,
# Paasche understates; Fisher/Tornqvist bound the truth between.
# Brand-month unit values are exact-decimal rev/qty doubles; the four
# index aggregations fold 9-rounded terms exactly.

FISHER_IDX_SQL = """
WITH bm AS (
  SELECT p_brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), base AS (
  SELECT p_brand,
         CAST(rev AS DOUBLE) / CAST(qty AS DOUBLE) AS p0,
         CAST(qty AS DOUBLE) AS q0,
         CAST(rev AS DOUBLE) AS r0
  FROM bm WHERE mon = (SELECT MIN(mon) FROM bm) AND qty > 0
), cur AS (
  SELECT mon, p_brand,
         CAST(rev AS DOUBLE) / CAST(qty AS DOUBLE) AS p1,
         CAST(qty AS DOUBLE) AS q1,
         CAST(rev AS DOUBLE) AS r1
  FROM bm WHERE qty > 0
), j AS (
  SELECT c.mon, c.p_brand, b.p0, b.q0, b.r0, c.p1, c.q1, c.r1
  FROM cur c JOIN base b ON b.p_brand = c.p_brand
), shares AS (
  SELECT mon, p_brand, p0, q0, p1, q1,
         r0 / SUM(r0) OVER (PARTITION BY mon) AS s0,
         r1 / SUM(r1) OVER (PARTITION BY mon) AS s1,
         ln(p1 / p0) AS lpr
  FROM j
), agg2 AS (
  SELECT mon, COUNT(*) AS n_brands,
         CAST(SUM(CAST(round(p1 * q0, 4) AS DECIMAL(28,4))) AS DOUBLE)
           AS p1q0,
         CAST(SUM(CAST(round(p0 * q0, 4) AS DECIMAL(28,4))) AS DOUBLE)
           AS p0q0,
         CAST(SUM(CAST(round(p1 * q1, 4) AS DECIMAL(28,4))) AS DOUBLE)
           AS p1q1,
         CAST(SUM(CAST(round(p0 * q1, 4) AS DECIMAL(28,4))) AS DOUBLE)
           AS p0q1,
         CAST(SUM(CAST(round(0.5 * (s0 + s1) * lpr, 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS tq
  FROM shares GROUP BY mon
)
SELECT mon, CAST(n_brands AS BIGINT) AS n_brands,
       round(p1q0 / p0q0, 6) AS laspeyres,
       round(p1q1 / p0q1, 6) AS paasche,
       round(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6) AS fisher_ideal,
       round(exp(tq), 6) AS tornqvist
FROM agg2
ORDER BY mon
"""


@query("q_fisher_ideal", oracle=FISHER_IDX_SQL)
def q_fisher_ideal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bm = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
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
        .localCheckpoint()
    )
    m0 = bm.agg(F.min("mon").alias("mon0"))
    base = (
        bm.join(F.broadcast(m0), bm["mon"] == F.col("mon0"))
        .filter(F.col("qty") > 0)
        .select(
            "p_brand",
            (F.col("rev").cast("double") / F.col("qty").cast("double"))
            .alias("p0"),
            F.col("qty").cast("double").alias("q0"),
            F.col("rev").cast("double").alias("r0"),
        )
    )
    cur = bm.filter(F.col("qty") > 0).select(
        "mon", "p_brand",
        (F.col("rev").cast("double") / F.col("qty").cast("double"))
        .alias("p1"),
        F.col("qty").cast("double").alias("q1"),
        F.col("rev").cast("double").alias("r1"),
    )
    j = cur.join(F.broadcast(base), "p_brand")
    wm = Window.partitionBy("mon")
    shares = j.select(
        "mon", "p0", "q0", "p1", "q1",
        (F.col("r0") / F.sum("r0").over(wm)).alias("s0"),
        (F.col("r1") / F.sum("r1").over(wm)).alias("s1"),
        F.log(F.col("p1") / F.col("p0")).alias("lpr"),
    )
    r4 = lambda e: F.sum(  # noqa: E731
        F.round(e, 4).cast("decimal(28,4)")
    ).cast("double")
    agg2 = shares.groupBy("mon").agg(
        F.count(F.lit(1)).alias("n_brands"),
        r4(F.col("p1") * F.col("q0")).alias("p1q0"),
        r4(F.col("p0") * F.col("q0")).alias("p0q0"),
        r4(F.col("p1") * F.col("q1")).alias("p1q1"),
        r4(F.col("p0") * F.col("q1")).alias("p0q1"),
        F.sum(
            F.round(
                0.5 * (F.col("s0") + F.col("s1")) * F.col("lpr"), 9
            ).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("tq"),
    )
    lasp = F.col("p1q0") / F.col("p0q0")
    paas = F.col("p1q1") / F.col("p0q1")
    return agg2.select(
        "mon",
        F.col("n_brands").cast("bigint").alias("n_brands"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher_ideal"),
        F.round(F.exp("tq"), 6).alias("tornqvist"),
    ).orderBy("mon")
