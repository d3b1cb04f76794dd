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
