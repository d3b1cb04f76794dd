"""SURVEY §2.A additions (round 5, later session) — distribution,
concentration, sweep-line, and skyline analytics (oracle-verified).

All four follow the registry determinism rules: money through
DECIMAL(18,2), ratios as one double division rounded to 6, dates as
strings, ties broken on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import dec, query
from redmap_spark.plans.prefix import two_phase_cumsum, two_phase_ntile

# -- q_mode_per_group --------------------------------------------------
#
# Categorical mode per group: the most frequent order priority in each
# market segment, with its count and share. Scale shape: one
# customer⋈orders broadcast-dim join, one partial-aggregated groupBy
# to the tiny |segments|×|priorities| grid; both windows (top-1 pick,
# per-segment total) run over that grid only. Tie-break: lowest
# priority string wins (deterministic across engines).

MODE_SQL = """
WITH g AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_mktsegment, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, o_orderpriority) AS rk,
         SUM(n) OVER (PARTITION BY c_mktsegment) AS tot
  FROM g
)
SELECT c_mktsegment, o_orderpriority AS mode_priority,
       CAST(n AS BIGINT) AS n_orders,
       round(n / CAST(tot AS DOUBLE), 6) AS share
FROM r WHERE rk = 1
"""


@query("q_mode_per_group", oracle=MODE_SQL)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    g = (
        cat.orders.join(
            F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment")
    r = g.select(
        "c_mktsegment",
        "o_orderpriority",
        "n",
        F.row_number()
        .over(w.orderBy(F.col("n").desc(), "o_orderpriority"))
        .alias("rk"),
        F.sum("n").over(w).alias("tot"),
    )
    return r.filter(F.col("rk") == 1).select(
        "c_mktsegment",
        F.col("o_orderpriority").alias("mode_priority"),
        F.col("n").alias("n_orders"),
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("share"),
    )


# -- q_decile_lift -----------------------------------------------------
#
# Revenue-concentration decile table (the 80/20 report): customers
# ranked by lifetime revenue, cut into ntile(10) deciles; per decile
# the customer count, exact-decimal revenue, and share of total. Scale
# shape: the fact scan partial-aggregates to the |customers| grid; the
# ntile window sorts that grid (two-pass range-partitioned sort at
# cluster scale — the grid is orders of magnitude smaller than the
# fact table); the total is a 1-row broadcast join. Ties on equal
# revenue break by custkey so the ntile cut is engine-deterministic.

DECILE_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY 1
), cut AS (
  SELECT o_custkey, r, NTILE(10) OVER (ORDER BY r DESC, o_custkey) AS decile
  FROM rev
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS decile_rev,
       round(CAST(SUM(r) AS DOUBLE) /
             (SELECT CAST(SUM(r) AS DOUBLE) FROM rev), 6) AS rev_share
FROM cut GROUP BY 1
"""


@query("q_decile_lift", oracle=DECILE_SQL)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    # |customers| scales with the data (the sf0.1 sp-window sweep
    # measured 15k rows through the old global-ntile singleton), so
    # the decile cut is a TWO-PHASE global ntile: buckets on
    # -floor(r/4096) (per-customer revenue domain-bounded by order
    # multiplicity — a few hundred buckets, SF-independent) aligned
    # with the r DESC order (plans/prefix.py).
    cut = two_phase_ntile(
        rev, 10, [F.col("r").desc(), "o_custkey"],
        (-F.floor(F.col("r") / 4096)).cast("bigint"), out="decile",
    ).select("r", "decile")
    per = cut.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("r").alias("dr"),
    )
    total = rev.agg(F.sum("r").cast("double").alias("tot"))
    return per.join(F.broadcast(total)).select(
        "decile",
        "n_customers",
        F.col("dr").cast("double").alias("decile_rev"),
        F.round(F.col("dr").cast("double") / F.col("tot"), 6).alias("rev_share"),
    )


# -- q_interval_sweep --------------------------------------------------
#
# Sweep-line interval concurrency: treating each order as active for
# 30 days from its order date, find per nation the PEAK number of
# simultaneously-active orders and the first day it is reached — the
# classic max-concurrent-sessions shape (capacity planning, license
# counting). Scale shape: each order emits one +1 and one -1 delta
# (flat map, no blowup), deltas collapse by (nation, day) BEFORE the
# window, and the running sum partitions by nation — no global sort.
# Intra-day ordering is moot because deltas are pre-summed per day
# (half-open intervals: the -1 lands exactly on day+30, netted in the
# same per-day sum).

SWEEP_SQL = """
WITH deltas AS (
  SELECT n_name, date_trunc('day', o_orderdate) AS day, 1 AS delta
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT n_name, date_trunc('day', o_orderdate) + INTERVAL 30 DAY, -1
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
), byday AS (
  SELECT n_name, day, SUM(delta) AS d FROM deltas GROUP BY 1, 2
), run AS (
  SELECT n_name, day,
         SUM(d) OVER (PARTITION BY n_name ORDER BY day) AS active
  FROM byday
), peak AS (
  SELECT n_name, MAX(active) AS peak_active FROM run GROUP BY 1
)
SELECT r.n_name, CAST(p.peak_active AS BIGINT) AS peak_active,
       strftime(MIN(r.day), '%Y-%m-%d') AS peak_day
FROM run r JOIN peak p ON r.n_name = p.n_name AND r.active = p.peak_active
GROUP BY 1, 2
"""


@query("q_interval_sweep", oracle=SWEEP_SQL)
def q_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators.analytics import peak_concurrency

    cat = Catalog(spark, sf_dir)
    base = cat.orders.join(
        F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    day = F.date_trunc("day", "o_orderdate")
    iv = base.select(
        "n_name", day.alias("s"), (day + F.expr("INTERVAL 30 DAY")).alias("e")
    )
    pk = peak_concurrency(iv, "n_name", "s", "e")
    return pk.select(
        "n_name",
        "peak_active",
        F.date_format("peak_at", "yyyy-MM-dd").alias("peak_day"),
    )


# -- q_skyline ---------------------------------------------------------
#
# Pareto frontier (skyline): parts where no other part is both cheaper
# (<= price) and larger (>= size) with at least one strict — the
# multi-objective shortlist shape. Scale design: collapse to the
# DISTINCT (price, size) grid first (dominance is identical for
# duplicates), then one window pass over the grid sorted by
# (price ASC, size DESC): a point is dominated iff the running MAX of
# size over STRICT predecessors >= its size — predecessors in this
# order are exactly the cheaper-or-equal-and-larger candidates. The
# window sorts only the distinct grid (≪ table); the oracle states
# dominance independently as NOT EXISTS, so the window rewrite is
# verified against the definition, not against itself.

SKYLINE_SQL = """
WITH g AS (
  SELECT p_retailprice AS price, p_size AS sz, COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT a.price, a.sz AS size, CAST(a.n_parts AS BIGINT) AS n_parts
FROM g a
WHERE NOT EXISTS (
  SELECT 1 FROM g b
  WHERE b.price <= a.price AND b.sz >= a.sz
    AND (b.price < a.price OR b.sz > a.sz)
)
"""


@query("q_skyline", oracle=SKYLINE_SQL)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators.analytics import skyline

    p = Catalog(spark, sf_dir).part
    # bucket_width=8: retail price has a bounded ~[900, 2100] domain,
    # so ~150 SF-independent buckets carry the two-phase frontier scan
    # (the distinct price x size grid itself scales with |parts|).
    sky = skyline(
        p.select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("sz")),
        "price",
        "sz",
        bucket_width=8.0,
    )
    return sky.select(
        "price", F.col("sz").alias("size"), F.col("n_rows").alias("n_parts")
    )


# -- q_rfm_features ----------------------------------------------------
#
# RFM feature engineering (recency / frequency / monetary + quintile
# scores): the canonical customer-feature table a downstream model
# trains on. Scale shape: one fact scan partial-aggregates to the
# |customers| grid; the corpus max-date is a 1-row broadcast; the
# three ntile(5) windows sort only the aggregated grid (documented
# grid-window compromise, two-pass range sort at cluster scale).
# Every ntile orders with a custkey tie-break so the quintile cuts
# are engine-deterministic.

RFM_SQL = """
WITH agg AS (
  SELECT o_custkey,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m,
         MAX(date_trunc('day', o_orderdate)) AS last_day
  FROM orders GROUP BY 1
), mx AS (
  SELECT MAX(last_day) AS corpus_max FROM agg
), feat AS (
  SELECT o_custkey, frequency, m,
         datediff('day', last_day, corpus_max) AS recency_days
  FROM agg CROSS JOIN mx
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(m AS DOUBLE) AS monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY m DESC, o_custkey) AS BIGINT) AS m_score
FROM feat
"""


@query("q_rfm_features", oracle=RFM_SQL)
def q_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
        F.max(F.date_trunc("day", "o_orderdate")).alias("last_day"),
    )
    mx = agg.agg(F.max("last_day").alias("corpus_max"))
    feat = agg.join(F.broadcast(mx)).select(
        "o_custkey",
        "frequency",
        "m",
        F.datediff("corpus_max", "last_day").alias("recency_days"),
    )
    # |customers| scales with the data (15k rows crossed each of the
    # three old global-ntile singletons at sf0.1), so every quintile
    # is a TWO-PHASE global ntile (plans/prefix.py) on a
    # domain-bounded bucket: recency days (~0..2500), per-customer
    # order count (small), per-customer revenue / 4096. Each kernel
    # references its input twice, so cut the lineage once before the
    # chain (the q_abc_analysis grid-checkpoint pattern) — without it
    # the plan compounds to ~104 Exchanges.
    feat = feat.localCheckpoint()
    feat = two_phase_ntile(
        feat, 5, ["recency_days", "o_custkey"],
        F.floor(F.col("recency_days") / 16).cast("bigint"), out="r_score",
    ).localCheckpoint()
    feat = two_phase_ntile(
        feat, 5, [F.col("frequency").desc(), "o_custkey"],
        (-F.col("frequency")).cast("bigint"), out="f_score",
    ).localCheckpoint()
    feat = two_phase_ntile(
        feat, 5, [F.col("m").desc(), "o_custkey"],
        (-F.floor(F.col("m") / 4096)).cast("bigint"), out="m_score",
    )
    return feat.select(
        "o_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("m").cast("double").alias("monetary"),
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
    )


# -- q_stratified_sample -----------------------------------------------
#
# Per-stratum deterministic sampling at DIFFERENT rates (training-
# mixture rebalance: upsample one segment, downsample the rest) —
# the oracle-checkable form of the Pipeline API's stratified_sample.
# Keep decision is md5(custkey) prefix < per-stratum hex threshold:
# zero shuffle, zero rand(), reproducible across engines, runs, and
# partitionings. Rates: BUILDING ~20% ('33'/256), others ~5%
# ('0d'/256).

STRAT_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <
      CASE WHEN c_mktsegment = 'BUILDING' THEN '33' ELSE '0d' END
"""


@query("q_stratified_sample", oracle=STRAT_SQL)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    thresh = F.when(F.col("c_mktsegment") == "BUILDING", F.lit("33")).otherwise(
        F.lit("0d")
    )
    keep = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2) < thresh
    return c.filter(keep).select("c_custkey", "c_mktsegment")


# -- q_winsorize -------------------------------------------------------
#
# Robust (winsorized) statistics per group: clip account balances to
# the segment's [p10, p90] band, then compare raw vs winsorized mean
# — the outlier-resistant aggregate a feature pipeline prefers over
# a plain mean. Scale shape: exact percentiles aggregate per segment
# (tiny grid, broadcast back); the clip + mean is one more scan with
# exact-decimal folds. Bounds are rounded to 2 decimals BEFORE
# clipping so every clipped value is decimal-exact in both engines.

WINSOR_SQL = """
WITH b AS (
  SELECT c_mktsegment,
         round(quantile_cont(c_acctbal, 0.10), 2) AS b10,
         round(quantile_cont(c_acctbal, 0.90), 2) AS b90
  FROM customer GROUP BY 1
)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       b.b10, b.b90,
       round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS mean_raw,
       round(CAST(SUM(CAST(LEAST(GREATEST(c.c_acctbal, b.b10), b.b90)
                           AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS mean_winsor
FROM customer c JOIN b ON c.c_mktsegment = b.c_mktsegment
GROUP BY 1, 3, 4
"""


@query("q_winsorize", oracle=WINSOR_SQL)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    b = c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.10)), 2).alias("b10"),
        F.round(F.percentile("c_acctbal", F.lit(0.90)), 2).alias("b90"),
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("b10")), F.col("b90"))
    return (
        c.join(F.broadcast(b), "c_mktsegment")
        .groupBy("c_mktsegment", "b10", "b90")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped.cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_winsor"),
        )
        .select("c_mktsegment", "n", "b10", "b90", "mean_raw", "mean_winsor")
    )


# -- q_time_weighted_avg -----------------------------------------------
#
# Time-weighted average (TWAP) of the event value per user: each
# observation holds until the next one, so its weight is the
# interval length — the correct average for irregularly-sampled
# series (prices, gauges). Scale shape: one user-partitioned window
# (lead) over the stream, then a partial-aggregated per-user fold.
# Determinism: intervals are EXACT microsecond bigints (epoch-us
# difference — avoids the boundary-count vs truncation divergence of
# second-granularity date_diff), value·dt products go through
# DECIMAL(28,6) so the fold is order-independent; the unit cancels
# in the ratio.

TWAP_SQL = """
WITH seq AS (
  SELECT user_id, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       round(CAST(SUM(CAST(value * dt_us AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(dt_us) AS DOUBLE), 6) AS twap
FROM seq WHERE dt_us IS NOT NULL AND dt_us > 0
GROUP BY user_id
"""


@query("q_time_weighted_avg", oracle=TWAP_SQL)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").cast("bigint").alias("span_us"),
        F.round(
            F.sum((F.col("value") * F.col("dt_us")).cast("decimal(28,6)"))
            .cast("double")
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twap"),
    )


# -- q_ab_test ---------------------------------------------------------
#
# Deterministic A/B experiment report: users are assigned to arms by
# md5 parity (the reproducible split every experimentation system
# needs — no rand(), stable across runs/engines), then order values
# are compared with a Welch t statistic. Scale shape: ONE fact scan,
# conditional partial aggregation per arm (no join, no shuffle
# beyond the 1-group agg); mean/variance derive from exact decimal
# Σx and Σx² folds so the double arithmetic on top is identical in
# both engines.

ABTEST_SQL = """
WITH t AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 'control' ELSE 'treatment' END AS arm,
         o_totalprice AS x
  FROM orders
), s AS (
  SELECT
    SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS n_c,
    SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS n_t,
    SUM(CASE WHEN arm = 'control' THEN CAST(x AS DECIMAL(18,2)) END) AS sx_c,
    SUM(CASE WHEN arm = 'treatment' THEN CAST(x AS DECIMAL(18,2)) END) AS sx_t,
    SUM(CASE WHEN arm = 'control' THEN CAST(x * x AS DECIMAL(28,4)) END) AS sxx_c,
    SUM(CASE WHEN arm = 'treatment' THEN CAST(x * x AS DECIMAL(28,4)) END) AS sxx_t
  FROM t
)
SELECT CAST(n_c AS BIGINT) AS n_control, CAST(n_t AS BIGINT) AS n_treatment,
       round(CAST(sx_c AS DOUBLE) / n_c, 6) AS mean_control,
       round(CAST(sx_t AS DOUBLE) / n_t, 6) AS mean_treatment,
       round((CAST(sx_c AS DOUBLE) / n_c - CAST(sx_t AS DOUBLE) / n_t)
             / sqrt((CAST(sxx_c AS DOUBLE) - CAST(sx_c AS DOUBLE)
                     * CAST(sx_c AS DOUBLE) / n_c) / (n_c - 1) / n_c
                  + (CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE)
                     * CAST(sx_t AS DOUBLE) / n_t) / (n_t - 1) / n_t),
             6) AS t_welch
FROM s
"""


@query("q_ab_test", oracle=ABTEST_SQL)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    arm = F.when(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8",
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    t = o.select(arm.alias("arm"), F.col("o_totalprice").alias("x"))
    is_c, is_t = F.col("arm") == "control", F.col("arm") == "treatment"
    s = t.agg(
        F.sum(F.when(is_c, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(is_c, F.col("x").cast("decimal(18,2)"))).alias("sx_c"),
        F.sum(F.when(is_t, F.col("x").cast("decimal(18,2)"))).alias("sx_t"),
        F.sum(F.when(is_c, (F.col("x") * F.col("x")).cast("decimal(28,4)"))).alias("sxx_c"),
        F.sum(F.when(is_t, (F.col("x") * F.col("x")).cast("decimal(28,4)"))).alias("sxx_t"),
    )
    nc, nt = F.col("n_c"), F.col("n_t")
    sxc, sxt = F.col("sx_c").cast("double"), F.col("sx_t").cast("double")
    sxxc, sxxt = F.col("sxx_c").cast("double"), F.col("sxx_t").cast("double")
    var_c = (sxxc - sxc * sxc / nc) / (nc - 1) / nc
    var_t = (sxxt - sxt * sxt / nt) / (nt - 1) / nt
    return s.select(
        nc.cast("bigint").alias("n_control"),
        nt.cast("bigint").alias("n_treatment"),
        F.round(sxc / nc, 6).alias("mean_control"),
        F.round(sxt / nt, 6).alias("mean_treatment"),
        F.round((sxc / nc - sxt / nt) / F.sqrt(var_c + var_t), 6).alias("t_welch"),
    )


# -- q_market_basket ---------------------------------------------------
#
# Association rules over order baskets: top brand pairs by lift
# (support / confidence / lift) — the classic co-occurrence mining
# workload. Scale shape: baskets collapse to DISTINCT (order, brand)
# first (part dim broadcast); the pair generation is a self
# equi-join on o_orderkey — co-partitioned, cost Σ basket² with
# baskets bounded by order size, never |orders|²; per-brand supports
# and the order count come back as broadcasts. Top-15 by lift is a
# mergeable TakeOrdered with a pair tie-break.

BASKET_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (
  SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS n_orders FROM ob
), sup AS (
  SELECT b, COUNT(*) AS n_b FROM ob GROUP BY 1
), pairs AS (
  SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS n_ab
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab / n.n_orders, 6) AS support,
       round(n_ab / CAST(sa.n_b AS DOUBLE), 6) AS confidence,
       round(n_ab * n.n_orders / (CAST(sa.n_b AS DOUBLE) * sb.n_b), 6) AS lift
FROM pairs CROSS JOIN n
JOIN sup sa ON sa.b = brand_a
JOIN sup sb ON sb.b = brand_b
ORDER BY lift DESC, brand_a, brand_b LIMIT 15
"""


@query("q_market_basket", oracle=BASKET_SQL)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    ob = (
        c.lineitem.join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n = ob.agg(F.countDistinct("o").cast("double").alias("n_orders"))
    sup = ob.groupBy(F.col("b")).agg(F.count(F.lit(1)).alias("n_b"))
    a, d = ob.alias("a"), ob.alias("d")
    pairs = (
        a.join(d, (F.col("a.o") == F.col("d.o")) & (F.col("a.b") < F.col("d.b")))
        .groupBy(
            F.col("a.b").alias("brand_a"), F.col("d.b").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = sup.select(F.col("b").alias("brand_a"), F.col("n_b").alias("na"))
    sb = sup.select(F.col("b").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(n))
        .join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(F.col("n_ab") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("na").cast("double"), 6).alias("confidence"),
            F.round(
                F.col("n_ab") * F.col("n_orders")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(15)
    )


# -- q_funnel_latency --------------------------------------------------
#
# Time-to-convert distribution: days between a user's FIRST view and
# FIRST subsequent purchase, as a histogram — the latency companion
# to q_funnel's conversion counts. Scale shape: one conditional
# partial aggregation per user (no join, no window), then the
# histogram groupBy collapses to the tiny |days| grid. Latency is an
# exact microsecond difference floor-divided to days (deterministic
# integer arithmetic in both engines).

FUNNEL_LAT_SQL = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY 1
)
SELECT (p - v) // 86400000000 AS latency_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
GROUP BY 1
"""


@query("q_funnel_latency", oracle=FUNNEL_LAT_SQL)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p"),
    )
    return (
        u.filter(
            F.col("v").isNotNull()
            & F.col("p").isNotNull()
            & (F.col("p") >= F.col("v"))
        )
        # integer `div`, not double `/` + cast: a diff of
        # day-minus-1µs would double-round up across the boundary
        .select(F.expr("(p - v) div 86400000000").alias("latency_days"))
        .groupBy("latency_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# -- q_decile_transitions ----------------------------------------------
#
# Customer spend-decile migration matrix, 1996 → 1997: the rank-
# mobility report behind churn/upsell dashboards (which decile did
# last year's decile-1 customers land in?). Deciles are NTILE(10)
# over exact-decimal yearly spend with custkey tie-break (the same
# engine-deterministic cut as q_decile_lift); customers active in
# only one of the two years appear as decile 0 on the missing side,
# so the matrix is a complete flow. Shape: facts collapse to the
# per-(customer, year) grid first; the ntile windows sort that grid,
# and a production 100 TB variant swaps the global ntile for
# percentile-boundary broadcast joins (the mr_total_sort trick).

DECILE_TRANS_SQL = """
WITH rev AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2
),
cut AS (
  SELECT o_custkey, yr,
         NTILE(10) OVER (PARTITION BY yr ORDER BY r DESC, o_custkey)
           AS decile
  FROM rev
),
flow AS (
  SELECT COALESCE(a.o_custkey, b.o_custkey) AS ck,
         COALESCE(a.decile, 0) AS d_prev,
         COALESCE(b.decile, 0) AS d_curr
  FROM (SELECT * FROM cut WHERE yr = 1996) a
  FULL OUTER JOIN (SELECT * FROM cut WHERE yr = 1997) b
    ON a.o_custkey = b.o_custkey
)
SELECT CAST(d_prev AS BIGINT) AS d_prev, CAST(d_curr AS BIGINT) AS d_curr,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM flow GROUP BY 1, 2
"""


@query("q_decile_transitions", oracle=DECILE_TRANS_SQL)
def q_decile_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    rev = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    cut = rev.select(
        "o_custkey", "yr",
        F.ntile(10)
        .over(
            Window.partitionBy("yr").orderBy(F.col("r").desc(), "o_custkey")
        )
        .alias("decile"),
    )
    a = cut.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("ck_a"), F.col("decile").alias("da")
    )
    b = cut.filter(F.col("yr") == 1997).select(
        F.col("o_custkey").alias("ck_b"), F.col("decile").alias("db")
    )
    flow = a.join(b, a.ck_a == b.ck_b, "full").select(
        F.coalesce(F.col("da"), F.lit(0)).alias("d_prev"),
        F.coalesce(F.col("db"), F.lit(0)).alias("d_curr"),
    )
    return flow.groupBy("d_prev", "d_curr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    ).select(
        F.col("d_prev").cast("bigint").alias("d_prev"),
        F.col("d_curr").cast("bigint").alias("d_curr"),
        "n_customers",
    )


# -- q_rate_limit ------------------------------------------------------
#
# Sliding-window rate audit: each user's PEAK events-per-trailing-hour
# (count over a RANGE frame of 3600 epoch-seconds anchored at every
# event), reported for the top 20 burstiest users — the abuse /
# rate-limit capacity check an event platform runs before setting
# throttle thresholds. A tumbling-bucket count would miss bursts that
# straddle bucket edges; the RANGE frame is the exact sliding
# semantics. Scale shape: ONE shuffle by user_id for the range
# window (the frame scans each user's bounded event history), then a
# per-user max collapse and a 20-row ordered cut with deterministic
# (peak DESC, user ASC) ties. Epoch seconds truncate identically
# (floor) in both engines.

RATE_LIMIT_SQL = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), rated AS (
  SELECT user_id,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS in_hour
  FROM ev
), peaks AS (
  SELECT user_id,
         CAST(MAX(in_hour) AS BIGINT) AS peak_per_hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM rated GROUP BY 1
)
SELECT user_id, peak_per_hour, n_events,
       round(peak_per_hour / CAST(n_events AS DOUBLE), 6) AS burst_share
FROM peaks
ORDER BY peak_per_hour DESC, user_id
LIMIT 20
"""


@query("q_rate_limit", oracle=RATE_LIMIT_SQL)
def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ev = e.select("user_id", F.col("ts").cast("long").alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, 0)
    )
    rated = ev.select(
        "user_id", F.count(F.lit(1)).over(w).cast("bigint").alias("in_hour")
    )
    peaks = rated.groupBy("user_id").agg(
        F.max("in_hour").cast("bigint").alias("peak_per_hour"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        peaks.select(
            "user_id", "peak_per_hour", "n_events",
            F.round(
                F.col("peak_per_hour") / F.col("n_events").cast("double"), 6
            ).alias("burst_share"),
        )
        .orderBy(F.desc("peak_per_hour"), F.asc("user_id"))
        .limit(20)
    )


# -- q_cuped -----------------------------------------------------------
#
# CUPED variance reduction (Deng et al. 2013 — the standard trick
# that makes A/B tests converge faster): per user, the pre-period
# (first half) total value is the covariate for the post-period
# (second half) metric; θ = cov(pre, post)/var(pre) from EXACT
# decimal moments, and the dashboard reports the achieved variance
# reduction 1 − var(adj)/var(post) = ρ² — how much experiment
# traffic the covariate buys back. Only users observed in both
# halves enter (the experiment population). All moments exact
# decimal; θ, variances and ρ² are identical double expressions.
# Scale shape: two grouped scans to the |users| grid, one moment
# aggregate — nothing user-pairwise.

CUPED_SPLIT = "2024-01-16"

CUPED_SQL = f"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT}'
                       THEN CAST(value AS DECIMAL(18,2)) END)
              AS DECIMAL(28,2)) AS pre,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT}'
                       THEN CAST(value AS DECIMAL(18,2)) END)
              AS DECIMAL(28,2)) AS post
  FROM events WHERE value IS NOT NULL GROUP BY 1
), b AS (
  SELECT pre, post FROM per WHERE pre IS NOT NULL AND post IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(post) AS DECIMAL(38,2)) AS sy,
         CAST(SUM(CAST(pre AS DECIMAL(19,2)) * CAST(post AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS sxy,
         CAST(SUM(CAST(pre AS DECIMAL(19,2)) * CAST(pre AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(post AS DECIMAL(19,2)) * CAST(post AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS syy
  FROM b
)
SELECT n AS n_users,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS theta,
       round((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             / (1.0 * n * n), 6) AS var_post,
       round(((n * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (n * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((n * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS variance_reduction
FROM m
"""


@query("q_cuped", oracle=CUPED_SQL)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = F.col("value").cast("decimal(18,2)")
    per = e.filter(F.col("value").isNotNull()).groupBy("user_id").agg(
        F.sum(F.when(F.to_date("ts") < F.lit(CUPED_SPLIT), v))
        .cast("decimal(28,2)").alias("pre"),
        F.sum(F.when(F.to_date("ts") >= F.lit(CUPED_SPLIT), v))
        .cast("decimal(28,2)").alias("post"),
    )
    b = per.filter(
        F.col("pre").isNotNull() & F.col("post").isNotNull()
    ).select(
        F.col("pre").cast("decimal(19,2)").alias("pre"),
        F.col("post").cast("decimal(19,2)").alias("post"),
    )
    m = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pre").cast("decimal(38,2)").alias("sx"),
        F.sum("post").cast("decimal(38,2)").alias("sy"),
        F.sum(F.col("pre") * F.col("post")).cast("decimal(38,4)").alias("sxy"),
        F.sum(F.col("pre") * F.col("pre")).cast("decimal(38,4)").alias("sxx"),
        F.sum(F.col("post") * F.col("post")).cast("decimal(38,4)").alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cxy = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    return m.select(
        n.alias("n_users"),
        F.round(cxy / vx, 6).alias("theta"),
        F.round(vy / (1.0 * n * n), 6).alias("var_post"),
        F.round((cxy * cxy) / (vx * vy), 6).alias("variance_reduction"),
    )


# -- q_diff_in_diff ----------------------------------------------------
#
# Difference-in-differences estimate (the workhorse quasi-experiment
# design): treatment = users who signed up in the pre-period (any
# 'signup' event before Jan 16), outcome = mean per-user event value
# in pre vs post; DiD = (T_post − T_pre) − (C_post − C_pre), with
# the pooled standard error from the four cells' exact decimal
# moments (independent-cells approximation, stated as part of the
# statistic). All cell sums exact; means/variances/SE one identical
# double expression chain. Scale shape: one broadcast semi-join of
# the treated-user set, one grouped scan to the 4-cell grid.

DID_SPLIT = "2024-01-16"

DID_SQL = f"""
WITH treated AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'signup' AND CAST(ts AS DATE) < DATE '{DID_SPLIT}'
), cells AS (
  SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_treated,
         CASE WHEN CAST(e.ts AS DATE) >= DATE '{DID_SPLIT}'
              THEN 1 ELSE 0 END AS is_post,
         CAST(e.value AS DECIMAL(18,2)) AS x
  FROM events e LEFT JOIN treated t ON t.user_id = e.user_id
  WHERE e.value IS NOT NULL
), m AS (
  SELECT is_treated, is_post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(28,2)) AS s,
         CAST(SUM(x * x) AS DECIMAL(38,4)) AS ssq
  FROM cells GROUP BY 1, 2
), w AS (
  SELECT
    MAX(CASE WHEN is_treated = 1 AND is_post = 0
             THEN CAST(s AS DOUBLE) / n END) AS t_pre,
    MAX(CASE WHEN is_treated = 1 AND is_post = 1
             THEN CAST(s AS DOUBLE) / n END) AS t_post,
    MAX(CASE WHEN is_treated = 0 AND is_post = 0
             THEN CAST(s AS DOUBLE) / n END) AS c_pre,
    MAX(CASE WHEN is_treated = 0 AND is_post = 1
             THEN CAST(s AS DOUBLE) / n END) AS c_post,
    SUM(CASE WHEN is_treated = 1 THEN n ELSE 0 END) AS n_treated,
    SUM(CASE WHEN is_treated = 0 THEN n ELSE 0 END) AS n_control,
    SUM(((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
         / (n - 1.0)) / n) AS var_sum
  FROM m
)
SELECT CAST(n_treated AS BIGINT) AS n_treated_events,
       CAST(n_control AS BIGINT) AS n_control_events,
       round(t_post - t_pre, 6) AS treated_delta,
       round(c_post - c_pre, 6) AS control_delta,
       round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate,
       round(sqrt(var_sum), 6) AS did_se,
       round(((t_post - t_pre) - (c_post - c_pre)) / sqrt(var_sum), 6)
         AS did_z
FROM w
"""


@query("q_diff_in_diff", oracle=DID_SQL)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    treated = (
        e.filter(
            (F.col("event_type") == "signup")
            & (F.to_date("ts") < F.lit(DID_SPLIT))
        )
        .select("user_id")
        .distinct()
        .withColumn("is_t", F.lit(1))
    )
    cells = (
        e.filter(F.col("value").isNotNull())
        .join(F.broadcast(treated), "user_id", "left")
        .select(
            F.coalesce("is_t", F.lit(0)).alias("is_treated"),
            (F.to_date("ts") >= F.lit(DID_SPLIT)).cast("int").alias("is_post"),
            F.col("value").cast("decimal(18,2)").alias("x"),
        )
    )
    m = cells.groupBy("is_treated", "is_post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(28,2)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,4)").alias("ssq"),
    )
    mean = F.col("s").cast("double") / F.col("n")

    def cell(t, p):
        return F.max(
            F.when((F.col("is_treated") == t) & (F.col("is_post") == p), mean)
        )

    cellvar = (
        (F.col("ssq").cast("double")
         - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"))
        / (F.col("n") - F.lit(1.0))
    ) / F.col("n")
    w = m.agg(
        cell(1, 0).alias("t_pre"), cell(1, 1).alias("t_post"),
        cell(0, 0).alias("c_pre"), cell(0, 1).alias("c_post"),
        F.sum(F.when(F.col("is_treated") == 1, F.col("n")).otherwise(0))
        .cast("bigint").alias("n_treated"),
        F.sum(F.when(F.col("is_treated") == 0, F.col("n")).otherwise(0))
        .cast("bigint").alias("n_control"),
        F.sum(cellvar).alias("var_sum"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (
        F.col("c_post") - F.col("c_pre")
    )
    return w.select(
        F.col("n_treated").alias("n_treated_events"),
        F.col("n_control").alias("n_control_events"),
        F.round(F.col("t_post") - F.col("t_pre"), 6).alias("treated_delta"),
        F.round(F.col("c_post") - F.col("c_pre"), 6).alias("control_delta"),
        F.round(did, 6).alias("did_estimate"),
        F.round(F.sqrt("var_sum"), 6).alias("did_se"),
        F.round(did / F.sqrt("var_sum"), 6).alias("did_z"),
    )


# -- q_neyman_allocation -----------------------------------------------
#
# Neyman optimal sample allocation (the survey-statistics answer to
# "we can afford to deeply audit 1000 orders — how many from each
# nation?"): allocate n_i ∝ N_i·σ_i, which minimizes the variance of
# the stratified mean at fixed budget; reported next to proportional
# allocation and the design-effect gain so the cost of ignoring
# per-stratum variance is a number. σ_i from exact decimal moments;
# the share terms round to DECIMAL(18,6) before the exact total (the
# mr_adamic_adar order-independence pattern); allocations round
# HALF-free via floor + largest-remainder is overkill here — the
# dashboard reports the real-valued allocation rounded to 2, the
# integerization being a presentation concern. Scale shape: one scan
# to the |nations| grid, broadcast totals.

NEYMAN_BUDGET = 1000

NEYMAN_SQL = f"""
WITH c AS (
  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x, c_nationkey
  FROM orders JOIN customer ON c_custkey = o_custkey
), per AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(x) AS DECIMAL(38,2)) AS s,
         CAST(SUM(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(19,2)))
              AS DECIMAL(38,4)) AS ssq
  FROM c GROUP BY 1
), sig AS (
  SELECT c_nationkey, n_i,
         sqrt((CAST(ssq AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_i) / n_i)
           AS sigma_i
  FROM per
), terms AS (
  SELECT c_nationkey, n_i, sigma_i,
         CAST(round(n_i * sigma_i, 6) AS DECIMAL(28,6)) AS w
  FROM sig
), tot AS (
  SELECT CAST(SUM(w) AS DECIMAL(28,6)) AS wt,
         CAST(SUM(n_i) AS BIGINT) AS nt
  FROM terms
)
SELECT n_name,
       n_i AS n_orders,
       round(sigma_i, 6) AS sigma,
       round({NEYMAN_BUDGET} * CAST(w AS DOUBLE) / CAST(wt AS DOUBLE), 2)
         AS neyman_n,
       round({NEYMAN_BUDGET} * n_i / CAST(nt AS DOUBLE), 2)
         AS proportional_n,
       round({NEYMAN_BUDGET} * CAST(w AS DOUBLE) / CAST(wt AS DOUBLE)
             - {NEYMAN_BUDGET} * n_i / CAST(nt AS DOUBLE), 2) AS delta_n
FROM terms CROSS JOIN tot
JOIN nation ON n_nationkey = c_nationkey
ORDER BY n_name
"""


@query("q_neyman_allocation", oracle=NEYMAN_SQL)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        "c_nationkey",
        F.col("o_totalprice").cast("decimal(19,2)").alias("x"),
    )
    per = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("x").cast("decimal(38,2)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,4)").alias("ssq"),
    )
    sigma = F.sqrt(
        (
            F.col("ssq").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n_i")
        )
        / F.col("n_i")
    )
    terms = per.select(
        "c_nationkey", "n_i",
        sigma.alias("sigma_i"),
        F.round(F.col("n_i") * sigma, 6).cast("decimal(28,6)").alias("w"),
    )
    tot = terms.agg(
        F.sum("w").cast("decimal(28,6)").alias("wt"),
        F.sum("n_i").cast("bigint").alias("nt"),
    )
    j = terms.join(F.broadcast(tot)).join(
        F.broadcast(cat.nation),
        F.col("n_nationkey") == F.col("c_nationkey"),
    )
    ney = NEYMAN_BUDGET * F.col("w").cast("double") / F.col("wt").cast("double")
    prop = NEYMAN_BUDGET * F.col("n_i") / F.col("nt").cast("double")
    return j.select(
        "n_name",
        F.col("n_i").alias("n_orders"),
        F.round("sigma_i", 6).alias("sigma"),
        F.round(ney, 2).alias("neyman_n"),
        F.round(prop, 2).alias("proportional_n"),
        F.round(ney - prop, 2).alias("delta_n"),
    ).orderBy("n_name")


# -- q_srm_check -------------------------------------------------------
#
# Sample-ratio-mismatch (SRM) gate: the first thing checked on ANY
# experiment readout — do the md5-parity assignment buckets actually
# hold the designed 50/50 user split? A significant χ²₁ here means
# the assignment or logging pipeline is broken and every downstream
# metric (q_ab_test, q_cuped, q_group_sequential) is invalid.
# Assignment = md5 nibble parity of user_id (the deterministic
# bucketing the A/B entries use); χ² = Σ(o−e)²/e over the 2 cells
# from exact integer counts, literal 3.841 critical value. One
# distinct-user scan → 2-row grid.

SRM_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
), a AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                   ::INT % 2 = 0
              THEN 'control' ELSE 'treatment' END AS arm
  FROM u
), m AS (
  SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treatment,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a
)
SELECT n_control, n_treatment, n AS n_users,
       round(n_control / CAST(n AS DOUBLE), 6) AS control_share,
       round((n_control - n / 2.0) * (n_control - n / 2.0) / (n / 2.0)
             + (n_treatment - n / 2.0) * (n_treatment - n / 2.0) / (n / 2.0),
             6) AS srm_chi2,
       CAST(CASE WHEN (n_control - n / 2.0) * (n_control - n / 2.0) / (n / 2.0)
                      + (n_treatment - n / 2.0) * (n_treatment - n / 2.0)
                        / (n / 2.0) > 3.841
            THEN 1 ELSE 0 END AS BIGINT) AS srm_detected
FROM m
"""


@query("q_srm_check", oracle=SRM_SQL)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    u = e.select("user_id").distinct()
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
        ).cast("int") % 2 == 0,
        "control",
    ).otherwise("treatment")
    m = u.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0))
        .cast("bigint").alias("n_treatment"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    nc, nt, n = F.col("n_control"), F.col("n_treatment"), F.col("n")
    half = n / 2.0
    chi2 = (nc - half) * (nc - half) / half + (nt - half) * (nt - half) / half
    return m.select(
        "n_control", "n_treatment", n.alias("n_users"),
        F.round(nc / n.cast("double"), 6).alias("control_share"),
        F.round(chi2, 6).alias("srm_chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).cast("bigint")
        .alias("srm_detected"),
    )


# -- q_abc_analysis ----------------------------------------------------
#
# ABC (Pareto) inventory classification of parts by revenue: A = the
# parts covering the first 80% of cumulative revenue, B = next 15%,
# C = the long tail — the warehouse-policy segmentation (count
# tolerance tightness, reorder automation) that q_decile_lift's
# customer cut is for parts. Exact decimal revenue sums; the
# cumulative share boundary is evaluated on the ranked part grid
# (deterministic (revenue DESC, partkey) order — the q_gini
# documented grid sort); per-class rollup with share-of-parts vs
# share-of-revenue showing the 80/20 concentration directly.

ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(21,4)) AS r
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(SUM(r) AS DECIMAL(30,4)) AS tr,
         CAST(COUNT(*) AS BIGINT) AS np
  FROM rev
), ranked AS (
  SELECT l_partkey, r,
         SUM(r) OVER (ORDER BY r DESC, l_partkey) AS cum
  FROM rev
), cls AS (
  SELECT l_partkey, r,
         CASE WHEN CAST(cum AS DOUBLE) / CAST(tr AS DOUBLE) <= 0.80 THEN 'A'
              WHEN CAST(cum AS DOUBLE) / CAST(tr AS DOUBLE) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked CROSS JOIN tot
)
SELECT abc AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(COUNT(*) / CAST(tot.np AS DOUBLE), 6) AS part_share,
       CAST(CAST(SUM(r) AS DECIMAL(30,4)) AS DOUBLE) AS class_revenue,
       round(CAST(CAST(SUM(r) AS DECIMAL(28,2)) AS DOUBLE)
             / CAST(tot.tr AS DOUBLE), 6) AS revenue_share
FROM cls CROSS JOIN tot
GROUP BY 1, tot.np, tot.tr
ORDER BY abc_class
"""


@query("q_abc_analysis", oracle=ABC_SQL)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        # scale 4 preserved: casting the scale-4 sum to (.,2) would
        # RE-ROUND half-cents, where Spark (HALF_UP) and DuckDB
        # (HALF_EVEN) disagree — keep sums exact, never re-scale down
        .cast("decimal(21,4)").alias("r")
    ).localCheckpoint(eager=True)  # totals + ranked grid both consume
    tot = rev.agg(
        F.sum("r").cast("decimal(30,4)").alias("tr"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    # |parts| scales with the data (20k rows crossed the old global
    # running-sum singleton at sf0.1): TWO-PHASE global cumsum over
    # -floor(r/4096) buckets aligned with the revenue DESC order —
    # decimal addition regrouped per bucket stays exact, so the
    # Pareto shares (and the oracle hash) are unchanged.
    ranked = two_phase_cumsum(
        rev, [F.desc("r"), F.asc("l_partkey")], F.col("r"),
        (-F.floor(F.col("r") / 4096)).cast("bigint"), out="cum",
    ).select("l_partkey", "r", "cum")
    share = F.col("cum").cast("double") / F.col("tr").cast("double")
    cls = ranked.join(F.broadcast(tot)).select(
        "r", "np", "tr",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
        .alias("abc"),
    )
    return (
        cls.groupBy("abc", "np", "tr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("decimal(30,4)").alias("cr"),
        )
        .select(
            F.col("abc").alias("abc_class"),
            "n_parts",
            F.round(F.col("n_parts") / F.col("np").cast("double"), 6)
            .alias("part_share"),
            F.col("cr").cast("double").alias("class_revenue"),
            F.round(
                F.col("cr").cast("double") / F.col("tr").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# -- q_covariate_balance -----------------------------------------------
#
# Covariate-balance audit of the md5-parity assignment (the
# randomization-quality companion of q_srm_check: equal COUNTS can
# still hide skewed COVARIATES): per pre-exposure covariate (event
# value, events-per-user, weekend share), the standardized mean
# difference SMD = (m_T − m_C)/√((s²_T + s²_C)/2) with the |SMD| <
# 0.1 balance convention — imbalance here means the arms differ
# before treatment and q_cuped-style adjustment is mandatory. All
# moments exact decimal/integer per arm; identical double SMD.

COVBAL_SQL = """
WITH per AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                   ::INT % 2 = 0 THEN 0 ELSE 1 END AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sv,
         CAST(SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
           AS wk
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), cov AS (
  SELECT arm, 'mean_event_value' AS covariate,
         CAST(sv AS DOUBLE) / n_events AS x
  FROM per
  UNION ALL
  SELECT arm, 'events_per_user', CAST(n_events AS DOUBLE) FROM per
  UNION ALL
  SELECT arm, 'weekend_share', wk / CAST(n_events AS DOUBLE) FROM per
), m AS (
  SELECT covariate, arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS s,
         SUM(CAST(round(x, 6) AS DECIMAL(19,6))
             * CAST(round(x, 6) AS DECIMAL(19,6))) AS ssq
  FROM cov GROUP BY 1, 2
), w AS (
  SELECT covariate,
         MAX(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END) AS mt,
         MAX(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS mc,
         MAX(CASE WHEN arm = 1 THEN
           (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
           / (n - 1.0) END) AS vt,
         MAX(CASE WHEN arm = 0 THEN
           (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
           / (n - 1.0) END) AS vc
  FROM m GROUP BY 1
)
SELECT covariate,
       round(mt, 6) AS mean_treatment,
       round(mc, 6) AS mean_control,
       round((mt - mc) / sqrt((vt + vc) / 2.0), 6) AS smd,
       CAST(CASE WHEN abs((mt - mc) / sqrt((vt + vc) / 2.0)) < 0.1
            THEN 1 ELSE 0 END AS BIGINT) AS balanced
FROM w
ORDER BY covariate
"""


@query("q_covariate_balance", oracle=COVBAL_SQL)
def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    iso = F.when(F.dayofweek("ts") == 1, F.lit(7)).otherwise(
        F.dayofweek("ts") - 1
    )
    per = e.filter(F.col("value").isNotNull()).groupBy(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
                16, 10,
            ).cast("int") % 2 != 0
        ).cast("int").alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(28,2)")
        .alias("sv"),
        F.sum(F.when(iso >= 6, 1).otherwise(0)).cast("bigint").alias("wk"),
    )
    cov = (
        per.select(
            "arm", F.lit("mean_event_value").alias("covariate"),
            (F.col("sv").cast("double") / F.col("n_events")).alias("x"),
        )
        .union(
            per.select(
                "arm", F.lit("events_per_user"),
                F.col("n_events").cast("double"),
            )
        )
        .union(
            per.select(
                "arm", F.lit("weekend_share"),
                F.col("wk") / F.col("n_events").cast("double"),
            )
        )
    )
    x6 = F.round("x", 6).cast("decimal(19,6)")
    m = cov.groupBy("covariate", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("x", 9).cast("decimal(28,9)")).alias("s"),
        F.sum(x6 * x6).alias("ssq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ssq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - F.lit(1.0))
    w = m.groupBy("covariate").agg(
        F.max(F.when(F.col("arm") == 1, mean)).alias("mt"),
        F.max(F.when(F.col("arm") == 0, mean)).alias("mc"),
        F.max(F.when(F.col("arm") == 1, var)).alias("vt"),
        F.max(F.when(F.col("arm") == 0, var)).alias("vc"),
    )
    smd = (F.col("mt") - F.col("mc")) / F.sqrt(
        (F.col("vt") + F.col("vc")) / 2.0
    )
    return w.select(
        "covariate",
        F.round("mt", 6).alias("mean_treatment"),
        F.round("mc", 6).alias("mean_control"),
        F.round(smd, 6).alias("smd"),
        F.when(F.abs(smd) < 0.1, 1).otherwise(0).cast("bigint")
        .alias("balanced"),
    ).orderBy("covariate")


# -- q_bcg_matrix ------------------------------------------------------
#
# Growth–share (BCG) classification of part brands: 1997 revenue
# share vs 1996→1997 growth, quadrants split at the median share and
# zero growth — star / cash-cow / question-mark / dog, the portfolio
# view that adds the GROWTH axis q_abc_analysis's concentration cut
# lacks. Exact decimal per-year revenue sums at native scale 4;
# median share is an exact order statistic on the 25-brand grid;
# growth and quadrant tests are identical double expressions with
# deterministic boundary handling (share > median ⇒ high).

BCG_SQL = """
WITH li AS (
  SELECT p_brand,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,4)) AS r96,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,4)) AS r97
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(r97) AS DECIMAL(30,4)) AS t97 FROM li
), sh AS (
  SELECT p_brand, r96, r97,
         CAST(r97 AS DOUBLE) / CAST(t97 AS DOUBLE) AS share
  FROM li CROSS JOIN tot
), medg AS (
  SELECT share AS med FROM (
    SELECT share, ROW_NUMBER() OVER (ORDER BY share, p_brand) AS rk,
           COUNT(*) OVER () AS nb
    FROM sh
  ) WHERE rk = CAST(ceil(0.5 * nb) AS BIGINT)
)
SELECT p_brand,
       round(CAST(r96 AS DOUBLE), 2) AS revenue_1996,
       round(CAST(r97 AS DOUBLE), 2) AS revenue_1997,
       round(share, 6) AS share_1997,
       round(CASE WHEN CAST(r96 AS DOUBLE) > 0
                  THEN (CAST(r97 AS DOUBLE) - CAST(r96 AS DOUBLE))
                       / CAST(r96 AS DOUBLE) END, 6) AS growth,
       CASE WHEN share > med AND CAST(r97 AS DOUBLE) > CAST(r96 AS DOUBLE)
              THEN 'star'
            WHEN share > med THEN 'cash_cow'
            WHEN CAST(r97 AS DOUBLE) > CAST(r96 AS DOUBLE)
              THEN 'question_mark'
            ELSE 'dog' END AS quadrant
FROM sh CROSS JOIN medg
ORDER BY p_brand
"""


@query("q_bcg_matrix", oracle=BCG_SQL)
def q_bcg_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    li = c.lineitem

    def year_rev(y):
        return F.sum(
            F.when(
                (F.col("l_shipdate") >= f"{y}-01-01")
                & (F.col("l_shipdate") < f"{y + 1}-01-01"),
                dec("l_extendedprice") * (1 - dec("l_discount")),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).cast("decimal(21,4)")

    rev = (
        li.join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand")
        .agg(year_rev(1996).alias("r96"), year_rev(1997).alias("r97"))
        .localCheckpoint(eager=True)  # totals, median, output all consume
    )
    tot = rev.agg(F.sum("r97").cast("decimal(30,4)").alias("t97"))
    sh = rev.join(F.broadcast(tot)).select(
        "p_brand", "r96", "r97",
        (F.col("r97").cast("double") / F.col("t97").cast("double"))
        .alias("share"),
    )
    rk = sh.select(
        "share",
        F.row_number().over(Window.orderBy("share", "p_brand")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    medg = rk.filter(
        F.col("rk") == F.ceil(0.5 * F.col("nb")).cast("bigint")
    ).select(F.col("share").alias("med"))
    j = sh.join(F.broadcast(medg))
    r96d, r97d = F.col("r96").cast("double"), F.col("r97").cast("double")
    grew = r97d > r96d
    high = F.col("share") > F.col("med")
    return j.select(
        "p_brand",
        F.round(r96d, 2).alias("revenue_1996"),
        F.round(r97d, 2).alias("revenue_1997"),
        F.round("share", 6).alias("share_1997"),
        F.when(r96d > 0, F.round((r97d - r96d) / r96d, 6)).alias("growth"),
        F.when(high & grew, "star")
        .when(high, "cash_cow")
        .when(grew, "question_mark")
        .otherwise("dog").alias("quadrant"),
    ).orderBy("p_brand")


# -- q_price_volume_mix ------------------------------------------------
#
# Price–volume revenue bridge per brand, 1996→1997 (the FP&A
# variance-analysis decomposition): Δrevenue = price effect
# (Δprice·qty₉₆) + volume effect (price₉₆·Δqty) + joint effect
# (Δprice·Δqty), where price = revenue/qty per brand-year — the
# "WHY did revenue move" breakdown behind every finance review.
# Per-year revenue (scale-4 exact) and quantity (exact integer-ish
# decimal) sums; effects are identical double chains and the
# identity price+volume+joint = Δrev holds exactly by construction.

PVM_SQL = """
WITH li AS (
  SELECT p_brand,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,4)) AS r96,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,4)) AS r97,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l_quantity AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,2)) AS q96,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                       THEN CAST(l_quantity AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(21,2)) AS q97
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT p_brand,
       round(CAST(r97 AS DOUBLE) - CAST(r96 AS DOUBLE), 2) AS delta_revenue,
       round((CAST(r97 AS DOUBLE) / CAST(q97 AS DOUBLE)
              - CAST(r96 AS DOUBLE) / CAST(q96 AS DOUBLE))
             * CAST(q96 AS DOUBLE), 2) AS price_effect,
       round(CAST(r96 AS DOUBLE) / CAST(q96 AS DOUBLE)
             * (CAST(q97 AS DOUBLE) - CAST(q96 AS DOUBLE)), 2)
         AS volume_effect,
       round((CAST(r97 AS DOUBLE) / CAST(q97 AS DOUBLE)
              - CAST(r96 AS DOUBLE) / CAST(q96 AS DOUBLE))
             * (CAST(q97 AS DOUBLE) - CAST(q96 AS DOUBLE)), 2)
         AS joint_effect
FROM li
WHERE CAST(q96 AS DOUBLE) > 0 AND CAST(q97 AS DOUBLE) > 0
ORDER BY p_brand
"""


@query("q_price_volume_mix", oracle=PVM_SQL)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)

    def year_sum(y, col_expr, out_type):
        return F.sum(
            F.when(
                (F.col("l_shipdate") >= f"{y}-01-01")
                & (F.col("l_shipdate") < f"{y + 1}-01-01"),
                col_expr,
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).cast(out_type)

    rev_expr = dec("l_extendedprice") * (1 - dec("l_discount"))
    li = (
        c.lineitem.join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            year_sum(1996, rev_expr, "decimal(21,4)").alias("r96"),
            year_sum(1997, rev_expr, "decimal(21,4)").alias("r97"),
            year_sum(1996, dec("l_quantity"), "decimal(21,2)").alias("q96"),
            year_sum(1997, dec("l_quantity"), "decimal(21,2)").alias("q97"),
        )
    )
    r96, r97 = F.col("r96").cast("double"), F.col("r97").cast("double")
    q96, q97 = F.col("q96").cast("double"), F.col("q97").cast("double")
    dp = r97 / q97 - r96 / q96
    dq = q97 - q96
    return (
        li.filter((q96 > 0) & (q97 > 0))
        .select(
            "p_brand",
            F.round(r97 - r96, 2).alias("delta_revenue"),
            F.round(dp * q96, 2).alias("price_effect"),
            F.round(r96 / q96 * dq, 2).alias("volume_effect"),
            F.round(dp * dq, 2).alias("joint_effect"),
        )
        .orderBy("p_brand")
    )


# -- q_rate_depth_decomposition ----------------------------------------
#
# Rate × depth decomposition of purchase revenue, pre vs post the
# Jan 16 split: Δ(revenue/user) = Δconversion·depth̄_pre +
# conv̄_pre·Δdepth + Δconv·Δdepth — is the move in revenue-per-user
# driven by MORE buyers (rate), BIGGER baskets (depth), or both —
# the first follow-up question to any topline movement. Per-period
# user counts, purchaser counts and purchase-value sums are exact;
# the three effects are identical double chains and sum exactly to
# the topline delta by construction.

RATE_DEPTH_SQL = """
WITH per AS (
  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN 0 ELSE 1 END AS period,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                  THEN user_id END) AS BIGINT) AS n_buyers,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2)) END)
              AS DECIMAL(28,2)) AS pv
  FROM events GROUP BY 1
), w AS (
  SELECT
    MAX(CASE WHEN period = 0 THEN n_buyers / CAST(n_users AS DOUBLE) END)
      AS conv0,
    MAX(CASE WHEN period = 1 THEN n_buyers / CAST(n_users AS DOUBLE) END)
      AS conv1,
    MAX(CASE WHEN period = 0 THEN CAST(pv AS DOUBLE) / n_buyers END)
      AS depth0,
    MAX(CASE WHEN period = 1 THEN CAST(pv AS DOUBLE) / n_buyers END)
      AS depth1
  FROM per
)
SELECT round(conv0, 6) AS conversion_pre,
       round(conv1, 6) AS conversion_post,
       round(depth0, 6) AS depth_pre,
       round(depth1, 6) AS depth_post,
       round(conv1 * depth1 - conv0 * depth0, 6) + 0.0 AS delta_rev_per_user,
       round((conv1 - conv0) * depth0, 6) + 0.0 AS rate_effect,
       round(conv0 * (depth1 - depth0), 6) + 0.0 AS depth_effect,
       round((conv1 - conv0) * (depth1 - depth0), 6) + 0.0 AS joint_effect
FROM w
"""


@query("q_rate_depth_decomposition", oracle=RATE_DEPTH_SQL)
def q_rate_depth_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    per = e.groupBy(
        (F.to_date("ts") >= F.lit("2024-01-16")).cast("int").alias("period")
    ).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).cast("bigint").alias("n_buyers"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            )
        ).cast("decimal(28,2)").alias("pv"),
    )
    conv = F.col("n_buyers") / F.col("n_users").cast("double")
    depth = F.col("pv").cast("double") / F.col("n_buyers")
    w = per.agg(
        F.max(F.when(F.col("period") == 0, conv)).alias("conv0"),
        F.max(F.when(F.col("period") == 1, conv)).alias("conv1"),
        F.max(F.when(F.col("period") == 0, depth)).alias("depth0"),
        F.max(F.when(F.col("period") == 1, depth)).alias("depth1"),
    )
    c0, c1 = F.col("conv0"), F.col("conv1")
    d0, d1 = F.col("depth0"), F.col("depth1")
    return w.select(
        F.round(c0, 6).alias("conversion_pre"),
        F.round(c1, 6).alias("conversion_post"),
        F.round(d0, 6).alias("depth_pre"),
        F.round(d1, 6).alias("depth_post"),
        # + 0.0 normalizes IEEE negative zero (round can emit -0.0 in
        # one engine and 0.0 in the other; -0.0 + 0.0 = +0.0 in both)
        (F.round(c1 * d1 - c0 * d0, 6) + 0.0).alias("delta_rev_per_user"),
        (F.round((c1 - c0) * d0, 6) + 0.0).alias("rate_effect"),
        (F.round(c0 * (d1 - d0), 6) + 0.0).alias("depth_effect"),
        (F.round((c1 - c0) * (d1 - d0), 6) + 0.0).alias("joint_effect"),
    )


# -- q_experiment_runtime ----------------------------------------------
#
# Experiment-runtime planner: for a 5%-of-mean lift on value per
# event type at α=0.05 / 80% power, the per-arm sample size
# n = 2(z_{α/2}+z_β)²σ²/δ² and the calendar days to collect it at
# the measured daily distinct-user rate (half per arm) — the
# go/no-go feasibility number produced BEFORE any experiment is
# approved (q_power_mde inverts it: effect at fixed n; this is n —
# and days — at fixed effect). Exact moments; z-sum inlined as the
# precomputed literal; identical double chain; one ceil at the end
# computed in both engines from the same doubles.

EXP_RUNTIME_Z = 2.8015852181129683  # z_{0.025} + z_{0.20}, precomputed

EXP_RUNTIME_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS x, user_id,
         CAST(ts AS DATE) AS day
  FROM events WHERE value IS NOT NULL
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(28,2)) AS s,
         CAST(SUM(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(17,2)))
              AS DECIMAL(38,4)) AS ssq
  FROM v GROUP BY 1
), traffic AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
         CAST(COUNT(DISTINCT day) AS BIGINT) AS days
  FROM v GROUP BY 1
)
SELECT m.event_type,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_value,
       round(sqrt((CAST(ssq AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n), 6)
         AS sigma,
       round(users / CAST(days AS DOUBLE) / 2.0, 6) AS daily_users_per_arm,
       CAST(ceil(2.0 * {EXP_RUNTIME_Z} * {EXP_RUNTIME_Z}
                 * ((CAST(ssq AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                 / ((0.05 * CAST(s AS DOUBLE) / n)
                    * (0.05 * CAST(s AS DOUBLE) / n))) AS BIGINT)
         AS n_per_arm,
       CAST(ceil(ceil(2.0 * {EXP_RUNTIME_Z} * {EXP_RUNTIME_Z}
                      * ((CAST(ssq AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                      / ((0.05 * CAST(s AS DOUBLE) / n)
                         * (0.05 * CAST(s AS DOUBLE) / n)))
                 / (users / CAST(days AS DOUBLE) / 2.0)) AS BIGINT)
         AS runtime_days
FROM m JOIN traffic ON traffic.event_type = m.event_type
ORDER BY m.event_type
"""


@query("q_experiment_runtime", oracle=EXP_RUNTIME_SQL)
def q_experiment_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("x"),
        "user_id",
        F.to_date("ts").alias("day"),
    )
    x19, x17 = F.col("x").cast("decimal(19,2)"), F.col("x").cast("decimal(17,2)")
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(28,2)").alias("s"),
        F.sum(x19 * x17).cast("decimal(38,4)").alias("ssq"),
    )
    traffic = v.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("users"),
        F.countDistinct("day").cast("bigint").alias("days"),
    )
    j = m.join(traffic, "event_type")
    n, sd = F.col("n"), F.col("s").cast("double")
    mu = sd / n
    var = (F.col("ssq").cast("double") - sd * sd / n) / n
    delta = 0.05 * mu
    z2 = EXP_RUNTIME_Z * EXP_RUNTIME_Z
    n_arm = F.ceil(2.0 * z2 * var / (delta * delta))
    rate = F.col("users") / F.col("days").cast("double") / 2.0
    return j.select(
        "event_type",
        F.round(mu, 6).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        F.round(rate, 6).alias("daily_users_per_arm"),
        n_arm.cast("bigint").alias("n_per_arm"),
        F.ceil(n_arm / rate).cast("bigint").alias("runtime_days"),
    ).orderBy("event_type")


# -- q_cem_att ---------------------------------------------------------
#
# Coarsened Exact Matching (Iacus-King-Porro) estimate of the ATT:
# units = customers, "treatment" = placed ≥1 URGENT-priority 1995
# order, outcome = 1996 revenue; covariates coarsen to market
# segment × exact account-balance quintile (ntile with custkey
# tie-break). Strata holding both arms survive; control rows carry
# the CEM weight (nT_s/nC_s)·(M_C/M_T) so the control distribution
# is reweighted onto the treated strata mix. Reports the matched ATT
# next to the naive unmatched difference — the whole point of
# matching is that gap. The MATCHING member of the causal family
# (q_diff_in_diff = trends, q_cuped = variance, q_ips_policy_eval =
# weighting by propensity). All counts exact; outcome sums exact
# DECIMAL(18,2); the weighted control fold rounds identical per-row
# doubles to DECIMAL(38,6). Scale: facts collapse to |customers|;
# the quintile window runs on that grid; strata joins are
# 25-row broadcasts.

CEM_SQL = """
WITH t95 AS (
  SELECT o_custkey, MAX(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS trt
  FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
  GROUP BY 1
), y96 AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
  GROUP BY 1
), units AS (
  SELECT c.c_custkey AS ck, c.c_mktsegment AS seg,
         NTILE(5) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS bq,
         COALESCE(t.trt, 0) AS trt,
         CAST(COALESCE(y.y, 0) AS DOUBLE) AS y
  FROM customer c
  LEFT JOIN t95 t ON t.o_custkey = c.c_custkey
  LEFT JOIN y96 y ON y.o_custkey = c.c_custkey
), strata AS (
  SELECT seg, bq,
         CAST(SUM(trt) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(trt) AS BIGINT) AS n_c
  FROM units GROUP BY 1, 2
), matched AS (
  SELECT seg, bq, n_t, n_c FROM strata WHERE n_t > 0 AND n_c > 0
), tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS m_t, CAST(SUM(n_c) AS BIGINT) AS m_c
  FROM matched
), wsum AS (
  SELECT
    CAST(SUM(CASE WHEN u.trt = 1
         THEN CAST(round(u.y, 6) AS DECIMAL(38,6)) END) AS DOUBLE) AS sy_t,
    CAST(SUM(CASE WHEN u.trt = 0 THEN
         CAST(round(u.y * ((CAST(m.n_t AS DOUBLE) / m.n_c)
                           * (CAST(t.m_c AS DOUBLE) / t.m_t)), 6)
              AS DECIMAL(38,6)) END) AS DOUBLE) AS swy_c,
    CAST(SUM(CASE WHEN u.trt = 0 THEN
         CAST(round((CAST(m.n_t AS DOUBLE) / m.n_c)
                    * (CAST(t.m_c AS DOUBLE) / t.m_t), 6)
              AS DECIMAL(38,6)) END) AS DOUBLE) AS sw_c,
    CAST(SUM(u.trt) AS BIGINT) AS n_t_m
  FROM units u
  JOIN matched m ON m.seg = u.seg AND m.bq = u.bq
  CROSS JOIN tot t
), naive AS (
  SELECT CAST(SUM(CASE WHEN trt = 1
           THEN CAST(round(y, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
           / SUM(trt) AS mu_t,
         CAST(SUM(CASE WHEN trt = 0
           THEN CAST(round(y, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
           / (COUNT(*) - SUM(trt)) AS mu_c
  FROM units
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM strata) AS n_strata,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_matched_strata,
       w.n_t_m AS n_treated,
       (SELECT m_c FROM tot) AS n_control,
       round(w.sy_t / w.n_t_m - w.swy_c / w.sw_c, 4) AS att,
       round(n.mu_t - n.mu_c, 4) AS naive_diff
FROM wsum w CROSS JOIN naive n
"""


@query("q_cem_att", oracle=CEM_SQL)
def q_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders
    od = F.to_date("o_orderdate")
    t95 = (
        orders.filter(
            (od >= F.lit("1995-01-01").cast("date"))
            & (od < F.lit("1996-01-01").cast("date"))
        )
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("trt")
        )
        .withColumnRenamed("o_custkey", "tck")
    )
    y96 = (
        orders.filter(
            (od >= F.lit("1996-01-01").cast("date"))
            & (od < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
        .withColumnRenamed("o_custkey", "yck")
    )
    # |customers| scales with the data (15k rows crossed the old
    # global-ntile singleton at sf0.1): TWO-PHASE global ntile on the
    # bounded acctbal domain (-1000..10000, /64 -> ~172 buckets).
    units = two_phase_ntile(
        cat.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(t95, F.col("tck") == F.col("c_custkey"), "left")
        .join(y96, F.col("yck") == F.col("c_custkey"), "left"),
        5, ["c_acctbal", "c_custkey"],
        F.floor(F.col("c_acctbal") / 64).cast("bigint"), out="bq",
    ).select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        "bq",
        F.coalesce("trt", F.lit(0)).alias("trt"),
        F.coalesce(F.col("y"), F.lit(0).cast("decimal(18,2)"))
        .cast("double").alias("y"),
    )
    units = units.cache()  # consumed by strata, the weighted fold AND naive
    strata = units.groupBy("seg", "bq").agg(
        F.sum("trt").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("trt")).cast("bigint").alias("n_c"),
    )
    strata = strata.cache()  # counted twice and joined back
    matched = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    tot = matched.agg(
        F.sum("n_t").cast("bigint").alias("m_t"),
        F.sum("n_c").cast("bigint").alias("m_c"),
    )
    n_strata = strata.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata")
    )
    n_matched = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_strata")
    )
    w_expr = (F.col("n_t").cast("double") / F.col("n_c")) * (
        F.col("m_c").cast("double") / F.col("m_t")
    )
    wsum = (
        units.join(
            F.broadcast(matched.select("seg", "bq", "n_t", "n_c")),
            ["seg", "bq"],
        )
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                F.when(
                    F.col("trt") == 1,
                    F.round("y", 6).cast("decimal(38,6)"),
                )
            ).cast("double").alias("sy_t"),
            F.sum(
                F.when(
                    F.col("trt") == 0,
                    F.round(F.col("y") * w_expr, 6).cast("decimal(38,6)"),
                )
            ).cast("double").alias("swy_c"),
            F.sum(
                F.when(
                    F.col("trt") == 0,
                    F.round(w_expr, 6).cast("decimal(38,6)"),
                )
            ).cast("double").alias("sw_c"),
            F.sum("trt").cast("bigint").alias("n_t_m"),
        )
    )
    naive = units.agg(
        (
            F.sum(
                F.when(F.col("trt") == 1, F.round("y", 6).cast("decimal(38,6)"))
            ).cast("double") / F.sum("trt")
        ).alias("mu_t"),
        (
            F.sum(
                F.when(F.col("trt") == 0, F.round("y", 6).cast("decimal(38,6)"))
            ).cast("double") / (F.count(F.lit(1)) - F.sum("trt"))
        ).alias("mu_c"),
    )
    return (
        wsum.join(F.broadcast(naive))
        .join(F.broadcast(n_strata))
        .join(F.broadcast(n_matched))
        .join(F.broadcast(tot.select("m_c")))
        .select(
            "n_strata", "n_matched_strata",
            F.col("n_t_m").alias("n_treated"),
            F.col("m_c").alias("n_control"),
            F.round(
                F.col("sy_t") / F.col("n_t_m")
                - F.col("swy_c") / F.col("sw_c"), 4
            ).alias("att"),
            F.round(F.col("mu_t") - F.col("mu_c"), 4).alias("naive_diff"),
        )
    )
