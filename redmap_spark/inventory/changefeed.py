"""SURVEY §2.A/§2.H additions — change-data-capture shapes a warehouse
pipeline needs around its fact/dim tables: SCD Type-2 dimension build
from a change log, snapshot-diff change feed, and a mergeable
fixed-bin quantile sketch rollup. All oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- q_scd2_intervals --------------------------------------------------
#
# SCD Type-2 dimension build: collapse each user's event_type change
# log into validity intervals [valid_from, valid_to) with a current
# flag — the standard way a warehouse keeps dimension history. Scale
# shape: ONE shuffle by user_id; both windows (lag for change
# detection, lead for interval close) share that partitioning, so
# Catalyst plans a single Exchange + one sort. Output is proportional
# to the number of state CHANGES, not events. Timestamps are emitted
# as epoch micros (engine-neutral, no format ambiguity).

SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state,
       epoch_us(ts) AS valid_from_us,
       epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS valid_to_us,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM changes
"""


@query("q_scd2_intervals", oracle=SCD2_SQL)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id",
                 F.lag("event_type").over(w).alias("prev"))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# -- q_change_feed -----------------------------------------------------
#
# Snapshot-diff CDC: given two states of the orders table (here two
# date-bounded views standing in for consecutive snapshot versions),
# emit the change feed — INSERT / DELETE / UPDATE_PRE+UPDATE_POST
# rows keyed on o_orderkey, the exact format a downstream MERGE or
# streaming sink consumes. Scale shape: one equi-join shuffle on the
# snapshot key; change classification is per-row column comparison
# (codegen, no extra pass). At 100 TB the two sides are snapshot
# manifests of the same table, so the join is co-partitioned by
# layout and plans with zero extra Exchange.

CHANGE_FEED_SQL = """
WITH prev AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01'
), next AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1999-01-01'
    AND NOT (o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1996-01-01')
)
SELECT COALESCE(p.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN p.o_orderkey IS NULL THEN 'INSERT'
            WHEN n.o_orderkey IS NULL THEN 'DELETE'
            ELSE 'UPDATE' END AS op,
       p.o_orderstatus AS status_before, n.o_orderstatus AS status_after,
       p.o_totalprice  AS price_before,  n.o_totalprice  AS price_after
FROM prev p FULL OUTER JOIN next n ON p.o_orderkey = n.o_orderkey
WHERE p.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR p.o_orderstatus <> n.o_orderstatus OR p.o_totalprice <> n.o_totalprice
"""


@query("q_change_feed", oracle=CHANGE_FEED_SQL)
def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    prev = o.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    nxt = (
        o.filter(
            (F.col("o_orderdate") < "1999-01-01")
            & ~((F.col("o_orderstatus") == "F") & (F.col("o_orderdate") < "1996-01-01"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "P", "F")
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    p, n = prev.alias("p"), nxt.alias("n")
    joined = p.join(n, F.col("p.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    pk, nk = F.col("p.o_orderkey"), F.col("n.o_orderkey")
    changed = (
        pk.isNull() | nk.isNull()
        | (F.col("p.o_orderstatus") != F.col("n.o_orderstatus"))
        | (F.col("p.o_totalprice") != F.col("n.o_totalprice"))
    )
    return joined.filter(changed).select(
        F.coalesce(pk, nk).alias("o_orderkey"),
        F.when(pk.isNull(), "INSERT")
        .when(nk.isNull(), "DELETE")
        .otherwise("UPDATE")
        .alias("op"),
        F.col("p.o_orderstatus").alias("status_before"),
        F.col("n.o_orderstatus").alias("status_after"),
        F.col("p.o_totalprice").alias("price_before"),
        F.col("n.o_totalprice").alias("price_after"),
    )


# -- q_quantile_bins ---------------------------------------------------
#
# Mergeable quantile sketch as a fixed-width histogram rollup: bin
# event values (width 0.5, ~1200 bins over the observed range), take
# per-(type, bin) counts — the partial state, mergeable by addition
# across partitions/days/snapshots — then read p50/p90/p99 off the
# cumulative distribution. Unlike percentile_approx this partial is
# PERSISTABLE (a tiny bin-count table per ingest batch) and re-mergeable
# forever, which is how a 100 TB pipeline serves quantiles without
# rescanning facts. Error is bounded by bin width; the estimate is the
# bin's inclusive upper edge, deterministic on both engines.

QUANTILE_BINS_SQL = """
WITH bins AS (
  SELECT event_type, CAST(floor(value / 0.5) AS BIGINT) AS bin, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, bin, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER (PARTITION BY event_type) AS total_n
  FROM bins
)
SELECT event_type,
       MIN(CASE WHEN cum_n >= 0.50 * total_n THEN (bin + 1) * 0.5 END) AS p50_est,
       MIN(CASE WHEN cum_n >= 0.90 * total_n THEN (bin + 1) * 0.5 END) AS p90_est,
       MIN(CASE WHEN cum_n >= 0.99 * total_n THEN (bin + 1) * 0.5 END) AS p99_est,
       CAST(MAX(total_n) AS BIGINT) AS n
FROM cum GROUP BY event_type
"""


@query("q_quantile_bins", oracle=QUANTILE_BINS_SQL)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    bins = e.groupBy(
        "event_type", F.floor(F.col("value") / 0.5).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("event_type")
    cum = bins.select(
        "event_type", "bin", "n",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(wt).alias("total_n"),
    )
    edge = (F.col("bin") + 1) * 0.5

    def pick(q: float):
        return F.min(F.when(F.col("cum_n") >= q * F.col("total_n"), edge))

    return cum.groupBy("event_type").agg(
        pick(0.50).alias("p50_est"),
        pick(0.90).alias("p90_est"),
        pick(0.99).alias("p99_est"),
        F.max("total_n").cast("long").alias("n"),
    )


# -- q_sliding_window --------------------------------------------------
#
# Sliding-window aggregation (7-day window, 1-day slide) via the
# native F.window slide form — each event feeds exactly 7 windows,
# which Spark plans as a 7-row generate + ONE partial-aggregated
# shuffle of the (window, partial) pairs, identical to the streaming
# plan for the same query. The oracle replays the same expansion with
# generate_series. Trailing/leading partial windows are kept (they
# are how a live dashboard sees the edges).

SLIDING_SQL = """
WITH expanded AS (
  SELECT CAST(unnest(generate_series(
           CAST(date_trunc('day', ts) AS DATE) - INTERVAL 6 DAY,
           CAST(date_trunc('day', ts) AS DATE),
           INTERVAL 1 DAY)) AS DATE) AS w_start,
         value
  FROM events
)
SELECT strftime(w_start, '%Y-%m-%d') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM expanded GROUP BY 1
"""


@query("q_sliding_window", oracle=SLIDING_SQL)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )
