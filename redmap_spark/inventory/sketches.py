"""SURVEY §2.A sketch-refined entries that produce EXACT answers.

q_heavy_hitters lives here (not analytic.py) so it registers inside
the driver's 50-entry CORRECTNESS window: since the freqItems sketch
pass returns a guaranteed superset and the refinement pass is exact,
the final output equals the plain GROUP BY heavy-hitter query and is
therefore fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

HEAVY_HITTERS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY user_id
HAVING COUNT(*) > 0.002 * (SELECT COUNT(*) FROM events)
"""


@query("q_heavy_hitters", oracle=HEAVY_HITTERS_SQL)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item sketch over event users (Karp-Shenker-Papadimitriou
    via DataFrame.stat.freqItems): one pass, fixed memory, returns a
    SUPERSET of all items with frequency > support — the streaming-
    friendly way to find hot keys (e.g. to pick salting targets)
    without a full groupBy.

    Refinement is a SINGLE second scan of events: candidates live in a
    broadcast DataFrame (not a codegen `isin` literal), every event is
    bucketed into its candidate user or a single null catch-all group by
    a broadcast left join + partial agg, and the support threshold's
    total count falls out of an unpartitioned window SUM over that tiny
    (n_candidates + 1 row) aggregate — no separate `events.count()`
    pass. Two fact scans total (sketch + refine), the KSP lower bound
    for an exact answer — which is why this is oracle-checkable against
    the plain one-shuffle GROUP BY."""
    c = Catalog(spark, sf_dir)
    support = 0.002
    cand = c.events.stat.freqItems(["user_id"], support).collect()[0][0]
    cand_df = spark.createDataFrame(
        [(int(x),) for x in cand], "user_id bigint"
    ).withColumn("_is_cand", F.lit(True))
    bucketed = (
        c.events.join(F.broadcast(cand_df), "user_id", "left")
        .groupBy(
            F.when(F.col("_is_cand"), F.col("user_id")).alias("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        bucketed.withColumn(
            "_total", F.sum("n").over(Window.partitionBy(F.lit(1)))
        )
        .filter(F.col("user_id").isNotNull() & (F.col("n") > support * F.col("_total")))
        .select("user_id", "n")
    )


@query("q_hll_rollup")  # approximate: verified by error-bound pytest
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pattern that makes COUNT(DISTINCT)
    affordable at 100 TB: the fact table is scanned ONCE into per-day
    HLL user sketches (DataSketches binary blobs, ~KBs per day); every
    coarser grain — week here, month / all-time identically — is a
    pure sketch merge (`hll_union_agg`) over the tiny sketch table,
    never a fact re-scan. Distinct-merge is exactly the operation
    plain distinct counts cannot do (uniques don't add); sketches make
    the rollup associative, so partial aggregation and AQE apply as if
    it were a SUM. lgConfigK=12 → ~2.5% relative standard error."""
    e = Catalog(spark, sf_dir).events
    day_sketches = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    return (
        day_sketches.groupBy(
            F.date_format(F.date_trunc("week", F.to_date("day")), "yyyy-MM-dd").alias("week")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
