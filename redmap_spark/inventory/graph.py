"""SURVEY §2.B additions (round 5, fourth session) — graph analytics
beyond PageRank / connected components: degree-oriented triangle
counting (oracle-verified).

Graph: parts co-purchased within the same order during the dataset's
first half-year (a fixed query predicate — co-purchase graphs densify
over unbounded windows, so a real deployment counts triangles per
time slice). Edges are canonical (u < v) distinct pairs; counting
uses the standard degree-orientation trick (orient every edge from
its lower-(degree, key) endpoint), which bounds out-degree by
O(sqrt(m)) and wedge generation by Σ out_deg² — the scalable
distributed triangle algorithm, never an all-pairs pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

TRI_SQL = """
WITH li AS (
  SELECT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs) e
  GROUP BY 1
), oe AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN v ELSE u END AS t
  FROM pairs
  JOIN deg du ON du.node = u
  JOIN deg dv ON dv.node = v
), wedges AS (
  SELECT e1.t AS x, e2.t AS y
  FROM oe e1 JOIN oe e2 ON e1.s = e2.s AND e1.t < e2.t
)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM wedges w
             JOIN pairs ON pairs.u = w.x AND pairs.v = w.y) AS BIGINT)
         AS n_triangles
"""


@query("mr_triangles", oracle=TRI_SQL)
def mr_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        Catalog(spark, sf_dir)
        .lineitem.filter(F.col("l_shipdate") < "1995-07-01")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    )
    a, b = li.alias("a"), li.alias("b")
    # The edge table is orders smaller than the fact pass that builds
    # it (|E| ≤ Σ per-order basket², deduped) — coalesce the cache so
    # the graph passes below don't inherit the fact shuffle's task
    # count, and materialize eagerly: five consumers read it (degrees,
    # both orientation lookups, the wedge-closure probe, the edge
    # count). At cluster scale this is the written edge table.
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .coalesce(8)
        .cache()
    )
    pairs.count()
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # node count is bounded by the part dim (repo-wide a broadcast
    # table), so the degree lookups broadcast like any dim join
    low_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    oe = (
        pairs.join(F.broadcast(deg.alias("du")), F.col("du.node") == F.col("u"))
        .join(F.broadcast(deg.alias("dv")), F.col("dv.node") == F.col("v"))
        .select(
            F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .cache()
    )
    oe.count()  # eager: both wedge-join sides read it concurrently
    e1, e2 = oe.alias("e1"), oe.alias("e2")
    wedges = e1.join(
        e2, (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t"))
    ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
    tri = wedges.join(
        pairs, (F.col("u") == F.col("x")) & (F.col("v") == F.col("y"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )
