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
    from redmap_spark.operators.analytics import copurchase_pairs, triangle_stats

    li = (
        Catalog(spark, sf_dir)
        .lineitem.filter(F.col("l_shipdate") < "1995-07-01")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    )
    return triangle_stats(copurchase_pairs(li))
