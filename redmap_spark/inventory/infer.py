"""SURVEY §2 additions (round 6, ninth session) — resampling and
ratio-metric inference for experimentation: md5-deterministic
permutation testing, leave-one-group-out jackknife, the delta-method
ratio-metric CI, and TOST equivalence testing.

These four close the inference gaps around q_ab_test/q_bootstrap_ci:
permutation gives the assumption-free p-value, jackknife the
group-robust SE, delta method the correct SE for RATIO metrics
(revenue per order — the metric naive z-tests get wrong), and TOST
answers "are they the SAME?", which a non-significant difference
test never does. All randomness is md5-derived (the q_hash_sample
rule), so every resample is cross-engine reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query, spread

# -- q_permutation_test ------------------------------------------------
#
# Permutation test of the md5-parity A/B split's mean-order-total
# difference: 50 null reassignments, bit b taken from the PARITY OF
# HEX CHARACTER b across two md5 digests per order (64 independent
# bits from 2 hashes) — deterministic, engine-portable "randomness"
# (the q_hash_sample rule), so the null distribution is
# bit-identical everywhere. All 50 diffs come from ONE single-scan
# 100-column conditional aggregation (no row expansion — at 100 TB
# a 50× explode would be a 5 PB map stage; this is the same scan as
# the observed diff), then a stack() to the 50-row grid;
# p = (1 + #{|d_b| ≥ |d_obs|})/(B+1) compares 9-rounded diffs.
# Scale: one scan → 50-row grid → 1 row.

PERM_SQL = """
WITH base AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS h1,
         md5(CAST(o_orderkey AS VARCHAR) || '#2') AS h2,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp
  FROM orders
), obs AS (
  SELECT round(
           CAST(SUM(CASE WHEN grp = 0 THEN x END) AS DOUBLE)
             / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
           - CAST(SUM(CASE WHEN grp = 1 THEN x END) AS DOUBLE)
             / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END), 9) AS d_obs
  FROM base
), wide AS (
  SELECT CAST(SUM(x) AS DOUBLE) AS st,
         CAST(COUNT(*) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN substr(h1, 1, 1) < '8' THEN x END) AS DOUBLE) AS sa0,
         CAST(SUM(CASE WHEN substr(h1, 1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na0,
         CAST(SUM(CASE WHEN substr(h1, 2, 1) < '8' THEN x END) AS DOUBLE) AS sa1,
         CAST(SUM(CASE WHEN substr(h1, 2, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na1,
         CAST(SUM(CASE WHEN substr(h1, 3, 1) < '8' THEN x END) AS DOUBLE) AS sa2,
         CAST(SUM(CASE WHEN substr(h1, 3, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na2,
         CAST(SUM(CASE WHEN substr(h1, 4, 1) < '8' THEN x END) AS DOUBLE) AS sa3,
         CAST(SUM(CASE WHEN substr(h1, 4, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na3,
         CAST(SUM(CASE WHEN substr(h1, 5, 1) < '8' THEN x END) AS DOUBLE) AS sa4,
         CAST(SUM(CASE WHEN substr(h1, 5, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na4,
         CAST(SUM(CASE WHEN substr(h1, 6, 1) < '8' THEN x END) AS DOUBLE) AS sa5,
         CAST(SUM(CASE WHEN substr(h1, 6, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na5,
         CAST(SUM(CASE WHEN substr(h1, 7, 1) < '8' THEN x END) AS DOUBLE) AS sa6,
         CAST(SUM(CASE WHEN substr(h1, 7, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na6,
         CAST(SUM(CASE WHEN substr(h1, 8, 1) < '8' THEN x END) AS DOUBLE) AS sa7,
         CAST(SUM(CASE WHEN substr(h1, 8, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na7,
         CAST(SUM(CASE WHEN substr(h1, 9, 1) < '8' THEN x END) AS DOUBLE) AS sa8,
         CAST(SUM(CASE WHEN substr(h1, 9, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na8,
         CAST(SUM(CASE WHEN substr(h1, 10, 1) < '8' THEN x END) AS DOUBLE) AS sa9,
         CAST(SUM(CASE WHEN substr(h1, 10, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na9,
         CAST(SUM(CASE WHEN substr(h1, 11, 1) < '8' THEN x END) AS DOUBLE) AS sa10,
         CAST(SUM(CASE WHEN substr(h1, 11, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na10,
         CAST(SUM(CASE WHEN substr(h1, 12, 1) < '8' THEN x END) AS DOUBLE) AS sa11,
         CAST(SUM(CASE WHEN substr(h1, 12, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na11,
         CAST(SUM(CASE WHEN substr(h1, 13, 1) < '8' THEN x END) AS DOUBLE) AS sa12,
         CAST(SUM(CASE WHEN substr(h1, 13, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na12,
         CAST(SUM(CASE WHEN substr(h1, 14, 1) < '8' THEN x END) AS DOUBLE) AS sa13,
         CAST(SUM(CASE WHEN substr(h1, 14, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na13,
         CAST(SUM(CASE WHEN substr(h1, 15, 1) < '8' THEN x END) AS DOUBLE) AS sa14,
         CAST(SUM(CASE WHEN substr(h1, 15, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na14,
         CAST(SUM(CASE WHEN substr(h1, 16, 1) < '8' THEN x END) AS DOUBLE) AS sa15,
         CAST(SUM(CASE WHEN substr(h1, 16, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na15,
         CAST(SUM(CASE WHEN substr(h1, 17, 1) < '8' THEN x END) AS DOUBLE) AS sa16,
         CAST(SUM(CASE WHEN substr(h1, 17, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na16,
         CAST(SUM(CASE WHEN substr(h1, 18, 1) < '8' THEN x END) AS DOUBLE) AS sa17,
         CAST(SUM(CASE WHEN substr(h1, 18, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na17,
         CAST(SUM(CASE WHEN substr(h1, 19, 1) < '8' THEN x END) AS DOUBLE) AS sa18,
         CAST(SUM(CASE WHEN substr(h1, 19, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na18,
         CAST(SUM(CASE WHEN substr(h1, 20, 1) < '8' THEN x END) AS DOUBLE) AS sa19,
         CAST(SUM(CASE WHEN substr(h1, 20, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na19,
         CAST(SUM(CASE WHEN substr(h1, 21, 1) < '8' THEN x END) AS DOUBLE) AS sa20,
         CAST(SUM(CASE WHEN substr(h1, 21, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na20,
         CAST(SUM(CASE WHEN substr(h1, 22, 1) < '8' THEN x END) AS DOUBLE) AS sa21,
         CAST(SUM(CASE WHEN substr(h1, 22, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na21,
         CAST(SUM(CASE WHEN substr(h1, 23, 1) < '8' THEN x END) AS DOUBLE) AS sa22,
         CAST(SUM(CASE WHEN substr(h1, 23, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na22,
         CAST(SUM(CASE WHEN substr(h1, 24, 1) < '8' THEN x END) AS DOUBLE) AS sa23,
         CAST(SUM(CASE WHEN substr(h1, 24, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na23,
         CAST(SUM(CASE WHEN substr(h1, 25, 1) < '8' THEN x END) AS DOUBLE) AS sa24,
         CAST(SUM(CASE WHEN substr(h1, 25, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na24,
         CAST(SUM(CASE WHEN substr(h1, 26, 1) < '8' THEN x END) AS DOUBLE) AS sa25,
         CAST(SUM(CASE WHEN substr(h1, 26, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na25,
         CAST(SUM(CASE WHEN substr(h1, 27, 1) < '8' THEN x END) AS DOUBLE) AS sa26,
         CAST(SUM(CASE WHEN substr(h1, 27, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na26,
         CAST(SUM(CASE WHEN substr(h1, 28, 1) < '8' THEN x END) AS DOUBLE) AS sa27,
         CAST(SUM(CASE WHEN substr(h1, 28, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na27,
         CAST(SUM(CASE WHEN substr(h1, 29, 1) < '8' THEN x END) AS DOUBLE) AS sa28,
         CAST(SUM(CASE WHEN substr(h1, 29, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na28,
         CAST(SUM(CASE WHEN substr(h1, 30, 1) < '8' THEN x END) AS DOUBLE) AS sa29,
         CAST(SUM(CASE WHEN substr(h1, 30, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na29,
         CAST(SUM(CASE WHEN substr(h1, 31, 1) < '8' THEN x END) AS DOUBLE) AS sa30,
         CAST(SUM(CASE WHEN substr(h1, 31, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na30,
         CAST(SUM(CASE WHEN substr(h1, 32, 1) < '8' THEN x END) AS DOUBLE) AS sa31,
         CAST(SUM(CASE WHEN substr(h1, 32, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na31,
         CAST(SUM(CASE WHEN substr(h2, 1, 1) < '8' THEN x END) AS DOUBLE) AS sa32,
         CAST(SUM(CASE WHEN substr(h2, 1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na32,
         CAST(SUM(CASE WHEN substr(h2, 2, 1) < '8' THEN x END) AS DOUBLE) AS sa33,
         CAST(SUM(CASE WHEN substr(h2, 2, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na33,
         CAST(SUM(CASE WHEN substr(h2, 3, 1) < '8' THEN x END) AS DOUBLE) AS sa34,
         CAST(SUM(CASE WHEN substr(h2, 3, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na34,
         CAST(SUM(CASE WHEN substr(h2, 4, 1) < '8' THEN x END) AS DOUBLE) AS sa35,
         CAST(SUM(CASE WHEN substr(h2, 4, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na35,
         CAST(SUM(CASE WHEN substr(h2, 5, 1) < '8' THEN x END) AS DOUBLE) AS sa36,
         CAST(SUM(CASE WHEN substr(h2, 5, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na36,
         CAST(SUM(CASE WHEN substr(h2, 6, 1) < '8' THEN x END) AS DOUBLE) AS sa37,
         CAST(SUM(CASE WHEN substr(h2, 6, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na37,
         CAST(SUM(CASE WHEN substr(h2, 7, 1) < '8' THEN x END) AS DOUBLE) AS sa38,
         CAST(SUM(CASE WHEN substr(h2, 7, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na38,
         CAST(SUM(CASE WHEN substr(h2, 8, 1) < '8' THEN x END) AS DOUBLE) AS sa39,
         CAST(SUM(CASE WHEN substr(h2, 8, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na39,
         CAST(SUM(CASE WHEN substr(h2, 9, 1) < '8' THEN x END) AS DOUBLE) AS sa40,
         CAST(SUM(CASE WHEN substr(h2, 9, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na40,
         CAST(SUM(CASE WHEN substr(h2, 10, 1) < '8' THEN x END) AS DOUBLE) AS sa41,
         CAST(SUM(CASE WHEN substr(h2, 10, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na41,
         CAST(SUM(CASE WHEN substr(h2, 11, 1) < '8' THEN x END) AS DOUBLE) AS sa42,
         CAST(SUM(CASE WHEN substr(h2, 11, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na42,
         CAST(SUM(CASE WHEN substr(h2, 12, 1) < '8' THEN x END) AS DOUBLE) AS sa43,
         CAST(SUM(CASE WHEN substr(h2, 12, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na43,
         CAST(SUM(CASE WHEN substr(h2, 13, 1) < '8' THEN x END) AS DOUBLE) AS sa44,
         CAST(SUM(CASE WHEN substr(h2, 13, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na44,
         CAST(SUM(CASE WHEN substr(h2, 14, 1) < '8' THEN x END) AS DOUBLE) AS sa45,
         CAST(SUM(CASE WHEN substr(h2, 14, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na45,
         CAST(SUM(CASE WHEN substr(h2, 15, 1) < '8' THEN x END) AS DOUBLE) AS sa46,
         CAST(SUM(CASE WHEN substr(h2, 15, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na46,
         CAST(SUM(CASE WHEN substr(h2, 16, 1) < '8' THEN x END) AS DOUBLE) AS sa47,
         CAST(SUM(CASE WHEN substr(h2, 16, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na47,
         CAST(SUM(CASE WHEN substr(h2, 17, 1) < '8' THEN x END) AS DOUBLE) AS sa48,
         CAST(SUM(CASE WHEN substr(h2, 17, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na48,
         CAST(SUM(CASE WHEN substr(h2, 18, 1) < '8' THEN x END) AS DOUBLE) AS sa49,
         CAST(SUM(CASE WHEN substr(h2, 18, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS na49
  FROM base
), stacked AS (
  SELECT 0 AS b, sa0 AS sa, na0 AS na FROM wide
  UNION ALL SELECT 1 AS b, sa1 AS sa, na1 AS na FROM wide
  UNION ALL SELECT 2 AS b, sa2 AS sa, na2 AS na FROM wide
  UNION ALL SELECT 3 AS b, sa3 AS sa, na3 AS na FROM wide
  UNION ALL SELECT 4 AS b, sa4 AS sa, na4 AS na FROM wide
  UNION ALL SELECT 5 AS b, sa5 AS sa, na5 AS na FROM wide
  UNION ALL SELECT 6 AS b, sa6 AS sa, na6 AS na FROM wide
  UNION ALL SELECT 7 AS b, sa7 AS sa, na7 AS na FROM wide
  UNION ALL SELECT 8 AS b, sa8 AS sa, na8 AS na FROM wide
  UNION ALL SELECT 9 AS b, sa9 AS sa, na9 AS na FROM wide
  UNION ALL SELECT 10 AS b, sa10 AS sa, na10 AS na FROM wide
  UNION ALL SELECT 11 AS b, sa11 AS sa, na11 AS na FROM wide
  UNION ALL SELECT 12 AS b, sa12 AS sa, na12 AS na FROM wide
  UNION ALL SELECT 13 AS b, sa13 AS sa, na13 AS na FROM wide
  UNION ALL SELECT 14 AS b, sa14 AS sa, na14 AS na FROM wide
  UNION ALL SELECT 15 AS b, sa15 AS sa, na15 AS na FROM wide
  UNION ALL SELECT 16 AS b, sa16 AS sa, na16 AS na FROM wide
  UNION ALL SELECT 17 AS b, sa17 AS sa, na17 AS na FROM wide
  UNION ALL SELECT 18 AS b, sa18 AS sa, na18 AS na FROM wide
  UNION ALL SELECT 19 AS b, sa19 AS sa, na19 AS na FROM wide
  UNION ALL SELECT 20 AS b, sa20 AS sa, na20 AS na FROM wide
  UNION ALL SELECT 21 AS b, sa21 AS sa, na21 AS na FROM wide
  UNION ALL SELECT 22 AS b, sa22 AS sa, na22 AS na FROM wide
  UNION ALL SELECT 23 AS b, sa23 AS sa, na23 AS na FROM wide
  UNION ALL SELECT 24 AS b, sa24 AS sa, na24 AS na FROM wide
  UNION ALL SELECT 25 AS b, sa25 AS sa, na25 AS na FROM wide
  UNION ALL SELECT 26 AS b, sa26 AS sa, na26 AS na FROM wide
  UNION ALL SELECT 27 AS b, sa27 AS sa, na27 AS na FROM wide
  UNION ALL SELECT 28 AS b, sa28 AS sa, na28 AS na FROM wide
  UNION ALL SELECT 29 AS b, sa29 AS sa, na29 AS na FROM wide
  UNION ALL SELECT 30 AS b, sa30 AS sa, na30 AS na FROM wide
  UNION ALL SELECT 31 AS b, sa31 AS sa, na31 AS na FROM wide
  UNION ALL SELECT 32 AS b, sa32 AS sa, na32 AS na FROM wide
  UNION ALL SELECT 33 AS b, sa33 AS sa, na33 AS na FROM wide
  UNION ALL SELECT 34 AS b, sa34 AS sa, na34 AS na FROM wide
  UNION ALL SELECT 35 AS b, sa35 AS sa, na35 AS na FROM wide
  UNION ALL SELECT 36 AS b, sa36 AS sa, na36 AS na FROM wide
  UNION ALL SELECT 37 AS b, sa37 AS sa, na37 AS na FROM wide
  UNION ALL SELECT 38 AS b, sa38 AS sa, na38 AS na FROM wide
  UNION ALL SELECT 39 AS b, sa39 AS sa, na39 AS na FROM wide
  UNION ALL SELECT 40 AS b, sa40 AS sa, na40 AS na FROM wide
  UNION ALL SELECT 41 AS b, sa41 AS sa, na41 AS na FROM wide
  UNION ALL SELECT 42 AS b, sa42 AS sa, na42 AS na FROM wide
  UNION ALL SELECT 43 AS b, sa43 AS sa, na43 AS na FROM wide
  UNION ALL SELECT 44 AS b, sa44 AS sa, na44 AS na FROM wide
  UNION ALL SELECT 45 AS b, sa45 AS sa, na45 AS na FROM wide
  UNION ALL SELECT 46 AS b, sa46 AS sa, na46 AS na FROM wide
  UNION ALL SELECT 47 AS b, sa47 AS sa, na47 AS na FROM wide
  UNION ALL SELECT 48 AS b, sa48 AS sa, na48 AS na FROM wide
  UNION ALL SELECT 49 AS b, sa49 AS sa, na49 AS na FROM wide
), perms AS (
  SELECT s.b,
         round(s.sa / s.na - (w.st - s.sa) / (w.nt - s.na), 9) AS d_b
  FROM stacked s CROSS JOIN wide w
  WHERE s.na > 0 AND w.nt - s.na > 0
)
SELECT round(o.d_obs, 6) AS diff_observed,
       CAST(COUNT(*) AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       round((1.0 + SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs)
                             THEN 1 ELSE 0 END)) / (COUNT(*) + 1.0), 6)
         AS p_value
FROM perms p CROSS JOIN obs o
GROUP BY o.d_obs
"""


@query("q_permutation_test", oracle=PERM_SQL)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    base = o.select(
        F.md5(F.col("o_orderkey").cast("string")).alias("h1"),
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("#2")))
        .alias("h2"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
    )
    # single-file scan parallelism: the 100-column conditional agg is
    # per-row md5-heavy and must not run on one core
    base = spread(base)

    def bit(b: int):
        src, pos = ("h1", b + 1) if b < 32 else ("h2", b - 31)
        return F.substring(F.col(src), pos, 1) < "8"

    # Single-pass (r11): the observed difference used to be a separate
    # aggregation over a cached base, broadcast-joined back under the
    # permutation columns. The four grp sums ride the SAME wide agg
    # (identical sum/count expressions, so d_obs is bit-identical) —
    # one pass over the md5 columns instead of two, no cache build,
    # no 1-row join.
    aggs = [
        F.sum("x").cast("double").alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum(F.when(F.col("grp") == 0, F.col("x"))).cast("double")
        .alias("s0"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("grp") == 1, F.col("x"))).cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
    ]
    for b in range(50):
        aggs.append(
            F.sum(F.when(bit(b), F.col("x"))).cast("double").alias(f"sa{b}")
        )
        aggs.append(
            F.sum(F.when(bit(b), 1).otherwise(0)).cast("bigint")
            .alias(f"na{b}")
        )
    wide = base.agg(*aggs).select(
        "*",
        F.round(
            F.col("s0") / F.col("n0") - F.col("s1") / F.col("n1"), 9
        ).alias("d_obs"),
    )
    stack_args = ", ".join(
        f"{b}, sa{b}, na{b}" for b in range(50)
    )
    stacked = wide.selectExpr(
        "d_obs", "st", "nt", f"stack(50, {stack_args}) AS (b, sa, na)"
    )
    perms = stacked.filter(
        (F.col("na") > 0) & (F.col("nt") - F.col("na") > 0)
    ).select(
        "d_obs", "b",
        F.round(
            F.col("sa") / F.col("na")
            - (F.col("st") - F.col("sa")) / (F.col("nt") - F.col("na")),
            9,
        ).alias("d_b"),
    )
    extreme = F.sum(
        F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    )
    return (
        perms.groupBy("d_obs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            extreme.cast("bigint").alias("n_extreme"),
            F.round(
                (F.lit(1.0) + extreme) / (F.count(F.lit(1)) + 1.0), 6
            ).alias("p_value"),
        )
        .select(
            F.round("d_obs", 6).alias("diff_observed"),
            "n_perms", "n_extreme", "p_value",
        )
    )


# -- q_jackknife -------------------------------------------------------
#
# Leave-one-nation-out jackknife of the global mean account balance:
# each θ̂₍₋g₎ = (S−S_g)/(n−n_g) is PURE ALGEBRA on the exact decimal
# per-nation sums (no recomputation scans — the whole resample is
# one grid transform), giving the group-robust SE and the jackknife
# bias estimate that the iid SE misses when nations cluster. Scale:
# one partial-aggregated scan → 25-row grid.

JACKKNIFE_SQL = """
WITH per AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS s_g
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DECIMAL(38,2)) AS s,
         CAST(COUNT(*) AS BIGINT) AS g
  FROM per
), loo AS (
  SELECT p.n_name, p.n_g,
         (CAST(t.s AS DOUBLE) - CAST(p.s_g AS DOUBLE))
           / (t.n - p.n_g) AS theta_g,
         t.g, t.n,
         CAST(t.s AS DOUBLE) / t.n AS theta
  FROM per p CROSS JOIN tot t
), dot AS (
  SELECT CAST(SUM(CAST(round(theta_g, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / MAX(g) AS theta_dot,
         MAX(g) AS g, MAX(theta) AS theta
  FROM loo
), se AS (
  SELECT CAST(SUM(CAST(round((l.theta_g - d.theta_dot)
                             * (l.theta_g - d.theta_dot), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS ss
  FROM loo l CROSS JOIN dot d
)
SELECT l.n_name, l.n_g,
       round(l.theta_g, 6) AS theta_without,
       round(l.theta, 6) AS theta_full,
       round(sqrt((d.g - 1.0) / d.g * s.ss), 6) AS jackknife_se,
       round((d.g - 1.0) * (d.theta_dot - l.theta), 6) AS jackknife_bias
FROM loo l CROSS JOIN dot d CROSS JOIN se s
ORDER BY l.n_name
"""


@query("q_jackknife", oracle=JACKKNIFE_SQL)
def q_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    per = (
        c.customer.join(
            F.broadcast(c.nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(28,2)").alias("s_g"),
        )
    )
    per = per.cache()  # consumed by tot AND loo
    tot = per.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("decimal(38,2)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    loo = per.join(F.broadcast(tot)).select(
        "n_name", "n_g",
        (
            (F.col("s").cast("double") - F.col("s_g").cast("double"))
            / (F.col("n") - F.col("n_g"))
        ).alias("theta_g"),
        "g", "n",
        (F.col("s").cast("double") / F.col("n")).alias("theta"),
    )
    loo = loo.cache()  # consumed by dot, se AND the output
    dot = loo.agg(
        (
            F.sum(F.round("theta_g", 9).cast("decimal(28,9)"))
            .cast("double") / F.max("g")
        ).alias("theta_dot"),
        F.max("g").alias("g"),
        F.max("theta").alias("theta"),
    )
    se = loo.join(F.broadcast(dot)).agg(
        F.sum(
            F.round(
                (F.col("theta_g") - F.col("theta_dot"))
                * (F.col("theta_g") - F.col("theta_dot")), 9
            ).cast("decimal(28,9)")
        ).cast("double").alias("ss")
    )
    return (
        loo.join(F.broadcast(dot.select(
            F.col("theta_dot"), F.col("g").alias("gg")
        )))
        .join(F.broadcast(se))
        .select(
            "n_name", "n_g",
            F.round("theta_g", 6).alias("theta_without"),
            F.round("theta", 6).alias("theta_full"),
            F.round(
                F.sqrt(
                    (F.col("gg") - 1.0) / F.col("gg") * F.col("ss")
                ), 6
            ).alias("jackknife_se"),
            F.round(
                (F.col("gg") - 1.0)
                * (F.col("theta_dot") - F.col("theta")), 6
            ).alias("jackknife_bias"),
        )
        .orderBy("n_name")
    )


# -- q_ratio_metric_ci -------------------------------------------------
#
# Delta-method CI for the RATIO metric "revenue per order" compared
# across the md5-parity A/B split, with CUSTOMERS as the unit of
# randomization: R = Σrev/Σorders per group, var(R) ≈ (var(x) +
# R²·var(y) − 2R·cov(x,y)) / (n·ȳ²) over per-customer (rev, orders)
# pairs — the SE a naive per-order z-test gets wrong whenever
# customers contribute unequal order counts. Exact per-customer
# decimal sums, exact group moments, one double chain. Scale: two
# partial-aggregated scans (customer grid → 2-row group grid) → 1
# row.

RATIO_CI_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS cust,
         CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), gm AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(28,2)) * y) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_cust GROUP BY 1
), stats AS (
  SELECT grp, n,
         CAST(sx AS DOUBLE) / sy AS r,
         (
           (CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
           + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
             * (CAST(syy AS DOUBLE) / n
                - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
           - 2.0 * (CAST(sx AS DOUBLE) / sy)
             * (CAST(sxy AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
         ) / (n * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
           AS var_r
  FROM gm
), wide AS (
  SELECT MIN(CASE WHEN grp = 0 THEN n END) AS n_a,
         MIN(CASE WHEN grp = 1 THEN n END) AS n_b,
         MIN(CASE WHEN grp = 0 THEN r END) AS r_a,
         MIN(CASE WHEN grp = 1 THEN r END) AS r_b,
         MIN(CASE WHEN grp = 0 THEN var_r END) AS v_a,
         MIN(CASE WHEN grp = 1 THEN var_r END) AS v_b
  FROM stats
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(r_a, 6) AS rpo_a,
       round(r_b, 6) AS rpo_b,
       round(r_b - r_a, 6) AS diff,
       round(sqrt(v_a + v_b), 6) AS se,
       round((r_b - r_a) - 1.96 * sqrt(v_a + v_b), 6) AS ci_lo,
       round((r_b - r_a) + 1.96 * sqrt(v_a + v_b), 6) AS ci_hi,
       CAST(CASE WHEN abs(r_b - r_a) > 1.96 * sqrt(v_a + v_b)
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM wide
WHERE v_a IS NOT NULL AND v_b IS NOT NULL
"""


@query("q_ratio_metric_ci", oracle=RATIO_CI_SQL)
def q_ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    per_cust = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    gm = per_cust.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").alias("sxx"),
        F.sum(F.col("x").cast("decimal(28,2)") * F.col("y"))
        .cast("decimal(38,2)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n = F.col("n")
    r = F.col("sx").cast("double") / F.col("sy")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    var_x = F.col("sxx").cast("double") / n - mx * mx
    var_y = F.col("syy").cast("double") / n - my * my
    cov = F.col("sxy").cast("double") / n - mx * my
    var_r = (var_x + r * r * var_y - 2.0 * r * cov) / (n * my * my)
    stats = gm.select("grp", "n", r.alias("r"), var_r.alias("var_r"))
    wide = stats.agg(
        F.min(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.min(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.min(F.when(F.col("grp") == 0, F.col("r"))).alias("r_a"),
        F.min(F.when(F.col("grp") == 1, F.col("r"))).alias("r_b"),
        F.min(F.when(F.col("grp") == 0, F.col("var_r"))).alias("v_a"),
        F.min(F.when(F.col("grp") == 1, F.col("var_r"))).alias("v_b"),
    )
    diff = F.col("r_b") - F.col("r_a")
    se = F.sqrt(F.col("v_a") + F.col("v_b"))
    return (
        wide.filter(F.col("v_a").isNotNull() & F.col("v_b").isNotNull())
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round("r_a", 6).alias("rpo_a"),
            F.round("r_b", 6).alias("rpo_b"),
            F.round(diff, 6).alias("diff"),
            F.round(se, 6).alias("se"),
            F.round(diff - 1.96 * se, 6).alias("ci_lo"),
            F.round(diff + 1.96 * se, 6).alias("ci_hi"),
            F.when(F.abs(diff) > 1.96 * se, 1).otherwise(0).cast("bigint")
            .alias("significant"),
        )
    )


# -- q_tost_equivalence ------------------------------------------------
#
# TOST equivalence test on the md5-parity split's mean order totals:
# two one-sided z-tests against the ±1%-of-pooled-mean margin —
# "are the groups the SAME (within δ)?", which a non-significant
# difference test never establishes (absence of evidence ≠ evidence
# of absence; this is the A/A-validation and do-no-harm launch
# gate). Exact decimal moments, Welch-style SE, equivalence iff
# min(z₁, z₂) > 1.645. Scale: one partial-aggregated scan → 1 row.

TOST_SQL = """
WITH v AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx
  FROM v GROUP BY 1
), s AS (
  SELECT grp, n, CAST(sx AS DOUBLE) / n AS mu,
         (CAST(sxx AS DOUBLE) / n
          - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / n
           AS var_mu,
         CAST(sx AS DOUBLE) AS sxd
  FROM m
), wide AS (
  SELECT MIN(CASE WHEN grp = 0 THEN n END) AS n_a,
         MIN(CASE WHEN grp = 1 THEN n END) AS n_b,
         MIN(CASE WHEN grp = 0 THEN mu END) AS mu_a,
         MIN(CASE WHEN grp = 1 THEN mu END) AS mu_b,
         MIN(CASE WHEN grp = 0 THEN var_mu END) AS v_a,
         MIN(CASE WHEN grp = 1 THEN var_mu END) AS v_b,
         SUM(sxd) / SUM(n) AS mu_pool
  FROM s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(mu_b - mu_a, 6) AS diff,
       round(0.01 * mu_pool, 6) AS margin,
       round(sqrt(v_a + v_b), 6) AS se,
       round(((mu_b - mu_a) + 0.01 * mu_pool) / sqrt(v_a + v_b), 6) AS z_lower,
       round((0.01 * mu_pool - (mu_b - mu_a)) / sqrt(v_a + v_b), 6) AS z_upper,
       CAST(CASE WHEN ((mu_b - mu_a) + 0.01 * mu_pool) / sqrt(v_a + v_b)
                      > 1.645
                  AND (0.01 * mu_pool - (mu_b - mu_a)) / sqrt(v_a + v_b)
                      > 1.645
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM wide
WHERE v_a IS NOT NULL AND v_b IS NOT NULL AND v_a + v_b > 0
"""


@query("q_tost_equivalence", oracle=TOST_SQL)
def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    v = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    m = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").alias("sxx"),
    )
    n = F.col("n")
    mu = F.col("sx").cast("double") / n
    var_mu = (F.col("sxx").cast("double") / n - mu * mu) / n
    s = m.select(
        "grp", "n", mu.alias("mu"), var_mu.alias("var_mu"),
        F.col("sx").cast("double").alias("sxd"),
    )
    wide = s.agg(
        F.min(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.min(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.min(F.when(F.col("grp") == 0, F.col("mu"))).alias("mu_a"),
        F.min(F.when(F.col("grp") == 1, F.col("mu"))).alias("mu_b"),
        F.min(F.when(F.col("grp") == 0, F.col("var_mu"))).alias("v_a"),
        F.min(F.when(F.col("grp") == 1, F.col("var_mu"))).alias("v_b"),
        (F.sum("sxd") / F.sum("n")).alias("mu_pool"),
    )
    diff = F.col("mu_b") - F.col("mu_a")
    margin = F.lit(0.01) * F.col("mu_pool")
    se = F.sqrt(F.col("v_a") + F.col("v_b"))
    z1 = (diff + margin) / se
    z2 = (margin - diff) / se
    return (
        wide.filter(
            F.col("v_a").isNotNull() & F.col("v_b").isNotNull()
            & (F.col("v_a") + F.col("v_b") > 0)
        )
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(diff, 6).alias("diff"),
            F.round(margin, 6).alias("margin"),
            F.round(se, 6).alias("se"),
            F.round(z1, 6).alias("z_lower"),
            F.round(z2, 6).alias("z_upper"),
            F.when((z1 > 1.645) & (z2 > 1.645), 1).otherwise(0)
            .cast("bigint").alias("equivalent"),
        )
    )


# -- q_event_study -----------------------------------------------------
#
# Event-study leads-and-lags around a policy date (1997-01-01) for
# the md5-parity "treated" group: β_k = [mean_T(k) − mean_C(k)] −
# [mean_T(−1) − mean_C(−1)] for relative months k ∈ [−6, +6] — the
# pre-trend plot that validates (or kills) a diff-in-diff BEFORE
# anyone believes the post coefficients (flat pre-period β's = the
# parallel-trends evidence; q_diff_in_diff reports the single
# pooled effect, this shows its dynamics). Exact conditional
# decimal sums per (k, group); the k=−1 anchor is a broadcast
# 1-row join. Scale: one scan → 13×2 cell grid → 13 rows.

EVENT_STUDY_SQL = """
WITH base AS (
  SELECT CAST((year(CAST(o_orderdate AS DATE)) - 1997) * 12
              + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS k,
         CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS treat,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), cells AS (
  SELECT k, treat, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(38,2)) AS s
  FROM base WHERE k BETWEEN -6 AND 6 GROUP BY 1, 2
), diffs AS (
  SELECT k,
         MIN(CASE WHEN treat = 1 THEN n END) AS n_t,
         MIN(CASE WHEN treat = 0 THEN n END) AS n_c,
         MIN(CASE WHEN treat = 1 THEN CAST(s AS DOUBLE) / n END)
           - MIN(CASE WHEN treat = 0 THEN CAST(s AS DOUBLE) / n END)
           AS d
  FROM cells GROUP BY 1
), anchor AS (
  SELECT d AS d_ref FROM diffs WHERE k = -1
)
SELECT d.k AS rel_month, d.n_t, d.n_c,
       round(d.d, 6) AS diff_tc,
       round(d.d - a.d_ref, 6) AS beta,
       CAST(CASE WHEN d.k < 0 THEN 1 ELSE 0 END AS BIGINT) AS is_pre
FROM diffs d CROSS JOIN anchor a
WHERE d.n_t IS NOT NULL AND d.n_c IS NOT NULL
ORDER BY d.k
"""


@query("q_event_study", oracle=EVENT_STUDY_SQL)
def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    k = (
        (F.year("o_orderdate") - 1997) * 12 + F.month("o_orderdate") - 1
    ).cast("bigint")
    base = o.select(
        k.alias("k"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 1
        ).otherwise(0).alias("treat"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    cells = (
        base.filter((F.col("k") >= -6) & (F.col("k") <= 6))
        .groupBy("k", "treat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("decimal(38,2)").alias("s"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    diffs = cells.groupBy("k").agg(
        F.min(F.when(F.col("treat") == 1, F.col("n"))).alias("n_t"),
        F.min(F.when(F.col("treat") == 0, F.col("n"))).alias("n_c"),
        (
            F.min(F.when(F.col("treat") == 1, mean))
            - F.min(F.when(F.col("treat") == 0, mean))
        ).alias("d"),
    )
    diffs = diffs.cache()  # consumed by the anchor AND the output
    anchor = diffs.filter(F.col("k") == -1).select(
        F.col("d").alias("d_ref")
    )
    return (
        diffs.join(F.broadcast(anchor))
        .filter(F.col("n_t").isNotNull() & F.col("n_c").isNotNull())
        .select(
            F.col("k").alias("rel_month"),
            F.col("n_t").cast("bigint").alias("n_t"),
            F.col("n_c").cast("bigint").alias("n_c"),
            F.round("d", 6).alias("diff_tc"),
            F.round(F.col("d") - F.col("d_ref"), 6).alias("beta"),
            F.when(F.col("k") < 0, 1).otherwise(0).cast("bigint")
            .alias("is_pre"),
        )
        .orderBy("rel_month")
    )


# -- q_quantile_treatment_effect ---------------------------------------
#
# Distributional treatment effects: per-decile quantile differences
# of order totals between the md5-parity groups — the effect an
# average-only z-test hides (a treatment can move the tails while
# the mean sits still). Each group's deciles are exact lower
# quantiles off its cumulative distinct-value grid (the house
# quantile shape), so every QTE is an exact decimal difference.
# Scale: one scan → two per-group value grids → 9 rows.

QTE_SQL = """
WITH base AS (
  SELECT CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
              THEN 0 ELSE 1 END AS grp,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
), grid AS (
  SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2
), cum AS (
  SELECT grp, x,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY x) AS BIGINT) AS c,
         CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM grid
), qs AS (
  SELECT d.d AS decile, cum.grp, CAST(MIN(x) AS DECIMAL(18,2)) AS q
  FROM cum CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(d)
  WHERE 10 * c >= d.d * n
  GROUP BY 1, 2
)
SELECT a.decile,
       CAST(a.q AS DOUBLE) AS q_control,
       CAST(b.q AS DOUBLE) AS q_treat,
       CAST(b.q - a.q AS DOUBLE) AS qte
FROM qs a JOIN qs b ON b.decile = a.decile AND b.grp = 1
WHERE a.grp = 0
ORDER BY a.decile
"""


@query("q_quantile_treatment_effect", oracle=QTE_SQL)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    base = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
            < "8", 0
        ).otherwise(1).alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    grid = base.groupBy("grp", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.partitionBy("grp").orderBy("x")
    wa = Window.partitionBy("grp")
    cum = grid.select(
        "grp", "x",
        F.sum("cnt").over(wc).cast("bigint").alias("c"),
        F.sum("cnt").over(wa).cast("bigint").alias("n"),
    )
    dd = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    qs = (
        cum.crossJoin(F.broadcast(dd))
        .filter(10 * F.col("c") >= F.col("decile") * F.col("n"))
        .groupBy("decile", "grp")
        .agg(F.min("x").cast("decimal(18,2)").alias("q"))
    )
    qa = qs.filter(F.col("grp") == 0).select(
        "decile", F.col("q").alias("qa")
    )
    qb = qs.filter(F.col("grp") == 1).select(
        "decile", F.col("q").alias("qb")
    )
    return (
        qa.join(qb, "decile")
        .select(
            "decile",
            F.col("qa").cast("double").alias("q_control"),
            F.col("qb").cast("double").alias("q_treat"),
            (F.col("qb") - F.col("qa")).cast("double").alias("qte"),
        )
        .orderBy("decile")
    )


# -- q_oaxaca ----------------------------------------------------------
#
# Oaxaca–Blinder decomposition of the AUTOMOBILE-vs-HOUSEHOLD mean
# order-total gap into the part EXPLAINED by account-balance
# composition ((x̄_A − x̄_B)·β_B, reference-group coefficients) and
# the UNEXPLAINED remainder — the standard decomposition behind
# every "is this gap a mix effect?" question
# (q_rate_depth_decomposition's regression-flavored sibling). Group
# OLS moments are exact decimals; the decomposition is one double
# chain. Scale: one broadcast-dim join + partial-aggregated scan →
# 2-row group grid → 1 row.

OAXACA_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS seg,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS y,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
), m AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
    CAST(SUM(y) AS DECIMAL(38,2)) AS sy,
    CAST(SUM(CAST(x * y AS DECIMAL(37,4))) AS DECIMAL(38,4)) AS sxy,
    CAST(SUM(CAST(x * x AS DECIMAL(37,4))) AS DECIMAL(38,4)) AS sxx
  FROM base GROUP BY 1
), fits AS (
  SELECT seg, n,
         CAST(sx AS DOUBLE) / n AS xbar,
         CAST(sy AS DOUBLE) / n AS ybar,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sx AS DOUBLE)) AS beta
  FROM m
  WHERE n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        <> 0
), wide AS (
  SELECT
    MIN(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS n_a,
    MIN(CASE WHEN seg = 'HOUSEHOLD' THEN n END) AS n_b,
    MIN(CASE WHEN seg = 'AUTOMOBILE' THEN ybar END) AS y_a,
    MIN(CASE WHEN seg = 'HOUSEHOLD' THEN ybar END) AS y_b,
    MIN(CASE WHEN seg = 'AUTOMOBILE' THEN xbar END) AS x_a,
    MIN(CASE WHEN seg = 'HOUSEHOLD' THEN xbar END) AS x_b,
    MIN(CASE WHEN seg = 'HOUSEHOLD' THEN beta END) AS beta_b
  FROM fits
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(y_a - y_b, 6) AS gap,
       round((x_a - x_b) * beta_b, 6) AS explained,
       round((y_a - y_b) - (x_a - x_b) * beta_b, 6) AS unexplained,
       round(CASE WHEN y_a - y_b <> 0
                  THEN (x_a - x_b) * beta_b / (y_a - y_b) END, 6)
         AS explained_share
FROM wide
WHERE y_a IS NOT NULL AND y_b IS NOT NULL AND beta_b IS NOT NULL
"""


@query("q_oaxaca", oracle=OAXACA_SQL)
def q_oaxaca(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    base = (
        cat.orders.join(
            F.broadcast(
                cat.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
        )
    )
    m = base.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum("y").cast("decimal(38,2)").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(37,4)"))
        .cast("decimal(38,4)").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(37,4)"))
        .cast("decimal(38,4)").alias("sxx"),
    )
    n = F.col("n")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    beta = (
        n * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / vx
    fits = m.filter(vx != 0).select(
        "seg", "n",
        (F.col("sx").cast("double") / n).alias("xbar"),
        (F.col("sy").cast("double") / n).alias("ybar"),
        beta.alias("beta"),
    )

    def pick(seg, col, name):
        return F.min(F.when(F.col("seg") == seg, F.col(col))).alias(name)

    wide = fits.agg(
        pick("AUTOMOBILE", "n", "n_a"), pick("HOUSEHOLD", "n", "n_b"),
        pick("AUTOMOBILE", "ybar", "y_a"), pick("HOUSEHOLD", "ybar", "y_b"),
        pick("AUTOMOBILE", "xbar", "x_a"), pick("HOUSEHOLD", "xbar", "x_b"),
        pick("HOUSEHOLD", "beta", "beta_b"),
    )
    gap = F.col("y_a") - F.col("y_b")
    expl = (F.col("x_a") - F.col("x_b")) * F.col("beta_b")
    return (
        wide.filter(
            F.col("y_a").isNotNull() & F.col("y_b").isNotNull()
            & F.col("beta_b").isNotNull()
        )
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(gap, 6).alias("gap"),
            F.round(expl, 6).alias("explained"),
            F.round(gap - expl, 6).alias("unexplained"),
            F.round(
                F.when(gap != 0, expl / gap), 6
            ).alias("explained_share"),
        )
    )
