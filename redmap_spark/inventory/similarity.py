"""SURVEY §2.D — similarity-search inventory entries.

sim_bruteforce_topk is the oracle-verified exact baseline; the LSH
and IVF variants are approximate scale paths verified by recall tests
in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query, spread
from redmap_spark.operators import similarity as S

QUERY_ID = 0

SIM_BRUTE_SQL = f"""
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), q AS (SELECT v AS qv, nrm AS qn FROM w WHERE vec_id = {QUERY_ID})
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
             / (b.nrm * q.qn), 4) AS score
FROM w b, q WHERE b.vec_id != {QUERY_ID}
ORDER BY score DESC, vec_id LIMIT 10
"""


@query("sim_bruteforce_topk", oracle=SIM_BRUTE_SQL)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.brute_force_topk(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


SIM_RANGE_SQL = f"""
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), q AS (SELECT v AS qv, nrm AS qn FROM w WHERE vec_id = {QUERY_ID})
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
             / (b.nrm * q.qn), 4) AS score
FROM w b, q
WHERE b.vec_id != {QUERY_ID}
  AND round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
            / (b.nrm * q.qn), 4) >= 0.3
"""


@query("sim_range_search", oracle=SIM_RANGE_SQL)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-matches radius search (cosine ≥ 0.3 vs the query vector):
    one broadcast scan, no sort, no shuffle."""
    return S.range_search(Catalog(spark, sf_dir).embeddings, QUERY_ID, radius=0.3)


SIM_MIPS_SQL = f"""
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (SELECT v AS qv FROM w WHERE vec_id = {QUERY_ID})
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i])), 4)
         AS score
FROM w b, q WHERE b.vec_id != {QUERY_ID}
ORDER BY score DESC, vec_id LIMIT 10
"""


@query("sim_mips_topk", oracle=SIM_MIPS_SQL)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact max-inner-product top-k (MIPS): the retrieval objective
    for unnormalized two-tower / recommender embeddings, where vector
    magnitude carries signal cosine throws away. Same one-pass
    broadcast-scan shape as sim_bruteforce_topk; the sequential
    left-to-right dot fold matches DuckDB's list_sum order, so the
    rounded scores agree bit-for-bit."""
    return S.brute_force_mips(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


@query("sim_quantized_topk")  # approximate: verified by recall pytest
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 two-phase search: integer-cosine candidate scan over the
    4×-smaller int8 index, exact float rescore of the top 4k. See
    operators/similarity.py::quantized_topk."""
    return S.quantized_topk(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


@query("sim_pq_topk")  # approximate: verified by recall pytest
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search: 4-bit×16-subspace codes
    (16 small ints vs 64 doubles at rest), LUT scoring over the code
    table only, exact rescore of the top 8k. See
    operators/similarity.py::pq_topk."""
    return S.pq_topk(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


@query("sim_lsh_topk")  # approximate: verified by recall pytest
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_topk(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


@query("sim_ivf_topk")  # approximate: verified by recall pytest
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ivf_topk(Catalog(spark, sf_dir).embeddings, QUERY_ID, k=10)


# -- k-NN joins (batch ANN: every query → its top-k neighbors) ---------

N_QUERIES = 20
KNN_K = 5

SIM_KNN_JOIN_SQL = f"""
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM w WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, b.vec_id AS c_id,
         round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
               / (b.nrm * q.qn), 4) AS score
  FROM w b, q WHERE b.vec_id != q.q_id),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
  FROM scored)
SELECT q_id, c_id, score, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= {KNN_K}
"""


@query("sim_knn_join", oracle=SIM_KNN_JOIN_SQL)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from pyspark.sql import functions as F

    return S.knn_join_bruteforce(e.filter(F.col("vec_id") < N_QUERIES), e, k=KNN_K)


@query("sim_knn_join_ivf")  # approximate: verified by score-ratio pytest
def sim_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF join over a trained spherical-k-means quantizer (the
    dataset's label column is not cosine-coherent); nprobe=3 of 10
    clusters scans ~30% of the corpus for ~0.94 of exact top-k
    quality on this near-uniform embedding space."""
    e = Catalog(spark, sf_dir).embeddings
    from pyspark.sql import functions as F

    return S.knn_join_ivf_trained(e.filter(F.col("vec_id") < N_QUERIES), e, k=KNN_K, nprobe=3)


# -- sim_centroids: per-label embedding centroid -----------------------
#
# Vector aggregation — the reduce step of k-means / class-prototype /
# dataset-condensation jobs. posexplode to (label, dim, x) THEN
# groupBy(label, dim): the per-dimension partial sums combine
# map-side, so the shuffle carries |labels|×|dims| partial rows per
# task, not vectors — the associative form of an elementwise mean
# (an applyInPandas per-label mean would ship every full vector to
# its group with no combiner).

SIM_CENTROIDS_SQL = """
SELECT label,
       CAST(i - 1 AS INT) AS dim,
       round(AVG(embedding[i]), 6) AS centroid,
       COUNT(*) AS n_vecs
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY 1, 2
"""


@query("sim_centroids", oracle=SIM_CENTROIDS_SQL)
def sim_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg("x"), 6).alias("centroid"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
    )


# -- sim_outliers ------------------------------------------------------
#
# Embedding-corpus data quality: flag vectors far from their own
# label's centroid (mislabeled / noise / garbage embeddings — the
# vector-side analogue of the Gopher text gate). cos(v, centroid_l)
# per vector, then a per-label z-score; z <= -2 flags the outliers.
# Determinism recipe (cross-engine hash-stable): per-dim products are
# cast to DECIMAL before summing (exact, order-independent), cosine
# rounds to 4, the per-label moments are decimal sums of the ROUNDED
# cosines, and z rounds to 3 — every double op downstream of the
# decimal sums is identical IEEE arithmetic on identical inputs.
# Scale shape: explode to (vec, dim) rows, one partial-agg groupBy
# per vector dot, centroids and per-label moments broadcast back —
# two shuffles total, nothing O(n²).

SIM_OUTLIERS_SQL = """
WITH cent AS (
  SELECT label, i AS dim, round(AVG(embedding[i]), 6) AS c
  FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2
), ex AS (
  SELECT vec_id, label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), dots AS (
  SELECT vec_id, ex.label,
         CAST(SUM(CAST(x * c AS DECIMAL(28,12))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS vv,
         CAST(SUM(CAST(c * c AS DECIMAL(28,12))) AS DOUBLE) AS cc
  FROM ex JOIN cent USING (label, dim) GROUP BY 1, 2
), cosd AS (
  SELECT vec_id, label, round(dot / (sqrt(vv) * sqrt(cc)), 4) AS cos_c
  FROM dots
), stats AS (
  SELECT label,
         CAST(SUM(CAST(cos_c AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(cos_c * cos_c AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS m2
  FROM cosd GROUP BY 1
)
SELECT vec_id, cosd.label, cos_c,
       round((cos_c - mu) / sqrt(GREATEST(m2 - mu * mu, 1e-12)), 3) AS z,
       (cos_c - mu) / sqrt(GREATEST(m2 - mu * mu, 1e-12)) <= -2.0 AS is_outlier
FROM cosd JOIN stats USING (label)
"""


@query("sim_outliers", oracle=SIM_OUTLIERS_SQL)
def sim_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    )
    cent = ex.groupBy("label", "dim").agg(F.round(F.avg("x"), 6).alias("c"))
    d = lambda col: F.sum(col.cast("decimal(28,12)")).cast("double")  # noqa: E731
    dots = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            d(F.col("x") * F.col("c")).alias("dot"),
            d(F.col("x") * F.col("x")).alias("vv"),
            d(F.col("c") * F.col("c")).alias("cc"),
        )
    )
    cosd = dots.select(
        "vec_id", "label",
        F.round(F.col("dot") / (F.sqrt("vv") * F.sqrt("cc")), 4).alias("cos_c"),
    )
    stats = cosd.groupBy("label").agg(
        (F.sum(F.col("cos_c").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            F.sum((F.col("cos_c") * F.col("cos_c")).cast("decimal(18,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    zden = F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(1e-12)))
    zraw = (F.col("cos_c") - F.col("mu")) / zden
    return (
        cosd.join(F.broadcast(stats), "label")
        .select(
            "vec_id", "label", "cos_c",
            F.round(zraw, 3).alias("z"),
            (zraw <= F.lit(-2.0)).alias("is_outlier"),
        )
    )


@query("sim_diversity_sample")  # driver-greedy over a bounded pool: pytest
def sim_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy diversity selection over a deterministic
    bounded candidate pool (operators/similarity.py:diversity_sample)
    — property-tested in tests/test_similarity.py (spread beats
    random, deterministic, exact size)."""
    e = Catalog(spark, sf_dir).embeddings
    sel = S.diversity_sample(e, k=16, pool=256)
    return (
        e.join(F.broadcast(sel), "vec_id")
        .select("vec_id", "picked_order", "label")
        .orderBy("picked_order")
    )


# -- sim_dim_tradeoff --------------------------------------------------
#
# Matryoshka-style dimension-truncation retrieval audit: for a
# hash-chosen query subset (vec_id % 25 == 0), the top-1 neighbor
# under full 64-dim cosine vs under the FIRST 16 dims only — the
# measurement that decides whether truncated embeddings (4× cheaper
# scans, 4× smaller index) are good enough for a coarse first stage.
# Reports both picks, agreement, and the full-dim score the truncated
# pick actually achieves (the real retrieval regret). Argmaxes break
# ties on candidate id; cosines round to 4 like the rest of the sim
# family. Shape: |queries| × corpus brute force with the query side
# broadcast — bounded by the 1/25 sample, the same audit-sizing trick
# as the recall pytests.

SIM_DIMS_SQL = """
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS nrm64,
         sqrt(list_sum(list_transform(embedding[1:16]::DOUBLE[],
                                      x -> x * x))) AS nrm16
  FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, nrm64 AS qn64, nrm16 AS qn16
      FROM w WHERE vec_id % 25 = 0),
sc AS (
  SELECT q.qid, b.vec_id,
         round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
               / (b.nrm64 * q.qn64), 4) AS cos64,
         round(list_sum(list_transform(range(1, 17), i -> b.v[i] * q.qv[i]))
               / (b.nrm16 * q.qn16), 4) AS cos16
  FROM w b, q WHERE b.vec_id != q.qid
),
r AS (
  SELECT qid, vec_id, cos64, cos16,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos64 DESC, vec_id) AS r64,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos16 DESC, vec_id) AS r16
  FROM sc
)
SELECT qid AS query_id,
       CAST(MAX(CASE WHEN r64 = 1 THEN vec_id END) AS BIGINT) AS top1_full,
       CAST(MAX(CASE WHEN r16 = 1 THEN vec_id END) AS BIGINT) AS top1_trunc,
       MAX(CASE WHEN r64 = 1 THEN cos64 END) AS best_cos_full,
       MAX(CASE WHEN r16 = 1 THEN cos64 END) AS trunc_pick_cos_full,
       CAST(CASE WHEN MAX(CASE WHEN r64 = 1 THEN vec_id END)
                      = MAX(CASE WHEN r16 = 1 THEN vec_id END)
                 THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM r GROUP BY 1
"""


@query("sim_dim_tradeoff", oracle=SIM_DIMS_SQL)
def sim_dim_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from redmap_spark.operators.similarity import as_double_vec, norm

    e = Catalog(spark, sf_dir).embeddings
    w = e.select(
        "vec_id",
        as_double_vec("embedding").alias("v"),
        norm(as_double_vec("embedding")).alias("nrm64"),
        norm(F.slice(as_double_vec("embedding"), 1, 16)).alias("nrm16"),
    )
    q = w.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm64").alias("qn64"),
        F.col("nrm16").alias("qn16"),
    )
    from redmap_spark.operators.similarity import dot

    sc = (
        w.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(
                dot(F.col("v"), F.col("qv")) / (F.col("nrm64") * F.col("qn64")),
                4,
            ).alias("cos64"),
            F.round(
                dot(F.slice(F.col("v"), 1, 16), F.slice(F.col("qv"), 1, 16))
                / (F.col("nrm16") * F.col("qn16")),
                4,
            ).alias("cos16"),
        )
    )
    wq = Window.partitionBy("qid")
    r = sc.select(
        "qid", "vec_id", "cos64", "cos16",
        F.row_number().over(wq.orderBy(F.desc("cos64"), F.asc("vec_id")))
        .alias("r64"),
        F.row_number().over(wq.orderBy(F.desc("cos16"), F.asc("vec_id")))
        .alias("r16"),
    )
    pick64 = F.max(F.when(F.col("r64") == 1, F.col("vec_id")))
    pick16 = F.max(F.when(F.col("r16") == 1, F.col("vec_id")))
    return r.groupBy(F.col("qid").alias("query_id")).agg(
        pick64.cast("bigint").alias("top1_full"),
        pick16.cast("bigint").alias("top1_trunc"),
        F.max(F.when(F.col("r64") == 1, F.col("cos64"))).alias("best_cos_full"),
        F.max(F.when(F.col("r16") == 1, F.col("cos64")))
        .alias("trunc_pick_cos_full"),
        F.when(pick64 == pick16, 1).otherwise(0).cast("bigint").alias("agree"),
    )


# -- sim_assignment_purity ---------------------------------------------
#
# Nearest-centroid assignment audit (the clustering/labeling QA step:
# if each label's centroid really separates the embedding space,
# vectors should assign back to their own label): every vector is
# scored against ALL 10 label centroids by cosine and assigned to the
# argmax (cos rounded to 4, ties → smallest label — deterministic),
# then the label×assignment confusion is reported with per-label
# recall and the share each cell takes of its true label. Determinism
# recipe is sim_outliers': centroids round to 6, per-dim products
# cast to DECIMAL(28,12) before summing (exact, order-independent),
# cosine rounds to 4 before the argmax. Scale shape: the cross-score
# is a bounded |labels|× expansion of the (vec, dim) explode — 10
# centroids, never vector×vector; centroids broadcast.

SIM_ASSIGN_PURITY_SQL = """
WITH cent AS (
  SELECT label AS clabel, i AS dim, round(AVG(embedding[i]), 6) AS c
  FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2
), ex AS (
  SELECT vec_id, label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), dots AS (
  SELECT vec_id, ex.label, cent.clabel,
         CAST(SUM(CAST(x * c AS DECIMAL(28,12))) AS DOUBLE) AS dot
  FROM ex JOIN cent ON cent.dim = ex.dim
  GROUP BY 1, 2, 3
), vnorm AS (
  SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS vv
  FROM ex GROUP BY 1
), cnorm AS (
  SELECT clabel, CAST(SUM(CAST(c * c AS DECIMAL(28,12))) AS DOUBLE) AS cc
  FROM cent GROUP BY 1
), scored AS (
  SELECT dots.vec_id, label, dots.clabel,
         round(dot / (sqrt(vv) * sqrt(cc)), 4) AS cos_c
  FROM dots JOIN vnorm ON vnorm.vec_id = dots.vec_id
  JOIN cnorm ON cnorm.clabel = dots.clabel
), assigned AS (
  SELECT vec_id, label, clabel AS assigned FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_c DESC, clabel) AS rk
    FROM scored
  ) WHERE rk = 1
), cells AS (
  SELECT label, assigned, CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM assigned GROUP BY 1, 2
)
SELECT label, assigned, n_vecs,
       round(n_vecs / CAST(SUM(n_vecs) OVER (PARTITION BY label) AS DOUBLE),
             6) AS share_of_label,
       CAST(CASE WHEN label = assigned THEN 1 ELSE 0 END AS BIGINT)
         AS is_correct
FROM cells
ORDER BY label, assigned
"""


@query("sim_assignment_purity", oracle=SIM_ASSIGN_PURITY_SQL)
def sim_assignment_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass rewrite (r11, the sim_silhouette pattern): the 10
    # centroids (with their norms) collapse to ONE broadcast row of
    # (clabel, cc, arr) structs; each vector computes all 10 cosines
    # AND the (cos_c DESC, clabel ASC) argmax in-row. Identical
    # float x double -> decimal(28,12) term chains, so every cosine is
    # bit-identical to the exploded dot grid's. The |V| x 64 explode +
    # checkpoint, the 1.28M-row dot-grid groupBy, the vnorm pass and
    # the per-vector ranking window all disappear.
    e = Catalog(spark, sf_dir).embeddings
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy(F.col("label").alias("clabel"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )

    def dec_fold(pairs):
        return F.aggregate(
            pairs,
            F.lit(0).cast("decimal(38,12)"),
            lambda a, t: (a + t).cast("decimal(38,12)"),
        ).cast("double")

    cent_row = (
        cent.groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("arr")
        )
        .select(
            "clabel", "arr",
            dec_fold(
                F.transform(
                    "arr", lambda c: (c * c).cast("decimal(28,12)")
                )
            ).alias("cc"),
        )
        .groupBy()
        .agg(
            F.collect_list(F.struct("clabel", "cc", "arr")).alias("cents")
        )
    )
    vv = dec_fold(
        F.transform("embedding", lambda x: (x * x).cast("decimal(28,12)"))
    )
    cos_arr = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            F.round(
                dec_fold(
                    F.zip_with(
                        F.col("embedding"), ct["arr"],
                        lambda x, c: (x * c).cast("decimal(28,12)"),
                    )
                )
                / (F.sqrt(F.col("vv")) * F.sqrt(ct["cc"])), 4,
            ).alias("cos_c"),
            (-ct["clabel"]).alias("neg_l"),
        ),
    )
    assigned = (
        spread(e.select("vec_id", "label", "embedding"))
        .join(F.broadcast(cent_row))
        .select("vec_id", "label", "embedding", vv.alias("vv"), "cents")
        .select(
            "vec_id", "label",
            (-F.array_max(cos_arr)["neg_l"]).alias("assigned"),
        )
    )
    cells = assigned.groupBy("label", "assigned").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    wl = Window.partitionBy("label")
    return cells.select(
        "label", "assigned", "n_vecs",
        F.round(
            F.col("n_vecs") / F.sum("n_vecs").over(wl).cast("double"), 6
        ).alias("share_of_label"),
        F.when(F.col("label") == F.col("assigned"), 1).otherwise(0)
        .cast("bigint").alias("is_correct"),
    ).orderBy("label", "assigned")


# -- sim_silhouette ----------------------------------------------------
#
# Centroid-based silhouette score of the label partitioning: per
# vector, squared Euclidean distance to EVERY label centroid via the
# ||x||² − 2⟨x,c⟩ + ||c||² identity on the same per-dim DECIMAL
# folds as sim_outliers (a(i) = dist to own centroid, b(i) = min
# over the other 9), s(i) = (b−a)/max(a,b). Answers "are the labels
# geometrically coherent clusters?" — the clustering-quality
# companion to sim_outliers' per-vector flag. Scale: explode to
# (vec, dim), one groupBy per (vec, label) dot — |vecs|·|labels|
# partial rows with map-side combine, centroids broadcast; nothing
# O(n²).

SIM_SILHOUETTE_SQL = """
WITH cent AS (
  SELECT label, i AS dim, round(AVG(embedding[i]), 6) AS c
  FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2
), ex AS (
  SELECT vec_id, label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), dists AS (
  SELECT ex.vec_id, ex.label AS own, cent.label AS target,
         CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(28,12))) AS DOUBLE)
           AS d2
  FROM ex JOIN cent USING (dim) GROUP BY 1, 2, 3
), ab AS (
  SELECT vec_id, own,
         round(sqrt(MIN(CASE WHEN target = own THEN d2 END)), 6) AS a,
         round(sqrt(MIN(CASE WHEN target <> own THEN d2 END)), 6) AS b
  FROM dists GROUP BY 1, 2
), sil AS (
  SELECT vec_id, own,
         CASE WHEN a < b THEN 1.0 - a / b
              WHEN a > b THEN b / a - 1.0 ELSE 0.0 END AS s,
         a, b
  FROM ab
)
SELECT own AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       round(CAST(SUM(CAST(round(s, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_silhouette,
       round(CAST(SUM(CAST(a AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_intra,
       round(CAST(SUM(CAST(b AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_nearest_other
FROM sil GROUP BY 1
ORDER BY 1
"""


@query("sim_silhouette", oracle=SIM_SILHOUETTE_SQL)
def sim_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass rewrite (r11): centroids are a |labels| x 64 grid —
    # bounded, so they collapse to ONE broadcast row of (target, arr)
    # structs and every vector computes ALL its centroid distances
    # in-row with zip_with/aggregate (the identical float - double ->
    # decimal(28,12) term chain as the exploded join, so d2 is
    # bit-identical). The |V| x 64 explode, its join on dim, and the
    # |V| x |labels| groupBy all disappear; the only data-sized
    # shuffles left are the centroid average and the final label agg.
    e = Catalog(spark, sf_dir).embeddings
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy(F.col("label").alias("target"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cent_row = (
        cent.groupBy("target")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("arr")
        )
        .groupBy()
        .agg(F.collect_list(F.struct("target", "arr")).alias("cents"))
    )
    d2_expr = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            ct["target"].alias("target"),
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), ct["arr"],
                    lambda x, c: ((x - c) * (x - c)).cast("decimal(28,12)"),
                ),
                F.lit(0).cast("decimal(38,12)"),
                lambda a, t: (a + t).cast("decimal(38,12)"),
            ).cast("double").alias("d2"),
        ),
    )
    ab = (
        spread(e.select("vec_id", F.col("label").alias("own"), "embedding"))
        .join(F.broadcast(cent_row))
        .select("vec_id", "own", d2_expr.alias("d2s"))
        .select(
            "vec_id", "own",
            F.round(
                F.sqrt(
                    F.array_min(
                        F.filter(
                            F.col("d2s"),
                            lambda s: s["target"] == F.col("own"),
                        ).getField("d2")
                    )
                ), 6,
            ).alias("a"),
            F.round(
                F.sqrt(
                    F.array_min(
                        F.filter(
                            F.col("d2s"),
                            lambda s: s["target"] != F.col("own"),
                        ).getField("d2")
                    )
                ), 6,
            ).alias("b"),
        )
    )
    s = (
        F.when(F.col("a") < F.col("b"), F.lit(1.0) - F.col("a") / F.col("b"))
        .when(F.col("a") > F.col("b"), F.col("b") / F.col("a") - F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    sil = ab.select("vec_id", "own", s.alias("s"), "a", "b")
    return (
        sil.groupBy(F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum(F.round("s", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6
            ).alias("mean_silhouette"),
            F.round(
                F.sum(F.col("a").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6
            ).alias("mean_intra"),
            F.round(
                F.sum(F.col("b").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6
            ).alias("mean_nearest_other"),
        )
        .orderBy("label")
    )


# -- sim_davies_bouldin ------------------------------------------------
#
# Davies–Bouldin index of the label partitioning: per label the
# scatter σ_i = mean member-to-centroid distance (the sim_silhouette
# machinery), centroid-pair separations M_ij on a |labels|² grid of
# per-dim DECIMAL folds, R_ij = (σ_i+σ_j)/M_ij, DB_i = max_{j≠i},
# DB = mean over labels. Lower is better; the pairwise-centroid
# complement to sim_silhouette's per-point view (the two indexes
# disagree exactly when clusters are dense but close — worth having
# both). Scale: one explode scan + a 10×10 centroid grid.

SIM_DB_SQL = """
WITH cent AS (
  SELECT label, i AS dim, round(AVG(embedding[i]), 6) AS c
  FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2
), ex AS (
  SELECT vec_id, label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), own AS (
  SELECT vec_id, ex.label,
         round(sqrt(CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(28,12)))
                         AS DOUBLE)), 6) AS d
  FROM ex JOIN cent USING (label, dim) GROUP BY 1, 2
), sigma AS (
  SELECT label,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS s
  FROM own GROUP BY 1
), sep AS (
  SELECT a.label AS la, b.label AS lb,
         round(sqrt(CAST(SUM(CAST((a.c - b.c) * (a.c - b.c)
                                  AS DECIMAL(28,12))) AS DOUBLE)), 6) AS m
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
  GROUP BY 1, 2
), ratio AS (
  SELECT s.la, MAX(round((sa.s + sb.s) / s.m, 6)) AS r
  FROM sep s
  JOIN sigma sa ON sa.label = s.la
  JOIN sigma sb ON sb.label = s.lb
  WHERE s.m > 0
  GROUP BY 1
), db AS (
  SELECT CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS idx
  FROM ratio
)
SELECT g.label, g.n_vecs,
       round(g.s, 6) AS sigma,
       round(r.r, 6) AS db_component,
       round(d.idx, 6) AS db_index
FROM sigma g JOIN ratio r ON r.la = g.label CROSS JOIN db d
ORDER BY g.label
"""


@query("sim_davies_bouldin", oracle=SIM_DB_SQL)
def sim_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cent = cent.cache()  # consumed by own AND both sides of sep
    # In-row member-to-centroid distance (r11, the sim_silhouette
    # pattern): the per-label centroid collapses to a broadcast
    # (label, arr) row and d folds per vector with zip_with/aggregate
    # — identical float - double -> decimal(28,12) terms, so d is
    # bit-identical — replacing the |V| x 64 explode, its (label,
    # dim) join and the |V| x 64 -> |V| groupBy.
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("carr")
    )
    own = (
        spread(e.select("vec_id", "label", "embedding"))
        .join(F.broadcast(cent_arr), "label")
        .select(
            "vec_id", "label",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("embedding"), F.col("carr"),
                            lambda x, c: ((x - c) * (x - c))
                            .cast("decimal(28,12)"),
                        ),
                        F.lit(0).cast("decimal(38,12)"),
                        lambda a, t: (a + t).cast("decimal(38,12)"),
                    ).cast("double")
                ), 6
            ).alias("d"),
        )
    )
    sigma = own.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        (
            F.sum(F.col("d").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("s"),
    )
    sigma = sigma.cache()  # consumed by ratio twice AND the output
    ca = cent.select(
        F.col("label").alias("la"), "dim", F.col("c").alias("cc_a")
    )
    cb = cent.select(
        F.col("label").alias("lb"), "dim", F.col("c").alias("cc_b")
    )
    sep = (
        ca.join(cb, "dim")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        ((F.col("cc_a") - F.col("cc_b"))
                         * (F.col("cc_a") - F.col("cc_b")))
                        .cast("decimal(28,12)")
                    ).cast("double")
                ), 6
            ).alias("m")
        )
    )
    sa = sigma.select(F.col("label").alias("la"), F.col("s").alias("s_a"))
    sb = sigma.select(F.col("label").alias("lb"), F.col("s").alias("s_b"))
    ratio = (
        sep.filter(F.col("m") > 0)
        .join(F.broadcast(sa), "la")
        .join(F.broadcast(sb), "lb")
        .groupBy("la")
        .agg(
            F.max(F.round((F.col("s_a") + F.col("s_b")) / F.col("m"), 6))
            .alias("r")
        )
    )
    ratio = ratio.cache()  # consumed by db AND the output
    db = ratio.agg(
        (
            F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("idx")
    )
    return (
        sigma.join(ratio, sigma.label == ratio.la)
        .join(F.broadcast(db))
        .select(
            "label", "n_vecs",
            F.round("s", 6).alias("sigma"),
            F.round("r", 6).alias("db_component"),
            F.round("idx", 6).alias("db_index"),
        )
        .orderBy("label")
    )


# -- sim_norm_profile --------------------------------------------------
#
# Embedding-norm QA profile per label: ‖v‖ distribution stats (mean,
# CV, min, max) plus a 3σ-outlier count against the GLOBAL norm
# distribution — near-zero or exploding norms are the classic broken-
# embedding symptoms (truncated inference, padding rows, fp16
# overflow) and poison cosine ANN. Per-dim x² DECIMAL folds per
# vector, rounded norms fold exactly per label. Scale: one explode
# scan, two grid-sized rollups.

SIM_NORM_SQL = """
WITH norms AS (
  SELECT vec_id, label,
         round(sqrt(CAST(SUM(CAST(embedding[i] * embedding[i]
                                  AS DECIMAL(28,12))) AS DOUBLE)), 6)
           AS nrm
  FROM embeddings, generate_series(1, 64) AS t(i)
  GROUP BY 1, 2
), g AS (
  SELECT CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(round(nrm * nrm, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS m2
  FROM norms
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*),
             6) AS mean_norm,
       round(sqrt(GREATEST(
               CAST(SUM(CAST(round(nrm * nrm, 9) AS DECIMAL(28,9)))
                    AS DOUBLE) / COUNT(*)
               - (CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*))
                 * (CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*)), 0.0))
             / (CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*)), 6) AS cv_norm,
       round(MIN(nrm), 6) AS min_norm,
       round(MAX(nrm), 6) AS max_norm,
       CAST(SUM(CASE WHEN abs(nrm - g.mu)
                          > 3.0 * sqrt(GREATEST(g.m2 - g.mu * g.mu, 0.0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM norms CROSS JOIN g
GROUP BY label, g.mu, g.m2
ORDER BY label
"""


@query("sim_norm_profile", oracle=SIM_NORM_SQL)
def sim_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    norms = (
        e.select("vec_id", "label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)"))
                    .cast("double")
                ), 6
            ).alias("nrm")
        )
    )
    norms = norms.cache()  # consumed by g AND the per-label rollup
    g = norms.agg(
        (
            F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        (
            F.sum(F.round(F.col("nrm") * F.col("nrm"), 9)
                  .cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    mean_n = (
        F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double")
        / F.count(F.lit(1))
    )
    m2_n = (
        F.sum(F.round(F.col("nrm") * F.col("nrm"), 9).cast("decimal(28,9)"))
        .cast("double") / F.count(F.lit(1))
    )
    return (
        norms.join(F.broadcast(g))
        .groupBy("label", "mu", "m2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(mean_n, 6).alias("mean_norm"),
            F.round(
                F.sqrt(F.greatest(m2_n - mean_n * mean_n, F.lit(0.0)))
                / mean_n, 6
            ).alias("cv_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.sum(
                F.when(
                    F.abs(F.col("nrm") - F.col("mu"))
                    > 3.0 * F.sqrt(
                        F.greatest(
                            F.col("m2") - F.col("mu") * F.col("mu"),
                            F.lit(0.0),
                        )
                    ),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "label", "n_vecs", "mean_norm", "cv_norm", "min_norm",
            "max_norm", "n_outliers",
        )
        .orderBy("label")
    )


# -- sim_lsh_recall ----------------------------------------------------
#
# EXACTLY-verifiable LSH evaluation: an md5-portable signed-random-
# projection index (sign(plane j, dim i) from the md5 hex parity —
# both engines derive the identical hyperplanes) probed with 1-bit
# multiprobe, scored as recall@10 against the exact brute-force
# top-10 for 20 query vectors. The production LSH
# (operators.similarity.lsh_topk, xxhash64 planes) is rows-only by
# necessity; THIS twin makes the bucketing math itself
# hash-checkable, like the dedup_*_portable signature twins.
# Projections fold per-dim DECIMAL(18,9)-rounded terms (order-
# independent sign decisions); cosines fold DECIMAL(28,12) products.
# Scale: one explode scan → 512-row plane grid → bucket table;
# query×corpus scoring is the 20-query eval harness, not the
# serving path.

N_RECALL_QUERIES = 20
N_RECALL_PLANES = 8

LSH_RECALL_SQL = f"""
WITH ex AS (
  SELECT vec_id, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), signs AS (
  SELECT d.i AS dim, p.j AS plane,
         CASE WHEN substr(md5('p' || CAST(p.j AS VARCHAR) || '|'
                            || CAST(d.i AS VARCHAR)), 1, 1) < '8'
              THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(1, 64) AS d(i)
  CROSS JOIN generate_series(0, {N_RECALL_PLANES - 1}) AS p(j)
), proj AS (
  SELECT e.vec_id, s.plane,
         CAST(SUM(CAST(round(e.x * s.s, 9) AS DECIMAL(18,9)))
              AS DECIMAL(28,9)) AS pr
  FROM ex e JOIN signs s ON s.dim = e.dim
  GROUP BY 1, 2
), buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr > 0 THEN 1 << plane ELSE 0 END) AS BIGINT)
           AS bucket
  FROM proj GROUP BY 1
), qs AS (
  SELECT vec_id AS q FROM embeddings WHERE vec_id < {N_RECALL_QUERIES}
), pairs AS (
  SELECT q.q, b.vec_id AS v,
         CAST(SUM(CAST(eq.x * ev.x AS DECIMAL(28,12))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(eq.x * eq.x AS DECIMAL(28,12))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(ev.x * ev.x AS DECIMAL(28,12))) AS DOUBLE) AS vv
  FROM qs q
  JOIN ex eq ON eq.vec_id = q.q
  JOIN ex ev ON ev.dim = eq.dim
  JOIN buckets b ON b.vec_id = ev.vec_id
  WHERE ev.vec_id <> q.q
  GROUP BY 1, 2
), scored AS (
  SELECT q, v, round(dot / (sqrt(qq) * sqrt(vv)), 4) AS cos
  FROM pairs
), exact AS (
  SELECT q, v FROM (
    SELECT q, v,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, v) AS rn
    FROM scored) t
  WHERE rn <= 10
), approx AS (
  SELECT q, v FROM (
    SELECT s.q, s.v,
           ROW_NUMBER() OVER (PARTITION BY s.q
                              ORDER BY s.cos DESC, s.v) AS rn
    FROM scored s
    JOIN buckets bq ON bq.vec_id = s.q
    JOIN buckets bv ON bv.vec_id = s.v
    WHERE bit_count(xor(bq.bucket, bv.bucket))
          <= 1) t
  WHERE rn <= 10
), cand AS (
  SELECT s.q, CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM scored s
  JOIN buckets bq ON bq.vec_id = s.q
  JOIN buckets bv ON bv.vec_id = s.v
  WHERE bit_count(xor(bq.bucket, bv.bucket))
        <= 1
  GROUP BY 1
), rec AS (
  SELECT e.q, CAST(COUNT(a.v) AS BIGINT) AS n_hit
  FROM exact e LEFT JOIN approx a ON a.q = e.q AND a.v = e.v
  GROUP BY 1
), mean_r AS (
  SELECT CAST(SUM(CAST(n_hit AS DECIMAL(18,6))) AS DOUBLE)
           / (10.0 * COUNT(*)) AS mr
  FROM rec
)
SELECT r.q AS vec_id, b.bucket,
       COALESCE(c.n_candidates, 0) AS n_candidates,
       r.n_hit,
       round(r.n_hit / 10.0, 6) AS recall_at_10,
       round(m.mr, 6) AS mean_recall
FROM rec r
JOIN buckets b ON b.vec_id = r.q
LEFT JOIN cand c ON c.q = r.q
CROSS JOIN mean_r m
ORDER BY r.q
"""


@query("sim_lsh_recall", oracle=LSH_RECALL_SQL)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # In-row rewrite (r11): the hyperplanes are DATA-INDEPENDENT
    # constants (md5 parity of "p<plane>|<dim>" literals), so they
    # fold into the plan as literal sign arrays instead of a 512-row
    # signs table joined against a (vec x dim) explode. Projections,
    # buckets and self-norms are per-row zip_with/aggregate folds over
    # the embedding array (same float->double->round->decimal chain as
    # the exploded join, term for term, so every decimal is
    # bit-identical), and the query side is a 20-row broadcast — the
    # |V|x64-row explode, its SortMergeJoin on dim, and the
    # 20x|V|x64-row groupBy all disappear. Exact decimal accumulators
    # ride the fold (order = array order; decimal addition is exact,
    # so any order gives the oracle's sum).
    import hashlib

    signs = [
        [
            1.0
            if hashlib.md5(f"p{j}|{i}".encode()).hexdigest()[0] < "8"
            else -1.0
            for i in range(1, 65)
        ]
        for j in range(N_RECALL_PLANES)
    ]

    def proj_positive(plane: int):
        sarr = F.array(*[F.lit(s) for s in signs[plane]])
        acc = F.aggregate(
            F.zip_with(
                F.col("embedding"), sarr,
                lambda x, s: F.round(x * s, 9).cast("decimal(18,9)"),
            ),
            F.lit(0).cast("decimal(28,9)"),
            lambda a, x: (a + x).cast("decimal(28,9)"),
        )
        return F.when(acc > 0, F.lit(1 << plane)).otherwise(F.lit(0))

    def dec_dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: (x * y).cast("decimal(28,12)")),
            F.lit(0).cast("decimal(38,12)"),
            lambda a, x: (a + x).cast("decimal(38,12)"),
        ).cast("double")

    e = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
    bucket = sum(
        (proj_positive(j) for j in range(N_RECALL_PLANES)), F.lit(0)
    ).cast("bigint")
    corpus = spread(e).select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("ev"),
        bucket.alias("b_v"),
        dec_dot(F.col("embedding"), F.col("embedding")).alias("vv"),
    )
    corpus = corpus.cache()  # scored stream side AND the query slice
    qs = corpus.filter(F.col("v") < N_RECALL_QUERIES).select(
        F.col("v").alias("q"), F.col("ev").alias("eq"),
        F.col("b_v").alias("b_q"), F.col("vv").alias("qq"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("v") != F.col("q"))
        .select(
            "q", "v", "b_q", "b_v",
            F.round(
                dec_dot(F.col("eq"), F.col("ev"))
                / (F.sqrt("qq") * F.sqrt("vv")), 4
            ).alias("cos"),
        )
    )
    scored = scored.cache()  # consumed by exact AND approx rankings
    wq = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("v"))
    exact = scored.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= 10
    ).select("q", "v")
    bq = qs.select("q", "b_q")
    near = scored.filter(
        F.bit_count(F.col("b_q").bitwiseXOR(F.col("b_v"))) <= 1
    )
    near = near.cache()  # consumed by approx ranking AND candidate counts
    approx = near.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= 10
    ).select("q", "v")
    cand = near.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    rec = (
        exact.join(approx.withColumn("hit", F.lit(1)), ["q", "v"], "left")
        .groupBy("q")
        .agg(F.count("hit").cast("bigint").alias("n_hit"))
    )
    rec = rec.cache()  # consumed by mean_r AND the output
    mean_r = rec.agg(
        (
            F.sum(F.col("n_hit").cast("decimal(18,6)")).cast("double")
            / (10.0 * F.count(F.lit(1)))
        ).alias("mr")
    )
    return (
        rec.join(bq, "q")
        .join(cand, "q", "left")
        .join(F.broadcast(mean_r))
        .select(
            F.col("q").alias("vec_id"),
            F.col("b_q").alias("bucket"),
            F.coalesce("n_candidates", F.lit(0)).cast("bigint")
            .alias("n_candidates"),
            "n_hit",
            F.round(F.col("n_hit") / 10.0, 6).alias("recall_at_10"),
            F.round("mr", 6).alias("mean_recall"),
        )
        .orderBy("vec_id")
    )


# -- shared embedding covariance grid ----------------------------------
#
# Both spectral entries (sim_pca_power, q_second_pc) start from the
# same 64x64 covariance grid. The Gram pass is the dominant cost
# (n*d^2 product rows), so it runs on the UPPER TRIANGLE only
# (b.i >= a.i — half the rows; the mirror is a grid-sized copy) and
# folds with LONG-BACKED 1e-9-scaled sums: round(x*y*1e9) as BIGINT
# is the same 9-decimal rounding as the decimal(28,9) fold but sums
# ~3x faster (the q_elasticity narrowing, PERF.md). Range: |x*y|*1e9
# is ~1e10/term, so the long fold holds past 1e8 vectors. The grid
# is eagerly localCheckpoint-ed so every downstream matvec starts
# from a flat 4096-row scan (PERF.md #47 lineage discipline).

_COV_SQL = """WITH w AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), e AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM w
), n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
mu AS MATERIALIZED (
  SELECT i, CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
            / (SELECT n FROM n_tot) AS m
  FROM e GROUP BY 1
), gram_ut AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(SUM(CAST(round(a.x * b.x * 1000000000.0, 0) AS BIGINT))
              AS DOUBLE) / 1000000000.0 AS s
  FROM e a JOIN e b ON b.vec_id = a.vec_id AND b.i >= a.i
  GROUP BY 1, 2
), gram AS (
  SELECT i, j, s FROM gram_ut
  UNION ALL
  SELECT j AS i, i AS j, s FROM gram_ut WHERE i < j
), c AS MATERIALIZED (
  SELECT g.i, g.j, g.s / (SELECT n FROM n_tot) - mi.m * mj.m AS cv
  FROM gram g JOIN mu mi ON mi.i = g.i JOIN mu mj ON mj.i = g.j
)"""


# Registry-level share (r9): sim_pca_power and q_second_pc both start
# from this grid, and the n*d^2 Gram pass dominates both entries'
# cost. The checkpointed 4096-row result is memoized per
# (application, sf_dir) so the second caller in a session (bench
# sweep, driver gate) reuses the materialized grid instead of
# re-running the Gram join — same plan, same values, half the family
# cost. The cache holds only grid-sized (64x64) frames.
_COV_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cov_grid(spark: SparkSession, sf_dir: str):
    """(i, j, cv) 64x64 covariance grid, eagerly checkpointed and
    memoized per (application, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _COV_CACHE.get(key)
    if hit is not None:
        return hit
    emb = Catalog(spark, sf_dir).embeddings
    e = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", (F.col("pos") + 1).alias("i"), F.col("col").alias("x"))
    e = e.cache()  # consumed by mu AND both Gram sides
    n = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    mu = (
        e.groupBy("i")
        .agg(
            F.sum(F.round("x", 9).cast("decimal(28,9)")).cast("double")
            .alias("sm")
        )
        .join(F.broadcast(n))
        .select("i", (F.col("sm") / F.col("n")).alias("m"))
    )
    a, b = e.alias("a"), e.alias("b")
    gram_ut = (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id"))
            & (F.col("b.i") >= F.col("a.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            (
                F.sum(
                    F.round(F.col("a.x") * F.col("b.x") * 1000000000.0, 0)
                    .cast("long")
                ).cast("double")
                / 1000000000.0
            ).alias("s")
        )
    )
    # Checkpoint BEFORE the mirror union: Spark does no CSE across
    # union branches, so an un-materialized gram_ut would run the
    # expensive self-join twice (the union-subtree-duplication trap).
    gram_ut = gram_ut.localCheckpoint()
    gram = gram_ut.unionAll(
        gram_ut.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s"
        )
    )
    mi = mu.select(F.col("i").alias("mi_i"), F.col("m").alias("mi"))
    mj = mu.select(F.col("i").alias("mj_j"), F.col("m").alias("mj"))
    c = (
        gram.join(F.broadcast(n))
        .join(F.broadcast(mi), F.col("mi_i") == F.col("i"))
        .join(F.broadcast(mj), F.col("mj_j") == F.col("j"))
        .select(
            "i", "j",
            (F.col("s") / F.col("n") - F.col("mi") * F.col("mj")).alias("cv"),
        )
    )
    c = c.localCheckpoint()
    e.unpersist()
    _COV_CACHE[key] = c
    return c


# -- sim_pca_power -----------------------------------------------------
#
# Top principal component of the embedding cloud by THREE unrolled
# power-iteration rounds over the explicit 64×64 covariance grid —
# the dimensionality-reduction primitive behind whitening, drift
# visualization and sim_dim_tradeoff's truncation choices. The Gram
# pass is the documented n·d² shape (per-vector outer products,
# map-side combined into d² cells — whole vectors are never
# shuffled), shared with q_second_pc via _cov_grid (upper-triangle
# long-backed folds, see above); every downstream fold (matvecs,
# norms, Rayleigh quotient, trace) rounds terms to DECIMAL(28,9) so
# the across-row sums are exact and order-independent. v₀ = 1/8·𝟙 (unit
# norm at d = 64, exact in binary); each round renormalizes and
# 9-rounds v so both engines iterate identical doubles. Output: the
# top-8 |loading| dims with the Rayleigh eigenvalue estimate and its
# explained-variance share of trace(C).

PCA_SQL = _COV_SQL + """, v0 AS (SELECT r.range AS j, 0.125 AS val FROM range(1, 65) r),
u1 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v0 v ON v.j = c.j GROUP BY 1
), n1 AS (
  SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u1
), v1 AS (SELECT j, round(u / (SELECT nr FROM n1), 9) AS val FROM u1),
u2 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v1 v ON v.j = c.j GROUP BY 1
), n2 AS (
  SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u2
), v2 AS (SELECT j, round(u / (SELECT nr FROM n2), 9) AS val FROM u2),
u3 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v2 v ON v.j = c.j GROUP BY 1
), n3 AS (
  SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u3
), v3 AS (SELECT j, round(u / (SELECT nr FROM n3), 9) AS val FROM u3),
cv3 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                   AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v3 v ON v.j = c.j GROUP BY 1
), lam AS (
  SELECT CAST(SUM(CAST(round(v3.val * cv3.u, 9) AS DECIMAL(28,9)))
         AS DOUBLE) AS l
  FROM v3 JOIN cv3 ON cv3.j = v3.j
), tr AS (
  SELECT CAST(SUM(CAST(round(cv, 9) AS DECIMAL(28,9))) AS DOUBLE) AS t
  FROM c WHERE i = j
), ranked AS (
  SELECT j, val, ROW_NUMBER() OVER (ORDER BY abs(val) DESC, j) AS rk
  FROM v3
)
SELECT CAST(r.j AS BIGINT) AS dim, round(r.val, 6) AS loading,
       CAST(r.rk AS BIGINT) AS rank,
       round(lam.l, 6) AS eigenvalue,
       round(lam.l / tr.t, 6) AS explained_share
FROM ranked r CROSS JOIN lam CROSS JOIN tr
WHERE r.rk <= 8 ORDER BY r.rk
"""


@query("sim_pca_power", oracle=PCA_SQL)
def sim_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cov_grid(spark, sf_dir)  # checkpointed; drives 3 matvecs + trace
    v = spark.range(1, 65).select(
        F.col("id").alias("j"), F.lit(0.125).alias("val")
    )
    for _ in range(3):
        u = (
            c.join(F.broadcast(v), "j")
            .groupBy(F.col("i").alias("j"))
            .agg(
                F.sum(
                    F.round(F.col("cv") * F.col("val"), 9).cast("decimal(28,9)")
                ).cast("double").alias("u")
            )
        )
        u = u.cache()  # consumed by the norm AND the renormalized v
        nr = u.agg(
            F.sqrt(
                F.sum(F.round(F.col("u") * F.col("u"), 9).cast("decimal(28,9)"))
                .cast("double")
            ).alias("nr")
        )
        v = u.join(F.broadcast(nr)).select(
            "j", F.round(F.col("u") / F.col("nr"), 9).alias("val")
        )
    v = v.cache()  # consumed by the Rayleigh quotient AND the output rows
    cv3 = (
        c.join(F.broadcast(v), "j")
        .groupBy(F.col("i").alias("j"))
        .agg(
            F.sum(
                F.round(F.col("cv") * F.col("val"), 9).cast("decimal(28,9)")
            ).cast("double").alias("u")
        )
    )
    lam = (
        v.join(cv3, "j")
        .agg(
            F.sum(
                F.round(F.col("val") * F.col("u"), 9).cast("decimal(28,9)")
            ).cast("double").alias("l")
        )
    )
    tr = c.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.round("cv", 9).cast("decimal(28,9)")).cast("double").alias("t")
    )
    ranked = v.select(
        "j", "val",
        F.row_number().over(
            Window.orderBy(F.abs(F.col("val")).desc(), "j")
        ).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 8)
        .join(F.broadcast(lam))
        .join(F.broadcast(tr))
        .select(
            F.col("j").cast("bigint").alias("dim"),
            F.round("val", 6).alias("loading"),
            F.col("rk").cast("bigint").alias("rank"),
            F.round("l", 6).alias("eigenvalue"),
            F.round(F.col("l") / F.col("t"), 6).alias("explained_share"),
        )
        .orderBy("rank")
    )


# -- q_second_pc -------------------------------------------------------
#
# Spectral summary of the embedding covariance: after sim_pca_power's
# three-round top component, DEFLATE (C₂ = C − λ₁v₁v₁′) and run two
# more power rounds for the second eigenpair — λ₂/λ₁ (the eigengap)
# is the "is one direction dominating?" diagnostic that decides
# whether PCA-whitening or a 1-D drift projection is safe, and the
# two Rayleigh quotients are labeled BY SIZE (on a near-isotropic
# cloud the fixed 3+2 rounds leave them statistically tied, so the
# deflated pass can out-Rayleigh the first — ratio ≈ 1 IS the
# diagnostic answer: no dominant direction), and the
# cumulative explained share says how 2-dimensional the cloud really
# is. Same determinism contract as sim_pca_power (the shared
# _cov_grid Gram, decimal matvec/norm folds, 9-rounded renormalized
# vectors); the
# deflated matrix is a 4096-cell grid join, never materialized
# per-row. Scale: identical to sim_pca_power — one n·d² Gram pass,
# then grid-sized algebra.

SECOND_PC_SQL = _COV_SQL + """, v0 AS (SELECT r.range AS j, 0.125 AS val FROM range(1, 65) r),
u1 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v0 v ON v.j = c.j GROUP BY 1
), n1 AS (SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u1),
v1 AS (SELECT j, round(u / (SELECT nr FROM n1), 9) AS val FROM u1),
u2 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v1 v ON v.j = c.j GROUP BY 1
), n2 AS (SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u2),
v2 AS (SELECT j, round(u / (SELECT nr FROM n2), 9) AS val FROM u2),
u3 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v2 v ON v.j = c.j GROUP BY 1
), n3 AS (SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM u3),
v3 AS MATERIALIZED (SELECT j, round(u / (SELECT nr FROM n3), 9) AS val FROM u3),
cv3 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                   AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c JOIN v3 v ON v.j = c.j GROUP BY 1
), lam1 AS (
  SELECT CAST(SUM(CAST(round(v3.val * cv3.u, 9) AS DECIMAL(28,9)))
         AS DOUBLE) AS l
  FROM v3 JOIN cv3 ON cv3.j = v3.j
), c2 AS MATERIALIZED (
  SELECT c.i, c.j,
         c.cv - (SELECT l FROM lam1) * vi.val * vj.val AS cv
  FROM c JOIN v3 vi ON vi.j = c.i JOIN v3 vj ON vj.j = c.j
), w0 AS (
  SELECT r.range AS j,
         CASE WHEN r.range % 2 = 1 THEN 0.125 ELSE -0.125 END AS val
  FROM range(1, 65) r
), x1 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c2 c JOIN w0 v ON v.j = c.j GROUP BY 1
), m1 AS (SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM x1),
w1 AS (SELECT j, round(u / (SELECT nr FROM m1), 9) AS val FROM x1),
x2 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                  AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c2 c JOIN w1 v ON v.j = c.j GROUP BY 1
), m2 AS (SELECT sqrt(CAST(SUM(CAST(round(u * u, 9) AS DECIMAL(28,9)))
              AS DOUBLE)) AS nr FROM x2),
w2 AS MATERIALIZED (SELECT j, round(u / (SELECT nr FROM m2), 9) AS val FROM x2),
cw2 AS (
  SELECT c.i AS j, CAST(SUM(CAST(round(c.cv * v.val, 9)
                   AS DECIMAL(28,9))) AS DOUBLE) AS u
  FROM c2 c JOIN w2 v ON v.j = c.j GROUP BY 1
), lam2 AS (
  SELECT CAST(SUM(CAST(round(w2.val * cw2.u, 9) AS DECIMAL(28,9)))
         AS DOUBLE) AS l
  FROM w2 JOIN cw2 ON cw2.j = w2.j
), tr AS (
  SELECT CAST(SUM(CAST(round(cv, 9) AS DECIMAL(28,9))) AS DOUBLE) AS t
  FROM c WHERE i = j
)
SELECT round(GREATEST(l1.l, l2.l), 6) AS lambda1,
       round(LEAST(l1.l, l2.l), 6) AS lambda2,
       round(LEAST(l1.l, l2.l) / GREATEST(l1.l, l2.l), 6) AS eigengap_ratio,
       round(GREATEST(l1.l, l2.l) / tr.t, 6) AS explained_1,
       round(LEAST(l1.l, l2.l) / tr.t, 6) AS explained_2,
       round((l1.l + l2.l) / tr.t, 6) AS cum_explained
FROM lam1 l1 CROSS JOIN lam2 l2 CROSS JOIN tr
"""


@query("q_second_pc", oracle=SECOND_PC_SQL)
def q_second_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _cov_grid is eagerly checkpointed (mr_pagerank precedent): every
    # matvec below starts from a flat 4096-row scan — without it the
    # 5-round iterative plan nests joins-of-joins deep enough that
    # Catalyst tree-walks overflow the stack.
    c = _cov_grid(spark, sf_dir)

    def matvec(cgrid: DataFrame, v: DataFrame) -> DataFrame:
        return (
            cgrid.join(F.broadcast(v), "j")
            .groupBy(F.col("i").alias("j"))
            .agg(
                F.sum(
                    F.round(F.col("cv") * F.col("val"), 9).cast("decimal(28,9)")
                ).cast("double").alias("u")
            )
        )

    def normalize(u: DataFrame) -> DataFrame:
        u = u.localCheckpoint()  # 64 rows; truncates the per-round lineage
        nr = u.agg(
            F.sqrt(
                F.sum(F.round(F.col("u") * F.col("u"), 9).cast("decimal(28,9)"))
                .cast("double")
            ).alias("nr")
        )
        return u.join(F.broadcast(nr)).select(
            "j", F.round(F.col("u") / F.col("nr"), 9).alias("val")
        )

    def rayleigh(cgrid: DataFrame, v: DataFrame):
        cv = matvec(cgrid, v)
        return (
            v.join(cv, "j")
            .agg(
                F.sum(
                    F.round(F.col("val") * F.col("u"), 9).cast("decimal(28,9)")
                ).cast("double").alias("l")
            )
        )

    v = spark.range(1, 65).select(
        F.col("id").alias("j"), F.lit(0.125).alias("val")
    )
    for _ in range(3):
        v = normalize(matvec(c, v))
    v = v.localCheckpoint()
    lam1 = rayleigh(c, v)
    vi = v.select(F.col("j").alias("vi_j"), F.col("val").alias("vi"))
    vj = v.select(F.col("j").alias("vj_j"), F.col("val").alias("vj"))
    c2 = (
        c.join(F.broadcast(lam1))
        .join(F.broadcast(vi), F.col("vi_j") == F.col("i"))
        .join(F.broadcast(vj), F.col("vj_j") == F.col("j"))
        .select(
            "i", "j",
            (F.col("cv") - F.col("l") * F.col("vi") * F.col("vj")).alias("cv"),
        )
    )
    c2 = c2.localCheckpoint()
    w = spark.range(1, 65).select(
        F.col("id").alias("j"),
        F.when(F.col("id") % 2 == 1, 0.125).otherwise(-0.125).alias("val"),
    )
    for _ in range(2):
        w = normalize(matvec(c2, w))
    w = w.localCheckpoint()
    lam2 = rayleigh(c2, w).withColumnRenamed("l", "l2")
    tr = c.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.round("cv", 9).cast("decimal(28,9)")).cast("double").alias("t")
    )
    return (
        lam1.join(F.broadcast(lam2))
        .join(F.broadcast(tr))
        .select(
            F.round(F.greatest("l", "l2"), 6).alias("lambda1"),
            F.round(F.least("l", "l2"), 6).alias("lambda2"),
            F.round(F.least("l", "l2") / F.greatest("l", "l2"), 6).alias(
                "eigengap_ratio"
            ),
            F.round(F.greatest("l", "l2") / F.col("t"), 6).alias("explained_1"),
            F.round(F.least("l", "l2") / F.col("t"), 6).alias("explained_2"),
            F.round((F.col("l") + F.col("l2")) / F.col("t"), 6)
            .alias("cum_explained"),
        )
    )


# -- sim_centroid_shift ------------------------------------------------
#
# Embedding-drift monitor: per-label centroid of the FIRST id-half of
# the corpus vs the SECOND (vec_id < median id as the deterministic
# "before/after" split), reporting centroid cosine, L2 shift, and a
# drifted flag — the embedding-space counterpart of q_psi_drift
# (tabular bins) and q_wasserstein_drift (1-D values): when a model
# or upstream corpus changes, per-label centroids move first.
# Centroid sums fold 9-rounded decimals per (label, half, dim); the
# cosine/L2 chain runs on the |labels| x 64 grid only. Scale: one
# embeddings scan partial-aggregated to the label-dim grid; no
# pairwise work.

CENTROID_SHIFT_SQL = """
WITH mid AS (
  SELECT CAST(round(CAST(MAX(vec_id) AS DOUBLE) / 2, 0) AS BIGINT) AS m
  FROM embeddings
), ex AS (
  SELECT label,
         CASE WHEN vec_id < (SELECT m FROM mid) THEN 0 ELSE 1 END AS half,
         i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), cent AS (
  SELECT label, half, dim,
         CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS c
  FROM ex GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.label, a.dim, a.c AS c0, b.c AS c1
  FROM cent a JOIN cent b
    ON b.label = a.label AND b.dim = a.dim AND a.half = 0 AND b.half = 1
), dots AS (
  SELECT label,
         CAST(SUM(CAST(round(c0 * c1, 12) AS DECIMAL(28,12))) AS DOUBLE)
           AS dot,
         CAST(SUM(CAST(round(c0 * c0, 12) AS DECIMAL(28,12))) AS DOUBLE)
           AS n0,
         CAST(SUM(CAST(round(c1 * c1, 12) AS DECIMAL(28,12))) AS DOUBLE)
           AS n1,
         CAST(SUM(CAST(round((c1 - c0) * (c1 - c0), 12) AS DECIMAL(28,12)))
              AS DOUBLE) AS d2
  FROM pairs GROUP BY 1
)
SELECT label,
       round(dot / (sqrt(n0) * sqrt(n1)), 6) AS centroid_cos,
       round(sqrt(d2), 6) AS l2_shift,
       CASE WHEN dot / (sqrt(n0) * sqrt(n1)) < 0.95 THEN 1 ELSE 0 END
         AS drifted
FROM dots WHERE n0 > 0 AND n1 > 0
ORDER BY label
"""


@query("sim_centroid_shift", oracle=CENTROID_SHIFT_SQL)
def sim_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    mid = emb.agg(
        F.round(F.max("vec_id").cast("double") / 2, 0)
        .cast("bigint")
        .alias("m")
    )
    ex = (
        emb.crossJoin(F.broadcast(mid))
        .select(
            "label",
            F.when(F.col("vec_id") < F.col("m"), 0).otherwise(1).alias("half"),
            F.posexplode(F.col("embedding").cast("array<double>")),
        )
        .select("label", "half", (F.col("pos") + 1).alias("dim"), "col")
    )
    cent = ex.groupBy("label", "half", "dim").agg(
        (
            F.sum(F.round("col", 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    c0 = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0")
    )
    c1 = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c1")
    )
    pairs = c0.join(c1, ["label", "dim"])
    dots = pairs.groupBy("label").agg(
        F.sum(F.round(F.col("c0") * F.col("c1"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("dot"),
        F.sum(F.round(F.col("c0") * F.col("c0"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("n0"),
        F.sum(F.round(F.col("c1") * F.col("c1"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("n1"),
        F.sum(
            F.round(
                (F.col("c1") - F.col("c0")) * (F.col("c1") - F.col("c0")), 12
            ).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("d2"),
    )
    cos = F.col("dot") / (F.sqrt(F.col("n0")) * F.sqrt(F.col("n1")))
    return (
        dots.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "label",
            F.round(cos, 6).alias("centroid_cos"),
            F.round(F.sqrt("d2"), 6).alias("l2_shift"),
            F.when(cos < 0.95, 1).otherwise(0).alias("drifted"),
        )
        .orderBy("label")
    )


# -- sim_hubness -------------------------------------------------------
#
# Hubness diagnostic of the embedding space (Radovanović et al. 2010):
# in high dimensions the k-occurrence distribution N_k (how often a
# vector appears in other points' top-k) grows right-skewed — a few
# "hub" vectors dominate neighbor lists and silently distort kNN
# retrieval, dedup and diversity sampling. Computed over the
# deterministic vec_id % 5 == 0 query sample (the standard sampled-
# hubness estimator; candidates remain the FULL corpus) with the
# house exact cosine top-10 (S.knn_join_bruteforce — sequential dot
# fold matches DuckDB list_sum order). N_k are INTEGERS, so the
# skewness raw moments Σc, Σc², Σc³ fold exactly as BIGINTs and the
# g₁ assembly is one identical double chain. Scale: |sample|×|corpus|
# scored pairs — 5× the sim_knn_join shape; the production path swaps
# in the IVF join, the estimator is unchanged.

HUB_K = 10

SIM_HUBNESS_SQL = f"""
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                      x -> x * x))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM w WHERE vec_id % 5 = 0
), scored AS (
  SELECT q.q_id, b.vec_id AS c_id,
         round(list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
               / (b.nrm * q.qn), 4) AS score
  FROM w b, q WHERE b.vec_id != q.q_id
), r AS (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY score DESC, c_id) AS rn
  FROM scored
), occ AS (
  SELECT a.vec_id, CAST(COALESCE(h.c, 0) AS BIGINT) AS nk
  FROM (SELECT vec_id FROM embeddings) a
  LEFT JOIN (SELECT c_id, COUNT(*) AS c FROM r WHERE rn <= {HUB_K}
             GROUP BY 1) h
    ON a.vec_id = h.c_id
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(nk) AS BIGINT) AS s1,
         CAST(SUM(nk * nk) AS BIGINT) AS s2,
         CAST(SUM(nk * nk * nk) AS BIGINT) AS s3,
         CAST(MAX(nk) AS BIGINT) AS max_occ,
         CAST(SUM(CASE WHEN nk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_never
  FROM occ
), hub AS (
  SELECT vec_id AS hub_vec_id, nk AS hub_occ
  FROM occ ORDER BY nk DESC, vec_id LIMIT 1
)
SELECT m.n AS n_vectors, m.s1 AS total_occurrences,
       round(CAST(m.s1 AS DOUBLE) / m.n, 6) AS mean_occ,
       round((CAST(m.s3 AS DOUBLE) / m.n
              - 3.0 * (CAST(m.s1 AS DOUBLE) / m.n)
                * (CAST(m.s2 AS DOUBLE) / m.n)
              + 2.0 * (CAST(m.s1 AS DOUBLE) / m.n)
                * (CAST(m.s1 AS DOUBLE) / m.n)
                * (CAST(m.s1 AS DOUBLE) / m.n))
             / pow(CAST(m.s2 AS DOUBLE) / m.n
                   - (CAST(m.s1 AS DOUBLE) / m.n)
                     * (CAST(m.s1 AS DOUBLE) / m.n), 1.5), 6)
         AS skewness,
       m.max_occ, m.n_never,
       h.hub_vec_id, h.hub_occ
FROM mom m CROSS JOIN hub h
WHERE m.s2 * m.n > m.s1 * m.s1
"""


@query("sim_hubness", oracle=SIM_HUBNESS_SQL)
def sim_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    knn = S.knn_join_bruteforce(
        e.filter(F.col("vec_id") % 5 == 0), e, k=HUB_K
    )
    h = knn.groupBy(F.col("c_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("c")
    )
    occ = (
        e.select("vec_id")
        .join(F.broadcast(h), "vec_id", "left")
        .select(
            "vec_id", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("nk")
        )
    )
    occ = occ.cache()  # |corpus| id/count rows: feeds moments AND argmax
    nk = F.col("nk")
    mom = occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(nk).cast("bigint").alias("s1"),
        F.sum(nk * nk).cast("bigint").alias("s2"),
        F.sum(nk * nk * nk).cast("bigint").alias("s3"),
        F.max(nk).cast("bigint").alias("max_occ"),
        F.sum(F.when(nk == 0, 1).otherwise(0)).cast("bigint").alias(
            "n_never"
        ),
    )
    hub = (
        occ.orderBy(F.desc("nk"), "vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("hub_vec_id"), F.col("nk").alias("hub_occ")
        )
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - 3.0 * mu * (F.col("s2").cast("double") / n)
        + 2.0 * mu * mu * mu
    )
    return (
        mom.filter(
            F.col("s2") * F.col("n") > F.col("s1") * F.col("s1")
        )
        .join(F.broadcast(hub))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("s1").alias("total_occurrences"),
            F.round(mu, 6).alias("mean_occ"),
            F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
            "max_occ",
            "n_never",
            "hub_vec_id",
            "hub_occ",
        )
    )


# -- sim_margin_audit --------------------------------------------------
#
# Triplet-margin separability audit of the labeled embedding space:
# for each sampled anchor (vec_id % 5 == 0 — the sim_hubness sample
# convention), the best SAME-label cosine and the best CROSS-label
# cosine over the full corpus, per-label means and the violation rate
# (cross beats same — the pairs a contrastive fine-tune would fix,
# and the vectors a label-blocked dedup would wrongly merge). MAX of
# 4-rounded scores needs no tie-break; per-label means fold 6-rounded
# decimal sums. Scale: the same one-pass broadcast-anchor scan as
# sim_knn_join — no per-label shuffle of vectors.

SIM_MARGIN_SQL = """
WITH w AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                      x -> x * x))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM w WHERE vec_id % 5 = 0
), scored AS (
  SELECT q.q_id, q.q_label, w.label AS c_label,
         round(list_sum(list_transform(range(1, 65), i -> w.v[i] * q.qv[i]))
               / (w.nrm * q.qn), 4) AS score
  FROM w, q WHERE w.vec_id != q.q_id
), per_q AS (
  SELECT q_id, q_label,
         MAX(CASE WHEN c_label = q_label THEN score END) AS same_top1,
         MAX(CASE WHEN c_label != q_label THEN score END) AS cross_top1
  FROM scored GROUP BY 1, 2
)
SELECT q_label AS label, CAST(COUNT(*) AS BIGINT) AS n_anchors,
       round(CAST(SUM(CAST(round(same_top1, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_same_top1,
       round(CAST(SUM(CAST(round(cross_top1, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_cross_top1,
       round(CAST(SUM(CAST(round(same_top1 - cross_top1, 6)
                  AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_margin,
       round(SUM(CASE WHEN cross_top1 > same_top1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS violation_rate
FROM per_q
WHERE same_top1 IS NOT NULL AND cross_top1 IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


@query("sim_margin_audit", oracle=SIM_MARGIN_SQL)
def sim_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from redmap_spark.operators.similarity import as_double_vec, dot, norm

    w = spread(
        e.select("vec_id", "label", as_double_vec("embedding").alias("v"))
    ).withColumn("nrm", norm(F.col("v")))
    q = (
        w.filter(F.col("vec_id") % 5 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    scored = w.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "q_label",
        F.col("label").alias("c_label"),
        F.round(
            dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 4
        ).alias("score"),
    )
    per_q = scored.groupBy("q_id", "q_label").agg(
        F.max(
            F.when(F.col("c_label") == F.col("q_label"), F.col("score"))
        ).alias("same_top1"),
        F.max(
            F.when(F.col("c_label") != F.col("q_label"), F.col("score"))
        ).alias("cross_top1"),
    )
    st, ct = F.col("same_top1"), F.col("cross_top1")

    def dmean6(expr, name):
        return F.round(
            F.sum(F.round(expr, 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias(name)

    return (
        per_q.filter(st.isNotNull() & ct.isNotNull())
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
            dmean6(st, "mean_same_top1"),
            dmean6(ct, "mean_cross_top1"),
            dmean6(st - ct, "mean_margin"),
            F.round(
                F.sum(F.when(ct > st, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("violation_rate"),
        )
        .orderBy("label")
    )


# -- sim_twonn ---------------------------------------------------------
#
# TwoNN intrinsic-dimension estimate of the embedding space (Facco et
# al. 2017): using only each sampled anchor's two nearest EUCLIDEAN
# neighbors, μ = r₂/r₁ is Pareto(d) under local uniformity, so
# d̂ = n / Σ ln μ — the modern answer to "are these 64-dim vectors
# really 64-dimensional?", which prices how hard ANN indexing /
# dedup of this space will be (hubness' sibling diagnostic).
# Distances via the norms+dot identity (no per-pair explode of
# dimensions); r₁/r₂ by one ranked window with c_id tie-breaks;
# ln μ folds as 9-rounded decimals (ratios of irrational sqrt
# distances never sit on a rounding boundary). Scale: the same
# |sample|×|corpus| broadcast-anchor scan as sim_hubness.

SIM_TWONN_SQL = """
WITH w AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS sq
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv, sq AS qsq FROM w WHERE vec_id % 5 = 0
), scored AS (
  SELECT q.q_id, w.vec_id AS c_id,
         sqrt(GREATEST(w.sq + q.qsq
              - 2.0 * list_sum(list_transform(range(1, 65),
                                              i -> w.v[i] * q.qv[i])),
              0.0)) AS dist
  FROM w, q WHERE w.vec_id != q.q_id
), ranked AS (
  SELECT q_id, dist,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dist, c_id) AS rn
  FROM scored
), mu AS (
  SELECT q_id,
         MAX(CASE WHEN rn = 2 THEN dist END)
           / MAX(CASE WHEN rn = 1 THEN dist END) AS mu
  FROM ranked WHERE rn <= 2 GROUP BY 1
  HAVING MAX(CASE WHEN rn = 1 THEN dist END) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
       round(CAST(SUM(CAST(round(mu, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_mu,
       round(COUNT(*)
             / CAST(SUM(CAST(round(ln(mu), 9) AS DECIMAL(18,9)))
               AS DOUBLE), 6) AS intrinsic_dim
FROM mu
WHERE mu IS NOT NULL
"""


@query("sim_twonn", oracle=SIM_TWONN_SQL)
def sim_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from redmap_spark.operators.similarity import as_double_vec, dot

    w = spread(
        e.select("vec_id", as_double_vec("embedding").alias("v"))
    ).withColumn(
        "sq",
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    q = w.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("sq").alias("qsq"),
    )
    scored = w.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("c_id"),
        F.sqrt(
            F.greatest(
                F.col("sq")
                + F.col("qsq")
                - 2.0 * dot(F.col("v"), F.col("qv")),
                F.lit(0.0),
            )
        ).alias("dist"),
    )
    ranked = scored.select(
        "q_id",
        "dist",
        F.row_number()
        .over(Window.partitionBy("q_id").orderBy("dist", "c_id"))
        .alias("rn"),
    )
    mu = (
        ranked.filter(F.col("rn") <= 2)
        .groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("dist"))).alias("r1"),
            F.max(F.when(F.col("rn") == 2, F.col("dist"))).alias("r2"),
        )
        .filter(F.col("r1") > 0)
        .select("q_id", (F.col("r2") / F.col("r1")).alias("mu"))
        .filter(F.col("mu").isNotNull())
    )
    return mu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        F.round(
            F.sum(F.round("mu", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_mu"),
        F.round(
            F.count(F.lit(1))
            / F.sum(F.round(F.log("mu"), 9).cast("decimal(18,9)")).cast(
                "double"
            ),
            6,
        ).alias("intrinsic_dim"),
    )


# -- sim_calinski ------------------------------------------------------
#
# Calinski-Harabasz variance-ratio index of the labeled embedding
# clustering, CH = (B/(k−1)) / (W/(n−k)) — completing the internal
# cluster-validity trio beside sim_silhouette (pairwise-distance
# view) and sim_davies_bouldin (worst-neighbor view); CH is the
# cheapest of the three (pure centroid algebra) and the one ANOVA
# generalizes. Between-scatter B = Σ_k n_k·‖c_k − c‖² from the
# |labels|×64 centroid grid; within-scatter W from one second pass
# joining 6-rounded broadcast centroids back to the exploded
# (vec, dim) rows; every fold is a 6-rounded decimal sum. Scale: two
# posexplode partial-agg scans, centroids broadcast — nothing O(n²).

SIM_CALINSKI_SQL = """
WITH xd AS (
  SELECT vec_id, label, CAST(i - 1 AS INT) AS dim,
         CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), cg AS MATERIALIZED (
  SELECT label, dim,
         CAST(COUNT(*) AS BIGINT) AS n_k,
         round(CAST(SUM(CAST(round(x, 6) AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*), 6) AS c_kd
  FROM xd GROUP BY 1, 2
), gg AS (
  SELECT dim,
         round(CAST(SUM(CAST(round(c_kd * n_k, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) / SUM(n_k), 6) AS c_d,
         CAST(SUM(n_k) AS BIGINT) AS n
  FROM cg GROUP BY 1
), b AS (
  SELECT CAST(SUM(CAST(round(cg.n_k * (cg.c_kd - gg.c_d)
                             * (cg.c_kd - gg.c_d), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS bs
  FROM cg JOIN gg ON cg.dim = gg.dim
), w AS (
  SELECT CAST(SUM(CAST(round((xd.x - cg.c_kd) * (xd.x - cg.c_kd), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS ws
  FROM xd JOIN cg ON xd.label = cg.label AND xd.dim = cg.dim
), meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT label) AS BIGINT) AS k
  FROM embeddings
)
SELECT m.n AS n_vecs, m.k AS k_labels,
       round(b.bs, 4) AS between_scatter,
       round(w.ws, 4) AS within_scatter,
       round((b.bs / (m.k - 1)) / (w.ws / (m.n - m.k)), 6) AS ch_index
FROM b CROSS JOIN w CROSS JOIN meta m
WHERE m.k > 1 AND m.n > m.k AND w.ws > 0
"""


@query("sim_calinski", oracle=SIM_CALINSKI_SQL)
def sim_calinski(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    xd = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x0")
    ).select(
        "vec_id", "label", "dim", F.col("x0").cast("double").alias("x")
    )
    cg = xd.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.round(
            F.sum(F.round("x", 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c_kd"),
    )
    cg = cg.cache()  # |labels|×64 grid: feeds gg, B and the W join
    gg = cg.groupBy("dim").agg(
        F.round(
            F.sum(
                F.round(F.col("c_kd") * F.col("n_k"), 6).cast(
                    "decimal(28,6)"
                )
            ).cast("double")
            / F.sum("n_k"),
            6,
        ).alias("c_d"),
        F.sum("n_k").cast("bigint").alias("n"),
    )
    b = (
        cg.join(F.broadcast(gg), "dim")
        .agg(
            F.sum(
                F.round(
                    F.col("n_k")
                    * (F.col("c_kd") - F.col("c_d"))
                    * (F.col("c_kd") - F.col("c_d")),
                    6,
                ).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("bs")
        )
    )
    w = (
        xd.join(F.broadcast(cg), ["label", "dim"])
        .agg(
            F.sum(
                F.round(
                    (F.col("x") - F.col("c_kd"))
                    * (F.col("x") - F.col("c_kd")),
                    6,
                ).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("ws")
        )
    )
    meta = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("label").cast("bigint").alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    bs, ws = F.col("bs"), F.col("ws")
    return (
        b.join(F.broadcast(w))
        .join(F.broadcast(meta))
        .filter((k > 1) & (n > k) & (ws > 0))
        .select(
            n.alias("n_vecs"),
            k.alias("k_labels"),
            F.round(bs, 4).alias("between_scatter"),
            F.round(ws, 4).alias("within_scatter"),
            F.round((bs / (k - 1)) / (ws / (n - k)), 6).alias("ch_index"),
        )
    )


# -- sim_ivf_tuning ------------------------------------------------------
#
# The recall/cost knob a 100 TB IVF deployment actually turns: probe
# the coarse quantizer at nprobe ∈ {1,2,4,8} and report, per setting,
# the MEASURED mean recall@10 against the exact brute-force top-10
# and the mean scanned fraction of the corpus — the dedup_lsh_tuning
# pattern applied to IVF. Centroids are the per-(label, dim)
# DECIMAL-rounded means of the existing cluster assignment (the same
# coarse quantizer sim_ivf_topk probes); pairwise cosines follow the
# sim_bruteforce discipline — sequential IEEE array folds + round(4),
# no shuffle-order dependence — so the whole sweep is hash-checkable
# cross-engine while scoring 40k compact array rows instead of a
# 2.5M-row explode join. Cluster ranking ties break on (score, cl).
# Scale: the q×corpus cosine table is the 20-query EVAL harness (like
# sim_lsh_recall), not the serving path — serving scans only the
# probed partitions, which is exactly the fraction this entry
# measures.

N_TUNE_QUERIES = 20
IVF_NPROBES = (1, 2, 4, 8)

IVF_TUNING_SQL = f"""
WITH w AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS nrm
  FROM embeddings
), meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM w
), ex AS (
  SELECT label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), centd AS (
  SELECT label AS cl, dim,
         round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 9) AS c
  FROM ex GROUP BY 1, 2
), cent AS (
  SELECT cl, list(c ORDER BY dim) AS cv,
         sqrt(list_sum(list_transform(list(c ORDER BY dim), x -> x * x)))
           AS cnrm
  FROM centd GROUP BY 1
), qs AS (
  SELECT vec_id AS q, v AS qv, nrm AS qn FROM w
  WHERE vec_id < {N_TUNE_QUERIES}
), crank AS (
  SELECT q, cl,
         CAST(ROW_NUMBER() OVER (PARTITION BY q
              ORDER BY round(list_sum(list_transform(range(1, 65),
                        i -> qs.qv[i] * cent.cv[i]))
                      / (qs.qn * cent.cnrm), 6) DESC, cl)
           AS BIGINT) AS rk
  FROM qs CROSS JOIN cent
), scored AS (
  SELECT qs.q, w.vec_id AS v, w.label AS vcl,
         round(list_sum(list_transform(range(1, 65),
                 i -> qs.qv[i] * w.v[i])) / (qs.qn * w.nrm), 4) AS cos
  FROM qs JOIN w ON w.vec_id <> qs.q
), exact AS (
  SELECT q, v FROM (
    SELECT q, v,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, v) AS rn
    FROM scored) t
  WHERE rn <= 10
), nps AS (
  SELECT UNNEST([1, 2, 4, 8]) AS np
), cand AS (
  SELECT n.np, s.q, s.v, s.cos
  FROM scored s
  JOIN crank r ON r.q = s.q AND r.cl = s.vcl
  JOIN nps n ON r.rk <= n.np
), nc AS (
  SELECT np, q, CAST(COUNT(*) AS BIGINT) AS n_cand
  FROM cand GROUP BY 1, 2
), approx AS (
  SELECT np, q, v FROM (
    SELECT np, q, v,
           ROW_NUMBER() OVER (PARTITION BY np, q
                              ORDER BY cos DESC, v) AS rn
    FROM cand) t
  WHERE rn <= 10
), hits AS (
  SELECT n.np, e.q, CAST(COUNT(a.v) AS BIGINT) AS n_hit
  FROM exact e
  CROSS JOIN nps n
  LEFT JOIN approx a ON a.np = n.np AND a.q = e.q AND a.v = e.v
  GROUP BY 1, 2
)
SELECT h.np AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       round(SUM(c.n_cand) / CAST(COUNT(*) AS DOUBLE), 2)
         AS mean_candidates,
       round(SUM(c.n_cand)
             / (CAST(COUNT(*) AS DOUBLE) * (MIN(m.n_vecs) - 1)), 6)
         AS mean_scanned_fraction,
       round(SUM(h.n_hit) / (10.0 * COUNT(*)), 6) AS mean_recall_at_10
FROM hits h
JOIN nc c ON c.np = h.np AND c.q = h.q
CROSS JOIN meta m
GROUP BY 1
ORDER BY nprobe
"""


@query("sim_ivf_tuning", oracle=IVF_TUNING_SQL)
def sim_ivf_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    w = (
        e.select(
            "vec_id", "label", S.as_double_vec("embedding").alias("v")
        )
        .withColumn("nrm", S.norm(F.col("v")))
        .localCheckpoint()  # feeds centroids, query side, corpus side
    )
    ex = w.select("label", F.posexplode("v").alias("dim0", "x")).select(
        "label", (F.col("dim0") + 1).alias("dim"), "x"
    )
    centd = ex.groupBy(F.col("label").alias("cl"), "dim").agg(
        F.round(
            F.sum(F.round(F.col("x"), 9).cast("decimal(18,9)"))
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("c")
    )
    cent = (
        centd.groupBy("cl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
        .withColumn("cnrm", S.norm(F.col("cv")))
    )
    qs = w.filter(F.col("vec_id") < N_TUNE_QUERIES).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    crank = (
        qs.crossJoin(F.broadcast(cent))
        .select(
            "q", "cl",
            F.round(
                S.dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cnrm")),
                6,
            ).alias("cs"),
        )
        .select(
            "q", "cl",
            F.row_number()
            .over(Window.partitionBy("q").orderBy(F.desc("cs"), F.asc("cl")))
            .cast("bigint")
            .alias("rk"),
        )
    )
    scored = (
        spread(
            w.select(
                F.col("vec_id").alias("v2"), F.col("label").alias("vcl"),
                F.col("v").alias("cvv"), F.col("nrm").alias("cvn"),
            )
        )
        .join(F.broadcast(qs), F.col("v2") != F.col("q"))
        .select(
            "q", F.col("v2").alias("v"), "vcl",
            F.round(
                S.dot(F.col("qv"), F.col("cvv"))
                / (F.col("qn") * F.col("cvn")),
                4,
            ).alias("cos"),
        )
        .localCheckpoint()  # consumed by exact ranking AND the sweep
    )
    wq = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("v"))
    exact = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select("q", "v")
    )
    nps = spark.createDataFrame([(n,) for n in IVF_NPROBES], "np int")
    cand = (
        scored.join(
            F.broadcast(
                crank.select(
                    F.col("q").alias("rq"), F.col("cl").alias("rcl"), "rk"
                )
            ),
            (F.col("rq") == F.col("q")) & (F.col("rcl") == F.col("vcl")),
        )
        .crossJoin(F.broadcast(nps))
        .filter(F.col("rk") <= F.col("np"))
        .select("np", "q", "v", "cos")
    )
    nc = cand.groupBy("np", "q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    wnq = Window.partitionBy("np", "q").orderBy(F.desc("cos"), F.asc("v"))
    approx = (
        cand.withColumn("rn", F.row_number().over(wnq))
        .filter(F.col("rn") <= 10)
        .select(
            F.col("np").alias("anp"),
            F.col("q").alias("aq"),
            F.col("v").alias("av"),
        )
    )
    hits = (
        exact.crossJoin(F.broadcast(nps))
        .join(
            approx,
            (F.col("aq") == F.col("q"))
            & (F.col("av") == F.col("v"))
            & (F.col("anp") == F.col("np")),
            "left",
        )
        .groupBy("np", "q")
        .agg(F.count("av").cast("bigint").alias("n_hit"))
    )
    meta = w.agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    nq = F.count(F.lit(1))
    return (
        hits.join(nc, ["np", "q"])
        .crossJoin(F.broadcast(meta))
        .groupBy(F.col("np").cast("bigint").alias("nprobe"))
        .agg(
            nq.cast("bigint").alias("n_queries"),
            F.round(
                F.sum("n_cand") / nq.cast("double"), 2
            ).alias("mean_candidates"),
            F.round(
                F.sum("n_cand")
                / (nq.cast("double") * (F.min("n_vecs") - 1)),
                6,
            ).alias("mean_scanned_fraction"),
            F.round(F.sum("n_hit") / (10.0 * nq), 6).alias("mean_recall_at_10"),
        )
        .orderBy("nprobe")
    )


# -- sim_graph_expand ----------------------------------------------------
#
# Graph-based ANN (the HNSW/DiskANN family), expressed Spark-first as
# a measured eval: build a kNN NEIGHBORHOOD GRAPH offline (each vector
# keeps its G=8 best neighbors among vectors sharing one of its top-2
# soft-assigned IVF clusters — soft assignment is what creates the
# cross-cluster edges a boundary query needs), then answer queries by
# seed-scan + one greedy expansion hop: scan the query's nearest
# cluster, take the top-S=5 seeds, pull their graph neighbors, exact-
# rescore the union. Reported per method ('ivf1' seed-only vs 'graph'
# expanded): measured mean recall@10 vs brute force and mean scanned
# fraction — the eval shows the graph hop buying back the recall
# nprobe=1 loses at ~zero extra scan cost. Scale: graph build cost is
# Σ|group|² like mr_triangles' Σdeg² (groups are cluster-sized, built
# once offline; at 100 TB the graph is a table partitioned by node),
# query cost is |cluster| + S·G exact scores. Folds follow the
# sim_bruteforce discipline (sequential IEEE array folds + round(4),
# decimal-rounded centroid means), so the eval is hash-checkable.

GRAPH_G = 8       # graph degree kept per node
GRAPH_SEEDS = 5   # expansion frontier size

GRAPH_EXPAND_SQL = f"""
WITH w AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS nrm
  FROM embeddings
), meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM w
), ex AS (
  SELECT vec_id, label, i AS dim, embedding[i] AS x
  FROM embeddings, generate_series(1, 64) AS t(i)
), centd AS (
  SELECT label AS cl, dim,
         round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 9) AS c
  FROM ex GROUP BY 1, 2
), cent AS (
  SELECT cl, list(c ORDER BY dim) AS cv,
         sqrt(list_sum(list_transform(list(c ORDER BY dim), x -> x * x)))
           AS cnrm
  FROM centd GROUP BY 1
), vc AS (
  SELECT w.vec_id, cent.cl,
         round(list_sum(list_transform(range(1, 65),
                 i -> w.v[i] * cent.cv[i])) / (w.nrm * cent.cnrm), 6)
           AS cs
  FROM w CROSS JOIN cent
), soft AS (
  SELECT vec_id, cl, arank FROM (
    SELECT vec_id, cl,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, cl) AS arank
    FROM vc) t
  WHERE arank <= 2
), gpairs AS (
  SELECT DISTINCT a.vec_id AS u, b.vec_id AS nb
  FROM soft a JOIN soft b ON a.cl = b.cl AND a.vec_id < b.vec_id
), gscored AS (
  SELECT p.u, p.nb,
         round(list_sum(list_transform(range(1, 65),
                 i -> wu.v[i] * wn.v[i])) / (wu.nrm * wn.nrm), 4) AS s
  FROM gpairs p
  JOIN w wu ON wu.vec_id = p.u
  JOIN w wn ON wn.vec_id = p.nb
), graph AS (
  SELECT node, nb FROM (
    SELECT node, nb,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY s DESC, nb) AS rn
    FROM (
      SELECT u AS node, nb, s FROM gscored
      UNION ALL
      SELECT nb AS node, u AS nb, s FROM gscored
    ) sym) t
  WHERE rn <= {GRAPH_G}
), qs AS (
  SELECT vec_id AS q, v AS qv, nrm AS qn FROM w
  WHERE vec_id < {N_TUNE_QUERIES}
), qcl AS (
  SELECT vec_id AS q, cl FROM soft WHERE arank = 1
                                     AND vec_id < {N_TUNE_QUERIES}
), seedset AS (
  SELECT qcl.q, s.vec_id AS v
  FROM qcl JOIN soft s ON s.cl = qcl.cl AND s.arank = 1
  WHERE s.vec_id <> qcl.q
), sscore AS (
  SELECT ss.q, ss.v,
         round(list_sum(list_transform(range(1, 65),
                 i -> qs.qv[i] * w.v[i])) / (qs.qn * w.nrm), 4) AS cos
  FROM seedset ss
  JOIN qs ON qs.q = ss.q
  JOIN w ON w.vec_id = ss.v
), ivf1 AS (
  SELECT q, v, cos, rn FROM (
    SELECT q, v, cos,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, v) AS rn
    FROM sscore) t
), frontier AS (
  SELECT q, v FROM ivf1 WHERE rn <= {GRAPH_SEEDS}
), expandset AS (
  SELECT q, v FROM seedset
  UNION
  SELECT f.q, g.nb AS v
  FROM frontier f JOIN graph g ON g.node = f.v
  WHERE g.nb <> f.q
), escore AS (
  SELECT es.q, es.v,
         round(list_sum(list_transform(range(1, 65),
                 i -> qs.qv[i] * w.v[i])) / (qs.qn * w.nrm), 4) AS cos
  FROM expandset es
  JOIN qs ON qs.q = es.q
  JOIN w ON w.vec_id = es.v
), gtop AS (
  SELECT q, v FROM (
    SELECT q, v,
           ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, v) AS rn
    FROM escore) t
  WHERE rn <= 10
), exact AS (
  SELECT q, v FROM (
    SELECT qs.q, w.vec_id AS v,
           ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY
             round(list_sum(list_transform(range(1, 65),
                     i -> qs.qv[i] * w.v[i])) / (qs.qn * w.nrm), 4) DESC,
             w.vec_id) AS rn
    FROM qs JOIN w ON w.vec_id <> qs.q) t
  WHERE rn <= 10
), cands AS (
  SELECT 'ivf1' AS method, q, CAST(COUNT(*) AS BIGINT) AS n_cand
  FROM seedset GROUP BY 2
  UNION ALL
  SELECT 'graph', q, CAST(COUNT(*) AS BIGINT) FROM expandset GROUP BY 2
), results AS (
  SELECT 'ivf1' AS method, q, v FROM ivf1 WHERE rn <= 10
  UNION ALL
  SELECT 'graph', q, v FROM gtop
), hits AS (
  SELECT m.method, e.q, CAST(COUNT(r.v) AS BIGINT) AS n_hit
  FROM exact e
  CROSS JOIN (SELECT DISTINCT method FROM results) m
  LEFT JOIN results r ON r.method = m.method AND r.q = e.q AND r.v = e.v
  GROUP BY 1, 2
)
SELECT h.method,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       round(SUM(c.n_cand) / CAST(COUNT(*) AS DOUBLE), 2)
         AS mean_candidates,
       round(SUM(c.n_cand)
             / (CAST(COUNT(*) AS DOUBLE) * (MIN(m2.n_vecs) - 1)), 6)
         AS mean_scanned_fraction,
       round(SUM(h.n_hit) / (10.0 * COUNT(*)), 6) AS mean_recall_at_10
FROM hits h
JOIN cands c ON c.method = h.method AND c.q = h.q
CROSS JOIN meta m2
GROUP BY 1
ORDER BY h.method
"""


@query("sim_graph_expand", oracle=GRAPH_EXPAND_SQL)
def sim_graph_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    w = (
        e.select(
            "vec_id", "label", S.as_double_vec("embedding").alias("v")
        )
        .withColumn("nrm", S.norm(F.col("v")))
        .localCheckpoint()  # feeds centroids, assignment, graph, scoring
    )
    ex = w.select("label", F.posexplode("v").alias("dim0", "x")).select(
        "label", (F.col("dim0") + 1).alias("dim"), "x"
    )
    centd = ex.groupBy(F.col("label").alias("cl"), "dim").agg(
        F.round(
            F.sum(F.round(F.col("x"), 9).cast("decimal(18,9)"))
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("c")
    )
    cent = (
        centd.groupBy("cl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
        .withColumn("cnrm", S.norm(F.col("cv")))
    )
    vc = w.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cl",
        F.round(
            S.dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")),
            6,
        ).alias("cs"),
    )
    wsoft = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cl"))
    soft = (
        vc.withColumn("arank", F.row_number().over(wsoft))
        .filter(F.col("arank") <= 2)
        .select("vec_id", "cl", "arank")
        .localCheckpoint()  # consumed by graph pairs (x2), qcl, seedset
    )
    ga = soft.select("cl", F.col("vec_id").alias("u"))
    gb = soft.select(F.col("cl").alias("clb"), F.col("vec_id").alias("nb"))
    gpairs = (
        ga.join(gb, (F.col("cl") == F.col("clb")) & (F.col("u") < F.col("nb")))
        .select("u", "nb")
        .distinct()
    )
    wu = w.select(
        F.col("vec_id").alias("u"), F.col("v").alias("uv"),
        F.col("nrm").alias("un"),
    )
    wn = w.select(
        F.col("vec_id").alias("nb"), F.col("v").alias("nv2"),
        F.col("nrm").alias("nn"),
    )
    gscored = (
        gpairs.join(F.broadcast(wu), "u")
        .join(F.broadcast(wn), "nb")
        .select(
            "u", "nb",
            F.round(
                S.dot(F.col("uv"), F.col("nv2"))
                / (F.col("un") * F.col("nn")),
                4,
            ).alias("s"),
        )
    )
    sym = gscored.select(F.col("u").alias("node"), "nb", "s").unionAll(
        gscored.select(
            F.col("nb").alias("node"), F.col("u").alias("nb"), "s"
        )
    )
    wg = Window.partitionBy("node").orderBy(F.desc("s"), F.asc("nb"))
    graph = (
        sym.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= GRAPH_G)
        .select("node", "nb")
        .localCheckpoint()  # the offline index: |nodes| x G rows
    )
    qs = w.filter(F.col("vec_id") < N_TUNE_QUERIES).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qcl = soft.filter(
        (F.col("arank") == 1) & (F.col("vec_id") < N_TUNE_QUERIES)
    ).select(F.col("vec_id").alias("q"), "cl")
    seedset = (
        qcl.join(
            soft.filter(F.col("arank") == 1).select(
                "cl", F.col("vec_id").alias("v")
            ),
            "cl",
        )
        .filter(F.col("v") != F.col("q"))
        .select("q", "v")
        .localCheckpoint()  # consumed by seed scoring, expansion, cands
    )

    def rescore(cands: DataFrame) -> DataFrame:
        return (
            cands.join(F.broadcast(qs), "q")
            .join(
                F.broadcast(
                    w.select(
                        F.col("vec_id").alias("v2"),
                        F.col("v").alias("cvv"),
                        F.col("nrm").alias("cvn"),
                    )
                ),
                F.col("v2") == F.col("v"),
            )
            .select(
                "q", "v",
                F.round(
                    S.dot(F.col("qv"), F.col("cvv"))
                    / (F.col("qn") * F.col("cvn")),
                    4,
                ).alias("cos"),
            )
        )

    wq = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("v"))
    ivf1 = (
        rescore(seedset)
        .withColumn("rn", F.row_number().over(wq))
        .localCheckpoint()  # consumed by frontier AND results
    )
    frontier = ivf1.filter(F.col("rn") <= GRAPH_SEEDS).select("q", "v")
    expandset = (
        seedset.unionAll(
            frontier.join(
                F.broadcast(graph),
                F.col("node") == F.col("v"),
            )
            .filter(F.col("nb") != F.col("q"))
            .select("q", F.col("nb").alias("v"))
        )
        .distinct()
        .localCheckpoint()  # consumed by expanded scoring AND cands
    )
    gtop = (
        rescore(expandset)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select("q", "v")
    )
    allpairs = qs.crossJoin(
        w.select(
            F.col("vec_id").alias("v2"), F.col("v").alias("cvv"),
            F.col("nrm").alias("cvn"),
        )
    ).filter(F.col("v2") != F.col("q"))
    exact = (
        allpairs.select(
            "q", F.col("v2").alias("v"),
            F.round(
                S.dot(F.col("qv"), F.col("cvv"))
                / (F.col("qn") * F.col("cvn")),
                4,
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select("q", "v")
    )
    cands = seedset.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    ).select(F.lit("ivf1").alias("method"), "q", "n_cand").unionAll(
        expandset.groupBy("q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
        .select(F.lit("graph").alias("method"), "q", "n_cand")
    )
    results = ivf1.filter(F.col("rn") <= 10).select(
        F.lit("ivf1").alias("method"), "q", "v"
    ).unionAll(gtop.select(F.lit("graph").alias("method"), "q", "v"))
    methods = spark.createDataFrame(
        [("ivf1",), ("graph",)], "method string"
    )
    hits = (
        exact.crossJoin(F.broadcast(methods))
        .join(
            results.select(
                F.col("method").alias("rm"), F.col("q").alias("rq"),
                F.col("v").alias("rv"),
            ),
            (F.col("rm") == F.col("method"))
            & (F.col("rq") == F.col("q"))
            & (F.col("rv") == F.col("v")),
            "left",
        )
        .groupBy("method", "q")
        .agg(F.count("rv").cast("bigint").alias("n_hit"))
    )
    meta = w.agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    nq = F.count(F.lit(1))
    return (
        hits.join(cands, ["method", "q"])
        .crossJoin(F.broadcast(meta))
        .groupBy("method")
        .agg(
            nq.cast("bigint").alias("n_queries"),
            F.round(
                F.sum("n_cand") / nq.cast("double"), 2
            ).alias("mean_candidates"),
            F.round(
                F.sum("n_cand")
                / (nq.cast("double") * (F.min("n_vecs") - 1)),
                6,
            ).alias("mean_scanned_fraction"),
            F.round(F.sum("n_hit") / (10.0 * nq), 6).alias("mean_recall_at_10"),
        )
        .orderBy("method")
    )
