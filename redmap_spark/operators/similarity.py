"""Similarity search over an embedding column (SURVEY §2.D).

Three tiers:
- brute-force cosine top-k: the exactness baseline (one pass, no
  shuffle beyond the final top-k);
- random-hyperplane LSH: bucket the corpus once, probe one bucket —
  the sub-linear scale path for high-QPS lookups;
- IVF: centroid-partitioned probe (nprobe=1) using a cluster/label
  column as the coarse quantizer.

Vector math is pure Column lambdas (zip_with/aggregate) — JVM-side,
no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column, scale: int = 4) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), scale)


def _query_row(df: DataFrame, id_col: str, vec_col: str, query_id: int) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(as_double_vec(vec_col).alias("qv"))


def brute_force_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs the embedding of ``query_id``.
    The query vector is a 1-row broadcast; ranking ties break on id
    so the result set is deterministic."""
    q = _query_row(df, id_col, vec_col, query_id)
    base = df.select(F.col(id_col), as_double_vec(vec_col).alias("v"))
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col("v"), F.col("qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# ------------------------------------------------ random-hyperplane LSH

N_PLANES = 4


def _plane_sign(i: Column, j: int) -> Column:
    """Deterministic ±1 for plane j, dimension i (seeded by xxhash64)."""
    return F.when(
        F.shiftrightunsigned(F.xxhash64(F.concat(F.lit(f"p{j}|"), i.cast("string"))), 1)
        .bitwiseAND(F.lit(1)) == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Signed-random-projection bucket id: bit j = sign(v · plane_j)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), lambda i: _plane_sign(i, j)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, 1 << j).otherwise(0)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: rank only vectors in the query's LSH bucket
    plus all buckets within ``multiprobe_bits`` bit flips (standard
    multiprobe — recovers recall without building more tables).
    At scale the bucketed table is precomputed + partitioned by
    bucket, so a probe touches nprobe partitions."""
    base = df.select(F.col(id_col), as_double_vec(vec_col).alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"), n_planes)
    )
    q = base.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # bucket matches if hamming(bucket, qbucket) <= multiprobe_bits
    match = F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket"))) <= multiprobe_bits
    return (
        base.join(F.broadcast(q), match)
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col("v"), F.col("qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# ----------------------------------------------------------------- IVF


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    dim: int = 64,
    nprobe: int = 3,
) -> DataFrame:
    """IVF probe: centroids = per-cluster mean vectors; search the
    ``nprobe`` clusters whose centroids are nearest the query."""
    base = df.select(F.col(id_col), F.col(cluster_col).alias("cl"), as_double_vec(vec_col).alias("v"))
    centroids = base.groupBy("cl").agg(
        F.array(*[F.avg(F.element_at("v", i + 1)) for i in range(dim)]).alias("cv")
    )
    q = base.filter(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    probed = (
        centroids.crossJoin(F.broadcast(q))
        .select("cl", cosine(F.col("cv"), F.col("qv"), scale=8).alias("cs"), "qv")
        .orderBy(F.desc("cs"), F.asc("cl"))
        .limit(nprobe)
        .select(F.col("cl").alias("probe_cl"), "qv")
    )
    return (
        base.join(F.broadcast(probed), F.col("cl") == F.col("probe_cl"))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col("v"), F.col("qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
