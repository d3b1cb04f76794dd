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


# ------------------------------------------------------------ kNN join


def knn_join_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: every query row → its top-k corpus neighbors
    by cosine. The query side is broadcast (the small side by
    contract: a probe batch, not the corpus); ranking is a per-query
    window so the corpus is scanned exactly once regardless of the
    number of queries. For corpus×corpus self-join at 100 TB use
    ``knn_join_ivf`` — brute force is the recall oracle, not the
    scale path."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(vec_col).alias("v")
    ).withColumn("cn", norm(F.col("v")))
    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("cn") * F.col("qn")), 4).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def knn_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    dim: int = 64,
    nprobe: int = 2,
) -> DataFrame:
    """IVF k-NN join (the scale path): corpus is partitioned by its
    coarse-quantizer cluster; each query probes only its ``nprobe``
    nearest centroids. Per-query work drops from |corpus| to
    nprobe × |cluster|; the probe assignment is a broadcast of the
    (tiny) centroid table, and the candidate join shuffles on the
    cluster key — co-partitioned with a corpus table that is bucketed
    by cluster at rest."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(cluster_col).alias("cl"),
        as_double_vec(vec_col).alias("v"),
    ).withColumn("cn", norm(F.col("v")))
    centroids = c.groupBy("cl").agg(
        F.array(*[F.avg(F.element_at("v", i + 1)) for i in range(dim)]).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("cl"))
    probes = (
        q.join(F.broadcast(centroids))
        .select("q_id", "qv", "qn", "cl", cosine(F.col("cv"), F.col("qv"), scale=8).alias("cs"))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "qv", "qn", "cl")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        c.join(probes, "cl")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("cn") * F.col("qn")), 4).alias(
                "score"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------- trained IVF quantizer (k-means)


def _dot_lit(v: Column, cent: list[float]) -> Column:
    """dot(vector column, literal centroid) as a pure JVM expression."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return dot(v, lit)


def _assign_expr(v: Column, cents: list[list[float]]) -> Column:
    """argmax-cosine cluster id vs broadcast literal centroids.
    Vectors and centroids are pre-normalized, so dot == cosine."""
    sims = F.array(*[_dot_lit(v, c) for c in cents])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def _l2_normalize(v: Column) -> Column:
    n = norm(v)
    return F.transform(v, lambda x: x / n)


def train_spherical_kmeans(
    corpus: DataFrame,
    n_clusters: int = 10,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[float]]:
    """Distributed spherical k-means (Lloyd) for the IVF coarse
    quantizer. Each iteration is one map (argmax vs ≤ a few hundred
    broadcast centroid literals) + one groupBy(cluster) mean — no
    Python in the row loop; only k×dim floats ever reach the driver.
    Init is deterministic: the n_clusters vectors with the smallest
    xxhash64(id) (a pseudo-random but reproducible sample).
    At 100 TB you train on a sample partition and freeze the
    centroids; assignment stays a pure column expression."""
    c = corpus.select(
        F.col(id_col).alias("id"), _l2_normalize(as_double_vec(vec_col)).alias("v")
    ).cache()
    cents = [
        r.v
        for r in c.withColumn("h", F.xxhash64("id")).orderBy("h", "id").limit(n_clusters).collect()
    ]
    for _ in range(iters):
        assigned = c.withColumn("cl", _assign_expr(F.col("v"), cents))
        mean_rows = (
            assigned.groupBy("cl")
            .agg(F.array(*[F.avg(F.element_at("v", i + 1)) for i in range(dim)]).alias("cv"))
            .collect()
        )
        by_cl = {r.cl: r.cv for r in mean_rows}
        new = []
        for i, old in enumerate(cents):
            cv = by_cl.get(i)
            if cv is None:  # empty cluster: keep the old centroid
                new.append(old)
                continue
            n = sum(x * x for x in cv) ** 0.5
            new.append([x / n for x in cv] if n > 0 else old)
        cents = new
    return cents


def knn_join_ivf_trained(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 10,
    nprobe: int = 2,
    iters: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF k-NN join over a *trained* spherical-k-means quantizer
    (the corpus 'label' column is not cosine-coherent in general).
    Corpus is assigned once (pure column expr, shuffled on cluster);
    each query probes its nprobe nearest centroids."""
    from pyspark.sql import Window

    cents = train_spherical_kmeans(
        corpus, n_clusters=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(vec_col).alias("v")
    ).withColumn("cn", norm(F.col("v"))).withColumn(
        "cl", _assign_expr(_l2_normalize(F.col("v")), cents)
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("cl"))
    sims = F.array(*[_dot_lit(_l2_normalize(F.col("qv")), cc) for cc in cents])
    probes = (
        q.select("q_id", "qv", "qn", F.posexplode(sims).alias("cl", "cs"))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= nprobe)
        .select("q_id", "qv", "qn", "cl")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        c.join(probes, "cl")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("cn") * F.col("qn")), 4).alias(
                "score"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
