"""Reusable analytic operators backing SURVEY §2.A inventory entries
(q_skyline, q_interval_sweep delegate here; property-tested against
brute force on arbitrary inputs in tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """Pareto frontier: rows where no other row has ``min_col`` <=
    AND ``max_col`` >= with at least one strict. Output: one row per
    distinct (min_col, max_col) point on the frontier, with its
    multiplicity ``n_rows``.

    Plan: collapse to the DISTINCT point grid (dominance is identical
    for duplicates), then ONE running-max pass ordered by (min ASC,
    max DESC): every strict predecessor in that order is a
    cheaper-or-equal candidate, so a point is dominated iff the
    running MAX of ``max_col`` over predecessors reaches its own
    value. With ``bucket_width`` set, that pass is the two-phase
    distributed scan (plans/prefix.two_phase_cummax_excl) over
    floor(min_col/width) buckets — required when the distinct point
    grid scales with the data (the sf0.1 sp-window sweep measured
    16.6k grid rows through the old global window for q_skyline);
    without it, a global window sorts the grid on one executor (only
    acceptable for genuinely domain-bounded grids)."""
    g = df.groupBy(
        F.col(min_col).alias("_mn"), F.col(max_col).alias("_mx")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    if bucket_width is not None:
        from redmap_spark.plans.prefix import two_phase_cummax_excl

        sky = two_phase_cummax_excl(
            g, [F.col("_mn").asc(), F.col("_mx").desc()], F.col("_mx"),
            F.floor(F.col("_mn") / bucket_width).cast("bigint"),
            out="_pred",
        )
    else:
        w = Window.orderBy(
            F.col("_mn").asc(), F.col("_mx").desc()
        ).rowsBetween(Window.unboundedPreceding, -1)
        sky = g.select(
            "_mn", "_mx", "n_rows", F.max("_mx").over(w).alias("_pred")
        )
    return sky.filter(
        F.col("_pred").isNull() | (F.col("_pred") < F.col("_mx"))
    ).select(
        F.col("_mn").alias(min_col), F.col("_mx").alias(max_col), "n_rows"
    )


def peak_concurrency(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Sweep-line max-overlap per key over half-open [start, end)
    intervals: (key, peak_active, peak_at) where ``peak_at`` is the
    FIRST instant the peak is reached.

    Plan: each interval emits one +1 and one -1 delta (flat map, no
    blowup); deltas collapse per (key, instant) BEFORE the running
    sum — which removes any intra-instant ordering sensitivity — and
    the window partitions by key, so there is no global sort."""
    deltas = df.select(
        F.col(key_col).alias("_k"),
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("_t"), F.lit(1).alias("_d")),
                F.struct(F.col(end_col).alias("_t"), F.lit(-1).alias("_d")),
            )
        ).alias("_e"),
    ).select("_k", "_e._t", "_e._d")
    by_t = deltas.groupBy("_k", "_t").agg(F.sum("_d").alias("_d"))
    run = by_t.select(
        "_k",
        "_t",
        F.sum("_d").over(Window.partitionBy("_k").orderBy("_t")).alias("_active"),
    )
    peak = run.groupBy("_k").agg(F.max("_active").alias("peak_active"))
    return (
        run.join(peak, "_k")
        .filter(F.col("_active") == F.col("peak_active"))
        .groupBy(F.col("_k").alias(key_col), "peak_active")
        .agg(F.min("_t").alias("peak_at"))
    )


def copurchase_pairs(df: DataFrame, group_col: str = "o",
                     item_col: str = "p") -> DataFrame:
    """Canonical (``u`` < ``v``) distinct co-occurrence edges: items
    sharing a group (e.g. parts sharing an order). |E| ≤ Σ per-group
    basket², orders smaller than the fact pass that builds it. Shared
    by mr_triangles and the scaling probe so both exercise the same
    derivation."""
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
        )
        .select(
            F.col(f"a.{item_col}").alias("u"), F.col(f"b.{item_col}").alias("v")
        )
        .distinct()
    )


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Triangle count over an undirected graph given as canonical
    (``u`` < ``v``) distinct edge pairs. Output: one row with
    n_nodes / n_edges / n_triangles.

    Plan: the classic degree-orientation algorithm — every edge is
    oriented from its lower-(degree, key) endpoint, which caps
    out-degree at O(sqrt(m)) and bounds wedge generation by
    Σ out_deg²; wedges close against the canonical edge set via one
    equi-join. Never an all-pairs pass. Degree lookups are plain
    equi-joins: Spark/AQE broadcasts the degree table when it is
    small and shuffle-joins when the node set is large — forcing a
    broadcast would OOM exactly in the at-scale regime. The edge
    table is cached once (coalesced relative to the session's
    parallelism, so small graphs don't pay fact-shuffle task counts)
    for its five consumers, the bounded 1-row summary is materialized
    eagerly, and both caches are released before returning.
    """
    spark = pairs.sparkSession
    slots = max(1, spark.sparkContext.defaultParallelism // 4)
    pairs = pairs.coalesce(slots).cache()
    pairs.count()
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    low_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    oe = (
        pairs.join(deg.alias("du"), F.col("du.node") == F.col("u"))
        .join(deg.alias("dv"), F.col("dv.node") == F.col("v"))
        .select(
            F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .cache()
    )
    oe.count()  # eager: both wedge-join sides read it concurrently
    try:
        e1, e2 = oe.alias("e1"), oe.alias("e2")
        wedges = e1.join(
            e2, (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t"))
        ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
        n_tri = wedges.join(
            pairs, (F.col("u") == F.col("x")) & (F.col("v") == F.col("y"))
        ).count()
        n_nodes = deg.count()
        n_edges = pairs.count()  # cached: a metadata-cheap second pass
    finally:
        # bounded summary is in hand — release executor storage so
        # repeated calls (bench, probe) don't accumulate cached state
        oe.unpersist()
        pairs.unpersist()
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)],
        schema="n_nodes bigint, n_edges bigint, n_triangles bigint",
    )
