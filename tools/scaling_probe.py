"""Scaling-slope probe: do the engine's plans stay ~linear as data
grows? (SURVEY §6 / PERF.md evidence.)

Replicates sf0.1 fact tables x4 / x16 into a scratch dir with
key-space offsets (so key CARDINALITY scales with the data — the
realistic regime; group sizes stay constant), then times a
representative operator per shape class at each scale and reports
the wall-clock slope between consecutive 4x steps:

- scan+agg          q1 shape over lineitem        (shuffle on group keys)
- window analytics  q_streaks over events         (user-partitioned window)
- total-order sort  mr_total_sort over lineitem   (range partition + offsets)
- exact dedup       md5 hash-groupBy over documents
- sketch build      CMS 4x512 grid over events    (fixed-size state)
- graph self-join   co-purchase pairs + degree-oriented triangle count
                    (replica-offset part keys -> disjoint subgraphs, the
                    growing-key regime; cache cleared per run so the
                    timing includes the pair build, not a cache read)

A slope near 4 per step (or below — fixed overheads amortizing) means
shuffle-bound linear scaling; a slope trending toward 16 would flag a
quadratic term that 1000 executors cannot save. Run:

    python tools/scaling_probe.py            # writes /tmp/scaleprobe + prints one JSON line
    python tools/scaling_probe.py --shapes graph_triangles,global_prefix_sum --scales 1,4,16,64
                                             # x64 confirmation run for selected shapes only
                                             # (replicates only the tables those shapes read)

Scratch data is written under /tmp (never the repo or testdata).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from redmap_spark.inventory.sketches import cms_cell as _cms_cell  # noqa: E402
from redmap_spark.operators.analytics import triangle_stats  # noqa: E402
from redmap_spark.plans.prefix import two_phase_cumsum  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = Path("/tmp/scaleprobe")
SCALES = (1, 4, 16)

# Which scratch table each shape reads — lets a selective run (e.g.
# the x64 confirmation of the super-linear shapes) skip replicating
# the tables it never touches.
SHAPE_TABLES = {
    "agg_q1": {"lineitem"},
    "window_streaks": {"events"},
    "total_sort": {"lineitem"},
    "exact_dedup": {"documents"},
    "graph_triangles": {"lineitem"},
    "bottomk_sketch": {"events"},
    "hash_bootstrap": {"events"},
    "anchor_scan": {"embeddings"},
    "wide_perm_agg": {"lineitem"},
    "rolling_grid_window": {"events"},
    "sampled_brandes": {"lineitem"},
    "kde_fanout": {"events"},
    "graph_ann_build": {"embeddings"},
    "global_prefix_sum": {"lineitem"},
    "cms_build": {"events"},
}


def replicate(
    spark, table: str, id_cols: list[str], factor: int, dest: str,
    tag_text_col: str | None = None,
) -> None:
    """Union ``factor`` shifted copies. ``tag_text_col`` appends a
    per-replica suffix to that text column so CONTENT cardinality
    scales too (without it, replicated documents would be verbatim
    duplicates and a dedup probe would measure a fixed-cardinality
    duplicate-heavy workload instead of the growing-key regime)."""
    base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    parts = []
    for i in range(factor):
        shifted = base
        for c in id_cols:
            shifted = shifted.withColumn(c, F.col(c) + F.lit(i * 100_000_000))
        if tag_text_col is not None:
            shifted = shifted.withColumn(
                tag_text_col,
                F.concat(F.col(tag_text_col), F.lit(f" replica{i}")),
            )
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(dest)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def _graph_triangles(spark, li, noop) -> None:
    """Graph self-join probe: co-purchase edges + degree-oriented
    triangle count (the operators.analytics.triangle_stats kernel —
    the real code, not a copy). Only l_orderkey is replica-offset in
    the scratch data, so the part keyspace is re-derived per replica
    (DIV by the offset stride) — each replica becomes a disjoint
    subgraph and edge cardinality scales with the data, the
    growing-key regime. triangle_stats caches its edge table, so the
    cache is cleared first: the timed pass must rebuild the pairs,
    not read them back."""
    from redmap_spark.operators.analytics import copurchase_pairs

    spark.catalog.clearCache()
    e = li.select(
        F.col("l_orderkey").alias("o"),
        (
            F.col("l_partkey")
            + F.expr("l_orderkey DIV 100000000") * F.lit(10_000_000)
        ).alias("p"),
    )
    noop(triangle_stats(copurchase_pairs(e)))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default=None,
                    help="comma-separated shape names (default: all)")
    ap.add_argument("--scales", default=None,
                    help="comma-separated replica factors (default: 1,4,16)")
    ap.add_argument("--aqe-scaled", action="store_true",
                    help="run with the cluster-default adaptive posture: "
                         "one static high initialPartitionNum (1024) + "
                         "AQE coalescePartitions, no per-scale tuning — "
                         "vs the session's fixed 32-wide shuffles, which "
                         "go super-linear from per-partition spill at "
                         "x64 (PERF #90)")
    args = ap.parse_args()
    selected = (
        set(args.shapes.split(",")) if args.shapes else set(SHAPE_TABLES)
    )
    unknown = selected - set(SHAPE_TABLES)
    if unknown:
        raise SystemExit(f"unknown shapes: {sorted(unknown)}")
    scales = (
        tuple(int(s) for s in args.scales.split(","))
        if args.scales else SCALES
    )
    tables_needed = set().union(*(SHAPE_TABLES[s] for s in selected))

    spark = get_spark("scaling-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)

    results: dict[str, dict[int, float]] = {}
    for factor in scales:
        d = SCRATCH / f"x{factor}"
        if "lineitem" in tables_needed:
            replicate(spark, "lineitem", ["l_orderkey"], factor, str(d / "lineitem"))
        if "events" in tables_needed:
            replicate(spark, "events", ["event_id", "user_id"], factor, str(d / "events"))
        if "documents" in tables_needed:
            replicate(
                spark, "documents", ["doc_id"], factor, str(d / "documents"),
                tag_text_col="text",
            )
        if "embeddings" in tables_needed:
            replicate(
                spark, "embeddings", ["vec_id"], factor, str(d / "embeddings")
            )

        def rd(name):
            p = d / name
            return spark.read.parquet(str(p)) if p.exists() else None

        if args.aqe_scaled:
            # Cluster-default posture: ONE static, deliberately-high
            # initial shuffle width (1024 ~ a few x cluster cores;
            # compressed scan bytes under-estimate shuffle volume by
            # 10-50x on expansion-heavy shapes, so sizing from input
            # splits would under-scale) and AQE coalesces each stage
            # back down to its actual output size — no per-scale or
            # per-shape tuning anywhere. The probe's question: do the
            # x64 slopes stay linear under this posture alone, where
            # the FIXED 32-wide session went super-linear from
            # per-partition spill (PERF #90)?
            scratch_bytes = sum(
                f.stat().st_size for f in d.rglob("*") if f.is_file()
            )
            width = 1024
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "true"
            )
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(width),
            )
            print(f"x{factor}: aqe initialPartitionNum={width} "
                  f"(scratch {scratch_bytes >> 20} MiB)", file=sys.stderr)

        li, ev, dc, em = rd("lineitem"), rd("events"), rd("documents"), rd("embeddings")

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        probes = {
            "agg_q1": lambda: noop(
                li.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sp"),
                    F.count(F.lit(1)).alias("n"),
                )
            ),
            "window_streaks": lambda: noop(
                ev.select("user_id", F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("day"))
                .distinct()
                .select(
                    "user_id",
                    F.date_sub(
                        "day",
                        F.row_number().over(
                            Window.partitionBy("user_id").orderBy("day")
                        ),
                    ).alias("anchor"),
                )
                .groupBy("user_id", "anchor")
                .agg(F.count(F.lit(1)).alias("len"))
                .groupBy("user_id")
                .agg(F.max("len").alias("longest"))
            ),
            "total_sort": lambda: noop(
                li.repartitionByRange(
                    32, F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
                ).sortWithinPartitions(
                    F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
                )
            ),
            "exact_dedup": lambda: noop(
                dc.groupBy(F.md5("text").alias("h")).agg(
                    F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("rep")
                )
            ),
            "graph_triangles": lambda: _graph_triangles(spark, li, noop),
            # round-6 shape: two-stage salted bottom-k (the
            # q_quantile_sketch / streaming sketch sample pass) —
            # stage 1 is scan-parallel per (type, salt), stage 2
            # touches ≤ 32·k survivors, so wall time must track the
            # scan, not the per-type sort a naive window would do
            "bottomk_sketch": lambda: noop(
                ev.select(
                    "event_type", "value",
                    F.conv(
                        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                        16, 10,
                    ).cast("bigint").alias("hv"),
                )
                .withColumn("salt", F.pmod(F.col("hv"), F.lit(32)))
                .withColumn(
                    "lrk",
                    F.row_number().over(
                        Window.partitionBy("event_type", "salt").orderBy("hv")
                    ),
                )
                .filter(F.col("lrk") <= 256)
                .withColumn(
                    "rk",
                    F.row_number().over(
                        Window.partitionBy("event_type").orderBy("hv")
                    ),
                )
                .filter(F.col("rk") <= 256)
            ),
            # round-6 shape: the q_bootstrap_ci 96×-replica expansion
            # (12 md5/row, 8 uniforms per hash, integer-cents sums) —
            # the bounded-generate + primitive-long agg pattern; wall
            # time must grow ~linearly in rows, never worse
            "hash_bootstrap": lambda: noop(
                ev.select(
                    "event_type",
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("bigint").alias("xc"),
                    F.explode(F.sequence(F.lit(0), F.lit(11))).alias("g"),
                    "event_id",
                )
                .select(
                    "event_type", "xc", "g",
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(":"),
                            F.col("g").cast("string"),
                        )
                    ).alias("h"),
                )
                .select(
                    "event_type", "xc",
                    F.explode(F.sequence(F.lit(0), F.lit(7))).alias("ck"),
                    "h", "g",
                )
                .select(
                    "event_type", "xc",
                    (F.col("g") * 8 + F.col("ck")).alias("b"),
                    F.when(
                        F.conv(
                            F.substring(
                                "h", F.lit(1) + 4 * F.col("ck"), F.lit(4)
                            ), 16, 10,
                        ).cast("bigint") / F.lit(65536.0) < 0.7357588823428847,
                        1,
                    ).otherwise(2).alias("w"),
                )
                .groupBy("event_type", "b")
                .agg(F.sum(F.col("w") * F.col("xc")).alias("sxc"),
                     F.sum("w").alias("sw"))
            ),
            # round-6 continuation shape: the broadcast-anchor
            # similarity scan (sim_knn_join / sim_hubness /
            # sim_margin_audit / sim_twonn family with a FIXED probe
            # batch): 200 anchors x N corpus dot products, one
            # streaming pass, per-anchor max — wall time must track
            # the corpus scan linearly (the quadratic %-sample
            # variants are documented separately as the hubness
            # estimator's own regime)
            "anchor_scan": lambda: noop(
                em.select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("v"),
                )
                .join(
                    F.broadcast(
                        em.filter(F.col("vec_id") < 200).select(
                            F.col("vec_id").alias("q_id"),
                            F.col("embedding").cast("array<double>")
                            .alias("qv"),
                        )
                    ),
                    F.col("vec_id") != F.col("q_id"),
                )
                .select(
                    "q_id",
                    F.aggregate(
                        F.zip_with(
                            F.col("v"), F.col("qv"),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    ).alias("dot"),
                )
                .groupBy("q_id")
                .agg(F.max("dot").alias("best"))
            ),
            # round-6 ninth-session shape: the q_permutation_test
            # single-scan WIDE conditional aggregation (50 resample
            # bits from per-hex-char md5 parities -> 100 conditional
            # sums in one partial-agg pass, zero row expansion). The
            # plan class behind "B resamples for the price of one
            # scan"; wall time must track the scan.
            "wide_perm_agg": lambda: noop(
                li.select(
                    F.md5(F.col("l_orderkey").cast("string")).alias("h1"),
                    F.md5(
                        F.concat(
                            F.col("l_orderkey").cast("string"), F.lit("#2")
                        )
                    ).alias("h2"),
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    .alias("x"),
                ).agg(
                    F.sum("x").alias("st"),
                    F.count(F.lit(1)).alias("nt"),
                    *[
                        agg
                        for b in range(50)
                        for agg in (
                            F.sum(
                                F.when(
                                    F.substring(
                                        F.col("h1" if b < 32 else "h2"),
                                        (b + 1) if b < 32 else (b - 31),
                                        1,
                                    ) < "8",
                                    F.col("x"),
                                )
                            ).alias(f"sa{b}"),
                            F.sum(
                                F.when(
                                    F.substring(
                                        F.col("h1" if b < 32 else "h2"),
                                        (b + 1) if b < 32 else (b - 31),
                                        1,
                                    ) < "8",
                                    1,
                                ).otherwise(0)
                            ).alias(f"na{b}"),
                        )
                    ],
                )
            ),
            # round-6 shape: the q_rolling_beta / q_rolling_corr
            # family — collapse facts to a (bucket × day) grid, then
            # a 91-row trailing window per bucket and a sparse
            # snapshot filter. Wall time must track the GRID (which
            # scales with key cardinality here), not the fact scan
            # rerun per window frame.
            "rolling_grid_window": lambda: noop(
                ev.select(
                    F.pmod(F.col("user_id"), F.lit(1000)).alias("bucket"),
                    F.date_trunc("day", F.col("ts").cast("timestamp"))
                    .cast("date").alias("day"),
                    F.col("value").cast("decimal(18,2)").alias("v"),
                )
                .groupBy("bucket", "day")
                .agg(F.sum("v").cast("double").alias("rev"))
                .select(
                    "bucket", "day", "rev",
                    F.avg("rev").over(
                        Window.partitionBy("bucket").orderBy("day")
                        .rowsBetween(-90, 0)
                    ).alias("ma"),
                    F.row_number().over(
                        Window.partitionBy("bucket").orderBy("day")
                    ).alias("rn"),
                )
                .filter(F.col("rn") % 30 == 0)
            ),
            # round-6 shape: sampled-source depth-limited Brandes
            # (mr_betweenness) — a fixed source set expands frontier
            # by frontier against the edge table, sigma summed per
            # (source, node); state is |sources| x |reached|, so wall
            # time must track the edge table, never |V|^2.
            "sampled_brandes": lambda: noop(
                (lambda edges: (
                    (lambda l1: l1.join(
                        edges.select(
                            F.col("src").alias("j_src"),
                            F.col("dst").alias("j_dst"),
                        ),
                        F.col("node") == F.col("j_src"),
                    )
                    .groupBy("s", F.col("j_dst").alias("node2"))
                    .agg(F.sum("sigma").alias("sigma2")))(
                        F.broadcast(
                            edges.filter(
                                (F.col("src") % 2 == 1)
                                & (F.expr("(src - 1) DIV 2") % 500 == 0)
                            )
                            .select(F.col("src").alias("s"),
                                    F.col("src").alias("node"))
                            .distinct()
                            .withColumn("sigma", F.lit(1).cast("bigint"))
                        )
                        .join(edges, F.col("node") == F.col("src"))
                        .groupBy("s", F.col("dst").alias("node"))
                        .agg(F.sum("sigma").alias("sigma"))
                    )
                ))(
                    li.select(
                        (F.col("l_orderkey") * 2).alias("src"),
                        (F.col("l_suppkey") * 2 + 1).alias("dst"),
                    ).distinct()
                )
            ),
            # round-6 shape: the q_kde_density fixed-grid fan-out —
            # every row contributes a kernel term to each of 64 grid
            # cells (bounded explode, x64 rows), one partial-agg
            # collapse per cell. Wall time must track rows x 64
            # linearly; the grid never grows with data.
            "kde_fanout": lambda: noop(
                ev.select(
                    F.col("value").cast("double").alias("x"),
                    F.explode(
                        F.sequence(F.lit(0), F.lit(63))
                    ).alias("g"),
                )
                .select(
                    "g",
                    F.exp(
                        -F.pow(
                            (F.col("x") - F.col("g") * 2.0) / 5.0, 2
                        ) / 2.0
                    ).alias("k"),
                )
                .groupBy("g")
                .agg(F.sum("k").alias("density"), F.count(F.lit(1)).alias("n"))
            ),
            # round-8 shape: the sim_graph_expand kNN-graph build —
            # within-cluster pair scoring (Σ|group|² like the triangle
            # probe's Σdeg²) + per-node top-G window. Replica-disjoint
            # cluster keys (label re-derived per replica, the same
            # DIV-stride trick as graph_triangles) keep |group| constant
            # while cluster COUNT scales with the data — the realistic
            # 100 TB regime, where the IVF cell count grows with the
            # corpus and cell size stays bounded. Wall time must track
            # the pair count linearly; a slope toward 16 would mean the
            # build is quadratic in corpus size, not in cell size.
            "graph_ann_build": lambda: noop(
                (lambda vecs: (
                    vecs.alias("a")
                    .join(
                        vecs.alias("b"),
                        (F.col("a.cl") == F.col("b.cl"))
                        & (F.col("a.vec_id") < F.col("b.vec_id")),
                    )
                    .select(
                        F.col("a.vec_id").alias("u"),
                        F.col("b.vec_id").alias("nb"),
                        F.col("a.cl").alias("cl"),
                        F.aggregate(
                            F.zip_with(
                                F.col("a.v"), F.col("b.v"),
                                lambda x, y: x * y,
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("dot"),
                    )
                    .withColumn(
                        "rk",
                        F.row_number().over(
                            Window.partitionBy("u")
                            .orderBy(F.desc("dot"), "nb")
                        ),
                    )
                    .filter(F.col("rk") <= 8)
                ))(
                    em.select(
                        "vec_id",
                        (
                            F.col("label")
                            + F.expr("vec_id DIV 100000000") * F.lit(1000)
                        ).alias("cl"),
                        F.col("embedding").cast("array<double>").alias("v"),
                    )
                )
            ),
            # round-9 shape: the plans/prefix.py two-phase global
            # prefix sum that replaced the data-scaled SinglePartition
            # windows (PERF #78) — within-bucket running sum over
            # hash-partitioned order-key buckets + a broadcast of the
            # |keyspace|/65536 offset grid. Replica key offsets grow
            # the keyspace with the data, so the bucket count scales
            # linearly (the realistic regime). Wall time must track
            # the row count; a slope toward 16 would mean the offsets
            # pass or the bucket join is super-linear.
            "global_prefix_sum": lambda: noop(
                two_phase_cumsum(
                    li.select(
                        "l_orderkey", "l_linenumber",
                        F.round(F.col("l_extendedprice") * 100, 0)
                        .cast("bigint").alias("cents"),
                    ),
                    ["l_orderkey", "l_linenumber"],
                    F.col("cents"),
                    F.floor(F.col("l_orderkey") / 65536).cast("bigint"),
                    out="c",
                )
            ),
            "cms_build": lambda: noop(
                ev.select(
                    "user_id", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
                )
                .select(
                    # the real kernel, not a copy — so the probe times
                    # exactly what the inventory/streaming code runs
                    "i", _cms_cell(F.col("i"), F.col("user_id")).alias("c"),
                )
                .groupBy("i", "c")
                .agg(F.count(F.lit(1)).alias("n"))
            ),
        }
        for name, fn in probes.items():
            if name not in selected:
                continue
            fn()  # warm (codegen compile, page cache)
            results.setdefault(name, {})[factor] = timed(fn)

    report = {}
    for name, by_scale in results.items():
        slopes = [
            round(by_scale[scales[i + 1]] / max(by_scale[scales[i]], 1e-9), 2)
            for i in range(len(scales) - 1)
        ]
        report[name] = {"sec": by_scale, "slope_per_4x": slopes}
    if args.aqe_scaled:
        report["_mode"] = "aqe-scaled-width"
    print(json.dumps(report))


if __name__ == "__main__":
    main()
