"""Item-9 (VERDICT r11): commit MID-ITERATION explain artifacts for the
iterative entries touched in r12 — the per-round join plan that the
final-stage dump can't show (rounds materialize via localCheckpoint).

Reconstructs ONE round of each entry's loop exactly as the inventory
code builds it (same helpers, same frames) and writes
plans/r12/<entry>_round_<tag>.txt.

Usage: python tools/dump_iter_plans_r12.py <tag>   # tag = before|after
Run from the tree whose code should be dumped (the r11 worktree for
`before`, the repo HEAD for `after`).
"""

from __future__ import annotations

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

from pyspark.sql import functions as F  # noqa: E402

from redmap_spark.catalog import Catalog  # noqa: E402
from redmap_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = Path("/root/repo/plans/r12")  # always the live repo, even from a worktree


def explain(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scc_round(spark):
    """One squaring round of mr_scc, from a materialized reach."""
    import redmap_spark.inventory.graph as g

    cat = Catalog(spark, SF_DIR)
    nodes = cat.nation.select(
        F.col("n_nationkey").cast("bigint").alias("src"),
        F.col("n_nationkey").cast("bigint").alias("dst"),
    )
    src = Path(g.__file__).read_text()
    if "coalesce(1)" in src and "mr_scc" in src:
        reach = nodes.coalesce(1).distinct().localCheckpoint(eager=True)
        hop = reach.select(
            F.col("src").alias("a"), F.col("dst").alias("m")
        ).coalesce(1)
        ext = reach.select(
            F.col("src").alias("m"), F.col("dst").alias("b")
        ).coalesce(1)
        nxt = hop.join(ext, "m")
    else:  # r11 shape
        reach = nodes.distinct().localCheckpoint(eager=True)
        hop = reach.select(F.col("src").alias("a"), F.col("dst").alias("m"))
        ext = reach.select(F.col("src").alias("m"), F.col("dst").alias("b"))
        nxt = hop.join(ext, "m")
    return nxt.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).distinct()


def textrank_round(spark):
    """One rank round of txt_textrank, from a materialized edge grid."""
    import redmap_spark.inventory.text3 as t3

    cat = Catalog(spark, SF_DIR)
    d = cat.documents
    t = d.select(F.split("text", " ").alias("tk"))
    uc = (
        t.select(F.explode("tk").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        uc.filter(F.length("w") >= 4).orderBy(F.desc("c"), "w").limit(200)
        .select("w").cache()
    )
    ew = (
        vocab.select(F.col("w").alias("src"))
        .crossJoin(vocab.select(F.col("w").alias("dst")))
        .limit(500)
        .withColumn("p", F.lit(0.1))
    )
    src = Path(t3.__file__).read_text()
    if "edges.coalesce(1).join(" in src:
        edges = ew.coalesce(1).localCheckpoint()
        base = edges.coalesce(1)
    else:  # r11 shape
        edges = ew.localCheckpoint()
        base = edges
    n = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    s = vocab.join(F.broadcast(n)).select("w", (1.0 / F.col("nv")).alias("s"))
    con = (
        base.join(F.broadcast(s.select(F.col("w").alias("src"), "s")), "src")
        .groupBy(F.col("dst").alias("w"))
        .agg(F.sum(F.round(F.col("p") * F.col("s"), 9)
                   .cast("decimal(28,9)")).cast("double").alias("c"))
    )
    return vocab.join(F.broadcast(n)).join(F.broadcast(con), "w", "left").select(
        "w", ((1.0 - 0.85) / F.col("nv")
              + 0.85 * F.coalesce(F.col("c"), F.lit(0.0))).alias("s")
    )


def pagerank_round(spark):
    """One contribution round of mr_pagerank over the pinned edges."""
    import redmap_spark.inventory.mapreduce as mrm

    cat = Catalog(spark, SF_DIR)
    e0 = (
        cat.orders.join(
            cat.lineitem.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .limit(10000)
        .localCheckpoint(eager=True)
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).cache()
    nodes = deg.select(F.col("src").alias("node"))
    w_edges = edges.join(deg, "src").repartition("dst").cache()
    ranks = nodes.select("node", F.lit(0.001).alias("r")).localCheckpoint()
    src = Path(mrm.__file__).read_text()
    contrib = (
        w_edges.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("r") / F.col("d")).alias("m"))
    )
    if "the oracle's `nodes LEFT JOIN" in src or "nodes LEFT JOIN" in src:
        return contrib.select(
            "node", (F.lit(0.15 / 1000.0) + F.lit(0.85) * F.col("m")).alias("r")
        )
    return nodes.join(F.broadcast(contrib), "node", "left").select(
        "node",
        (F.lit(0.15 / 1000.0)
         + F.lit(0.85) * F.coalesce("m", F.lit(0.0))).alias("r"),
    )


def main():
    tag = sys.argv[1]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("iter-plan-dump")
    for name, builder in (
        ("mr_scc_round", scc_round),
        ("txt_textrank_round", textrank_round),
        ("mr_pagerank_round", pagerank_round),
    ):
        df = builder(spark)
        (OUT / f"{name}_{tag}.txt").write_text(explain(df))
        print("wrote", name, tag)


if __name__ == "__main__":
    main()
