"""Partitioning helpers shared by operators and inventory queries."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Logical-plan nodes that imply the input's width was already set by
# an exchange (or will be, by AQE): the shuffle chose the partition
# count, and spread() must not second-guess it. Join is deliberately
# NOT in this list — a broadcast dim join over a scan keeps the
# scan's (possibly deficient) width, and that is exactly the shape
# spread() exists to heal; a join that does shuffle gets its width
# from the exchange and the repartition on top is a cheap no-op-class
# coalesce of post-join rows.
_POST_SHUFFLE_NODES = (
    "Aggregate",
    "Repartition",
    "RepartitionByExpression",
    "Window",
    "Deduplicate",
    "Sort",
)


def spread(df: DataFrame) -> DataFrame:
    """Heal deficient scan parallelism before map-heavy work.

    Local testdata tables are single parquet files, so a scan (or a
    broadcast dim join over one) is 1-3 input partitions and a
    per-row-expensive stage (decimal moment folds, kernel fan-outs,
    broadcast k-NN scoring, E-steps) runs on as many cores.
    Repartition to the session's default parallelism ONLY when the
    scan's file count is narrower than half of it — on a real cluster
    a fact scan is thousands of files, so this is a no-op and never
    adds a data-sized shuffle at scale.

    Width is judged from ``df.inputFiles()`` — a metadata walk of the
    analyzed plan's file-source leaves. No ``df.rdd`` conversion
    happens here: probing the RDD of an AQE plan with upstream
    exchanges would eagerly materialize its query stages and the work
    would then re-run at action time. Plans whose width was already
    set by a shuffle (aggregate / window / sort / explicit
    repartition upstream) and plans with no file-source leaves
    (checkpointed / in-memory inputs) are returned unchanged.

    Results are unaffected: house folds are order-independent by the
    registry's determinism rules (tests/test_determinism.py)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    if any(node in analyzed for node in _POST_SHUFFLE_NODES):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) * 2 <= target:
        return df.repartition(target)
    return df
