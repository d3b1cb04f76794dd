"""Partitioning helpers shared by operators and inventory queries."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Logical-plan nodes that imply the input's width was already set by
# an exchange (or will be, by AQE). spread() must not second-guess
# those — and, more importantly, must not call df.rdd on them:
# converting an AQE plan with upstream exchanges to an RDD
# materializes its query stages EAGERLY, and the work then re-runs at
# action time. Scan-shaped plans (Relation + Project/Filter) convert
# lazily and cheaply.
_POST_SHUFFLE_NODES = (
    "Join",
    "Aggregate",
    "Repartition",
    "RepartitionByExpression",
    "Window",
    "Deduplicate",
    "Sort",
)


def spread(df: DataFrame) -> DataFrame:
    """Heal deficient scan parallelism before map-heavy work.

    CONTRACT: the input must be SCAN-SHAPED — a parquet relation under
    only narrow operators (project / filter / generate). Local
    testdata tables are single parquet files, so such a scan is 1-3
    input partitions and a per-row-expensive stage (decimal moment
    folds, kernel fan-outs, broadcast k-NN scoring, E-steps) runs on
    as many cores. Repartition to the session's default parallelism
    ONLY when the upstream is narrower than half of it — on a real
    cluster a fact scan is already thousands of partitions, so this
    is a no-op and never adds a data-sized shuffle at scale.

    Post-shuffle inputs (joins, aggregations, explicit repartitions —
    e.g. a corpus handed to knn_join_bruteforce after a groupBy) are
    detected from the ANALYZED logical plan (no execution) and
    returned unchanged: their width was already chosen by the
    exchange, and probing df.rdd there would eagerly materialize AQE
    query stages that then re-run at action time.

    Results are unaffected: house folds are order-independent by the
    registry's determinism rules (tests/test_determinism.py)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    if any(node in analyzed for node in _POST_SHUFFLE_NODES):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
