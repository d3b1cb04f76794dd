"""Partitioning helpers shared by operators and inventory queries."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Heal deficient scan parallelism before map-heavy work.

    Local testdata tables are single parquet files, so a scan is 1-3
    input partitions and a per-row-expensive stage (decimal moment
    folds, kernel fan-outs, broadcast k-NN scoring, E-steps) runs on
    as many cores. Repartition to the session's default parallelism
    ONLY when the upstream is narrower than half of it — on a real
    cluster a fact scan is already thousands of partitions, so this
    is a no-op and never adds a data-sized shuffle at scale. Results
    are unaffected: house folds are order-independent by the
    registry's determinism rules (enforced by
    tests/test_determinism.py)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
