"""redmap-parity fluent Pipeline API, compiled to DataFrame plans.

The reference framework lets users chain ``map`` / ``filter`` /
``flat_map`` / ``reduce_by_key`` / ``reduce`` steps which its runtime
ships to workers. Here the same fluent surface *builds a Catalyst
logical plan*: every step is declared with Column expressions, so the
chain fuses into whole-stage-codegen'd JVM code — nothing executes
until a terminal action, and the optimizer is free to reorder
(e.g. push a late ``filter`` into the scan).

Usage::

    from redmap_spark.api import Pipeline
    wc = (Pipeline.read_parquet(spark, path)
            .filter(F.col("lang") == "en")
            .flat_map(F.explode(F.split("text", " ")), alias="token")
            .reduce_by_key("token", n=F.count(F.lit(1)))
            .df)
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Pipeline:
    """Immutable fluent wrapper; each step returns a new Pipeline."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- sources -------------------------------------------------------

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "Pipeline":
        return cls(spark.read.parquet(path))

    @classmethod
    def from_df(cls, df: DataFrame) -> "Pipeline":
        return cls(df)

    # -- transforms (all lazy, all Catalyst-visible) -------------------

    def map(self, *cols: Column | str, **named: Column) -> "Pipeline":
        """Project each record to new columns (reference: the map step)."""
        exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
        exprs += [c.alias(name) for name, c in named.items()]
        return Pipeline(self.df.select(*exprs))

    def filter(self, cond: Column) -> "Pipeline":
        return Pipeline(self.df.filter(cond))

    def flat_map(self, exploded: Column, alias: str, keep: Iterable[str] = ()) -> "Pipeline":
        """One record → N records (reference: emit-many map)."""
        cols = [F.col(c) for c in keep] + [exploded.alias(alias)]
        return Pipeline(self.df.select(*cols))

    def reduce_by_key(self, *keys: str, **aggs: Column) -> "Pipeline":
        """Associative reduce per key; Spark runs map-side partial
        aggregation before the shuffle (the reference's combiner)."""
        return Pipeline(
            self.df.groupBy(*keys).agg(*[a.alias(n) for n, a in aggs.items()])
        )

    def reduce(self, **aggs: Column) -> "Pipeline":
        """Global associative fold → single row."""
        return Pipeline(self.df.agg(*[a.alias(n) for n, a in aggs.items()]))

    def sort(self, *cols: Column | str) -> "Pipeline":
        return Pipeline(self.df.orderBy(*cols))

    def top(self, n: int, *cols: Column | str) -> "Pipeline":
        return Pipeline(self.df.orderBy(*cols).limit(n))

    def union(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self.df.union(other.df))

    def distinct(self) -> "Pipeline":
        return Pipeline(self.df.distinct())

    def join(
        self, other: "Pipeline", on: str | list[str], how: str = "inner", broadcast: bool = False
    ) -> "Pipeline":
        """Keyed join of two pipelines (reference: the join of two
        job outputs). ``broadcast=True`` marks the other side as a
        dim table — at scale, the difference between a map-side
        lookup and a full shuffle."""
        right = F.broadcast(other.df) if broadcast else other.df
        return Pipeline(self.df.join(right, on, how))

    def sample(self, fraction: float, key: str) -> "Pipeline":
        """Deterministic hash sample: keeps rows where
        xxhash64(key) mod 10000 < fraction·10000. Unlike rand()
        sampling it is stable across retries/partitionings — the only
        kind of sample that is reproducible on a cluster."""
        return Pipeline(
            self.df.filter(F.pmod(F.xxhash64(key), F.lit(10000)) < int(fraction * 10000))
        )

    def stratified_sample(
        self, fractions: dict, stratum_col: str, key: str
    ) -> "Pipeline":
        """Per-stratum deterministic hash sample (e.g. downsample the
        dominant language, keep 100% of the rare one — the standard
        training-mixture rebalance). Strata absent from ``fractions``
        are dropped."""
        frac_map = F.create_map(
            *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(int(v * 10000)))]
        )
        cut = F.coalesce(F.element_at(frac_map, F.col(stratum_col)), F.lit(0))
        return Pipeline(self.df.filter(F.pmod(F.xxhash64(key), F.lit(10000)) < cut))

    def observe(self, name: str, **metrics: Column) -> "Pipeline":
        """MapReduce-counter parity done right: accumulators
        double-count on task retries, ``DataFrame.observe`` metrics
        are exactly-once per completed action. Read them back from
        the observation after an action via the returned plan's
        listener, or use ``pyspark.sql.Observation`` (see
        tests/test_pipeline_api.py)."""
        return Pipeline(self.df.observe(name, *[c.alias(n) for n, c in metrics.items()]))

    # -- terminal actions ----------------------------------------------

    def collect(self):
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)
