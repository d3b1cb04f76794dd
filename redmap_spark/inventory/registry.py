"""Query inventory registry.

Every SURVEY.md §2 line registers here: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle SQL string computing the identical result (same column names,
same value types — see SURVEY §5).

Determinism rules (both sides must follow them so the driver's
order-insensitive value-hash matches):
- money/value aggregates go through DECIMAL(18,2) (exact, associative,
  partition-order independent), cast back to DOUBLE at the end;
- averages are computed as CAST(decimal_sum AS DOUBLE) / COUNT so both
  engines perform the same single double division;
- dates/timestamps in outputs are formatted to strings;
- integer sums in oracle SQL are CAST(... AS BIGINT) (DuckDB SUM(int)
  is HUGEINT otherwise);
- top-k queries break ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.plans.partitioning import spread  # noqa: F401  (re-export)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _session_hygiene(spark: SparkSession) -> None:
    """Drop dead cached frames before building the next entry.

    The driver gate, bench.py and the full sweeps run hundreds of
    entries back-to-back in ONE JVM; every completed entry's
    ``.cache()``'d frames stay pinned in the unified-memory storage
    pool until the JVM's periodic cleaner GC (default 30 min), and on
    a vanilla 1g driver the accumulated pins can OOM a later heavy
    entry (observed: mr_bipartite_cc at sf0.1 after the r9 window's
    26 similarity/graph-heavy predecessors — passes in isolation).
    Entries run sequentially and collect before the next build starts,
    so at build time every existing catalog cache is dead weight; the
    entry's own .cache() calls all happen after this point. Memoized
    localCheckpoints (the shared PCA Gram) are NOT catalog entries and
    survive. No-op on a cold session.

    Default-ON because the at-risk session is the DRIVER's own vanilla
    one (it can't set flags); a caller that legitimately owns caches
    across entry builds (a test fixture caching a shared frame, a
    future entry composing another entry mid-build) opts out with
    ``SPARK_GRAFT_KEEP_CACHES=1`` — correctness never depends on
    hygiene, only peak storage-pool occupancy does (ADVICE r10)."""
    import os

    if os.environ.get("SPARK_GRAFT_KEEP_CACHES") == "1":
        return
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001 — hygiene must never fail a query
        pass


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(
            spark: SparkSession, sf_dir: str, _fn=fn
        ) -> DataFrame:
            _session_hygiene(spark)
            return _fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec(col: Column | str) -> Column:
    """Exact 2-decimal representation of a monetary double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def money_sum(col: Column | str) -> Column:
    """Order-independent exact sum of a 2-decimal column, as double."""
    return F.sum(dec(col)).cast("double")


def dmean(col: Column | str) -> Column:
    """avg computed as exact-decimal-sum / count (deterministic)."""
    return F.sum(dec(col)).cast("double") / F.count(F.lit(1))
