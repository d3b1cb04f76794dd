"""Distributed (two-phase) global prefix sums and ranks.

``Window.orderBy(key)`` with no partition key funnels EVERY input row
through one SinglePartition exchange — fine on a bounded grid (a
|days| calendar), an OOM at 100 TB when the windowed frame scales
with the data (distinct prices, raw order keys: the q_eta_promise r7
shape). This module is the scalable replacement, the classic
two-phase parallel scan expressed in DataFrame algebra:

1. bucket every row by a coarse, ORDER-ALIGNED function of the sort
   key (caller-supplied: ``floor(price/4096)``, ``floor(key/65536)``
   — all rows of bucket b sort before all rows of bucket b+1);
2. run the running sum / row_number WITHIN each bucket — an ordinary
   hash-partitioned window, parallel across buckets;
3. aggregate one total per bucket, prefix-sum THOSE (a window over
   |buckets| rows — the only singleton pass, now over the bucket
   grid, which is domain-bounded or data-size/width), and broadcast
   the exclusive offsets back.

global_prefix = bucket_offset + within_bucket_prefix, exactly — for
BIGINT/exact-decimal values the regrouped addition is associative, so
results (and oracle hashes) are unchanged.

Bucket-count guidance: pick the bucket width so |buckets| is
domain-bounded where the sort key has a bounded domain (prices,
balances, event values), or data_size/width where it does not (raw
order keys) — 2^16 keys per bucket keeps the offset grid ~1000 rows
per 10^8 keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value: Column,
    bucket: Column,
    out: str = "cum",
) -> DataFrame:
    """Inclusive global running sum of ``value`` over ``order_cols``.

    ``bucket`` MUST be order-aligned with ``order_cols[0]`` (monotone
    non-decreasing), and ``order_cols`` must totally order rows within
    a bucket (use the grouping key of a distinct-value grid, or a
    unique row key) — ties would make the within-bucket frame
    nondeterministic. Exact for BIGINT / decimal values: addition is
    regrouped per bucket, never reordered within one.

    NULL sort keys (hence a NULL ``bucket``) are kept and sort first,
    matching the nulls-first default of the global ``Window.orderBy``
    this replaces: NULL is a legal partition/group value in the
    within-bucket window and the per-bucket totals, sorts first in the
    offset scan, and the offset join is null-safe so NULL-bucket rows
    are never dropped.
    """
    return _two_phase(df, order_cols, bucket, out, agg=value)


def _two_phase(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    out: str,
    agg: Column | None,
) -> DataFrame:
    """Shared kernel: within-bucket scan + broadcast null-safe join of
    exclusive bucket offsets. ``agg`` None → row_number, else sum."""
    b = df.withColumn("__b", bucket)
    if agg is None:
        win = Window.partitionBy("__b").orderBy(*order_cols)
        inner = b.withColumn("__in", F.row_number().over(win).cast("bigint"))
        per = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__t"))
    else:
        win = (
            Window.partitionBy("__b")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        inner = b.withColumn("__in", F.sum(agg).over(win))
        per = b.groupBy("__b").agg(F.sum(agg).alias("__t"))
    # NULL buckets (NULL sort key) sort first here — Spark's ascending
    # nulls-first — so every non-null bucket's offset includes them.
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        F.col("__b").alias("__b2"),
        F.coalesce(F.sum("__t").over(woff), F.lit(0).cast("bigint"))
        .alias("__off"),
    )
    # eqNullSafe: a plain inner equi-join on __b would silently drop
    # NULL-bucket rows that the global window it replaces keeps.
    return (
        inner.join(F.broadcast(offs), inner["__b"].eqNullSafe(offs["__b2"]))
        .withColumn(out, F.col("__off") + F.col("__in"))
        .drop("__b", "__b2", "__in", "__off")
    )


def two_phase_row_number(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    out: str = "rn",
) -> DataFrame:
    """Global ``row_number() over (order by order_cols)`` without a
    SinglePartition pass over the data: within-bucket row_number plus
    broadcast exclusive bucket-count offsets. ``order_cols`` must be
    unique per row within a bucket for a deterministic rank. NULL
    sort keys are kept and rank first (nulls-first, null-safe offset
    join) — same semantics as the global window this replaces."""
    return _two_phase(df, order_cols, bucket, out, agg=None)
