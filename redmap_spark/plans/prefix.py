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
    order_cols: list,
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


def _null_bucket_order(order_cols: list) -> Column:
    """Offset-scan ordering for the bucket grid, with the NULL bucket
    placed where the window being replaced would place NULL sort keys:
    Spark defaults to nulls-FIRST for ascending ``orderBy`` and
    nulls-LAST for descending. The bucket column is order-aligned with
    ``order_cols[0]``, so its direction decides the placement (an
    explicit ``asc_nulls_last``/``desc_nulls_first`` on the sort key is
    honored the same way — the placement keyword, not the direction,
    is what matters)."""
    head = str(order_cols[0]) if order_cols else ""
    nulls_last = "NULLS LAST" in head or (
        " DESC" in head and "NULLS FIRST" not in head
    )
    return F.col("__b").asc_nulls_last() if nulls_last else F.col("__b").asc()


def _two_phase(
    df: DataFrame,
    order_cols: list,
    bucket: Column,
    out: str,
    agg: Column | None,
    totals_out: list | None = None,
) -> DataFrame:
    """Shared kernel: within-bucket scan + broadcast null-safe join of
    exclusive bucket offsets. ``agg`` None → row_number, else sum.
    When ``totals_out`` is given, the per-bucket totals frame
    (``__b``, ``__t``) is appended to it so callers can derive global
    aggregates from |buckets| rows instead of re-scanning ``df``."""
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
    if totals_out is not None:
        totals_out.append(per)
    # NULL buckets (NULL sort key) are pinned to where the replaced
    # global window sorts NULL keys (first for asc, last for desc —
    # see _null_bucket_order), so every offset regroups exactly.
    woff = Window.orderBy(_null_bucket_order(order_cols)).rowsBetween(
        Window.unboundedPreceding, -1
    )
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
    order_cols: list,
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


def two_phase_ntile(
    df: DataFrame,
    n: int,
    order_cols: list,
    bucket: Column,
    out: str = "tile",
) -> DataFrame:
    """Global ``ntile(n) over (order by order_cols)`` without a
    SinglePartition pass: two-phase global row_number plus the
    standard ntile bucket formula (first ``N mod n`` tiles carry
    ``ceil(N/n)`` rows — the SQL-standard distribution Spark and
    DuckDB both implement). ``order_cols`` must be unique per row for
    a deterministic tiling. Result column is INT, like ntile's."""
    totals: list = []
    rn = _two_phase(df, order_cols, bucket, "__rn", agg=None, totals_out=totals)
    # global N from the per-bucket totals (|buckets| rows) — NOT from a
    # second scan of df, which would re-evaluate un-materialized input
    # lineage (ADVICE r10: q_cem_att's 3-way join ran twice for a 1-row
    # count).
    tot = totals[0].groupBy().agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("bigint").alias("__n")
    )
    base = F.floor(F.col("__n") / n).cast("bigint")
    rem = (F.col("__n") % n).cast("bigint")
    head = rem * (base + 1)  # rows living in the ceil-sized tiles
    tile = F.when(
        F.col("__rn") <= head,
        F.floor((F.col("__rn") - 1) / (base + 1)) + 1,
    ).otherwise(
        # greatest() guards the N < n case (base = 0): the branch is
        # unreachable then, but ANSI mode would still raise on the
        # division during codegen of the dead arm
        rem + F.floor((F.col("__rn") - head - 1) / F.greatest(base, F.lit(1)))
        + 1
    )
    return (
        rn.join(F.broadcast(tot))
        .withColumn(out, tile.cast("int"))
        .drop("__rn", "__n")
    )


def two_phase_cummax_excl(
    df: DataFrame,
    order_cols: list,
    value: Column,
    bucket: Column,
    out: str = "cummax",
) -> DataFrame:
    """Global ``max(value) over (order by order_cols rows between
    unbounded preceding and -1)`` — the strict-predecessor running
    max (skyline dominance test) — without a SinglePartition data
    pass: within-bucket exclusive running max, plus broadcast
    exclusive per-bucket maxima. NULL for the global first row,
    exactly like the window it replaces. max is associative and
    order-insensitive, so the regrouping is exact for any type."""
    b = df.withColumn("__b", bucket)
    win = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inner = b.withColumn("__in", F.max(value).over(win))
    per = b.groupBy("__b").agg(F.max(value).alias("__t"))
    woff = Window.orderBy(_null_bucket_order(order_cols)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.select(
        F.col("__b").alias("__b2"),
        F.max("__t").over(woff).alias("__off"),
    )
    merged = F.when(
        F.col("__in").isNull() & F.col("__off").isNull(), F.lit(None)
    ).otherwise(
        F.greatest(
            F.coalesce(F.col("__in"), F.col("__off")),
            F.coalesce(F.col("__off"), F.col("__in")),
        )
    )
    return (
        inner.join(F.broadcast(offs), inner["__b"].eqNullSafe(offs["__b2"]))
        .withColumn(out, merged)
        .drop("__b", "__b2", "__in", "__off")
    )
