"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table sorted by one column prunes scans on THAT column only; a
100 TB fact table queried by (customer, amount), (region, day), …
needs locality in several dimensions at once. Z-ordering interleaves
the bits of per-column quantile buckets so rows close in the Z curve
are close in every dimension — parquet row-group min/max stats then
exclude most groups for any selective conjunct, whichever dimension
it touches. This is the OSS-parquet form of what Delta/Iceberg call
OPTIMIZE ZORDER BY; `tests/test_zorder.py` measures the actual
row-group pruning from the parquet footers (pyarrow), not just the
plan.

All pure column expressions: the only driver-side values are the
per-column (min, max) bounds (a 1-row aggregate, broadcast into the
bucketing expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 10  # 2^10 buckets per dimension; 2 dims → 20-bit z values


def _bucket(col: str, mn: Column, mx: Column, bits: int) -> Column:
    """Quantize a numeric column to [0, 2^bits) by min/max range
    (rank-based quantization would equalize skew better; range keeps
    the expression join-free beyond the 1-row bounds broadcast)."""
    span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
    frac = (F.col(col).cast("double") - mn) / span
    q = F.floor(frac * ((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q)).cast("long")


def z_value(xb: Column, yb: Column, bits: int = BITS) -> Column:
    """Interleave the bits of two bucket ids (Morton code) as a pure
    closed-form expression — 2·bits shift/mask terms, fully inside
    whole-stage codegen."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + (F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
            + (F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i))
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    rows_per_group: int = 2000,
) -> None:
    """Write ``df`` clustered on z(col_x, col_y): range-partition by
    z value (globally ordered files), sort within partitions, small
    row groups so footer min/max stats are fine-grained. At cluster
    scale ``rows_per_group`` stays at parquet defaults (~1M rows) and
    ``n_files`` follows the table size; the mechanics are identical."""
    bounds = df.agg(
        F.min(F.col(col_x).cast("double")).alias("xmin"),
        F.max(F.col(col_x).cast("double")).alias("xmax"),
        F.min(F.col(col_y).cast("double")).alias("ymin"),
        F.max(F.col(col_y).cast("double")).alias("ymax"),
    )
    zed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_z",
            z_value(
                _bucket(col_x, F.col("xmin"), F.col("xmax"), BITS),
                _bucket(col_y, F.col("ymin"), F.col("ymax"), BITS),
            ),
        )
        .drop("xmin", "xmax", "ymin", "ymax")
    )
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        # small row groups so footer min/max stats are fine-grained
        # (tests); production keeps parquet defaults
        .option("parquet.block.size", rows_per_group * 32)
        .parquet(path)
    )


def row_groups_overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(overlapping, total) parquet row groups whose [min, max] stats
    intersect [lo, hi] — footer-level evidence of data skipping, read
    with pyarrow exactly the way the scan's predicate evaluation
    does."""
    from pathlib import Path

    import pyarrow.parquet as pq

    total = overlapping = 0
    for f in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            total += 1
            if stats is None or not stats.has_min_max:
                overlapping += 1
            elif not (stats.max < lo or stats.min > hi):
                overlapping += 1
    return overlapping, total
