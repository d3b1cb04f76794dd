"""Dynamic time warping over grouped series — the Arrow-seam pattern
for dynamic-programming algorithms Spark's relational algebra cannot
express (SURVEY §2 custom-operator tier (b): a Pandas-UDF-backed
mapInPandas where no composition of built-ins exists).

Scale posture: the DP is O(len_a · band) per PAIR, and series length
is bounded by the TIME WINDOW (days), not by data volume — the fact
stream collapses to |key × day| grids JVM-side before a single byte
crosses the Arrow boundary, so at 100 TB each task still carries
kilobyte-sized arrays. Pair fan-out is |keys|², intended for bounded
key sets (event types, top-N series); for large key sets pre-block
pairs the way dedup blocks shingles.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def dtw_distance(a, b, band: int) -> float:
    """Sakoe-Chiba banded DTW with |i−j| ≤ max(band, |n−m|) so the
    corner is always reachable; absolute-difference local cost."""
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    w = max(band, abs(n - m))
    inf = float("inf")
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo = max(1, i - w)
        hi = min(m, i + w)
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            cost = abs(ai - b[j - 1])
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])


_PAIR_SCHEMA = StructType(
    [
        StructField("key_a", StringType()),
        StructField("key_b", StringType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("dtw", DoubleType()),
        StructField("dtw_per_step", DoubleType()),
    ]
)


def dtw_pairs(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    band: int = 7,
) -> DataFrame:
    """All-pairs banded DTW between per-key series.

    ``series`` is a long frame (key, order, value); values are
    assembled into time-ordered arrays JVM-side (sort_array over
    collect_list — deterministic given unique (key, order)), pairs
    are formed with key_a < key_b, and the DP runs in one Arrow batch
    per partition.
    """
    arr = series.groupBy(F.col(key_col).alias("k")).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: s[value_col],
        ).alias("v")
    )
    pairs = (
        arr.alias("a")
        .join(
            F.broadcast(
                arr.select(
                    F.col("k").alias("kb"), F.col("v").alias("vb")
                ).alias("b")
            ),
            F.col("k") < F.col("kb"),
        )
        .select(
            F.col("k").alias("key_a"),
            F.col("kb").alias("key_b"),
            F.col("v").alias("va"),
            F.col("vb"),
        )
    )

    def compute(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                va, vb = list(row["va"]), list(row["vb"])
                d = dtw_distance(va, vb, band)
                steps = len(va) + len(vb)
                rows.append(
                    (
                        row["key_a"],
                        row["key_b"],
                        len(va),
                        len(vb),
                        round(d, 6),
                        round(d / steps, 6) if steps else float("nan"),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PAIR_SCHEMA.fields]
            )

    return pairs.mapInPandas(compute, schema=_PAIR_SCHEMA)
