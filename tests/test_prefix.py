"""plans/prefix.py — the two-phase global prefix sum / row_number that
replaced the data-scaled SinglePartition windows (PERF.md #78).

Contracts under test:
- exactness: bucketed result == the single-partition global window,
  row for row, for BIGINT values (regrouped addition), including
  negative buckets, empty buckets, and a bucket with one row;
- plan shape: no SinglePartition exchange ever sees the DATA — the
  only singleton pass is over the |buckets| offset grid.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from redmap_spark.plans.prefix import (  # noqa: E402
    two_phase_cumsum,
    two_phase_row_number,
)


def _rows(spark, n=997):
    # keys with gaps + negative values, deterministic
    return spark.range(n).select(
        (F.col("id") * 7 - 1500).alias("k"),
        ((F.col("id") % 13) - 3).cast("bigint").alias("v"),
    )


def test_two_phase_cumsum_matches_global_window(spark):
    df = _rows(spark)
    got = two_phase_cumsum(
        df, ["k"], F.col("v"), F.floor(F.col("k") / 256).cast("bigint"),
        out="cum",
    )
    want = df.select(
        "k", "v",
        F.sum("v").over(
            Window.orderBy("k").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_two_phase_row_number_matches_global_window(spark):
    df = _rows(spark)
    got = two_phase_row_number(
        df, ["k"], F.floor(F.col("k") / 256).cast("bigint"), out="rn"
    )
    want = df.select(
        "k", "v",
        F.row_number().over(Window.orderBy("k")).cast("bigint").alias("rn"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_two_phase_single_and_empty_buckets(spark):
    # one row per bucket and a huge gap (empty buckets in between)
    df = spark.createDataFrame(
        [(1, 10), (100000, 20), (200000, 30)], "k long, v long"
    )
    got = {
        r.k: r.cum
        for r in two_phase_cumsum(
            df, ["k"], F.col("v"),
            F.floor(F.col("k") / 64).cast("bigint"),
        ).collect()
    }
    assert got == {1: 10, 100000: 30, 200000: 60}


def test_two_phase_data_never_crosses_a_singleton(spark):
    """The data-sized side must stay hash-partitioned: execute and
    assert every SinglePartition exchange carried only the offset
    grid (#buckets rows), not the input rows."""
    from tools.sp_window_audit import singleton_exchange_rows

    df = _rows(spark, n=50_000)
    n_buckets = df.select(
        F.countDistinct(F.floor(F.col("k") / 256))
    ).collect()[0][0]
    got = two_phase_cumsum(
        df, ["k"], F.col("v"), F.floor(F.col("k") / 256).cast("bigint")
    )
    sp_rows = singleton_exchange_rows(got)
    assert sp_rows, "expected the offset-grid singleton pass"
    assert max(sp_rows) <= n_buckets, (sp_rows, n_buckets)


def test_two_phase_keeps_null_keys_nulls_first(spark):
    """NULL sort keys (hence NULL buckets) must be KEPT and sort
    first, matching the global Window.orderBy nulls-first default the
    helpers replace — a plain inner join on the bucket column would
    silently drop them (ADVICE r10)."""
    df = spark.createDataFrame(
        [(None, 5), (None, 7), (10, 1), (300, 2), (70000, 3)],
        "k long, v long",
    )
    bucket = F.floor(F.col("k") / 64).cast("bigint")

    got_rn = two_phase_row_number(df, ["k", "v"], bucket, out="rn")
    want_rn = df.select(
        "k", "v",
        F.row_number().over(Window.orderBy("k", "v")).cast("bigint").alias("rn"),
    )
    assert sorted(got_rn.collect(), key=str) == sorted(want_rn.collect(), key=str)

    got_cum = two_phase_cumsum(df, ["k", "v"], F.col("v"), bucket, out="cum")
    want_cum = df.select(
        "k", "v",
        F.sum("v").over(
            Window.orderBy("k", "v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
    )
    assert sorted(got_cum.collect(), key=str) == sorted(want_cum.collect(), key=str)
