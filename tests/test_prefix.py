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


def test_two_phase_keeps_null_keys_nulls_last_on_desc(spark):
    """DESC order_cols place NULL sort keys LAST in Spark's global
    window; the offset scan must pin the NULL bucket accordingly
    (ADVICE r10: a nulls-first-only offset scan would silently shift
    every non-null rank/cumsum when a desc sort key goes NULL)."""
    df = spark.createDataFrame(
        [(None, 5), (None, 7), (10, 1), (300, 2), (70000, 3)],
        "k long, v long",
    )
    # desc traversal: bucket ascends as k descends; NULL k -> NULL bucket
    bucket = (-F.floor(F.col("k") / 64)).cast("bigint")

    got_rn = two_phase_row_number(
        df, [F.col("k").desc(), "v"], bucket, out="rn"
    )
    want_rn = df.select(
        "k", "v",
        F.row_number()
        .over(Window.orderBy(F.col("k").desc(), "v"))
        .cast("bigint")
        .alias("rn"),
    )
    assert sorted(got_rn.collect(), key=str) == sorted(
        want_rn.collect(), key=str
    )

    got_cum = two_phase_cumsum(
        df, [F.col("k").desc(), "v"], F.col("v"), bucket, out="cum"
    )
    want_cum = df.select(
        "k", "v",
        F.sum("v").over(
            Window.orderBy(F.col("k").desc(), "v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
    )
    assert sorted(got_cum.collect(), key=str) == sorted(
        want_cum.collect(), key=str
    )

    # explicit desc_nulls_first overrides back to a leading NULL bucket
    got_first = two_phase_row_number(
        df, [F.col("k").desc_nulls_first(), "v"], bucket, out="rn"
    )
    want_first = df.select(
        "k", "v",
        F.row_number()
        .over(Window.orderBy(F.col("k").desc_nulls_first(), "v"))
        .cast("bigint")
        .alias("rn"),
    )
    assert sorted(got_first.collect(), key=str) == sorted(
        want_first.collect(), key=str
    )


def test_two_phase_ntile_matches_global_ntile(spark):
    """two_phase_ntile must reproduce Spark's ntile() exactly for
    every n (incl. the uneven-remainder distribution and n > N) and
    for DESC orderings with negated buckets."""
    df = _rows(spark, n=1003)
    from redmap_spark.plans.prefix import two_phase_ntile

    for n in (2, 5, 10, 7, 2000):
        got = two_phase_ntile(
            df, n, ["k"], F.floor(F.col("k") / 256).cast("bigint"),
            out="t",
        )
        want = df.select(
            "k", "v", F.ntile(n).over(Window.orderBy("k")).alias("t")
        )
        assert sorted(got.collect()) == sorted(want.collect()), n

    got_d = two_phase_ntile(
        df, 5, [F.col("k").desc(), "v"],
        (-F.floor(F.col("k") / 256)).cast("bigint"), out="t",
    )
    want_d = df.select(
        "k", "v",
        F.ntile(5).over(Window.orderBy(F.col("k").desc(), "v")).alias("t"),
    )
    assert sorted(got_d.collect()) == sorted(want_d.collect())


def test_two_phase_cummax_excl_matches_global_window(spark):
    """Exclusive running max (the skyline dominance scan): NULL for
    the global first row, bucket boundaries invisible."""
    from redmap_spark.plans.prefix import two_phase_cummax_excl

    df = _rows(spark, n=997)
    got = two_phase_cummax_excl(
        df, ["k"], F.col("v"), F.floor(F.col("k") / 256).cast("bigint"),
        out="m",
    )
    want = df.select(
        "k", "v",
        F.max("v").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        ).alias("m"),
    )
    assert sorted(got.collect(), key=str) == sorted(want.collect(), key=str)


def test_two_phase_cumsum_exact_for_decimals(spark):
    """Decimal values survive the two-phase regrouping exactly (the
    q_abc_analysis path: DECIMAL(21,4) revenue, DESC order)."""
    df = spark.range(500).select(
        (F.col("id") * 13 % 977).alias("k"),
        ((F.col("id") * 7919 % 100000) / 100)
        .cast("decimal(21,4)").alias("r"),
    )
    got = two_phase_cumsum(
        df, [F.desc("r"), F.asc("k")], F.col("r"),
        (-F.floor(F.col("r") / 64)).cast("bigint"), out="cum",
    )
    want = df.select(
        "k", "r",
        F.sum("r").over(
            Window.orderBy(F.desc("r"), F.asc("k")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
    )
    gm = {(r.k, str(r.r)): str(r.cum) for r in got.collect()}
    wm = {(r.k, str(r.r)): str(r.cum) for r in want.collect()}
    assert gm == wm
