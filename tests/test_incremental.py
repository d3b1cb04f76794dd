"""Incremental maintenance (operators/incremental.py): catch-up runs
must converge to the full batch recompute, idempotently."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.operators.incremental import (
    compact_parquet,
    daily_rollup,
    incremental_daily_rollup,
)
from tests.conftest import SF_SMALL


def _as_map(df):
    df = df.withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    return {r.day: (r.n_events, r.sum_value, r.n_users) for r in df.collect()}


def test_incremental_rollup_converges(spark, tmp_path):
    c = Catalog(spark, SF_SMALL)
    cutoff = c.events.select(
        F.percentile(F.unix_micros("ts"), F.lit(0.5)).alias("m")
    ).collect()[0].m
    first_half = c.events.filter(F.unix_micros("ts") <= cutoff)
    path = str(tmp_path / "summary")

    days1 = incremental_daily_rollup(spark, first_half, path)
    assert days1  # produced something
    # catch-up with the full stream: only NEW days are processed
    days2 = incremental_daily_rollup(spark, c.events, path)
    assert not (set(days1) & set(days2))
    # a third run is a no-op (idempotent)
    assert incremental_daily_rollup(spark, c.events, path) == []

    got = _as_map(spark.read.parquet(path))
    want = _as_map(daily_rollup(c.events))
    # boundary day was sealed early with partial data — by design the
    # unit of work is a day; every FULLY-covered day must match batch
    boundary = max(days1)
    for day, vals in want.items():
        if day != boundary:
            assert got[day] == vals, day


def test_compact_parquet(spark, tmp_path):
    c = Catalog(spark, SF_SMALL)
    frag = str(tmp_path / "fragmented")
    c.events.repartition(16).write.parquet(frag)
    out = str(tmp_path / "compact")
    compact_parquet(spark, frag, out, target_file_mb=128)
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 1  # tiny data → 1 file
    assert spark.read.parquet(out).count() == c.events.count()


def test_merge_upsert_full_cycle(spark, tmp_path):
    """insert → update → delete → idempotent re-run, with untouched
    partitions never rewritten (verified by file mtimes)."""
    import os
    from pathlib import Path

    from redmap_spark.operators.incremental import merge_upsert

    tgt = str(tmp_path / "users")
    base = spark.createDataFrame(
        [(1, "a", 10.0, "2024-01-01"), (2, "b", 20.0, "2024-01-01"),
         (3, "c", 30.0, "2024-01-02"), (4, "d", 40.0, "2024-01-03")],
        "id long, name string, score double, day string",
    )
    # first run bootstraps the table
    assert merge_upsert(spark, tgt, base, ["id"], "day") == [
        "2024-01-01", "2024-01-02", "2024-01-03",
    ]

    def snapshot():
        # normalize the inferred DATE partition column back to string
        df = spark.read.parquet(tgt).withColumn("day", F.col("day").cast("string"))
        return {r.id: (r.name, r.score, r.day) for r in df.collect()}

    assert snapshot()[2] == ("b", 20.0, "2024-01-01")
    mtimes_untouched = {
        f: os.stat(f).st_mtime for f in map(str, (Path(tgt) / "day=2024-01-03").glob("*.parquet"))
    }
    assert mtimes_untouched

    # update id=2, insert id=5, delete id=3 (empties nothing)
    ups = spark.createDataFrame(
        [(2, "B2", 25.0, "2024-01-01", False),
         (5, "e", 50.0, "2024-01-02", False),
         (3, None, None, "2024-01-02", True)],
        "id long, name string, score double, day string, _deleted boolean",
    )
    parts = merge_upsert(spark, tgt, ups, ["id"], "day", deleted_col="_deleted")
    assert parts == ["2024-01-01", "2024-01-02"]
    snap = snapshot()
    assert snap[2] == ("B2", 25.0, "2024-01-01")
    assert snap[5] == ("e", 50.0, "2024-01-02")
    assert 3 not in snap
    assert snap[1] == ("a", 10.0, "2024-01-01")  # unmatched row in touched partition survives
    # untouched partition files were not rewritten
    for f, m in mtimes_untouched.items():
        assert os.stat(f).st_mtime == m

    # idempotence: same updates converge to the same table
    merge_upsert(spark, tgt, ups, ["id"], "day", deleted_col="_deleted")
    assert snapshot() == snap

    # deleting the last row of a partition clears the partition dir
    wipe = spark.createDataFrame(
        [(5, None, None, "2024-01-02", True)],
        "id long, name string, score double, day string, _deleted boolean",
    )
    merge_upsert(spark, tgt, wipe, ["id"], "day", deleted_col="_deleted")
    snap2 = snapshot()
    assert 5 not in snap2 and set(snap2) == {1, 2, 4}
    assert not (Path(tgt) / "day=2024-01-02").exists()


def test_cdc_feed_apply_roundtrip(spark, tmp_path):
    """End-to-end CDC story: materialize snapshot A, compute the
    q_change_feed-style diff A→B, replay it through merge_upsert, and
    require the result to equal snapshot B exactly — i.e. the change
    feed is a faithful, applyable delta, not just a report."""
    from redmap_spark.catalog import Catalog
    from redmap_spark.operators.incremental import merge_upsert

    o = Catalog(spark, SF_SMALL).orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
    )
    snap_a = o.filter(F.col("month") < "1998-01")
    snap_b = o.filter(F.col("month") < "1999-01").withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderstatus") == "P", "F").otherwise(F.col("o_orderstatus")),
    )

    target = str(tmp_path / "orders_lake")
    snap_a.write.partitionBy("month").parquet(target)

    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    ak, bk = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    feed = joined.filter(
        ak.isNull() | bk.isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    ).select(
        F.coalesce(bk, ak).alias("o_orderkey"),
        F.coalesce(F.col("b.o_orderstatus"), F.col("a.o_orderstatus")).alias("o_orderstatus"),
        F.coalesce(F.col("b.o_totalprice"), F.col("a.o_totalprice")).alias("o_totalprice"),
        F.coalesce(F.col("b.month"), F.col("a.month")).alias("month"),
        bk.isNull().alias("_deleted"),
    )
    assert feed.count() > 0

    merge_upsert(spark, target, feed, ["o_orderkey"], "month", deleted_col="_deleted")

    got = spark.read.parquet(target).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.col("month").cast("string").alias("month"),
    )
    assert got.count() == snap_b.count()
    assert got.exceptAll(snap_b).count() == 0
    assert snap_b.exceptAll(got).count() == 0
