"""Incremental batch maintenance (SURVEY §2.H / §6).

The daily-ETL primitives a 100 TB pipeline runs between streaming
ingest and analytics:

- ``incremental_daily_rollup``: maintain a per-day summary table by
  computing ONLY days absent from the current summary and appending
  them as new partitions. Re-running is idempotent (day partitions
  are the unit of work); a bad day is repaired with
  ``sources.io.overwrite_partitions`` on that day alone.
- ``compact_parquet``: rewrite a directory of many small files into
  ~target-sized ones. Small files are the silent killer of scan
  parallelism economics at scale (one task per file, fixed open
  cost); compaction after high-parallelism writes restores sane
  file sizes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_FMT = "yyyy-MM-dd"


def daily_rollup(events: DataFrame) -> DataFrame:
    """The per-day summary this module maintains incrementally."""
    return events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), DAY_FMT).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def incremental_daily_rollup(
    spark: SparkSession, events: DataFrame, summary_path: str
) -> list[str]:
    """Bring the day-partitioned summary at ``summary_path`` up to
    date: aggregate only the days missing from it and append them as
    new partitions. Returns the list of days processed.

    Scale notes: the done-day set is partition *metadata* (tiny);
    the new-day filter is a partition-pruning predicate when events
    are stored partitioned by day, so old days are never re-read.

    Only a missing summary path is treated as "first run". Any OTHER
    read failure (corrupt footer, transient FS error, permissions)
    propagates: treating it as first-run would recompute every day and
    APPEND on top of existing partitions — silent double counting."""
    from pyspark.errors import AnalysisException

    try:
        done = {
            r.day
            for r in spark.read.parquet(summary_path)
            # partition-column type inference may read the day dir
            # name back as DATE — normalize to the string day format
            .select(F.date_format("day", DAY_FMT).alias("day"))
            .distinct()
            .collect()
        }
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        done = set()  # first run: no summary yet
    day = F.date_format(F.date_trunc("day", "ts"), DAY_FMT)
    fresh = events.filter(~day.isin(*done) if done else F.lit(True))
    new_days_df = daily_rollup(fresh)
    new_days = [r.day for r in new_days_df.select("day").distinct().collect()]
    if new_days:
        new_days_df.write.mode("append").partitionBy("day").parquet(summary_path)
    return sorted(new_days)


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_file_mb: int = 128
) -> int:
    """Rewrite ``path`` into ``out_path`` with ~target-sized files.
    File count = ceil(total_bytes / target); repartition (not
    coalesce) so rows spread evenly instead of concatenating input
    files. Returns the number of output files requested."""
    from pathlib import Path

    total = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
