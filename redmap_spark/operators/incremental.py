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


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    deleted_col: str | None = None,
) -> list[str]:
    """MERGE INTO (upsert + optional delete) for a partitioned parquet
    lake table, without requiring a table format:

    1. The affected-partition set is derived from ``updates`` — tiny
       metadata, the only thing collected.
    2. ONLY those partitions of the target are read back (the isin
       filter is a partition-pruning predicate on the day-partitioned
       layout — untouched partitions are never scanned).
    3. Matched target rows are dropped via a left-anti join on the
       key, updates are unioned in (minus tombstones when
       ``deleted_col`` names a boolean flag column).
    4. Dynamic partition overwrite rewrites exactly the affected
       partitions; a partition whose rows were ALL deleted is cleared
       explicitly (dynamic overwrite cannot write an empty partition).

    Idempotent: re-running the same updates converges to the same
    table. Constraint (standard for date-partitioned upserts): a key's
    partition value must be stable — moving a key between partitions
    requires a tombstone in the old partition plus an insert in the
    new one. Returns the sorted affected partition values.

    At 100 TB this is the compaction-friendly upsert pattern (rewrite
    whole partitions, no row-level indexes); row-level MERGE belongs
    to a table format (Iceberg/Delta), whose snapshot semantics
    ``operators/snapshots.py`` models separately.
    """
    from pyspark.errors import AnalysisException

    live = updates
    if deleted_col is not None:
        live = updates.filter(~F.col(deleted_col)).drop(deleted_col)
        keys_touched = updates.drop(deleted_col)
    else:
        keys_touched = updates

    try:
        target = spark.read.parquet(target_path)
        # partition-column type inference may read the partition dir
        # names back as DATE/INT; normalize to the updates' dtype so
        # the isin pruning filter and unionByName line up.
        upd_type = dict(keys_touched.dtypes)[partition_col]
        target = target.withColumn(
            partition_col, F.col(partition_col).cast(upd_type)
        )
    except AnalysisException as e:
        msg = str(e)
        # UNABLE_TO_INFER_SCHEMA = the path exists but holds no data
        # files (e.g. a previous bootstrap whose updates were all
        # tombstones) — semantically the same as no table yet.
        if (
            "PATH_NOT_FOUND" not in msg
            and "Path does not exist" not in msg
            and "UNABLE_TO_INFER_SCHEMA" not in msg
        ):
            raise
        # first run: the table IS the live updates
        live.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return sorted(str(r[0]) for r in live.select(partition_col).distinct().collect())

    parts = [r[0] for r in keys_touched.select(partition_col).distinct().collect()]
    affected = target.filter(F.col(partition_col).isin(parts))
    kept = affected.join(
        keys_touched.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    # materialize BEFORE overwriting: merged's lineage reads the very
    # files the write below replaces — an unmaterialized plan would
    # re-scan replaced files on any post-write action (and the write
    # itself must not race its own input). At cluster scale this is a
    # scratch-table write; locally localCheckpoint pins the rows.
    merged = kept.unionByName(live.select(*target.columns)).localCheckpoint(eager=True)
    written = {r[0] for r in merged.select(partition_col).distinct().collect()}

    from redmap_spark.sources.io import overwrite_partitions

    overwrite_partitions(merged, target_path, [partition_col])

    # partitions emptied by deletes: dynamic overwrite never saw them
    emptied = [p for p in parts if p not in written]
    if emptied:
        # local-FS clear; a cluster deployment routes this through the
        # Hadoop FileSystem API (same partition-directory semantics)
        import shutil
        from pathlib import Path

        for p in emptied:
            part_dir = Path(target_path) / f"{partition_col}={p}"
            if part_dir.exists():
                shutil.rmtree(part_dir)
    return sorted(str(p) for p in parts)
