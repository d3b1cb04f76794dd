"""Sources / sinks (SURVEY §2.H).

Thin, explicit wrappers over the Spark readers/writers: every reader
takes an explicit schema (schema inference is a full extra pass at
100 TB — never rely on it in production paths), every writer supports
partitioned layout (the physical design that enables partition
pruning downstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # parquet is self-describing; schema comes from the footer
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. Defaults chosen for 100 TB rest:
    zstd (better ratio than snappy at similar scan speed on modern
    CPUs) and an optional maxRecordsPerFile cap so one skewed
    partition can't produce a multi-GB file that a future task must
    read whole."""
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    compression: str = "zstd",
) -> None:
    """Backfill sink: dynamic partition overwrite replaces ONLY the
    partitions present in ``df`` (e.g. re-running one bad day of a
    365-day table) instead of truncating the whole dataset — the
    idempotent-reprocessing primitive every large pipeline needs."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sort-ordered) managed table.

    Bucketing is the at-rest co-location strategy for 100 TB fact-to-
    fact joins: two tables bucketed by the same key into the same
    bucket count join with NO exchange on either side (asserted in
    tests/test_sources.py::test_bucketed_join_has_no_shuffle) — the
    shuffle is paid once at write time, then amortized over every
    subsequent join/aggregation on that key."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC sink (columnar alternative where the downstream stack is
    Hive/Trino-centric; same pushdown + pruning properties)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-asset ingestion via the built-in ``binaryFile`` source —
    how image/audio/video payloads enter the lake before they become
    typed binary columns (multimodal/columns.py). Emits (path,
    modificationTime, length, content) plus a ``file_name`` column
    for joining sidecar metadata. The source supports predicate
    pushdown on the file-status columns (e.g. length < N skips large
    assets without reading a byte) and normal partition-dir pruning;
    at 100 TB you point it at a partitioned asset prefix and prune,
    never list-then-filter driver-side."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.withColumn(
        "file_name", F.element_at(F.split(F.col("path"), "/"), -1)
    )


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
) -> DataFrame:
    """PERMISSIVE CSV ingest with a quarantine column: malformed rows
    land whole in ``corrupt_col`` (their typed fields null) instead of
    failing the job — the dirty-feed pattern where a 100 TB load must
    not die on row 3 billion. Split downstream on
    ``corrupt_col IS NULL`` into clean / quarantine streams.

    Note Spark's documented restriction: a query may not filter ONLY
    on the corrupt column straight off the scan — materialize (cache)
    or project other columns alongside it first (the returned frame
    is left raw so callers choose; tests/test_sources.py shows the
    cache form)."""
    if isinstance(schema, str):
        base = StructType.fromDDL(schema)
    else:
        base = schema
    full = StructType(base.fields[:]).add(corrupt_col, "string")
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path, header=header)
    )
