"""Table catalog over a testdata directory.

Registers each parquet table as a temp view so the full inventory is
reachable from both the DataFrame API and ``spark.sql``. At cluster
scale this is where partitioned/bucketed table metadata would live; in
this repo the tables are single parquet files per TESTDATA.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast when joined against a fact
# table. lineitem/orders/events/documents/embeddings scale with SF and
# must never be broadcast.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


class Catalog:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def path(self, table: str) -> str:
        return f"{self.sf_dir}/{table}.parquet"

    def table(self, table: str) -> DataFrame:
        if table not in TABLES:
            raise KeyError(f"unknown table {table!r}")
        return self.spark.read.parquet(self.path(table))

    def register_all(self) -> None:
        """Expose every table as a temp view for spark.sql queries."""
        for t in TABLES:
            self.table(t).createOrReplaceTempView(t)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
