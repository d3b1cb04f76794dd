"""Table catalog over a testdata directory.

Registers each parquet table as a temp view so the full inventory is
reachable from both the DataFrame API and ``spark.sql``. At cluster
scale this is where partitioned/bucketed table metadata would live; in
this repo the tables are single parquet files per TESTDATA.md.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _as_timestamp(df: DataFrame, col: str) -> F.Column:
    """Normalize a parquet time column to session-TZ TIMESTAMP.

    Testdata generations have stored ``events.ts`` either as
    TIMESTAMP(NANOS) (read as BIGINT nanos via nanosAsLong) or as
    TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ). Both
    normalize to the same UTC instant under the session's UTC TZ.
    """
    dtype = dict(df.dtypes)[col]
    if dtype in ("bigint", "long"):
        # Integer DIV: nano values exceed double's 2^53 exact range.
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    return F.col(col).cast("timestamp")


class Catalog:
    # DataFrames are immutable logical plans, so the relation for a
    # given (session, sf_dir, table) can be built once and reused by
    # every query in that session — bench/sweep runs construct a
    # Catalog per entry, and without this memo each construction
    # re-reads parquet footers for every table it touches (563
    # entries x 1-3 tables of schema I/O per driver bench).
    # WeakKeyDictionary: entries die with their session.
    _relation_cache: "WeakKeyDictionary[SparkSession, dict]" = (
        WeakKeyDictionary()
    )

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        # Self-defensive session settings: the driver may hand us a
        # vanilla SparkSession. Some testdata generations store
        # events.ts as TIMESTAMP(NANOS), which Spark only reads via the
        # nanosAsLong legacy conf, and all date formatting must be
        # TZ-independent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def path(self, table: str) -> str:
        return f"{self.sf_dir}/{table}.parquet"

    def table(self, table: str) -> DataFrame:
        if table not in TABLES:
            raise KeyError(f"unknown table {table!r}")
        per_session = self._relation_cache.setdefault(self.spark, {})
        key = (self.sf_dir, table)
        df = per_session.get(key)
        if df is None:
            df = self.spark.read.parquet(self.path(table))
            if table == "events":
                df = df.withColumn("ts", _as_timestamp(df, "ts"))
            per_session[key] = df
        return df

    def register_all(self) -> None:
        """Expose every table as a temp view for spark.sql queries."""
        for t in TABLES:
            self.table(t).createOrReplaceTempView(t)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
