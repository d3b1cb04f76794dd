"""Sources/sinks round-trips (SURVEY §2.H)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog, TABLES
from redmap_spark.sources import io
from tests.conftest import SF_SMALL


def test_catalog_registers_all_tables(spark):
    cat = Catalog(spark, SF_SMALL)
    cat.register_all()
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").collect()[0].n >= 0
    # SQL surface over the views works end-to-end
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ).collect()[0].n
    assert n > 0


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    orders = Catalog(spark, SF_SMALL).orders
    path = str(tmp_path / "orders_part")
    io.write_parquet(orders, path, partition_by=["o_orderpriority"])
    back = io.read_parquet(spark, path)
    assert back.count() == orders.count()
    # partition pruning: reading one partition scans only that dir
    one = back.where(F.col("o_orderpriority") == "1-URGENT")
    assert one.count() == orders.where("o_orderpriority = '1-URGENT'").count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "o_orderpriority" not in plan.split("ReadSchema")[-1][:200]


def test_csv_roundtrip_with_schema(spark, tmp_path):
    nation = Catalog(spark, SF_SMALL).nation
    path = str(tmp_path / "nation_csv")
    io.write_csv(nation, path)
    back = io.read_csv(spark, path, "n_nationkey int, n_name string, n_regionkey int")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    region = Catalog(spark, SF_SMALL).region
    path = str(tmp_path / "region_json")
    io.write_jsonl(region, path)
    back = io.read_jsonl(spark, path, "r_regionkey int, r_name string")
    assert sorted(map(tuple, back.select("r_regionkey", "r_name").collect())) == sorted(
        map(tuple, region.collect())
    )
