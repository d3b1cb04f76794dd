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


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    must sort-merge join with zero Exchange nodes — the at-rest
    co-location contract that makes repeated fact-fact joins viable
    at 100 TB."""
    from pyspark.sql import functions as F

    from redmap_spark.catalog import Catalog
    from redmap_spark.plans.explain import executed_plan
    from redmap_spark.sources.io import write_bucketed

    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    c = Catalog(spark, SF_SMALL)
    write_bucketed(
        c.orders, "orders_b", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        c.lineitem.select("l_orderkey", "l_quantity"),
        "lineitem_b",
        ["l_orderkey"],
        n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    joined = (
        spark.table("lineitem_b")
        .join(
            spark.table("orders_b").hint("merge"),  # force SMJ: at real
            # scale neither fact side is broadcastable anyway
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = executed_plan(joined)
    # the join itself must not shuffle either side (the only allowed
    # exchange is the single-partition gather for the final tiny agg)
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    n = joined.count()
    assert n >= 1
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Rewriting one partition must not clobber its siblings."""
    from pyspark.sql import functions as F

    from redmap_spark.catalog import Catalog
    from redmap_spark.sources.io import overwrite_partitions, write_parquet

    c = Catalog(spark, SF_SMALL)
    ev = c.events.withColumn("etype", F.col("event_type"))
    path = str(tmp_path / "events_by_type")
    write_parquet(ev, path, partition_by=["etype"])
    before = spark.read.parquet(path)
    n_before = before.count()
    n_click = before.filter(F.col("etype") == "click").count()

    # backfill ONLY the click partition with doubled values
    fixed = ev.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    overwrite_partitions(fixed, path, partition_by=["etype"])
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.filter(F.col("etype") == "click").count() == n_click
    # non-click partitions untouched
    assert (
        after.filter(F.col("etype") == "signup").count()
        == before.filter(F.col("etype") == "signup").count()
    )


def test_writer_file_sizing(spark, tmp_path):
    from redmap_spark.catalog import Catalog
    from redmap_spark.sources.io import write_parquet

    c = Catalog(spark, SF_SMALL)
    path = str(tmp_path / "sized")
    write_parquet(c.orders.coalesce(1), path, max_records_per_file=500)
    import glob

    files = glob.glob(f"{path}/*.parquet")
    n = c.orders.count()
    assert len(files) >= n // 500  # cap respected: many small files
    assert spark.read.parquet(path).count() == n


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from redmap_spark.catalog import Catalog
    from redmap_spark.plans.explain import plan_string
    from redmap_spark.sources.io import read_orc, write_orc

    c = Catalog(spark, SF_SMALL)
    path = str(tmp_path / "orders_orc")
    write_orc(c.orders, path)
    back = read_orc(spark, path)
    assert back.count() == c.orders.count()
    q = back.filter(F.col("o_orderstatus") == "P").select("o_orderkey")
    plan = plan_string(q, "formatted")
    assert "PushedFilters" in plan and "o_orderstatus" in plan


def test_schema_evolution_merge(spark, tmp_path):
    """A dataset whose later files gained a column must read as the
    union schema (old rows null-filled) with mergeSchema — the
    schema-evolution contract long-lived 100 TB datasets rely on."""
    from pyspark.sql import functions as F

    from redmap_spark.catalog import Catalog

    c = Catalog(spark, SF_SMALL)
    path = str(tmp_path / "evolving")
    v1 = c.orders.select("o_orderkey", "o_totalprice")
    v1.write.parquet(f"{path}/batch=1")
    v2 = c.orders.select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").alias("priority")
    )
    v2.write.parquet(f"{path}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "priority", "batch"}
    n = c.orders.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("priority").isNull()).count() == n


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingestion: PNG payloads written as loose files come
    back byte-identical with file metadata, a pushed length filter
    skips the oversized asset, and the decoded dimensions match the
    multimodal header parser."""
    import os

    from redmap_spark.multimodal.columns import parse_image_header
    from redmap_spark.multimodal.png import encode_png
    from redmap_spark.sources.io import read_binary_files

    assets = tmp_path / "assets"
    assets.mkdir()
    payloads = {}
    for i, (w, h) in enumerate([(3, 2), (5, 4), (2, 7)]):
        raw = encode_png(w, h, 3, bytes((x * 7 + y * 11 + i) % 256 for y in range(h) for x in range(w) for _ in (0, 1, 2)))
        payloads[f"img_{i}.png"] = raw
        (assets / f"img_{i}.png").write_bytes(raw)
    (assets / "huge.bin").write_bytes(b"\0" * 100_000)

    df = read_binary_files(spark, str(assets), glob="*")
    rows = {r.file_name: r for r in df.filter("length < 50000").collect()}
    assert set(rows) == set(payloads), rows.keys()
    for name, raw in payloads.items():
        assert bytes(rows[name].content) == raw
        assert rows[name].length == len(raw)
    w, h, _frames = parse_image_header(bytes(rows["img_1.png"].content))
    assert (w, h) == (5, 4)


def test_read_csv_permissive_quarantines_malformed(spark, tmp_path):
    """Malformed CSV rows must not fail the load: they land whole in
    the corrupt-record column with typed fields null, clean rows parse
    normally, and the clean/quarantine split partitions the file."""
    from redmap_spark.sources.io import read_csv_permissive

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,3,9.50\n"
        "2,notanumber,1.25\n"
        "3,7,2.00\n"
    )
    df = read_csv_permissive(spark, str(p), "id INT, qty INT, price DOUBLE").cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    dirty = df.filter(F.col("_corrupt_record").isNotNull())
    assert {(r.id, r.qty) for r in clean.collect()} == {(1, 3), (3, 7)}
    bad = dirty.collect()
    assert len(bad) == 1
    assert bad[0]._corrupt_record == "2,notanumber,1.25"
    assert bad[0].qty is None
    assert clean.count() + dirty.count() == df.count() == 3
    df.unpersist()
