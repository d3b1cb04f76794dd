"""General asof_join operator vs the oracle-verified inline query."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory import QUERIES
from redmap_spark.operators.asof import asof_join
from tests.conftest import SF_DIR


def test_asof_join_matches_inline_query(spark):
    e = Catalog(spark, SF_DIR).events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        payload=("click_id",),
    ).select(
        "purchase_id",
        "user_id",
        F.coalesce("click_id", F.lit(-1)).alias("last_click_id"),
    )
    want = QUERIES["q_asof_join"](spark, SF_DIR)
    g = {(r.purchase_id, r.user_id, r.last_click_id) for r in got.collect()}
    w = {(r.purchase_id, r.user_id, r.last_click_id) for r in want.collect()}
    assert g == w


def test_asof_join_strict_excludes_simultaneous(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame([Row(k=1, t=10, lid=100)])
    right = spark.createDataFrame(
        [Row(k=1, t=10, price=5.0), Row(k=1, t=9, price=4.0)]
    )
    loose = asof_join(left, right, on="k", left_ts="t", right_ts="t", payload=("price",))
    strict = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", payload=("price",), strict=True
    )
    assert loose.collect()[0].price == 5.0   # t=10 row visible at <=
    assert strict.collect()[0].price == 4.0  # t=10 row excluded at <


def test_asof_join_single_shuffle(spark):
    from redmap_spark.plans.explain import plan_string

    e = Catalog(spark, SF_DIR).events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    plan = plan_string(
        asof_join(purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", payload=("click_id",)),
        "simple",  # formatted mode repeats nodes in detail sections
    )
    assert "Join" not in plan          # union + window, no join node
    assert plan.count("Exchange") == 1  # exactly one shuffle, on the key


def test_asof_join_rejects_reserved_and_colliding_columns(spark):
    import pytest

    from redmap_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, _tb string")
    right = spark.createDataFrame([(1, 5, 9.0)], "k long, rt long, price double")
    with pytest.raises(ValueError, match="reserves"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt", payload=("price",))
    left2 = spark.createDataFrame([(1, 10, 3.0)], "k long, t long, price double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, on="k", left_ts="t", right_ts="rt", payload=("price",))


def test_asof_join_equal_ts_ties_are_run_stable(spark):
    """Two right rows at the same timestamp: the carried payload must be
    identical across repeated runs (stable content-hash tiebreak)."""
    from redmap_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 5, 200.0), (1, 5, 300.0)], "k long, rt long, price double"
    ).repartition(4)
    vals = {
        asof_join(left, right, on="k", left_ts="t", right_ts="rt", payload=("price",))
        .collect()[0]
        .price
        for _ in range(5)
    }
    assert len(vals) == 1, vals
