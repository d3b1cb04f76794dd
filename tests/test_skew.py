"""Salted-join skew mitigation (SURVEY §6): correctness parity with
the plain join, even salt distribution, and salted shuffle keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.operators.skew import salted_join, with_salt
from redmap_spark.plans.explain import executed_plan
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    c = Catalog(spark, SF_DIR)
    # events.event_type is a 5-value key: the canonical low-cardinality
    # hot-key join a plain shuffle would squeeze into 5 partitions
    dim = c.events.select("event_type").distinct().withColumn(
        "type_tag", F.upper("event_type")
    )
    plain = c.events.join(dim, "event_type").groupBy("type_tag").count()
    salted = (
        salted_join(c.events, dim, "event_type", n_salts=8, big_stable_col="event_id")
        .groupBy("type_tag")
        .count()
    )
    assert {(r.type_tag, r["count"]) for r in plain.collect()} == {
        (r.type_tag, r["count"]) for r in salted.collect()
    }


def test_salt_is_deterministic_and_even(spark):
    c = Catalog(spark, SF_DIR)
    salted = with_salt(c.events, "event_id", 8)
    dist = {r._salt: r["count"] for r in salted.groupBy("_salt").count().collect()}
    assert set(dist) == set(range(8))
    n = sum(dist.values())
    # hash-even: every salt bucket within ±20% of fair share
    for v in dist.values():
        assert abs(v - n / 8) < 0.2 * n / 8, dist
    again = {r._salt: r["count"] for r in with_salt(c.events, "event_id", 8).groupBy("_salt").count().collect()}
    assert dist == again


def test_salted_join_shuffles_on_salted_key(spark):
    c = Catalog(spark, SF_DIR)
    dim = c.events.select("event_type").distinct().withColumn(
        "type_tag", F.upper("event_type")
    )
    j = salted_join(
        c.events, dim.hint("merge"), "event_type", n_salts=8, big_stable_col="event_id"
    )
    plan = executed_plan(j)
    assert "_salt" in plan  # the exchange key includes the salt


def test_salted_join_rejects_outer(spark):
    """right/full outer would emit each unmatched small row once per
    replica — the operator must refuse instead of silently duplicating."""
    import pytest

    from redmap_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(big, small, on="k", how=how)
