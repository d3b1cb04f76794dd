"""The fluent Pipeline API must produce the same results as the
directly-declared DataFrame plans (it IS the same plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.api import Pipeline
from redmap_spark.inventory.mapreduce import mr_chain, mr_reduce_by_key
from tests.conftest import SF_SMALL


def _sorted(rows):
    return sorted((tuple(r) for r in rows))


def test_pipeline_wordcount_matches_direct(spark):
    wc = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/documents.parquet")
        .flat_map(F.explode(F.split("text", " ")), alias="token")
        .reduce_by_key("token", n=F.count(F.lit(1)))
    )
    direct = mr_reduce_by_key(spark, SF_SMALL)
    assert _sorted(wc.collect()) == _sorted(direct.collect())


def test_pipeline_chain_matches_direct(spark):
    chain = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/documents.parquet")
        .filter(F.col("lang") == "en")
        .flat_map(F.explode(F.split(F.lower("text"), " ")), alias="token")
        .filter(F.length("token") > 4)
        .reduce_by_key("token", n=F.count(F.lit(1)))
        .top(20, F.desc("n"), F.asc("token"))
    )
    assert _sorted(chain.collect()) == _sorted(mr_chain(spark, SF_SMALL).collect())


def test_pipeline_reduce_scalar(spark):
    p = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/orders.parquet")
        .map(total=F.col("o_totalprice").cast("decimal(18,2)"))
        .reduce(grand_total=F.sum("total").cast("double"), n=F.count(F.lit(1)))
    )
    [row] = p.collect()
    assert row.n > 0 and row.grand_total > 0


def test_pipeline_is_lazy_and_fused(spark):
    """The whole chain must compile to ONE plan — a late filter is
    still visible to Catalyst (no materialization between steps)."""
    p = (
        Pipeline.read_parquet(spark, f"{SF_SMALL}/events.parquet")
        .map("event_type", "value")
        .filter(F.col("event_type") == "click")
    )
    plan = p.df._jdf.queryExecution().toString()
    assert "click" in plan  # filter reached the single compiled plan
