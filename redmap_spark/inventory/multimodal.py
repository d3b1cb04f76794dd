"""SURVEY §2.F — multimodal inventory entry (rows-only check; the
decode is a deterministic stub, see redmap_spark.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.multimodal import attach_payload, extract_features


@query("mm_features")  # binary plumbing: verified by tests/test_multimodal.py
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return extract_features(attach_payload(docs))
