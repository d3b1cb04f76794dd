"""SURVEY §2.F — multimodal inventory entry (rows-only check; the
decode is a deterministic stub, see redmap_spark.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.multimodal import columns as M
from redmap_spark.multimodal import attach_payload, extract_features


@query("mm_features")  # binary plumbing: verified by tests/test_multimodal.py
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return extract_features(attach_payload(docs))


@query("mm_resize")  # rows-only: binary transform, verified by pytest
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return M.resize_images(M.attach_payload(d), target_w=8, target_h=8)


@query("mm_frames")  # rows-only: 1→N expansion, verified by pytest
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return M.sample_frames(M.attach_payload(d), every_n=2)
