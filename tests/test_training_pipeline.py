"""End-to-end training-corpus pipeline (redmap_spark/pipelines.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.pipelines import prepare_training_corpus
from redmap_spark.plans.explain import has_python_eval
from tests.conftest import SF_DIR


def test_training_pipeline_flow(spark):
    docs = Catalog(spark, SF_DIR).documents
    out = prepare_training_corpus(docs, mixture={"en": 1.0, "es": 0.2})
    rows = out.collect()
    assert rows
    # only the requested languages survive the mixture
    langs = {r.lang for r in rows}
    assert langs <= {"en", "es"}
    # chunk invariants
    assert all(1 <= r.n_chunk_tokens <= 50 for r in rows)
    assert all(len(r.chunk_text.split(" ")) == r.n_chunk_tokens for r in rows)
    # deterministic end to end
    again = prepare_training_corpus(docs, mixture={"en": 1.0, "es": 0.2}).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_training_pipeline_stays_jvm(spark):
    docs = Catalog(spark, SF_DIR).documents
    out = prepare_training_corpus(docs)
    assert not has_python_eval(out)


def test_training_pipeline_dedups_and_filters(spark):
    docs = Catalog(spark, SF_DIR).documents
    out = prepare_training_corpus(docs)
    n_docs_out = out.select("doc_id").distinct().count()
    n_docs_in = docs.count()
    assert n_docs_out < n_docs_in  # dedup + quality gates dropped some
    # no document below the Gopher word floor survives
    short = docs.filter(F.size(F.split("text", " ")) < 10).select("doc_id")
    assert out.join(short, "doc_id", "left_semi").count() == 0
