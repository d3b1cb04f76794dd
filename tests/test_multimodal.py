"""Multimodal binary-column plumbing (SURVEY §2.F): schema, Arrow
batch path, deterministic stubbed decode."""

from __future__ import annotations

import hashlib

from redmap_spark.catalog import Catalog
from redmap_spark.multimodal import attach_payload, extract_features
from redmap_spark.multimodal.columns import decode_image
from tests.conftest import SF_SMALL


def test_payload_and_meta_schema(spark):
    docs = Catalog(spark, SF_SMALL).documents
    with_p = attach_payload(docs)
    fields = dict(with_p.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,n_bytes:int")


def test_features_match_local_stub(spark):
    """mapInPandas output must equal a driver-side recomputation from
    the same bytes (the decode stub is deterministic)."""
    docs = Catalog(spark, SF_SMALL).documents
    feats = {r.doc_id: r for r in extract_features(attach_payload(docs)).collect()}
    local = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert set(feats) == set(local)
    for doc_id, raw in list(local.items())[:25]:
        w, h, nf = decode_image(raw)
        row = feats[doc_id]
        assert (row.n_bytes, row.width, row.height, row.n_frames) == (len(raw), w, h, nf)
        assert row.head_md5 == hashlib.md5(raw[:16]).hexdigest()


def test_features_is_distributed_no_shuffle(spark):
    docs = Catalog(spark, SF_SMALL).documents
    plan = extract_features(attach_payload(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-partition map, no shuffle
