"""SURVEY §2.F — multimodal inventory entries.

mm_features is fully oracle-checked: the synthetic payload is the
utf-8 bytes of ASCII text, so every feature the mapInPandas pipeline
emits (md5 head fingerprint + the deterministic md5-derived fallback
dimensions for non-media payloads) is reproducible in DuckDB with
string md5 + hex arithmetic. Real-media decode (PNG/JPEG/GIF headers)
is verified by tests/test_multimodal.py with crafted image bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.multimodal import columns as M
from redmap_spark.multimodal import attach_payload, extract_features

# h[i] of the md5 digest == hex pair at substr(2*i+1, 2); the corpus is
# pure ASCII so byte-wise ops on the payload equal char-wise on text.
MM_FEATURES_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(substr(text, 1, 16)) AS head_md5,
       CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS INT) AS width,
       CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS INT) AS height,
       CAST(1 + ('0x' || substr(md5(text), 5, 2))::INT % 4 AS INT) AS n_frames
FROM documents
"""


@query("mm_features", oracle=MM_FEATURES_SQL)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return extract_features(attach_payload(docs))


# The fallback audio features are pure md5-hex arithmetic on the
# payload bytes (== text chars: corpus is ASCII), so the whole
# mapInPandas path is DuckDB-reproducible. Divisions are left
# unrounded: same IEEE doubles on both engines.
MM_AUDIO_SQL = """
SELECT doc_id,
       'synthetic' AS kind,
       CAST(1 + ('0x' || substr(md5(text), 1, 2))::INT % 2 AS INT) AS n_channels,
       CAST(8000 + 100 * (('0x' || substr(md5(text), 3, 2))::INT % 81) AS INT) AS sample_rate,
       CAST(4 * length(text) AS BIGINT) AS n_samples,
       CAST(4 * length(text) AS DOUBLE)
         / (8000 + 100 * (('0x' || substr(md5(text), 3, 2))::INT % 81)) AS duration_s,
       (('0x' || substr(md5(text), 5, 2))::INT * 256 + ('0x' || substr(md5(text), 7, 2))::INT) % 1000
         / 1000.0 AS rms,
       (('0x' || substr(md5(text), 7, 2))::INT * 256 + ('0x' || substr(md5(text), 9, 2))::INT) % 500
         / 1000.0 AS zcr,
       (('0x' || substr(md5(text), 9, 2))::INT * 256 + ('0x' || substr(md5(text), 11, 2))::INT) % 1000
         / 1000.0 AS peak
FROM documents
"""


@query("mm_audio_features", oracle=MM_AUDIO_SQL)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (REAL decoded-PCM RMS/ZCR/peak for WAV
    payloads — multimodal/audio.py; md5 fallback for the synthetic
    corpus, which is what the oracle replays)."""
    from redmap_spark.multimodal.audio import extract_audio_features

    d = Catalog(spark, sf_dir).documents
    return extract_audio_features(M.attach_payload(d))


@query("mm_resize")  # rows-only: binary transform, verified by pytest
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return M.resize_images(M.attach_payload(d), target_w=8, target_h=8)


@query("mm_frames")  # rows-only: 1→N expansion, verified by pytest
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return M.sample_frames(M.attach_payload(d), every_n=2)


@query("mm_phash")  # rows-only: hash values depend on the DCT float path
def mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual DCT pHash per payload + 16-bit blocking chunks —
    the image-side near-dup dedup signal (multimodal/phash.py).
    Real-pixel path verified with crafted PNG/JPEG bytes and the
    hamming-pairs blocking property in tests/test_multimodal.py."""
    from redmap_spark.multimodal.phash import perceptual_hashes

    d = Catalog(spark, sf_dir).documents
    return perceptual_hashes(M.attach_payload(d))


@query("mm_palette")  # rows-only: real pixel decode, verified by pytest
def mm_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-color palette per payload (top-4 of a 512-cell RGB
    histogram) — the thumbnail/card-color ingest feature
    (multimodal/palette.py). Real PNG/JPEG/GIF pixel decode via the
    repo codecs, verified with crafted solid-region images in
    tests/test_multimodal.py; Arrow-batched mapInPandas, no shuffle."""
    from redmap_spark.multimodal.palette import palette_features

    d = Catalog(spark, sf_dir).documents
    return palette_features(M.attach_payload(d))


@query("mm_audio_match")  # rows-only: STFT landmark matching, pytest-pinned
def mm_audio_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shazam-style audio matching (Wang 2003 constellation hashes):
    STFT magnitude-peak landmarks per asset, then a BUCKETED
    equi-join on the landmark hash finds assets sharing ≥4 landmarks
    — the audio-dedup/retrieval shape that never compares signal
    pairs directly (LSH discipline, stop-hash bucket cap). Real WAV
    payloads go through the true FFT path (pytest-pinned on crafted
    tones in tests/test_audio_fp.py); the synthetic corpus exercises
    the identical plumbing via content shingle hashes, so near-
    duplicate documents surface as matches here too. Scale: one
    Arrow decode pass → |asset × landmarks| rows → hash-bucket join."""
    from redmap_spark.multimodal.audio import (
        fingerprint_hashes,
        match_by_fingerprint,
    )

    d = Catalog(spark, sf_dir).documents
    hashes = fingerprint_hashes(M.attach_payload(d))
    return (
        match_by_fingerprint(hashes, min_shared=4)
        .orderBy("id_a", "id_b")
        .limit(50)
    )
