"""Multimodal column plumbing (SURVEY §2.F).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schema, Arrow batch shape,
partition-parallel decode via ``mapInPandas`` — is real and tested;
the actual media decode is stubbed (image/audio libraries are not in
this container) behind ``decode_image``, which either raises
``NotImplementedError`` or produces a deterministic fake, so swapping
in a real decoder (PIL/ffmpeg) changes one function, not the plan.

At 100 TB: payloads stay in executor memory one Arrow batch at a
time (``mapInPandas`` is a streaming iterator — no per-partition
materialization), and feature extraction parallelizes per input
split with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_md5 string, width int, height int, n_frames int"
)

REAL_DECODERS_AVAILABLE = False  # flip when PIL/ffmpeg exist


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB (SURVEY §2.F): deterministic fake (width, height, frames)
    derived from the payload bytes. A real deployment replaces this
    body with PIL/ffmpeg; everything around it stays unchanged."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real decoder here")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 4
    return width, height, n_frames


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column (the testdata
    has no real media; payload = utf-8 bytes of the text) plus the
    typed metadata struct every multimodal row carries."""
    with_payload = df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col("payload")).alias("n_bytes"),
    )
    return with_payload.withColumn("meta", meta)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    Arrow-batched ``mapInPandas``: each executor receives an iterator
    of pandas batches, decodes payloads batch-by-batch, emits a typed
    feature frame. No shuffle; no driver involvement."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                w, h, nf = decode_image(raw)
                feats.append(
                    (
                        int(doc_id),
                        len(raw),
                        hashlib.md5(raw[:16]).hexdigest(),
                        w,
                        h,
                        nf,
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=["doc_id", "n_bytes", "head_md5", "width", "height", "n_frames"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, schema=FEATURE_SCHEMA)
