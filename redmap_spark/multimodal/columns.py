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


RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, target_w int, target_h int"
)


def resize_images(df: DataFrame, target_w: int = 32, target_h: int = 32, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: payload in → (smaller) payload out, batch by
    Arrow batch. STUB transform: deterministic byte-decimation to
    (target_w*target_h) bytes standing in for a real thumbnail (PIL's
    Image.resize in deployment). The Spark contract — binary in/out,
    no shuffle, bounded executor memory — is the real part."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                w, h, _ = decode_image(raw)
                step = max(1, len(raw) // n_out)
                rows.append((int(doc_id), raw[::step][:n_out], w, h, target_w, target_h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "payload", "width", "height", "target_w", "target_h"],
            )

    return df.select(id_col, "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_payload binary, frame_md5 string"


def sample_frames(df: DataFrame, every_n: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling plumbing: 1 video row → N frame rows (the
    mapInPandas row-expansion pattern — output batches need not align
    with input rows). STUB extraction: the payload is cut into
    ``n_frames`` equal chunks (a real deployment uses ffmpeg keyframe
    extraction); every ``every_n``-th frame is emitted. Row expansion
    happens executor-side with no shuffle and no driver round-trip,
    so a 100 TB video corpus fans out to frames at scan parallelism."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                _, _, n_frames = decode_image(raw)
                chunk = max(1, len(raw) // n_frames)
                for i in range(0, n_frames, every_n):
                    fp = raw[i * chunk : (i + 1) * chunk]
                    rows.append(
                        (int(doc_id), i, fp, hashlib.md5(fp).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_payload", "frame_md5"]
            )

    return df.select(id_col, "payload").mapInPandas(frames, schema=FRAME_SCHEMA)
