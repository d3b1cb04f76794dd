"""Dominant-color palette extraction over binary image payloads.

The thumbnail/card-color feature every media pipeline computes at
ingest: decode pixels (REAL decode for PNG/JPEG/GIF via the repo's
own clean-room codecs — png.py / jpeg.py / gif.py), quantize each
channel to 32-step buckets (a 512-cell RGB histogram), and keep the
top-k buckets by pixel share. Runs as Arrow-batched ``mapInPandas``
(binary in, k small rows out per asset) at scan parallelism: no
shuffle, no driver round-trip — the §2.F contract shared with
mm_features / mm_phash.

Determinism: integer bucket counts with (count desc, bucket asc)
tie-break; shares are single double divisions rounded to 6.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

QUANT_STEP = 32  # per-channel bucket width → 8³ = 512 palette cells


def payload_to_rgb(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from any payload: real decode for
    PNG/JPEG/GIF via the repo codecs; grayscale sources replicate to
    3 channels; anything else (the synthetic utf-8 corpus) routes to
    a deterministic byte-decimation fake so the plumbing stays
    testable — same fallback contract as phash.payload_to_gray32."""
    from redmap_spark.multimodal.decode import decode_pixel_array

    a = decode_pixel_array(payload)
    if a is None:
        px = None
    elif a.ndim == 2:
        px = np.repeat(a[:, :, None], 3, axis=2)
    elif a.shape[2] >= 3:
        px = a[:, :, :3]
    else:  # gray / gray+alpha
        px = np.repeat(a[:, :, :1], 3, axis=2)
    if px is None:
        data = payload if payload else b"\x00"
        pos = (np.arange(32 * 32 * 3) * len(data)) // (32 * 32 * 3)
        px = np.frombuffer(data, dtype=np.uint8)[pos].reshape(32, 32, 3)
    return np.ascontiguousarray(px[:, :, :3].astype(np.uint8))


def dominant_palette(payload: bytes, k: int = 4) -> list[tuple[str, float]]:
    """Top-k (hex_color, share) buckets of the 512-cell histogram;
    the hex color is the bucket's center so it round-trips to a
    displayable swatch."""
    rgb = payload_to_rgb(payload)
    q = rgb.reshape(-1, 3) // QUANT_STEP
    cells = (q[:, 0].astype(np.int32) * 64 + q[:, 1] * 8 + q[:, 2]).astype(
        np.int32
    )
    counts = np.bincount(cells, minlength=512)
    # (count desc, cell asc): argsort on (-count, cell) via lexsort
    order = np.lexsort((np.arange(512), -counts))[:k]
    n = cells.size
    out = []
    for cell in order:
        if counts[cell] == 0:
            break
        r, g, b = cell // 64, (cell // 8) % 8, cell % 8
        center = tuple(int(c) * QUANT_STEP + QUANT_STEP // 2 for c in (r, g, b))
        out.append(
            ("#%02x%02x%02x" % center, round(float(counts[cell]) / n, 6))
        )
    return out


def palette_features(
    df: DataFrame, k: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, rank, color_hex, share) — k rows per asset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for rank, (hex_color, share) in enumerate(
                    dominant_palette(bytes(payload), k=k), start=1
                ):
                    rows.append((int(doc_id), rank, hex_color, share))
            yield pd.DataFrame(
                rows, columns=[id_col, "rank", "color_hex", "share"]
            )

    schema = f"{id_col} long, rank int, color_hex string, share double"
    return df.select(id_col, "payload").mapInPandas(batches, schema=schema)
