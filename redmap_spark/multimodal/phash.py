"""Perceptual image hashing (pHash) — multimodal near-dup dedup.

The classic DCT pHash (as popularized by the open pHash project):
grayscale → 32×32 resample → 2-D DCT-II → keep the 8×8 lowest
frequencies → threshold each coefficient against the median → 64-bit
hash. Hamming distance between hashes tracks perceptual similarity
(crops/recompression/noise move few bits; different images ~32).

Everything runs on the repo's own clean-room codecs
(multimodal/png.py, jpeg.py, gif.py) — REAL pixels for real
payloads; non-media payloads (the synthetic corpus) fall back to a
deterministic byte-decimated 32×32 grid so the DCT path itself is
always exercised and reproducible.

Scale shape mirrors SimHash text dedup (operators/dedup.py): the
hash is computed per row in Arrow batches (mapInPandas — the
documented Python seam for binary decode), then pair finding is pure
JVM: block on any equal 16-bit hash chunk (hamming ≤ r ⇒ some chunk
equal for r < 4 by pigeonhole), candidate self-join on the chunk,
exact popcount filter. Never O(n²) over the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_CHUNKS = 4
CHUNK_BITS = 16

_DCT32 = None  # lazily-built 32x32 DCT-II basis (orthonormal)


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        basis[0] *= 1 / np.sqrt(2)
        _DCT32 = basis * np.sqrt(2 / n)
    return _DCT32


def payload_to_gray32(payload: bytes) -> np.ndarray:
    """32×32 float grayscale from any payload: real decode for
    PNG/JPEG/GIF via the repo codecs, deterministic byte decimation
    otherwise (so the synthetic corpus still exercises the DCT)."""
    from redmap_spark.multimodal.decode import decode_pixel_array

    # shared magic-byte dispatch (multimodal/decode.py); malformed/
    # unsupported media of ANY kind routes to the deterministic
    # fallback — a corrupt byte in one payload must never fail the
    # whole Arrow batch (unlike state reads, where swallowing errors
    # loses data; here the fallback IS the contract)
    a = decode_pixel_array(payload)
    if a is None:
        px = None
    elif a.ndim == 3:
        px = a.mean(axis=2) if a.shape[2] > 1 else a[:, :, 0]
    else:
        px = a
    if px is None:
        # byte decimation: sample 1024 evenly-spaced payload bytes
        data = payload if payload else b"\x00"
        pos = (np.arange(1024) * len(data)) // 1024
        px = np.frombuffer(data, dtype=np.uint8)[pos].reshape(32, 32).astype(np.float64)
        return px
    px = px.astype(np.float64)
    h, w = px.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    return px[np.ix_(ys, xs)]


def phash64(gray32: np.ndarray) -> int:
    """64-bit DCT pHash of a 32×32 grayscale block."""
    d = _dct_basis()
    coef = d @ gray32 @ d.T
    block = coef[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC from the threshold
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # two's-complement into int64 range for a Spark LongType column
    return out - (1 << 64) if out >= (1 << 63) else out


def perceptual_hashes(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, phash, c0..c3): 64-bit pHash per payload plus its 16-bit
    chunks (the blocking keys). mapInPandas: binary in, 6 small
    columns out, no shuffle."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [phash64(payload_to_gray32(bytes(p))) for p in pdf["payload"]]
            u = [h & 0xFFFFFFFFFFFFFFFF for h in hashes]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": pd.array(hashes, dtype="int64"),
                    **{
                        f"c{c}": pd.array(
                            [(x >> (c * CHUNK_BITS)) & 0xFFFF for x in u], dtype="int32"
                        )
                        for c in range(PHASH_CHUNKS)
                    },
                }
            )

    schema = f"{id_col} long, phash long, " + ", ".join(
        f"c{c} int" for c in range(PHASH_CHUNKS)
    )
    return df.select(id_col, "payload").mapInPandas(hash_batches, schema=schema)


def phash_pairs(
    hashes: DataFrame, max_hamming: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup image pairs with hamming(phash) ≤ max_hamming.

    Pure JVM from here: candidates are blocked on any equal 16-bit
    chunk (complete for max_hamming < 4·16/4... by pigeonhole:
    hamming ≤ 3 guarantees an equal chunk; beyond that it is the
    standard recall/cost trade, same as SimHash chunk blocking), each
    pair emitted from its FIRST matching chunk only (no distinct
    shuffle), exact popcount via bit_count on the XOR."""
    sh = hashes.cache()
    sh.count()  # eager: both self-join sides read it concurrently
    blocked = sh.select(
        id_col, "phash", *[f"c{c}" for c in range(PHASH_CHUNKS)],
        F.posexplode(F.array(*[F.col(f"c{c}") for c in range(PHASH_CHUNKS)])).alias(
            "chunk", "cv"
        ),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    first_match = F.lit(True)
    for j in range(PHASH_CHUNKS):
        first_match = first_match & (
            (F.col("a.chunk") <= j) | (F.col(f"a.c{j}") != F.col(f"b.c{j}"))
        )
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & first_match,
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            ham.cast("int").alias("hamming"),
        )
    )
