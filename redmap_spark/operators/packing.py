"""Sequence packing (SURVEY §2.E): fill fixed-token-budget training
rows from variable-length chunks with zero token loss.

Packing is inherently sequential-greedy (a chunk's bin depends on
every earlier placement), so it cannot be a window/groupBy expression;
this is the documented Pandas-UDF seam (`applyInPandas`) for logic the
built-in operators genuinely can't express. The distribution story
keeps it scale-safe anyway:

- chunks are hashed into ``n_buckets`` deterministic buckets
  (xxhash64 of the doc id — NOT the ambient partitioning, so results
  are bit-identical under any input repartitioning);
- each bucket is packed independently in one task: first-fit over the
  bucket's chunks in (doc_id, chunk_idx) order. Bucket state is the
  open-bin remainder list — O(bins) memory, single pass;
- pack ids are ``bucket * 2^32 + local_bin`` — globally unique with
  no cross-bucket coordination, stable across runs.

At 100 TB, ``n_buckets`` scales with the corpus (buckets ≈ cores ×
small constant; each task streams its bucket's Arrow batches), and
first-fit within a bucket wastes <¼ of the budget in practice for
chunk ≪ budget workloads. Packing quality is a constant-factor knob;
the invariants (no token loss, every pack ≤ budget) hold at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "doc_id long, chunk_idx long, n_chunk_tokens long, pack_id long, pack_slot long"
)


def pack_sequences(
    chunks: DataFrame,
    budget: int = 512,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    seq_col: str = "chunk_idx",
    token_col: str = "n_chunk_tokens",
    max_open: int = 256,
) -> DataFrame:
    """Assign every chunk to a pack (training row) of at most
    ``budget`` tokens. Returns one row per input chunk with its
    (pack_id, pack_slot); aggregating by pack_id rebuilds the packed
    rows. Chunks larger than ``budget`` get a singleton pack (never
    dropped — no token loss, the caller decides how to truncate).

    ``max_open`` bounds the first-fit candidate scan: only the
    ``max_open`` open bins are considered and the fullest bin is
    retired when the list overflows, making per-chunk cost O(max_open)
    instead of O(total bins) — the difference between linear and
    quadratic bucket packing at scale. Retired bins stay valid packs;
    they just stop receiving chunks."""

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values([id_col, seq_col], kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["_bucket"].iloc[0])
        remaining: dict[int, int] = {}  # open bin id -> remaining tokens
        n_bins = 0
        slots: list[int] = []
        bins: list[int] = []
        fill: dict[int, int] = {}
        for t in pdf[token_col].astype(int):
            for b, rem in remaining.items():  # insertion order = bin id order
                if t <= rem:
                    remaining[b] = rem - t
                    fill[b] += 1
                    bins.append(b)
                    slots.append(fill[b] - 1)
                    break
            else:
                b = n_bins
                n_bins += 1
                remaining[b] = max(budget - t, 0)
                fill[b] = 1
                bins.append(b)
                slots.append(0)
                if len(remaining) > max_open:  # retire the fullest bin
                    del remaining[min(remaining, key=lambda k: (remaining[k], k))]
        return pd.DataFrame(
            {
                "doc_id": pdf[id_col],
                "chunk_idx": pdf[seq_col],
                "n_chunk_tokens": pdf[token_col],
                "pack_id": [bucket * (1 << 32) + b for b in bins],
                "pack_slot": slots,
            }
        )

    keyed = chunks.select(
        F.col(id_col), F.col(seq_col), F.col(token_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("_bucket"),
    )
    return keyed.groupBy("_bucket").applyInPandas(pack, schema=PACK_SCHEMA)


def pack_rows(packed: DataFrame, chunks: DataFrame) -> DataFrame:
    """Materialize packed training rows: join assignments back to the
    chunk text and concatenate per pack in slot order (equi-join on
    the chunk key + one groupBy pack_id — both hash-partitioned)."""
    joined = packed.join(
        chunks.select("doc_id", "chunk_idx", "chunk_text"),
        ["doc_id", "chunk_idx"],
        "inner",
    )
    return (
        joined.groupBy("pack_id")
        .agg(
            F.sum("n_chunk_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_seqs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pack_slot", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("packed_text"),
        )
    )
