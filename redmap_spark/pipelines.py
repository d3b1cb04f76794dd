"""End-to-end training-data pipeline (the engine's raison d'être).

Composes the operator library into the standard corpus-preparation
flow, all in ONE Catalyst plan until the sink:

    raw docs
      → exact dedup          (md5 fingerprint, keep first)
      → quality filter       (Gopher rules)
      → repetition filter    (top-bigram fraction cap)
      → PII redaction        (regex chain)
      → chunking             (overlapping token windows)
      → mixture rebalance    (per-language deterministic hash sample)

Every stage is a pure DataFrame transform: no Python per row, no
action until write. At 100 TB this runs as one job whose only
shuffles are the dedup groupBy and the repetition groupBy — filters,
redaction, chunking and sampling are map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redmap_spark.operators import textstats as T


def prepare_training_corpus(
    docs: DataFrame,
    mixture: dict[str, float] | None = None,
    chunk_tokens: int = 50,
    stride: int = 40,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Returns (doc_id, chunk_idx, lang, chunk_text, n_chunk_tokens)
    ready to tokenize. ``mixture`` maps lang → keep fraction
    (deterministic hash sample); None keeps everything."""
    # 1. exact dedup: keep the smallest doc_id per normalized text
    w_fp = docs.select("doc_id", "lang", "text", T.fingerprint("text").alias("fp"))
    reps = w_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = w_fp.join(reps, ["fp", "doc_id"], "inner").drop("fp")

    # 2. Gopher-rule quality gate (pure column predicate)
    quality = deduped.filter(T.gopher_passes("text"))

    # 3. repetition gate (one groupBy over hashed bigrams)
    rep = T.top_bigram_fraction(quality).filter(
        F.col("top_bigram_frac") <= max_top_bigram_frac
    ).select("doc_id")
    kept = quality.join(rep, "doc_id", "left_semi")

    # 4. PII redaction (map-side regex chain)
    redacted = kept.withColumn("text", T.redact_pii("text"))

    # 5. chunking (map-side 1→N; lang rides along — no join-back)
    chunks = T.chunk_documents(
        redacted, chunk_tokens=chunk_tokens, stride=stride, keep=("lang",)
    )

    # 6. mixture rebalance (deterministic per-stratum hash sample)
    if mixture is not None:
        frac_map = F.create_map(
            *[x for k, v in mixture.items() for x in (F.lit(k), F.lit(int(v * 10000)))]
        )
        cut = F.coalesce(F.element_at(frac_map, F.col("lang")), F.lit(0))
        chunks = chunks.filter(
            F.pmod(F.xxhash64("doc_id", "chunk_idx"), F.lit(10000)) < cut
        )
    return chunks.select("doc_id", "chunk_idx", "lang", "chunk_text", "n_chunk_tokens")
