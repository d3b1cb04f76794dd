"""Byte-pair-encoding tokenizer pipeline: train merges on a bounded
deterministic sample, apply them corpus-wide.

The split mirrors how production tokenizers are built: the merge
table is LEARNED on a sample (driver-side, bounded — the same
sanctioned pattern as the PQ codebook sample collect), then APPLIED
distributed via Arrow-batched mapInPandas with the merge table
broadcast and a size-capped per-task word memo (Zipf vocabularies
make the memo hit rate ≈ 1, so the greedy merge loop runs once per
DISTINCT word per task, not once per token).

Word-level BPE (Sennrich et al. 2016 style): each word is split to
characters plus an end-of-word marker; merges are learned greedily by
weighted pair frequency with a deterministic tie-break (higher count
first, then lexicographic pair), so training is reproducible across
runs, partitionings, and engines.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split(" "))
    wf.pop("", None)
    return wf


def train_merges(texts: list[str], num_merges: int = 64) -> list[tuple]:
    """Greedy BPE merge learning over a word-frequency table.
    Returns [(rank, left, right, merged, pair_count), ...]."""
    wf = _word_freqs(texts)
    words = {w: tuple(w) + (EOW,) for w in wf}
    merges: list[tuple] = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, sym in words.items():
            f = wf[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), count = best
        if count < 2:
            break
        merged = a + b
        merges.append((rank, a, b, merged, count))
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def sample_texts(df: DataFrame, text_col: str = "text",
                 sample_docs: int = 256) -> list[str]:
    """Deterministic md5-ordered doc sample (bounded driver collect;
    TakeOrdered, never a full sort materialization). NULL texts are
    excluded — md5(NULL) would otherwise sort them to the front of
    the sample and crash training."""
    rows = (
        df.select(F.col(text_col).alias("t"))
        .filter(F.col("t").isNotNull())
        .withColumn(
            "_r",
            F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast(
                "bigint"
            ),
        )
        .orderBy("_r", "t")
        .limit(sample_docs)
        .collect()
    )
    return [r.t for r in rows]


def apply_word(word: str, merge_ranks: dict) -> tuple:
    """Greedy lowest-rank-first merge application to one word."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = merge_ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def bpe_apply(df: DataFrame, merges: list[tuple], id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a learned merge table: Arrow-batched
    mapInPandas, merge table shipped in the closure (small: the
    num_merges rows), size-capped per-task word memo. The text column
    passes through unchanged (so Pipeline.chunk()/pack() can follow)
    annotated with word/subword counts and the fertility ratio
    (subwords per word) — the budget numbers a training pipeline
    needs per document. NULL texts tokenize to zero counts."""
    merge_ranks = {(a, b): rank for rank, a, b, _m, _c in merges}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            n_words, n_sub = [], []
            for text in pdf[text_col]:
                words = [w for w in text.split(" ") if w] if text else []
                total = 0
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        if len(memo) > 1_000_000:
                            # bound worker memory on open-vocabulary
                            # corpora; Zipf reuse keeps hits high
                            memo.clear()
                        got = apply_word(w, merge_ranks)
                        memo[w] = got
                    total += len(got)
                n_words.append(len(words))
                n_sub.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: pdf[text_col],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_subwords": pd.Series(n_sub, dtype="int64"),
                }
            )

    types = dict(df.dtypes)
    out = df.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            f"{id_col} {types[id_col]}, {text_col} {types[text_col]}, "
            "n_words long, n_subwords long"
        ),
    )
    return out.select(
        id_col,
        text_col,
        "n_words",
        "n_subwords",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_subwords") / F.col("n_words").cast("double"), 6),
        ).alias("fertility"),
    )
