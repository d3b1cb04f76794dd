"""Property tests (SURVEY §5.2, hypothesis): dedup invariants hold
for arbitrary corpora, not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redmap_spark.operators import dedup as D

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


def _df(spark, texts):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_exact_dedup_partitions_corpus(spark, texts):
    """Every doc belongs to exactly one class; class sizes sum to the
    corpus; each representative is the min id of its class."""
    classes = D.exact_dedup_classes(_df(spark, texts)).collect()
    assert sum(r.n_copies for r in classes) == len(texts)
    import re

    def norm(t):
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    by_norm: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_norm.setdefault(norm(t), []).append(i)
    assert len(classes) == len(by_norm)
    reps = {r.rep_id for r in classes}
    assert reps == {min(ids) for ids in by_norm.values()}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_jaccard_pairs_symmetric_bounds(spark, texts):
    """Pair scores are in (0,1], id1 < id2 always, and identical
    texts (if any) score exactly 1.0."""
    rows = D.ngram_jaccard_pairs(_df(spark, texts), k=3, threshold=0.0).collect()
    for r in rows:
        assert r.id1 < r.id2
        assert 0.0 < r.jaccard <= 1.0
    dup_pairs = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if texts[i] == texts[j] and len(texts[i].split()) >= 3
    }
    scored = {(r.id1, r.id2): r.jaccard for r in rows}
    for p in dup_pairs:
        assert scored.get(p) == 1.0, (p, scored.get(p))
