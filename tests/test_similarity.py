"""Recall tests for approximate similarity search (SURVEY §5.2)."""

from __future__ import annotations

from redmap_spark.catalog import Catalog
from redmap_spark.operators import similarity as S
from tests.conftest import SF_DIR


def _ids(df):
    return [r.vec_id for r in df.collect()]


def test_lsh_topk_recall(spark):
    emb = Catalog(spark, SF_DIR).embeddings
    exact = set(_ids(S.brute_force_topk(emb, 0, k=10)))
    approx = set(_ids(S.lsh_topk(emb, 0, k=10)))
    assert len(approx) <= 10
    # deterministic (hash-seeded planes): measured 5/10 at planes=4,
    # multiprobe=1 on this near-orthogonal synthetic data
    assert len(approx & exact) >= 3, f"lsh recall too low: {approx & exact}"


def test_ivf_topk_recall(spark):
    emb = Catalog(spark, SF_DIR).embeddings
    exact = set(_ids(S.brute_force_topk(emb, 0, k=10)))
    approx = set(_ids(S.ivf_topk(emb, 0, k=10)))
    assert len(approx) == 10
    # deterministic: measured 4/10 at nprobe=3 (labels are weak
    # cosine clusters in this synthetic data)
    assert len(approx & exact) >= 3, f"ivf recall too low: {approx & exact}"


def test_quantized_topk_recall(spark):
    """SQ8 + exact rescore: int8 quantization error is tiny relative
    to neighbor score gaps, and the 4k-candidate exact rescore fixes
    rank inversions, so recall should be near-perfect."""
    emb = Catalog(spark, SF_DIR).embeddings
    exact = set(_ids(S.brute_force_topk(emb, 0, k=10)))
    approx = set(_ids(S.quantized_topk(emb, 0, k=10)))
    assert len(approx) == 10
    assert len(approx & exact) >= 9, f"sq8 recall too low: {approx & exact}"


def test_bruteforce_is_sorted_and_excludes_query(spark):
    emb = Catalog(spark, SF_DIR).embeddings
    rows = S.brute_force_topk(emb, 0, k=10).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert 0 not in {r.vec_id for r in rows}
    assert len(rows) == 10


def test_knn_join_ivf_score_ratio(spark):
    """IVF kNN-join quality vs the exact brute-force join. This
    dataset's embedding space is near-uniform (top-5 neighbors at
    cos≈0.32 against a ≈0.0 background), so set-overlap recall is
    fundamentally bounded for ANY partition-based ANN; the standard
    metric in that regime is the score ratio — sum of approx top-k
    scores over sum of exact top-k scores (≈0.94 measured at
    nprobe=3 of 10 clusters, i.e. scanning ~30%% of the corpus)."""
    from pyspark.sql import functions as F

    from redmap_spark.operators import similarity as S

    e = Catalog(spark, SF_DIR).embeddings
    qs = e.filter(F.col("vec_id") < 20)
    exact = S.knn_join_bruteforce(qs, e, k=5).collect()
    approx = S.knn_join_ivf_trained(qs, e, k=5, nprobe=3).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.q_id, []).append(r.score)
    for r in approx:
        ap.setdefault(r.q_id, []).append(r.score)
    ratios = [sum(ap.get(q, [0.0])) / sum(ex[q]) for q in ex if sum(ex[q]) > 0]
    assert sum(ratios) / len(ratios) >= 0.85, ratios


def test_persisted_ivf_index_quality_and_pruning(spark, tmp_path):
    """Build-once / query-many: the persisted index answers kNN joins
    at the same quality as the train-per-call path, and the candidate
    scan is partition-pruned to the probed clusters."""
    from pyspark.sql import functions as F

    emb = Catalog(spark, SF_DIR).embeddings
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, n_clusters=10)

    qs = emb.filter(F.col("vec_id") < 20)
    exact = S.knn_join_bruteforce(qs, emb, k=5).collect()
    approx = S.knn_join_ivf_index(spark, idx, qs, k=5, nprobe=3)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    rows = approx.collect()

    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.q_id, []).append(r.score)
    for r in rows:
        ap.setdefault(r.q_id, []).append(r.score)
    ratios = [sum(ap.get(q, [0.0])) / sum(ex[q]) for q in ex if sum(ex[q]) > 0]
    assert sum(ratios) / len(ratios) >= 0.85, ratios

    # the corpus scan must carry a cl partition filter (pruned probe)
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cl" in pf.group(1), pf.group(1) if pf else plan[:500]


def test_pq_topk_recall(spark):
    """PQ ADC with 16×4-bit codes + 8k exact rescore: coarse codes,
    but the rescore phase fixes ordering — require most of the true
    top-10 to survive."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    approx = set(_ids(S.pq_topk(emb, 0, k=10)))
    exact = set(_ids(S.brute_force_topk(emb, 0, k=10)))
    assert len(approx & exact) >= 7, f"pq recall too low: {approx & exact}"


def test_pq_encode_matches_reference(spark):
    """The codegen argmax encode must equal the numpy argmin-d2
    reference on every vector (same codebooks)."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = S.train_pq_codebooks(emb)
    got = {r.vec_id: list(r.codes) for r in S.pq_encode(emb, books).collect()}
    m, dsub = len(books), len(books[0][0])
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        v = np.array(r.embedding, dtype=np.float64)
        nv = v / max(np.linalg.norm(v), 1e-12)
        want = [
            int(np.argmin([((nv[j * dsub:(j + 1) * dsub] - np.array(books[j][c])) ** 2).sum()
                           for c in range(len(books[j]))]))
            for j in range(m)
        ]
        assert want == got[r.vec_id], r.vec_id


def test_diversity_sample_properties(spark):
    """k-center greedy: deterministic, exact size, and the selected
    set is more spread (higher min pairwise cosine distance) than a
    same-size deterministic hash sample."""
    import math

    from pyspark.sql import functions as F

    from redmap_spark.operators.similarity import diversity_sample

    emb = Catalog(spark, SF_DIR).embeddings
    k = 16
    sel = diversity_sample(emb, k=k, pool=256)
    rows = sel.collect()
    assert len(rows) == k
    assert sorted(r.picked_order for r in rows) == list(range(k))
    again = {(r.vec_id, r.picked_order) for r in diversity_sample(emb, k=k, pool=256).collect()}
    assert again == {(r.vec_id, r.picked_order) for r in rows}

    vecs = {
        r.vec_id: r.embedding
        for r in emb.select("vec_id", "embedding").collect()
    }

    def min_pairwise_dist(ids):
        def cos(a, b):
            na = math.sqrt(sum(x * x for x in a)) or 1.0
            nb = math.sqrt(sum(x * x for x in b)) or 1.0
            return sum(x * y for x, y in zip(a, b)) / (na * nb)
        ids = list(ids)
        return min(
            1.0 - cos(vecs[a], vecs[b])
            for i, a in enumerate(ids) for b in ids[i + 1:]
        )

    picked = [r.vec_id for r in rows]
    # deterministic baseline: first k by md5 (the pool's own prefix —
    # what you'd get with no diversity objective at all)
    baseline = [
        r.vec_id
        for r in emb.select("vec_id")
        .withColumn("hk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("hk", "vec_id")
        .limit(k)
        .collect()
    ]
    assert min_pairwise_dist(picked) >= min_pairwise_dist(baseline)

    # the inventory entry joins back to full rows in pick order
    from redmap_spark.inventory import QUERIES

    out = QUERIES["sim_diversity_sample"](spark, SF_DIR).collect()
    assert [r.picked_order for r in out] == list(range(k))


def test_ivf_tuning_sweep_monotone(spark):
    """The nprobe sweep must behave like a real recall/cost knob:
    scanned fraction grows ~linearly with nprobe (10 clusters) and
    recall@10 is non-decreasing, reaching its max at nprobe=8."""
    from redmap_spark.inventory.similarity import sim_ivf_tuning

    rows = {
        r.nprobe: r
        for r in sim_ivf_tuning(spark, "/root/testdata/sf0.001").collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    frac = [rows[n].mean_scanned_fraction for n in (1, 2, 4, 8)]
    rec = [rows[n].mean_recall_at_10 for n in (1, 2, 4, 8)]
    assert all(a < b for a, b in zip(frac, frac[1:]))
    # ~np/10 of the corpus scanned, within cluster-size skew
    assert 0.02 <= frac[0] <= 0.35 and 0.55 <= frac[3] <= 1.0
    assert all(a <= b + 1e-9 for a, b in zip(rec, rec[1:]))
    assert rec[3] == max(rec) and rec[3] > 0


def test_graph_expand_beats_seed_only(spark):
    """The one-hop graph expansion must never lose recall vs the
    seed-only (nprobe=1) scan — cross-cluster edges only ADD
    candidates — and its extra scan cost must stay bounded by
    seeds x graph degree."""
    from redmap_spark.inventory.similarity import (
        GRAPH_G,
        GRAPH_SEEDS,
        sim_graph_expand,
    )

    rows = {
        r.method: r
        for r in sim_graph_expand(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"ivf1", "graph"}
    assert rows["graph"].mean_recall_at_10 >= rows["ivf1"].mean_recall_at_10
    extra = rows["graph"].mean_candidates - rows["ivf1"].mean_candidates
    assert 0 <= extra <= GRAPH_SEEDS * GRAPH_G
