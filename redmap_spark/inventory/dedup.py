"""SURVEY §2.C — dedup inventory entries.

dedup_exact / dedup_ngram_jaccard / dedup_embedding are
oracle-verified; dedup_minhash_lsh and dedup_simhash are
approximate-by-construction (hash-dependent candidates) and are
verified by recall tests in tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.operators import dedup as D

NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

DEDUP_EXACT_SQL = f"""
SELECT md5({NORM}) AS fp, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


@query("dedup_exact", oracle=DEDUP_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_classes(Catalog(spark, sf_dir).documents)


DEDUP_JACCARD_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT id1, id2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jaccard
FROM p JOIN n n1 ON n1.doc_id = id1 JOIN n n2 ON n2.doc_id = id2
WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
"""


@query("dedup_ngram_jaccard", oracle=DEDUP_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(Catalog(spark, sf_dir).documents, k=3, threshold=0.5)


DEDUP_JACCARD_CAPPED_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 20),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT id1, id2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jaccard
FROM p JOIN n n1 ON n1.doc_id = id1 JOIN n n2 ON n2.doc_id = id2
WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
"""


@query("dedup_jaccard_capped", oracle=DEDUP_JACCARD_CAPPED_SQL)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production twin of dedup_ngram_jaccard: candidate
    generation drops shingles whose doc frequency exceeds
    max_shingle_df=20 (the 100 TB knob killing boilerplate hot
    buckets — candidate cost is Σ df² so capping df bounds the
    worst bucket at cap², while a ≥0.5-jaccard pair shares many
    shingles and still meets on a rare one). Set sizes n1/n2 stay
    uncapped, so scores only shift where common shingles were part
    of the intersection. Same split as the portable/production hash
    twins: the uncapped entry keeps exact oracle semantics, this one
    proves the capped path end-to-end with its own oracle."""
    return D.ngram_jaccard_pairs(
        Catalog(spark, sf_dir).documents, k=3, threshold=0.5, max_shingle_df=20
    )


DEDUP_CONTAIN_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
d AS (
  SELECT id1 AS contained_id, id2 AS container_id,
         round(CAST(c AS DOUBLE) / n1.n, 6) AS containment
  FROM p JOIN n n1 ON n1.doc_id = id1
  UNION ALL
  SELECT id2, id1, round(CAST(c AS DOUBLE) / n2.n, 6)
  FROM p JOIN n n2 ON n2.doc_id = id2
)
SELECT * FROM d WHERE containment >= 0.8
"""


@query("dedup_containment", oracle=DEDUP_CONTAIN_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment ≥ 0.8 — the asymmetric near-dup
    (short doc quoted inside a long one) that symmetric Jaccard
    dilutes away. See operators/dedup.py::ngram_containment_pairs."""
    return D.ngram_containment_pairs(Catalog(spark, sf_dir).documents, k=3, threshold=0.8)


@query("dedup_minhash_lsh")  # approximate: verified by recall pytest
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(Catalog(spark, sf_dir).documents, threshold=0.5)


@query("dedup_simhash")  # approximate: verified by pytest
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(Catalog(spark, sf_dir).documents, max_hamming=8)


DEDUP_EMB_SQL = """
WITH w AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
             / (a.nrm * b.nrm), 4) AS cosine
FROM w a JOIN w b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm), 4) >= 0.3
"""


@query("dedup_embedding", oracle=DEDUP_EMB_SQL)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_dup_pairs(Catalog(spark, sf_dir).embeddings, threshold=0.3)


@query("dedup_winnow")  # rows-only: fingerprint values are xxhash64-specific
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003): guaranteed
    blocking keys for matches ≥ window+k-1 chars; density ~2/(w+1).
    Verified by property tests in tests/test_dedup.py; the exact
    fingerprint VALUES are oracle-verified via dedup_winnow_portable
    (same algorithm, engine-portable md5-prefix hash)."""
    return D.winnow_fingerprints(Catalog(spark, sf_dir).documents)


# Same winnowing algorithm with an md5-prefix gram hash that DuckDB can
# reproduce bit-for-bit: every selected fingerprint value is checked,
# not just set-level properties. k=5, window=4, density ~2/(w+1).
DEDUP_WINNOW_SQL = f"""
WITH n AS (
  SELECT doc_id, {NORM} AS nt FROM documents
), f AS (
  SELECT doc_id, nt FROM n WHERE length(nt) >= 8
), g AS (
  SELECT doc_id,
         list_transform(range(1, length(nt) - 3),
                        i -> ('0x' || substr(md5(substr(nt, i, 5)), 1, 15))::BIGINT) AS gh
  FROM f
), w AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(gh) - 2),
                                      i -> list_min(gh[i:i+3]))) AS fps
  FROM g
)
SELECT doc_id, unnest(fps) AS fingerprint FROM w
"""


@query("dedup_winnow_portable", oracle=DEDUP_WINNOW_SQL)
def dedup_winnow_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.winnow_fingerprints(Catalog(spark, sf_dir).documents, portable_hash=True)


@query("dedup_keep_list")  # graph-iterative: verified by transitivity pytest
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level near-dedup: LSH pairs → transitive clusters
    (iterative min-label propagation, Kiveris-style MapReduce CC) →
    one representative per cluster. The step that turns pair lists
    into an actual deduplicated corpus."""
    return D.near_dedup_keep_list(Catalog(spark, sf_dir).documents, threshold=0.5)


# Exact duplicate-span (sub-document) dedup: aligned 20-token blocks
# hashed and rolled up; classes with >= 2 occurrences are emitted per
# occurrence with the (min doc_id, min span_start) representative.
# The rep is a single MIN over doc_id*1e9+span_start so both engines
# agree bit-for-bit (no argmin tie-break semantics to align).
DEDUP_SPANS_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sp AS (
  SELECT doc_id, CAST((i - 1) * 20 AS BIGINT) AS span_start,
         md5(array_to_string(t[(i-1)*20+1 : i*20], ' ')) AS fp
  FROM toks, UNNEST(range(1, CAST(len(t) // 20 AS BIGINT) + 1)) AS u(i)
  WHERE len(t) >= 20
),
cls AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         MIN(doc_id * 1000000000 + span_start) AS rep_key
  FROM sp GROUP BY fp HAVING COUNT(*) >= 2
)
SELECT sp.doc_id, sp.span_start, CAST(20 AS BIGINT) AS span_len, sp.fp,
       CAST(rep_key // 1000000000 AS BIGINT) AS rep_doc,
       CAST(rep_key % 1000000000 AS BIGINT) AS rep_start,
       n_copies, n_docs
FROM sp JOIN cls USING (fp)
"""


@query("dedup_spans", oracle=DEDUP_SPANS_SQL)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: verbatim 20-token blocks repeated
    anywhere in the corpus, each occurrence tagged with its class
    representative (keep the rep, cut the rest)."""
    return D.duplicate_spans(Catalog(spark, sf_dir).documents, width=20)


# Incremental (batch-vs-corpus) near-dedup: the odd-doc_id half plays
# the incoming batch, the even half the standing corpus — a
# deterministic split so the oracle replays it exactly. Matches are
# strictly cross-side: corpus×corpus pairs (full-dedup's cost) never
# appear.
DEDUP_INCR_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s
      WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      GROUP BY 1, 2)
SELECT new_id, corpus_id,
       round(CAST(c AS DOUBLE) / (n1.n + n2.n - c), 6) AS jaccard
FROM p JOIN n n1 ON n1.doc_id = new_id JOIN n n2 ON n2.doc_id = corpus_id
WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
"""


@query("dedup_incremental", oracle=DEDUP_INCR_SQL)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    from pyspark.sql import functions as F
    new_half = d.filter(F.col("doc_id") % 2 == 1)
    corpus_half = d.filter(F.col("doc_id") % 2 == 0)
    return D.incremental_jaccard_matches(new_half, corpus_half, threshold=0.5)


# Portable 32-bit SimHash signatures: the md5-hash twin of
# dedup_simhash, making the SimHash family hash-checkable in DuckDB
# bit for bit (dedup_simhash's xxhash64 signatures stay the
# production call; recall tests cover its pairing behavior). Scale
# shape identical: distinct-token explode, ONE groupBy with 32
# conditional bit-sums, assembly on the per-doc grid.
_SIMHASH_BITS = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(32)
)
_SIMHASH_ASM = "\n         + ".join(
    f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
)

DEDUP_SIMHASH_PORT_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
), h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok
), bits AS (
  SELECT doc_id, COUNT(*) AS n,
         {_SIMHASH_BITS}
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       CAST({_SIMHASH_ASM} AS BIGINT) AS simhash,
       CAST(n AS BIGINT) AS n_tokens
FROM bits
"""


@query("dedup_simhash_portable", oracle=DEDUP_SIMHASH_PORT_SQL)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash32_portable(Catalog(spark, sf_dir).documents)


# Portable k=8 MinHash signatures: md5-hash twin of the xxhash64 LSH
# signature build (dedup_minhash_lsh stays the production banding
# path; its recall is pytest-verified). One distinct-shingle explode,
# ONE groupBy with 8 min-aggregates — no per-hash row explosion.
DEDUP_MINHASH_PORT_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3)
SELECT doc_id,
       MIN(('0x' || substr(md5('0:' || s), 1, 15))::BIGINT) AS m0,
       MIN(('0x' || substr(md5('1:' || s), 1, 15))::BIGINT) AS m1,
       MIN(('0x' || substr(md5('2:' || s), 1, 15))::BIGINT) AS m2,
       MIN(('0x' || substr(md5('3:' || s), 1, 15))::BIGINT) AS m3,
       MIN(('0x' || substr(md5('4:' || s), 1, 15))::BIGINT) AS m4,
       MIN(('0x' || substr(md5('5:' || s), 1, 15))::BIGINT) AS m5,
       MIN(('0x' || substr(md5('6:' || s), 1, 15))::BIGINT) AS m6,
       MIN(('0x' || substr(md5('7:' || s), 1, 15))::BIGINT) AS m7
FROM sh GROUP BY doc_id
"""


@query("dedup_minhash_portable", oracle=DEDUP_MINHASH_PORT_SQL)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_portable(Catalog(spark, sf_dir).documents)


DEDUP_SAVINGS_SQL = f"""
WITH classes AS (
  SELECT md5({NORM}) AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(SUM(n_chars) AS BIGINT) AS class_chars,
         CAST(MIN(n_chars) AS BIGINT) AS kept_chars
  FROM documents GROUP BY 1
)
SELECT n_copies AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_copies) AS BIGINT) AS n_docs,
       CAST(SUM(class_chars - kept_chars) AS BIGINT) AS chars_saved,
       round(CAST(SUM(class_chars - kept_chars) AS DOUBLE)
             / (SELECT SUM(class_chars) FROM classes), 6)
         AS corpus_share_saved
FROM classes GROUP BY 1
"""


@query("dedup_savings", oracle=DEDUP_SAVINGS_SQL)
def dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report: cluster-size histogram of the exact-dedup
    classes plus the chars a keep-one-representative policy deletes —
    the capacity-planning number a 100 TB pipeline computes BEFORE
    committing to a dedup pass (storage saved vs dedup cost). One
    md5-groupBy (map-side partial) then |distinct cluster sizes|-sized
    work; the corpus total is a 1-row broadcast."""
    from pyspark.sql import functions as F

    d = Catalog(spark, sf_dir).documents
    classes = (
        d.select(D.fingerprint("text").alias("fp"), "n_chars")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.sum("n_chars").cast("bigint").alias("class_chars"),
            F.min("n_chars").cast("bigint").alias("kept_chars"),
        )
    )
    tot = classes.agg(F.sum("class_chars").cast("double").alias("tot"))
    return (
        classes.groupBy(F.col("n_copies").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
            F.sum(F.col("class_chars") - F.col("kept_chars"))
            .cast("bigint").alias("chars_saved"),
        )
        .join(F.broadcast(tot))
        .select(
            "cluster_size", "n_clusters", "n_docs", "chars_saved",
            F.round(F.col("chars_saved").cast("double") / F.col("tot"), 6)
            .alias("corpus_share_saved"),
        )
    )


DEDUP_CROSS_SRC_SQL = f"""
WITH fps AS (
  SELECT DISTINCT source, md5({NORM}) AS fp FROM documents
),
pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared_texts
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM fps GROUP BY 1)
SELECT source_a, source_b, shared_texts,
       sa.n AS n_a, sb.n AS n_b,
       round(shared_texts / CAST(least(sa.n, sb.n) AS DOUBLE), 6)
         AS overlap_coeff
FROM pair
JOIN sz sa ON sa.source = source_a
JOIN sz sb ON sb.source = source_b
"""


@query("dedup_cross_source", oracle=DEDUP_CROSS_SRC_SQL)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap: for every source pair, how many
    distinct normalized texts they share, plus the overlap
    coefficient |A∩B| / min(|A|,|B|) — the report that tells a
    mixture-weighting step which sources are re-crawls of each other
    (double-counting risk) before any per-doc dedup decision. Shape:
    one md5-groupBy to the distinct (source, fp) grid, a shared-fp
    equi-join (cost Σ df² over fps, df ≤ |sources|), broadcast size
    dims."""
    from pyspark.sql import functions as F

    d = Catalog(spark, sf_dir).documents
    # cached: three consumers (both self-join sides + the size dim)
    # would otherwise each rescan and re-hash the corpus; at 100 TB
    # this intermediate is a written (source, fp) table
    fps = d.select(
        "source", D.fingerprint("text").alias("fp")
    ).distinct().cache()
    a, b = fps.alias("a"), fps.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_texts"))
    )
    sz = fps.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "shared_texts", "n_a", "n_b",
            F.round(
                F.col("shared_texts")
                / F.least(F.col("n_a"), F.col("n_b")).cast("double"),
                6,
            ).alias("overlap_coeff"),
        )
    )


DEDUP_MINHASH_ERR_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
pairs AS (
  SELECT id1, id2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jaccard
  FROM p JOIN n n1 ON n1.doc_id = id1 JOIN n n2 ON n2.doc_id = id2
  WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
),
sig AS (
  SELECT doc_id,
         MIN(('0x' || substr(md5('0:' || s), 1, 15))::BIGINT) AS m0,
         MIN(('0x' || substr(md5('1:' || s), 1, 15))::BIGINT) AS m1,
         MIN(('0x' || substr(md5('2:' || s), 1, 15))::BIGINT) AS m2,
         MIN(('0x' || substr(md5('3:' || s), 1, 15))::BIGINT) AS m3,
         MIN(('0x' || substr(md5('4:' || s), 1, 15))::BIGINT) AS m4,
         MIN(('0x' || substr(md5('5:' || s), 1, 15))::BIGINT) AS m5,
         MIN(('0x' || substr(md5('6:' || s), 1, 15))::BIGINT) AS m6,
         MIN(('0x' || substr(md5('7:' || s), 1, 15))::BIGINT) AS m7
  FROM sh GROUP BY doc_id
)
SELECT id1, id2, round(jaccard, 6) AS jaccard,
       CAST((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END)
          + (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       round(((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END)) / 8.0, 6)
         AS minhash_est,
       round(abs(((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END)
            + (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END)) / 8.0
            - jaccard), 6) AS abs_err
FROM pairs JOIN sig a ON a.doc_id = id1 JOIN sig b ON b.doc_id = id2
ORDER BY id1, id2
"""


@query("dedup_minhash_error", oracle=DEDUP_MINHASH_ERR_SQL)
def dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality dashboard: for every exact-Jaccard
    candidate pair (≥ 0.5, the dedup_ngram_jaccard derivation), the
    8-hash portable-signature estimate (matching-slot fraction —
    E[est] = true Jaccard, the Broder 1997 identity) next to the
    exact value and |error| — the measured answer to "how many
    hashes does OUR corpus need", run before sizing the production
    LSH band structure. Scale shape: the pairs side is the
    shared-shingle equi-join (cost Σ df², never n²) and the
    signature side is the one-groupBy build; two doc-keyed joins
    stitch them — everything is pair/doc-grid sized."""
    d = Catalog(spark, sf_dir).documents
    pairs = D.ngram_jaccard_pairs(d, k=3, threshold=0.5)
    sig = D.minhash_portable(d)
    a = sig.select(
        F.col("doc_id").alias("id1"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(8)],
    )
    b = sig.select(
        F.col("doc_id").alias("id2"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(8)],
    )
    nm = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(8)
    )
    est = nm / F.lit(8.0)
    return (
        pairs.join(a, "id1")
        .join(b, "id2")
        .select(
            "id1", "id2",
            F.round("jaccard", 6).alias("jaccard"),
            nm.cast("bigint").alias("n_match"),
            F.round(est, 6).alias("minhash_est"),
            F.round(F.abs(est - F.col("jaccard")), 6).alias("abs_err"),
        )
        .orderBy("id1", "id2")
    )


# -- dedup_lsh_tuning --------------------------------------------------
#
# LSH band-structure tuning dashboard: for each candidate (bands b,
# rows r) configuration, the S-curve detection probability
# P(candidate | s) = 1 − (1 − s^r)^b evaluated against the CORPUS'S
# OWN observed near-dup pair similarities (the dedup_ngram_jaccard
# ≥ 0.5 pairs) — expected recall = mean over observed pairs, plus
# the signature cost b·r. This is the "which (b,r) do we ship"
# table: textbook S-curves assume a similarity distribution; this
# measures ours. All inputs are the exact-jaccard pairs rounded to
# 6; pow/mean are identical double shapes. Scale: the pairs grid is
# the Σ df² candidate join (computed once, 6 configs via one bounded
# 6× generate); everything after is |configs|-sized.

DEDUP_LSH_TUNING_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
pairs AS (
  SELECT round(CAST(c AS DOUBLE) / (n1.n + n2.n - c), 6) AS s
  FROM p JOIN n n1 ON n1.doc_id = id1 JOIN n n2 ON n2.doc_id = id2
  WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
), cfg AS (
  SELECT b, r FROM (VALUES (2, 2), (2, 4), (4, 2), (4, 4), (8, 2), (8, 4))
    AS v(b, r)
)
SELECT CAST(cfg.b AS BIGINT) AS bands, CAST(cfg.r AS BIGINT) AS rows_per_band,
       CAST(cfg.b * cfg.r AS BIGINT) AS n_hashes,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(AVG(1.0 - pow(1.0 - pow(s, cfg.r), cfg.b)), 6)
         AS expected_recall,
       round(1.0 - pow(1.0 - pow(0.5, cfg.r), cfg.b), 6) AS p_at_50,
       round(1.0 - pow(1.0 - pow(0.8, cfg.r), cfg.b), 6) AS p_at_80
FROM cfg CROSS JOIN pairs
GROUP BY cfg.b, cfg.r
ORDER BY bands, rows_per_band
"""


@query("dedup_lsh_tuning", oracle=DEDUP_LSH_TUNING_SQL)
def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    pairs = D.ngram_jaccard_pairs(d, k=3, threshold=0.5).select(
        F.round("jaccard", 6).alias("s")
    )
    cfgs = [(2, 2), (2, 4), (4, 2), (4, 4), (8, 2), (8, 4)]
    cfg = F.explode(
        F.array(*[F.struct(F.lit(b).alias("b"), F.lit(r).alias("r"))
                  for b, r in cfgs])
    ).alias("cfg")
    x = pairs.select("s", cfg).select("s", "cfg.b", "cfg.r")
    bd, rd = F.col("b").cast("double"), F.col("r").cast("double")
    detect = 1.0 - F.pow(1.0 - F.pow(F.col("s"), rd), bd)
    return (
        x.groupBy("b", "r")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg(detect), 6).alias("expected_recall"),
        )
        .select(
            F.col("b").cast("bigint").alias("bands"),
            F.col("r").cast("bigint").alias("rows_per_band"),
            (F.col("b") * F.col("r")).cast("bigint").alias("n_hashes"),
            "n_pairs",
            "expected_recall",
            F.round(1.0 - F.pow(1.0 - F.pow(F.lit(0.5), rd), bd), 6)
            .alias("p_at_50"),
            F.round(1.0 - F.pow(1.0 - F.pow(F.lit(0.8), rd), bd), 6)
            .alias("p_at_80"),
        )
        .orderBy("bands", "rows_per_band")
    )


# -- dedup_threshold_sweep ---------------------------------------------
#
# Near-dup threshold tuning curve: from ONE shared-shingle pairs pass
# (jaccard ≥ 0.5), how many candidate pairs and how many distinct
# documents would each production threshold 0.5/0.6/0.7/0.8/0.9
# actually touch — the curve a pipeline owner reads before picking
# the dedup cutoff (the threshold sibling of dedup_lsh_tuning's
# band-structure curve). Per-doc qualification is max pair jaccard
# (one bounded 2× corner generate of the pairs grid, the
# explode-array idiom); the five thresholds are a bounded 5×
# generate of tiny grids. Exact counts; jaccard rounds to 6 before
# comparison in both engines.

DEDUP_THRESH_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks WHERE len(t) >= 3),
n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
pairs AS (
  SELECT id1, id2,
         round(CAST(c AS DOUBLE) / (n1.n + n2.n - c), 6) AS j
  FROM p JOIN n n1 ON n1.doc_id = id1 JOIN n n2 ON n2.doc_id = id2
  WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5
),
docmax AS (
  SELECT doc_id, MAX(j) AS mj FROM (
    SELECT id1 AS doc_id, j FROM pairs
    UNION ALL SELECT id2, j FROM pairs
  ) GROUP BY 1
),
ths AS (SELECT UNNEST([0.5, 0.6, 0.7, 0.8, 0.9]) AS th),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT th AS threshold,
       CAST((SELECT COUNT(*) FROM pairs WHERE j >= th) AS BIGINT)
         AS n_pairs,
       CAST((SELECT COUNT(*) FROM docmax WHERE mj >= th) AS BIGINT)
         AS n_docs_affected,
       round((SELECT COUNT(*) FROM docmax WHERE mj >= th)
             / CAST(tot.n_docs AS DOUBLE), 6) AS corpus_share
FROM ths CROSS JOIN tot
ORDER BY threshold
"""


@query("dedup_threshold_sweep", oracle=DEDUP_THRESH_SQL)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    pairs = (
        D.ngram_jaccard_pairs(d, k=3, threshold=0.5)
        .select("id1", "id2", F.round("jaccard", 6).alias("j"))
        .localCheckpoint(eager=True)  # pair counts + doc maxima consume
    )
    docmax = (
        pairs.select(
            F.explode(F.array("id1", "id2")).alias("doc_id"), "j"
        )
        .groupBy("doc_id")
        .agg(F.max("j").alias("mj"))
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ths = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)]))
        .alias("th")
    )
    pc = (
        ths.join(pairs)
        .filter(F.col("j") >= F.col("th"))
        .groupBy("th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    dc = (
        ths.join(docmax)
        .filter(F.col("mj") >= F.col("th"))
        .groupBy("th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_affected"))
    )
    return (
        ths.join(pc, "th", "left")
        .join(dc, "th", "left")
        .join(F.broadcast(tot))
        .select(
            F.col("th").alias("threshold"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_affected", F.lit(0)).cast("bigint")
            .alias("n_docs_affected"),
            F.round(
                F.coalesce("n_docs_affected", F.lit(0))
                / F.col("n_docs").cast("double"),
                6,
            ).alias("corpus_share"),
        )
        .orderBy("threshold")
    )
