"""SURVEY §2.E additions (round 5, later session) — lexical-diversity
scoring and text canonicalization (oracle-verified).

Follows text.py's cross-engine determinism conventions: per-term log
contributions are cast to DECIMAL(18,9) before the fold (exact,
partition-order independent), ratios are one double division rounded
to 6, and regexes use only char classes that mean the same thing to
Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- txt_word_entropy --------------------------------------------------
#
# Word-level Shannon entropy + type-token ratio per document: the
# cheap lexical-diversity gate (near-zero entropy ≈ repeated
# boilerplate, unusually high ≈ random noise) that complements the
# character-repetition filter (txt_repetition) at the vocabulary
# level. Scale shape: one token-stream groupBy to the |doc × distinct
# term| grid, a doc_id-partitioned window for the per-doc total (runs
# on the collapsed grid, far below the raw stream), one final per-doc
# fold. Entropy terms go through DECIMAL(18,9) so the sum is exact.

TXT_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2
), wtf AS (
  SELECT doc_id, term, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tf
)
SELECT doc_id, CAST(MIN(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       round(CAST(SUM(CAST(-(c / CAST(n AS DOUBLE)) *
                            ln(c / CAST(n AS DOUBLE)) AS DECIMAL(18,9)))
                  AS DOUBLE), 6) AS entropy,
       round(COUNT(*) / CAST(MIN(n) AS DOUBLE), 6) AS ttr
FROM wtf GROUP BY doc_id
"""


@query("txt_word_entropy", oracle=TXT_ENTROPY_SQL)
def txt_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    wtf = tf.withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    p = F.col("c") / F.col("n").cast("double")
    contrib = (-p * F.log(p)).cast("decimal(18,9)")
    return wtf.groupBy("doc_id").agg(
        F.min("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.sum(contrib).cast("double"), 6).alias("entropy"),
        F.round(F.count(F.lit(1)) / F.min("n").cast("double"), 6).alias("ttr"),
    )


# -- txt_normalize -----------------------------------------------------
#
# Deterministic text canonicalization — the prep step in front of
# exact/near dedup and tokenization: lowercase, fold every
# non-alphanumeric to space, squeeze runs, trim. Pure column
# expressions over one scan: zero shuffles, zero Python (asserted in
# test_plans.py). Emits the normalized text plus the shrinkage
# diagnostics a pipeline logs (chars kept ratio, whether anything
# changed).

TXT_NORM_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
       round(length(norm_text) / CAST(length(text) AS DOUBLE), 6) AS keep_ratio,
       CAST(CASE WHEN norm_text = text THEN 0 ELSE 1 END AS BIGINT) AS changed
FROM n
"""


@query("txt_normalize", oracle=TXT_NORM_SQL)
def txt_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators.textstats import normalized

    d = Catalog(spark, sf_dir).documents
    n = d.select("doc_id", "text", normalized("text").alias("norm_text"))
    return n.select(
        "doc_id",
        "norm_text",
        F.length("norm_text").cast("bigint").alias("n_chars_norm"),
        F.round(
            F.length("norm_text") / F.length("text").cast("double"), 6
        ).alias("keep_ratio"),
        F.when(F.col("norm_text") == F.col("text"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("changed"),
    )


# -- txt_zipf ----------------------------------------------------------
#
# Zipf's-law fit over the corpus vocabulary: log-log OLS of term
# frequency on rank (slope ≈ −1 for natural text; a strong deviation
# flags synthetic/boilerplate corpora — a corpus-level quality gate).
# Scale shape: the token stream partial-aggregates to the |vocab|
# grid; the rank window and the regression fold run over that grid
# only. Determinism: ln() of small exact inputs is correctly rounded
# in both engines (same convention txt_word_entropy relies on); each
# log point is cast to DECIMAL(18,9) so the moment sums are exact,
# and the slope/r² divisions are single double ops rounded to 6.

ZIPF_SQL = """
WITH tf AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
  GROUP BY 1
), ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term) AS BIGINT) AS r, c
  FROM tf
), pts AS (
  SELECT CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(18,9)) AS x,
         CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,9)) AS y
  FROM ranked
), m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DECIMAL(19,9)) AS sx,
         CAST(SUM(y) AS DECIMAL(19,9)) AS sy,
         CAST(SUM(x * y) AS DECIMAL(30,9)) AS sxy,
         CAST(SUM(x * x) AS DECIMAL(30,9)) AS sxx,
         CAST(SUM(y * y) AS DECIMAL(30,9)) AS syy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       round((CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM m
"""


@query("txt_zipf", oracle=ZIPF_SQL)
def txt_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = tf.select(
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "term"))
        .cast("bigint")
        .alias("r"),
        "c",
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).cast("decimal(18,9)").alias("x"),
        F.log(F.col("c").cast("double")).cast("decimal(18,9)").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(19,9)").alias("sx"),
        F.sum("y").cast("decimal(19,9)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(30,9)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(30,9)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(30,9)").alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # degenerate corpora (uniform frequencies / single-term vocab →
    # zero variance): DuckDB's x/0 is NULL, Spark's is NaN/Inf — the
    # guards keep both engines at NULL
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.when(vx != 0, F.round(cov / vx, 6)).alias("zipf_slope"),
        F.when((vx * vy) != 0, F.round((cov * cov) / (vx * vy), 6)).alias("r2"),
    )


# -- txt_source_mix ----------------------------------------------------
#
# Corpus composition report per source — the mixture dashboard every
# pretraining pipeline keeps (docs/tokens per source, token share of
# the corpus, language spread). One token-counting scan collapses to
# the |sources| grid; the corpus total joins back as a 1-row
# broadcast. Token counts are whitespace-split sizes (the repo's
# ws_token_count convention), all integers until the final share
# divisions.

SRC_MIX_SQL = """
WITH per AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs
  FROM documents GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
       CAST(n_langs AS BIGINT) AS n_langs,
       round(n_tokens / CAST((SELECT SUM(n_tokens) FROM per) AS DOUBLE), 6)
         AS token_share,
       round(n_tokens / CAST(n_docs AS DOUBLE), 6) AS avg_doc_tokens
FROM per
"""


@query("txt_source_mix", oracle=SRC_MIX_SQL)
def txt_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
    total = per.agg(F.sum("n_tokens").cast("double").alias("tot"))
    return per.join(F.broadcast(total)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.round(F.col("n_tokens") / F.col("tot"), 6).alias("token_share"),
        F.round(
            F.col("n_tokens") / F.col("n_docs").cast("double"), 6
        ).alias("avg_doc_tokens"),
    )


# -- txt_bpe_train / txt_bpe_apply -------------------------------------
#
# A real BPE tokenizer pipeline (Sennrich-style word-level BPE), split
# the way production tokenizers are built: merges are LEARNED on a
# bounded deterministic md5-ordered doc sample (driver-side, the
# sanctioned constant-size-collect pattern — same as the PQ
# codebooks), then APPLIED corpus-wide via Arrow-batched mapInPandas
# with a per-batch word memo (Zipf vocabularies → the greedy loop
# runs per DISTINCT word, not per token). Both are deterministic
# (greedy ties break on count then lexicographic pair) but not
# SQL-expressible: verified by an independent-reimplementation pytest
# plus loss-lessness/determinism invariants, not a DuckDB oracle.


@query("txt_bpe_train")  # non-SQL: verified by pytest reimplementation
def txt_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators import bpe

    texts = bpe.sample_texts(Catalog(spark, sf_dir).documents)
    merges = bpe.train_merges(texts, num_merges=64)
    return spark.createDataFrame(
        merges, schema="rank int, left string, right string, merged string, pair_count long"
    )


@query("txt_bpe_apply")  # non-SQL: verified by pytest invariants
def txt_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators import bpe

    d = Catalog(spark, sf_dir).documents
    merges = bpe.train_merges(bpe.sample_texts(d), num_merges=64)
    return bpe.bpe_apply(d, merges)


# -- txt_blocklist -----------------------------------------------------
#
# Blocklist / policy-phrase gate — the deny-list filter every corpus
# pipeline runs in front of training (toxic terms, boilerplate
# markers, license strings). Pure column expressions over one scan
# (split + array filter against a literal term set): zero shuffles,
# zero Python, trivially scan-parallel at 100 TB. Emits per-doc hit
# diagnostics plus the gate decision; the decision compares the
# ROUNDED ratio so both engines flag identically at the boundary.

_BLOCK_TERMS = ("slow", "dup", "big")
_BLOCK_IN = ", ".join(f"'{t}'" for t in _BLOCK_TERMS)

BLOCKLIST_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), h AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(tk, x -> x IN ({_BLOCK_IN}))) AS BIGINT)
           AS n_hits,
         CAST(len(list_filter(list_distinct(tk), x -> x IN ({_BLOCK_IN})))
              AS BIGINT) AS n_hit_terms
  FROM t
)
SELECT doc_id, n_tokens, n_hits, n_hit_terms,
       round(n_hits / CAST(n_tokens AS DOUBLE), 6) AS hit_ratio,
       CAST(CASE WHEN round(n_hits / CAST(n_tokens AS DOUBLE), 6) > 0.05
            THEN 1 ELSE 0 END AS BIGINT) AS blocked
FROM h
"""


@query("txt_blocklist", oracle=BLOCKLIST_SQL)
def txt_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators.textstats import blocklist_hit_ratio

    d = Catalog(spark, sf_dir).documents
    terms = list(_BLOCK_TERMS)
    tk = F.split("text", " ")
    h = d.select(
        "doc_id",
        "text",
        F.size(tk).cast("bigint").alias("n_tokens"),
        F.size(F.filter(tk, lambda x: x.isin(terms)))
        .cast("bigint")
        .alias("n_hits"),
        F.size(F.filter(F.array_distinct(tk), lambda x: x.isin(terms)))
        .cast("bigint")
        .alias("n_hit_terms"),
    )
    # the ONE shared decision expression (operators.textstats) — the
    # fluent Pipeline.blocklist gate applies the same column
    ratio = blocklist_hit_ratio("text", terms)
    return h.select(
        "doc_id", "n_tokens", "n_hits", "n_hit_terms",
        ratio.alias("hit_ratio"),
        F.when(ratio > 0.05, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("blocked"),
    )


# -- txt_collocations --------------------------------------------------
#
# PMI collocation mining: the top bigrams by pointwise mutual
# information, ln(p(xy) / (p(x)p(y))) — the classic "which word pairs
# co-occur far more than chance" statistic behind phrase detection
# (word2vec phrases, n-gram vocab induction). Scale shape: the token
# stream partial-aggregates to the |vocab| and |vocab²| grids; the
# corpus token/bigram totals come straight off the doc scan (array
# lengths — no explode needed) as 1-row broadcasts; the |vocab|-sized
# unigram grid is cached once and broadcast onto BOTH sides of the
# bigram join, so each explode runs exactly once; the final top-20 is
# a mergeable TakeOrdered. Determinism: PMI is a fixed-order chain of
# ln() on exact integer-valued doubles — identical expression,
# identical IEEE result — rounded to 6 before the (pmi, w1, w2)
# ordering.

COLLOC_SQL = """
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents
), uc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(tk) AS w FROM t) u GROUP BY 1
), nu AS (SELECT CAST(SUM(len(tk)) AS DOUBLE) AS nu FROM t),
bc AS (
  SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS c_xy
  FROM (SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> [tk[i], tk[i + 1]])) AS pr
        FROM t WHERE len(tk) > 1) b
  GROUP BY 1, 2
), nb AS (SELECT CAST(SUM(CASE WHEN len(tk) > 1 THEN len(tk) - 1
                              ELSE 0 END) AS DOUBLE) AS nb FROM t)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       round(((((ln(CAST(c_xy AS DOUBLE)) + 2 * ln(nu.nu)) - ln(nb.nb))
               - ln(CAST(u1.c AS DOUBLE))) - ln(CAST(u2.c AS DOUBLE))), 6)
         AS pmi
FROM bc
JOIN uc u1 ON bc.w1 = u1.w
JOIN uc u2 ON bc.w2 = u2.w
CROSS JOIN nu CROSS JOIN nb
WHERE c_xy >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


@query("txt_collocations", oracle=COLLOC_SQL)
def txt_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(F.split("text", " ").alias("tk"))
    # the vocab grid feeds both join sides: cache it so the unigram
    # explode + count runs once, not once per consumer
    uc = (
        t.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    nu = t.agg(F.sum(F.size("tk")).cast("double").alias("nu"))
    pairs = t.filter(F.size("tk") > 1).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS w1,"
                "             element_at(tk, i + 1) AS w2))"
            )
        ).alias("pr")
    )
    bc = pairs.groupBy(
        F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("c_xy"))
    nb = t.agg(
        F.sum(
            F.when(F.size("tk") > 1, F.size("tk") - 1).otherwise(0)
        ).cast("double").alias("nb")
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        (
            (
                (F.log(F.col("c_xy").cast("double")) + 2 * F.log("nu"))
                - F.log("nb")
            )
            - F.log(F.col("c1").cast("double"))
        )
        - F.log(F.col("c2").cast("double")),
        6,
    )
    return (
        bc.filter(F.col("c_xy") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select("w1", "w2", F.col("c_xy").cast("bigint").alias("c_xy"),
                pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


# -- txt_js_divergence -------------------------------------------------
#
# Per-source Jensen-Shannon divergence from the corpus unigram
# distribution — the drift/contamination dashboard behind
# txt_source_mix (a source whose JS suddenly jumps is mis-crawled or
# mislabeled). The naive JS needs the full |sources|×|vocab| grid;
# the scalable rewrite folds absent-term mass in closed form:
#   JS(p,q) = ½·[ Σ_{i∈S} p·ln(p/m) + Σ_{i∈S} q·ln(q/m)
#                 + (1 − Σ_{i∈S} q)·ln 2 ],   m = (p+q)/2
# (terms absent from the source have p=0, m=q/2, contributing
# q·ln 2), so only the source-term grid is ever materialized, with
# the vocab-sized corpus distribution broadcast onto it.
# Determinism: p, q, m are identically-computed doubles; each
# summand casts to DECIMAL(18,9) so the folds are exact and
# order-independent; one final rounded combination.

JS_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), st AS (
  SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
), ct AS (
  SELECT term, CAST(SUM(c) AS BIGINT) AS ctot FROM st GROUP BY 1
), ns AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY 1
), nt AS (SELECT CAST(SUM(ctot) AS BIGINT) AS n FROM ct),
terms AS (
  SELECT st.source, st.c / CAST(ns.n_s AS DOUBLE) AS p,
         ct.ctot / CAST(nt.n AS DOUBLE) AS q
  FROM st JOIN ns ON st.source = ns.source
  JOIN ct ON st.term = ct.term CROSS JOIN nt
), folds AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CAST(p * ln(p / ((p + q) / 2)) AS DECIMAL(18,9)))
              AS DOUBLE) AS s1,
         CAST(SUM(CAST(q * ln(q / ((p + q) / 2)) AS DECIMAL(18,9)))
              AS DOUBLE) AS s2,
         CAST(SUM(CAST(q AS DECIMAL(18,9))) AS DOUBLE) AS qs
  FROM terms GROUP BY 1
)
SELECT source, n_terms,
       round(0.5 * (s1 + s2 + (1 - qs) * ln(2.0)), 6) AS js_divergence
FROM folds
"""


@query("txt_js_divergence", oracle=JS_SQL)
def txt_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # the source-term grid feeds four consumers (terms/ct/ns/nt):
    # cache it so the token explode + count runs ONCE, not per branch
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    ct = st.groupBy("term").agg(F.sum("c").cast("bigint").alias("ctot"))
    ns = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    nt = ct.agg(F.sum("ctot").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n_s").cast("double")
    q = F.col("ctot") / F.col("n").cast("double")
    m = (p + q) / 2
    terms = (
        st.join(F.broadcast(ns), "source")
        .join(F.broadcast(ct), "term")
        .join(F.broadcast(nt))
        .select("source", p.alias("p"), q.alias("q"))
    )
    p_, q_ = F.col("p"), F.col("q")
    m_ = (p_ + q_) / 2
    folds = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum((p_ * F.log(p_ / m_)).cast("decimal(18,9)"))
        .cast("double")
        .alias("s1"),
        F.sum((q_ * F.log(q_ / m_)).cast("decimal(18,9)"))
        .cast("double")
        .alias("s2"),
        F.sum(q_.cast("decimal(18,9)")).cast("double").alias("qs"),
    )
    return folds.select(
        "source",
        "n_terms",
        F.round(
            0.5
            * (F.col("s1") + F.col("s2") + (1 - F.col("qs")) * F.log(F.lit(2.0))),
            6,
        ).alias("js_divergence"),
    )


# -- txt_corpus_report -------------------------------------------------
#
# One-row corpus health dashboard — the summary a pipeline logs per
# snapshot before/after cleaning: volume (docs/tokens), exact-dup
# pressure (docs sharing an md5 fingerprint), language spread and the
# dominant language. Scale shape: one fingerprint groupBy, one lang
# groupBy, one token-count scan — three constant-size aggregates
# joined broadcast into a single row. Deterministic: all integers,
# mode tie-break on lang code, single rounded divisions.

CORPUS_REPORT_SQL = """
WITH fp AS (
  SELECT md5(text) AS f, COUNT(*) AS c FROM documents GROUP BY 1
), dup AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_texts,
         CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
  FROM fp
), lg AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1
), toplang AS (
  SELECT lang, c FROM lg ORDER BY c DESC, lang LIMIT 1
), vol AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents
)
SELECT vol.n_docs, vol.n_tokens, vol.n_langs,
       dup.n_texts AS n_distinct_texts, dup.n_dup_docs,
       round(dup.n_dup_docs / CAST(vol.n_docs AS DOUBLE), 6) AS dup_ratio,
       toplang.lang AS top_lang,
       round(toplang.c / CAST(vol.n_docs AS DOUBLE), 6) AS top_lang_share,
       round(vol.n_tokens / CAST(vol.n_docs AS DOUBLE), 6) AS mean_doc_tokens
FROM vol CROSS JOIN dup CROSS JOIN toplang
"""


@query("txt_corpus_report", oracle=CORPUS_REPORT_SQL)
def txt_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    dup = (
        d.groupBy(F.md5("text").alias("f"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_texts"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_dup_docs"),
        )
    )
    toplang = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "lang")
        .limit(1)
    )
    vol = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    return (
        vol.join(F.broadcast(dup))
        .join(F.broadcast(toplang))
        .select(
            "n_docs", "n_tokens", "n_langs", "n_distinct_texts", "n_dup_docs",
            F.round(
                F.col("n_dup_docs") / F.col("n_docs").cast("double"), 6
            ).alias("dup_ratio"),
            F.col("lang").alias("top_lang"),
            F.round(F.col("c") / F.col("n_docs").cast("double"), 6).alias(
                "top_lang_share"
            ),
            F.round(
                F.col("n_tokens") / F.col("n_docs").cast("double"), 6
            ).alias("mean_doc_tokens"),
        )
    )


# -- txt_readability ---------------------------------------------------
#
# Flesch reading-ease per document, rolled up per (lang, source) — the
# readability gate a curriculum-ordered training mix sorts on.
# Syllables are approximated as vowel-group runs ([aeiouy]+ on the
# lowercased text, the standard cheap heuristic), sentences as
# [.!?]+ runs (min 1), words by the repo's whitespace-token
# convention. flesch = 206.835 − 1.015·(W/S) − 84.6·(Syl/W), computed
# in an identical expression shape on both engines and rounded to 4
# per doc BEFORE aggregation; the rollup averages exact DECIMAL(18,4)
# sums, left UNROUNDED (midpoint-free — see the inline note).
# The hardest doc per bucket is argmin by (flesch, doc_id) —
# unique-key tie-break. Shape: per-doc map work, one groupBy to the
# |lang × source| grid, one window for the argmin.

TXT_READ_SQL = """
WITH per_doc AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
  FROM documents
),
scored AS (
  SELECT doc_id, lang, source, w, s, syl,
         round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                       - 84.6 * (syl / CAST(w AS DOUBLE)), 4) AS flesch
  FROM per_doc WHERE w > 0
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
                               ORDER BY flesch, doc_id) AS rk
  FROM scored
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(flesch AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(*) AS avg_flesch,
       round(CAST(SUM(CASE WHEN flesch >= 60 THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pct_easy,
       CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
         AS hardest_doc_id
FROM ranked GROUP BY 1, 2
"""


@query("txt_readability", oracle=TXT_READ_SQL)
def txt_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    per_doc = d.select(
        "doc_id", "lang", "source",
        F.size(F.split(F.col("text"), " ")).alias("w"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
        ).alias("s"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("syl"),
    )
    scored = per_doc.filter(F.col("w") > 0).withColumn(
        "flesch",
        F.round(
            206.835
            - 1.015 * (F.col("w") / F.col("s").cast("double"))
            - 84.6 * (F.col("syl") / F.col("w").cast("double")),
            4,
        ),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang", "source").orderBy("flesch", "doc_id")
    )
    ranked = scored.withColumn("rk", rk)
    return ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # unrounded on purpose: exact-decimal sum → double cast + one
        # IEEE division is bit-identical cross-engine, while round(,4)
        # at a representable midpoint is not (Spark HALF_UP on
        # shortest-repr vs DuckDB scale-and-round — hit here at
        # 27.86285 during development)
        (
            F.sum(F.col("flesch").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_flesch"),
        F.round(
            F.sum(F.when(F.col("flesch") >= 60, 1).otherwise(0)).cast("bigint")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pct_easy"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).cast("bigint")
        .alias("hardest_doc_id"),
    )


# -- txt_heaps_law -----------------------------------------------------
#
# Heaps'-law vocabulary growth per source: each source contributes a
# (ln n_tokens, ln n_types) point and the corpus-level OLS fit of
# log V = log K + β log N estimates the growth exponent β — the
# diagnostic that says how much *new* vocabulary further crawling
# buys. The fit follows q_regression's exact-moment recipe with ln
# terms rounded to DECIMAL(18,9) (order-independent sums over the
# |sources| grid); β and K are single double divisions. Shape: one
# token groupBy to the (source, term) grid, a |sources|-row fit,
# broadcast back onto the per-source rows.

HEAPS_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types
  FROM toks GROUP BY 1
),
pts AS (
  SELECT source, n_tokens, n_types,
         CAST(round(ln(n_tokens), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(n_types), 9) AS DECIMAL(18,9)) AS y
  FROM per_src
),
fit AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM pts
)
SELECT source, n_tokens, n_types,
       round((SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) FROM fit), 6)
         AS beta,
       round((SELECT exp((sy - ((n * sxy - sx * sy)
                                / (n * sxx - sx * sx)) * sx) / n)
              FROM fit), 4) AS k
FROM pts
"""


@query("txt_heaps_law", oracle=HEAPS_SQL)
def txt_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("term").cast("bigint").alias("n_types"),
    )
    pts = per_src.select(
        "source", "n_tokens", "n_types",
        F.round(F.log("n_tokens"), 9).cast("decimal(18,9)").alias("x"),
        F.round(F.log("n_types"), 9).cast("decimal(18,9)").alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pts.join(F.broadcast(fit)).select(
        "source", "n_tokens", "n_types",
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((sy - beta * sx) / n), 4).alias("k"),
    )


# -- txt_novelty -------------------------------------------------------
#
# Corpus novelty-decay curve: for each doc-id decile (ingestion-order
# bucket), the share of its distinct 3-gram shingles seen for the
# FIRST time in that doc — the curve that tells a crawl pipeline when
# additional data stops contributing new content (the aggregate view
# of what incremental dedup enforces pairwise). First occurrence is
# min(doc_id) per shingle (deterministic); shares are exact-count
# double divisions rounded to 6. Shape: one shingle groupBy (cost =
# token stream), then bucket-grid work.

NOVELTY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks WHERE len(t) >= 3
),
firsts AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM sh JOIN firsts f ON f.s = sh.s
  GROUP BY 1
),
mx AS (SELECT MAX(doc_id) AS m FROM documents)
SELECT CAST(least(9, floor(doc_id * 10.0 / ((SELECT m FROM mx) + 1)))
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       round(CAST(SUM(n_novel) AS DOUBLE) / SUM(n_shingles), 6)
         AS novelty
FROM per_doc GROUP BY 1
"""


@query("txt_novelty", oracle=NOVELTY_SQL)
def txt_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = F.split(F.col("text"), " ")
    toks = d.select("doc_id", t.alias("t")).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("s"),
    ).distinct()
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
    )
    mx = d.agg(F.max("doc_id").alias("m"))
    # explicit floor: DuckDB's double→bigint CAST rounds to nearest
    # while Spark's truncates, so the bucket cut must not rely on it
    bucket = F.least(
        F.lit(9).cast("bigint"),
        F.floor(F.col("doc_id") * 10.0 / (F.col("m") + 1)).cast("bigint"),
    ).cast("bigint")
    return (
        per_doc.join(F.broadcast(mx))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_shingles").cast("bigint").alias("n_shingles"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.round(
                F.sum("n_novel").cast("double") / F.sum("n_shingles"), 6
            ).alias("novelty"),
        )
    )


# -- txt_langid_eval ---------------------------------------------------
#
# Language-ID confusion matrix: the stopword-marker classifier
# (txt_langid) evaluated against the corpus's labeled ``lang`` column
# — per (true, predicted) cell counts and the share of the true
# class, i.e. the per-language recall diagonal. The oracle restates
# the classifier inline (same CASE chain as TXT_LANGID_SQL), so the
# evaluation is hash-checked end-to-end. Shape: map-side classify,
# one groupBy to the |langs|² grid.

from redmap_spark.inventory.text import TXT_LANGID_SQL as _LANGID_SQL  # noqa: E402

LANGID_EVAL_SQL = f"""
WITH pred AS ({_LANGID_SQL}),
cells AS (
  SELECT d.lang AS lang_true, p.lang_pred,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  GROUP BY 1, 2
)
SELECT lang_true, lang_pred, n_docs,
       round(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY lang_true)
                           AS DOUBLE), 6) AS share_of_true
FROM cells
"""


@query("txt_langid_eval", oracle=LANGID_EVAL_SQL)
def txt_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators import textstats as T

    d = Catalog(spark, sf_dir).documents
    cells = (
        d.select(F.col("lang").alias("lang_true"), T.langid("text").alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    tot = Window.partitionBy("lang_true")
    return cells.select(
        "lang_true", "lang_pred", "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(tot).cast("double"), 6
        ).alias("share_of_true"),
    )


# -- txt_compress_ratio ------------------------------------------------
#
# Compression-ratio quality signal: zlib-compressed size over raw
# size per document, rolled up per source — the cheap
# "is this repetitive junk" detector (boilerplate and template spam
# compress far below natural text; the DataComp/RefinedWeb-style
# filter signal). zlib is not SQL-expressible, so this is a rows-only
# entry: the Arrow-batched mapInPandas does the byte work
# executor-side (no shuffle before the rollup groupBy), and pytest
# verifies doc-level ratios against direct zlib calls. Level is
# pinned (6) so results are deterministic across zlib builds in
# practice; ratios round to 6.

@query("txt_compress_ratio")  # rows-only: zlib is not SQL-expressible
def txt_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    d = Catalog(spark, sf_dir).documents.select("doc_id", "source", "text")

    def ratios(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            raw_len = raw.str.len()
            comp_len = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "raw_len": raw_len,
                    "comp_len": comp_len,
                }
            )

    per_doc = d.mapInPandas(
        ratios, schema="doc_id long, source string, raw_len long, comp_len long"
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("raw_len").cast("bigint").alias("raw_bytes"),
        F.sum("comp_len").cast("bigint").alias("comp_bytes"),
        F.round(
            F.sum("comp_len").cast("double") / F.sum("raw_len"), 6
        ).alias("compress_ratio"),
        F.sum(
            F.when(
                F.col("comp_len").cast("double") / F.col("raw_len") < 0.35, 1
            ).otherwise(0)
        ).cast("bigint").alias("n_suspect_docs"),
    )


# -- txt_burstiness ----------------------------------------------------
#
# Term burstiness (Church–Gale): corpus frequency over document
# frequency for the 50 most document-frequent terms — cf/df ≈ 1 means
# a term sprinkles evenly (function word), high cf/df means it bursts
# within few docs (topical/boilerplate). The vocabulary-level
# companion to txt_repetition's within-doc signal. Exact integer
# counts, one double division; top-50 cut breaks ties on term. Shape:
# one token groupBy to the (term, doc) grid then the |vocab| grid.

BURST_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
td AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
),
v AS (
  SELECT term,
         CAST(SUM(c) AS BIGINT) AS cf,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM td GROUP BY 1
)
SELECT term, cf, df, round(cf / CAST(df AS DOUBLE), 6) AS burstiness
FROM v
ORDER BY df DESC, term
LIMIT 50
"""


@query("txt_burstiness", oracle=BURST_SQL)
def txt_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    td = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    v = td.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    return (
        v.select(
            "term", "cf", "df",
            F.round(F.col("cf") / F.col("df").cast("double"), 6)
            .alias("burstiness"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(50)
    )


# -- txt_source_signature ----------------------------------------------
#
# Distinctive vocabulary per source (Monroe, Colaresi & Quinn 2008
# "Fightin' Words", informative-Dirichlet log-odds): for each source,
# the 5 terms whose usage most exceeds the rest of the corpus by the
# smoothed log-odds z-score δ/√(1/(y_s+α) + 1/(y_r+α)) with α = 0.5
# — the corpus-drift "what makes this slice different" report run
# when auditing a new data source before mixing it in. Counts are
# exact integers, so both engines feed identical doubles into ln();
# the z rounds to 6 (the q_survival_km ln/exp cross-engine
# precedent). Scale shape: one token explode partial-aggregates to
# the |source × vocab| grid; broadcast per-source and global totals;
# the top-5 window runs over the grid only.

SOURCE_SIG_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term
  FROM documents
), sv AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS y_s
  FROM tok GROUP BY 1, 2
), tv AS (
  SELECT term, CAST(SUM(y_s) AS BIGINT) AS y_all FROM sv GROUP BY 1
), st AS (
  SELECT source, CAST(SUM(y_s) AS BIGINT) AS n_s FROM sv GROUP BY 1
), gt AS (
  SELECT CAST(SUM(y_s) AS BIGINT) AS n_all,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab
  FROM sv
), z AS (
  SELECT sv.source, sv.term, sv.y_s,
         (tv.y_all - sv.y_s) AS y_r,
         round(
           (ln((sv.y_s + 0.5)
               / (st.n_s + 0.5 * gt.vocab - sv.y_s - 0.5))
            - ln((tv.y_all - sv.y_s + 0.5)
                 / (gt.n_all - st.n_s
                    + 0.5 * gt.vocab - tv.y_all + sv.y_s - 0.5)))
           / sqrt(1.0 / (sv.y_s + 0.5)
                  + 1.0 / (tv.y_all - sv.y_s + 0.5)), 6) AS z_score
  FROM sv
  JOIN tv ON tv.term = sv.term
  JOIN st ON st.source = sv.source
  CROSS JOIN gt
)
SELECT source, term, y_s, y_r, z_score,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY z_score DESC, term) AS rk
  FROM z
) WHERE rk <= 5
ORDER BY source, rank
"""


@query("txt_source_signature", oracle=SOURCE_SIG_SQL)
def txt_source_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sv = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y_s"))
        .localCheckpoint(eager=True)  # four consumers of the grid
    )
    tv = sv.groupBy("term").agg(F.sum("y_s").cast("bigint").alias("y_all"))
    st = sv.groupBy("source").agg(F.sum("y_s").cast("bigint").alias("n_s"))
    gt = sv.agg(
        F.sum("y_s").cast("bigint").alias("n_all"),
        F.countDistinct("term").cast("bigint").alias("vocab"),
    )
    j = (
        sv.join(tv, "term")
        .join(F.broadcast(st), "source")
        .join(F.broadcast(gt))
    )
    y_s, y_all = F.col("y_s"), F.col("y_all")
    n_s, n_all, vocab = F.col("n_s"), F.col("n_all"), F.col("vocab")
    y_r = y_all - y_s
    delta = F.log(
        (y_s + 0.5) / (n_s + 0.5 * vocab - y_s - 0.5)
    ) - F.log(
        (y_r + 0.5) / (n_all - n_s + 0.5 * vocab - y_r - 0.5)
    )
    z = j.select(
        "source", "term", "y_s",
        y_r.alias("y_r"),
        F.round(
            delta / F.sqrt(1.0 / (y_s + 0.5) + 1.0 / (y_r + 0.5)), 6
        ).alias("z_score"),
    )
    wr = Window.partitionBy("source").orderBy(F.desc("z_score"), F.asc("term"))
    return (
        z.select("*", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select(
            "source", "term", "y_s", "y_r", "z_score",
            F.col("rk").cast("bigint").alias("rank"),
        )
        .orderBy("source", "rank")
    )


# -- txt_template_detect -----------------------------------------------
#
# Boilerplate/template detection per source: the share of a source's
# documents opening with its most common 8-token prefix — scraped
# template corpora (nav headers, license banners, generated pages)
# spike here long before full-document dedup fires, so this is the
# cheap first-pass audit of a new source. A prefix counted once per
# doc (no explode beyond one row/doc); everything collapses to the
# |source × distinct-prefix| grid, then one per-source argmax window
# over that grid with (count DESC, prefix ASC) determinism.

TEMPLATE_SQL = """
WITH pre AS (
  SELECT source,
         array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix
  FROM documents
), g AS (
  SELECT source, prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pre GROUP BY 1, 2
), st AS (
  SELECT source, CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM g GROUP BY 1
), top AS (
  SELECT source, prefix, n_docs FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_docs DESC, prefix) AS rk
    FROM g
  ) WHERE rk = 1
)
SELECT top.source, top.prefix AS top_prefix, top.n_docs, st.total_docs,
       round(top.n_docs / CAST(st.total_docs AS DOUBLE), 6)
         AS template_share,
       CAST(CASE WHEN top.n_docs / CAST(st.total_docs AS DOUBLE) > 0.01
            THEN 1 ELSE 0 END AS BIGINT) AS template_suspect
FROM top JOIN st ON st.source = top.source
ORDER BY top.source
"""


@query("txt_template_detect", oracle=TEMPLATE_SQL)
def txt_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    g = (
        d.select(
            "source",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
            .alias("prefix"),
        )
        .groupBy("source", "prefix")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .localCheckpoint(eager=True)  # totals + argmax both consume
    )
    st = g.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("total_docs")
    )
    wr = Window.partitionBy("source").orderBy(F.desc("n_docs"), F.asc("prefix"))
    top = (
        g.select("*", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    share = F.col("n_docs") / F.col("total_docs").cast("double")
    return (
        top.join(F.broadcast(st), "source")
        .select(
            "source",
            F.col("prefix").alias("top_prefix"),
            "n_docs", "total_docs",
            F.round(share, 6).alias("template_share"),
            F.when(share > 0.01, 1).otherwise(0).cast("bigint")
            .alias("template_suspect"),
        )
        .orderBy("source")
    )


# -- txt_chat_format ---------------------------------------------------
#
# Training-example rendering: wrap each document into the
# instruction-tuning chat template
#   <|system|>…<|user|>…<|assistant|>{text}<|end|>
# with a deterministic per-doc instruction (keyed by doc_id % 4 — a
# fixed instruction bank, no RNG), whitespace token accounting for
# the rendered example, and a 512-token truncation flag — the
# formatting pass that turns a cleaned corpus into SFT rows. Pure
# string ops (concat / split / size), map-only: zero shuffle before
# the per-source rollup; the oracle states the identical rendering.

_CHAT_INSTR = [
    "Summarize the following passage.",
    "What are the key facts in this text?",
    "Rewrite this passage in plain language.",
    "List the main topics of this document.",
]

CHAT_FORMAT_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         '<|system|>You are a helpful assistant.<|user|>'
         || CASE CAST(doc_id % 4 AS INTEGER)
              WHEN 0 THEN '{_CHAT_INSTR[0]}'
              WHEN 1 THEN '{_CHAT_INSTR[1]}'
              WHEN 2 THEN '{_CHAT_INSTR[2]}'
              ELSE '{_CHAT_INSTR[3]}' END
         || chr(10) || text || '<|assistant|>' AS prompt,
         text
  FROM documents
), t AS (
  SELECT doc_id, source, prompt,
         CAST(len(string_split(prompt, ' ')) AS BIGINT) AS prompt_tokens,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS target_tokens
  FROM r
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       CAST(SUM(prompt_tokens) AS BIGINT) AS total_prompt_tokens,
       CAST(SUM(target_tokens) AS BIGINT) AS total_target_tokens,
       CAST(SUM(CASE WHEN prompt_tokens + target_tokens > 512
                THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       MIN(CASE WHEN doc_id % 1000 = 0 THEN substr(prompt, 1, 80) END)
         AS sample_prompt_prefix
FROM t GROUP BY 1
ORDER BY source
"""


@query("txt_chat_format", oracle=CHAT_FORMAT_SQL)
def txt_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    instr = (
        F.when(F.col("doc_id") % 4 == 0, _CHAT_INSTR[0])
        .when(F.col("doc_id") % 4 == 1, _CHAT_INSTR[1])
        .when(F.col("doc_id") % 4 == 2, _CHAT_INSTR[2])
        .otherwise(_CHAT_INSTR[3])
    )
    prompt = F.concat(
        F.lit("<|system|>You are a helpful assistant.<|user|>"),
        instr, F.lit("\n"), F.col("text"), F.lit("<|assistant|>"),
    )
    t = d.select(
        "doc_id", "source",
        prompt.alias("prompt"),
        F.size(F.split(prompt, " ")).cast("bigint").alias("prompt_tokens"),
        F.size(F.split("text", " ")).cast("bigint").alias("target_tokens"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_examples"),
            F.sum("prompt_tokens").cast("bigint").alias("total_prompt_tokens"),
            F.sum("target_tokens").cast("bigint").alias("total_target_tokens"),
            F.sum(
                F.when(
                    F.col("prompt_tokens") + F.col("target_tokens") > 512, 1
                ).otherwise(0)
            ).cast("bigint").alias("n_truncated"),
            F.min(
                F.when(
                    F.col("doc_id") % 1000 == 0,
                    F.substring("prompt", 1, 80),
                )
            ).alias("sample_prompt_prefix"),
        )
        .orderBy("source")
    )


# -- txt_mixture_plan --------------------------------------------------
#
# Static training-mixture planner (the DoReMi/Pile-style weights →
# sampling-plan step): given target mixture weights per source and a
# total token budget, compute each source's available whitespace
# tokens, its target allocation, the sampling rate (≤ 1 ⇒ subsample)
# or epoch count (> 1 ⇒ repeat), and the repeated-token overflow —
# the table a pretraining run materializes before drawing a single
# batch. Weights/budget are fixed literals of the plan; token counts
# are exact integers; rate/epochs are one identical double division.
# Scale shape: one scan → |sources| grid.

_MIX_BUDGET = 500_000  # plan tokens
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}

_MIX_W_SQL = " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
)

MIXTURE_SQL = f"""
WITH avail AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY 1
)
SELECT source, n_docs, avail_tokens,
       round(CASE source {_MIX_W_SQL} ELSE 0.0 END, 6) AS target_weight,
       CAST(round((CASE source {_MIX_W_SQL} ELSE 0.0 END)
                  * {_MIX_BUDGET}, 0) AS BIGINT) AS target_tokens,
       round((CASE source {_MIX_W_SQL} ELSE 0.0 END) * {_MIX_BUDGET}
             / avail_tokens, 6) AS epochs,
       CAST(CASE WHEN (CASE source {_MIX_W_SQL} ELSE 0.0 END)
                      * {_MIX_BUDGET} > avail_tokens
            THEN 1 ELSE 0 END AS BIGINT) AS needs_repeat
FROM avail
ORDER BY source
"""


@query("txt_mixture_plan", oracle=MIXTURE_SQL)
def txt_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    avail = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint")
        .alias("avail_tokens"),
    )
    w = F.coalesce(
        F.element_at(
            F.create_map(
                *[x for s, wt in _MIX_WEIGHTS.items()
                  for x in (F.lit(s), F.lit(wt))]
            ),
            F.col("source"),
        ),
        F.lit(0.0),
    )
    target = w * _MIX_BUDGET
    return avail.select(
        "source", "n_docs", "avail_tokens",
        F.round(w, 6).alias("target_weight"),
        F.round(target, 0).cast("bigint").alias("target_tokens"),
        F.round(target / F.col("avail_tokens"), 6).alias("epochs"),
        F.when(target > F.col("avail_tokens"), 1).otherwise(0)
        .cast("bigint").alias("needs_repeat"),
    ).orderBy("source")


# -- txt_bpe_fertility -------------------------------------------------
#
# Tokenizer fertility dashboard (subwords per word — THE tokenizer
# health metric: high fertility on a language/source means the vocab
# under-serves it and its effective context shrinks): the repo's own
# sample-trained BPE (64 merges over a 256-doc deterministic md5
# sample) applied corpus-wide, fertility aggregated per (lang,
# source). Rows-only by design — BPE application is the documented
# Arrow mapInPandas seam — with the per-doc counts pytest-verified
# against a direct reimplementation; the rollup itself is exact
# integer sums with one final division.

@query("txt_bpe_fertility")  # rows-only: BPE apply is the Arrow seam
def txt_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redmap_spark.operators import bpe as B

    d = Catalog(spark, sf_dir).documents
    merges = B.train_merges(B.sample_texts(d), num_merges=64)
    counts = B.bpe_apply(d, merges).select("doc_id", "n_words", "n_subwords")
    j = d.select("doc_id", "lang", "source").join(counts, "doc_id")
    return (
        j.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            F.round(
                F.sum("n_subwords") / F.sum("n_words").cast("double"), 6
            ).alias("fertility"),
        )
        .orderBy("lang", "source")
    )


# -- q_quantile_normalization ------------------------------------------
#
# Cross-source quantile normalization of document lengths (the
# batch-effect correction standard — map every source's n_chars
# distribution onto the pooled reference by rank, so per-source
# length gates compare like with like; the same transform calibrates
# per-source quality scores before a global cutoff). Per (source,
# value) tie-block: upper rank share cum/n_src → target pooled rank
# ceil(share·N) → mapped value = smallest pooled value whose pooled
# cumulative count reaches that rank (a bounded grid×grid non-equi
# min-join — both grids are |distinct lengths|-sized, never rows).
# All counts/ranks exact integers; mapped values are integers, so
# before/after means are exact-sum ratios. Dashboard: per source,
# mean/median before vs after (after-medians collapse onto the
# pooled median — the visible proof the transform worked).

QNORM_SQL = """
WITH g AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), sg AS (
  SELECT source, v, c,
         SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
         SUM(c) OVER (PARTITION BY source) AS ns
  FROM g
), pooled AS (
  SELECT v, SUM(c) AS pc FROM g GROUP BY 1
), pg AS (
  SELECT v, SUM(pc) OVER (ORDER BY v) AS pcum,
         SUM(pc) OVER () AS nt
  FROM pooled
), mapped AS (
  SELECT sg.source, sg.v, sg.c, sg.cum, sg.ns,
         (SELECT MIN(pg.v) FROM pg
          WHERE pg.pcum >= CAST(ceil(CAST(sg.cum AS DOUBLE) / sg.ns
                                     * (SELECT MAX(nt) FROM pg)) AS BIGINT))
           AS mv
  FROM sg
)
SELECT source,
       CAST(MAX(ns) AS BIGINT) AS n_docs,
       round(CAST(SUM(v * c) AS DOUBLE) / MAX(ns), 6) AS mean_before,
       round(CAST(SUM(mv * c) AS DOUBLE) / MAX(ns), 6) AS mean_after,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(0.5 * ns) AS BIGINT)
                     THEN v END) AS BIGINT) AS median_before,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(0.5 * ns) AS BIGINT)
                     THEN mv END) AS BIGINT) AS median_after
FROM mapped GROUP BY 1
ORDER BY source
"""


@query("q_quantile_normalization", oracle=QNORM_SQL)
def q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    g = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=True)  # source grids + pooled grid consume
    ws = Window.partitionBy("source")
    sg = g.select(
        "source", "v", "c",
        F.sum("c").over(ws.orderBy("v")).alias("cum"),
        F.sum("c").over(ws).alias("ns"),
    )
    pooled = g.groupBy("v").agg(F.sum("c").alias("pc"))
    pg = pooled.select(
        F.col("v").alias("pv"),
        F.sum("pc").over(Window.orderBy("v")).alias("pcum"),
        F.sum("pc").over(Window.partitionBy()).alias("nt"),
    )
    tgt = F.ceil(
        F.col("cum").cast("double") / F.col("ns") * F.col("nt")
    ).cast("bigint")
    mapped = (
        sg.join(F.broadcast(pg), F.col("pcum") >= tgt)
        .groupBy("source", "v", "c", "cum", "ns")
        .agg(F.min("pv").alias("mv"))
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.max("ns").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("v") * F.col("c")).cast("double") / F.max("ns"), 6
            ).alias("mean_before"),
            F.round(
                F.sum(F.col("mv") * F.col("c")).cast("double") / F.max("ns"), 6
            ).alias("mean_after"),
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(0.5 * F.col("ns")).cast("bigint"),
                    F.col("v"),
                )
            ).cast("bigint").alias("median_before"),
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(0.5 * F.col("ns")).cast("bigint"),
                    F.col("mv"),
                )
            ).cast("bigint").alias("median_after"),
        )
        .orderBy("source")
    )
