"""SURVEY §2 additions (round 6, ninth session) — corpus curation:
code-likeness detection for training-data routing (code documents
want different dedup/quality gates than prose; mis-routed code also
skews perplexity and n-gram stats).

Detector features are the public heuristics (symbol density,
programming-keyword hits, snake_case/camelCase identifier density,
digit ratio) computed with JVM-side regexes — one map-side scan, no
shuffle until the final per-source rollup. DuckDB's
len(regexp_extract_all(...)) is the established cross-engine twin of
Spark's size(regexp_extract_all(...)); both are RE2/Java-compatible
patterns (no lookaround, no backrefs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query

# -- txt_code_detect ---------------------------------------------------
#
# Per-document code-likeness score: 10·keyword_density +
# 5·symbol_ratio + 3·snake_density + 3·camel_density + digit_ratio,
# each a per-char or per-token density rounded to 9 decimals before
# the weighted sum (identical double chain both engines). The
# is_code flag (score ≥ 0.05) is what a corpus router consumes; the
# score itself feeds mixture planning. Scale: map-side regex chain,
# zero shuffles before the ORDER BY (driver-materialized ≤|docs|).

_KW = (
    r"\b(def|class|import|return|function|var|const|lambda|void|int|"
    r"float|struct|public|static|elif|printf|null|true|false)\b"
)
_SYM = r"[{}();=<>\[\]#&|]"
_SNAKE = r"\b[a-z][a-z0-9]*_[a-z0-9_]+\b"
_CAMEL = r"\b[a-z]+[A-Z][A-Za-z0-9]*\b"

CODE_DETECT_SQL = f"""
WITH feat AS (
  SELECT doc_id, source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT)
           AS n_tokens,
         CAST(len(regexp_extract_all(text, '{_KW}')) AS BIGINT) AS kw,
         CAST(len(regexp_extract_all(text, '{_SYM}')) AS BIGINT) AS sym,
         CAST(len(regexp_extract_all(text, '{_SNAKE}')) AS BIGINT)
           AS snake,
         CAST(len(regexp_extract_all(text, '{_CAMEL}')) AS BIGINT)
           AS camel,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dig
  FROM documents WHERE length(text) > 0
), scored AS (
  SELECT doc_id, source, n_chars, n_tokens, kw, sym, snake, camel,
         10.0 * round(kw / greatest(1.0, CAST(n_tokens AS DOUBLE)), 9)
       +  5.0 * round(sym / CAST(n_chars AS DOUBLE), 9)
       +  3.0 * round(snake / greatest(1.0, CAST(n_tokens AS DOUBLE)), 9)
       +  3.0 * round(camel / greatest(1.0, CAST(n_tokens AS DOUBLE)), 9)
       +        round(dig / CAST(n_chars AS DOUBLE), 9) AS score
  FROM feat
)
SELECT doc_id, source, n_chars, n_tokens, kw AS kw_hits,
       sym AS sym_chars, snake AS snake_idents, camel AS camel_idents,
       round(score, 6) AS code_score,
       CAST(CASE WHEN score >= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS is_code
FROM scored
ORDER BY doc_id
"""


@query("txt_code_detect", oracle=CODE_DETECT_SQL)
def txt_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents

    def cnt(pat: str):
        return F.size(
            F.expr(f"regexp_extract_all(text, '{pat}', 0)")
        ).cast("bigint")

    feat = d.filter(F.length("text") > 0).select(
        "doc_id", "source",
        F.length("text").cast("bigint").alias("n_chars"),
        cnt("[a-zA-Z]+").alias("n_tokens"),
        cnt(_KW.replace("\\", "\\\\")).alias("kw"),
        cnt(_SYM.replace("\\", "\\\\")).alias("sym"),
        cnt(_SNAKE.replace("\\", "\\\\")).alias("snake"),
        cnt(_CAMEL.replace("\\", "\\\\")).alias("camel"),
        cnt("[0-9]").alias("dig"),
    )
    tok = F.greatest(F.lit(1.0), F.col("n_tokens").cast("double"))
    ch = F.col("n_chars").cast("double")
    score = (
        F.lit(10.0) * F.round(F.col("kw") / tok, 9)
        + F.lit(5.0) * F.round(F.col("sym") / ch, 9)
        + F.lit(3.0) * F.round(F.col("snake") / tok, 9)
        + F.lit(3.0) * F.round(F.col("camel") / tok, 9)
        + F.round(F.col("dig") / ch, 9)
    )
    return (
        feat.select(
            "doc_id", "source", "n_chars", "n_tokens",
            F.col("kw").alias("kw_hits"),
            F.col("sym").alias("sym_chars"),
            F.col("snake").alias("snake_idents"),
            F.col("camel").alias("camel_idents"),
            F.round(score, 6).alias("code_score"),
            F.when(score >= 0.05, 1).otherwise(0).cast("bigint")
            .alias("is_code"),
        )
        .orderBy("doc_id")
    )


# -- txt_kn_perplexity -------------------------------------------------
#
# Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
# Chen & Goodman 1998), trained on the md5-parity half of the corpus
# and scored on the other half: P(w|u) = max(c(uw)−d,0)/c(u·) +
# d·N₁₊(u·)/c(u·) · N₁₊(·w)/|bigram types|, d = 0.75. KN's
# continuation counts are what distinguish it from txt_perplexity's
# add-k unigram scorer — "Francisco" is frequent but only ever
# follows "San", and N₁₊(·w) encodes exactly that. Scoring covers
# test bigrams whose context AND continuation both occur in
# training (coverage reported). Counts are exact integers; per-
# bigram −ln P rounds to DECIMAL(18,9) pre-fold. Scale: token
# explode → grid-sized count tables joined back to test bigrams.

KN_SQL = """
WITH docs2 AS (
  SELECT doc_id, source, string_split(text, ' ') AS t,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_train
  FROM documents WHERE length(text) > 0
), big_tr AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM docs2 WHERE is_train AND len(t) >= 2
), cb AS (
  SELECT string_split(bg, ' ')[1] AS u, string_split(bg, ' ')[2] AS w,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM big_tr GROUP BY 1, 2
), cu AS (
  SELECT u, CAST(SUM(c) AS BIGINT) AS cu,
         CAST(COUNT(*) AS BIGINT) AS n1u
  FROM cb GROUP BY 1
), cont AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n1w FROM cb GROUP BY 1
), types AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM cb
), te AS (
  SELECT source,
         string_split(bg, ' ')[1] AS u, string_split(bg, ' ')[2] AS w
  FROM (
    SELECT source, unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM docs2 WHERE NOT is_train AND len(t) >= 2
  )
), scored AS (
  SELECT te.source,
         CASE WHEN cu.u IS NOT NULL AND ct.w IS NOT NULL THEN
           CAST(round(-ln(
             GREATEST(COALESCE(cb.c, 0) - 0.75, 0.0) / cu.cu
             + 0.75 * cu.n1u / cu.cu * (ct.n1w / CAST(ty.bt AS DOUBLE))
           ), 9) AS DECIMAL(18,9))
         END AS nll
  FROM te
  LEFT JOIN cu ON cu.u = te.u
  LEFT JOIN cont ct ON ct.w = te.w
  LEFT JOIN cb ON cb.u = te.u AND cb.w = te.w
  CROSS JOIN types ty
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(nll) AS BIGINT) AS n_scored,
       round(CAST(COUNT(nll) AS DOUBLE) / COUNT(*), 6) AS coverage,
       round(CAST(SUM(nll) AS DOUBLE) / COUNT(nll), 6) AS avg_nll,
       round(exp(CAST(SUM(nll) AS DOUBLE) / COUNT(nll)), 6) AS perplexity
FROM scored
GROUP BY 1
ORDER BY 1
"""


@query("txt_kn_perplexity", oracle=KN_SQL)
def txt_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    docs2 = d.filter(F.length("text") > 0).select(
        "doc_id", "source",
        F.split("text", " ").alias("t"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < "8"
        ).alias("is_train"),
    )
    docs2 = docs2.cache()  # consumed by the train AND test explodes

    def bigrams(df):
        return df.filter(F.size("t") >= 2).select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("u"),
                        F.element_at("t", i + 1).alias("w"),
                    ),
                )
            ).alias("p"),
        ).select("source", "p.u", "p.w")

    cb = (
        bigrams(docs2.filter("is_train"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cb = cb.cache()  # consumed by cu, cont, types AND scoring
    cu = cb.groupBy("u").agg(
        F.sum("c").cast("bigint").alias("cu"),
        F.count(F.lit(1)).cast("bigint").alias("n1u"),
    )
    cont = cb.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1w")
    )
    types = cb.agg(F.count(F.lit(1)).cast("bigint").alias("bt"))
    te = bigrams(docs2.filter(~F.col("is_train")))
    p = (
        F.greatest(
            F.coalesce(F.col("c"), F.lit(0)) - 0.75, F.lit(0.0)
        ) / F.col("cu")
        + F.lit(0.75) * F.col("n1u") / F.col("cu")
        * (F.col("n1w") / F.col("bt").cast("double"))
    )
    scored = (
        te.join(F.broadcast(cu), "u", "left")
        .join(F.broadcast(cont), "w", "left")
        .join(F.broadcast(cb), ["u", "w"], "left")
        .join(F.broadcast(types))
        .select(
            "source",
            F.when(
                F.col("cu").isNotNull() & F.col("n1w").isNotNull(),
                F.round(-F.log(p), 9).cast("decimal(18,9)"),
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.count("nll").cast("bigint").alias("n_scored"),
            F.round(
                F.count("nll").cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage"),
            F.round(
                F.sum("nll").cast("double") / F.count("nll"), 6
            ).alias("avg_nll"),
            F.round(
                F.exp(F.sum("nll").cast("double") / F.count("nll")), 6
            ).alias("perplexity"),
        )
        .orderBy("source")
    )


# -- txt_minhash_recall ------------------------------------------------
#
# EMPIRICAL banded-MinHash evaluation: candidates from the
# md5-portable 8-hash signatures (dedup_minhash_portable's exact
# machinery) banded 4×2, scored as precision/recall against the
# EXACT shingle-Jaccard ≥ 0.5 ground truth (the shared-shingle
# equi-join — cost Σ df², never n²). dedup_lsh_tuning predicts the
# S-curve; THIS measures it on the corpus, hash-exactly in both
# engines — the text-side twin of sim_lsh_recall. Scale: one
# shingle explode feeding both the signature build and the truth
# join; the eval joins are pair-grid sized.

MINHASH_RECALL_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh FROM sh GROUP BY 1
), truth AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM sh a JOIN sh b ON b.s = a.s AND b.doc_id > a.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) * 2 >= (
    (SELECT nsh FROM sizes WHERE doc_id = a.doc_id)
    + (SELECT nsh FROM sizes WHERE doc_id = b.doc_id)
    - COUNT(*))
), sig AS (
  SELECT doc_id,
         MIN(('0x' || substr(md5('0:' || s), 1, 15))::BIGINT) AS m0,
         MIN(('0x' || substr(md5('1:' || s), 1, 15))::BIGINT) AS m1,
         MIN(('0x' || substr(md5('2:' || s), 1, 15))::BIGINT) AS m2,
         MIN(('0x' || substr(md5('3:' || s), 1, 15))::BIGINT) AS m3,
         MIN(('0x' || substr(md5('4:' || s), 1, 15))::BIGINT) AS m4,
         MIN(('0x' || substr(md5('5:' || s), 1, 15))::BIGINT) AS m5,
         MIN(('0x' || substr(md5('6:' || s), 1, 15))::BIGINT) AS m6,
         MIN(('0x' || substr(md5('7:' || s), 1, 15))::BIGINT) AS m7
  FROM sh GROUP BY 1
), bands AS (
  SELECT doc_id, 0 AS band, m0 AS v1, m1 AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, m2, m3 FROM sig
  UNION ALL SELECT doc_id, 2, m4, m5 FROM sig
  UNION ALL SELECT doc_id, 3, m6, m7 FROM sig
), cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a
  JOIN bands b ON b.band = a.band AND b.v1 = a.v1 AND b.v2 = a.v2
             AND b.doc_id > a.doc_id
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
          JOIN cand c ON c.da = t.da AND c.db = t.db) AS n_hit
)
SELECT n_truth AS n_true_pairs, n_cand AS n_candidates, n_hit AS n_hits,
       round(CASE WHEN n_cand > 0
                  THEN CAST(n_hit AS DOUBLE) / n_cand END, 6) AS precision,
       round(CASE WHEN n_truth > 0
                  THEN CAST(n_hit AS DOUBLE) / n_truth END, 6) AS recall
FROM stats
"""


@query("txt_minhash_recall", oracle=MINHASH_RECALL_SQL)
def txt_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # deterministic md5 quarter-sample: recall evals run on a sample
    # at corpus scale; the sample is the same in both engines
    tok = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "4"
    ).select("doc_id", F.split("text", " ").alias("t"))
    sh = tok.filter(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            )
        ).alias("s"),
    )
    sh = sh.cache()  # consumed by sizes, truth pair join AND signatures
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nsh")
    )
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("db") > F.col("da"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("da"), F.col("nsh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("db"), F.col("nsh").alias("nb"))
    truth = (
        inter.join(na, "da").join(nb, "db")
        .filter(
            2 * F.col("inter")
            >= F.col("na") + F.col("nb") - F.col("inter")
        )
        .select("da", "db")
    )
    truth = truth.cache()  # consumed by the hit join AND the count
    aggs = [
        F.min(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("s"))), 1, 15),
                16, 10,
            ).cast("bigint")
        ).alias(f"m{i}")
        for i in range(8)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    # stack(), not a 4-way union: union branches get no CSE, so the
    # signature build would recompute once per band
    bands = sig.selectExpr(
        "doc_id",
        "stack(4, 0, m0, m1, 1, m2, m3, 2, m4, m5, 3, m6, m7)"
        " AS (band, v1, v2)",
    )
    bands = bands.cache()  # consumed as both sides of the band join
    ba = bands.select(F.col("doc_id").alias("da"), "band", "v1", "v2")
    bb = bands.select(F.col("doc_id").alias("db"), "band", "v1", "v2")
    cand = (
        ba.join(bb, ["band", "v1", "v2"])
        .filter(F.col("db") > F.col("da"))
        .select("da", "db")
        .distinct()
    )
    cand = cand.cache()  # consumed by the hit join AND the count
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    n_hit = truth.join(cand, ["da", "db"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    return (
        n_truth.join(F.broadcast(n_cand)).join(F.broadcast(n_hit))
        .select(
            F.col("n_truth").alias("n_true_pairs"),
            F.col("n_cand").alias("n_candidates"),
            F.col("n_hit").alias("n_hits"),
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit").cast("double") / F.col("n_cand"),
                ), 6
            ).alias("precision"),
            F.round(
                F.when(
                    F.col("n_truth") > 0,
                    F.col("n_hit").cast("double") / F.col("n_truth"),
                ), 6
            ).alias("recall"),
        )
    )


# -- txt_burrows_delta -------------------------------------------------
#
# Burrows' Delta stylometry (Burrows 2002): z-score each source's
# relative frequency of the corpus's TOP-30 words (deterministic
# count-then-word tiebreak) against the across-source mean/std, and
# report each source's Delta = mean |z| — the distance-from-house-
# style measure behind authorship attribution and style-drift
# monitoring (txt_source_signature finds WHICH words distinguish a
# source; Delta scores HOW FAR the whole profile sits). Frequencies
# are exact-count ratios; across-source folds round to
# DECIMAL(28,9). Scale: one token explode → 30-word × |sources|
# grids → |sources| rows.

BURROWS_SQL = """
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
  WHERE length(text) > 0
), wc AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM words
  GROUP BY 1, 2
), stot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM wc GROUP BY 1
), top AS (
  SELECT w FROM (
    SELECT w, SUM(c) AS tc FROM wc GROUP BY 1
    ORDER BY tc DESC, w LIMIT 30)
), f AS (
  SELECT st.source, t.w,
         COALESCE(wc.c, 0) / CAST(st.tot AS DOUBLE) AS fr
  FROM stot st CROSS JOIN top t
  LEFT JOIN wc ON wc.source = st.source AND wc.w = t.w
), wstat AS (
  SELECT w,
         CAST(SUM(CAST(round(fr, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS mu,
         CAST(SUM(CAST(round(fr * fr, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS m2,
         CAST(COUNT(*) AS BIGINT) AS ns
  FROM f GROUP BY 1
), z AS (
  SELECT f.source, f.w,
         abs(f.fr - ws.mu) / sqrt(ws.m2 - ws.mu * ws.mu) AS az
  FROM f JOIN wstat ws ON ws.w = f.w
  WHERE ws.m2 - ws.mu * ws.mu > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       round(CAST(SUM(CAST(round(az, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / COUNT(*), 6) AS burrows_delta
FROM z GROUP BY 1
ORDER BY source
"""


@query("txt_burrows_delta", oracle=BURROWS_SQL)
def txt_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    words = d.filter(F.length("text") > 0).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = wc.cache()  # consumed by stot, top AND the frequency grid
    stot = wc.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot"))
    top = (
        wc.groupBy("w").agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), F.asc("w"))
        .limit(30)
        .select("w")
    )
    f = (
        stot.crossJoin(F.broadcast(top))
        .join(wc, ["source", "w"], "left")
        .select(
            "source", "w",
            (
                F.coalesce(F.col("c"), F.lit(0))
                / F.col("tot").cast("double")
            ).alias("fr"),
        )
    )
    f = f.cache()  # consumed by wstat AND z
    wstat = f.groupBy("w").agg(
        (
            F.sum(F.round("fr", 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        (
            F.sum(F.round(F.col("fr") * F.col("fr"), 9)
                  .cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    var = F.col("m2") - F.col("mu") * F.col("mu")
    z = (
        f.join(F.broadcast(wstat), "w")
        .filter(var > 0)
        .select(
            "source",
            (F.abs(F.col("fr") - F.col("mu")) / F.sqrt(var)).alias("az"),
        )
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.round(
                F.sum(F.round("az", 9).cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)), 6
            ).alias("burrows_delta"),
        )
        .orderBy("source")
    )


# -- txt_rake_keywords -------------------------------------------------
#
# RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
# candidate phrases are maximal stopword-free token runs (capped at
# 4 tokens), word scores deg(w)/freq(w) are exact-count ratios where
# deg(w) sums the lengths of every candidate containing w, and a
# phrase scores the decimal-exact sum of its words' 9-rounded
# scores. Top-15 multiword phrases by (score, occurrences, phrase).
# The phrase-level keyword view next to txt_tfidf_keywords'
# single-word ranking and txt_collocations' PMI pairs. Determinism:
# phrase reassembly orders tokens by position (string_agg ORDER BY /
# sorted-struct array_join — never a bare collect_list). Scale:
# token explode → windows partitioned by doc_id → two grid-sized
# count aggs; no joins beyond the broadcast word-score table.

_RAKE_STOPS = "('the', 'a', 'of', 'and', 'in', 'to', 'is', '')"

RAKE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
  WHERE length(text) > 0
), tok AS (
  SELECT doc_id, generate_subscripts(tk, 1) AS i, unnest(tk) AS w
  FROM t
), mk AS (
  SELECT doc_id, i, w,
         CASE WHEN w IN {_RAKE_STOPS} THEN 1 ELSE 0 END AS stp
  FROM tok
), ph AS (
  SELECT doc_id, i, w, stp,
         SUM(stp) OVER (PARTITION BY doc_id ORDER BY i) AS pid
  FROM mk
), cand AS (
  SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len,
         string_agg(w, ' ' ORDER BY i) AS phrase
  FROM ph WHERE stp = 0 GROUP BY 1, 2
  HAVING COUNT(*) <= 4
), cw AS (
  SELECT p.doc_id, p.pid, p.w, c.len, c.phrase
  FROM ph p JOIN cand c ON c.doc_id = p.doc_id AND c.pid = p.pid
  WHERE p.stp = 0
), ws AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(len) AS BIGINT) AS deg
  FROM cw GROUP BY 1
), inst AS (
  SELECT cw.doc_id, cw.pid, cw.phrase, cw.len,
         CAST(SUM(CAST(round(CAST(ws.deg AS DOUBLE) / ws.freq, 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS score
  FROM cw JOIN ws ON ws.w = cw.w
  GROUP BY 1, 2, 3, 4
)
SELECT phrase, CAST(MIN(len) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       round(MIN(score), 6) AS rake_score
FROM inst WHERE len >= 2
GROUP BY 1
ORDER BY rake_score DESC, n_occ DESC, phrase
LIMIT 15
"""


@query("txt_rake_keywords", oracle=RAKE_SQL)
def txt_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents.filter(F.length("text") > 0)
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " "))
    ).select("doc_id", (F.col("pos") + 1).alias("i"), F.col("col").alias("w"))
    stops = ["the", "a", "of", "and", "in", "to", "is", ""]
    mk = tok.select(
        "doc_id", "i", "w",
        F.when(F.col("w").isin(stops), 1).otherwise(0).alias("stp"),
    )
    ph = mk.select(
        "doc_id", "i", "w", "stp",
        F.sum("stp").over(
            Window.partitionBy("doc_id").orderBy("i")
        ).alias("pid"),
    )
    ph = ph.cache()  # consumed by cand AND the candidate-word join
    cand = (
        ph.filter(F.col("stp") == 0)
        .groupBy("doc_id", "pid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("len"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s.w,
                ),
                " ",
            ).alias("phrase"),
        )
        .filter(F.col("len") <= 4)
    )
    cw = (
        ph.filter(F.col("stp") == 0)
        .select("doc_id", "pid", "w")
        .join(cand, ["doc_id", "pid"])
    )
    cw = cw.cache()  # consumed by the word-score table AND the instance scores
    ws = cw.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("len").cast("bigint").alias("deg"),
    )
    inst = (
        cw.join(F.broadcast(ws), "w")
        .groupBy("doc_id", "pid", "phrase", "len")
        .agg(
            F.sum(
                F.round(F.col("deg").cast("double") / F.col("freq"), 9)
                .cast("decimal(28,9)")
            ).cast("double").alias("score")
        )
    )
    return (
        inst.filter(F.col("len") >= 2)
        .groupBy("phrase")
        .agg(
            F.min("len").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.round(F.min("score"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.desc("n_occ"), "phrase")
        .limit(15)
    )


# -- txt_source_overlap ------------------------------------------------
#
# Pairwise corpus-overlap matrix: each source's top-50 trigram set
# (count desc, gram tie-break) intersected with every other
# source's — Jaccard |A∩B|/|A∪B| over the fixed-size signature
# sets. The corpus-DIVERSITY diagnostic for mixture planning
# (txt_mixture_plan weights sources; this says which sources are
# near-duplicates of each other at the phrase level, where
# txt_js_divergence compares unigram distributions). Determinism:
# top-50 via row_number with full tie-break; set sizes are exactly
# 50 so the union is 100 − |∩|. Scale: one trigram explode →
# per-source count grids → a 50×|sources| signature table that
# self-joins on gram (250 rows total — trivial).

OVERLAP_SQL = """
WITH t AS (
  SELECT source, string_split(text, ' ') AS tk FROM documents
  WHERE length(text) > 0
), tri AS (
  SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source,
           unnest(list_transform(range(1, len(tk) - 1),
                  i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
    FROM t WHERE len(tk) > 2
  ) GROUP BY 1, 2
), top AS (
  SELECT source, g FROM (
    SELECT source, g,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY c DESC, g) AS rk
    FROM tri
  ) WHERE rk <= 50
), inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM top a JOIN top b ON b.g = a.g AND a.source < b.source
  GROUP BY 1, 2
), pairs AS (
  SELECT x.source AS s1, y.source AS s2
  FROM (SELECT DISTINCT source FROM top) x
  JOIN (SELECT DISTINCT source FROM top) y ON x.source < y.source
)
SELECT p.s1, p.s2, COALESCE(i.n_inter, 0) AS n_inter,
       round(COALESCE(i.n_inter, 0)
             / (100.0 - COALESCE(i.n_inter, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN inter i ON i.s1 = p.s1 AND i.s2 = p.s2
ORDER BY p.s1, p.s2
"""


@query("txt_source_overlap", oracle=OVERLAP_SQL)
def txt_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents.filter(F.length("text") > 0)
    tk = d.select("source", F.split("text", " ").alias("tk")).filter(
        F.size("tk") > 2
    )
    tri = (
        tk.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("tk"), i + 1),
                        F.element_at(F.col("tk"), i + 2),
                        F.element_at(F.col("tk"), i + 3),
                    ),
                )
            ).alias("g"),
        )
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    top = (
        tri.select(
            "source", "g",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("c"), "g")
            ).alias("rk"),
        )
        .filter(F.col("rk") <= 50)
        .select("source", "g")
    )
    top = top.cache()  # both self-join sides AND the source list
    a = top.select(F.col("source").alias("s1"), "g")
    b = top.select(F.col("source").alias("s2"), F.col("g").alias("g2"))
    inter = (
        a.join(b, (F.col("g2") == F.col("g")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    srcs = top.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .join(
            srcs.select(F.col("source").alias("s2")),
            F.col("s1") < F.col("s2"),
        )
    )
    return (
        pairs.join(F.broadcast(inter), ["s1", "s2"], "left")
        .select(
            "s1", "s2",
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("n_inter"),
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / (100.0 - F.coalesce("n_inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


# -- txt_segment_ttr ---------------------------------------------------
#
# Segmented type-token ratio (TTR over fixed 50-token windows,
# averaged per source — the segment-based cousin of MATTR): the
# lexical-diversity quality signal that raw TTR can't give because
# TTR falls mechanically with document length (Heaps' law,
# txt_heaps_law), while fixed-width segments are comparable across
# documents and sources. Low-diversity segments (< 0.5) mark
# template/boilerplate-heavy text for the curation gates. Exact
# integer type/token counts per segment, 9-rounded decimal fold for
# the source mean. Scale: the token explode is map-side; the
# (doc, segment) groupBy rides the natural doc_id shuffle; the
# source rollup touches |sources| rows.

SEG_TTR_SQL = """
WITH toks AS (
  SELECT doc_id, source, generate_subscripts(tk, 1) AS pos, unnest(tk) AS term
  FROM (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents)
), seg AS (
  SELECT doc_id, source, CAST((pos - 1) // 50 AS BIGINT) AS seg,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS types,
         CAST(COUNT(*) AS BIGINT) AS toks
  FROM toks GROUP BY 1, 2, 3
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       round(CAST(SUM(CAST(round(CAST(types AS DOUBLE) / toks, 9)
                      AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
         AS mean_seg_ttr,
       round(CAST(SUM(CASE WHEN CAST(types AS DOUBLE) / toks < 0.5
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS low_diversity_share
FROM seg
GROUP BY 1
ORDER BY 1
"""


@query("txt_segment_ttr", oracle=SEG_TTR_SQL)
def txt_segment_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "doc_id", "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "term"),
    )
    seg = toks.groupBy(
        "doc_id", "source", F.floor(F.col("pos0") / 50).cast("bigint").alias("seg")
    ).agg(
        F.countDistinct("term").cast("bigint").alias("types"),
        F.count(F.lit(1)).cast("bigint").alias("toks"),
    )
    ttr = F.col("types").cast("double") / F.col("toks")
    return (
        seg.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
            F.round(
                F.sum(F.round(ttr, 9).cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_seg_ttr"),
            F.round(
                F.sum(F.when(ttr < 0.5, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("low_diversity_share"),
        )
        .orderBy("source")
    )


# -- txt_boilerplate_affixes -------------------------------------------
#
# Header/footer boilerplate detection: the top-10 most-shared
# 3-token document PREFIXES and SUFFIXES across the corpus (distinct
# doc counts + corpus share) — the affix-level curation diagnostic
# that catches templated openings/closings dedup_spans (interior
# spans) and txt_template_detect (whole-doc shape) miss. A 100 TB
# pipeline runs this before stripping: the top shared affixes ARE
# the strip list. Exact integer doc counts; ties broken by affix
# text; per-kind top-10 via one rank over the affix grid. Scale:
# map-side slice of each doc's token array (no explode), groupBy on
# the bounded affix space, rank on the aggregated grid only.

AFFIX_SQL = """
WITH docs3 AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), affixes AS (
  SELECT 'prefix' AS kind, array_to_string(tk[1:3], ' ') AS affix, doc_id
  FROM docs3
  UNION ALL
  SELECT 'suffix', array_to_string(tk[-3:], ' '), doc_id FROM docs3
), grp AS (
  SELECT kind, affix, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM affixes GROUP BY 1, 2
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs3
), rk AS (
  SELECT kind, affix, n_docs,
         ROW_NUMBER() OVER (PARTITION BY kind
                            ORDER BY n_docs DESC, affix) AS r
  FROM grp
)
SELECT kind, affix, n_docs,
       round(CAST(n_docs AS DOUBLE) / (SELECT n FROM tot), 6) AS doc_share
FROM rk WHERE r <= 10
ORDER BY kind, n_docs DESC, affix
"""


@query("txt_boilerplate_affixes", oracle=AFFIX_SQL)
def txt_boilerplate_affixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents
    tk = F.split("text", " ")
    docs3 = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 3)
    docs3 = docs3.cache()  # feeds both affix scans AND the total count
    prefix = docs3.select(
        F.lit("prefix").alias("kind"),
        F.array_join(F.slice("tk", 1, 3), " ").alias("affix"),
        "doc_id",
    )
    suffix = docs3.select(
        F.lit("suffix").alias("kind"),
        F.array_join(F.slice("tk", -3, 3), " ").alias("affix"),
        "doc_id",
    )
    grp = (
        prefix.unionAll(suffix)
        .groupBy("kind", "affix")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    )
    tot = docs3.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("kind").orderBy(F.desc("n_docs"), "affix")
    return (
        grp.select("*", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 10)
        .crossJoin(F.broadcast(tot))
        .select(
            "kind", "affix", "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias(
                "doc_share"
            ),
        )
        .orderBy("kind", F.desc("n_docs"), "affix")
    )


# -- txt_chao1_richness ------------------------------------------------
#
# Chao1 unseen-vocabulary estimator per source (Chao 1984, the
# abundance-based richness bound ecologists and corpus linguists
# share): chao1 = V + F1(F1-1)/(2(F2+1)) from the singleton/doubleton
# counts, plus Good-Turing sample coverage C = 1 - F1/N and the
# implied unseen-vocabulary share — "how much vocabulary has this
# source NOT shown us yet", the curation question txt_heaps_law
# (growth-curve fit) and txt_zipf (rank law) frame differently and
# q_capture_recapture answers for entity overlap. Exact integer
# term-frequency histogram folds; one identical double chain after.
# Scale: token explode rides map-side; term counts shuffle once on
# (source, term); the F-histogram is |sources| x small.

CHAO1_SQL = """
WITH tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY 1, 2
), hist AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM tf GROUP BY 1
)
SELECT source, n_tokens, vocab, f1, f2,
       round(vocab + f1 * (f1 - 1.0) / (2.0 * (f2 + 1)), 2) AS chao1,
       round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS gt_coverage,
       round(1.0 - vocab / (vocab + f1 * (f1 - 1.0) / (2.0 * (f2 + 1))), 6)
         AS unseen_share
FROM hist WHERE n_tokens > 0
ORDER BY source
"""


@query("txt_chao1_richness", oracle=CHAO1_SQL)
def txt_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hist = tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias(
            "f1"
        ),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias(
            "f2"
        ),
    )
    v, f1, f2 = F.col("vocab"), F.col("f1"), F.col("f2")
    chao1 = v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1))
    return (
        hist.filter(F.col("n_tokens") > 0)
        .select(
            "source", "n_tokens", "vocab", "f1", "f2",
            F.round(chao1, 2).alias("chao1"),
            F.round(
                1.0 - f1.cast("double") / F.col("n_tokens"), 6
            ).alias("gt_coverage"),
            F.round(1.0 - v / chao1, 6).alias("unseen_share"),
        )
        .orderBy("source")
    )


# -- txt_log_odds ------------------------------------------------------
#
# Monroe/Colaresi/Quinn "fightin' words" (2008): log-odds-ratio of
# word use between the two largest sources with an informative
# Dirichlet prior drawn from the pooled corpus (alpha0 = 500 spread
# proportionally to pooled frequency), z-scored by the delta's
# variance 1/(y1+a) + 1/(y2+a) — the statistically-grounded
# which-words-distinguish-these-corpora tool (txt_js_divergence
# gives one number; txt_tfidf_keywords has no variance model; this
# ranks WORDS with uncertainty). Top-10 each direction by 6-rounded
# z (term tie-break). Counts are exact integers; the prior/z chain
# is one identical double expression. Scale: token explode -> one
# (source, term) shuffle; the z ranking runs on the vocab grid.

LOG_ODDS_ALPHA0 = 500.0

LOG_ODDS_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), top2 AS MATERIALIZED (
  SELECT source, r FROM (
    SELECT source, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS r
    FROM toks GROUP BY 1
  ) WHERE r <= 2
), tf AS MATERIALIZED (
  SELECT t2.r, term, CAST(COUNT(*) AS BIGINT) AS y
  FROM toks JOIN top2 t2 ON t2.source = toks.source
  GROUP BY 1, 2
), pool AS MATERIALIZED (
  SELECT term, CAST(SUM(y) AS BIGINT) AS yp FROM tf GROUP BY 1
), npool AS (SELECT CAST(SUM(yp) AS BIGINT) AS np FROM pool),
n12 AS (
  SELECT
    CAST((SELECT SUM(y) FROM tf WHERE r = 1) AS BIGINT) AS n1,
    CAST((SELECT SUM(y) FROM tf WHERE r = 2) AS BIGINT) AS n2
), z AS (
  SELECT p.term,
         COALESCE(t1.y, 0) AS y1, COALESCE(t2.y, 0) AS y2,
         round(
           (ln((COALESCE(t1.y, 0) + a.aw)
               / (n.n1 + {LOG_ODDS_ALPHA0} - COALESCE(t1.y, 0) - a.aw))
            - ln((COALESCE(t2.y, 0) + a.aw)
                 / (n.n2 + {LOG_ODDS_ALPHA0} - COALESCE(t2.y, 0) - a.aw)))
           / sqrt(1.0 / (COALESCE(t1.y, 0) + a.aw)
                  + 1.0 / (COALESCE(t2.y, 0) + a.aw)), 6) AS zscore
  FROM pool p
  CROSS JOIN n12 n
  JOIN (SELECT term,
               {LOG_ODDS_ALPHA0} * yp / (SELECT np FROM npool) AS aw
        FROM pool) a ON a.term = p.term
  LEFT JOIN tf t1 ON t1.term = p.term AND t1.r = 1
  LEFT JOIN tf t2 ON t2.term = p.term AND t2.r = 2
), ranked AS (
  SELECT term, y1, y2, zscore,
         ROW_NUMBER() OVER (ORDER BY zscore DESC, term) AS r_hi,
         ROW_NUMBER() OVER (ORDER BY zscore ASC, term) AS r_lo
  FROM z
)
SELECT term, y1, y2, zscore,
       CASE WHEN r_hi <= 10 THEN 1 ELSE 2 END AS distinctive_of,
       CAST(CASE WHEN r_hi <= 10 THEN r_hi ELSE r_lo END AS BIGINT) AS rank
FROM ranked WHERE r_hi <= 10 OR r_lo <= 10
ORDER BY distinctive_of, rank
"""


@query("txt_log_odds", oracle=LOG_ODDS_SQL)
def txt_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents
    toks = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    toks = toks.cache()  # feeds the top-2 pick AND the per-source counts
    top2 = (
        toks.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "source"))
            .alias("r"),
        )
        .filter(F.col("r") <= 2)
    )
    tf = (
        toks.join(F.broadcast(top2), "source")
        .groupBy("r", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    tf = tf.cache()  # feeds pool, n1/n2 AND both direction legs
    pool = tf.groupBy("term").agg(F.sum("y").cast("bigint").alias("yp"))
    npool = pool.agg(F.sum("yp").cast("bigint").alias("np"))
    n1 = tf.filter(F.col("r") == 1).agg(
        F.sum("y").cast("bigint").alias("n1")
    )
    n2 = tf.filter(F.col("r") == 2).agg(
        F.sum("y").cast("bigint").alias("n2")
    )
    t1 = tf.filter(F.col("r") == 1).select("term", F.col("y").alias("y1r"))
    t2 = tf.filter(F.col("r") == 2).select("term", F.col("y").alias("y2r"))
    a0 = LOG_ODDS_ALPHA0
    z = (
        pool.join(t1, "term", "left")
        .join(t2, "term", "left")
        .crossJoin(F.broadcast(npool))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "term",
            F.coalesce(F.col("y1r"), F.lit(0)).cast("bigint").alias("y1"),
            F.coalesce(F.col("y2r"), F.lit(0)).cast("bigint").alias("y2"),
            (a0 * F.col("yp") / F.col("np")).alias("aw"),
            "n1", "n2",
        )
    )
    y1, y2, aw = F.col("y1"), F.col("y2"), F.col("aw")
    delta = F.log((y1 + aw) / (F.col("n1") + a0 - y1 - aw)) - F.log(
        (y2 + aw) / (F.col("n2") + a0 - y2 - aw)
    )
    zscore = F.round(
        delta / F.sqrt(1.0 / (y1 + aw) + 1.0 / (y2 + aw)), 6
    )
    ranked = z.select(
        "term", "y1", "y2", zscore.alias("zscore")
    ).select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("zscore"), "term"))
        .alias("r_hi"),
        F.row_number().over(Window.orderBy("zscore", "term")).alias("r_lo"),
    )
    return (
        ranked.filter((F.col("r_hi") <= 10) | (F.col("r_lo") <= 10))
        .select(
            "term", "y1", "y2", "zscore",
            F.when(F.col("r_hi") <= 10, 1).otherwise(2).alias(
                "distinctive_of"
            ),
            F.when(F.col("r_hi") <= 10, F.col("r_hi"))
            .otherwise(F.col("r_lo"))
            .cast("bigint")
            .alias("rank"),
        )
        .orderBy("distinctive_of", "rank")
    )


# -- txt_textrank ------------------------------------------------------
#
# TextRank keyword extraction (Mihalcea & Tarau 2004): adjacent-token
# co-occurrence edges over the ≤200-word vocabulary (length ≥ 4,
# top-by-count with word tie-break), symmetrized and out-strength-
# normalized, then FIVE unrolled damped PageRank rounds (d = 0.85)
# over the word graph — the graph-based keyworder beside txt_rake /
# txt_tfidf_keywords's frequency-based ones. Determinism: per-round
# contributions fold as 9-rounded DECIMAL(28,9) sums; dangling mass is
# dropped identically on both engines; ranks tie-break on word. Scale:
# one corpus scan for unigrams + one for bigrams; every round is a
# join on the bounded vocab-edge grid (localCheckpoint per round pins
# plan depth — the mr_pagerank discipline; oracle rounds are
# MATERIALIZED for the same reason).

_TR_D = "0.85"
_TR_ROUNDS = 5


def _textrank_sql() -> str:
    rounds = []
    for r in range(1, _TR_ROUNDS + 1):
        prev = "s0" if r == 1 else f"s{r - 1}"
        rounds.append(f"""s{r} AS MATERIALIZED (
  SELECT v.w, (1.0 - {_TR_D}) / n.nv + {_TR_D} * COALESCE(con.c, 0.0) AS s
  FROM vocab v CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst AS w,
           CAST(SUM(CAST(round(e.p * s.s, 9) AS DECIMAL(28,9)))
                AS DOUBLE) AS c
    FROM edges e JOIN {prev} s ON e.src = s.w GROUP BY 1) con
    ON v.w = con.w
)""")
    return f"""
WITH t AS MATERIALIZED (
  SELECT string_split(text, ' ') AS tk FROM documents
), uc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(tk) AS w FROM t) u GROUP BY 1
), vocab AS MATERIALIZED (
  SELECT w FROM uc WHERE length(w) >= 4
  ORDER BY c DESC, w LIMIT 200
), bc AS MATERIALIZED (
  SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS c_xy
  FROM (SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> [tk[i], tk[i + 1]])) AS pr
        FROM t WHERE len(tk) > 1) b
  JOIN vocab v1 ON pr[1] = v1.w
  JOIN vocab v2 ON pr[2] = v2.w
  WHERE pr[1] <> pr[2]
  GROUP BY 1, 2
), er AS (
  SELECT w1 AS src, w2 AS dst, c_xy AS c FROM bc
  UNION ALL
  SELECT w2 AS src, w1 AS dst, c_xy AS c FROM bc
), ew AS (
  SELECT src, dst, CAST(SUM(c) AS BIGINT) AS c FROM er GROUP BY 1, 2
), strength AS (
  SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM ew GROUP BY 1
), edges AS MATERIALIZED (
  SELECT e.src, e.dst, e.c / CAST(s.tot AS DOUBLE) AS p
  FROM ew e JOIN strength s ON e.src = s.src
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM vocab),
s0 AS (
  SELECT v.w, 1.0 / n.nv AS s FROM vocab v CROSS JOIN n
), {', '.join(rounds)}
SELECT w AS word, round(s, 6) AS score,
       CAST(ROW_NUMBER() OVER (ORDER BY s DESC, w) AS BIGINT) AS rank
FROM s{_TR_ROUNDS}
ORDER BY rank LIMIT 15
"""


@query("txt_textrank", oracle=_textrank_sql())
def txt_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(F.split("text", " ").alias("tk"))
    # one tokenize pass (r12): the vocab unigram count and the bigram
    # explode both consume t — uncached, each re-read the parquet text
    # column and re-split it (the entry's two heaviest scans)
    t = t.cache()
    uc = (
        t.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        uc.filter(F.length("w") >= 4)
        .orderBy(F.desc("c"), "w")
        .limit(200)
        .select("w")
    )
    vocab = vocab.cache()  # ≤200 rows: feeds both edge sides, N, rounds
    pairs = t.filter(F.size("tk") > 1).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS w1,"
                "             element_at(tk, i + 1) AS w2))"
            )
        ).alias("pr")
    )
    bc = (
        pairs.select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .filter(F.col("w1") != F.col("w2"))
        .join(F.broadcast(vocab.select(F.col("w").alias("w1"))), "w1")
        .join(F.broadcast(vocab.select(F.col("w").alias("w2"))), "w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    bc = bc.cache()  # consumed by BOTH union branches (no CSE across union)
    er = bc.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), F.col("c_xy")
    ).unionAll(
        bc.select(
            F.col("w2").alias("src"), F.col("w1").alias("dst"),
            F.col("c_xy"),
        )
    )
    ew = er.groupBy("src", "dst").agg(
        F.sum("c_xy").cast("bigint").alias("c")
    )
    strength = ew.groupBy("src").agg(F.sum("c").cast("bigint").alias("tot"))
    # broadcast the <=|vocab|-row strength side: without the hint the
    # checkpoint-backed sides have no size estimate and the join
    # reshuffles the edge grid (r11, guide §3.1)
    edges = ew.join(F.broadcast(strength), "src").select(
        "src", "dst", (F.col("c") / F.col("tot").cast("double")).alias("p")
    )
    # bounded grid (≤|vocab|² = 40k rows, SF-independent) reused every
    # round — materialized on ONE partition via coalesce(1) (NOT
    # repartition, which is itself an exchange): SinglePartition
    # satisfies each round's groupBy(dst) clustering requirement, so
    # the 5 rounds run as 1-task narrow stages with zero exchanges
    # (the mr_scc pattern; guide §2.3 tiny-shuffle task floor).
    # localCheckpoint returns UnknownPartitioning, so each round
    # re-asserts coalesce(1) below.
    edges = edges.coalesce(1).localCheckpoint()
    n = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    s = vocab.join(F.broadcast(n)).select(
        "w", (1.0 / F.col("nv")).alias("s")
    )
    d_lit = float(_TR_D)
    for _ in range(_TR_ROUNDS):
        con = (
            # broadcast the <=200-row rank vector so the checkpointed
            # edge grid is never reshuffled per round (r11, guide §3.1
            # — the mr_pagerank rule); coalesce(1) re-asserts the
            # SinglePartition the checkpoint dropped so the groupBy
            # below needs no exchange (r12)
            edges.coalesce(1).join(
                F.broadcast(s.select(F.col("w").alias("src"), "s")), "src"
            )
            .groupBy(F.col("dst").alias("w"))
            .agg(
                F.sum(F.round(F.col("p") * F.col("s"), 9).cast(
                    "decimal(28,9)"
                ))
                .cast("double")
                .alias("c")
            )
        )
        s = (
            vocab.join(F.broadcast(n))
            .join(F.broadcast(con), "w", "left")
            .select(
                "w",
                (
                    (1.0 - d_lit) / F.col("nv")
                    + d_lit * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("s"),
            )
            .localCheckpoint()  # pin plan depth per round (mr_pagerank rule)
        )
    return (
        s.select(
            F.col("w").alias("word"),
            F.round("s", 6).alias("score"),
            F.row_number()
            .over(Window.orderBy(F.desc("s"), "w"))
            .cast("bigint")
            .alias("rank"),
        )
        .orderBy("rank")
        .limit(15)
    )
