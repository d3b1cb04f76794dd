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

from pyspark.sql import DataFrame, SparkSession
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
