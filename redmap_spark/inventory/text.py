"""SURVEY §2.E — text analysis inventory entries (oracle-verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redmap_spark.catalog import Catalog
from redmap_spark.inventory.registry import query
from redmap_spark.operators import textstats as T

NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
STOPS_SQL = "('the', 'a', 'of', 'and', 'in', 'to', 'is')"

# -- txt_tokens --------------------------------------------------------

TXT_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens
FROM documents
"""


@query("txt_tokens", oracle=TXT_TOKENS_SQL)
def txt_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.ws_token_count("text").cast("long").alias("n_ws_tokens"),
        T.word_token_count("text").cast("long").alias("n_word_tokens"),
    )


# -- txt_quality -------------------------------------------------------

TXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text) AS punct_ratio,
       CAST(len(list_filter(string_split(text, ' '), x -> x IN {STOPS_SQL})) AS DOUBLE)
         / len(string_split(text, ' ')) AS stop_ratio,
       0.5 * least(1.0, len(string_split(text, ' ')) / 400.0)
         + 0.5 * (CAST(len(list_filter(string_split(text, ' '), x -> x IN {STOPS_SQL})) AS DOUBLE)
                  / len(string_split(text, ' '))) AS quality
FROM documents
"""


@query("txt_quality", oracle=TXT_QUALITY_SQL)
def txt_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.ws_token_count("text").cast("long").alias("n_tokens"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.stopword_ratio("text").alias("stop_ratio"),
        T.quality_score("text").alias("quality"),
    )


# -- txt_langid --------------------------------------------------------

def _hits_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"


_EN = _hits_sql(T.LANG_MARKERS["en"])
_ES = _hits_sql(T.LANG_MARKERS["es"])
_DE = _hits_sql(T.LANG_MARKERS["de"])

TXT_LANGID_SQL = f"""
SELECT doc_id,
       CASE WHEN {_EN} >= {_ES} AND {_EN} >= {_DE} AND {_EN} > 0 THEN 'en'
            WHEN {_ES} >= {_DE} AND {_ES} > 0 THEN 'es'
            WHEN {_DE} > 0 THEN 'de'
            ELSE 'und' END AS lang_pred,
       CAST({_EN} AS BIGINT) AS c_en,
       CAST({_ES} AS BIGINT) AS c_es,
       CAST({_DE} AS BIGINT) AS c_de
FROM documents
"""


@query("txt_langid", oracle=TXT_LANGID_SQL)
def txt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.langid("text").alias("lang_pred"),
        T.marker_hits("text", T.LANG_MARKERS["en"]).cast("long").alias("c_en"),
        T.marker_hits("text", T.LANG_MARKERS["es"]).cast("long").alias("c_es"),
        T.marker_hits("text", T.LANG_MARKERS["de"]).cast("long").alias("c_de"),
    )


# -- txt_fingerprint ---------------------------------------------------

TXT_FP_SQL = f"""
SELECT doc_id,
       md5({NORM}) AS fp,
       md5(substr({NORM}, 1, 64)) AS prefix_fp
FROM documents
"""


@query("txt_fingerprint", oracle=TXT_FP_SQL)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        T.prefix_fingerprint("text", 64).alias("prefix_fp"),
    )
