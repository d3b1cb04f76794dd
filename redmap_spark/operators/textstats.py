"""Text-analysis operators over a document corpus (SURVEY §2.E).

All pure Column expressions — JVM-side, whole-stage-codegen'd; no
Python in the row loop. Each mirrors what a 100 TB training-data
pipeline runs per document: token counts, quality scores, language
ID, fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language, used by the n-gram-heuristic language
# ID. (Lists are tiny: the expression stays a broadcast-free IN.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "in", "to", "is")

WORD_RE = "[a-z]+"
PUNCT_RE = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def ws_token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column | str) -> Column:
    """BPE-ish regex token count (letter runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(WORD_RE))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PUNCT_RE)).cast("double") / F.length(c)


def marker_hits(text: Column | str, markers: tuple[str, ...]) -> Column:
    """# tokens that are in the marker list (array filter, JVM-side)."""
    return F.size(F.filter(tokens(text), lambda x: x.isin(*markers)))


def stopword_ratio(text: Column | str) -> Column:
    return marker_hits(text, STOPWORDS).cast("double") / ws_token_count(text)


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: length component + stopword
    component (the shape real corpus filters use, e.g. Gopher rules)."""
    length_part = F.least(F.lit(1.0), ws_token_count(text) / F.lit(400.0))
    return 0.5 * length_part + 0.5 * stopword_ratio(text)


def langid(text: Column | str) -> Column:
    """argmax over per-language marker hit counts; 'und' when no
    marker hits at all. Deterministic tiebreak: en > es > de."""
    c_en = marker_hits(text, LANG_MARKERS["en"])
    c_es = marker_hits(text, LANG_MARKERS["es"])
    c_de = marker_hits(text, LANG_MARKERS["de"])
    return (
        F.when((c_en >= c_es) & (c_en >= c_de) & (c_en > 0), "en")
        .when((c_es >= c_de) & (c_es > 0), "es")
        .when(c_de > 0, "de")
        .otherwise("und")
    )


def normalized(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def fingerprint(text: Column | str) -> Column:
    """md5 of the normalized text — the exact-dedup key."""
    return F.md5(normalized(text))


def prefix_fingerprint(text: Column | str, n_chars: int = 64) -> Column:
    """Rolling/prefix fingerprint: md5 of the first n normalized chars
    (cheap first-pass blocking key for near-dedup)."""
    return F.md5(F.substring(normalized(text), 1, n_chars))
