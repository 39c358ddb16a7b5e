"""Text-analysis operators over a documents table.

Everything is built-in Catalyst expressions (regexp_count, length
arithmetic, when-chains) — no Python in the hot path. Each op is also
exposed as an oracle-checked query in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import rnd
from etl_weather_spark.functions.text import bpe_ish_token_count, token_count

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic; in production these
# would be a broadcast dimension table.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary regex, JVM-side)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def lang_scores(text: Column) -> list[Column]:
    return [stopword_hits(text, ws).alias(f"score_{lang}") for lang, ws in LANG_STOPWORDS.items()]


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all zero.

    Ties resolve by the fixed language order of LANG_STOPWORDS — a
    deterministic when-chain, reproducible in plain SQL.
    """
    scores = {lang: stopword_hits(text, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length, punctuation and stopword ratios.

    score = 0.4*min(tokens/100, 1) + 0.3*(1 - punct_ratio) +
            0.3*min(stopword_ratio*5, 1)
    — length rewards substance, punct_ratio penalizes symbol soup,
    stopword density separates prose from keyword lists.
    """
    ntok = token_count(text).cast("double")
    nchar = F.length(text).cast("double")
    npunct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double")
    nstop = stopword_hits(text, LANG_STOPWORDS["en"]).cast("double")
    punct_ratio = F.when(nchar > 0, npunct / nchar).otherwise(F.lit(0.0))
    stop_ratio = F.when(ntok > 0, nstop / ntok).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(ntok / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return rnd(score, 4)


def doc_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document text profile: tokens, BPE-ish tokens, lang, quality."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
    )
