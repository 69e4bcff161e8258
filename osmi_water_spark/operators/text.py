"""Text-analysis operators for the training-data pipeline (graft
first-class components): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All JVM-side column expressions (no UDFs) so they run inside whole-stage
codegen over 100 TB text scans; every definition is chosen to be
expressible identically in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT = ".,!?;:"
EN_STOPWORDS = [" the ", " and ", " of "]
DE_STOPWORDS = [" der ", " und ", " die "]


def token_count(text: Column) -> Column:
    """Whitespace tokens (single-space convention of the corpus)."""
    return F.size(F.split(text, " ", -1)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_count(text: Column) -> Column:
    """Occurrences of . , ! ? ; : via the translate-diff trick (portable)."""
    return (F.length(text) - F.length(F.translate(text, PUNCT, ""))).cast("long")


def _occurrences(text: Column, needle: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    low = F.lower(text)
    out = F.lit(0).cast("double")
    for s in stopwords:
        out = out + _occurrences(low, s)
    return out.cast("long")


def quality_score(text: Column) -> Column:
    """Integer 0-100 heuristic: penalize punctuation-dense / stopword-free /
    very short documents. Deterministic integer arithmetic only."""
    toks = token_count(text)
    chars = char_count(text)
    punct = punct_count(text)
    stops = stopword_hits(text, EN_STOPWORDS)
    score = (
        F.lit(50)
        + F.least(F.lit(20), toks / 10)
        + F.least(F.lit(20), stops * 2)
        - F.least(F.lit(30), punct * 100 / F.greatest(chars, F.lit(1)))
    )
    return F.greatest(F.lit(0), F.least(F.lit(100), F.floor(score).cast("long")))


def lang_guess(text: Column) -> Column:
    """n-gram/stopword heuristic: en vs de vs unknown."""
    en = stopword_hits(text, EN_STOPWORDS)
    de = stopword_hits(text, DE_STOPWORDS)
    return (
        F.when((en == 0) & (de == 0), F.lit("unknown"))
        .when(de > en, F.lit("de"))
        .otherwise(F.lit("en"))
    )


def fingerprint(text: Column, length: int = 16) -> Column:
    """Normalized md5 prefix — the exact-dup document fingerprint."""
    return F.substring(F.md5(F.lower(F.trim(text))), 1, length)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars"),
        punct_count(t).alias("n_punct"),
        stopword_hits(t, EN_STOPWORDS).alias("en_stopwords"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )
