"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM codegen) so they run over 10^12-row
corpora without Python; each has an exact DuckDB-SQL twin in
``queries_engine`` built from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny language-ID stopword lists (n-gram heuristic: evidence-count ratio)
EN_STOPWORDS = ["the", "a", "of", "and", "to"]
ES_STOPWORDS = ["el", "la", "de", "que", "y"]


def _count_any(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def lang_id(text: Column) -> Column:
    """Heuristic language id: stopword-evidence votes, 'xx' when neither."""
    en = _count_any(text, EN_STOPWORDS)
    es = _count_any(text, ES_STOPWORDS)
    return (
        F.when((en > es) & (en > 0), F.lit("en"))
        .when((es > en) & (es > 0), F.lit("es"))
        .otherwise(F.lit("xx"))
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(F.split(text, r"\s+"))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite quality score in fixed-point (exact cross-engine):
    mean word length, stopword ratio, and length band, scaled to int."""
    words = F.split(text, " ")
    n_words = F.size(words)
    stop = _count_any(text, EN_STOPWORDS)
    # fixed-point components (x1000), all integer-exact
    mean_wlen_x1000 = F.floor(
        (F.length(text) - n_words + 1).cast("double") / n_words.cast("double") * 1000
    )
    stop_ratio_x1000 = F.floor(stop.cast("double") / n_words.cast("double") * 1000)
    len_band = F.when(n_chars < 100, 0).when(n_chars < 1000, 1).otherwise(2)
    return (mean_wlen_x1000 + stop_ratio_x1000 + len_band).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the first-letter stream of the word
    sequence (an order-sensitive, whitespace-robust content signature)."""
    firsts = F.transform(F.split(F.lower(text), " "), lambda w: F.substring(w, 1, 1))
    return F.md5(F.concat_ws("", firsts))
