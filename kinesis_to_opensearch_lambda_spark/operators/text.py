"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure expression work over the tokenized array — per-row, zero
shuffle, engine-portable (md5-based hashes, explicit sequential folds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import rolling_hash, words

# Tiny English-marker stopword set present in the corpus vocabulary.
STOPWORDS: tuple[str, ...] = ("the", "a")


def _is_stop(w: Column) -> Column:
    out = F.lit(False)
    for s in STOPWORDS:
        out = out | (w == s)
    return out


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens / n_unique_tokens / avg_token_len / n_chars."""
    w = words(F.col(text_col))
    tok_len_sum = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        "*",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique_tokens"),
        (tok_len_sum.cast("double") / F.size(w).cast("double")).alias("avg_token_len"),
        F.length(text_col).alias("n_chars_len"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-score features: stopword ratio, long-token ratio, and a
    blended [0,1] score (formula mirrored in the oracle SQL)."""
    w = words(F.col(text_col))
    n = F.size(w).cast("double")
    stop_ratio = F.size(F.filter(w, _is_stop)).cast("double") / n
    long_ratio = F.size(F.filter(w, lambda t: F.length(t) > 4)).cast("double") / n
    score = (
        0.5 * (F.lit(1.0) - stop_ratio)
        + 0.3 * long_ratio
        + 0.2 * F.least(n / F.lit(200.0), F.lit(1.0))
    )
    return df.select(
        "*",
        stop_ratio.alias("stop_ratio"),
        long_ratio.alias("long_ratio"),
        score.alias("quality_score"),
    )


def langid_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language heuristic: docs whose stopword density
    exceeds 5% classify as 'en', else 'und'.  (A real n-gram profile
    model drops in behind the same column contract; the synthetic corpus
    shares one vocabulary across langs, so only the mechanism is
    exercised here.)"""
    w = words(F.col(text_col))
    frac = F.size(F.filter(w, _is_stop)).cast("double") / F.size(w).cast("double")
    return df.select(
        "*",
        F.when(frac > 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints:

    - ``fp_sorted``: md5 of the sorted distinct-token stream —
      word-order-insensitive exact-dedup key;
    - ``fp_rolling``: polynomial rolling hash (functions.rolling_hash) —
      order-sensitive streaming fingerprint.
    """
    w = words(F.col(text_col))
    return df.select(
        "*",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(w)))).alias("fp_sorted"),
        rolling_hash(w).alias("fp_rolling"),
    )
