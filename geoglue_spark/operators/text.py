"""Text analysis for training-data pipelines — all JVM-side where possible.

Token counting, quality scoring, language ID (stopword heuristic), and
document fingerprinting. Only language ID touches Python (set lookups per
token), Arrow-batched; everything else is built-in pyspark.sql.functions
inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword lists (public common words)
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "que", "por", "en"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "mit", "von"},
    "zh": {"的", "了", "和", "是", "在", "我", "有", "他", "这", "不"},
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND letter/digit
    boundaries (a cheap BPE proxy for budget estimation)."""
    trimmed = F.trim(text)
    pieces = F.split(trimmed, r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(pieces))


def quality_score_col(text: Column, n_chars: Column | None = None) -> Column:
    """Deterministic quality score in [0, 1]: length sweet-spot x
    mean-word-length sanity x non-repetitiveness proxy. SQL-expressible
    (same formula runs in the DuckDB oracle)."""
    n = token_count_col(text).cast("double")
    chars = (n_chars if n_chars is not None else F.length(text)).cast("double")
    mean_word = F.when(n > 0, chars / n).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n / F.lit(50.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    return F.round(len_score * word_score, 6)


def fingerprint_col(text: Column) -> Column:
    """64-bit content fingerprint of normalized text (xxhash, JVM-side)."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def lang_id_udf():
    """Heuristic language ID: argmax of stopword-hit fractions; 'und' when
    nothing matches. Vectorized per Arrow batch."""
    langs = sorted(STOPWORDS)
    sets = [STOPWORDS[l] for l in langs]

    @F.pandas_udf(T.StringType())
    def lid(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = (t or "").lower().split()
            if not toks:
                out.append("und")
                continue
            scores = [sum(tok in s for tok in toks) for s in sets]
            best = int(np.argmax(scores))
            out.append(langs[best] if scores[best] > 0 else "und")
        return pd.Series(out)

    return lid


def doc_stats(df: DataFrame, text_col: str = "text", by: list[str] = ("lang",)) -> DataFrame:
    """Per-group token/char/quality summary — one shuffle."""
    t = F.col(text_col)
    return (
        df.withColumn("_tokens", token_count_col(t))
        .withColumn("_quality", quality_score_col(t))
        .groupBy(*by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tokens").alias("total_tokens"),
            F.round(F.avg("_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("_quality"), 6).alias("avg_quality"),
        )
    )
