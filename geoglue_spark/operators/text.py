"""Text analysis for training-data pipelines — all JVM-side.

Token counting, quality scoring, language ID (stopword heuristic), and
document fingerprinting, every one a Column expression: nothing in this
module crosses into Python at execution time (the higher-order-function
lambdas run interpreted on the JVM, everything else in whole-stage
codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}<>/\\|@#$%^&*_+=~`-]"


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation (quality signal)."""
    n = F.length(text).cast("double")
    stripped = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column, langs: tuple[str, ...] = ("en",)) -> Column:
    """Fraction of whitespace tokens that are stopwords of the given
    languages — pure JVM array math (split -> filter -> size)."""
    words = sorted(set().union(*(STOPWORDS[l] for l in langs)))
    trimmed = F.trim(F.lower(text))
    toks = F.split(trimmed, r"\s+")
    # filter (not array_intersect): repeated stopword tokens must all count
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(
        trimmed == "", F.lit(0.0)
    ).otherwise(hits.cast("double") / F.size(toks))


def fingerprint_col(text: Column) -> Column:
    """64-bit content fingerprint of normalized text (xxhash, JVM-side)."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def winnow_fingerprints_col(
    text: Column, shingle_k: int = 5, window: int = 4
) -> Column:
    """Winnowing document fingerprints (rolling-hash selection, Schleimer
    et al., SIGMOD 2003): hash every word ``shingle_k``-gram, slide a
    ``window`` over the hash sequence, keep each window's minimum — the
    selected-value set is guaranteed to overlap between documents sharing
    long-enough substrings. Pure Column expression (md5-based shingle keys
    shared with MinHash, so the DuckDB oracle reproduces it exactly);
    output sorted-distinct array<long>.

    CSE WARNING: Catalyst does not common-subexpression-eliminate inside
    higher-order-function lambdas, so the key array recomputes every md5
    once PER WINDOW here. Use :func:`winnow_fingerprints` (which
    materializes the key array in a projection first) on anything bigger
    than a handful of rows."""
    from .dedup import shingle_key_col, word_shingles_col

    keys = F.transform(word_shingles_col(text, shingle_k), shingle_key_col)
    return _winnow_over_keys(keys, window)


def _winnow_over_keys(keys: Column, window: int) -> Column:
    n = F.size(keys)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(window - 1)))
    mins = F.transform(idx, lambda i: F.array_min(F.slice(keys, i, window)))
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    window: int = 4,
    out_col: str = "fingerprints",
    grouped: bool = True,
    carry: tuple = (),
    distinct: bool = True,
) -> DataFrame:
    """Winnowing fingerprints as a DataFrame op, scale-shaped: shingle keys
    posexplode to rows (md5 evaluated ONCE per shingle, whole-stage
    codegen), a bounded window computes each sliding minimum, collect_set
    re-assembles the per-document fingerprint set. Output:
    (id_col, out_col sorted-distinct array<long>).

    Why not a single-projection HOF slide: Catalyst project-collapsing
    inlines the key array into the per-window lambda and re-hashes every
    shingle once per window (~20x slower — the winnow_fingerprints_col
    caveat). A CollapseProject barrier (non-deterministic column in the
    keys projection) makes that narrow form 12x faster in ISOLATION, but
    the barrier does not survive composed plans — a downstream explode
    re-inlines the whole expression and turns the query quadratic
    (measured: the fingerprint-stats query went from seconds to a hang).
    The window form costs one doc-keyed shuffle and stays robust under
    ANY caller plan shape, which is the property a library must keep.

    ``grouped=False`` (the J8 fusion pattern): skip the collect_set
    re-assembly and return one row per DISTINCT (id, fingerprint) —
    semantically ``explode(fingerprints)`` of the grouped form without
    the collect_set shuffle + array explode round trip. Any downstream
    aggregate over fingerprint ROWS (per-source distinct counts, reuse
    ratios, index builds) should take this form. ``carry`` passes extra
    input columns through (e.g. ``source``), saving a re-join against
    the source table at fact scale."""
    from pyspark.sql import Window as W

    from .dedup import shingle_key_col, word_shingles_col

    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(word_shingles_col(F.col(text_col), shingle_k)).alias(
            "_pos", "_g"
        ),
    ).select(id_col, *carry, "_pos", shingle_key_col(F.col("_g")).alias("_x"))
    w = (
        W.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    wn = W.partitionBy(id_col)
    mins = (
        ex.withColumn("_wmin", F.min("_x").over(w))
        .withColumn("_n", F.count("*").over(wn))
        # valid window starts only (a short doc keeps its whole-array min)
        .filter(F.col("_pos") <= F.greatest(F.lit(0), F.col("_n") - window))
    )
    if not grouped:
        out = mins.select(id_col, *carry, F.col("_wmin").alias(out_col))
        # distinct=False hands BACK the raw window minima (repeats and
        # all) for callers whose downstream aggregate dedups anyway —
        # count_distinct partial-aggregates map-side, so skipping the
        # eager distinct removes one full-width shuffle from the plan
        return out.distinct() if distinct else out
    return mins.groupBy(id_col, *carry).agg(
        F.array_sort(F.collect_set("_wmin")).alias(out_col)
    )


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID as a pure Column expression (r4 verdict #4:
    the former pandas-UDF version looped over rows in Python — the
    slowest kernel per byte at 100 TB of text): per-language stopword-hit
    counts via split -> filter(isin) -> size, then a first-max argmax
    over the sorted language list; 'und' when nothing matches. Repeated
    stopword tokens all count (filter, not array_intersect), matching the
    DuckDB oracle restatement token for token. All JVM-side — the lambda
    runs interpreted but inside the executor, never Python."""
    langs = sorted(STOPWORDS)
    toks = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")
    def _hits(words: tuple[str, ...]) -> Column:
        # single-parameter lambda: F.filter passes the element index to a
        # second parameter, so the vocab must close over, not default-arg
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [_hits(tuple(sorted(STOPWORDS[l]))) for l in langs]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    pred = F.when(best == 0, F.lit("und"))
    for lang, s in zip(langs, scores):
        pred = pred.when(s == best, F.lit(lang))
    return pred


def lang_id_udf():
    """Back-compat shim: language ID is now a Column expression — returns
    the callable so existing ``lang_id_udf()(col)`` call sites keep
    working with zero Python in the plan."""
    return lang_id_col


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
