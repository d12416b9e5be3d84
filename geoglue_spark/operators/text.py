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
    """Whitespace token count; 0 for empty/blank/NULL strings (without the
    coalesce, size(split(NULL)) is -1 under non-ANSI defaults — negative
    token counts would corrupt quality scores and packing prefix sums)."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND letter/digit
    boundaries (a cheap BPE proxy for budget estimation)."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
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
    trimmed = F.trim(F.lower(F.coalesce(text, F.lit(""))))
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

    # Hash-repartition the RAW documents by id before exploding: the
    # per-doc window requires HashPartitioning(id) anyway, so this moves
    # the one unavoidable exchange from AFTER the shingle explode (rows
    # amplified ~tokens-per-doc times, ~25 B each) to BEFORE it (one raw
    # text row per doc) — less shuffle volume at every scale — and it
    # spreads the md5 shingle hashing across the cluster even when the
    # input is a handful of fat files (a single-file scan otherwise runs
    # the whole explode+hash map-side in ONE task). The partition count
    # is EXPLICIT: byte-sized documents explode into CPU-heavy shingle
    # hashing, and AQE's size-based coalescing would collapse the small
    # exchange to one partition (measured: the whole window stage ran
    # single-task behind a ~1 MB shuffle).
    ex = (
        df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.posexplode(word_shingles_col(F.col(text_col), shingle_k)).alias(
                "_pos", "_g"
            ),
        )
        .select(id_col, *carry, "_pos", shingle_key_col(F.col("_g")).alias("_x"))
    )
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


def dup_line_frac_col(text: Column) -> Column:
    """Fraction of non-blank lines that are duplicates of an earlier line
    (Gopher repetition rule family, Rae et al. 2021 §A1.1): 1 −
    distinct/total over trimmed non-empty lines. Pure JVM array math;
    0.0 for docs with no non-blank lines."""
    lines = F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n = F.size(lines).cast("double")
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))) / n
    ).otherwise(F.lit(0.0))


def dup_line_char_frac_col(text: Column) -> Column:
    """Fraction of CHARACTERS sitting in duplicated non-blank lines (the
    char-weighted Gopher variant — boilerplate lines are often long, so
    char weighting catches what line counting misses). Per-line occurrence
    counts via a bounded O(L²) higher-order filter — L is lines-per-doc
    (tens), so the work per document is constant-bounded and never
    shuffles; all JVM-side."""
    lines = F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    total = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    ).cast("double")
    dup_chars = F.aggregate(
        F.filter(
            lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1
        ),
        F.lit(0),
        lambda acc, l: acc + F.length(l),
    ).cast("double")
    return F.when(total > 0, dup_chars / total).otherwise(F.lit(0.0))


def top_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    carry: tuple = (),
) -> DataFrame:
    """Per-document most-frequent word n-gram and the fraction of
    characters it covers (Gopher 'top n-gram fraction' rule): explode
    n-grams to rows, two-level aggregate — (doc, gram) counts partial-
    aggregate map-side, then a per-doc max_by picks the mode. Scale shape:
    two doc-keyed shuffles, no per-doc quadratic work, no Python — the
    form that survives million-token documents where a per-row
    higher-order mode scan would be O(tokens²).

    Output: (id_col, *carry, top_ngram, top_ngram_count,
    top_ngram_char_frac). Ties break to the lexicographically smallest
    gram so results are deterministic under any partitioning."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(
        (F.trim(F.col(text_col)) == "") | (F.size(toks) < n), F.array()
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    # explode_outer, NOT explode: a doc with < n tokens (or empty/NULL
    # text) must survive as a zero-fraction row — the curation-gate
    # pattern `join(stats.filter(frac < t), left_semi)` would otherwise
    # silently DROP short documents from the corpus. (contamination_
    # overlap made the same choice; the retention contracts now agree.)
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.length(F.col(text_col)).alias("_chars"),
        F.explode_outer(grams).alias("_g"),
    )
    counts = ex.groupBy(id_col, *carry, "_chars", "_g").agg(
        F.count("*").alias("_cnt")
    )
    # "count desc, gram asc" mode over the COMPACTED (doc, gram) rows:
    # one row_number window keyed by doc. Partition size = distinct grams
    # per doc (already collapsed by the map-side-combining count), so the
    # window never sees raw token volume even for mega-documents.
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("_cnt").desc(), F.col("_g").asc())
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return top.select(
        id_col,
        *carry,
        F.col("_g").alias("top_ngram"),
        F.when(F.col("_g").isNull(), F.lit(0))
        .otherwise(F.col("_cnt"))
        .cast("long")
        .alias("top_ngram_count"),
        F.round(
            F.when(
                F.col("_g").isNotNull() & (F.col("_chars") > 0),
                F.col("_cnt") * F.length("_g") / F.col("_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_ngram_char_frac"),
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    broadcast_benchmark: bool = True,
    carry: tuple = (),
) -> DataFrame:
    """Benchmark-contamination check: for every training document, how
    many of its word ``n``-grams also appear in the benchmark/eval set
    (the standard 13-gram decontamination rule, GPT-3 appendix C /
    Dolma). Grams are xxhash64'd JVM-side, the benchmark's distinct gram
    hashes become the build side of ONE equi-join (broadcast by default —
    eval sets are tiny next to a training corpus), and a single left-join
    + groupBy emits per-doc totals: no all-pairs text comparison, shuffle
    volume tracks distinct (doc, gram) rows only.

    Output: (id_col, *carry, n_grams, n_overlap, contaminated_frac).
    Documents shorter than ``n`` tokens have n_grams = 0 and frac 0.0.
    """
    def gram_hashes(text: Column) -> Column:
        toks = F.split(F.trim(F.lower(text)), r"\s+")
        return F.when(
            (F.trim(text) == "") | (F.size(toks) < n), F.array()
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
            )
        )

    bench = (
        benchmark.select(
            F.explode(gram_hashes(F.col(bench_text_col))).alias("_h")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # outer explode keeps gram-less docs (explode_outer emits one NULL row)
    ex = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode_outer(
            F.array_distinct(gram_hashes(F.col(text_col)))
        ).alias("_h"),
    )
    joined = ex.join(bench, "_h", "left")
    out = joined.groupBy(id_col, *carry).agg(
        F.count("_h").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap"),
    )
    return out.select(
        id_col,
        *carry,
        "n_grams",
        "n_overlap",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_overlap") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contaminated_frac"),
    )


# PII patterns (public regex shapes; conservative on purpose — a scrubber
# wants recall on obvious identifiers, not RFC-complete address parsing)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts_col(text: Column, kind: str) -> Column:
    """Occurrence count of one PII pattern family — JVM regexp_count."""
    return F.regexp_count(
        F.coalesce(text, F.lit("")), F.lit(PII_PATTERNS[kind])
    )


def redact_pii(
    text: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    token: str = "[PII]",
) -> Column:
    """Replace every PII match with ``token`` — chained JVM
    regexp_replace, no Python. Order follows ``kinds`` so e.g. emails are
    consumed before the looser phone pattern can bite their digits."""
    out = F.coalesce(text, F.lit(""))
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], token)
    return out


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    carry: tuple = (),
) -> DataFrame:
    """Corpus-level boilerplate removal (CCNet / RefinedWeb line dedup):
    drop every line that appears — after trim — in at least ``min_docs``
    DISTINCT documents (navigation chrome, cookie banners, footers).

    Scale shape: lines posexplode to rows carrying a 64-bit xxhash; ONE
    hash-keyed aggregate computes per-line distinct-doc counts with
    map-side partial aggregation; the boilerplate verdict equi-joins back
    on the hash (never on line text — shuffle rows carry 8 B keys); the
    document reassembles with an order-preserving sort_array over
    (pos, line) structs. Two shuffles + one join, no Python, no driver
    materialization — boilerplate sets at web scale are far too large to
    broadcast, which is why this is a plain equi-join and not a map-side
    lookup.

    Output: (id_col, *carry, text_col cleaned, n_lines, n_removed).
    Blank lines are dropped like the reference pipelines do."""
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode_outer(
            F.filter(
                F.transform(
                    F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
                    # single-arg lambda: passing F.trim directly would make
                    # transform bind the element INDEX to trim's optional
                    # trim-string parameter
                    lambda l: F.trim(l),
                ),
                lambda l: l != "",
            )
        ).alias("_pos", "_l"),
    ).withColumn(
        # xxhash64(NULL) is the non-null seed hash — guard it or every
        # line-less doc's placeholder row would share one bucket and
        # could be miscounted as boilerplate
        "_h",
        F.when(F.col("_l").isNotNull(), F.xxhash64("_l")),
    )
    common = (
        lines.groupBy("_h")
        .agg(F.count_distinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_h", F.lit(True).alias("_boiler"))
    )
    marked = lines.join(common, "_h", "left")
    return (
        marked.groupBy(id_col, *carry)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_boiler").isNull()
                                & F.col("_l").isNotNull(),
                                F.struct(F.col("_pos"), F.col("_l")),
                            )
                        )
                    ),
                    lambda s: s["_l"],
                ),
                "\n",
            ).alias(text_col),
            F.count("_l").alias("n_lines"),
            F.coalesce(
                F.sum(F.col("_boiler").cast("int")), F.lit(0)
            ).alias("n_removed"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    budget: int = 4096,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Deterministic token-budget sharding ("sequence packing" for
    training runs): documents ordered by ``id_col`` are assigned to
    consecutive shards so each shard holds ≈ ``budget`` tokens (a doc
    goes to the shard its RUNNING token total falls in — greedy packing
    in id order, reproducible under any partitioning or cluster size).

    A naive global `Window.orderBy(id)` cumulative sum collapses to one
    partition. This is the scalable two-phase prefix sum instead:
    (1) deterministic buckets of ``bucket_size`` ids get partition-LOCAL
    cumulative sums (window keyed by bucket); (2) per-bucket totals —
    one row per bucket — aggregate, cumulate driver-side (thousands of
    scalars at 100 TB, not data rows), and broadcast-join back as
    offsets. Output adds (n_tokens, shard_id).

    ``token_col`` supplies pre-computed counts; otherwise whitespace
    tokens of ``text_col`` are counted JVM-side.

    ``id_col`` must be NUMERIC: buckets and shard contiguity derive from
    integer division of the id (a string id would cast to NULL buckets —
    silent total data loss — or throw under ANSI). Raises TypeError up
    front instead."""
    from pyspark.sql import Window as W

    id_type = dict(df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"pack_sequences requires a numeric id_col for bucket/shard "
            f"ordering; {id_col!r} is {id_type!r} — derive a numeric key "
            f"first (e.g. monotonically increasing id or a parsed suffix)"
        )
    toks = (
        F.col(token_col)
        if token_col
        else token_count_col(F.col(text_col))
    ).cast("long")
    base = df.withColumn("_nt", toks).withColumn(
        "_bkt", (F.col(id_col) / F.lit(bucket_size)).cast("long")
    )
    w = (
        W.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = base.withColumn("_cum", F.sum("_nt").over(w))
    # per-bucket totals: tiny (one row per bucket_size docs); exclusive
    # prefix offsets computed on the driver stay O(n_buckets) scalars.
    # Aggregated from `base`, NOT `local`: the eager collect must not pay
    # the per-bucket window sort (plain sum needs no ordering), and
    # `local` is recomputed in the returned plan anyway.
    totals = sorted(
        (r._bkt, r.t)
        for r in base.groupBy("_bkt").agg(F.sum("_nt").alias("t")).collect()
    )
    off, acc = {}, 0
    for b, t in totals:
        off[b] = acc
        acc += t
    offsets = df.sparkSession.createDataFrame(
        [(b, o) for b, o in off.items()], "_bkt long, _off long"
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "shard_id",
            # a doc belongs to the shard its LAST token lands in-order:
            # (running total before this doc) // budget
            ((F.col("_off") + F.col("_cum") - F.col("_nt")) / budget).cast(
                "long"
            ),
        )
        .drop("_bkt", "_cum", "_off")
        .withColumnRenamed("_nt", "n_tokens")
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
