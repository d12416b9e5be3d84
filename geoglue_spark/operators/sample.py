"""Deterministic sampling for training-data pipelines.

A 10^12-row corpus is sampled constantly — train/test splits, per-class
caps, debugging subsets — and the naive tools are wrong at scale:
``df.sample`` draws from a partition-seeded RNG (the kept set changes
whenever partitioning changes), and a per-group window over the full
table sends every row of a mega-group through one task.

Design rules here:

  * **Membership is a pure function of the row**, never of partitioning:
    every decision derives from ``xxhash64(key_cols, seed)``. The same
    row is kept by every run, every cluster size, every file layout —
    the property that makes splits auditable and joins between derived
    sets consistent (a row's split assignment can be recomputed at read
    time by anyone).
  * **Bernoulli modes shuffle NOTHING**: a codegen'd hash-compare filter
    that rides the scan.
  * **Exact quotas** (``stratified_sample``) take the n smallest hashes
    per group — a total, deterministic, uniformly-distributed order.
    The full-table window is avoided for big groups by a prefilter:
    keep only rows whose hash falls under a per-group threshold sized
    from the group's count (broadcast-joined), then window the
    survivors. Because the prefilter could (with vanishing but nonzero
    probability) cut below the quota, a correction pass detects SHORT
    groups exactly and re-windows just those groups without the
    prefilter — exactness is unconditional, the prefilter is purely a
    performance device.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# xxhash64 output spans the full signed-64 range; map to [0, 1) for
# threshold comparisons. Offset by 2^63 via double math (exact enough:
# thresholds are probabilities, not row identities).
_HASH_SPAN = 2.0**64


def _hash01(cols: list[Column], seed: int) -> Column:
    h = F.xxhash64(*cols, F.lit(seed))
    return (h.cast("double") + 2.0**63) / _HASH_SPAN


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Keep each row iff hash01(key_cols, seed) < fraction — reproducible
    Bernoulli(fraction) sampling that shuffles nothing and survives any
    repartitioning. ``key_cols`` should identify the row (e.g. the
    primary key); rows with equal keys sample identically by design."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_hash01([F.col(c) for c in key_cols], seed) < fraction)


def train_test_split(
    df: DataFrame,
    test_fraction: float,
    key_cols: list[str],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Stamp every row 'train' or 'test' by the same hash rule —
    deterministic, disjoint, exhaustive. One pass, no shuffle; filtering
    either side later prunes on a codegen'd predicate."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    u = _hash01([F.col(c) for c in key_cols], seed)
    return df.withColumn(
        split_col, F.when(u < test_fraction, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    by: list[str],
    n_per_group: int,
    key_cols: list[str],
    seed: int = 0,
    prefilter_margin: float = 4.0,
    prefilter_min_count: int = 10_000,
    broadcast_thresholds: bool = True,
) -> DataFrame:
    """EXACTLY min(n_per_group, group size) rows per group — the rows
    with the n smallest hash01 values, so the result is deterministic
    under any partitioning and uniformly drawn within each group.

    Scale shape: one tiny per-group count aggregate broadcasts back as a
    per-group hash threshold ``min(1, (margin*n + 64) / count)`` (only
    for groups above ``prefilter_min_count``); the ranking window then
    sees ~margin*n rows per mega-group instead of the whole group — a
    10^9-row class costs its task ~margin*n rows, not 10^9. Groups the
    prefilter left SHORT (kept < min(n, count); probability falls
    exponentially in the margin, but is not zero) are detected exactly
    and re-ranked without the prefilter, so the output is unconditionally
    exact — the margin trades a rare second pass for window volume,
    never correctness.

    ``broadcast_thresholds``: the per-group count/threshold/short tables
    broadcast by default (group cardinality is usually dim-sized — admin
    units, classes, languages). Set False when ``by`` has fact-scale
    cardinality; the joins then shuffle on the group key."""
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    keys = [F.col(c) for c in key_cols]
    u = _hash01(keys, seed).alias("_u")
    # every join rides a STRUCT of the group columns: struct equality is
    # null-safe, so a NULL group key stays a group (a plain equi-join on
    # `by` never matches NULL and would silently DROP the whole NULL
    # group, violating the exactness contract)
    gk = F.struct(*[F.col(c) for c in by]).alias("_gk")
    base = df.withColumn("_u", u).withColumn("_gk", gk)
    counts = df.groupBy(gk).agg(F.count("*").alias("_cnt"))
    thresh = counts.withColumn(
        "_thr",
        F.when(
            F.col("_cnt") > F.lit(max(prefilter_min_count, n_per_group)),
            F.least(
                F.lit(1.0),
                (F.lit(prefilter_margin * n_per_group + 64.0)) / F.col("_cnt"),
            ),
        ).otherwise(F.lit(1.0)),
    )
    bc = F.broadcast if broadcast_thresholds else (lambda d: d)
    pre = base.join(bc(thresh), on="_gk").filter(F.col("_u") < F.col("_thr"))
    w = W.partitionBy("_gk").orderBy(F.col("_u"), *keys)  # keys: total order tiebreak
    ranked = pre.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= n_per_group)
    # correction pass: a group is SHORT iff it kept fewer than
    # min(n, count) rows — only possible when the prefilter bit too deep.
    # LEFT join from counts: a group whose EVERY row failed the prefilter
    # has no kept rows at all, and an inner join would hide it
    short = (
        counts.join(
            kept.groupBy("_gk").agg(F.count("*").alias("_kept")),
            on="_gk",
            how="left",
        )
        .filter(
            F.coalesce(F.col("_kept"), F.lit(0))
            < F.least(F.lit(n_per_group), F.col("_cnt"))
        )
        .select("_gk")
    )
    fixed = (
        base.join(bc(short), on="_gk", how="left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
    )
    ok = kept.join(bc(short), on="_gk", how="left_anti")
    out_cols = df.columns
    return ok.select(*out_cols).unionByName(fixed.select(*out_cols))


def mix_sources(
    df: DataFrame,
    source_col: str,
    proportions: dict[str, float],
    key_cols: list[str],
    total_rows: int | None = None,
    seed: int = 0,
    prefilter_margin: float = 4.0,
    prefilter_min_count: int = 10_000,
) -> DataFrame:
    """Deterministic corpus MIXING: subsample a multi-source table so the
    output follows the target source ``proportions`` with EXACT row
    quotas — the "data mixture" step every training run applies (e.g.
    web 0.6 / code 0.25 / papers 0.15). Per source, the quota rows with
    the smallest ``hash01(key_cols, seed)`` are kept, so the result is
    partitioning-invariant, auditable (membership is recomputable from
    the row alone), and NESTED across seeds-consistent reruns like
    :func:`stratified_sample`.

    ``total_rows=None`` auto-sizes to the LARGEST total the corpus can
    supply at these proportions (the binding source is consumed ~whole);
    an explicit ``total_rows`` raises up front if any source cannot fill
    its quota. Sources absent from ``proportions`` are dropped (weight
    0). Quotas are ``floor(p_s * total)`` after normalizing proportions.

    Scale shape: one tiny per-source count aggregate (sources are
    dim-sized by definition); quotas and hash thresholds broadcast back;
    then the same prefilter -> window -> exact-correction machinery as
    :func:`stratified_sample` — a mega-source's ranking window sees
    ~margin*quota rows, never the whole source, and the correction pass
    keeps exactness unconditional."""
    props = {k: float(v) for k, v in proportions.items() if v > 0}
    if not props:
        raise ValueError("proportions must contain at least one positive weight")
    norm = sum(props.values())
    props = {k: v / norm for k, v in props.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
        if r[0] in props
    }
    missing = sorted(set(props) - set(counts))
    if missing:
        raise ValueError(f"sources {missing} have no rows in {source_col!r}")
    max_total = min(int(counts[s] / p) for s, p in props.items())
    total = max_total if total_rows is None else int(total_rows)
    quotas = {s: int(p * total) for s, p in props.items()}
    infeasible = {s: q for s, q in quotas.items() if q > counts[s]}
    if infeasible:
        raise ValueError(
            f"total_rows={total} demands more rows than exist for "
            f"{infeasible} (available: {counts}); max feasible total is "
            f"{max_total}"
        )
    quota_rows = [
        (
            s,
            q,
            min(1.0, (prefilter_margin * q + 64.0) / counts[s])
            if counts[s] > max(prefilter_min_count, q)
            else 1.0,
        )
        for s, q in quotas.items()
        if q > 0
    ]
    spark = df.sparkSession
    src_type = dict(df.dtypes)[source_col]
    qdf = F.broadcast(
        spark.createDataFrame(
            quota_rows, f"{source_col} {src_type}, _quota long, _thr double"
        )
    )
    keys = [F.col(c) for c in key_cols]
    base = df.join(qdf, source_col).withColumn(
        "_u", _hash01(keys, seed)
    )
    w = W.partitionBy(source_col).orderBy(F.col("_u"), *keys)
    kept = (
        base.filter(F.col("_u") < F.col("_thr"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
    )
    # exact correction: a source whose prefilter bit below its quota is
    # re-ranked without the prefilter (quota <= count is guaranteed above,
    # so "kept < quota" is the complete short condition). LEFT join FROM
    # the quota table: a source whose EVERY row failed the prefilter has
    # no kept rows at all, and grouping kept alone would hide it.
    short = (
        qdf.join(
            kept.groupBy(source_col).agg(F.count("*").alias("_kept")),
            source_col,
            "left",
        )
        .filter(F.coalesce(F.col("_kept"), F.lit(0)) < F.col("_quota"))
        .select(source_col)
    )
    fixed = (
        base.join(F.broadcast(short), source_col, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
    )
    ok = kept.join(F.broadcast(short), source_col, "left_anti")
    out_cols = df.columns
    return ok.select(*out_cols).unionByName(fixed.select(*out_cols))
