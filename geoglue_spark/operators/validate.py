"""Validation / data-quality — A6/A7/A9, P8/P9/P11.

Spark restatements of reference src/geoglue/validate.py:37-98 and the
eager pre-flight checks scattered through the reference. The per-slice
Python product loop (validate.py:46-74) collapses into ONE groupBy — one
shuffle instead of O(prod(dims)) sequential scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def summary_stats(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """A6: per-variable nna/mean/min/max in a single pass."""
    aggs = []
    for c in value_cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull() | F.isnan(col), 1).otherwise(0)).alias(f"{c}_nna"),
            F.round(F.avg(col), 6).alias(f"{c}_mean"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
        ]
    return df.agg(*aggs)


def per_slice_stats(
    df: DataFrame, dims: list[str], value_col: str = "value"
) -> DataFrame:
    """A7: stats per combination of non-region dims (reference
    validate.py:46-74) — the itertools.product loop becomes one shuffle."""
    v = F.col(value_col)
    return df.groupBy(*dims).agg(
        F.count(v).alias("n"),
        F.sum(F.when(v.isNull() | F.isnan(v), 1).otherwise(0)).alias("nna"),
        F.round(F.avg(v), 6).alias("mean"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def na_fraction(df: DataFrame, value_col: str = "value") -> float:
    """A9 (reference cli.py:299)."""
    v = F.col(value_col)
    row = df.agg(
        (F.sum(F.when(v.isNull() | F.isnan(v), 1).otherwise(0)) / F.count("*")).alias("f")
    ).collect()[0]
    return float(row.f or 0.0)


def check_value_range(
    df: DataFrame,
    value_col: str,
    vmin: float | None,
    vmax: float | None,
    max_na_frac: float = 1.0,
) -> None:
    """P8: CF valid_min/valid_max + max NA fraction gate (reference
    config.py:25-38, attrs.py:7-8). Raises on violation.

    ``None`` bounds are unbounded (ValidationSpec's default is
    ``max=None``). NaN counts toward the NA fraction, never toward
    out-of-bounds — Spark orders NaN above every value, so a naive
    ``v > vmax`` would flag every NaN and make ``max_na_frac``
    unreachable for NaN-encoded data."""
    if vmin is not None and vmax is not None and not vmin <= vmax:
        raise ValueError(f"min {vmin} > max {vmax}")
    if not 0.0 <= max_na_frac <= 1.0:
        raise ValueError(f"max_na_frac must be in [0,1], got {max_na_frac}")
    v = F.col(value_col)
    oob = F.lit(False)
    if vmin is not None:
        oob = oob | (v < vmin)
    if vmax is not None:
        oob = oob | (v > vmax)
    oob = ~F.isnan(v) & oob
    row = df.agg(
        F.sum(F.when(oob, 1).otherwise(0)).alias("oob"),
        (F.sum(F.when(v.isNull() | F.isnan(v), 1).otherwise(0)) / F.count("*")).alias(
            "naf"
        ),
    ).collect()[0]
    if row.oob and row.oob > 0:
        raise AssertionError(f"{row.oob} values outside [{vmin}, {vmax}]")
    if row.naf is not None and row.naf > max_na_frac:
        raise AssertionError(f"NA fraction {row.naf:.4f} > {max_na_frac}")


def check_pk_unique(df: DataFrame, pk: str) -> None:
    """P11: primary-key presence + uniqueness, checked eagerly like the
    reference's shapefile pk discipline (reference config.py:84-92)."""
    if pk not in df.columns:
        raise ValueError(f"pk column {pk!r} missing from {df.columns}")
    dupes = df.groupBy(pk).count().filter(F.col("count") > 1).limit(5).collect()
    if dupes:
        raise AssertionError(f"pk {pk!r} not unique, e.g. {[r[0] for r in dupes]}")


def check_hourly(df: DataFrame, time_col: str = "time") -> None:
    """P9: the distinct HH:MM set must have exactly 24 members
    (reference cds.py:53-55)."""
    n = df.select(F.date_format(time_col, "HH:mm").alias("hm")).distinct().count()
    if n != 24:
        raise AssertionError(f"expected 24 distinct hours, found {n}")
