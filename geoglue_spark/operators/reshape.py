"""Reshape ops — O5 sparse->dense step collapse, O6 duration matrix.

Spark restatements of reference src/geoglue/reshape.py:

  * collapse_step_to_month (reshape.py:6-54): a sparse (time, step)
    forecast where each time has a constant number of non-NaN steps becomes
    a dense (time, month=1..n) layout. The double Python loop is replaced
    by row_number() over step order per (time, dims) — one window, no
    pivot needed; a wide layout is one groupBy().pivot() away.
  * get_durations (reshape.py:86-102): days in the n-th month after each
    time — the reference's nested loop is one datediff(add_months())
    expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_step_to_month(
    df: DataFrame,
    time_col: str = "time",
    step_col: str = "step",
    value_col: str = "value",
    dims: list[str] = (),
    expected_months: int | None = None,
) -> DataFrame:
    """Drop NaN steps and index the survivors 1..n as ``month`` per
    (time, dims). Raises (at action time, via an assert column upstream if
    desired) nothing here — completeness is checked by
    :func:`assert_constant_month_count`."""
    w = Window.partitionBy(time_col, *dims).orderBy(step_col)
    # NaN is the reference's missing-step encoding and survives parquet;
    # isNotNull alone would index NaN steps and shift every real month
    out = (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .withColumn("month", F.row_number().over(w))
        .drop(step_col)
    )
    if expected_months is not None:
        out = out.filter(F.col("month") <= expected_months)
    return out


def assert_constant_month_count(df: DataFrame, time_col: str = "time",
                                dims: list[str] = ()) -> int:
    """The reference assumes every time has the same non-NaN step count
    (reshape.py:30-38); verify with one agg and return the count."""
    counts = (
        df.groupBy(time_col, *dims).agg(F.max("month").alias("n"))
        .select("n").distinct().collect()
    )
    if len(counts) != 1:
        raise AssertionError(f"non-constant month counts: {sorted(r.n for r in counts)}")
    return counts[0].n


def months_wide(df: DataFrame, time_col: str = "time", value_col: str = "value",
                n_months: int = 6, dims: list[str] = ()) -> DataFrame:
    """Optional wide layout: one column per month offset (pivot)."""
    return (
        df.groupBy(time_col, *dims)
        .pivot("month", list(range(1, n_months + 1)))
        .agg(F.first(value_col))
    )


def days_in_nth_month_col(time_col: Column, n: Column | int) -> Column:
    """Days in the n-th month after ``time_col`` (reference reshape.py:67-83):
    one expression instead of the reference's calendar loop. n=1 is the
    month of the timestamp itself."""
    nn = F.lit(n) if isinstance(n, int) else n
    start = F.add_months(F.date_trunc("month", time_col), nn - 1)
    return F.datediff(F.add_months(start, 1), start)


def durations(df: DataFrame, time_col: str = "time", n_months: int = 6) -> DataFrame:
    """O6: (time, month 1..n_months, days) matrix — generated with
    explode(sequence) + the expression above, no Python loops."""
    return (
        df.select(time_col).distinct()
        .select(time_col, F.explode(F.sequence(F.lit(1), F.lit(n_months))).alias("month"))
        .withColumn("days", days_in_nth_month_col(F.col(time_col), F.col("month")))
    )
