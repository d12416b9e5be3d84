"""Calendar/timezone-correct time aggregation — W1/W2 + A3/A4/A5.

Reproduces the reference's hourly->daily->ISO-weekly pipeline with
instant/accumulated variable semantics:

  * timezone shift (reference src/geoglue/cds.py:237-295): the reference
    splices hours from the neighboring year's file then relabels; in Spark
    the whole year lives in one table, so the shift is a single column
    expression ``local_time = time + shift hours``.
  * the accum -1 rule (cds.py:298-356): accumulated variables are labelled
    at the END of their hour, so their local-time shift is ``shift - 1``
    — the +-1 subtlety the reference tests pin down (tests/test_cds.py:272-289,
    shift 8 -> instant 8 / accum 7 boundary hours).
  * daily reduce with per-vartype allowed aggregations (cds.py:89-94,
    enforcement cds.py:971-986): instant -> mean/min/max, accum -> sum.
  * ISO-weekly reduce anchored on Mondays, label = week start
    (cds.py:933-1016, anchors src/geoglue/util.py:106-117), with an
    optional warm-up ``window`` of weeks prepended for rolling ops.

All pure Column expressions — codegen'd, shuffle only at each groupBy.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INSTANT_HOW = ("mean", "min", "max")
ACCUM_HOW = ("sum",)
_AGG = {"mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum, "count": F.count}


def parse_tz_offset(offset: str) -> int | None:
    """'+05:00' -> 5; None for fractional offsets (reference cds.py:64-86)."""
    sign = 1 if offset[0] != "-" else -1
    hh, mm = offset.lstrip("+-").split(":")
    if int(mm) != 0:
        return None
    return sign * int(hh)


def local_time_col(
    time_col: Column, shift_hours: int, vartype: Column | str | None = None
) -> Column:
    """UTC -> local-time column with the accum -1 rule.

    ``vartype`` may be a Column ('instant'|'accum') for mixed tables, the
    literal strings, a column NAME, or None (instant semantics). A string
    is treated as the literal when it is exactly 'instant'/'accum' —
    a vartype column that is itself named 'instant' or 'accum' must be
    passed as ``F.col(...)``."""
    instant = time_col + F.make_interval(hours=F.lit(shift_hours))
    accum = time_col + F.make_interval(hours=F.lit(shift_hours - 1))
    if vartype is None:
        return instant
    if isinstance(vartype, str):
        # plain-string comparisons only: `vartype == "instant"` on a
        # Column builds a Column whose truthiness raises in `if`
        if vartype == "instant":
            return instant
        if vartype == "accum":
            return accum
        vt = F.col(vartype)
    else:
        vt = vartype
    return F.when(vt == "accum", accum).otherwise(instant)


def with_local_time(
    df: DataFrame,
    shift_hours: int,
    time_col: str = "time",
    vartype_col: str | None = "vartype",
    out_col: str = "local_time",
) -> DataFrame:
    if not -12 <= shift_hours <= 12:
        raise ValueError(f"shift_hours must be in [-12, 12], got {shift_hours}")
    vt = vartype_col if vartype_col in (df.columns if vartype_col else []) else None
    return df.withColumn(out_col, local_time_col(F.col(time_col), shift_hours, vt))


def _check_how(how: str, vartype: str | None) -> None:
    if how not in _AGG:
        raise ValueError(f"unknown aggregation {how!r}")
    if vartype == "instant" and how not in INSTANT_HOW:
        raise ValueError(f"instant variables allow {INSTANT_HOW}, got {how!r}")
    if vartype == "accum" and how not in ACCUM_HOW:
        raise ValueError(f"accum variables allow {ACCUM_HOW}, got {how!r}")


def daily_reduce(
    df: DataFrame,
    how: str,
    value_col: str = "value",
    time_col: str = "local_time",
    keys: list[str] = (),
    vartype: str | None = None,
) -> DataFrame:
    """Hourly -> daily (A3). ``keys`` are the non-time dims (lat, lon, var…).
    Output column keeps the value column's name; date column is ``date``."""
    _check_how(how, vartype)
    return (
        df.groupBy(F.to_date(F.col(time_col)).alias("date"), *keys)
        .agg(_AGG[how](F.col(value_col)).alias(value_col))
    )


def week_start_col(date_col: Column) -> Column:
    """Monday of the ISO week containing the date (label='left' anchoring,
    reference cds.py:1010-1016). weekday(): Mon=0..Sun=6."""
    return F.date_sub(date_col, F.weekday(date_col))


def first_monday(year: int) -> dt.date:
    """First Monday of the year (reference util.py:106-108)."""
    d = dt.date(year, 1, 1)
    return d + dt.timedelta(days=(7 - d.weekday()) % 7)


def last_sunday(year: int) -> dt.date:
    """Last Sunday of the year (reference util.py:111-117)."""
    d = dt.date(year, 12, 31)
    return d - dt.timedelta(days=(d.weekday() + 1) % 7)


def weekly_reduce(
    daily: DataFrame,
    how: str,
    value_col: str = "value",
    date_col: str = "date",
    keys: list[str] = (),
    vartype: str | None = None,
    year: int | None = None,
    window: int = 0,
) -> DataFrame:
    """Daily -> ISO-weekly (A4), Monday-anchored, left-labelled.

    When ``year`` is set, keeps only whole weeks first-Monday..last-Sunday
    of that year; ``window`` extends the start back that many weeks
    (rolling warm-up, reference cds.py:939/1005-1014)."""
    _check_how(how, vartype)
    d = daily
    if year is not None:
        start = first_monday(year) - dt.timedelta(weeks=window)
        end = last_sunday(year)
        d = d.filter(
            (F.col(date_col) >= F.lit(start)) & (F.col(date_col) <= F.lit(end))
        )
    return (
        d.groupBy(week_start_col(F.col(date_col)).alias("week_start"), *keys)
        .agg(_AGG[how](F.col(value_col)).alias(value_col))
    )


def rolling_weekly(
    weekly: DataFrame,
    window: int,
    how: str = "mean",
    value_col: str = "value",
    keys: list[str] = (),
) -> DataFrame:
    """Rolling aggregate over the trailing ``window`` weeks per key (W3):
    conventional rolling(window) semantics — the frame holds up to ``window``
    weekly points INCLUDING the current week (pandas/xarray
    ``.rolling(window)``, the reference's warm-up contract in
    cds.py:959-962), i.e. a RANGE lookback of (window-1) weeks."""
    from pyspark.sql import Window as W

    # range frame over DAY numbers (unix_date), not epoch seconds: under a
    # DST session timezone the fall-back week's Monday sits 604800+3600s
    # after the previous one, which a seconds-based lookback of exactly
    # (window-1)*604800 silently excludes
    w = (
        W.partitionBy(*keys)
        .orderBy(F.unix_date(F.col("week_start").cast("date")))
        .rangeBetween(-((window - 1) * 7), 0)
    )
    return weekly.withColumn(f"rolling_{how}", _AGG[how](F.col(value_col)).over(w))


def _epoch_sec(col):
    """Epoch seconds as double from numeric / TIMESTAMP / TIMESTAMP_NTZ
    columns (NTZ cannot cast to double directly; the intermediate
    timestamp cast is identity for numerics-as-epoch-seconds)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (as-of) join: for every LEFT row, attach the single
    RIGHT row with the greatest ``right.on <= left.on`` (``backward``; for
    ``forward`` the smallest ``right.on >= left.on``) within the same
    ``by`` keys — pandas ``merge_asof`` / kdb ``aj`` semantics, a LEFT
    join: unmatched (or out-of-``tolerance_seconds``) left rows keep NULL
    right columns.

    Spark-first plan (the property that matters at 10^9 rows): NOT a
    range join — a range/theta join explodes to candidate pairs and
    Catalyst nested-loops it. Instead both sides UNION into one stream
    tagged by side, a single window per ``by`` key sorted on
    ``(on, side)`` carries each right column forward with
    ``last(ignorenulls)``, and left rows filter back out. Exactly ONE
    shuffle (the window partitioning), map-side nothing to explode, skew
    bounded by the hottest ``by`` key. At equal timestamps the right row
    sorts FIRST, so an exact-tie matches (inclusive), matching DuckDB's
    ``ASOF JOIN ON l.on >= r.on`` — which is the oracle for this
    operator.

    Right columns (other than ``on`` and ``by``) keep their names unless
    they clash with a left column, in which case ``suffix`` is appended;
    the matched right timestamp always lands in ``{on}{suffix}``.

    The match is ROW-ATOMIC: all right columns travel as ONE struct with
    a single ``last(ignorenulls)``, so a legitimately-NULL right column
    stays NULL in the output instead of silently inheriting an older
    right row's value, and every output column comes from the SAME
    matched right row (pandas merge_asof / DuckDB ASOF semantics for
    nullable right columns). A NULL left timestamp never matches in
    either direction (NULLs sort before every right row in the carry
    order).

    The right side should be UNIQUE per (by, on) — with duplicate right
    timestamps the winner is partition-order-dependent (DuckDB's ASOF has
    the same caveat); pre-aggregate the right side to one row per instant.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    rcols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}
    lcols = [c for c in left.columns]
    r_on = on + suffix

    # one struct holds the whole candidate right row (atomic carry);
    # positional field names sidestep any left/right name collisions
    rstruct = F.struct(
        *[F.col(c).alias(f"f{i}") for i, c in enumerate(rcols)],
        F.col(on).alias("f_on"),
    )
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType

    l_tagged = left.select(
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rtype).alias("_r"),
        *[F.col(c).alias(f"_by_{i}") for i, c in enumerate(by)],
    )
    r_tagged = right.select(
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        rstruct.alias("_r"),
        *[F.col(c).alias(f"_by_{i}") for i, c in enumerate(by)],
    )
    from pyspark.sql import Window as W

    if direction == "forward":
        # desc_nulls_first: a NULL left timestamp must sort BEFORE every
        # right row so the carry is still empty when it arrives (plain
        # desc puts NULLs last, where they'd pick up a spurious match)
        order = [F.col("_t").desc_nulls_first(), F.col("_side")]
    else:
        # asc sorts NULLs first by default — same no-match guarantee
        order = [F.col("_t"), F.col("_side")]
    w = (
        W.partitionBy(*[f"_by_{i}" for i in range(len(by))])
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out = carried.filter(F.col("_side") == 1)
    c_on = F.col("_m").getField("f_on")
    if tolerance_seconds is not None:
        delta = _epoch_sec(F.col("_t")) - _epoch_sec(c_on)
        if direction == "forward":
            delta = -delta
        ok = c_on.isNotNull() & (delta <= F.lit(float(tolerance_seconds)))
    else:
        ok = c_on.isNotNull()
    return out.select(
        *[F.col(c) for c in lcols],
        *[
            F.when(ok, F.col("_m").getField(f"f{i}")).alias(out_names[c])
            for i, c in enumerate(rcols)
        ],
        F.when(ok, c_on).alias(r_on),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] = (),
    bucket_seconds: int = 3600,
    max_fanout: int = 4096,
) -> DataFrame:
    """Point-in-interval (range) join WITHOUT a nested loop: Spark plans a
    bare ``p.ts >= i.start AND p.ts < i.end`` condition as a
    BroadcastNestedLoopJoin — O(points x intervals) compare at fact scale.
    Instead each interval EXPLODES to the fixed-width time buckets it
    covers, each point hashes to exactly one bucket, and the join is a
    pure EQUI-join on (by..., bucket) followed by the exact range filter.
    Candidate volume per interval = ceil(len/bucket_seconds) + 1 — the
    J8 bounded-fan-out shape, guarded by ``max_fanout`` with the blow-up
    arithmetic in the error (an interval spanning years at a 1-second
    bucket is a parameter decision, not a silent 10^8-row explode).

    Intervals are [start, end) half-open. Pick ``bucket_seconds`` near
    the TYPICAL interval length: larger buckets cut the interval fan-out,
    smaller buckets cut false candidates per bucket.

    Degenerate intervals (``end <= start``, including inverted ones)
    contain NO point under the half-open semantics and explode to ZERO
    buckets — without this branch ``sequence(lo, hi)`` with ``lo > hi``
    produces a DESCENDING sequence, turning a far-inverted interval into
    exactly the unbounded fan-out the guard exists to prevent.
    """
    by = list(by)
    b = int(bucket_seconds)
    s_ep = _epoch_sec(F.col(start_col))
    e_ep = _epoch_sec(F.col(end_col))
    lo = F.floor(s_ep / b).cast("long")
    # exclusive end via ceil-1, NOT an epsilon: 1e-9 is below the ULP of
    # modern epoch seconds (~2.4e-7 at 1.7e9), so `e - 1e-9` is a float
    # no-op for real timestamps and a boundary-aligned end would claim one
    # extra bucket (spuriously tripping max_fanout at the margin)
    hi = (F.ceil(e_ep / F.lit(float(b))) - 1).cast("long")
    n_buckets = hi - lo + 1
    guard = F.when(
        # NULL bounds first: a NULL start/end makes n_buckets NULL, and
        # NULL falls through BOTH range whens into raise_error — a dirty
        # interval row would abort the whole job with a misleading
        # fan-out message. NULL-bounded intervals match no point: drop.
        # e <= s explicitly: a same-instant interval inside one bucket has
        # lo == hi (n_buckets 1) yet contains nothing under [start, end).
        n_buckets.isNull() | (n_buckets < 1) | (e_ep <= s_ep),
        F.array().cast("array<long>"),
    ).when(
        n_buckets <= max_fanout, F.sequence(lo, hi)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join fan-out overflow: interval [%s, %s) spans %s "
                f"buckets of {b}s (max_fanout={max_fanout}); raise "
                "bucket_seconds or split the interval",
                F.col(start_col).cast("string"), F.col(end_col).cast("string"),
                n_buckets.cast("string"),
            )
        )
    )
    iv = intervals.withColumn("_bkt", F.explode(guard))
    pt = points.withColumn(
        "_bkt", F.floor(_epoch_sec(F.col(ts_col)) / b).cast("long")
    )
    cond = [pt["_bkt"] == iv["_bkt"]] + [pt[c] == iv[c] for c in by]
    joined = pt.join(iv, cond).filter(
        (_epoch_sec(pt[ts_col]) >= _epoch_sec(iv[start_col]))
        & (_epoch_sec(pt[ts_col]) < _epoch_sec(iv[end_col]))
    )
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in by
    ]
    return joined.select(*keep)


def positional_slice(
    df: DataFrame,
    start: int | None = None,
    stop: int | None = None,
    order_col: str = "time",
    keys: list[str] = (),
) -> DataFrame:
    """W4: positional slicing over time order per key — the Spark analog of
    xarray's ``isel(slice(start, stop))`` (reference cds.py:285-291).
    Negative indices count from the end, like Python slices.

    SCALE WARNING: with no ``keys`` the global ordering semantically
    requires a SINGLE-partition window — the whole frame funnels through
    one task. That is correct (and cheap) for coordinate/metadata tables,
    which is what the reference slices; for large fact tables always pass
    ``keys`` (e.g. per-variable, per-tile) so each window partition stays
    bounded."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    df = df.withColumn("_rn", F.row_number().over(w.orderBy(order_col)) - 1)
    df = df.withColumn("_n", F.count("*").over(w))
    cond = F.lit(True)
    if start is not None:
        s = F.lit(start) if start >= 0 else F.col("_n") + F.lit(start)
        cond = cond & (F.col("_rn") >= s)
    if stop is not None:
        e = F.lit(stop) if stop >= 0 else F.col("_n") + F.lit(stop)
        cond = cond & (F.col("_rn") < e)
    return df.filter(cond).drop("_rn", "_n")


def year_bounds_check(df: DataFrame, year: int, time_col: str = "local_time") -> None:
    """Assert the shifted year covers exactly YYYY-01-01 00 .. YYYY-12-31 23
    (reference cds.py:916-929)."""
    row = df.agg(F.min(time_col).alias("mn"), F.max(time_col).alias("mx")).collect()[0]
    want_mn = dt.datetime(year, 1, 1, 0)
    want_mx = dt.datetime(year, 12, 31, 23)
    if row.mn != want_mn or row.mx != want_mx:
        raise AssertionError(
            f"year {year} bounds mismatch: got [{row.mn}, {row.mx}], "
            f"want [{want_mn}, {want_mx}]"
        )


def is_end_of_month_col(date_col: Column) -> Column:
    """P10: the date is its month's last day (reference cds.py:49-50)."""
    return F.last_day(date_col) == date_col


def monthly_split(
    df: DataFrame, time_col: str = "time", with_completeness: bool = True
) -> DataFrame:
    """Tag rows with year/month partitions + a ``month_complete`` flag
    (A5/I3): a month is complete when its max observed date is the month's
    last day (reference cds.py:204-234, is_end_of_month cds.py:49-50).

    The flag costs one window shuffle over (year, month); pass
    ``with_completeness=False`` for the tag-only fast path.
    """
    out = df.withColumn("year", F.year(time_col)).withColumn(
        "month", F.month(time_col)
    )
    if not with_completeness:
        return out
    from pyspark.sql import Window as W

    w = W.partitionBy("year", "month")
    return out.withColumn(
        "month_complete",
        is_end_of_month_col(F.max(F.to_date(time_col)).over(w)),
    )


def month_completeness(df: DataFrame, time_col: str = "time") -> DataFrame:
    """Per-month completeness summary (year, month, last_date, complete) —
    the metadata-scale pre-commit check of I3 (reference cds.py:204-234)."""
    return (
        df.groupBy(F.year(time_col).alias("year"), F.month(time_col).alias("month"))
        .agg(F.max(F.to_date(time_col)).alias("last_date"))
        .withColumn("complete", is_end_of_month_col(F.col("last_date")))
    )


def is_hourly(df: DataFrame, time_col: str = "time") -> bool:
    """Distinct HH:MM count == 24 (reference cds.py:53-55)."""
    n = df.select(F.date_format(time_col, "HH:mm").alias("hm")).distinct().count()
    return n == 24
