"""Time-aggregation invariants mirroring the reference's test style:
timeshift boundary-row counts (tests/test_cds.py:271-325), daily
min<mean<max (tests/test_cds.py:381-392), weekly spacing/anchoring
(tests/test_cds.py:411-423)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geoglue_spark.operators import timeagg as TA


@pytest.fixture(scope="module")
def hourly(spark):
    """Two full years of hourly data for one point, instant + accum."""
    n = 2 * 8760
    base = spark.range(n)
    t = F.to_timestamp(F.lit("2019-01-01 00:00:00")) + F.make_interval(
        hours=F.col("id").cast("int")
    )
    df = base.select(
        t.alias("time"),
        (F.sin(F.col("id").cast("double") / 24.0) * 10 + 280).alias("value"),
    )
    return (
        df.withColumn("vartype", F.lit("instant"))
        .unionByName(df.withColumn("vartype", F.lit("accum")))
        .cache()
    )


def test_parse_tz_offset():
    assert TA.parse_tz_offset("+05:00") == 5
    assert TA.parse_tz_offset("-04:00") == -4
    assert TA.parse_tz_offset("+05:30") is None
    assert TA.parse_tz_offset("+00:00") == 0


@pytest.mark.parametrize(
    "shift,instant_cross,accum_cross",
    [(8, 8, 7), (-4, 4, 5)],
)
def test_timeshift_boundary_rows(spark, hourly, shift, instant_cross, accum_cross):
    """Reference invariant (tests/test_cds.py:271-325): with shift +8 the
    shifted year takes 8 instant / 7 accum hours across the year boundary;
    with -4 it takes 4 / 5."""
    local = TA.with_local_time(hourly, shift, time_col="time")
    # rows whose local year is 2020 but utc year is 2019 (or vice versa)
    cross = local.filter(
        (F.year("local_time") != F.year("time"))
        & (F.year("local_time") == (2020 if shift > 0 else 2019))
    )
    counts = {r.vartype: r.n for r in cross.groupBy("vartype").agg(F.count("*").alias("n")).collect()}
    assert counts.get("instant", 0) == instant_cross
    assert counts.get("accum", 0) == accum_cross


def test_shift_out_of_range(spark, hourly):
    with pytest.raises(ValueError):
        TA.with_local_time(hourly, 13)


def test_daily_min_mean_max(spark, hourly):
    inst = hourly.filter("vartype = 'instant'").withColumn("local_time", F.col("time"))
    mn = TA.daily_reduce(inst, "min", vartype="instant")
    mean = TA.daily_reduce(inst, "mean", vartype="instant")
    mx = TA.daily_reduce(inst, "max", vartype="instant")
    j = (
        mn.withColumnRenamed("value", "vmin")
        .join(mean.withColumnRenamed("value", "vmean"), "date")
        .join(mx.withColumnRenamed("value", "vmax"), "date")
    )
    bad = j.filter(~((F.col("vmin") < F.col("vmean")) & (F.col("vmean") < F.col("vmax"))))
    assert bad.count() == 0
    assert mn.count() == 730


def test_vartype_how_enforcement(spark, hourly):
    inst = hourly.withColumn("local_time", F.col("time"))
    with pytest.raises(ValueError):
        TA.daily_reduce(inst, "sum", vartype="instant")
    with pytest.raises(ValueError):
        TA.daily_reduce(inst, "mean", vartype="accum")
    with pytest.raises(ValueError):
        TA.daily_reduce(inst, "median")


def test_weekly_anchor_and_spacing(spark, hourly):
    inst = hourly.filter("vartype='instant'").withColumn("local_time", F.col("time"))
    daily = TA.daily_reduce(inst, "mean", vartype="instant")
    weekly = TA.weekly_reduce(daily, "mean", year=2019).orderBy("week_start")
    rows = weekly.collect()
    # first Monday of 2019 is Jan 7; last Sunday is Dec 29
    assert rows[0].week_start == dt.date(2019, 1, 7)
    assert rows[-1].week_start == dt.date(2019, 12, 23)
    # exact 7-day spacing (reference: 7*24*3600 s)
    for a, b in zip(rows, rows[1:]):
        assert (b.week_start - a.week_start).days == 7
    # warm-up window extends the start by 42 days (6 weeks); use 2020 so
    # the warm-up weeks have data (fixture starts 2019-01-01)
    w6 = TA.weekly_reduce(daily, "mean", year=2020, window=6).orderBy("week_start")
    assert w6.first().week_start == TA.first_monday(2020) - dt.timedelta(days=42)


def test_first_monday_last_sunday():
    assert TA.first_monday(2019) == dt.date(2019, 1, 7)
    assert TA.first_monday(2024) == dt.date(2024, 1, 1)
    assert TA.last_sunday(2019) == dt.date(2019, 12, 29)
    assert TA.last_sunday(2023) == dt.date(2023, 12, 31)


def test_year_bounds_check(spark, hourly):
    inst = hourly.filter("vartype='instant'")
    ok = inst.withColumn("local_time", F.col("time")).filter(F.year("local_time") == 2019)
    TA.year_bounds_check(ok, 2019)
    with pytest.raises(AssertionError):
        TA.year_bounds_check(ok.limit(100), 2019)


def test_rolling_weekly(spark, hourly):
    inst = hourly.filter("vartype='instant'").withColumn("local_time", F.col("time"))
    daily = TA.daily_reduce(inst, "mean", vartype="instant")
    weekly = TA.weekly_reduce(daily, "mean", year=2019)
    rolled = TA.rolling_weekly(weekly, window=3, how="mean")
    assert "rolling_mean" in rolled.columns
    assert rolled.filter(F.col("rolling_mean").isNull()).count() == 0


def test_positional_slice(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "time int")
    got = sorted(r.time for r in TA.positional_slice(df, -3, None).collect())
    assert got == [7, 8, 9]
    got = sorted(r.time for r in TA.positional_slice(df, 2, 5).collect())
    assert got == [2, 3, 4]
    got = sorted(r.time for r in TA.positional_slice(df, None, -8).collect())
    assert got == [0, 1]


def test_is_hourly(spark, hourly):
    assert TA.is_hourly(hourly)
    assert not TA.is_hourly(hourly.filter(F.hour("time") < 23))


def test_asof_join_matches_pandas_merge_asof(spark):
    """Random keyed series vs the pandas merge_asof oracle: backward,
    forward, and backward-with-tolerance, including never-matched rows."""
    import numpy as np
    import pandas as pd

    from geoglue_spark.operators.timeagg import asof_join

    rng = np.random.default_rng(5)
    lt = pd.DataFrame({
        "ts": pd.to_datetime(rng.integers(0, 10_000, 300), unit="s"),
        "k": rng.integers(0, 4, 300),
        "lv": np.arange(300.0),
    })
    rt = pd.DataFrame({
        "ts": pd.to_datetime(rng.integers(0, 10_000, 80), unit="s"),
        "k": rng.integers(0, 4, 80),
        "rv": np.arange(80.0) * 10,
    }).drop_duplicates(["k", "ts"])
    ldf = spark.createDataFrame(lt)
    rdf = spark.createDataFrame(rt)

    for direction, tol in [("backward", None), ("forward", None), ("backward", 900)]:
        got = (
            asof_join(ldf, rdf, on="ts", by=["k"], direction=direction,
                      tolerance_seconds=tol)
            .toPandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
        )
        want = pd.merge_asof(
            lt.sort_values("ts"), rt.sort_values("ts"), on="ts", by="k",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values(["k", "ts", "lv"]).reset_index(drop=True)
        assert len(got) == len(want) == 300
        pd.testing.assert_series_equal(
            got["rv"], want["rv"], check_names=False, check_dtype=False,
        )


def test_asof_join_equal_ts_inclusive_and_suffix(spark):
    """Exact timestamp ties match (inclusive, DuckDB ASOF semantics), and
    clashing right column names get the suffix."""
    from geoglue_spark.operators.timeagg import asof_join

    left = spark.createDataFrame(
        [(100, "a", 1.0)], "ts long, k string, value double"
    )
    right = spark.createDataFrame(
        [(100, "a", 9.0), (90, "a", 8.0)], "ts long, k string, value double"
    )
    r = asof_join(left, right, on="ts", by=["k"]).collect()[0]
    assert r.value == 1.0 and r.value_r == 9.0 and r.ts_r == 100


def test_interval_join_matches_brute_force(spark):
    """Bucketed interval join == the O(n*m) brute-force condition, across
    bucket widths, with by-keys and boundary timestamps (half-open)."""
    import numpy as np

    from geoglue_spark.operators.timeagg import interval_join

    rng = np.random.default_rng(9)
    pts = [(int(i), int(t), "k%d" % (i % 2)) for i, t in
           enumerate(rng.integers(0, 100_000, 400))]
    ivs = []
    for j in range(30):
        s = int(rng.integers(0, 95_000))
        ivs.append((j, s, s + int(rng.integers(1, 20_000)), "k%d" % (j % 2)))
    # exact-boundary probes: ts == start (in) and ts == end (out)
    pts += [(1000, ivs[0][1], ivs[0][3]), (1001, ivs[0][2], ivs[0][3])]
    p = spark.createDataFrame(pts, "pid long, ts long, k string")
    iv = spark.createDataFrame(ivs, "iid long, start long, end long, k string")
    want = {
        (r.pid, r.iid)
        for r in p.crossJoin(iv.withColumnRenamed("k", "k2"))
        .filter("k = k2 AND ts >= start AND ts < end").collect()
    }
    for bucket in (100, 3600, 50_000):
        got = {
            (r.pid, r.iid)
            for r in interval_join(
                p, iv, "ts", "start", "end", by=["k"], bucket_seconds=bucket
            ).collect()
        }
        assert got == want, bucket
    # half-open boundaries against interval 0 specifically
    assert (1000, 0) in want and (1001, 0) not in want


def test_interval_join_fanout_guard(spark):
    import pytest as _pt

    from geoglue_spark.operators.timeagg import interval_join

    p = spark.createDataFrame([(1, 5)], "pid long, ts long")
    iv = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, start long, end long")
    with _pt.raises(Exception, match="fan-out overflow"):
        interval_join(p, iv, "ts", "start", "end", bucket_seconds=1,
                      max_fanout=1000).collect()


def test_asof_join_null_right_column_atomic(spark):
    """ADVICE r4: the match is row-atomic — a legitimately-NULL right
    column stays NULL instead of inheriting an OLDER right row's value,
    and all output columns come from the same matched right row."""
    from geoglue_spark.operators.timeagg import asof_join

    left = spark.createDataFrame([(100, 1.0)], "ts long, lv double")
    right = spark.createDataFrame(
        [(50, 7.0, "old"), (90, None, "new")],
        "ts long, rv double, tag string",
    )
    r = asof_join(left, right, on="ts").collect()[0]
    assert r.ts_r == 90 and r.tag == "new"
    assert r.rv is None  # NOT 7.0 from the older row


def test_asof_join_null_left_ts_never_matches(spark):
    """ADVICE r4: a NULL left timestamp yields NULL right columns in BOTH
    directions (forward used to sort NULLs last and pick up the carry)."""
    from geoglue_spark.operators.timeagg import asof_join

    left = spark.createDataFrame(
        [(None, 1.0), (100, 2.0)], "ts long, lv double"
    )
    right = spark.createDataFrame([(100, 9.0)], "ts long, rv double")
    for direction in ("backward", "forward"):
        rows = {r.lv: r for r in asof_join(
            left, right, on="ts", direction=direction
        ).collect()}
        assert rows[1.0].rv is None and rows[1.0].ts_r is None
        assert rows[2.0].rv == 9.0


def test_interval_join_inverted_and_empty_intervals(spark):
    """ADVICE r4: end <= start contains nothing under [start, end) — an
    inverted interval must yield ZERO candidates, not a descending-
    sequence explode that bypasses the fan-out guard."""
    from geoglue_spark.operators.timeagg import interval_join

    p = spark.createDataFrame([(1, 5)], "pid long, ts long")
    iv = spark.createDataFrame(
        # far-inverted (would explode to 10^7 buckets pre-fix) and empty
        [(1, 10_000_000, 0), (2, 5, 5)],
        "iid long, start long, end long",
    )
    out = interval_join(p, iv, "ts", "start", "end", bucket_seconds=1,
                        max_fanout=1000)
    assert out.count() == 0


def test_interval_join_null_bounds_dropped(spark):
    """A NULL start/end (dirty ingest) must behave like a degenerate
    interval — matching no point — not abort the job through the fan-out
    raise_error branch (NULL falls through both range whens)."""
    from geoglue_spark.operators.timeagg import interval_join

    p = spark.createDataFrame([(1, 5)], "pid long, ts long")
    iv = spark.createDataFrame(
        [(1, None, 10), (2, 0, None), (3, 0, 10)],
        "iid long, start long, end long",
    )
    out = interval_join(p, iv, "ts", "start", "end", bucket_seconds=1,
                        max_fanout=1000)
    assert [r.iid for r in out.collect()] == [3]


def test_local_time_col_with_column_vartype(spark):
    """A Column vartype (mixed instant/accum tables) must dispatch per
    row — `vartype == 'instant'` on a Column used to raise at plan time."""
    from geoglue_spark.operators.timeagg import local_time_col

    df = spark.createDataFrame(
        [("2020-01-01 10:00:00", "instant"), ("2020-01-01 10:00:00", "accum")],
        "time string, vartype string",
    ).withColumn("time", F.col("time").cast("timestamp"))
    got = [
        str(r.local)
        for r in df.select(
            local_time_col(F.col("time"), 8, F.col("vartype")).alias("local")
        ).collect()
    ]
    assert got == ["2020-01-01 18:00:00", "2020-01-01 17:00:00"]
    # string column NAME works too
    got2 = [
        str(r.local)
        for r in df.select(
            local_time_col(F.col("time"), 8, "vartype").alias("local")
        ).collect()
    ]
    assert got2 == got


def test_rolling_weekly_dst_timezone_proof(spark):
    """The rolling frame must count WEEKS, not epoch seconds: under a DST
    timezone the fall-back Monday gap is 604800+3600s and a seconds-based
    lookback silently drops the prior week."""
    from geoglue_spark.operators.timeagg import rolling_weekly

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        weekly = spark.createDataFrame(
            [("2024-10-28", 10.0), ("2024-11-04", 30.0)],  # DST ends Nov 3
            "week_start string, value double",
        ).withColumn("week_start", F.col("week_start").cast("date"))
        got = {
            str(r.week_start): r.rolling_mean
            for r in rolling_weekly(weekly, window=2).collect()
        }
        assert got["2024-11-04"] == 20.0  # both weeks in frame
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_interval_join_boundary_end_and_same_instant(spark):
    """An interval ending exactly on a bucket boundary spans exactly
    len/bucket buckets (the epsilon was a float no-op at epoch magnitude),
    and a same-instant mid-bucket interval matches nothing."""
    from geoglue_spark.operators.timeagg import interval_join

    p = spark.createDataFrame([(1, 5), (2, 35_999)], "pid long, ts long")
    iv = spark.createDataFrame(
        [(1, 0, 36_000), (2, 5, 5)], "iid long, start long, end long"
    )
    # 36000s / 3600s = exactly 10 buckets: max_fanout=10 must NOT raise
    out = interval_join(p, iv, "ts", "start", "end",
                        bucket_seconds=3600, max_fanout=10)
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(1, 1), (2, 1)]
