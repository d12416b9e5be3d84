"""merge / reshape / validate / text operators."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geoglue_spark.geometry import Bbox
from geoglue_spark.operators import merge as M
from geoglue_spark.operators import reshape as R
from geoglue_spark.operators import text as TX
from geoglue_spark.operators import validate as V


# ---- merge -----------------------------------------------------------------
def test_crop_pushes_filter(spark):
    df = spark.createDataFrame(
        [(100.0, 10.0, 1.0), (105.0, 15.0, 2.0), (120.0, 50.0, 3.0)],
        "lon double, lat double, value double",
    )
    out = M.crop(df, Bbox(100, 10, 110, 20))
    assert out.count() == 2


def test_concat_time_and_variable_merge(spark):
    a = spark.createDataFrame([(1, 1.0)], "t int, x double")
    b = spark.createDataFrame([(2, 2.0)], "t int, x double")
    assert M.concat_time([a, b]).count() == 2
    ydf = spark.createDataFrame([(1, 9.0)], "t int, y double")
    merged = M.variable_merge([a, ydf], dims=["t"], value_cols=["x", "y"]).collect()
    assert merged[0].x == 1.0 and merged[0].y == 9.0


def test_combine_lineage_first_wins_order():
    # reference merge.py:46-57: distinct, newline-joined, first-seen order
    assert M.combine_lineage(["a", "b", "a", None, "c", "b"]) == "a\nb\nc"


def test_concat_with_lineage(spark):
    a = spark.createDataFrame([(1, "cfg-A")], "t int, geoglue_config string")
    b = spark.createDataFrame([(2, "cfg-B")], "t int, geoglue_config string")
    c = spark.createDataFrame([(3, "cfg-A")], "t int, geoglue_config string")
    out = M.concat_with_lineage([a, b, c]).collect()
    assert len(out) == 3
    assert all(r.geoglue_config == "cfg-A\ncfg-B" for r in out)


# ---- reshape ----------------------------------------------------------------
def test_collapse_step_to_month(spark):
    # two times, 6 steps each, NaN in different positions; 4 survive per time
    rows = []
    for t in (1, 2):
        for s in range(6):
            v = None if (s + t) % 3 == 0 else float(10 * t + s)
            rows.append((t, s, v))
    df = spark.createDataFrame(rows, "time int, step int, value double")
    dense = R.collapse_step_to_month(df, "time", "step", "value")
    assert R.assert_constant_month_count(dense, "time") == 4
    got = {(r.time, r.month): r.value for r in dense.collect()}
    # time=1: steps 0,1,3,4 survive (s=2,5 are NaN) -> months 1..4
    assert got[(1, 1)] == 10.0 and got[(1, 2)] == 11.0
    assert got[(1, 3)] == 13.0 and got[(1, 4)] == 14.0
    wide = R.months_wide(dense, "time", "value", n_months=4)
    assert wide.count() == 2 and "4" in wide.columns


def test_assert_constant_month_count_raises(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 3.0)], "time int, month int, value double"
    )
    with pytest.raises(AssertionError):
        R.assert_constant_month_count(df, "time")


def test_durations_matrix(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 15),), (dt.datetime(2021, 2, 1),)], "time timestamp"
    )
    out = {(r.time.month, r.month): r.days for r in R.durations(df, n_months=3).collect()}
    # 2020: Jan 31, Feb 29 (leap), Mar 31
    assert out[(1, 1)] == 31 and out[(1, 2)] == 29 and out[(1, 3)] == 31
    # 2021: Feb 28, Mar 31, Apr 30
    assert out[(2, 1)] == 28 and out[(2, 2)] == 31 and out[(2, 3)] == 30


# ---- validate ----------------------------------------------------------------
def test_summary_and_slice_stats(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 3.0)], "k string, value double"
    )
    s = V.summary_stats(df, ["value"]).collect()[0]
    assert s.value_nna == 1 and s.value_min == 1.0 and s.value_max == 3.0
    per = {r.k: r for r in V.per_slice_stats(df, ["k"]).collect()}
    assert per["a"].nna == 1 and per["b"].n == 1
    assert abs(V.na_fraction(df) - 1 / 3) < 1e-12


def test_check_value_range(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    V.check_value_range(df, "value", 0.0, 10.0)
    with pytest.raises(AssertionError):
        V.check_value_range(df, "value", 0.0, 1.5)
    with pytest.raises(ValueError):
        V.check_value_range(df, "value", 5.0, 1.0)


def test_check_pk_unique(spark):
    ok = spark.createDataFrame([(1,), (2,)], "pk int")
    V.check_pk_unique(ok, "pk")
    bad = spark.createDataFrame([(1,), (1,)], "pk int")
    with pytest.raises(AssertionError):
        V.check_pk_unique(bad, "pk")
    with pytest.raises(ValueError):
        V.check_pk_unique(ok, "nope")


# ---- text ---------------------------------------------------------------------
def test_token_and_quality_cols(spark):
    df = spark.createDataFrame(
        [("one two three",), ("",), ("   ",), ("word",)], "text string"
    )
    out = df.select(
        TX.token_count_col(F.col("text")).alias("n"),
        TX.quality_score_col(F.col("text")).alias("q"),
    ).collect()
    assert [r.n for r in out] == [3, 0, 0, 1]
    assert out[0].q > out[3].q  # longer doc scores higher
    assert out[1].q == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is that",),
            ("le chat est dans la maison pour un moment",),
            ("el perro es un animal que vive en la casa",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    out = [r.lang for r in df.select(TX.lang_id_udf()(F.col("text")).alias("lang")).collect()]
    assert out[0] == "en" and out[1] == "fr" and out[2] == "es" and out[3] == "und"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([("A  b c",), ("a b C ",)], "text string")
    fps = [r.fp for r in df.select(TX.fingerprint_col(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
