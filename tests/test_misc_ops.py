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
    out = [r.lang for r in df.select(TX.lang_id_col(F.col("text")).alias("lang")).collect()]
    assert out[0] == "en" and out[1] == "fr" and out[2] == "es" and out[3] == "und"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([("A  b c",), ("a b C ",)], "text string")
    fps = [r.fp for r in df.select(TX.fingerprint_col(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


# ---- P6 longitude normalization ---------------------------------------------
def test_normalize_longitudes(spark):
    df = spark.createDataFrame(
        [(0.0,), (180.0,), (359.75,), (275.0,), (-170.0,), (100.0,)], "lon double"
    )
    got = [r.lon for r in M.normalize_longitudes(df).collect()]
    assert got == [0.0, -180.0, -0.25, -85.0, -170.0, 100.0]
    # idempotent
    got2 = [r.lon for r in M.normalize_longitudes(M.normalize_longitudes(df)).collect()]
    assert got2 == got


# ---- F-family scalar functions ----------------------------------------------
def test_get_timezone_unique_and_multi():
    from geoglue_spark.functions import get_timezone

    assert get_timezone("KHM") == "+07:00"  # Asia/Phnom_Penh, single zone
    assert get_timezone("NPL") == "+05:45"  # non-integer offset country
    assert get_timezone("USA") is None  # spans many zones -> None
    assert get_timezone("BR") is None  # ISO2 accepted directly
    with pytest.raises(KeyError):
        get_timezone("XXX")


def test_zero_padded_intrange():
    from geoglue_spark.functions import zero_padded_intrange

    assert zero_padded_intrange(1, 9) == [f"{i:02d}" for i in range(1, 10)]
    assert zero_padded_intrange(1, 9, inclusive=False) == [str(i) for i in range(1, 9)]
    assert zero_padded_intrange(8, 12) == ["08", "09", "10", "11", "12"]
    with pytest.raises(ValueError):
        zero_padded_intrange(5, 5)


def test_logfmt_escape_and_line():
    from geoglue_spark.functions import logfmt, logfmt_escape

    assert logfmt_escape("ok") == "ok"
    assert logfmt_escape("has space") == '"has space"'
    assert logfmt_escape('weird="val"') == '"weird=\\"val\\""'
    assert logfmt_escape(None) == '""'
    assert logfmt_escape("back\\slash") == '"back\\\\slash"'
    assert logfmt({"a": 1, "b": "x y"}) == 'a=1 b="x y"'


def test_bias_corrected():
    from geoglue_spark.functions import bias_corrected

    src = {"long_name": "Total precipitation", "short_name": "tp", "units": "m"}
    out = bias_corrected(src)
    assert out["long_name"] == "Total precipitation (bias_corrected)"
    assert out["short_name"] == "tp_bc"
    assert out["units"] == "m" and src["short_name"] == "tp"  # input untouched


# ---- P10/A5 month completeness ------------------------------------------------
def test_monthly_split_completeness(spark):
    from geoglue_spark.operators.timeagg import month_completeness, monthly_split

    rows = (
        [(dt.datetime(2019, 1, d, 12),) for d in range(1, 32)]  # full January
        + [(dt.datetime(2019, 2, d, 12),) for d in range(1, 16)]  # half February
    )
    df = spark.createDataFrame(rows, "time timestamp")
    tagged = monthly_split(df)
    flags = {
        (r.year, r.month): r.month_complete
        for r in tagged.select("year", "month", "month_complete").distinct().collect()
    }
    assert flags == {(2019, 1): True, (2019, 2): False}
    summ = {(r.year, r.month): r.complete for r in month_completeness(df).collect()}
    assert summ == {(2019, 1): True, (2019, 2): False}


# ---- job config / lineage round-trip -----------------------------------------
def test_zonal_job_config_lineage_roundtrip(spark):
    from geoglue_spark.config import ZonalJobConfig, read_job_configs

    cfg = ZonalJobConfig(
        raster="/data/era5 2019.parquet",  # space forces quoting
        admins="/data/gadm41_KHM.parquet",
        admins_pk="GID_2",
        output="/out/kh_t2m.parquet",
        operation="weighted_mean(area_spherical_km2)",
        weights="/data/pop.parquet",
    )
    line = cfg.lineage()
    assert 'raster="/data/era5 2019.parquet"' in line
    assert ZonalJobConfig.from_lineage(line) == cfg
    # None weights round-trips too
    cfg2 = ZonalJobConfig("r", "a", "pk", "o", "mean")
    assert ZonalJobConfig.from_lineage(cfg2.lineage()) == cfg2
    assert read_job_configs(f"{cfg}\n{cfg2}\n") == [cfg, cfg2]
    with pytest.raises(KeyError, match="missing"):
        ZonalJobConfig.from_lineage("raster=x output=y")


def test_config_lineage_through_concat(spark):
    """The lineage string survives concat_with_lineage's ordered distinct
    combination (reference merge.py:46-57 + zonalstats.py:137)."""
    from geoglue_spark.config import ZonalJobConfig

    c1 = ZonalJobConfig("r1", "a", "pk", "o1", "mean").lineage()
    c2 = ZonalJobConfig("r2", "a", "pk", "o2", "sum").lineage()
    f1 = spark.createDataFrame([(1.0, c1)], "v double, geoglue_config string")
    f2 = spark.createDataFrame([(2.0, c2)], "v double, geoglue_config string")
    out = M.concat_with_lineage([f1, f2, f1])
    combined = out.select("geoglue_config").distinct().collect()[0][0]
    assert combined == f"{c1}\n{c2}"
    # each line parses back into the original config
    from geoglue_spark.config import read_job_configs

    assert [c.raster for c in read_job_configs(combined)] == ["r1", "r2"]


# ---- variable registry ---------------------------------------------------------
def test_registry_from_toml_and_rules():
    from geoglue_spark.operators import resample as RS
    from geoglue_spark.registry import VariableRegistry, default_registry, resampler_for

    reg = default_registry()
    assert reg["t2m"].vartype == "instant" and reg["tp"].vartype == "accum"
    # explicit override beats the daily_sum rule
    assert reg["ssrd"].effective_resampling == "bilinear"
    assert reg["tp"].effective_resampling == "distance"
    assert resampler_for(reg["tp"]) is RS.resample_distance
    assert resampler_for(reg["t2m"]) is RS.resample_sparse_bilinear
    assert reg["ws10"].depends == ("u10", "v10")
    with pytest.raises(ValueError, match="unknown statistics"):
        VariableRegistry.from_toml('[x.y]\nstatistics = ["weekly_mode"]\n')


def test_apply_daily_statistics_dispatch(spark):
    from geoglue_spark.registry import apply_daily_statistics, default_registry

    rows = [
        ("t2m", dt.datetime(2019, 1, 1, h), float(h)) for h in range(24)
    ] + [("tp", dt.datetime(2019, 1, 1, h), 1.0) for h in range(24)]
    df = spark.createDataFrame(rows, "var string, time timestamp, value double")
    out = apply_daily_statistics(df, default_registry())
    got = {(r.var, r.stat): r.value for r in out.collect()}
    assert got == {
        ("t2m", "daily_mean"): 11.5,
        ("t2m", "daily_min"): 0.0,
        ("t2m", "daily_max"): 23.0,
        ("tp", "daily_sum"): 24.0,
    }


def test_winnow_fingerprints_formulations_agree(spark):
    """The explode+window winnowing pipeline must equal the single-Column
    reference expression, and shared substrings must share fingerprints."""
    from geoglue_spark.operators.text import winnow_fingerprints, winnow_fingerprints_col

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{common} lambda mu nu xi omicron pi rho sigma tau"),
        (2, f"intro words here {common} and a different tail entirely now"),
        (3, "short doc"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = {
        r.doc_id: list(r.fp)
        for r in docs.select(
            "doc_id", winnow_fingerprints_col(F.col("text")).alias("fp")
        ).collect()
    }
    got = {
        r.doc_id: list(r.fingerprints)
        for r in winnow_fingerprints(docs, "text", "doc_id").collect()
    }
    assert got == ref
    # winnowing guarantee: documents sharing a long substring share >= 1 fp
    assert set(got[1]) & set(got[2])
    assert not (set(got[1]) & set(got[3]))


def test_punct_and_stopword_ratios(spark):
    from geoglue_spark.operators.text import punct_ratio_col, stopword_ratio_col

    df = spark.createDataFrame(
        [("the cat, the hat!!",), ("no stop words here",), ("",)], "text string"
    )
    rows = df.select(
        punct_ratio_col(F.col("text")).alias("p"),
        stopword_ratio_col(F.col("text")).alias("s"),
    ).collect()
    # "the cat, the hat!!": 3 punct chars of 18; stopword 'the' twice of 4 tokens
    assert abs(rows[0].p - 3 / 18) < 1e-12
    assert abs(rows[0].s - 2 / 4) < 1e-12
    assert rows[1].s == 0.0 and rows[2].p == 0.0 and rows[2].s == 0.0


def test_winnow_grouped_false_matches_exploded_grouped(spark):
    """grouped=False == explode(grouped) row-for-row, with carry columns
    passed through (the fused stats path)."""
    from pyspark.sql import functions as F

    from geoglue_spark.operators.text import winnow_fingerprints

    rows = [
        (1, "s1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "s1", "alpha beta gamma delta epsilon zeta eta theta other tail"),
        (3, "s2", "completely different words in this one right here folks"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    grouped = winnow_fingerprints(docs, "text", "doc_id")
    want = {
        (r.doc_id, f) for r in grouped.collect() for f in r.fingerprints
    }
    flat = winnow_fingerprints(
        docs, "text", "doc_id", grouped=False, carry=("source",), out_col="fp"
    ).collect()
    assert {(r.doc_id, r.fp) for r in flat} == want
    src = dict((r[0], r[1]) for r in rows)
    assert all(r.source == src[r.doc_id] for r in flat)


def test_collapse_step_drops_float_nan_steps(spark):
    """NaN (not just NULL) steps must not receive month indices — a NaN
    survivor would shift every later real step to the wrong month."""
    df = spark.createDataFrame(
        [
            ("2020-01-01", 1, float("nan")),
            ("2020-01-01", 2, 10.0),
            ("2020-01-01", 3, 20.0),
        ],
        "time string, step int, value double",
    )
    out = {r.month: r.value for r in R.collapse_step_to_month(df, "time", "step", "value").collect()}
    assert out == {1: 10.0, 2: 20.0}


def test_check_value_range_nan_counts_as_na_not_oob(spark):
    """Spark orders NaN above every value; the oob predicate must exclude
    NaN so max_na_frac stays reachable, and None bounds mean unbounded
    (ValidationSpec's default max=None)."""
    import pytest

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (3.0,)], "value double"
    )
    V.check_value_range(df, "value", 0.0, 10.0, max_na_frac=0.5)  # NaN allowed
    with pytest.raises(AssertionError, match="NA fraction"):
        V.check_value_range(df, "value", 0.0, 10.0, max_na_frac=0.1)
    V.check_value_range(df, "value", 0.0, None, max_na_frac=0.5)  # open above
    V.check_value_range(df, "value", None, None, max_na_frac=0.5)
    with pytest.raises(AssertionError, match="outside"):
        V.check_value_range(df, "value", None, 2.5, max_na_frac=0.5)


def test_validation_spec_default_max_none_applies(spark):
    from geoglue_spark.config import ValidationSpec

    df = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    ValidationSpec(min=0.0, max=None, max_na_frac=0.0).apply(df)  # must not raise


def test_doc_oracles_agree_on_degenerate_corpus(spark, tmp_path):
    """doc_token_stats / doc_dedup_stats Spark vs DuckDB parity on a
    corpus WITH NULL, empty, and sub-n-token docs — the degenerate shapes
    the sf fixtures happen not to contain (latent oracle divergences were
    found here: avg denominators and NULL-distinct counting)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    rows = []
    for i in range(60):
        if i % 10 == 0:
            text = None
        elif i % 10 == 1:
            text = ""
        elif i % 10 == 2:
            text = "one"
        else:
            text = f"alpha beta gamma doc {i} " * (i % 4 + 1)
        rows.append(
            (i, text, "en" if i % 2 else "fr", f"s{i % 3}",
             len(text) if text else 0)
        )
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    (tmp_path / "d").mkdir()
    pdf.to_parquet(str(tmp_path / "d" / "documents.parquet"), index=False)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/d/documents.parquet')"
    )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    for k in ("doc_token_stats", "doc_dedup_stats"):
        sdf = qs[k](spark, str(tmp_path / "d"))
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(r[c] for c in scols) for r in sdf.collect()
        )
        ores = con.execute(osql[k])
        ocols = [d[0] for d in ores.description]
        odf = ores.fetchdf()[sorted(ocols)]
        orows = sorted(tuple(r) for r in odf.itertuples(index=False))

        def norm(rows):
            return [
                tuple(
                    None
                    if v is None or (isinstance(v, float) and v != v)
                    else (round(v, 6) if isinstance(v, float) else v)
                    for v in row
                )
                for row in rows
            ]

        assert norm(srows) == norm(orows), k
