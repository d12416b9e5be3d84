"""Resampling invariants mirroring the reference's tests
(tests/test_resample.py:18-67): resampled grid matches the target griddes,
bilinear reproduces linear fields, sparse-bilinear never loses cells plain
bilinear kept and has fewer NAs near the NaN coastline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark.grids import Grid, infer_grid
from geoglue_spark.operators.resample import (
    resample_bilinear,
    resample_distance,
    resample_sparse_bilinear,
)

SRC = Grid(x0=0.0, dx=1.0, nx=20, y0=0.0, dy=1.0, ny=20)
TGT = Grid(x0=2.0, dx=0.25, nx=40, y0=2.0, dy=0.25, ny=40)  # finer, interior


def _source_df(spark, f, nan_mask=None):
    ix, iy = np.meshgrid(np.arange(SRC.nx), np.arange(SRC.ny))
    lon, lat = SRC.centers(ix.ravel(), iy.ravel())
    val = f(lon, lat).astype(float)
    if nan_mask is not None:
        val[nan_mask(lon, lat)] = np.nan
    rows = [
        (float(a), float(b), None if np.isnan(v) else float(v))
        for a, b, v in zip(lon, lat, val)
    ]
    return spark.createDataFrame(rows, "lon double, lat double, value double")


def test_bilinear_exact_on_linear_field(spark):
    src = _source_df(spark, lambda lon, lat: 3.0 * lon + 2.0 * lat + 1.0)
    out = resample_bilinear(src, SRC, TGT).toPandas()
    assert len(out) == TGT.nx * TGT.ny
    want = 3.0 * out.lon + 2.0 * out.lat + 1.0
    np.testing.assert_allclose(out.value, want, rtol=1e-12)


def test_bilinear_constant_field(spark):
    src = _source_df(spark, lambda lon, lat: np.full_like(lon, 7.5))
    out = resample_bilinear(src, SRC, TGT).toPandas()
    np.testing.assert_allclose(out.value, 7.5)


def test_output_grid_matches_target(spark):
    src = _source_df(spark, lambda lon, lat: lon + lat)
    out = resample_bilinear(src, SRC, TGT)
    g = infer_grid(out)
    assert g.approx_equal(TGT)


def test_sparse_bilinear_no_coastline_bleed(spark):
    nan_mask = lambda lon, lat: lon < 5.0  # "ocean" west of lon 5
    f = lambda lon, lat: lon * 2.0 + lat
    src = _source_df(spark, f, nan_mask)
    plain = resample_bilinear(src, SRC, TGT).toPandas().set_index(["lon", "lat"])
    sparse = resample_sparse_bilinear(src, SRC, TGT).toPandas().set_index(["lon", "lat"])
    # reference invariant: sparse keeps every cell plain kept...
    kept_plain = plain[plain.value.notna()].index
    assert sparse.loc[kept_plain].value.notna().all()
    # ...and has strictly fewer NAs along the coast
    assert sparse.value.isna().sum() < plain.value.isna().sum()
    # far from the coast both agree exactly
    far = plain[plain.index.get_level_values("lon") > 7.0]
    np.testing.assert_allclose(
        sparse.loc[far.index].value, far.value, rtol=1e-9
    )


def test_sparse_bilinear_all_nan_region_stays_nan(spark):
    src = _source_df(spark, lambda lon, lat: lon, lambda lon, lat: lon < 8.0)
    sparse = resample_sparse_bilinear(src, SRC, TGT).toPandas()
    deep_ocean = sparse[sparse.lon < 6.0]
    assert deep_ocean.value.isna().all()


def test_distance_constant_field(spark):
    src = _source_df(spark, lambda lon, lat: np.full_like(lon, 3.25))
    out = resample_distance(src, SRC, TGT, k=4).toPandas()
    assert len(out) == TGT.nx * TGT.ny
    np.testing.assert_allclose(out.value, 3.25, rtol=1e-9)


def test_distance_smooth_field_approx(spark):
    f = lambda lon, lat: lon * 1.5 + lat * 0.5
    src = _source_df(spark, f)
    out = resample_distance(src, SRC, TGT, k=4).toPandas()
    want = f(out.lon.to_numpy(), out.lat.to_numpy())
    # IDW is not exact on linear fields but must be close on a smooth one
    assert np.abs(out.value - want).max() < 1.0


def test_dims_carried_through(spark):
    src = _source_df(spark, lambda lon, lat: lon + lat)
    two = src.withColumn("var", F.lit("a")).unionByName(
        src.withColumn("value", F.col("value") * 2).withColumn("var", F.lit("b"))
    )
    out = resample_bilinear(two, SRC, TGT, dims=["var"])
    counts = {r["var"]: r["n"] for r in out.groupBy("var").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": TGT.nx * TGT.ny, "b": TGT.nx * TGT.ny}


def test_coverage_gate_warns_and_raises(spark):
    """R4 (reference resample.py:118-129): source must cover target."""
    import warnings

    import pytest

    from geoglue_spark.grids import Grid
    from geoglue_spark.operators.resample import check_resample_coverage

    src = Grid(x0=100.0, dx=0.25, nx=8, y0=10.0, dy=0.25, ny=8)
    inside = Grid(x0=100.25, dx=0.1, nx=10, y0=10.25, dy=0.1, ny=10)
    outside = Grid(x0=99.0, dx=0.1, nx=10, y0=10.25, dy=0.1, ny=10)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning expected
        assert check_resample_coverage(src, inside) is True
    with pytest.warns(UserWarning, match="entirely cover"):
        assert check_resample_coverage(src, outside) is False
    with pytest.raises(ValueError, match="entirely cover"):
        check_resample_coverage(src, outside, strict=True)


def _source_df_real_nan(spark, f, nan_mask):
    """Like _source_df but keeps FLOAT NaN in the column (the CDO/xarray
    parquet encoding) instead of converting to SQL NULL."""
    ix, iy = np.meshgrid(np.arange(SRC.nx), np.arange(SRC.ny))
    lon, lat = SRC.centers(ix.ravel(), iy.ravel())
    val = f(lon, lat).astype(float)
    val[nan_mask(lon, lat)] = np.nan
    rows = [(float(a), float(b), float(v)) for a, b, v in zip(lon, lat, val)]
    return spark.createDataFrame(rows, "lon double, lat double, value double")


def test_sparse_bilinear_treats_float_nan_like_null(spark):
    """NaN-encoded missing values (not NULL) must not bleed: the sparse
    kernel's mask must treat NaN as invalid exactly like NULL."""
    nan_mask = lambda lon, lat: lon < 5.0
    f = lambda lon, lat: lon * 2.0 + lat
    as_null = resample_sparse_bilinear(
        _source_df(spark, f, nan_mask), SRC, TGT
    ).toPandas().set_index(["lon", "lat"]).sort_index()
    as_nan = resample_sparse_bilinear(
        _source_df_real_nan(spark, f, nan_mask), SRC, TGT
    ).toPandas().set_index(["lon", "lat"]).sort_index()
    assert (as_null.value.isna() == as_nan.value.isna()).all()
    np.testing.assert_allclose(
        as_nan.value.dropna(), as_null.value.dropna(), rtol=1e-12
    )


def test_bilinear_masks_float_nan_stencils(spark):
    """Plain bilinear: any NaN in the 4-cell stencil must yield NULL, the
    same contract as a NULL in the stencil."""
    nan_mask = lambda lon, lat: lon < 5.0
    f = lambda lon, lat: lon * 2.0 + lat
    as_null = resample_bilinear(
        _source_df(spark, f, nan_mask), SRC, TGT
    ).toPandas().set_index(["lon", "lat"]).sort_index()
    as_nan = resample_bilinear(
        _source_df_real_nan(spark, f, nan_mask), SRC, TGT
    ).toPandas().set_index(["lon", "lat"]).sort_index()
    assert (as_null.value.isna() == as_nan.value.isna()).all()
    np.testing.assert_allclose(
        as_nan.value.dropna(), as_null.value.dropna(), rtol=1e-12
    )
