"""Pure-NumPy classic netCDF-3 codec (S8 raster-source fidelity —
reference util.py:26-35 opens .nc by suffix dispatch)."""

import struct

import numpy as np
import pytest

from geoglue_spark.sources.netcdf3 import (
    NC_ATTRIBUTE,
    NC_DIMENSION,
    NC_VARIABLE,
    read_netcdf3,
    netcdf3_to_pixels,
    read_netcdf3_distributed,
    write_netcdf3,
)


def _fixture(path, ny=6, nx=7, seed=1):
    rng = np.random.Generator(np.random.PCG64(seed))
    lon = (100.125 + 0.25 * np.arange(nx)).astype(np.float64)
    lat = (10.125 + 0.25 * np.arange(ny)).astype(np.float64)
    t2m = rng.standard_normal((ny, nx)).astype(np.float32) * 10 + 290
    write_netcdf3(
        str(path),
        dims=[("latitude", ny), ("longitude", nx)],
        variables={
            "latitude": (["latitude"], lat),
            "longitude": (["longitude"], lon),
            "t2m": (["latitude", "longitude"], t2m),
        },
        attrs={"title": "synthetic era5 slice", "version": np.int32(3)},
    )
    return lon, lat, t2m


def test_round_trip_fixed_vars(tmp_path):
    lon, lat, t2m = _fixture(tmp_path / "a.nc")
    nc = read_netcdf3(str(tmp_path / "a.nc"))
    assert [d[0] for d in nc.dims] == ["latitude", "longitude"]
    assert nc.attrs["title"] == "synthetic era5 slice"
    assert nc.attrs["version"] == 3
    np.testing.assert_array_equal(nc.data["longitude"], lon)
    np.testing.assert_array_equal(nc.data["latitude"], lat)
    np.testing.assert_array_equal(nc.data["t2m"], t2m)
    assert nc.data["t2m"].dtype == np.float32


def test_round_trip_odd_sizes_and_int_types(tmp_path):
    # odd lengths exercise the 4-byte padding paths (i2 x 5 = 10 bytes -> pad 2)
    v16 = np.arange(5, dtype=np.int16)
    v8 = np.arange(3, dtype=np.int8)
    write_netcdf3(
        str(tmp_path / "b.nc"),
        dims=[("n5", 5), ("n3", 3)],
        variables={"a": (["n5"], v16), "b": (["n3"], v8)},
    )
    nc = read_netcdf3(str(tmp_path / "b.nc"))
    np.testing.assert_array_equal(nc.data["a"], v16)
    np.testing.assert_array_equal(nc.data["b"], v8)


def test_rejects_netcdf4_hdf5_with_clear_error():
    with pytest.raises(ValueError, match="netCDF-4/HDF5"):
        read_netcdf3("/root/reference/tests/data/SGP-2019-era5.instant.nc")


def test_pixels_table_and_zonal_style_agg(spark, tmp_path):
    """File -> long-form table -> the same mean a NumPy oracle computes."""
    lon, lat, t2m = _fixture(tmp_path / "c.nc")
    df = netcdf3_to_pixels(spark, str(tmp_path / "c.nc"), "t2m")
    assert df.count() == lon.size * lat.size
    got = df.agg({"value": "avg"}).collect()[0][0]
    np.testing.assert_allclose(got, float(np.asarray(t2m, np.float64).mean()), rtol=1e-12)
    # grid inference works on the emitted table
    from geoglue_spark.grids import infer_grid

    g = infer_grid(df)
    assert g.nx == lon.size and g.ny == lat.size and abs(g.dx - 0.25) < 1e-9


def test_scale_offset_and_fillvalue(tmp_path, spark):
    """CF packing attrs (scale_factor/add_offset/_FillValue) are applied —
    ERA5 shorts decode to physical values, fills become NaN/NULL."""
    packed = np.array([[0, 100], [200, -32767]], np.int16)
    write_netcdf3(
        str(tmp_path / "d.nc"),
        dims=[("latitude", 2), ("longitude", 2)],
        variables={
            "latitude": (["latitude"], np.array([10.0, 10.25])),
            "longitude": (["longitude"], np.array([100.0, 100.25])),
            "t2m": (["latitude", "longitude"], packed),
        },
    )
    # inject packing attrs by rewriting the var attrs through the reader's
    # own structures is overkill: write attrs via a second file instead
    nc = read_netcdf3(str(tmp_path / "d.nc"))
    nc.variables["t2m"].attrs.update(
        {"scale_factor": 0.01, "add_offset": 273.15, "_FillValue": -32767}
    )
    # monkeypatch-free: drive the adapter's attr logic directly
    import geoglue_spark.sources.netcdf3 as N

    orig = N.read_netcdf3
    try:
        N.read_netcdf3 = lambda p, load=True: nc
        df = netcdf3_to_pixels(spark, "ignored", "t2m")
    finally:
        N.read_netcdf3 = orig
    vals = {(r.lon, r.lat): r.value for r in df.collect()}
    assert abs(vals[(100.0, 10.0)] - 273.15) < 1e-9
    assert abs(vals[(100.25, 10.0)] - 274.15) < 1e-9
    import math

    # Arrow maps NaN -> NULL on ingestion; both mean "missing" to the
    # engine's P7 masking, so accept either
    v = vals[(100.25, 10.25)]
    assert v is None or math.isnan(v)


def test_distributed_parse_many_files(spark, tmp_path):
    """The 100-TB shape: N files parsed on executors via mapInPandas."""
    paths = []
    for i in range(3):
        p = tmp_path / f"part{i}.nc"
        _fixture(p, seed=i)
        paths.append(str(p))
    df = read_netcdf3_distributed(spark, paths, "t2m")
    assert df.count() == 3 * 6 * 7
    assert df.select("src").distinct().count() == 3
    # zero rows of this plan run on the driver: it is a mapInPandas over a
    # parallelized path list
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_record_variable_layout():
    """Hand-crafted CDF-1 file with an unlimited dim: record slabs stitch
    across records (spec: begin + rec * recsize)."""
    # dims: time(unlimited), x(2); vars: v(time, x) float32
    name_v = b"\x00\x00\x00\x01v\x00\x00\x00"
    name_time = b"\x00\x00\x00\x04time"
    name_x = b"\x00\x00\x00\x01x\x00\x00\x00"
    header = b"CDF\x01" + struct.pack(">I", 3)  # numrecs = 3
    header += struct.pack(">II", NC_DIMENSION, 2)
    header += name_time + struct.pack(">I", 0)
    header += name_x + struct.pack(">I", 2)
    header += struct.pack(">II", 0, 0)  # no global attrs
    header += struct.pack(">II", NC_VARIABLE, 1)
    begin = len(header) + len(name_v) + 4 + 8 + 8 + 8 + 4  # after var entry
    header += (
        name_v
        + struct.pack(">I", 2)            # ndims
        + struct.pack(">II", 0, 1)        # dim ids: time, x
        + struct.pack(">II", 0, 0)        # no var attrs
        + struct.pack(">II", 5, 8)        # NC_FLOAT, vsize = 2*4
        + struct.pack(">I", begin)
    )
    data = np.arange(6, dtype=">f4").tobytes()  # 3 records x 2 values
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".nc", delete=False) as fh:
        fh.write(header + data)
        path = fh.name
    try:
        nc = read_netcdf3(path)
        np.testing.assert_array_equal(
            nc.data["v"], np.arange(6, dtype=np.float32).reshape(3, 2)
        )
    finally:
        os.unlink(path)


def test_streaming_numrecs_sentinel():
    """numrecs=0xFFFFFFFF (STREAMING) is computed from the file size
    (review regression: the sentinel used to flow into np.empty)."""
    name_v = b"\x00\x00\x00\x01v\x00\x00\x00"
    name_time = b"\x00\x00\x00\x04time"
    name_x = b"\x00\x00\x00\x01x\x00\x00\x00"
    header = b"CDF\x01" + struct.pack(">I", 0xFFFFFFFF)
    header += struct.pack(">II", NC_DIMENSION, 2)
    header += name_time + struct.pack(">I", 0)
    header += name_x + struct.pack(">I", 2)
    header += struct.pack(">II", 0, 0)
    header += struct.pack(">II", NC_VARIABLE, 1)
    begin = len(header) + len(name_v) + 4 + 8 + 8 + 8 + 4
    header += (
        name_v + struct.pack(">I", 2) + struct.pack(">II", 0, 1)
        + struct.pack(">II", 0, 0) + struct.pack(">II", 5, 8)
        + struct.pack(">I", begin)
    )
    data = np.arange(6, dtype=">f4").tobytes()  # 3 records worth
    import os, tempfile

    with tempfile.NamedTemporaryFile(suffix=".nc", delete=False) as fh:
        fh.write(header + data)
        path = fh.name
    try:
        nc = read_netcdf3(path)
        assert nc.numrecs == 3
        np.testing.assert_array_equal(
            nc.data["v"], np.arange(6, dtype=np.float32).reshape(3, 2)
        )
    finally:
        os.unlink(path)


def test_3d_with_cf_units_emits_time_column(spark, tmp_path):
    """A (time, lat, lon) classic file whose time coord carries CF units
    must emit a real 'time' timestamp column — the name zonalstats'
    by_dims and resample dims key on (review regression: it was
    'time_idx', silently pooling hours)."""
    lon = np.array([100.0, 100.25])
    lat = np.array([10.0, 10.25])
    tvals = np.array([0, 24], np.int32)  # hours since epoch
    arr = np.arange(8, dtype=np.float64).reshape(2, 2, 2)
    write_netcdf3(
        str(tmp_path / "t.nc"),
        dims=[("time", 2), ("latitude", 2), ("longitude", 2)],
        variables={
            "time": (["time"], tvals, {"units": "hours since 1970-01-01"}),
            "latitude": (["latitude"], lat),
            "longitude": (["longitude"], lon),
            "t2m": (["time", "latitude", "longitude"], arr),
        },
    )
    df = netcdf3_to_pixels(spark, str(tmp_path / "t.nc"), "t2m", time_name="time")
    assert "time" in df.columns and "time_idx" not in df.columns
    times = sorted(r.time for r in df.select("time").distinct().collect())
    assert str(times[0]).startswith("1970-01-01 00") and str(times[1]).startswith("1970-01-02 00")
