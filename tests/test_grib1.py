"""GRIB edition-1 reader vs the reference's real fixture — validated by
CROSS-FORMAT agreement: the GRIB file carries the same year of ERA5 data
as the netCDF-4 fixtures, decoded by two fully independent pure-NumPy
paths (WMO GRIB1 simple packing vs HDF5 chunks+shuffle+deflate)."""

import numpy as np
import pytest

from geoglue_spark.sources.grib1 import grib1_to_pixels, parse_grib1, read_grib1_distributed
from geoglue_spark.sources.hdf5 import decode_time, read_hdf5

GRIB = "/root/reference/tests/data/SGP-2019-era5_grib.grib"
NC_INSTANT = "/root/reference/tests/data/SGP-2019-era5.instant.nc"
NC_ACCUM = "/root/reference/tests/data/SGP-2019-era5.accum.nc"


@pytest.fixture(scope="module")
def grib_records():
    return parse_grib1(GRIB)


def test_grib_inventory(grib_records):
    assert len(grib_records) == 17520  # 2 vars x 8760 hours
    names = {r.name for r in grib_records}
    assert names == {"t2m", "tp"}
    r = grib_records[0]
    assert (r.ni, r.nj) == (9, 5) and r.lat0 == 2.0 and r.lon0 == 103.0


@pytest.mark.parametrize("name,nc_path", [("t2m", NC_INSTANT), ("tp", NC_ACCUM)])
def test_cross_format_agreement(grib_records, name, nc_path):
    """Every sampled hour must decode identically from GRIB1 and from
    netCDF-4 (the nc files were converted from this GRIB, so the packed
    values agree exactly)."""
    f = read_hdf5(nc_path)
    nc = f.datasets[name].read()
    t = f.datasets["valid_time"]
    nc_times = decode_time(t.read(), t.attrs["units"])
    recs = sorted((r for r in grib_records if r.name == name), key=lambda r: r.time)
    assert len(recs) == 8760
    worst = 0.0
    for i in range(0, 8760, 61):
        g = recs[i]
        idx = np.where(nc_times == np.datetime64(g.time))[0]
        assert idx.size == 1, g.time
        a, b = g.values, np.asarray(nc[int(idx[0])], np.float64)
        m = np.isfinite(a) & np.isfinite(b)
        worst = max(worst, float(np.abs(a[m] - b[m]).max()))
    assert worst < 1e-6, worst


def test_grib1_to_pixels_spark(spark):
    df = grib1_to_pixels(spark, GRIB, params={167})  # t2m only
    from pyspark.sql import functions as F

    assert df.count() == 8760 * 45
    m = df.agg(F.avg("value")).collect()[0][0]
    assert 299 < m < 302


def test_distributed_and_dispatch(spark):
    df = read_grib1_distributed(spark, [GRIB], params={228})
    assert df.filter("var = 'tp'").count() == 8760 * 45
    from geoglue_spark.api import raster_from_file

    d2 = raster_from_file(spark, GRIB, var="t2m")
    assert d2.count() == 8760 * 45


def test_raster_from_file_keeps_var_for_multiparam_grib(spark):
    """var=None on a multi-parameter GRIB keeps the 'var' column (review
    regression: it was dropped, mixing t2m with tp in one value column)."""
    from geoglue_spark.api import raster_from_file

    df = raster_from_file(spark, GRIB)
    assert "var" in df.columns
    assert df.select("var").distinct().count() == 2


def test_grib1_bitmap_section(tmp_path):
    """Hand-crafted GRIB1 message with a BMS bitmap: unmasked points get
    decoded values, masked ones NaN (spec: BDS stores only present
    points)."""
    import struct

    # 3x2 lat/lon grid, bitmap 1,0,1,1,0,1 -> 4 stored 8-bit values
    pds = struct.pack(
        ">BBB BBBBB B B H BBBBB B BB B H B B B H".replace(" ", ""),
        0, 0, 28,          # PDS length
        128, 98, 1, 255, 0xC0,  # table, centre, process, grid, flags GDS+BMS
        167,               # parameter t2m
        1,                 # level type
        0,                 # level (2 bytes)
        20, 1, 1, 0, 0,    # yy mm dd hh mi
        1,                 # time unit (hours)
        0, 0,              # P1 P2
        0,                 # TRI
        0,                 # num in average (2 bytes)
        0,                 # missing
        21,                # century -> year 2020
        0,                 # subcentre
        0,                 # decimal scale (2 bytes)
    )
    assert len(pds) == 28
    def s3(v):
        return struct.pack(">I", v)[1:]
    gds = (
        s3(32) + bytes([0, 255, 0])           # len, NV, PV, type=latlon
        + struct.pack(">HH", 3, 2)            # Ni, Nj
        + s3(10000) + s3(100000)              # La1 10.0, Lo1 100.0
        + bytes([0])                          # res flags
        + s3(10250) + s3(100500)              # La2 10.25, Lo2 100.5
        + struct.pack(">HH", 250, 250)        # Di Dj
        + bytes([0])                          # scan: +i, -j
        + bytes(32 - 28)
    )
    assert len(gds) == 32
    bms = s3(8) + bytes([10]) + struct.pack(">H", 0) + bytes([0b10110100, 0])
    assert len(bms) == 8
    # BDS: R=300 (IBM: exp 64+3, mantissa 300/16^3 * 2^24), E=0, 8 bits
    ibm_r = bytes([67]) + struct.pack(">I", int(300 / 16**3 * (1 << 24)))[1:]
    data = bytes([0, 1, 2, 3])
    bds = s3(11 + len(data) + 1) + bytes([0]) + struct.pack(">h", 0) + ibm_r + bytes([8]) + data + b"\x00"
    body = pds + gds + bms + bds + b"7777"
    msg = b"GRIB" + s3(8 + len(body)) + bytes([1]) + body
    p = tmp_path / "bm.grib"
    p.write_bytes(msg)

    from geoglue_spark.sources.grib1 import parse_grib1

    recs = parse_grib1(str(p))
    assert len(recs) == 1
    r = recs[0]
    assert r.name == "t2m" and (r.ni, r.nj) == (3, 2)
    v = r.values.ravel()
    np.testing.assert_allclose(v[[0, 2, 3, 5]], [300, 301, 302, 303])
    assert np.isnan(v[1]) and np.isnan(v[4])
    assert str(r.time).startswith("2020-01-01")


def _mini_grib1(ni, nj, lo1_milli, lo2_milli, la1_milli=10_000, la2_milli=0):
    """Hand-assembled minimal GRIB1 message: lat/lon GDS + nbits=0 BDS
    (all values = reference 0.0) — just enough for the grid math."""

    def i3(v):
        v &= 0xFFFFFF
        return bytes([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])

    def s3(v):
        return i3(v if v >= 0 else (0x800000 | abs(v)))

    pds = bytearray(28)
    pds[0:3] = i3(28)
    pds[7] = 0x80  # GDS present
    pds[8] = 167   # t2m
    pds[12:17] = bytes([19, 1, 1, 0, 0])  # yy mm dd hh mi
    pds[24] = 21   # century -> 2019
    gds = bytearray(32)
    gds[0:3] = i3(32)
    gds[5] = 0  # lat/lon grid
    gds[6:8] = ni.to_bytes(2, "big")
    gds[8:10] = nj.to_bytes(2, "big")
    gds[10:13] = s3(la1_milli)
    gds[13:16] = s3(lo1_milli)
    gds[17:20] = s3(la2_milli)
    gds[20:23] = s3(lo2_milli)
    gds[27] = 0x00  # scan: -j (north -> south)
    bds = bytearray(11)
    bds[0:3] = i3(11)  # flags 0, e_scale 0, IBM ref 0.0, nbits 0
    total = 8 + len(pds) + len(gds) + len(bds) + 4
    return (
        b"GRIB" + i3(total) + bytes([1]) + bytes(pds) + bytes(gds)
        + bytes(bds) + b"7777"
    )


def test_grib1_dlon_global_and_antimeridian(tmp_path):
    """dlon must survive BOTH a global grid (span > 180 deg is legitimate)
    and an antimeridian-crossing regional grid (lo2 < lo1 wraps mod 360).
    A '>180 means wrapped' flip corrupted every global grid."""
    from geoglue_spark.sources.grib1 import parse_grib1

    # global: lo1=0, lo2=359.75, ni=1440 -> dlon 0.25
    p = str(tmp_path / "global.grib")
    open(p, "wb").write(_mini_grib1(1440, 3, 0, 359_750))
    rec = parse_grib1(p)[0]
    assert rec.dlon == pytest.approx(359.75 / 1439, rel=1e-9)

    # antimeridian: lo1=177, lo2=-177, ni=25 -> span 6 deg, dlon 0.25
    p2 = str(tmp_path / "fiji.grib")
    open(p2, "wb").write(_mini_grib1(25, 3, 177_000, -177_000))
    rec2 = parse_grib1(p2)[0]
    assert rec2.dlon == pytest.approx(6.0 / 24, rel=1e-9)
