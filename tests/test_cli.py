"""CLI surface parity (reference src/geoglue/cli.py:89-305): crop/merge
pipeline composition via manifests, zonalstats operation defaulting +
alias resolution, griddes/stats output."""

import json
import os
import subprocess
import sys

import pytest

from geoglue_spark.cli import main


def _raster_rows(two_vars=True):
    rows = []
    for var in (["t2m", "tp"] if two_vars else ["t2m"]):
        for iy in range(16):
            for ix in range(16):
                rows.append(
                    (var, 100.125 + ix * 0.25, 10.125 + iy * 0.25,
                     float(ix + iy + (100 if var == "tp" else 0)))
                )
    return rows


@pytest.fixture()
def raster_path(spark, tmp_path):
    p = str(tmp_path / "raster.parquet")
    spark.createDataFrame(
        _raster_rows(), "var string, lon double, lat double, value double"
    ).write.parquet(p)
    return p


@pytest.fixture()
def region_file(tmp_path):
    feat = {
        "type": "Feature",
        "properties": {"GID_2": "R0"},
        "geometry": {"type": "Polygon", "coordinates": [
            [[101.2, 11.2], [102.8, 11.2], [102.8, 12.8], [101.2, 12.8], [101.2, 11.2]]
        ]},
    }
    p = tmp_path / "region.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": [feat]}))
    return str(p)


def test_crop_split_manifest_then_merge(spark, tmp_path, raster_path, capsys):
    out = str(tmp_path / "cropped.parquet")
    rc = main(["crop", raster_path, "101,11,103,13", "-o", out])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    # two variables -> two "crop <path>" manifest lines (reference
    # cli.py:183-186 pipeline style)
    assert len(lines) == 2 and all(l.startswith("crop ") for l in lines)
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("\n".join(lines))
    merged_path = str(tmp_path / "merged.parquet")
    rc = main(["merge", "--file", str(manifest), "-o", merged_path])
    assert rc == 0
    got = spark.read.parquet(merged_path)
    # 8x8 cells inside the bbox per variable
    assert got.count() == 2 * 64
    assert {r["var"] for r in got.select("var").distinct().collect()} == {"t2m", "tp"}
    lons = [r.lon for r in got.select("lon").distinct().collect()]
    assert min(lons) >= 101 and max(lons) <= 103


def test_crop_bounds_from_region_name_and_path_pk(
    spark, tmp_path, raster_path, region_file, capsys
):
    cfg = tmp_path / "geoglue.toml"
    cfg.write_text(f'[region.viet]\nfile = "{region_file}"\npk = "GID_2"\n')
    out1 = str(tmp_path / "c1.parquet")
    assert main(["crop", raster_path, "viet", "-c", str(cfg), "-o", out1,
                 "--no-split"]) == 0
    out2 = str(tmp_path / "c2.parquet")
    assert main(["crop", raster_path, f"{region_file}::GID_2", "-o", out2,
                 "--no-split"]) == 0
    capsys.readouterr()
    a = spark.read.parquet(out1).count()
    b = spark.read.parquet(out2).count()
    # region bbox integer hull = [101,11]..[103,13] -> 8x8 cells x 2 vars
    assert a == b == 2 * 64


def test_crop_rejects_bounds_outside_source(raster_path, capsys):
    assert main(["crop", raster_path, "90,0,120,30", "-o", "/tmp/nope.parquet"]) == 1
    assert "ERROR" in capsys.readouterr().out


def test_zonalstats_defaults_and_alias(spark, tmp_path, region_file, capsys):
    # single-variable raster (zonalstats consumes lon/lat/value)
    rows = [(100.125 + ix * 0.25, 10.125 + iy * 0.25, 2.0)
            for iy in range(16) for ix in range(16)]
    rp = str(tmp_path / "r.parquet")
    spark.createDataFrame(rows, "lon double, lat double, value double").write.parquet(rp)
    cfg = tmp_path / "geoglue.toml"
    cfg.write_text(
        '[operation]\nmymean = "mean(coverage_weight=area_spherical_km2)"\n'
        f'[region.viet]\nfile = "{region_file}"\npk = "GID_2"\n'
    )
    out = str(tmp_path / "out.zs.parquet")
    rc = main(["zonalstats", rp, "viet", "--operation", "mymean",
               "-c", str(cfg), "-o", out])
    assert rc == 0
    text = capsys.readouterr().out
    # alias resolved and echoed (reference cli.py:278-279)
    assert "operation mean(coverage_weight=area_spherical_km2)" in text
    assert "NA=0" in text
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and abs(got[0]["mean"] - 2.0) < 1e-9
    assert "geoglue_config" in spark.read.parquet(out).columns


def test_zonalstats_weighted_prefix_warning(spark, tmp_path, region_file, capsys):
    rows = [(100.125 + ix * 0.25, 10.125 + iy * 0.25, 2.0)
            for iy in range(16) for ix in range(16)]
    rp = str(tmp_path / "r.parquet")
    spark.createDataFrame(rows, "lon double, lat double, value double").write.parquet(rp)
    wp = str(tmp_path / "w.parquet")
    spark.createDataFrame(
        [(r[0], r[1], 1.0) for r in rows], "lon double, lat double, weight double"
    ).write.parquet(wp)
    out = str(tmp_path / "out.zs.parquet")
    rc = main(["zonalstats", rp, f"{region_file}::GID_2", "--operation", "mean",
               "--weights", wp, "-o", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "WARN: Passed weights but operation is not weighted" in text
    assert "operation weighted_mean" in text


def test_griddes_and_stats(spark, tmp_path, raster_path, capsys):
    assert main(["griddes", raster_path]) == 0
    text = capsys.readouterr().out
    assert "xsize" in text and "16" in text
    assert main(["stats", raster_path]) == 0
    text = capsys.readouterr().out
    assert "rows=512" in text and "nna=0" in text


@pytest.mark.slow
def test_pipe_crop_into_merge_subprocess(tmp_path, raster_path):
    """The reference pipeline style end-to-end through REAL processes:
    ``python -m geoglue_spark crop ... | python -m geoglue_spark merge``."""
    merged = str(tmp_path / "piped.parquet")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    cmd = (
        f"{sys.executable} -m geoglue_spark crop {raster_path} 101,11,103,13 "
        f"-o {tmp_path}/c.parquet | "
        f"{sys.executable} -m geoglue_spark merge -o {merged}"
    )
    proc = subprocess.run(
        cmd, shell=True, cwd="/tmp", env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert merged in proc.stdout
    import duckdb

    n = duckdb.sql(f"select count(*) from '{merged}/*.parquet'").fetchone()[0]
    assert n == 2 * 64

def test_griddes_on_real_worldpop_tif(capsys):
    """Suffix dispatch end-to-end: the CLI reads a REAL WorldPop BigTIFF
    through the pure-NumPy GeoTIFF codec and reports its CDO griddes."""
    rc = main(["griddes", "/root/reference/data/VNM/worldpop/vnm_ppp_2020_1km_Aggregated_UNadj.tif"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "xsize" in text and "879" in text and "1781" in text


@pytest.mark.slow
def test_zonalstats_cli_all_real_inputs(spark, tmp_path, capsys):
    """Reference CLI muscle memory with all-real inputs: one day of real
    ERA5 precipitation (staged to parquet), the reference's HCM district
    shapefile (167 communes, pk ma_xa), real WorldPop weights, remapdis
    pre-resample — one command, logfmt progress lines, lineage round-trip
    with the var field."""
    from geoglue_spark.config import read_job_configs
    from geoglue_spark.sources.hdf5 import netcdf4_to_pixels

    day1 = netcdf4_to_pixels(
        spark, "/root/reference/data/VNM/era5/VNM-2020-era5.daily_sum.nc", "tp"
    ).filter("time = timestamp'2020-10-01 00:00:00'").drop("time")
    rp = str(tmp_path / "tp_day.parquet")
    day1.write.parquet(rp)
    out = str(tmp_path / "tp.zs.parquet")
    rc = main([
        "zonalstats", rp,
        "/root/reference/data/HCM/geoboundaries/HCM-2.shp::ma_xa",
        "--weights", "/root/reference/data/VNM/worldpop/vnm_ppp_2020_1km_Aggregated_UNadj.tif",
        "--resample", "remapdis", "-o", out,
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "operation weighted_mean(coverage_weight=area_spherical_km2)" in text
    got = spark.read.parquet(out)
    rows = got.collect()
    # most of HCMC's 167 communes get a value (tiny urban communes can
    # miss every 1km weight pixel center)
    assert len(rows) > 120
    vals = [r["weighted_mean"] for r in rows if r["weighted_mean"] is not None]
    assert all(v >= 0 for v in vals)
    assert max(vals) < 0.2  # daily precip in meters stays physical
    # lineage round-trips through the output column
    cfgs = read_job_configs(rows[0]["geoglue_config"])
    assert cfgs[0].weights and cfgs[0].resample == "remapdis"


def test_zonalstats_cli_approx_quantile(spark, tmp_path, region_file, capsys):
    """approx_quantile(q=...) flows through the CLI op-string parser into
    the GK sketch aggregate; constant raster -> the quantile is the value."""
    rows = [(100.125 + ix * 0.25, 10.125 + iy * 0.25, 5.0)
            for iy in range(16) for ix in range(16)]
    rp = str(tmp_path / "r.parquet")
    spark.createDataFrame(rows, "lon double, lat double, value double").write.parquet(rp)
    out = str(tmp_path / "out.zs.parquet")
    rc = main(["zonalstats", rp, f"{region_file}::GID_2",
               "--operation", "approx_median, approx_quantile(q=0.9)", "-o", out])
    assert rc == 0
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["approx_median"] == 5.0
    assert got[0]["approx_quantile(0.9)"] == 5.0


def test_plot_raster_gradient(spark, tmp_path, raster_path, region_file, capsys):
    """`plot` renders a raster slice to PNG with the engine's own encoder
    (reference cli.py:48-78): multi-variable needs -v (like the
    reference); the decoded pixels reproduce the gradient min/max corners;
    -g burns boundary outlines at white."""
    import numpy as np

    from geoglue_spark.images import decode_png

    out = str(tmp_path / "p.png")
    # two variables, no -v -> reference-style error
    assert main(["plot", raster_path, "-o", out]) == 1
    assert "Use -v (--var)" in capsys.readouterr().out
    assert main(["plot", raster_path, "-v", "t2m", "-o", out]) == 0
    img = decode_png(open(out, "rb").read())
    img = img if img.ndim == 2 else img[:, :, 0]
    assert img.shape == (16, 16)
    # value = ix + iy: min at bottom-left (row 15), max at top-right
    assert img[15, 0] == 32 and img[0, 15] == 255
    # monotone along the antidiagonal direction
    assert img[0, 0] == img[15, 15]
    # boundary overlay: the region ring [101.2,11.2]x[102.8,12.8] hits
    # cell (ix=4, iy=4) -> row 11, col 4 burned to 255
    out2 = str(tmp_path / "p2.png")
    assert main(["plot", raster_path, "-v", "t2m", "-o", out2,
                 "-g", f"{region_file}::GID_2"]) == 0
    img2 = decode_png(open(out2, "rb").read())
    img2 = img2 if img2.ndim == 2 else img2[:, :, 0]
    assert img2[11, 4] == 255 and img2[11, 10] == 255
    assert (img2 == 255).sum() > (img == 255).sum()


def test_plot_zonalstats_choropleth(spark, tmp_path, region_file, capsys):
    """A zonalstats output plots as a choropleth: geometry resolved from
    the geoglue_config lineage stamped in the file (reference
    plot.py:46-62), polygons filled by ray-cast point-in-polygon."""
    from geoglue_spark.images import decode_png

    rows = [(100.125 + ix * 0.25, 10.125 + iy * 0.25, 7.5)
            for iy in range(16) for ix in range(16)]
    rp = str(tmp_path / "r.parquet")
    spark.createDataFrame(rows, "lon double, lat double, value double").write.parquet(rp)
    zs = str(tmp_path / "out.zs.parquet")
    assert main(["zonalstats", rp, f"{region_file}::GID_2",
                 "--operation", "mean", "-o", zs]) == 0
    capsys.readouterr()
    png = str(tmp_path / "choro.png")
    rc = main(["plot", zs, "-o", png, "--width", "64"])
    assert rc == 0
    assert "kind=choropleth" in capsys.readouterr().out
    img = decode_png(open(png, "rb").read())
    img = img if img.ndim == 2 else img[:, :, 0]
    # single square region spanning the render bbox: interior filled with
    # the (single-valued -> lo==hi) gray 32, nothing at 0 inside
    h, w = img.shape
    assert img[h // 2, w // 2] == 32
    assert (img > 0).mean() > 0.9  # region fills ~the whole frame
