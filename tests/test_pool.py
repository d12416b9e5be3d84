"""Multi-file archive ingestion (r3 verdict #1): expand_paths dispatch,
DatasetPool filename-convention parsing (reference cds.py:680-757), the
JVM partition-stamp column, glob dispatch through api.raster_from_file,
and the resumable end-to-end flow over the reference's REAL ERA5 archive.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from geoglue_spark.sources.pool import (
    DatasetPool,
    expand_paths,
    pool_partition_col,
)

REF = "/root/reference/tests/data"


def test_expand_paths_glob_dir_list(tmp_path):
    for n in ["a.nc", "b.nc", "c.tif", "notes.txt"]:
        (tmp_path / n).write_bytes(b"x")
    d = str(tmp_path)
    assert expand_paths(f"{d}/*.nc") == [f"{d}/a.nc", f"{d}/b.nc"]
    # directory keeps raster extensions only
    assert expand_paths(d) == [f"{d}/a.nc", f"{d}/b.nc", f"{d}/c.tif"]
    # list of mixed sources, deduplicated + sorted
    assert expand_paths([f"{d}/b.nc", f"{d}/*.nc"]) == [f"{d}/a.nc", f"{d}/b.nc"]
    # single concrete path passes through even if missing (the reader errors)
    assert expand_paths(f"{d}/a.nc") == [f"{d}/a.nc"]
    with pytest.raises(FileNotFoundError):
        expand_paths(f"{d}/*.grib")


def test_dataset_pool_reference_archive():
    pool = DatasetPool([f"{REF}/BRB-*.nc"])
    assert pool.iso3 == "BRB"
    assert pool.partitions() == ["2019", "2020", "2025-05", "2025-06"]
    # the trailing _part month is OPEN — always reprocessed (cds.py:591-610)
    assert pool.open_partitions() == {"2025-06"}
    # each partition carries both vartypes
    assert set(pool.chunks["2019"]) == {"instant", "accum"}
    assert pool.files("2019", "accum") == [f"{REF}/BRB-2019-era5.accum.nc"]
    assert len(pool.files()) == 8


def test_dataset_pool_rejects_multiple_iso3():
    with pytest.raises(ValueError, match="Multiple iso3"):
        DatasetPool([f"{REF}/BRB-2019-era5.accum.nc", f"{REF}/SGP-2019-era5.accum.nc"])


def test_dataset_pool_rejects_multiple_folders(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    shutil.copy(f"{REF}/BRB-2019-era5.accum.nc", a)
    shutil.copy(f"{REF}/BRB-2020-era5.accum.nc", b)
    with pytest.raises(ValueError, match="same folder"):
        DatasetPool([str(a / "BRB-2019-era5.accum.nc"), str(b / "BRB-2020-era5.accum.nc")])


def test_pool_partition_col(spark):
    rows = [
        ("/x/BRB-2019-era5.accum.nc", "2019"),
        ("/x/BRB-2025-06_part-era5.accum.nc", "2025-06"),
        ("/x/BRB-2025-05-era5.instant.nc", "2025-05"),
        ("/x/whatever.nc", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "src string")
    got = {r.src: r.part for r in df.withColumn("part", pool_partition_col()).collect()}
    assert got == dict(rows)


def test_raster_from_file_glob_dispatch(spark):
    """A glob routes through the executor-side multi-file reader: two real
    ERA5 years in ONE scan, src lineage per row, counts per source file."""
    from geoglue_spark.api import raster_from_file

    # single file keeps the classic schema (no src)
    df = raster_from_file(spark, f"{REF}/BRB-2019-era5.instant.nc", var="t2m")
    assert "src" not in df.columns
    multi = raster_from_file(
        spark, [f"{REF}/BRB-2019-era5.instant.nc", f"{REF}/BRB-2020-era5.instant.nc"],
        var="t2m",
    )
    assert "src" in multi.columns
    agg = multi.groupBy("src").agg(F.count("*").alias("n")).collect()
    assert {os.path.basename(r.src): r.n for r in agg} == {
        "BRB-2019-era5.instant.nc": 8760 * 25,
        "BRB-2020-era5.instant.nc": 8784 * 25,  # leap year
    }
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # parsed on executors, not the driver


def test_raster_from_file_rejects_mixed_extensions(spark):
    from geoglue_spark.api import raster_from_files

    with pytest.raises(ValueError, match="mixed raster extensions"):
        raster_from_files(
            spark, [f"{REF}/BRB-2019-era5.accum.nc", "/tmp/x.tif"], var="tp"
        )


@pytest.mark.slow
def test_pool_incremental_era5_archive(spark, tmp_path):
    """The verdict's done-criterion: the DatasetPool drives run_incremental
    over the reference's real multi-year BRB archive — committed years
    skip, the _part month reprocesses, partition stamps come from the
    filename convention JVM-side."""
    from geoglue_spark.streaming.incremental import CheckpointManifest, run_incremental

    pool = DatasetPool([f"{REF}/BRB-*.nc"])

    def process(part: str):
        px = pool.to_pixels(spark, "tp", partition=part, vartype="accum").drop("part")
        return px.groupBy(F.to_date("time").alias("date"), "lon", "lat").agg(
            F.sum("value").alias("tp_daily")
        )

    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    out = str(tmp_path / "daily")
    done = run_incremental(
        spark, pool.partitions(), process, out, manifest,
        open_partitions=pool.open_partitions(), lineage=f"pool={pool.iso3}",
    )
    assert done == ["2019", "2020", "2025-05", "2025-06"]
    days = {
        r.part: r.n
        for r in spark.read.parquet(out)
        .groupBy("part").agg(F.count_distinct("date").alias("n")).collect()
    }
    assert days["2019"] == 365 and days["2020"] == 366 and days["2025-05"] == 31
    assert 0 < days["2025-06"] < 30  # genuinely partial month
    # resume: only the open partial month reprocesses
    done2 = run_incremental(
        spark, pool.partitions(), process, out, manifest,
        open_partitions=pool.open_partitions(),
    )
    assert done2 == ["2025-06"]


@pytest.mark.slow
def test_cli_zonalstats_multi_file_archive(spark, tmp_path, capsys):
    """`geoglue-spark zonalstats '<archive>/BRB-19*.instant.nc' region::pk`
    runs END-TO-END over the reference's real multi-year ERA5 archive in
    one job (the r3 verdict's day-one gap)."""
    import json

    from geoglue_spark.cli import main

    feat = {
        "type": "Feature",
        "properties": {"PK": "BRB0"},
        "geometry": {"type": "Polygon", "coordinates": [
            [[-59.2, 13.2], [-58.2, 13.2], [-58.2, 13.9], [-59.2, 13.9],
             [-59.2, 13.2]]
        ]},
    }
    region = tmp_path / "brb.geojson"
    region.write_text(json.dumps({"type": "FeatureCollection", "features": [feat]}))
    out = str(tmp_path / "zs.parquet")
    rc = main([
        "zonalstats", f"{REF}/BRB-20[12]?-era5.instant.nc", f"{region}::PK",
        "--var", "t2m", "--operation", "mean", "-o", out,
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "zonalstats\tbegin=" in text and "zonalstats\tend=" in text
    got = spark.read.parquet(out)
    # hourly mean per admin across BOTH years of the archive
    n = got.count()
    assert n == 8760 + 8784
    means = [r["mean"] for r in got.select("mean").collect()]
    assert all(285 < m < 310 for m in means)  # tropical K range, both years


def test_cli_multi_file_requires_output(tmp_path, capsys):
    import json

    from geoglue_spark.cli import main

    feat = {
        "type": "Feature", "properties": {"PK": "X"},
        "geometry": {"type": "Polygon", "coordinates": [
            [[-59.2, 13.2], [-58.2, 13.2], [-58.2, 13.9], [-59.2, 13.2]]
        ]},
    }
    region = tmp_path / "r.geojson"
    region.write_text(json.dumps({"type": "FeatureCollection", "features": [feat]}))
    rc = main(["zonalstats", f"{REF}/BRB-20[12]?-era5.instant.nc", f"{region}::PK"])
    assert rc == 1
    assert "needs -o" in capsys.readouterr().out
