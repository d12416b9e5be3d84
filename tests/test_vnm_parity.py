"""Realism check on the polygon pipeline with the reference's own PUBLIC
geoBoundaries Vietnam shapefile (reference data/VNM/geoboundaries, used by
its region tests) — stdlib .shp/.dbf parse -> cover -> assign -> zonal,
end to end on real-world multipolygon coastline geometry."""

import numpy as np
import pytest

from geoglue_spark.cover import build_cover
from geoglue_spark.grids import Grid
from geoglue_spark.operators.assign import assign_admin
from geoglue_spark.operators.zonal import zonal_stats
from geoglue_spark.sources.polygons import read_shapefile

VNM_ADM1 = "/root/reference/data/VNM/geoboundaries/geoBoundaries-VNM-ADM1.shp"

# ~0.25-degree grid over Vietnam's bbox (102..110E, 8..24N)
GRID = Grid(x0=102.0, dx=0.25, nx=32, y0=8.0, dy=0.25, ny=64)


@pytest.fixture(scope="module")
def vnm(spark):
    admins = read_shapefile(spark, VNM_ADM1, "shapeID", "shapeName").cache()
    return admins


def test_vnm_adm1_loads_all_provinces(vnm):
    # geoBoundaries VNM ADM1 ships 64 features (63 provinces + Paracel row)
    assert vnm.count() == 64
    names = {r["name"] for r in vnm.select("name").collect()}
    # real attribute table came through, UTF-8 decoded (mojibake regression:
    # the DBF parser once decoded UTF-8 bytes as latin-1)
    assert "An Giang" in names and "Bà Rịa–Vũng Tàu" in names


def test_vnm_cover_assign_zonal_end_to_end(spark, vnm):
    cover = build_cover(vnm, GRID, supersample=8)
    ncells = cover.count()
    assert ncells > 500  # Vietnam spans hundreds of 0.25-degree cells
    # every covered cell carries a real admin id and a sane fraction
    bad = cover.filter(
        "admin_id IS NULL OR coverage <= 0 OR coverage > 1.0001"
    ).count()
    assert bad == 0
    # city anchor points must land in SOME admin; coverage-weighted mean of
    # a constant field is that constant
    pts = spark.createDataFrame(
        [
            (1, 105.85, 21.03, 2.0),  # Hanoi
            (2, 106.70, 10.78, 2.0),  # Ho Chi Minh City
            (3, 108.21, 16.05, 2.0),  # Da Nang
        ],
        "pid long, lon double, lat double, value double",
    )
    wkb = {r.admin_id: bytes(r.geometry) for r in vnm.collect()}
    assigned = assign_admin(pts, cover, wkb, GRID)
    rows = assigned.collect()
    assert len(rows) == 3 and all(r.admin_id is not None for r in rows)
    assert len({r.admin_id for r in rows}) == 3  # three different provinces
    out = zonal_stats(assigned, "value", ["count", "mean"]).collect()
    for r in out:
        np.testing.assert_allclose(r["mean"], 2.0, rtol=1e-12)


def test_vnm_cover_matches_polygon_area_scale(vnm):
    """Sum of coverage_fraction x cell area approximates Vietnam's land
    area (~331k km^2) — a strong end-to-end check that real-world ring
    orientation/holes/multipolygons parse correctly."""
    from pyspark.sql import functions as F

    cover = build_cover(vnm, GRID, supersample=8)
    area = (
        cover.withColumn(
            "a", GRID.cell_area_km2_col(F.col("cell_id")) * F.col("coverage")
        )
        .agg(F.sum("a"))
        .collect()[0][0]
    )
    assert 280_000 < area < 400_000, area
