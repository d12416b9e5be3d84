import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark.grids import Grid, infer_grid


def test_index_roundtrip():
    g = Grid(x0=100.0, dx=0.25, nx=40, y0=10.0, dy=0.25, ny=40)
    lon = np.array([100.0, 100.1, 100.26, 109.99])
    assert list(g.ix(lon)) == [0, 0, 1, 39]
    lat = np.array([10.0, 12.5, 19.999])
    assert list(g.iy(lat)) == [0, 10, 39]
    cid = g.cell_id_np([100.3], [10.3])
    assert cid[0] == 1 * 40 + 1


def test_from_centers_descending_lat():
    # CDO-style: yfirst at the top, negative yinc (lat stored descending)
    g = Grid.from_centers(xfirst=100.0, xinc=0.25, xsize=65, yfirst=18.0, yinc=-0.25, ysize=33)
    assert g.y_descending
    assert g.dy == 0.25
    assert abs(g.y0 - (10.0 - 0.125)) < 1e-12
    assert abs(g.x0 - (100.0 - 0.125)) < 1e-12


def test_global_grid_and_area():
    g = Grid.global_grid(10)
    assert g.nx == 1024 and g.ny == 512
    # equatorial cells bigger than polar
    a_eq = g.cell_area_km2_np(np.array([g.ny // 2]))[0]
    a_pol = g.cell_area_km2_np(np.array([g.ny - 1]))[0]
    assert a_eq > a_pol > 0
    # whole sphere area ~ 5.1e8 km2
    total = g.cell_area_km2_np(np.arange(g.ny)).sum() * g.nx
    assert abs(total - 5.100656e8) / 5.1e8 < 1e-3


def test_column_math_matches_numpy(spark):
    g = Grid(x0=100.0, dx=0.25, nx=40, y0=10.0, dy=0.25, ny=40)
    pts = [(100.0, 10.0), (105.125, 15.6), (109.99, 19.99), (100.26, 10.26)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = df.select(
        g.cell_id_col(F.col("lon"), F.col("lat")).alias("cid"),
        g.cell_area_km2_col(g.cell_id_col(F.col("lon"), F.col("lat"))).alias("area"),
    ).collect()
    for (lon, lat), r in zip(pts, rows):
        assert r.cid == g.cell_id_np([lon], [lat])[0]
        np.testing.assert_allclose(
            r.area, g.cell_area_km2_np(np.array([g.iy([lat])[0]]))[0], rtol=1e-12
        )


def test_cell_id_null_outside_domain(spark):
    """Off-grid points must get NULL cell ids, not clamp onto edge cells
    (clamping would mis-assign ocean points to border admins)."""
    g = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    df = spark.createDataFrame(
        [(0.0, 0.0), (200.0, 95.0), (110.0, 15.0), (105.0, 15.0)], "lon double, lat double"
    )
    out = [r.cid for r in df.select(g.cell_id_col(F.col("lon"), F.col("lat")).alias("cid")).collect()]
    assert out[0] is None and out[1] is None
    assert out[2] is None  # right edge is exclusive: domain is [x0, x0+nx*dx)
    assert out[3] is not None


def test_infer_grid(spark):
    g = Grid(x0=0.0, dx=0.5, nx=10, y0=0.0, dy=1.0, ny=5)
    ix, iy = np.meshgrid(np.arange(10), np.arange(5))
    lon, lat = g.centers(ix.ravel(), iy.ravel())
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    inferred = infer_grid(df)
    assert inferred.approx_equal(g)
    assert not inferred.approx_equal(Grid(x0=0.0, dx=0.5, nx=11, y0=0.0, dy=1.0, ny=5))


def test_prefix_column(spark):
    g = Grid.global_grid(12)
    df = spark.createDataFrame([(0.0, 0.0), (0.05, 0.05), (90.0, 45.0)], "lon double, lat double")
    out = df.select(
        g.cell_prefix_col(g.cell_id_col(F.col("lon"), F.col("lat")), shift=4).alias("p")
    ).collect()
    assert out[0].p == out[1].p  # nearby points share a prefix block
    assert out[0].p != out[2].p
