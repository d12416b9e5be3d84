"""End-to-end admin assignment: engine result vs an independent NumPy oracle,
plus determinism across parallelism levels (BASELINE.json north_star)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoglue_spark.cover import build_cover
from geoglue_spark.geometry import wkb_to_rings
from geoglue_spark.grids import Grid
from geoglue_spark.operators.assign import assign_admin
from geoglue_spark.pip import points_in_geom
from geoglue_spark.synth import admin_fancy_geoms, admins_df, _point_lat, _point_lon

GRID = Grid(x0=0.0, dx=0.25, nx=64, y0=0.0, dy=0.25, ny=40)


@pytest.fixture(scope="module")
def fancy_setup(spark):
    admins = admins_df(spark, fancy=True).filter("admin_id != 'FANCY-ARCHI'")
    cover = build_cover(admins, GRID, supersample=8).cache()
    wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}
    return admins, cover, wkb


def _oracle_assign(lon, lat, wkb):
    """Independent oracle: brute-force PIP of every point against every
    polygon (no grid, no cover)."""
    out = np.full(len(lon), None, dtype=object)
    for aid in sorted(wkb):
        inside = points_in_geom(lon, lat, wkb_to_rings(wkb[aid]))
        for i in np.where(inside)[0]:
            if out[i] is None:
                out[i] = aid
    return out


def test_assignment_matches_bruteforce_oracle(spark, fancy_setup):
    _, cover, wkb = fancy_setup
    n = 4000
    i = np.arange(n)
    lon = (i * 7919 % 104729) / 104729.0 * 12.0 - 1.0
    lat = (i * 6007 % 104729) / 104729.0 * 9.0 - 0.5
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": i, "lon": lon, "lat": lat}), "pid long, lon double, lat double"
    )
    got = assign_admin(pts, cover, wkb, GRID).toPandas().set_index("pid")["admin_id"]
    want = _oracle_assign(lon, lat, wkb)
    for pid in range(n):
        w = want[pid]
        g = got.get(pid)
        assert g == w or (w is None and g is None), f"pid={pid} got={g} want={w}"
    # sanity: a decent share of points actually landed in polygons
    assert got.notna().sum() > 500


def test_single_scan_single_arrow_pass(spark, fancy_setup):
    """The assignment plan must scan the source once and cross the Arrow
    boundary once (a 100 TB fact table cannot afford a double read)."""
    _, cover, wkb = fancy_setup
    pts = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    out = assign_admin(pts, cover, wkb, GRID)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Union") == 0


def test_determinism_across_partitionings(spark, fancy_setup):
    _, cover, wkb = fancy_setup
    n = 2000
    i = np.arange(n)
    pdf = pd.DataFrame(
        {"pid": i, "lon": (i % 97) / 97 * 10.0, "lat": (i % 89) / 89 * 8.0}
    )
    pts = spark.createDataFrame(pdf)
    a = (
        assign_admin(pts.repartition(2), cover, wkb, GRID)
        .orderBy("pid")
        .toPandas()
    )
    b = (
        assign_admin(pts.repartition(16), cover, wkb, GRID)
        .orderBy("pid")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_unique_on_dedupes_shared_edges(spark):
    """A point exactly on a shared edge of two rectangles must resolve to
    exactly one admin deterministically with unique_on."""
    admins = admins_df(spark)
    grid = Grid(x0=100.0, dx=0.125, nx=80, y0=10.0, dy=0.125, ny=80)
    cover = build_cover(admins.limit(20), grid, supersample=4)
    wkb = {r.admin_id: bytes(r.geometry) for r in admins.limit(20).collect()}
    pts = spark.createDataFrame(
        [(1, 101.0, 10.5), (2, 101.5, 10.5)], "pid long, lon double, lat double"
    )
    out = assign_admin(pts, cover, wkb, grid, unique_on="pid").toPandas()
    assert len(out) == len(out.pid.unique())


def test_hotspot_skew_assignment(spark):
    """80% hotspot points all map into one admin — mega-cell skew path."""
    admins = admins_df(spark)
    grid = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    cover = build_cover(admins, grid, supersample=4).cache()
    wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}
    i = np.arange(5000)
    pdf = pd.DataFrame({"pid": i, "lat": _point_lat(i), "lon": _point_lon(i)})
    pts = spark.createDataFrame(pdf)
    out = assign_admin(pts, cover, wkb, grid)
    counts = out.groupBy("admin_id").count().toPandas()
    assert len(out.toPandas()) == 5000  # every point is inside the country
    # hotspot admin (row 2, col 4) holds ~80%
    hot = counts[counts.admin_id == "ADM2-24"]["count"].iloc[0]
    assert hot > 3800
