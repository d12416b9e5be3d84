"""kNN-to-admin-centroid (J7) vs a brute-force NumPy oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoglue_spark.grids import Grid
from geoglue_spark.operators.knn import admin_centroids, haversine_km_col, knn_join
from geoglue_spark.synth import admins_df

GRID = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)


def _haversine_np(lon1, lat1, lon2, lat2):
    r = 6371.0088
    la1, la2 = np.radians(lat1), np.radians(lat2)
    dlat = la2 - la1
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(a))


@pytest.fixture(scope="module")
def cents(spark):
    return admin_centroids(admins_df(spark)).cache()


def test_centroids_are_cell_centers(spark, cents):
    pdf = cents.toPandas().set_index("admin_id")
    # rect admins: vertex-mean of the closed square ring = center-ish
    row = pdf.loc["ADM2-00"]
    assert abs(row.clon - 100.5) < 1e-9 and abs(row.clat - 10.5) < 1e-9
    assert len(pdf) == 100


def test_knn_matches_bruteforce(spark, cents):
    n = 500
    i = np.arange(n)
    lon = 100.0 + (i * 7919 % 9973) / 9973.0 * 10.0
    lat = 10.0 + (i * 6007 % 9973) / 9973.0 * 10.0
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": i, "lon": lon, "lat": lat})
    )
    got = knn_join(pts, cents, GRID, k=3, id_cols=["pid"]).toPandas()
    cpd = cents.toPandas()
    assert len(got) == n * 3
    for pid in range(0, n, 37):  # spot-check a deterministic sample
        d = _haversine_np(lon[pid], lat[pid], cpd.clon.to_numpy(), cpd.clat.to_numpy())
        order = np.lexsort((cpd.admin_id.to_numpy(), d))[:3]
        want = list(cpd.admin_id.to_numpy()[order])
        g = got[got.pid == pid].sort_values("rk").admin_id.tolist()
        assert g == want, f"pid={pid}: got {g} want {want}"


def test_knn_deterministic_across_partitionings(spark, cents):
    pdf = pd.DataFrame(
        {"pid": range(200), "lon": [100.2 + (j % 50) * 0.19 for j in range(200)],
         "lat": [10.2 + (j % 40) * 0.24 for j in range(200)]}
    )
    pts = spark.createDataFrame(pdf)
    a = knn_join(pts.repartition(2), cents, GRID, k=2, id_cols=["pid"]).orderBy("pid", "rk").toPandas()
    b = knn_join(pts.repartition(11), cents, GRID, k=2, id_cols=["pid"]).orderBy("pid", "rk").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_knn_world_scale_centroids_equi_join_plan(spark):
    """GADM-2-world-sized centroid table (~47k): the staged bucket join must
    be a BroadcastHashJoin (never a nested-loop box predicate) and still
    match brute force on a sample of points."""
    m = 216  # 216 x 216 = 46,656 centroids over the 10x10-degree domain
    ci = np.arange(m * m)
    clon = 100.0 + (ci % m + 0.5) * (10.0 / m)
    clat = 10.0 + (ci // m + 0.5) * (10.0 / m)
    cents = spark.createDataFrame(
        pd.DataFrame({"admin_id": [f"C{j:06d}" for j in ci], "clon": clon, "clat": clat})
    )
    n = 40
    i = np.arange(n)
    lon = 100.0 + (i * 7919 % 9973) / 9973.0 * 10.0
    lat = 10.0 + (i * 6007 % 9973) / 9973.0 * 10.0
    pts = spark.createDataFrame(pd.DataFrame({"pid": i, "lon": lon, "lat": lat}))
    df = knn_join(pts, cents, GRID, k=3, id_cols=["pid"], assume_small=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = df.toPandas()
    assert len(got) == n * 3
    for pid in range(0, n, 7):
        d = _haversine_np(lon[pid], lat[pid], clon, clat)
        order = np.lexsort((np.array([f"C{j:06d}" for j in ci]), d))[:3]
        want = [f"C{j:06d}" for j in ci[order]]
        g = got[got.pid == pid].sort_values("rk").admin_id.tolist()
        assert g == want, f"pid={pid}: got {g} want {want}"


def test_knn_strict_raises_on_undersized_ring(spark, cents):
    """strict=True must refuse silently-truncated results when max_ring
    cannot prove exactness (1-degree centroid spacing, 2-cell ring)."""
    pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "lon": [105.0], "lat": [15.0]}))
    with pytest.raises(ValueError, match="strict"):
        knn_join(pts, cents, GRID, k=3, id_cols=["pid"], ring_batches=(2,), strict=True)


def test_knn_strict_passes_when_ring_covers(spark, cents):
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [0, 1], "lon": [105.02, 103.4], "lat": [15.03, 12.6]})
    )
    got = knn_join(
        pts, cents, GRID, k=1, id_cols=["pid"], ring_batches=(60,), strict=True
    ).toPandas()
    assert set(got.admin_id) == {"ADM2-55", "ADM2-23"}


def test_haversine_column(spark):
    df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], "a double, b double, c double, d double")
    km = df.select(
        haversine_km_col(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert abs(km - 111.19) < 0.1  # one degree of latitude


def test_knn_fast_path_matches_window_and_bruteforce(spark, cents):
    """assume_small's hash-agg top-k must equal the staged/window path row
    for row INCLUDING dist_km (the oracle query never compares distances),
    and both must match the NumPy brute-force oracle."""
    n = 400
    i = np.arange(n)
    lon = 100.0 + (i * 7919 % 9973) / 9973.0 * 10.0
    lat = 10.0 + (i * 6007 % 9973) / 9973.0 * 10.0
    pts = spark.createDataFrame(pd.DataFrame({"pid": i, "lon": lon, "lat": lat}))

    fast = (
        knn_join(pts, cents, GRID, k=3, id_cols=["pid"], assume_small=True)
        .toPandas()
        .sort_values(["pid", "rk"])
        .reset_index(drop=True)
    )
    slow = (
        knn_join(pts, cents, GRID, k=3, id_cols=["pid"], assume_small=False)
        .toPandas()
        .sort_values(["pid", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast[["pid", "rk", "admin_id", "dist_km"]],
        slow[["pid", "rk", "admin_id", "dist_km"]],
    )

    cpdf = cents.toPandas()
    d = _haversine_np(
        lon[:, None], lat[:, None],
        cpdf.clon.to_numpy()[None, :], cpdf.clat.to_numpy()[None, :],
    )
    by_pid = fast.set_index(["pid", "rk"])
    for pid in range(n):
        order = np.lexsort((cpdf.admin_id.to_numpy(), d[pid]))
        for rk in (1, 2, 3):
            want_admin = cpdf.admin_id.to_numpy()[order[rk - 1]]
            want_dist = round(float(d[pid][order[rk - 1]]), 6)
            row = by_pid.loc[(pid, rk)]
            assert row.admin_id == want_admin, (pid, rk)
            assert abs(row.dist_km - want_dist) < 1e-9, (pid, rk)


def test_knn_join_rejects_unknown_topk(spark):
    grid = Grid(x0=0.0, dx=1.0, nx=4, y0=0.0, dy=1.0, ny=4)
    pts = spark.createDataFrame([(1, 0.5, 0.5)], "pid long, lon double, lat double")
    cent = spark.createDataFrame(
        [("A", 1.5, 1.5)], "admin_id string, lon double, lat double"
    )
    with pytest.raises(ValueError, match="topk"):
        knn_join(pts, cent, grid, k=1, topk="hash_agg")


def test_knn_join_requires_point_ids(spark):
    grid = Grid(x0=0.0, dx=1.0, nx=4, y0=0.0, dy=1.0, ny=4)
    pts = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    cent = spark.createDataFrame(
        [("A", 1.5, 1.5)], "admin_id string, lon double, lat double"
    )
    with pytest.raises(ValueError, match="id_cols"):
        knn_join(pts, cent, grid, k=1)


def test_admin_centroids_respects_geometry_col(spark):
    from geoglue_spark.geometry import rings_to_wkb
    from geoglue_spark.operators.knn import admin_centroids

    sq = [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]
    wkb = rings_to_wkb([[np.array(sq[0])]])
    df = spark.createDataFrame([("A", bytearray(wkb))], "admin_id string, geom binary")
    got = admin_centroids(df, geometry_col="geom").collect()[0]
    assert (got.clon, got.clat) == (1.0, 1.0)
