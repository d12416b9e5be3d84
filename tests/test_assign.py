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


def test_tile_fractional_assignment_matches_numpy_oracle(spark, fancy_setup):
    """assign_tiles_fractional vs an independent NumPy accumulation over
    the same cover: per (tile, admin), frac = sum(coverage * cell-tile
    overlap)/tile area; plus the conservation invariants."""
    from geoglue_spark.operators.assign import assign_tiles_fractional

    _, cover, _ = fancy_setup
    tw, th = 0.6, 0.45  # NOT multiples of the 0.25 cell
    n = 300
    i = np.arange(n)
    lon = (i * 7919 % 104729) / 104729.0 * 12.0 - 1.0
    lat = (i * 6007 % 104729) / 104729.0 * 9.0 - 0.5
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": i, "lon": lon, "lat": lat}),
        "pid long, lon double, lat double",
    )
    got = (
        assign_tiles_fractional(pts, cover, GRID, tw, th, id_cols=["pid"])
        .toPandas()
        .set_index(["pid", "admin_id"])["frac"]
    )

    cov = cover.select("cell_id", "admin_id", "coverage").toPandas()
    cov_map = {}
    for r in cov.itertuples(index=False):
        cov_map.setdefault(int(r.cell_id), []).append((r.admin_id, float(r.coverage)))

    def oracle(cx, cy):
        x1, x2, y1, y2 = cx - tw / 2, cx + tw / 2, cy - th / 2, cy + th / 2
        acc = {}
        for ix in range(
            int(np.floor((x1 - GRID.x0) / GRID.dx)),
            int(np.floor((x2 - GRID.x0) / GRID.dx)) + 1,
        ):
            if not (0 <= ix < GRID.nx):
                continue
            for iy in range(
                int(np.floor((y1 - GRID.y0) / GRID.dy)),
                int(np.floor((y2 - GRID.y0) / GRID.dy)) + 1,
            ):
                if not (0 <= iy < GRID.ny):
                    continue
                gx1 = GRID.x0 + ix * GRID.dx
                gy1 = GRID.y0 + iy * GRID.dy
                ox = max(0.0, min(x2, gx1 + GRID.dx) - max(x1, gx1))
                oy = max(0.0, min(y2, gy1 + GRID.dy) - max(y1, gy1))
                if ox * oy == 0:
                    continue
                for aid, cv in cov_map.get(iy * GRID.nx + ix, ()):
                    acc[aid] = acc.get(aid, 0.0) + cv * ox * oy / (tw * th)
        return acc

    n_pairs = 0
    for pid in range(n):
        want = oracle(lon[pid], lat[pid])
        got_p = {a: v for (p, a), v in got.items() if p == pid}
        assert set(got_p) == {a for a, v in want.items() if v > 0}
        for a, v in got_p.items():
            np.testing.assert_allclose(v, want[a], rtol=1e-9)
        # conservation: fractions never sum above 1 (+ float slack)
        assert sum(got_p.values()) <= 1.0 + 1e-9
        n_pairs += len(got_p)
    # the sampling box mostly lies outside the fancy polygons; what matters
    # is that a healthy number of tiles DO overlap, some fractionally
    assert n_pairs > 50
    partial = sum(
        1 for pid in range(n)
        if 0 < sum(v for (p, _), v in got.items() if p == pid) < 1 - 1e-9
    )
    assert partial > 10  # boundary tiles carry genuine fractions


def test_tile_fully_interior_gets_frac_one(spark, fancy_setup):
    from geoglue_spark.operators.assign import assign_tiles_fractional

    _, cover, _ = fancy_setup
    # (5.5, 2.0) is deep inside the donut's left arm ([5,6] x [0,4]); a
    # 0.2-degree tile there lies entirely within FANCY-DONUT. The L-shape
    # notch (1.5, 1.5) is OUTSIDE every polygon: zero rows, zero mass.
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [0, 1], "lon": [5.5, 1.5], "lat": [2.0, 1.5]}),
        "pid long, lon double, lat double",
    )
    out = assign_tiles_fractional(pts, cover, GRID, 0.2, 0.2, id_cols=["pid"]).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r.pid, []).append(r)
    assert abs(sum(r.frac for r in by_pid[0]) - 1.0) < 1e-9
    assert {r.admin_id for r in by_pid[0]} == {"FANCY-DONUT"}
    assert 1 not in by_pid  # notch tile: no admin, no rows


def test_tile_fractional_blocked_identical_to_flat(spark, fancy_setup):
    """Two-level (compact blocks) tile assignment is output-identical to
    the flat cover — the property that keeps fine-grid world covers
    broadcastable for J8 exactly as for assignment and zonal."""
    from geoglue_spark.cover import compact_cover
    from geoglue_spark.operators.assign import assign_tiles_fractional

    _, cover, _ = fancy_setup
    cells, blocks = compact_cover(cover, GRID, block_shift=2)
    n = 200
    i = np.arange(n)
    lon = (i * 7919 % 104729) / 104729.0 * 12.0 - 1.0
    lat = (i * 6007 % 104729) / 104729.0 * 9.0 - 0.5
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": i, "lon": lon, "lat": lat}),
        "pid long, lon double, lat double",
    )
    flat = {
        (r.pid, r.admin_id): r.frac
        for r in assign_tiles_fractional(pts, cover, GRID, 0.6, 0.45, id_cols=["pid"]).collect()
    }
    two = {
        (r.pid, r.admin_id): r.frac
        for r in assign_tiles_fractional(
            pts, cells, GRID, 0.6, 0.45, id_cols=["pid"],
            blocks=blocks, block_shift=2,
        ).collect()
    }
    assert set(flat) == set(two)
    for k in flat:
        np.testing.assert_allclose(two[k], flat[k], rtol=1e-12)


def test_tile_fanout_guard(spark, fancy_setup):
    """A scene-sized footprint on a fine grid must refuse the explode
    (per-tile fan-out cap) instead of silently creating a 10^13-row
    intermediate at production tile counts."""
    from geoglue_spark.operators.assign import assign_tiles_fractional

    _, cover, _ = fancy_setup
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [0], "lon": [5.0], "lat": [2.0]}),
        "pid long, lon double, lat double",
    )
    with pytest.raises(ValueError, match="fan-out"):
        assign_tiles_fractional(pts, cover, GRID, 40.0, 30.0, id_cols=["pid"])
    # explicit opt-in still works
    out = assign_tiles_fractional(
        pts, cover, GRID, 40.0, 30.0, id_cols=["pid"], max_fanout=100000
    ).collect()
    assert len(out) > 0


def test_tile_fractional_edge_aligned_cases(spark, fancy_setup):
    """Adversarial geometry: tile edges EXACTLY on cell boundaries (overlap
    contributions of exactly zero must drop), center exactly on a cell
    corner, sub-cell tiles, and a tile hanging off the grid edge (off-grid
    area is unassigned, never aliased onto edge cells)."""
    from geoglue_spark.operators.assign import assign_tiles_fractional

    _, cover, _ = fancy_setup
    # GRID: x0=0, dx=0.25 — all these coordinates are exact binary floats
    cases = pd.DataFrame({
        "pid": [0, 1, 2, 3],
        "lon": [5.375, 5.5, 5.4375, -0.125],  # cell center / corner / interior / west edge
        "lat": [2.125, 2.0, 2.0625, 2.125],
    })
    tw, th = 0.5, 0.5  # = 2 cells: edge-aligned for pid 0 (center at cell center)
    pts = spark.createDataFrame(cases, "pid long, lon double, lat double")
    got = assign_tiles_fractional(pts, cover, GRID, tw, th, id_cols=["pid"]).toPandas()

    cov = cover.select("cell_id", "admin_id", "coverage").toPandas()
    cov_map = {}
    for r in cov.itertuples(index=False):
        cov_map.setdefault(int(r.cell_id), []).append((r.admin_id, float(r.coverage)))

    def oracle(cx, cy):
        x1, x2, y1, y2 = cx - tw / 2, cx + tw / 2, cy - th / 2, cy + th / 2
        acc = {}
        for ix in range(int(np.floor((x1 - GRID.x0) / GRID.dx)) - 1,
                        int(np.floor((x2 - GRID.x0) / GRID.dx)) + 2):
            if not (0 <= ix < GRID.nx):
                continue
            for iy in range(int(np.floor((y1 - GRID.y0) / GRID.dy)) - 1,
                            int(np.floor((y2 - GRID.y0) / GRID.dy)) + 2):
                if not (0 <= iy < GRID.ny):
                    continue
                gx1 = GRID.x0 + ix * GRID.dx
                gy1 = GRID.y0 + iy * GRID.dy
                ox = max(0.0, min(x2, gx1 + GRID.dx) - max(x1, gx1))
                oy = max(0.0, min(y2, gy1 + GRID.dy) - max(y1, gy1))
                if ox * oy == 0:
                    continue
                for aid, cv in cov_map.get(iy * GRID.nx + ix, ()):
                    acc[aid] = acc.get(aid, 0.0) + cv * ox * oy / (tw * th)
        return acc

    for pid in cases.pid:
        want = oracle(cases.lon[pid], cases.lat[pid])
        got_p = got[got.pid == pid].set_index("admin_id")["frac"].to_dict()
        assert set(got_p) == {a for a, v in want.items() if v > 0}, pid
        for a, v in got_p.items():
            np.testing.assert_allclose(v, want[a], rtol=1e-12)
    # pid 0/1/2 are deep in the donut arm: full mass; pid 3 hangs half off
    # the grid west edge: exactly the on-grid half of its mass remains
    tot = got.groupby("pid")["frac"].sum()
    for pid in (0, 1, 2):
        np.testing.assert_allclose(tot[pid], 1.0, rtol=1e-12)
    assert 3 not in tot.index or tot[3] <= 0.5 + 1e-12


def test_assign_tiles_fractional_requires_tile_ids(spark):
    import pytest

    from geoglue_spark.operators.assign import assign_tiles_fractional

    tiles = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    cover = spark.createDataFrame(
        [(0, "A", True)], "cell_id long, admin_id string, interior boolean"
    )
    grid = Grid(x0=0.0, dx=1.0, nx=4, y0=0.0, dy=1.0, ny=4)
    with pytest.raises(ValueError, match="id_cols"):
        assign_tiles_fractional(tiles, cover, grid, 1.0, 1.0)
