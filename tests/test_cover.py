import numpy as np

from geoglue_spark.cover import build_cover, build_cover_local, cover_stats
from geoglue_spark.geometry import wkb_to_rings
from geoglue_spark.grids import Grid
from geoglue_spark.synth import admin_fancy_geoms, admins_df

GRID = Grid(x0=0.0, dx=0.5, nx=40, y0=0.0, dy=0.5, ny=40)
FANCY = {aid: wkb_to_rings(wkb) for aid, _, _, wkb in admin_fancy_geoms()}


def test_square_cover_counts():
    # 2x2-degree square on a 0.5-degree grid -> 4x4=16 cells; the square's
    # edges lie exactly on grid lines so boundary cells ring the outside
    sq = [[np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]])]]
    pdf = build_cover_local("A", sq, GRID, supersample=8)
    interior = pdf[pdf.interior]
    assert (interior.coverage == 1.0).all()
    # total covered area = sum(coverage) * cell_area = 16 cells worth
    assert abs(pdf.coverage.sum() - 16.0) < 0.5


def test_offset_square_coverage_fractions():
    # square offset by a quarter cell: boundary cells get fractional coverage
    sq = [[np.array([[1.25, 1.25], [2.75, 1.25], [2.75, 2.75], [1.25, 2.75], [1.25, 1.25]])]]
    pdf = build_cover_local("A", sq, GRID, supersample=16)
    assert (pdf[~pdf.interior].coverage < 1.0).all()
    assert (pdf.coverage > 0).all()
    # area = 1.5 x 1.5 deg = 9 cells of 0.5x0.5
    assert abs(pdf.coverage.sum() - 9.0) < 0.2


def test_donut_cover_excludes_hole():
    pdf = build_cover_local("D", FANCY["FANCY-DONUT"], GRID, supersample=8)
    # hole interior cell (6.5..7.5, 1.5..2.5) center at (7.25, 2.25)
    hole_cell = GRID.cell_id_np([7.25], [2.25])[0]
    row = pdf[pdf.cell_id == hole_cell]
    assert row.empty or (row.coverage < 0.2).all()
    # ring cell fully inside the ring
    ring_cell = GRID.cell_id_np([5.25, 5.25], [2.25, 0.25])
    assert (pdf[pdf.cell_id.isin(ring_cell)].coverage > 0.9).all()


def test_multipolygon_cover_two_islands():
    pdf = build_cover_local("M", FANCY["FANCY-MULTI"], GRID, supersample=8)
    a = GRID.cell_id_np([1.25], [6.25])[0]
    b = GRID.cell_id_np([5.25], [6.25])[0]
    gap = GRID.cell_id_np([3.25], [6.25])[0]
    ids = set(pdf.cell_id)
    assert a in ids and b in ids and gap not in ids


def test_distributed_build_matches_local(spark):
    grid = Grid(x0=100.0, dx=0.125, nx=80, y0=10.0, dy=0.125, ny=80)
    admins = admins_df(spark).limit(4)
    cov = build_cover(admins, grid, supersample=8).toPandas()
    for aid, grp in cov.groupby("admin_id"):
        row = admins.filter(f"admin_id = '{aid}'").collect()[0]
        local = build_cover_local(aid, wkb_to_rings(row.geometry), grid, supersample=8)
        got = grp.sort_values("cell_id").reset_index(drop=True)
        want = local.sort_values("cell_id").reset_index(drop=True)
        assert list(got.cell_id) == list(want.cell_id)
        np.testing.assert_allclose(got.coverage, want.coverage)


def test_wiggly_admins_cover_and_pip():
    """Realistic-complexity (256-vertex) admins: cover area ~= 1 deg^2 per
    admin; points well inside/outside classify correctly."""
    from geoglue_spark.synth import admin_wiggly_geoms
    from geoglue_spark.pip import points_in_geom

    grid = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    rows = admin_wiggly_geoms()
    assert len(rows) == 100
    aid, _, _, wkb = rows[0]
    geom = wkb_to_rings(wkb)
    assert sum(len(r) for p in geom for r in p) >= 250  # realistic vertex count
    pdf = build_cover_local(aid, geom, grid, supersample=8)
    # total covered area in cells ~= 1 sq deg = 400 cells of 0.05x0.05
    assert abs(pdf.coverage.sum() - 400.0) < 15.0
    assert points_in_geom([100.5], [10.5], geom)[0]  # deep inside
    assert not points_in_geom([102.5], [10.5], geom)[0]  # other admin


def test_cover_stats(spark):
    grid = Grid(x0=100.0, dx=0.125, nx=80, y0=10.0, dy=0.125, ny=80)
    admins = admins_df(spark).limit(2)
    stats = cover_stats(build_cover(admins, grid, supersample=4)).collect()
    for r in stats:
        assert r.n_cells > 0 and 0 <= r.n_boundary <= r.n_cells


def test_compact_cover_blocked_assignment_identical(spark):
    """Block compaction must (a) shrink the broadcastable cover
    substantially and (b) leave assignment output IDENTICAL row-for-row."""
    import pandas as pd

    from geoglue_spark.cover import build_cover, compact_cover
    from geoglue_spark.grids import Grid
    from geoglue_spark.operators.assign import assign_admin
    from geoglue_spark.synth import admins_df

    grid = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    admins = admins_df(spark)
    cover = build_cover(admins, grid, supersample=8).cache()
    n_cover = cover.count()
    cells, blocks = compact_cover(cover, grid, block_shift=3)
    cells = cells.cache()
    blocks = blocks.cache()
    n_compact = cells.count() + blocks.count()
    # these 20x20-cell toy admins only fit ~1 aligned 8x8 block each; real
    # continental interiors compress ~(2^shift)^2x
    assert n_compact < n_cover * 0.7, (n_cover, n_compact)
    # sanity: total represented cells unchanged (64 cells per block here)
    ncells = cells.count() + blocks.count() * 64
    assert ncells == n_cover

    wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}
    n = 4000
    i = pd.Series(range(n))
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": i,
                "lon": 100.0 + (i * 7919 % 9973) / 9973.0 * 10.0,
                "lat": 10.0 + (i * 6007 % 9973) / 9973.0 * 10.0,
            }
        )
    )
    plain = assign_admin(pts, cover, wkb, grid).orderBy("pid").collect()
    blocked_df = assign_admin(
        pts, cells, wkb, grid, blocks=blocks, block_shift=3
    )
    blocked = blocked_df.orderBy("pid").collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in blocked]
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    # both cover levels join broadcast (the extra BHJs in the plan text are
    # compact_cover's own metadata-scale lineage); the fact side never
    # sort-merge-joins
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
