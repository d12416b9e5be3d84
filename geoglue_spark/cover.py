"""Polygon -> grid-cell cover: the broadcastable heart of the spatial join.

For each admin polygon we classify every grid cell its bbox touches as
  * interior  — entirely inside (coverage 1.0): points there need NO
    point-in-polygon test; pixels there aggregate at full weight;
  * boundary  — the polygon edge passes through it: points there go to the
    vectorized ray-cast refinement, pixels get a supersampled coverage
    fraction (replacing exactextract's exact clipping, reference
    src/geoglue/zonalstats.py:44-62).

The resulting ``(cell_id, admin_id, interior, coverage)`` table is small
(cells along perimeters + compact interiors), broadcast to every executor,
and joined map-side against the fact table's arithmetic cell id — the
coarse phase of join J1 in SURVEY.md §2.3. Cover building itself is
distributed with ``applyInPandas`` over admin_id, so 50k GADM-2 polygons
build in parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .geometry import Geom, geom_bbox, wkb_to_rings
from .grids import Grid
from .pip import PreparedGeom, coverage_fractions, points_in_geom

COVER_SCHEMA = "cell_id long, admin_id string, interior boolean, coverage double"


def _boundary_cells(geom: Geom, grid: Grid) -> np.ndarray:
    """Supercover rasterization: every cell any polygon edge passes through.

    Per edge: split the segment at integer grid-line crossings; the cell of
    each sub-segment midpoint is touched. O(edges * cells_per_edge), all
    NumPy inside the per-edge loop.
    """
    cells = []
    for poly in geom:
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            # ring in fractional grid coordinates
            gx = (r[:, 0] - grid.x0) / grid.dx
            gy = (r[:, 1] - grid.y0) / grid.dy
            for i in range(len(r) - 1):
                x1, y1, x2, y2 = gx[i], gy[i], gx[i + 1], gy[i + 1]
                ts = [np.array([0.0, 1.0])]
                if x2 != x1:
                    ks = np.arange(np.ceil(min(x1, x2)), np.floor(max(x1, x2)) + 1)
                    ts.append((ks - x1) / (x2 - x1))
                if y2 != y1:
                    ks = np.arange(np.ceil(min(y1, y2)), np.floor(max(y1, y2)) + 1)
                    ts.append((ks - y1) / (y2 - y1))
                t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
                tm = (t[:-1] + t[1:]) / 2.0
                cix = np.floor(x1 + tm * (x2 - x1)).astype(np.int64)
                ciy = np.floor(y1 + tm * (y2 - y1)).astype(np.int64)
                keep = (cix >= 0) & (cix < grid.nx) & (ciy >= 0) & (ciy < grid.ny)
                cells.append(np.stack([cix[keep], ciy[keep]], axis=1))
    if not cells:
        return np.empty((0, 2), dtype=np.int64)
    return np.unique(np.concatenate(cells), axis=0)


def build_cover_local(
    admin_id: str,
    geom: Geom,
    grid: Grid,
    supersample: int = 16,
    compute_coverage: bool = True,
) -> pd.DataFrame:
    """Cover for ONE polygon -> pandas rows (cell_id, admin_id, interior,
    coverage)."""
    prep = PreparedGeom(geom)
    bbox = geom_bbox(geom)
    ix0 = int(grid.ix(bbox.minx))
    ix1 = int(grid.ix(np.nextafter(bbox.maxx, -np.inf)))
    iy0 = int(grid.iy(bbox.miny))
    iy1 = int(grid.iy(np.nextafter(bbox.maxy, -np.inf)))

    bcells = _boundary_cells(geom, grid)
    # NOTE: row-aligned with bcells (coverage indexing below) — do not sort
    bset_ids = bcells[:, 1] * np.int64(grid.nx) + bcells[:, 0]

    # candidate interior cells: bbox cells minus boundary cells, kept when
    # the center is inside (no edge crosses them, so the center decides).
    # Processed in latitude SLABS so a continental polygon on a fine grid
    # (10^7-10^8 bbox cells) never materializes the whole meshgrid in one
    # task — peak memory is O(nx * slab) regardless of polygon size.
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    slab = max(1, (1 << 22) // max(len(ixs), 1))  # ~4M cells per slab
    interior_chunks = []
    for iy_lo in range(iy0, iy1 + 1, slab):
        iys = np.arange(iy_lo, min(iy_lo + slab, iy1 + 1), dtype=np.int64)
        mx, my = np.meshgrid(ixs, iys)
        ids = my.ravel() * np.int64(grid.nx) + mx.ravel()
        non_boundary = ~np.isin(ids, bset_ids, assume_unique=False)
        cxs, cys = grid.centers(mx.ravel()[non_boundary], my.ravel()[non_boundary])
        interior_chunks.append(ids[non_boundary][points_in_geom(cxs, cys, prep)])
    interior_ids = (
        np.concatenate(interior_chunks) if interior_chunks else np.empty(0, np.int64)
    )

    if compute_coverage and len(bcells):
        bminx, bminy, bmaxx, bmaxy = grid.cell_bounds(bcells[:, 0], bcells[:, 1])
        cov = coverage_fractions(bminx, bminy, bmaxx, bmaxy, prep, supersample)
    else:
        cov = np.ones(len(bcells))
    keep = cov > 0  # edge merely grazes a cell -> may still be coverage 0
    return pd.DataFrame(
        {
            "cell_id": np.concatenate([interior_ids, bset_ids[keep]]),
            "admin_id": admin_id,
            "interior": np.concatenate(
                [np.ones(len(interior_ids), bool), np.zeros(int(keep.sum()), bool)]
            ),
            "coverage": np.concatenate([np.ones(len(interior_ids)), cov[keep]]),
        }
    )


def build_cover(
    admins: DataFrame,
    grid: Grid,
    supersample: int = 16,
    geometry_col: str = "geometry",
    id_col: str = "admin_id",
) -> DataFrame:
    """Distributed cover build: one task per admin polygon.

    At GADM-2 world scale (~47k polygons) this is a 47k-task embarrassing
    parallelism. The raw output has one row per covered CELL; on fine grids
    the interior rows dominate (world land at 0.01 degrees is ~10^8 cells —
    too big to broadcast), so pass the result through
    :func:`compact_cover`, which absorbs fully-interior blocks of
    (2^shift)^2 cells into single block rows (~B^2x fewer interior rows),
    and join with :func:`operators.assign.assign_admin` ``blocks=``.
    """

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = [
            build_cover_local(
                row[id_col], wkb_to_rings(row[geometry_col]), grid, supersample
            )
            for _, row in pdf.iterrows()
        ]
        return pd.concat(frames, ignore_index=True)

    return (
        admins.select(id_col, geometry_col)
        .repartition(max(admins.rdd.getNumPartitions(), 8), id_col)
        .groupBy(id_col)
        .applyInPandas(lambda _, pdf: _one(pdf), COVER_SCHEMA)
    )


def block_id_col(cell_id, grid: Grid, block_shift: int):
    """Coarse block id for a cell id: blocks tile the grid in
    (2^block_shift)^2-cell squares."""
    b = 1 << block_shift
    nbx = (grid.nx + b - 1) // b
    ix = cell_id % F.lit(int(grid.nx))
    iy = (cell_id / F.lit(int(grid.nx))).cast("long")
    return F.shiftright(iy, block_shift) * F.lit(nbx) + F.shiftright(ix, block_shift)


def compact_cover(
    cover: DataFrame, grid: Grid, block_shift: int = 4
) -> tuple[DataFrame, DataFrame]:
    """Split a cell cover into (cells, blocks): blocks are
    (2^block_shift)^2-cell squares ENTIRELY interior to one admin, emitted
    as single rows; their member cells drop from the cell table. This is
    what keeps a fine-grid world cover broadcastable — interior area
    compresses ~B^2x while boundary cells (which genuinely need per-cell
    resolution) stay as-is.

    Assumes admins tessellate (no polygon overlap), like GADM: a block
    fully interior to A cannot contain cells of B. Blocks CLIPPED by the
    grid edge absorb too when every cell they still contain is interior —
    the expected-cell count shrinks to the clipped width x height, so
    edge clipping alone never disqualifies a block."""
    b = 1 << block_shift
    nbx = (grid.nx + b - 1) // b
    with_block = cover.withColumn(
        "_block_id", block_id_col(F.col("cell_id"), grid, block_shift)
    )
    bx = F.col("_block_id") % F.lit(nbx)
    by = (F.col("_block_id") / F.lit(nbx)).cast("long")
    expected = F.least(
        F.lit(b), F.lit(int(grid.nx)) - bx * F.lit(b)
    ) * F.least(F.lit(b), F.lit(int(grid.ny)) - by * F.lit(b))
    full_blocks = (
        with_block.filter(F.col("interior"))
        .groupBy("admin_id", "_block_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") == expected)
        .select(F.col("_block_id").alias("block_id"), "admin_id")
    )
    cells = (
        with_block.join(
            full_blocks.withColumnRenamed("block_id", "_block_id"),
            ["admin_id", "_block_id"],
            "left_anti",
        )
        .drop("_block_id")
    )
    return cells, full_blocks


def join_cover_two_level(
    df_with_cell: DataFrame,
    cover_cols: DataFrame,
    blocks: DataFrame,
    grid: Grid,
    block_shift: int,
) -> DataFrame:
    """Shared two-level candidate join (assignment AND zonal use this):
    ``df_with_cell`` (must carry ``cell_id``) LEFT-joins the broadcast
    cell-level cover and the broadcast interior-block table, keeps rows
    matching either, coalesces ``admin_id`` and exposes ``_block_hit`` for
    callers to coalesce their own per-cell columns (interior / coverage).

    Tessellation assumption (see compact_cover): a row matches a cell row
    XOR a block row, never both — the coalesce is exact. Still one scan of
    ``df_with_cell``; both join sides broadcast; no shuffle."""
    blk = F.broadcast(
        blocks.select("block_id", F.col("admin_id").alias("_block_admin"))
    )
    return (
        df_with_cell.withColumn(
            "block_id", block_id_col(F.col("cell_id"), grid, block_shift)
        )
        .join(F.broadcast(cover_cols), "cell_id", "left")
        .join(blk, "block_id", "left")
        .filter(F.col("admin_id").isNotNull() | F.col("_block_admin").isNotNull())
        .withColumn("admin_id", F.coalesce("admin_id", "_block_admin"))
        .withColumn("_block_hit", F.col("_block_admin").isNotNull())
        .drop("_block_admin")
    )


def cover_stats(cover: DataFrame) -> DataFrame:
    """Per-admin cover summary (cells, boundary fraction) — a cheap
    pre-flight metadata query like the reference's eager validation
    (reference src/geoglue/config.py:141-144)."""
    return cover.groupBy("admin_id").agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(~F.col("interior"), 1).otherwise(0)).alias("n_boundary"),
        F.sum("coverage").alias("covered_cells"),
    )
